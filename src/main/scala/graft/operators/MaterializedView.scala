package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** A DURABLE maintained aggregate view over a snapshot table — the
  * composition the round's pieces exist for: [[IncrementalView]] is the
  * algebra (absorb signed deltas, never rescan the base), this operator
  * is the durability protocol. The view is ITSELF a [[SnapshotLog]]
  * table (keyed by the group column, |groups| rows, full-replacement
  * commits via [[SnapshotLog.overwrite]]) whose manifest carries
  * `asof=<baseVersion>` — the watermark of the last base version the
  * view has absorbed. That makes refresh:
  *
  *  - DELTA-BOUNDED: one [[SnapshotLog.cdcSigned]](asof, latest) scan
  *    (file-diff-sized) + the written view (|groups| rows), never the
  *    base table;
  *  - IDEMPOTENT / CRASH-SAFE: the watermark and the refreshed rows are
  *    one atomic manifest create, so a replayed refresh sees
  *    asof == latest and no-ops — there is no window where the rows
  *    moved but the watermark didn't (the [[graft.streaming.SnapshotStreams]]
  *    txn-stamp argument, applied to view maintenance);
  *  - AUDITABLE: every past view state time-travels like any snapshot
  *    version, each stamped with the exact base version it reflects.
  *
  * Measures are re-supplied at each refresh (Column expressions don't
  * serialize); the view's manifest stamps the measure NAMES, and refresh
  * refuses a mismatched set rather than silently maintaining different
  * math than the view was built with.
  */
object MaterializedView {

  private val AsofPrefix = "asof="
  private val MeasuresPrefix = "measures="
  private val BasePrefix = "basedir="

  /** The base version a view table's version `v` reflects. */
  def asof(spark: SparkSession, viewDir: String, v: Long): Long =
    SnapshotLog.manifestMeta(spark, viewDir, v).collectFirst {
      case m if m.startsWith(AsofPrefix) => m.stripPrefix(AsofPrefix).toLong
    }.getOrElse(sys.error(s"version $v of $viewDir has no $AsofPrefix stamp"))

  /** The view's STALENESS surface — what a user monitoring a maintained
    * aggregate actually watches: (asof watermark, base's latest version,
    * lag in versions). None when `viewDir` is not a materialized view
    * (no asof/basedir stamps — e.g. a plain snapshot table). Lag 0 =
    * current; lag N = the base committed N versions the view has not
    * absorbed. Manifest metadata only, no data read.
    */
  def staleness(spark: SparkSession, viewDir: String): Option[(Long, Long, Long)] = {
    val v = SnapshotLog.latestVersion(spark, viewDir)
    val meta = SnapshotLog.manifestMeta(spark, viewDir, v)
    for {
      from <- meta.collectFirst {
        case m if m.startsWith(AsofPrefix) => m.stripPrefix(AsofPrefix).toLong
      }
      base <- meta.collectFirst {
        case m if m.startsWith(BasePrefix) => m.stripPrefix(BasePrefix)
      }
    } yield {
      val latest = SnapshotLog.latestVersion(spark, base)
      (from, latest, latest - from)
    }
  }

  private def measureNames(spark: SparkSession, viewDir: String, v: Long): Seq[String] =
    SnapshotLog.manifestMeta(spark, viewDir, v).collectFirst {
      case m if m.startsWith(MeasuresPrefix) =>
        m.stripPrefix(MeasuresPrefix).split(",").toSeq.filter(_.nonEmpty)
    }.getOrElse(sys.error(s"version $v of $viewDir has no $MeasuresPrefix stamp"))

  private def stamps(baseV: Long, measures: Seq[(String, Column)],
      baseDir: String): Seq[String] =
    Seq(s"$AsofPrefix$baseV", s"$MeasuresPrefix${measures.map(_._1).mkString(",")}",
      s"$BasePrefix$baseDir")

  /** Build the view from the base's CURRENT version (the one full scan a
    * standing aggregate ever pays) and commit it as view version 0.
    */
  def create(spark: SparkSession, baseDir: String, viewDir: String,
      group: String, measures: Seq[(String, Column)],
      numFiles: Int = 1): SnapshotCommit = {
    val baseV = SnapshotLog.latestVersion(spark, baseDir)
    val view = IncrementalView.build(
      SnapshotLog.read(spark, baseDir, baseV), group, measures)
    SnapshotLog.init(spark, viewDir, view, group, numFiles,
      meta = stamps(baseV, measures, baseDir))
  }

  /** Absorb every base version committed since the view's watermark, in
    * ONE delta (cdcSigned composes across versions — the file diff of
    * asof vs latest). Returns None when the view is already current —
    * including the crashed-and-replayed refresh, which finds the
    * watermark its predecessor committed atomically with the rows.
    */
  def refresh(spark: SparkSession, baseDir: String, viewDir: String,
      measures: Seq[(String, Column)], numFiles: Int = 1): Option[SnapshotCommit] = {
    val viewV = SnapshotLog.latestVersion(spark, viewDir)
    val group = SnapshotLog.tableKey(spark, viewDir, viewV)
    val stamped = measureNames(spark, viewDir, viewV)
    require(stamped == measures.map(_._1),
      s"measure set drifted: view carries ${stamped.mkString(",")}, " +
        s"refresh supplied ${measures.map(_._1).mkString(",")}")
    val from = asof(spark, viewDir, viewV)
    val latest = SnapshotLog.latestVersion(spark, baseDir)
    if (latest == from) None
    else {
      val baseKey = SnapshotLog.tableKey(spark, baseDir, latest)
      val signed = SnapshotLog.cdcSigned(spark, baseDir, from, latest, baseKey)
      val next = IncrementalView.applyCdc(
        SnapshotLog.read(spark, viewDir, viewV), signed, group, measures)
      Some(SnapshotLog.overwrite(spark, viewDir, next, group, numFiles,
        meta = stamps(latest, measures, baseDir)))
    }
  }
}
