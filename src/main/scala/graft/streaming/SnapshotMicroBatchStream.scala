package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.CatalystBridge
import org.apache.spark.sql.types.StructType
import graft.operators.{Merge, SnapshotLog}

/** A snapshot-log version as a structured-streaming offset: the stream's
  * progress IS "every version at or below v has been delivered", so
  * offsets are just the log's own version numbers — nothing to invent,
  * and checkpoint restart resumes from the committed version with no
  * extra bookkeeping.
  */
final case class VersionOffset(version: Long) extends Offset {
  override def json: String = s"""{"version":$version}"""
}

object VersionOffset {
  private val Re = """\{\s*"version"\s*:\s*(-?\d+)\s*\}""".r
  def fromJson(s: String): VersionOffset = s match {
    case Re(v) => VersionOffset(v.toLong)
    case other => throw new IllegalArgumentException(
      s"not a snapshot version offset: $other")
  }
}

/** DSv2 MICRO_BATCH_READ over a snapshot-log table — what makes
  * `spark.readStream.table("graft.t")` work, the read-side twin of
  * [[SnapshotStreamingWrite]]'s `toTable` ingest (the two halves of a
  * by-name CDC pipeline). Offsets are log versions; each micro-batch
  * delivers the rows versions `(start, end]` ADDED:
  *
  *  - The FIRST batch bootstraps with the earliest still-committed
  *    version's full content (the stream's starting snapshot), plus the
  *    inserts of any later versions already committed — exactly
  *    [[SnapshotStreams.readChanges]]'s bootstrap contract, so a
  *    consumer folding the feed from empty converges on the table.
  *  - Every later batch is the net `op='insert'` after-images of its
  *    version range ([[SnapshotLog.cdc]] — file-diff bounded, never a
  *    table scan). A range whose net effect UPDATES or DELETES rows
  *    fails loudly: the visible schema is the table's own rows (DSv2
  *    streams a table's schema, not a change-image schema), so
  *    update/delete semantics cannot be represented — the same
  *    append-only default contract Delta's streaming source ships.
  *    `.option("skipChangeCommits", "true")` opts into dropping the
  *    non-insert images instead; full signed-image CDC consumption
  *    stays on [[SnapshotStreams.readChanges]].
  *  - A mid-stream start version that was VACUUMED fails loudly (the
  *    retention contract [[SnapshotStreams.readChanges]] pins); only
  *    the initial batch may fall forward to the earliest survivor.
  *
  * Execution is stage-and-scan: `planInputPartitions` materializes the
  * batch's delta ONCE as parquet under the query's checkpoint scratch
  * (a distributed job over delta-sized inputs — the CDC join cannot be
  * expressed file-at-a-time), and the micro-batch scan serves the staged
  * files through Spark's own parquet reader. Staging is keyed by the
  * offset range and kept until the batch COMMITS, so a crash-replayed
  * batch re-reads the identical bytes (or re-materializes them from the
  * same committed versions — both deterministic); `commit(end)` reclaims
  * every staged range at or below the committed version.
  */
final class SnapshotMicroBatchStream(dir: String, key: String,
    streamSchema: StructType, checkpointLocation: String,
    skipChangeCommits: Boolean, maxVersionsPerTrigger: Option[Int] = None,
    startingVersion: Option[Long] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  maxVersionsPerTrigger.foreach(k =>
    require(k >= 1, s"maxVersionsPerTrigger must be >= 1, got $k"))
  startingVersion.foreach(v =>
    require(v >= 0, s"startingVersion must be >= 0, got $v"))

  private def spark = SparkSession.active
  private val scratchRoot = new Path(checkpointLocation, "graft-delta")

  /** The earliest surviving version, resolved ONCE per run: it is only
    * consulted for the initial batch's bootstrap (every later batch
    * starts from a committed offset), and it only ever moves on vacuum —
    * re-listing the whole `_log` on every trigger would put an
    * O(#commits) directory walk in the steady-state path for a value the
    * steady state never reads.
    */
  private lazy val earliestSurviving: Long = {
    val vs = SnapshotLog.versions(spark, dir)
    if (vs.isEmpty) throw new IllegalStateException(
      s"$dir has no committed versions — initialize the table before " +
        "streaming it")
    vs.head
  }

  /** Trigger.AvailableNow bound: versions committed after the query
    * started are left for the next run.
    */
  @volatile private var availableNowBound: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowBound = Some(SnapshotLog.latestVersion(spark, dir))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** The stream's first offset. Default: -1, the "bootstrap with the
    * earliest surviving snapshot" sentinel. With `startingVersion=v` the
    * stream starts at offset v-1 instead — the first batch delivers the
    * inserts of version v onward and NO snapshot bootstrap ("subscribe
    * from v"); v=0 keeps the sentinel but pins the bootstrap to version
    * 0 exactly (a vacuumed v0 fails instead of falling forward).
    */
  override def initialOffset(): Offset =
    VersionOffset(startingVersion.fold(-1L)(_ - 1L))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this")

  /** Admission control: the batch never advances past the AvailableNow
    * snapshot, and `maxVersionsPerTrigger` caps how many versions one
    * micro-batch composes (bounding each batch's delta materialization —
    * a stream catching up on a long backlog then paces itself instead of
    * folding the whole history into one giant batch). The initial batch
    * counts its bootstrap as one version.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val live = SnapshotLog.latestVersion(spark, dir)
    val bound = availableNowBound.fold(live)(math.min(live, _))
    val from = start.asInstanceOf[VersionOffset].version
    val paced = maxVersionsPerTrigger.fold(bound) { k =>
      // the initial batch's bootstrap (the earliest SURVIVING version)
      // counts as one version — stepping from -1 blindly would hand a
      // vacuumed-prefix table an offset below its earliest survivor
      val stepped =
        if (from < 0L) earliestSurviving + (k - 1L)
        else from + k
      math.min(bound, stepped)
    }
    // never step backwards: a startingVersion ahead of the live log (or
    // an AvailableNow bound behind a restored checkpoint) means "no new
    // data", not a negative batch
    VersionOffset(math.max(paced, from))
  }

  override def deserializeOffset(json: String): Offset =
    VersionOffset.fromJson(json)

  /** Materialize one batch's rows (the class contract's delta) to the
    * stage dir, aligned to the stream's frozen schema — a table widened
    * mid-stream keeps streaming its frozen projection; the new columns
    * arrive on a fresh stream. The CDC frame is pinned across its two
    * driver jobs (the change guard + the staging write) and always
    * unpinned on exit.
    */
  private def stageBatch(s: SparkSession, from: Long, to: Long, stage: Path): Unit = {
    val frozen = streamSchema.map(f => col(f.name))
    var pinned: Option[DataFrame] = None
    def inserts(v0: Long): DataFrame = {
      val delta = SnapshotLog.cdc(s, dir, v0, to, key).persist()
      pinned = Some(delta)
      if (!skipChangeCommits &&
          !delta.where(col("op") =!= Merge.OpInsert).isEmpty)
        throw new IllegalStateException(
          s"versions ($v0, $to] of $dir update or delete existing rows; " +
            "a table stream delivers appended rows only. Set option " +
            "skipChangeCommits=true to drop the changes, or consume " +
            "signed change images via SnapshotStreams.readChanges")
      delta.where(col("op") === Merge.OpInsert).drop("op")
    }
    try {
      val df =
        if (from < 0L) {
          // initial batch: bootstrap from the earliest SURVIVING version
          // (a table whose early versions were vacuumed before the stream
          // ever started has nothing older to owe it) — unless the
          // consumer pinned startingVersion=0, where falling forward
          // would silently misrepresent "every change since the table
          // was born"
          val lowest = earliestSurviving
          if (startingVersion.contains(0L) && lowest != 0L)
            throw new IllegalStateException(
              s"startingVersion=0 of $dir was vacuumed (earliest " +
                s"surviving version is $lowest) — start from a retained " +
                "version, or omit the option to bootstrap from the " +
                "earliest survivor")
          val boot = SnapshotLog.read(s, dir, lowest)
          if (to > lowest) boot.unionByName(inserts(lowest)) else boot
        } else {
          require(SnapshotLog.versions(s, dir).contains(from),
            s"version $from of $dir was vacuumed while this stream still " +
              "needed it (a startingVersion needs its predecessor's " +
              "manifest retained too) — pin vacuum retention above every " +
              "streaming consumer (SnapshotLog.vacuum's reader contract)")
          inserts(from)
        }
      df.select(frozen: _*).write.mode("overwrite").parquet(stage.toString)
    } finally pinned.foreach(_.unpersist())
  }

  /** Stage dir for one offset range — deterministic, so a replayed batch
    * finds (or identically rebuilds) its bytes.
    */
  private def stageDirOf(from: Long, to: Long): Path =
    new Path(scratchRoot, s"v$from-$to")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = spark
    val from = start.asInstanceOf[VersionOffset].version
    val to = end.asInstanceOf[VersionOffset].version
    if (to <= from) return Array.empty
    val stage = stageDirOf(from, to)
    val hfs = stage.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!hfs.exists(new Path(stage, "_SUCCESS")))
      stageBatch(s, from, to, stage)
    hfs.listStatus(stage).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => SnapshotDeltaPartition(st.getPath.toString, st.getLen): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SnapshotDeltaReaderFactory(
      CatalystBridge.parquetRowReader(spark, streamSchema))

  override def commit(end: Offset): Unit = {
    val committed = end.asInstanceOf[VersionOffset].version
    val s = spark
    val hfs = scratchRoot.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (hfs.exists(scratchRoot)) {
      val Range = """v(-?\d+)-(-?\d+)""".r
      hfs.listStatus(scratchRoot).foreach { st =>
        st.getPath.getName match {
          case Range(_, to) if to.toLong <= committed =>
            hfs.delete(st.getPath, true)
          case _ => ()
        }
      }
    }
  }

  override def stop(): Unit = {
    // best-effort: an uncommitted batch re-materializes deterministically
    // from the log on restart, so the scratch carries no required state
    try {
      val hfs = scratchRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      hfs.delete(scratchRoot, true)
      ()
    } catch { case _: Throwable => () }
  }
}

/** One staged delta file; whole-file granularity (delta files are
  * write-sized — one per shuffle task of the staging job).
  */
final case class SnapshotDeltaPartition(path: String, length: Long)
    extends InputPartition

/** Serializable wrapper around Spark's own parquet row reader (built on
  * the driver by [[CatalystBridge.parquetRowReader]] — it carries the
  * broadcast hadoop conf).
  */
final class SnapshotDeltaReaderFactory(
    read: org.apache.spark.sql.execution.datasources.PartitionedFile =>
      Iterator[InternalRow])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SnapshotDeltaPartition]
    new PartitionReader[InternalRow] {
      private val it = read(CatalystBridge.wholeFile(p.path, p.length))
      private var row: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { row = it.next(); true } else false
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
