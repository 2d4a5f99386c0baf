package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.{IncrementalView, MaterializedView, Merge, SnapshotLog}
import graft.streaming.SnapshotStreams

/** The snapshot log's SOURCE side: the `_log` directory tailed as a file
  * stream, feeding per-version signed CDC deltas ([[SnapshotStreams
  * .readChanges]]) and continuous materialized-view maintenance
  * ([[SnapshotStreams.maintainView]]). The contract under test: the
  * stream-maintained view ≡ one batch refresh ≡ a from-scratch recompute,
  * across multiple commits and across stream restarts (replay safety via
  * the view's atomic asof watermark).
  */
class SnapshotStreamSourceSpec extends SparkTestBase {

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft_$tag").toString

  private def baseRows: DataFrame = {
    import spark.implicits._
    (1L to 100L).map(i => (i, s"g${i % 5}", i * 10)).toDF("id", "grp", "x")
  }

  /** Changeset r: update x for ids ≡ 0 (mod 7+r), delete ids ≡ 0 (mod
    * 9+r), insert fresh ids above the range — three DISTINCT changesets
    * so each commit moves different groups.
    */
  private def cs(r: Int): DataFrame = {
    import spark.implicits._
    val nullS = lit(null).cast("string")
    val nullL = lit(null).cast("bigint")
    val b = baseRows
    val upd = b.where(col("id") % (7 + r) === 0)
      .select(lit(Merge.OpUpdate).as("op"), col("id"), nullS.as("grp"),
        (col("x") + 1000 * (r + 1)).as("x"))
    val del = b.where(col("id") % (9 + r) === 0)
      .select(lit(Merge.OpDelete).as("op"), col("id"), nullS.as("grp"),
        nullL.as("x"))
    val ins = Seq((Merge.OpInsert, 1000L + r, s"new$r", 7L))
      .toDF("op", "id", "grp", "x")
    upd.unionByName(del).unionByName(ins)
  }

  private val measures = Seq("sum_x" -> col("x"))

  private def viewRows(df: DataFrame): Seq[String] =
    df.select("grp", "n", "sum_x").collect().map(_.mkString("|")).sorted.toSeq

  private def recompute(baseDir: String): DataFrame =
    IncrementalView.build(SnapshotLog.readLatest(spark, baseDir), "grp", measures)

  private def runMaintain(baseDir: String, viewDir: String, ckpt: String): Int = {
    var refreshes = 0
    val q = SnapshotStreams.maintainView(spark, baseDir, viewDir, measures)(
        _ => refreshes += 1)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    refreshes
  }

  test("stream-maintained view == batch refresh == from-scratch recompute across 3 commits") {
    val root = freshRoot("snapsrc")
    val baseDir = s"$root/base"
    val streamView = s"$root/view_stream"
    val batchView = s"$root/view_batch"
    SnapshotLog.init(spark, baseDir, baseRows, "id", numFiles = 2)
    MaterializedView.create(spark, baseDir, streamView, "grp", measures)
    MaterializedView.create(spark, baseDir, batchView, "grp", measures)

    (0 until 3).foreach(r => SnapshotLog.merge(spark, baseDir, cs(r), "id"))
    assert(SnapshotLog.latestVersion(spark, baseDir) == 3L)

    // continuous maintenance drains the commit feed
    runMaintain(baseDir, streamView, s"$root/ckpt")
    // one batch refresh absorbs the same range in one delta
    MaterializedView.refresh(spark, baseDir, batchView, measures)

    val expected = viewRows(recompute(baseDir))
    assert(viewRows(SnapshotLog.readLatest(spark, streamView)) == expected,
      "stream-maintained view diverged from from-scratch recompute")
    assert(viewRows(SnapshotLog.readLatest(spark, batchView)) == expected,
      "batch-refreshed view diverged from from-scratch recompute")
    // both views watermark at the base's latest version
    assert(MaterializedView.asof(spark, streamView,
      SnapshotLog.latestVersion(spark, streamView)) == 3L)
  }

  test("restart with the same checkpoint is a no-op; a new commit is absorbed incrementally") {
    val root = freshRoot("snapsrc2")
    val baseDir = s"$root/base"
    val viewDir = s"$root/view"
    val ckpt = s"$root/ckpt"
    SnapshotLog.init(spark, baseDir, baseRows, "id", numFiles = 2)
    MaterializedView.create(spark, baseDir, viewDir, "grp", measures)
    SnapshotLog.merge(spark, baseDir, cs(0), "id")
    runMaintain(baseDir, viewDir, ckpt)
    val vAfterFirst = SnapshotLog.latestVersion(spark, viewDir)
    assert(viewRows(SnapshotLog.readLatest(spark, viewDir)) ==
      viewRows(recompute(baseDir)))

    // replay: nothing new committed -> no refresh, no new view version
    val refreshes = runMaintain(baseDir, viewDir, ckpt)
    assert(refreshes == 0, "replayed stream refreshed an already-current view")
    assert(SnapshotLog.latestVersion(spark, viewDir) == vAfterFirst)

    // two more commits land; the restarted stream absorbs exactly them
    SnapshotLog.merge(spark, baseDir, cs(1), "id")
    SnapshotLog.merge(spark, baseDir, cs(2), "id")
    runMaintain(baseDir, viewDir, ckpt)
    assert(viewRows(SnapshotLog.readLatest(spark, viewDir)) ==
      viewRows(recompute(baseDir)))
    assert(MaterializedView.asof(spark, viewDir,
      SnapshotLog.latestVersion(spark, viewDir)) == 3L)
  }

  test("a stream starting on VACUUMED history bootstraps from its first visible version") {
    val root = freshRoot("snapsrc4")
    val baseDir = s"$root/base"
    SnapshotLog.init(spark, baseDir, baseRows, "id", numFiles = 2)
    SnapshotLog.merge(spark, baseDir, cs(0), "id")
    SnapshotLog.merge(spark, baseDir, cs(1), "id")
    // expire versions 0-1: a fresh consumer can only ever see v2
    SnapshotLog.vacuum(spark, baseDir, retainFrom = 2, graceMs = 0L)
    assert(SnapshotLog.versions(spark, baseDir) == Seq(2L))

    var deltas = Vector.empty[DataFrame]
    val q = SnapshotStreams.readChanges(spark, baseDir, "id") { (signed, _, _) =>
        deltas :+= signed
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val empty = IncrementalView.build(
      SnapshotLog.readLatest(spark, baseDir).limit(0), "grp", measures)
    val folded = IncrementalView.applyCdc(
      empty, deltas.reduce(_ unionByName _), "grp", measures)
    assert(viewRows(folded) == viewRows(recompute(baseDir)),
      "vacuumed-history bootstrap did not reproduce the live aggregate")
  }

  test("readChanges: folding the delivered signed deltas from empty reproduces the live table's aggregate") {
    val root = freshRoot("snapsrc3")
    val baseDir = s"$root/base"
    val ckpt = s"$root/ckpt"
    SnapshotLog.init(spark, baseDir, baseRows, "id", numFiles = 2)
    SnapshotLog.merge(spark, baseDir, cs(0), "id")

    var deltas = Vector.empty[DataFrame]
    var ranges = Vector.empty[(Long, Long)]
    def drain(): Unit = {
      val q = SnapshotStreams.readChanges(spark, baseDir, "id") { (signed, from, to) =>
          deltas :+= signed
          ranges :+= (from, to)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // first drain: bootstrap batch (v0 images + the 0→1 diff)
    drain()
    assert(ranges.nonEmpty && ranges.head._1 == 0L && ranges.last._2 == 1L)

    // more commits, second drain: the incremental (non-bootstrap) path
    SnapshotLog.merge(spark, baseDir, cs(1), "id")
    SnapshotLog.merge(spark, baseDir, cs(2), "id")
    drain()
    assert(ranges.last._2 == 3L, s"ranges did not reach the head: $ranges")
    // ranges tile the version line contiguously
    ranges.sliding(2).foreach {
      case Vector((_, a), (b, _)) => assert(b == a, s"gap in ranges: $ranges")
      case _                      => ()
    }

    // fold every delivered signed image into an EMPTY aggregate: the
    // result must equal the standing aggregate over the live table
    val empty = IncrementalView.build(
      SnapshotLog.read(spark, baseDir, 0L).limit(0), "grp", measures)
    val folded = IncrementalView.applyCdc(
      empty, deltas.reduce(_ unionByName _), "grp", measures)
    assert(viewRows(folded) == viewRows(recompute(baseDir)),
      "signed change feed did not reproduce the live aggregate")
  }

  test("readChanges: a stream started BEFORE table init bootstraps when v0 arrives in a later batch") {
    val root = freshRoot("snapsrc4")
    val baseDir = s"$root/base"
    val ckpt = s"$root/ckpt"
    // the stream tails _log before any commit exists; a stray non-manifest
    // file makes batch 0 fire (and commit) with zero VERSION rows — the
    // exact shape that used to burn the batchId==0 bootstrap window
    val log = new java.io.File(s"$baseDir/_log"); log.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$baseDir/_log/README"), "not a manifest\n")

    var deltas = Vector.empty[DataFrame]
    def drain(): Unit = {
      val q = SnapshotStreams.readChanges(spark, baseDir, "id") { (signed, _, _) =>
          deltas :+= signed
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain() // batch 0: no versions yet
    assert(deltas.isEmpty)

    SnapshotLog.init(spark, baseDir, baseRows, "id", numFiles = 2)
    SnapshotLog.merge(spark, baseDir, cs(0), "id")
    drain() // v0+v1 arrive at batchId >= 1: must bootstrap, not throw

    val empty = IncrementalView.build(
      SnapshotLog.read(spark, baseDir, 0L).limit(0), "grp", measures)
    val folded = IncrementalView.applyCdc(
      empty, deltas.reduce(_ unionByName _), "grp", measures)
    assert(viewRows(folded) == viewRows(recompute(baseDir)),
      "late-v0 bootstrap did not reproduce the live aggregate")
  }
}
