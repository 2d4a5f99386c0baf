package graft

import java.nio.file.Files
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.{IncrementalView, Merge, SnapshotLog}

/** Incremental view maintenance from the snapshot log's signed CDC:
  * maintenance ≡ recompute across chained merges, the group-move double
  * entry, emptied/created groups, the MoR-delete path, and the scan
  * bound (never a shared data file).
  */
class IncrementalViewSpec extends SparkTestBase {

  import spark.implicits._

  private val measures: Seq[(String, Column)] = Seq("sum_x" -> col("x"))

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("graft_ivm").toString + "/t"
    // groups g1 (ids 1-10), g2 (ids 11-20); x = id
    val df = (1L to 20L).map(i => (i, if (i <= 10) "g1" else "g2", i))
      .toDF("id", "g", "x")
    SnapshotLog.init(spark, dir, df, "id", numFiles = 4)
    dir
  }

  private def viewRows(df: DataFrame): Map[String, (Long, Long)] =
    df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def recompute(dir: String, v: Long): DataFrame =
    IncrementalView.build(SnapshotLog.read(spark, dir, v), "g", measures)

  test("chained maintenance across two merges equals recompute (moves, empties, creates)") {
    val dir = freshTable()
    val view0 = recompute(dir, 0L)

    // merge A: an update that MOVES id 3 from g1 to g2 and changes x,
    // a delete, and an insert creating a brand-new group g3
    val csA = Seq(
      (Merge.OpUpdate, 3L, "g2", Some(300L)),
      (Merge.OpDelete, 7L, null.asInstanceOf[String], None: Option[Long]),
      (Merge.OpInsert, 100L, "g3", Some(1000L)))
      .toDF("op", "id", "g", "x")
    SnapshotLog.merge(spark, dir, csA, "id")
    val view1 = IncrementalView.applyCdc(view0,
      SnapshotLog.cdcSigned(spark, dir, 0L, 1L, "id"), "g", measures)
    assert(viewRows(view1) == viewRows(recompute(dir, 1L)))
    // the double entry landed: g1 lost ids 3 and 7, g2 gained x=300
    assert(viewRows(view1)("g1") == (8L, (1L to 10L).sum - 3L - 7L))
    assert(viewRows(view1)("g2") == (11L, (11L to 20L).sum + 300L))
    assert(viewRows(view1)("g3") == (1L, 1000L))

    // merge B on top of the MAINTAINED view (chained — never recompute):
    // empty g3 out entirely, partial-update x of id 4 (null g keeps g1)
    val csB = Seq(
      (Merge.OpDelete, 100L, null.asInstanceOf[String], None: Option[Long]),
      (Merge.OpUpdate, 4L, null.asInstanceOf[String], Some(40L)))
      .toDF("op", "id", "g", "x")
    SnapshotLog.merge(spark, dir, csB, "id")
    val view2 = IncrementalView.applyCdc(view1,
      SnapshotLog.cdcSigned(spark, dir, 1L, 2L, "id"), "g", measures)
    assert(viewRows(view2) == viewRows(recompute(dir, 2L)))
    assert(!viewRows(view2).contains("g3"), "emptied group must vanish (n=0)")
  }

  test("MoR delete maintenance: the B-part signed rows debit their groups") {
    val dir = freshTable()
    val view0 = recompute(dir, 0L)
    SnapshotLog.deleteKeys(spark, dir, Seq(1L, 2L, 15L, 999L).toDF("id"), "id")
    val view1 = IncrementalView.applyCdc(view0,
      SnapshotLog.cdcSigned(spark, dir, 0L, 1L, "id"), "g", measures)
    assert(viewRows(view1) == viewRows(recompute(dir, 1L)))
    assert(viewRows(view1)("g1") == (8L, (3L to 10L).sum))
    assert(viewRows(view1)("g2") == (9L, (11L to 20L).sum - 15L))
  }

  test("cdcSigned is consistent with cdc: per-key sign pattern maps to the op") {
    val dir = freshTable()
    val cs = Seq(
      (Merge.OpUpdate, 5L, "g1", Some(50L)),
      (Merge.OpDelete, 12L, null.asInstanceOf[String], None: Option[Long]),
      (Merge.OpInsert, 200L, "g2", Some(7L)))
      .toDF("op", "id", "g", "x")
    SnapshotLog.merge(spark, dir, cs, "id")
    val signedOps = SnapshotLog.cdcSigned(spark, dir, 0L, 1L, "id")
      .groupBy("id").agg(collect_set("__sign").as("signs"))
      .collect().map { r =>
        val s = r.getSeq[Int](1).toSet
        val op = if (s == Set(-1, 1)) Merge.OpUpdate
          else if (s == Set(-1)) Merge.OpDelete else Merge.OpInsert
        r.getLong(0) -> op
      }.toMap
    val cdcOps = SnapshotLog.cdc(spark, dir, 0L, 1L, "id")
      .select("id", "op").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(signedOps == cdcOps)
    assert(cdcOps == Map(5L -> Merge.OpUpdate, 12L -> Merge.OpDelete,
      200L -> Merge.OpInsert))
  }

  test("maintenance scans the delta footprint only — never a shared data file") {
    val dir = freshTable()
    // the standing view is a WRITTEN table (m14 stages it the same way) —
    // an unstaged view's lineage would re-scan every v0 file
    val viewDir = Files.createTempDirectory("graft_ivm_view").toString
    recompute(dir, 0L).write.mode("overwrite").parquet(viewDir)
    val view0 = spark.read.parquet(viewDir)
    val cs = Seq((Merge.OpUpdate, 1L, null.asInstanceOf[String], Some(99L)))
      .toDF("op", "id", "g", "x")
    SnapshotLog.merge(spark, dir, cs, "id")
    val shared = SnapshotLog.manifest(spark, dir, 0).toSet &
      SnapshotLog.manifest(spark, dir, 1).toSet
    assert(shared.nonEmpty, "fixture degenerate: narrow merge shared nothing")
    val maintained = IncrementalView.applyCdc(view0,
      SnapshotLog.cdcSigned(spark, dir, 0L, 1L, "id"), "g", measures)
    val scanned = maintained.inputFiles
      .map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
    assert(scanned.intersect(shared).isEmpty,
      s"maintenance read shared base files: ${scanned.intersect(shared)}")
    assert(viewRows(maintained) == viewRows(recompute(dir, 1L)))
  }
}
