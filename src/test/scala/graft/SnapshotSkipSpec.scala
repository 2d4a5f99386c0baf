package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import graft.operators.SnapshotLog
import graft.sources.SnapshotFileIndex

/** Manifest-stat file skipping on snapshot reads: the tri-state interval
  * evaluator, the FileIndex pruning decision, the executed-plan fact
  * (numFiles metric), and end-to-end equality with the unpruned answer —
  * including through delete vectors, Z-order second-dimension stamps and
  * the catalog SQL path.
  */
class SnapshotSkipSpec extends SparkTestBase {

  private def id = AttributeReference("id", LongType)()
  private def other = AttributeReference("x", StringType)()
  private val caseInsensitive: (String, String) => Boolean =
    (a, b) => a.equalsIgnoreCase(b)

  private def ev(e: Expression, lo: Long, hi: Long): Option[Boolean] =
    SnapshotFileIndex.evalOnRanges(e, Map("id" -> (lo, hi)), caseInsensitive)

  test("interval verdicts: comparison atoms, both operand orders") {
    // file holds keys [10, 20]
    assert(ev(EqualTo(id, Literal(5L)), 10, 20).contains(false))
    assert(ev(EqualTo(id, Literal(15L)), 10, 20).isEmpty)
    assert(ev(EqualTo(Literal(15L), id), 10, 20).isEmpty)
    assert(ev(EqualTo(id, Literal(15L)), 15, 15).contains(true))
    assert(ev(LessThan(id, Literal(10L)), 10, 20).contains(false))
    assert(ev(LessThan(id, Literal(25L)), 10, 20).contains(true))
    assert(ev(LessThan(id, Literal(15L)), 10, 20).isEmpty)
    assert(ev(LessThanOrEqual(id, Literal(9L)), 10, 20).contains(false))
    assert(ev(LessThanOrEqual(id, Literal(20L)), 10, 20).contains(true))
    assert(ev(GreaterThan(id, Literal(20L)), 10, 20).contains(false))
    assert(ev(GreaterThan(id, Literal(9L)), 10, 20).contains(true))
    assert(ev(GreaterThanOrEqual(id, Literal(10L)), 10, 20).contains(true))
    assert(ev(GreaterThanOrEqual(id, Literal(21L)), 10, 20).contains(false))
    // reversed operands flip the comparison
    assert(ev(LessThan(Literal(25L), id), 10, 20).contains(false)) // 25 < id
    assert(ev(GreaterThan(Literal(25L), id), 10, 20).contains(true)) // 25 > id
    // int literal against long key still participates
    assert(ev(EqualTo(id, Literal(5, IntegerType)), 10, 20).contains(false))
  }

  test("interval verdicts: IN, Kleene AND/OR/NOT, unsupported -> unknown") {
    assert(ev(In(id, Seq(Literal(1L), Literal(2L))), 10, 20).contains(false))
    assert(ev(In(id, Seq(Literal(1L), Literal(15L))), 10, 20).isEmpty)
    assert(ev(In(id, Seq(Literal(1L), Literal(15L))), 15, 15).contains(true))
    assert(ev(InSet(id, Set[Any](1L, 2L)), 10, 20).contains(false))
    // And short-circuits on definite-false even when the other side is unknown
    val unknown = EqualTo(other, Literal("a"))
    assert(ev(And(unknown, EqualTo(id, Literal(5L))), 10, 20).contains(false))
    assert(ev(And(unknown, EqualTo(id, Literal(15L))), 10, 20).isEmpty)
    // Or needs both sides definite-false to prune
    assert(ev(Or(EqualTo(id, Literal(5L)), EqualTo(id, Literal(25L))), 10, 20)
      .contains(false))
    assert(ev(Or(unknown, EqualTo(id, Literal(5L))), 10, 20).isEmpty)
    // Not of definite-true is definite-false (whole-range semantics)
    assert(ev(Not(LessThan(id, Literal(25L))), 10, 20).contains(false))
    assert(ev(Not(EqualTo(id, Literal(15L))), 10, 20).isEmpty)
    // null literal never participates
    assert(ev(EqualTo(id, Literal(null, LongType)), 10, 20).isEmpty)
    assert(ev(IsNull(id), 10, 20).isEmpty)
  }

  test("EqualNullSafe never skips on min/max alone: stamps are blind to nulls") {
    // a file stamped [5, 5] may ALSO hold nulls (parquet min/max exclude
    // them): `NOT (col <=> 5)` / `col IS DISTINCT FROM 5` is TRUE on
    // those null rows, so an eq-style Some(true) verdict would flip to
    // Some(false) under Not and silently drop them. Without a null count
    // the only sound verdict is unknown — in BOTH directions and on both
    // operand orders.
    assert(ev(EqualNullSafe(id, Literal(5L)), 5, 5).isEmpty)
    assert(ev(EqualNullSafe(Literal(5L), id), 5, 5).isEmpty)
    assert(ev(EqualNullSafe(id, Literal(99L)), 5, 5).isEmpty)
    assert(ev(Not(EqualNullSafe(id, Literal(5L))), 5, 5).isEmpty)
    assert(ev(Not(EqualNullSafe(id, Literal(99L))), 5, 5).isEmpty)
  }

  test("multi-column verdicts: each atom prunes on its own column's range") {
    val grp = AttributeReference("grp", LongType)()
    val ranges = Map("id" -> (10L, 20L), "grp" -> (3L, 3L))
    def ev2(e: Expression) = SnapshotFileIndex.evalOnRanges(e, ranges, caseInsensitive)
    assert(ev2(EqualTo(grp, Literal(4L))).contains(false))
    assert(ev2(EqualTo(grp, Literal(3L))).contains(true))
    assert(ev2(And(EqualTo(grp, Literal(3L)), EqualTo(id, Literal(15L)))).isEmpty)
    assert(ev2(And(EqualTo(grp, Literal(3L)), EqualTo(id, Literal(5L)))).contains(false))
  }

  // ---- end-to-end over a real snapshot table --------------------------

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"skip-$tag").toString + "/t"

  private def fixture(n: Int = 800): DataFrame = {
    import spark.implicits._
    (0L until n).map(i => (i, s"row$i", (i % 7).toInt)).toDF("id", "x", "grp")
  }

  private def scansIn(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
    p.collect {
      case f: FileSourceScanExec => Seq(f)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scansIn(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scansIn(q.plan)
    }.flatten

  /** The SnapshotFileIndex-backed scan of an executed frame (a MoR read
    * also scans its delete-vector files — those use a plain listing).
    */
  private def scanOf(df: DataFrame): FileSourceScanExec = {
    df.collect() // populate metrics
    val scans = scansIn(df.queryExecution.executedPlan)
      .filter(_.relation.location.isInstanceOf[SnapshotFileIndex])
    assert(scans.size == 1,
      s"expected one snapshot scan, got ${scans.size}:\n" +
        df.queryExecution.executedPlan.treeString)
    scans.head
  }

  private def filesRead(df: DataFrame): Long =
    scanOf(df).metrics("numFiles").value

  test("key predicates skip whole files at planning time; answers unchanged") {
    val dir = freshDir("e2e")
    SnapshotLog.init(spark, dir, fixture(), "id", numFiles = 8)
    val full = SnapshotLog.read(spark, dir, 0L)
    assert(filesRead(full) == 8) // no predicate: nothing skipped

    val point = SnapshotLog.read(spark, dir, 0L).where(col("id") === 42L)
    assert(filesRead(point) == 1, "a point query must open exactly 1 file")
    assert(point.select("x").as[String](spark.implicits.newStringEncoder)
      .collect().toSeq == Seq("row42"))

    val range = SnapshotLog.read(spark, dir, 0L)
      .where(col("id") >= 0L && col("id") < 100L)
    assert(filesRead(range) == 1, "a 100-of-800 range must open 1 of 8 files")
    assert(range.count() == 100)

    val in = SnapshotLog.read(spark, dir, 0L)
      .where(col("id").isin(5L, 790L))
    assert(filesRead(in) == 2, "a 2-point IN must open 2 files")
    assert(in.count() == 2)

    // a predicate on a NON-stamped column keeps every file but stays correct
    val nonKey = SnapshotLog.read(spark, dir, 0L).where(col("x") === "row7")
    assert(filesRead(nonKey) == 8)
    assert(nonKey.count() == 1)

    // empty-result predicate: all files skipped
    val none = SnapshotLog.read(spark, dir, 0L).where(col("id") === 100000L)
    assert(filesRead(none) == 0)
    assert(none.count() == 0)
  }

  test("skipping composes with delete vectors and survives merges") {
    import spark.implicits._
    val dir = freshDir("mor")
    SnapshotLog.init(spark, dir, fixture(), "id", numFiles = 8)
    SnapshotLog.deleteKeys(spark, dir, Seq(42L, 43L).toDF("id"), "id")
    val v = SnapshotLog.latestVersion(spark, dir)
    val got = SnapshotLog.read(spark, dir, v).where(col("id").between(40L, 45L))
    assert(got.select("id").as[Long].collect().sorted.toSeq ==
      Seq(40L, 41L, 44L, 45L)) // masked keys absent through the pruned scan

    // a merge commits fresh files with fresh stamps; pruning still plans
    val cs = Seq(("insert", 5000L, "new", 1)).toDF("op", "id", "x", "grp")
    SnapshotLog.merge(spark, dir, cs, "id")
    val v2 = SnapshotLog.latestVersion(spark, dir)
    val hi = SnapshotLog.read(spark, dir, v2).where(col("id") === 5000L)
    assert(hi.count() == 1)
    val all = SnapshotLog.read(spark, dir, v2)
    assert(all.count() == 799) // 800 - 2 deleted + 1 inserted
  }

  test("Z-order stamps let reads skip on the SECOND dimension; carried by MoR deletes") {
    import spark.implicits._
    val dir = freshDir("zord")
    // two roughly-independent long dims so the Morton layout splits both
    val rows = (0L until 1024L).map(i => (i, (i * 37L) % 1024L, s"r$i"))
      .toDF("id", "d2", "x")
    SnapshotLog.init(spark, dir, rows, "id", numFiles = 4)
    SnapshotLog.compactZ(spark, dir, "id", "d2", numFiles = 16)
    val v = SnapshotLog.latestVersion(spark, dir)

    // point filter on the second dimension: a key-sorted layout reads all
    // 16 files (d2 spans the domain in each); the z-layout + colrange
    // stamps must skip most of them
    val byD2 = SnapshotLog.read(spark, dir, v).where(col("d2") === 111L)
    assert(filesRead(byD2) <= 8, "second-dimension filter must skip files")
    assert(byD2.select("id").as[Long].collect().toSeq ==
      Seq((0L until 1024L).find(i => (i * 37L) % 1024L == 111L).get))

    // the key still prunes (curve-segmented, wider but bounded ranges)
    val byKey = SnapshotLog.read(spark, dir, v).where(col("id") === 5L)
    assert(filesRead(byKey) <= 8)
    assert(byKey.count() == 1)

    // a reference-only commit (MoR delete) carries the colrange stamps
    SnapshotLog.deleteKeys(spark, dir, Seq(0L).toDF("id"), "id")
    val v2 = SnapshotLog.latestVersion(spark, dir)
    val afterDel = SnapshotLog.read(spark, dir, v2).where(col("d2") === 111L)
    assert(filesRead(afterDel) <= 8, "colrange stamps must survive a MoR delete")
    assert(afterDel.count() == 1)
  }

  test("catalog SQL reads skip through the resolution rule") {
    val warehouse = Files.createTempDirectory("skip-cat").toString
    spark.conf.set("spark.graft.catalog.location", warehouse)
    try {
      fixture().createOrReplaceTempView("skip_src")
      spark.sql("CREATE TABLE graft.skiptest TBLPROPERTIES ('key'='id') " +
        "AS SELECT * FROM skip_src")
      val q = spark.sql("SELECT x FROM graft.skiptest WHERE id = 42")
      assert(filesRead(q) <= 2, // CTAS sizes files by data volume, >= 1 file
        "identifier read with a key predicate must skip non-matching files")
      assert(q.collect().map(_.getString(0)).toSeq == Seq("row42"))
    } finally spark.sql("DROP TABLE IF EXISTS graft.skiptest")
  }

  test("unstamped files are never skipped; evolved schema reads through") {
    import spark.implicits._
    val dir = freshDir("evo")
    SnapshotLog.init(spark, dir, fixture(200), "id", numFiles = 4)
    // evolve: add a column via schema-evolving merge
    val cs = Seq(("insert", 9000L, "wide", 3, 1.5)).toDF("op", "id", "x", "grp", "w")
    SnapshotLog.merge(spark, dir, cs, "id")
    val v = SnapshotLog.latestVersion(spark, dir)
    val got = SnapshotLog.read(spark, dir, v).where(col("id") < 10L)
    assert(got.columns.contains("w"))
    assert(got.count() == 10)
    assert(got.where(col("w").isNotNull).count() == 0) // old files read through
    val wide = SnapshotLog.read(spark, dir, v).where(col("id") === 9000L)
    assert(wide.select("w").head().getDouble(0) == 1.5)
  }
}
