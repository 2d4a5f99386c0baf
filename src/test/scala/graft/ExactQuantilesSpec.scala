package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.ExactQuantiles

/** Histogram-based exact percentiles must equal Spark's builtin
  * `percentile` (the per-group value-buffer aggregate they replace in
  * q16/q21) bit-for-bit — including single-row and single-value groups,
  * the q = 0 / q = 1 boundaries, fractional interpolation positions, and
  * null values (ignored by both).
  */
class ExactQuantilesSpec extends SparkTestBase {

  private val qs = Seq(0.0 -> "q0", 0.37 -> "q37", 0.5 -> "q50",
    0.95 -> "q95", 1.0 -> "q100")

  private def builtin(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("g").agg(
      (count(lit(1)) - count(when(col("v").isNull, 1))).as("n"),
      qs.map { case (q, a) => percentile(col("v"), lit(q)).as(a) }: _*)

  private def compare(rows: Seq[(String, java.lang.Double)]): Unit = {
    import spark.implicits._
    val df = rows.toDF("g", "v")
    val got = ExactQuantiles.contByHistogram(df, Seq("g"), "v", qs)
      .orderBy("g").collect()
    val want = builtin(df).orderBy("g").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (a: Row, b: Row) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getLong(1) == b.getLong(1), s"n for group ${a.getString(0)}")
      (2 until a.length).foreach { i =>
        assert(a.getDouble(i) == b.getDouble(i),
          s"group ${a.getString(0)} quantile ${qs(i - 2)._1}: " +
            s"${a.getDouble(i)} != ${b.getDouble(i)}")
      }
    }
  }

  test("multi-group random integral domain matches builtin percentile") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map { _ =>
      (s"g${rnd.nextInt(4)}", java.lang.Double.valueOf(rnd.nextInt(10).toDouble))
    }
    compare(rows)
  }

  test("edge groups: single row, single distinct value, two values") {
    compare(Seq(
      ("solo", java.lang.Double.valueOf(42.0)),
      ("const", java.lang.Double.valueOf(7.0)),
      ("const", java.lang.Double.valueOf(7.0)),
      ("const", java.lang.Double.valueOf(7.0)),
      ("pair", java.lang.Double.valueOf(1.0)),
      ("pair", java.lang.Double.valueOf(2.0))))
  }

  test("nulls are ignored, matching the builtin") {
    compare(Seq(
      ("a", java.lang.Double.valueOf(1.0)),
      ("a", null),
      ("a", java.lang.Double.valueOf(3.0)),
      ("a", java.lang.Double.valueOf(5.0)),
      ("a", null)))
  }

  test("q16 over the fixture: histogram path equals the builtin aggregate") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val got = ExactQuantiles.contByHistogram(li, Seq("l_returnflag"),
        "l_quantity", Seq(0.5 -> "med", 0.95 -> "p95"))
      .orderBy("l_returnflag").collect()
    val want = li.groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        percentile(col("l_quantity"), lit(0.5)).as("med"),
        percentile(col("l_quantity"), lit(0.95)).as("p95"))
      .orderBy("l_returnflag").collect()
    assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
  }
}
