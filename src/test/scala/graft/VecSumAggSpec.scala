package graft

import org.apache.spark.sql.functions._
import graft.functions.VecSumAgg

/** Typed vector-sum Aggregator: element-wise exact integer sums with
  * map-side partial aggregation (SURVEY §2.8's centroid aggregator).
  */
class VecSumAggSpec extends SparkTestBase {

  test("element-wise sum per group equals per-component sums") {
    import spark.implicits._
    val df = Seq(
      (0, Seq(1L, 2L, 3L)),
      (0, Seq(10L, 20L, 30L)),
      (1, Seq(5L, 5L, 5L)),
      (1, Seq(-1L, 0L, 1L)),
      (1, Seq(100L, 200L, 300L))).toDF("cell", "q")
    val got = df.repartition(4) // force merge() across partial buffers
      .groupBy("cell").agg(VecSumAgg.vecSum(col("q")).as("sq"))
      .orderBy("cell").collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1))
    assert(got.toSeq == Seq(0 -> Seq(11L, 22L, 33L), 1 -> Seq(104L, 205L, 306L)))
  }

  test("agrees with the unrolled per-component sum aggregation") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 3, Seq(i.toLong, (i * i).toLong, -i.toLong)))
      .toDF("cell", "q")
    val viaAgg = df.groupBy("cell").agg(VecSumAgg.vecSum(col("q")).as("sq"))
    val viaCols = df.groupBy("cell").agg(
      array((0 until 3).map(i => sum(element_at(col("q"), i + 1))): _*).as("sq"))
    assert(viaAgg.orderBy("cell").collect().map(_.getSeq[Long](1)).toSeq ==
      viaCols.orderBy("cell").collect().map(_.getSeq[Long](1)).toSeq)
  }
}
