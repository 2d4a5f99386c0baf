package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Bucketed layout: the join/agg shuffle is paid at write time, after
  * which equi-joins and aggregations on the bucket keys plan ZERO
  * exchanges — the repeated-big-join lever for 100 TB tables.
  */
class BucketingSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def withNoBroadcast[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, old)
  }

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("isFinalPlan=false"), s"plan did not finalize:\n$p")
    p
  }

  test("co-bucketed tables join and aggregate with zero exchanges") {
    val tmp = Files.createTempDirectory("graft-bucketing-").toString
    try {
      Bucketing.writeBucketed(Tables.orders(spark, dir),
        "orders_bkt", s"$tmp/orders", Seq("o_custkey"), numBuckets = 8)
      Bucketing.writeBucketed(Tables.customer(spark, dir),
        "customer_bkt", s"$tmp/customer", Seq("c_custkey"), numBuckets = 8)

      withNoBroadcast {
        val joined = Bucketing.readBucketed(spark, "orders_bkt")
          .join(Bucketing.readBucketed(spark, "customer_bkt"),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"))
        val p = executedPlan(joined)
        assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
          s"expected a non-broadcast equi-join:\n$p")
        // the join itself is exchange-free: both scans already report
        // HashPartitioning on the bucket key. The only exchange allowed is
        // the one for the low-cardinality mktsegment aggregation.
        val exchanges = "Exchange hashpartitioning\\(([a-z_]+)".r
          .findAllMatchIn(p).map(_.group(1)).toList
        assert(!exchanges.exists(c => c == "o_custkey" || c == "c_custkey"),
          s"bucketed join still shuffles on the bucket key:\n$p")

        // same result as the plain parquet join
        val expected = Tables.orders(spark, dir)
          .join(Tables.customer(spark, dir),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got == expected)
      }

      // aggregation keyed on the bucket column: no exchange at all
      val agg = Bucketing.readBucketed(spark, "orders_bkt")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      val pAgg = executedPlan(agg)
      assert(!pAgg.contains("Exchange hashpartitioning"),
        s"bucket-keyed aggregation must not shuffle:\n$pAgg")
      // a never-registered table fails loudly instead of silently
      // degrading to a layout-less parquet read
      val e = intercept[IllegalArgumentException] {
        Bucketing.readBucketed(spark, "no_such_bkt")
      }
      assert(e.getMessage.contains("not in the catalog"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}
