package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the no-shuffle join path for recurring big
  * joins (SURVEY §2.4): two tables bucketed by the join key into the same
  * bucket count join WITHOUT an Exchange on either side. At 100 TB this
  * is the difference between shuffling both fact tables per query and
  * shuffling neither, amortizing the layout cost at write time.
  */
class BucketingSpec extends SparkTestBase {

  test("join of co-bucketed tables plans no exchange on either side") {
    import spark.implicits._
    val bcastKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(bcastKey)
    spark.conf.set(bcastKey, "-1") // force a non-broadcast join for the demo
    try {
      spark.sql("DROP TABLE IF EXISTS graft_bucket_l")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_r")
      (1 to 1000).map(i => (i.toLong % 50, i)).toDF("k", "v")
        .write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_bucket_l")
      (1 to 500).map(i => (i.toLong % 50, s"r$i")).toDF("k", "name")
        .write.bucketBy(8, "k").saveAsTable("graft_bucket_r")

      val joined = spark.table("graft_bucket_l")
        .join(spark.table("graft_bucket_r"), "k")
      // execute THIS df so its AQE plan finalizes before inspection
      assert(joined.collect().length == 1000 * 10) // 50 keys x 20 left x 10 right
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("isFinalPlan=false"), s"plan did not finalize:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set(bcastKey, prev)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_l")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_r")
    }
  }
}
