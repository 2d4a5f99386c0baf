package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the row-level analogue of
  * partition pruning. When a fact table shuffle-joins a dimension that
  * carries a selective filter, Catalyst can build a bloom filter over the
  * dim's join keys at runtime and push `bloom_filter_might_contain` into
  * the fact scan, so most fact rows die at the scan instead of riding the
  * shuffle. At 100 TB this is the difference between shuffling the whole
  * fact table and shuffling the ~1% that can possibly match.
  *
  * The thresholds default to cluster scale (application side > 10 GB), so
  * this spec lowers them to demonstrate and pin the mechanism at test SF.
  */
class RuntimeFilterSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("selective dim filter injects a bloom filter into the fact scan") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // any application-side scan qualifies (default 10GB)
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // broadcast would bypass the shuffle the filter is meant to protect
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = Tables.lineitem(spark, dir).select("l_suppkey", "l_extendedprice")
      val dim = Tables.supplier(spark, dir)
        .where(col("s_acctbal") > 5000) // selective: 1 of 10 suppliers at this SF
        .select("s_suppkey", "s_nationkey")
      val joined = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_nationkey").agg(count(lit(1)).as("n"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"),
        s"expected a runtime bloom filter on the fact scan in:\n$p")

      // the filter only skips rows that cannot match: result is identical
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val expected = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_nationkey").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(joined.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap == expected)
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
