package graft

import org.apache.spark.sql.execution.SparkPlan
import graft.operators.Joins

/** Size-guarded broadcast hints: under the cap the hint is applied (plan
  * broadcasts), over it the SAME join falls back to a shuffle strategy
  * with identical results — the degradation path a contract-violating
  * delete batch takes instead of OOMing the driver.
  */
class JoinsSpec extends SparkTestBase {

  private def physicalOps(plan: SparkPlan): Seq[String] = {
    def walk(p: SparkPlan): Seq[String] = p.nodeName +: p.children.flatMap(walk)
    walk(plan)
  }

  test("under the cap: broadcast hint applied; over it: shuffle fallback, same rows") {
    import spark.implicits._
    val left = (1L to 1000L).map(i => (i, i * 2)).toDF("k", "v")
    val tomb = (1L to 1000L by 9).map(Tuple1(_)).toDF("k")

    def run(): (Seq[String], Set[Long]) = {
      val joined = left.join(Joins.sizedBroadcast(tomb), Seq("k"), "left_anti")
      (physicalOps(joined.queryExecution.sparkPlan),
        joined.collect().map(_.getLong(0)).toSet)
    }

    // disable Spark's own auto-broadcast so the strategy choice below is
    // attributable to OUR hint alone
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // default cap (64 MB): the tiny tombstone list gets the hint
      spark.conf.unset(Joins.MaxBroadcastKey)
      val (opsSmall, rowsSmall) = run()
      assert(opsSmall.exists(_.contains("BroadcastHashJoin")),
        s"expected a broadcast join under the cap, got $opsSmall")

      // cap forced below the estimate: no hint -> shuffle strategy — and
      // the rows are identical (the degradation is performance-only)
      spark.conf.set(Joins.MaxBroadcastKey, "1")
      val (opsBig, rowsBig) = run()
      assert(!opsBig.exists(_.contains("BroadcastHashJoin")),
        s"cap ignored: $opsBig")
      assert(rowsBig == rowsSmall, "fallback path changed the join result")
      assert(rowsSmall == (1L to 1000L).filterNot(i => (i - 1) % 9 == 0).toSet)
    } finally {
      spark.conf.unset(Joins.MaxBroadcastKey)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
