package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Skew

/** Salted joins must equal their unsalted twins while partitioning on
  * (key, salt) — the skew-spreading property.
  */
class SkewSpec extends SparkTestBase {

  private def fixtures(): (DataFrame, DataFrame) = {
    import spark.implicits._
    // one hot key (0) carrying 90% of the facts + a long tail
    val facts = ((1 to 900).map(i => (0L, i)) ++ (1 to 100).map(i => (i.toLong, i)))
      .toDF("k", "v")
    val dim = (0L to 100L).map(k => (k, s"name$k")).toDF("k", "name")
    (facts, dim)
  }

  private def sortRows(df: DataFrame) = df.orderBy("k", "v").collect().toSeq

  test("inner salted join equals the plain join") {
    val (facts, dim) = fixtures()
    val salted = sortRows(Skew.saltedJoin(facts, dim, Seq("k"), salts = 8))
    val plain = sortRows(facts.join(dim, Seq("k")))
    assert(salted == plain)
    assert(salted.size == 1000)
  }

  test("left salted join keeps unmatched fact rows exactly once") {
    import spark.implicits._
    val (facts, dim) = fixtures()
    val factsPlus = facts.union(Seq((999L, 1)).toDF(facts.columns.toSeq: _*))
    assert(sortRows(Skew.saltedJoin(factsPlus, dim, Seq("k"), 8, "left")) ==
      sortRows(factsPlus.join(dim, Seq("k"), "left")))
  }

  test("the shuffle partitions on (key, salt), not key alone") {
    val (facts, dim) = fixtures()
    val df = Skew.saltedJoin(facts, dim, Seq("k"), salts = 8)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__graft_salt"), s"salt column not in plan:\n$plan")
  }
}
