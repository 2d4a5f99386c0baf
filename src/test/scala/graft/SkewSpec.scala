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

  test("AQE skew join splits the hot partition with zero query changes, same result as salting") {
    import org.apache.spark.sql.functions._
    // what a real user gets at 100x by default: no salt column, no manual
    // spread — AQE detects the oversized reducer partition at runtime and
    // splits it. Thresholds lowered so a test-sized hot key (~10 MB vs a
    // KB-scale median) trips the same detection production sizes would.
    val tuned = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key (0) carrying 2/3 of the facts, padded to real bytes
      val facts = spark.range(0, 300000).select(
        when(col("id") % 3 =!= 0, lit(0L)).otherwise(col("id") % 101).as("k"),
        col("id").as("v"),
        lpad(col("id").cast("string"), 32, "x").as("pad"))
      val dim = spark.range(0, 101).select(col("id").as("k"),
        concat(lit("name"), col("id").cast("string")).as("name"))

      val aqe = facts.join(dim, Seq("k"))
      val rows = aqe.collect()
      val plan = aqe.queryExecution.executedPlan.toString
      assert(!plan.contains("isFinalPlan=false"), "adaptive plan did not finalize")
      assert(plan.toLowerCase.contains("skew"),
        s"AQE did not mark the skew-split join in:\n$plan")

      // parity: identical aggregate fingerprint as the manual salted join
      // (q23's technique) and the same row count
      def fp(df: DataFrame) = df.agg(
        count(lit(1)), sum("v"), sum(length(col("name")))).head().toSeq
      assert(rows.length == 300000)
      assert(fp(aqe) == fp(Skew.saltedJoin(facts, dim, Seq("k"), salts = 8)))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
