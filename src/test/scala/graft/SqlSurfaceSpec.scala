package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** The pure-SQL catalog surface must be the SAME engine: each SQL form
  * returns exactly the DataFrame form's rows, and the optimizer arrives
  * at the same plan (pushdown, join strategy), so SQL users pay nothing.
  */
class SqlSurfaceSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq

  private def physicalOps(plan: SparkPlan): Seq[String] = {
    def walk(p: SparkPlan): Seq[String] =
      p.nodeName +: (p.children ++ p.subqueries).flatMap(walk)
    walk(plan)
  }

  test("SQL forms return exactly the DataFrame forms' rows") {
    val q = SparkEntry.queries
    // build the shared stage the v11 SQL view reads, then publish
    q("v11_knn_graph")(spark, sfDir).write.format("noop").mode("overwrite").save()
    val views = GraftCatalog.registerStages(spark, sfDir)
    assert(views.contains("graft_v16_graph"), s"stage view missing: $views")
    GraftCatalog.sqlForms.keys.foreach { name =>
      val sql = GraftCatalog.runSql(spark, name, sfDir)
      val df = q(name)(spark, sfDir)
      assert(rows(sql) == rows(df), s"$name: SQL rows diverge from DataFrame rows")
    }
  }

  test("optimized plans are identical for the relational SQL forms") {
    GraftCatalog.registerTables(spark, sfDir)
    Seq("q01_pricing_summary", "q07_window_topk_per_group", "q13_semi_join")
      .foreach { name =>
        val sqlPlan = spark.sql(GraftCatalog.sqlForms(name))
          .queryExecution.optimizedPlan.canonicalized
        val dfPlan = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.optimizedPlan.canonicalized
        assert(sqlPlan.toString == dfPlan.toString,
          s"$name: optimizer reached different plans\nSQL:\n$sqlPlan\nDF:\n$dfPlan")
      }
  }

  test("q05's SQL form broadcasts the dimension side like the DataFrame form") {
    GraftCatalog.registerTables(spark, sfDir)
    // sparkPlan (the static physical plan), not executedPlan: AQE wraps
    // the latter in an AdaptiveSparkPlanExec whose children are hidden
    // until execution
    val sqlOps = physicalOps(
      spark.sql(GraftCatalog.sqlForms("q05_broadcast_dim_join"))
        .queryExecution.sparkPlan)
    val dfOps = physicalOps(
      SparkEntry.queries("q05_broadcast_dim_join")(spark, sfDir)
        .queryExecution.sparkPlan)
    assert(sqlOps.exists(_.contains("BroadcastHashJoin")),
      s"SQL form lost the broadcast join: $sqlOps")
    assert(dfOps.exists(_.contains("BroadcastHashJoin")))
  }
}
