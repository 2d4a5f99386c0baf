package graft

/** Every registered query executes at sf0.001 (schema/expression errors
  * surface here long before the driver's oracle gate); the flagship entry
  * returns rows.
  */
class QueriesSmokeSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or is explicitly oracle-free") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q))
    assert(q == SparkEntry.all.map(_.name).toSet)
    assert(SparkEntry.all.size == SparkEntry.queries.size, "duplicate query names")
  }

  SparkEntry.all.foreach { q =>
    test(s"query ${q.name} executes at sf0.001") {
      val df = q.run(spark, sfDir)
      assert(df.columns.nonEmpty)
      df.write.format("noop").mode("overwrite").save()
    }
  }
}
