package graft

/** q22 approx_count_distinct (HLL++) vs q11 exact COUNT(DISTINCT). The
  * query itself now emits the certification: exact counts (which must
  * agree with q11's) plus booleans asserting the sketch landed within
  * 3-sigma of its documented relative standard deviation (rsd 0.05 ->
  * 15%) per group and column. The spec asserts the booleans hold and the
  * exact columns match q11.
  */
class DistinctApproxSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("HLL distinct counts are certified within 15% of exact per group") {
    val exact = SparkEntry.queries("q11_distinct_agg")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val certified = SparkEntry.queries("q22_distinct_approx")(spark, sfDir).collect()
    assert(certified.map(_.getString(0)).toSet == exact.keySet)
    certified.foreach { r =>
      val g = r.getString(0)
      assert((r.getLong(2), r.getLong(3)) == exact(g),
        s"group $g exact distinct counts diverge from q11")
      assert(r.getBoolean(4), s"group $g n_supp outside the 15% bound")
      assert(r.getBoolean(5), s"group $g n_part outside the 15% bound")
    }
  }
}
