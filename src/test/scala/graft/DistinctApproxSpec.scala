package graft

/** q22 approx_count_distinct (HLL++) vs q11 exact COUNT(DISTINCT): the
  * sketch must land within its documented relative standard deviation
  * (default rsd 0.05; assert a generous 3-sigma 15%) of the exact counts,
  * per group and column.
  */
class DistinctApproxSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("HLL distinct counts are within 15% of exact per group") {
    val exact = SparkEntry.queries("q11_distinct_agg")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = SparkEntry.queries("q22_distinct_approx")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(exact.keySet == approx.keySet)
    def within(est: Long, act: Long): Boolean =
      math.abs(est - act) <= math.max(1L, (act * 0.15).toLong)
    exact.foreach { case (g, (supp, part)) =>
      val (asupp, apart) = approx(g)
      assert(within(asupp, supp), s"group $g n_supp: approx $asupp vs exact $supp")
      assert(within(apart, part), s"group $g n_part: approx $apart vs exact $part")
    }
  }
}
