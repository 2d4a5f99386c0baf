package graft

/** q21 approx_percentile vs q16 exact percentile. The query itself now
  * emits the certification: exact interpolated percentiles (which must
  * agree with q16's) plus booleans asserting the GK sketch landed within
  * 1.0 of exact — with accuracy 10000 and <=60k rows per group the rank
  * error is a handful of rows, at most 1.0 in value on integral
  * l_quantity (1..50). The spec asserts the booleans hold and the exact
  * columns match q16 bit-for-bit.
  */
class PercentileApproxSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("approx percentiles are certified within 1.0 of exact per group") {
    val exact = SparkEntry.queries("q16_percentile")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val certified = SparkEntry.queries("q21_percentile_approx")(spark, sfDir).collect()
    assert(certified.map(_.getString(0)).toSet == exact.keySet)
    certified.foreach { r =>
      val g = r.getString(0)
      assert((r.getDouble(2), r.getDouble(3)) == exact(g),
        s"group $g exact percentiles diverge from q16")
      assert(r.getBoolean(4), s"group $g median outside the 1.0 bound")
      assert(r.getBoolean(5), s"group $g p95 outside the 1.0 bound")
    }
  }
}
