package graft

/** q21 approx_percentile vs q16 exact percentile: the sketch's answer must
  * sit within the documented rank-error bound of the exact value. With
  * accuracy 10000 and <=60k rows per group the rank error is a handful of
  * rows; on integral l_quantity (1..50) that is at most 1.0 in value.
  */
class PercentileApproxSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("approx percentiles are within 1.0 of exact per group") {
    val exact = SparkEntry.queries("q16_percentile")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val approx = SparkEntry.queries("q21_percentile_approx")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (g, (med, p95)) =>
      val (amed, ap95) = approx(g)
      assert(math.abs(amed - med) <= 1.0, s"group $g median: approx $amed vs exact $med")
      assert(math.abs(ap95 - p95) <= 1.0, s"group $g p95: approx $ap95 vs exact $p95")
    }
  }
}
