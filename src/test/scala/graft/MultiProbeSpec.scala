package graft

/** v06 multi-probe LSH vs v05 single-probe: probing the Hamming-1
  * neighbor buckets must strictly raise recall@K at equal planes on the
  * fixture (the reason multi-probe exists), and never lower any probe's
  * recall (single-probe candidates are a subset of multi-probe's).
  */
class MultiProbeSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("multi-probe recall@K strictly beats single-probe at equal planes") {
    val v05 = SparkEntry.queries("v05_ann_recall")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val v06 = SparkEntry.queries("v06_ann_recall_multiprobe")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(v05.keySet == v06.keySet)
    v05.foreach { case (p, r05) =>
      assert(v06(p) >= r05, s"probe $p: multi-probe ${v06(p)} < single-probe $r05")
    }
    assert(v06.values.sum > v05.values.sum,
      s"multi-probe total ${v06.values.sum} not above single-probe ${v05.values.sum}")
  }
}
