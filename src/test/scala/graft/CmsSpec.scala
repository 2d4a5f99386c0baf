package graft

/** t09 count-min sketch: the estimate is exact count plus whatever hash
  * collisions add, never less — min over depth rows can only overcount.
  * The expected overshoot per row is (total_tokens - n) / width; with
  * depth independent rows the min stays near exact for heavy hitters.
  */
class CmsSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("CMS estimates dominate exact counts and stay near them for heavy hitters") {
    val rows = SparkEntry.queries("t09_cms_heavyhitters")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20)
    rows.foreach { case (tok, exact, est) =>
      assert(est >= exact, s"token $tok: est $est < exact $exact — CMS can never undercount")
      // heavy hitters sit far above the collision noise floor; a x2
      // overshoot would mean the sketch is mis-built (e.g. one hash row)
      assert(est <= exact * 2, s"token $tok: est $est implausibly above exact $exact")
    }
  }

  test("the sketch is deterministic across runs") {
    def run() = SparkEntry.queries("t09_cms_heavyhitters")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(run() == run())
  }
}
