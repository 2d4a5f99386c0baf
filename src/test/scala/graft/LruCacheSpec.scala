package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LruCache

/** The bounded access-ordered cache behind the Bloom sidecar store:
  * eviction drops the COLDEST entry, never a hot one — the property the
  * old clear-all-at-capacity guard violated (periodic full reload churn
  * for a standing service juggling > capacity sidecar paths).
  */
class LruCacheSpec extends AnyFunSuite {

  test("eviction keeps hot entries and drops the coldest") {
    val c = new LruCache[Int, String](3)
    var loads = 0
    def load(k: Int): String = { loads += 1; s"v$k" }
    (1 to 3).foreach(k => c.getOrLoad(k)(load(k)))
    assert(c.size == 3 && loads == 3)

    // touch 1 (hot), insert 4 -> 2 (coldest) evicted, 1 survives
    assert(c.getOrLoad(1)(load(1)) == "v1")
    assert(loads == 3, "a hit must not reload")
    c.getOrLoad(4)(load(4))
    assert(c.size == 3)
    assert(c.contains(1) && c.contains(3) && c.contains(4) && !c.contains(2),
      s"LRU must evict the coldest: ${(1 to 4).map(c.contains)}")

    // re-loading the evicted key is a miss (advisory cache: reload ok)
    c.getOrLoad(2)(load(2))
    assert(loads == 5)
  }

  test("capacity one and guard rails") {
    intercept[IllegalArgumentException](new LruCache[Int, Int](0))
    val c = new LruCache[Int, Int](1)
    c.getOrLoad(1)(10)
    c.getOrLoad(2)(20)
    assert(c.size == 1 && c.contains(2) && !c.contains(1))
  }
}
