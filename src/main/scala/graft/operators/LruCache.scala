package graft.operators

/** Tiny thread-safe LRU (access-ordered, bounded) for advisory
  * process-lifetime caches — replaces clear-all-at-capacity guards,
  * whose periodic full reload churn a standing service juggling more
  * than `capacity` entries would otherwise pay. Values must be
  * immutable; `getOrLoad` may compute twice under a race (idempotent
  * loads only — exactly the contract of the sidecar/manifest caches it
  * backs).
  */
final class LruCache[K, V](capacity: Int) {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  private val map = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size() > capacity
  }

  def getOrLoad(k: K)(load: => V): V = {
    val cached = map.synchronized(map.get(k))
    if (cached != null) cached
    else {
      val v = load
      map.synchronized(map.put(k, v))
      v
    }
  }

  def size: Int = map.synchronized(map.size())

  /** Drop every entry whose key satisfies `p` (vacuum/drop-table
    * invalidation).
    */
  def invalidateIf(p: K => Boolean): Unit = map.synchronized {
    val it = map.keySet.iterator
    while (it.hasNext) if (p(it.next())) it.remove()
  }

  /** True iff `k` is cached; does NOT refresh its recency (test hook). */
  def contains(k: K): Boolean = map.synchronized(map.containsKey(k))
}
