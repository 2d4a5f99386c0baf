package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** PageRank operator semantics + the d19/d20 graph-query contracts that
  * the oracle hash alone doesn't make obvious.
  */
class GraphOpsSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    // symmetrize, as the dedup-graph callers do
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
  }

  test("pagerank: an isolated symmetric pair is a fixed point at 1.0") {
    val r = PageRank.ranksPpm(edges((1L, 2L)), 5).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // r' = 150000 + (1000000 * 17) DIV 20 = exactly 1000000, every round
    assert(r == Map(1L -> PageRank.ScalePpm, 2L -> PageRank.ScalePpm))
  }

  test("pagerank: a star hub outranks its leaves and leaves tie exactly") {
    val r = PageRank.ranksPpm(edges((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)), 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val leaves = Seq(1L, 2L, 3L, 4L).map(r)
    assert(leaves.distinct.size == 1, s"symmetric leaves must tie: $r")
    assert(r(0L) > leaves.head, s"hub must outrank leaves: $r")
    assert(leaves.head >= PageRank.BasePpm)
  }

  test("pagerank: a dangling dst (never a src) fails fast, not silently") {
    import spark.implicits._
    val dangling = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      PageRank.ranksPpm(dangling, 2).collect()
    }
    assert(e.getMessage.contains("dangling-free"))
  }

  test("d19: cluster split leaks zero pairs, doc split leaks some") {
    val rows = SparkEntry.queries("d19_leakfree_split")(spark, sfDir)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.keySet.map(_._1) == Set("by_doc", "by_cluster"))
    val clusterLeaks = rows.collect { case (("by_cluster", _), (_, lk)) => lk }.sum
    assert(clusterLeaks == 0L, s"cluster-rep split must never straddle a pair: $rows")
    val docLeaks = rows.collect { case (("by_doc", _), (_, lk)) => lk }.sum
    assert(docLeaks > 0L,
      s"doc-hash split should leak on the duplicated fixture corpus (vacuous otherwise): $rows")
    // both modes partition the same corpus
    val byMode = rows.groupBy(_._1._1).view.mapValues(_.values.map(_._1).sum)
    assert(byMode("by_doc") == byMode("by_cluster"))
  }

  test("d20: two-node components sit exactly at the 1.0 fixed point") {
    val pr = SparkEntry.queries("d20_dup_pagerank")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.nonEmpty)
    assert(pr.values.forall(_ >= PageRank.BasePpm))
    // the exact-copy fixture pairs (i, i+offset) whose doc appears in no
    // other near-dup relation form 2-cliques -> rank exactly ScalePpm
    val twoCliques = pr.filter { case (id, _) =>
      id >= graft.queries.DedupQueries.BatchIdOffset
    }
    assert(twoCliques.nonEmpty)
    // every injected copy is in some component; those in pure 2-cliques
    // must sit at the fixed point — at least one such pair must exist
    assert(twoCliques.values.exists(_ == PageRank.ScalePpm),
      s"expected some pure copy-pair at the 1.0 fixed point, got ${twoCliques.take(5)}")
  }

  test("d26: triangle counts are 3-consistent and bounds hold per doc") {
    val rows = SparkEntry.queries("d26_dup_triangles")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // every triangle has exactly 3 members, so the per-doc counts sum to
    // a multiple of 3 — and the fixture graph actually has triangles
    val total = rows.map(_._3).sum
    assert(total > 0, "no triangles at sf0.001 — closure metric vacuous")
    assert(total % 3 == 0, s"per-doc triangle counts sum to $total, not 3T")
    rows.foreach { case (id, deg, t, cppm) =>
      assert(deg >= 1, s"doc $id in the edge list with degree 0")
      // T <= C(deg, 2): a doc's triangles pick 2 of its neighbors
      assert(t <= deg * (deg - 1) / 2, s"doc $id: $t triangles exceed deg-$deg bound")
      val expect = if (deg >= 2) t * 2000000L / (deg * (deg - 1)) else 0L
      assert(cppm == expect, s"doc $id: clustering_ppm $cppm != $expect")
    }
    // at least the fully-closed regime occurs on the fixture (at
    // sf0.001 every component happens to be a clique; the open-chain
    // regime is pinned synthetically below)
    assert(rows.exists(_._4 == 1000000L), "no fully-closed neighborhood")
  }

  test("triangleStats: chain stays open, clique closes, tail dilutes") {
    import spark.implicits._
    // path 1-2-3 (no triangle), clique 4-5-6, and 6's tail to 7:
    // 6 has deg 3 but only the one clique triangle -> 2*1/(3*2) = 1/3
    val e = Seq((1L, 2L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (6L, 7L))
      .toDF("doc_a", "doc_b")
    val got = graft.operators.GraphOps.triangleStats(e, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(2L) == ((2L, 0L, 0L)), s"chain centre: ${got(2L)}") // open, deg 2
    assert(got(1L) == ((1L, 0L, 0L)) && got(3L) == ((1L, 0L, 0L)))
    assert(got(4L) == ((2L, 1L, 1000000L)) && got(5L) == ((2L, 1L, 1000000L)))
    assert(got(6L) == ((3L, 1L, 333333L)), s"diluted hub: ${got(6L)}")
    assert(got(7L) == ((1L, 0L, 0L)))
  }
}
