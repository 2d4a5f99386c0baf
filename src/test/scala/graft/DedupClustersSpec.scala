package graft

import graft.operators.DedupClusters

/** Min-label-propagation connected components on hand-built graphs. */
class DedupClustersSpec extends SparkTestBase {

  private def components(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    DedupClusters.connectedComponents(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain, triangle, and pair resolve to min-id components") {
    // chain 1-2-3-4 (diameter > 1: needs propagation rounds),
    // triangle 10-11-12 (+ redundant edge), isolated pair 20-21
    val got = components(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)))
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("long chain converges within maxIter (propagation, not one-hop)") {
    val chain = (1L to 9L).map(i => (i, i + 1))
    val got = components(chain)
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == (1L to 10L).toSet)
  }

  test("warm-starting from subgraph components reaches the identical fixpoint") {
    import spark.implicits._
    // union graph: two minhash sub-components {1,2,3} and {5,6} bridged
    // by a non-minhash edge (3,5), plus an untouched pair {20,21} and a
    // vertex 9 the warm map has never seen
    val union = Seq((1L, 2L), (2L, 3L), (5L, 6L), (3L, 5L), (20L, 21L), (6L, 9L))
    val cold = components(union)
    // warm map = components of the minhash subgraph only
    val warm = DedupClusters.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b"), "a", "b")
    val warmed = DedupClusters.connectedComponents(
        union.toDF("a", "b"), "a", "b", init = Some(warm))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(warmed == cold, s"warm $warmed vs cold $cold")
    assert(warmed(9L) == 1L && warmed(21L) == 20L)
  }

  test("incremental components equal from-scratch on every merge shape") {
    import spark.implicits._
    // old graph: components {1,2,3} and {5,6}, pair {20,21}
    val oldEdges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (20L, 21L))
    val oldComp = DedupClusters.connectedComponents(
      oldEdges.toDF("a", "b"), "a", "b")
    // new batch exercises every shape: (3,5) MERGES two old components,
    // (6,9) attaches a brand-new vertex, (30,31) is an all-new component,
    // (20,21) is internal to an old component (contracts to a self-loop)
    val newEdges = Seq((3L, 5L), (6L, 9L), (30L, 31L), (20L, 21L))
    val inc = DedupClusters.incrementalComponents(
        oldComp, newEdges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scratch = components(oldEdges ++ newEdges)
    assert(inc == scratch, s"incremental $inc vs from-scratch $scratch")
    // the merged component took the global min across both old components
    assert(inc(6L) == 1L && inc(9L) == 1L)
    // untouched old component kept its label; new component labeled fresh
    assert(inc(20L) == 20L && inc(31L) == 30L)
  }

  test("incremental components with an empty batch is the old map") {
    import spark.implicits._
    val oldComp = DedupClusters.connectedComponents(
      Seq((1L, 2L), (5L, 6L)).toDF("a", "b"), "a", "b")
    val inc = DedupClusters.incrementalComponents(oldComp,
        Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("d24 equals d08 row-for-row on the fixture corpus") {
    val d = "/root/testdata/sf0.001"
    val d08 = SparkEntry.queries("d08_dedup_clusters")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val d24 = SparkEntry.queries("d24_incremental_components")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(d24.nonEmpty && d24 == d08,
      "incremental component map diverged from the from-scratch run")
    // non-vacuous: the batch really added vertices beyond the old graph
    assert(d24.exists(_._1 >= graft.queries.DedupQueries.BatchIdOffset))
  }

  test("d16 semantic prune: one keeper per component, and it minimizes (centroid cosine, id)") {
    val rows = SparkEntry.queries("d16_semantic_prune")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.nonEmpty, "fixture produced no semantic-dup groups")
    rows.groupBy(_._2).foreach { case (component, mem) =>
      assert(mem.count(_._4) == 1, s"component $component keeps ${mem.count(_._4)} members")
      val kept = mem.find(_._4).get
      val best = mem.minBy(m => (m._3, m._1))
      assert((kept._1, kept._3) == ((best._1, best._3)),
        s"component $component kept ${kept._1} but ${best._1} has lower (cosine, id)")
      // every member of a group shares the component's minimum id
      assert(component == mem.map(_._1).min,
        s"component label $component is not the min member id")
    }
  }
}
