package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair/edge list — the step that
  * turns pairwise near-duplicate matches into duplicate GROUPS (a~b and
  * b~c put a, b, c in one component even though (a, c) was never a
  * candidate pair). Component id = the minimum vertex id reachable, so
  * "keep the min-id representative per component" is a plain filter.
  *
  * Algorithm: iterative min-label propagation. Each round, every vertex's
  * label flows across the (symmetrized) edges and each vertex keeps the
  * minimum label seen — a fixpoint in O(component diameter) rounds. Each
  * round is one equi-join (edges x labels, both key-partitioned) plus one
  * groupBy-min; the label table is WRITTEN per round ([[Stage.table]]) to
  * cut lineage growth, and convergence is checked with a scalar count —
  * per-round driver actions are inherent to iterative graph algorithms
  * (the loop condition is data-dependent), not a per-row collect.
  *
  * Scale notes: near-dup components are overwhelmingly tiny (pairs,
  * triples), so the diameter bound keeps rounds in the low single digits
  * at any corpus size; pathological long chains are bounded by `maxIter`
  * (a chain longer than that is template spam, not duplication). The
  * O(log n)-round alternative for adversarial graphs is alternating
  * large-star/small-star contraction (Kiveris et al., "Connected
  * Components in MapReduce"), which swaps diameter rounds for more joins
  * per round — not worth it below millions of vertices per component.
  */
object DedupClusters {

  /** Components of the graph given by `pairs` rows (aCol, bCol): returns
    * (doc_id, component) for every vertex that appears in a pair.
    *
    * `init` optionally WARM-STARTS the propagation from an existing
    * (doc_id, component) map computed over a SUBGRAPH of these edges
    * (e.g. d12 reusing d08's MinHash-only component stage). Soundness:
    * each warm label is the min id of a sub-component, hence a vertex id
    * inside the same final component, and the true component minimum u
    * keeps label u (any sub-component of u containing u has min u) — so
    * min-label propagation reaches the identical fixpoint. The saving is
    * the rounds that would RE-DERIVE each sub-component's minimum (every
    * warm vertex already holds its sub-min on round 0); labels still
    * travel the RAW edges, so the worst-case round bound stays the raw
    * diameter — warm-starting never increases rounds and typically
    * removes most of them on near-dup graphs, whose components are
    * mostly single sub-components already. Vertices absent from `init`
    * start from their own id as usual.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20,
                          init: Option[DataFrame] = None): DataFrame = {
    val edges = Stage.table(
      pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
        .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
        .distinct(),
      "cc_edges")
    val vertices = edges.select(col("src").as("id")).distinct()
    // rolling label slot: each round's write retires the round before
    // last, so the loop holds O(1) live stage dirs however many rounds
    // it runs (keep=2 covers the in-flight write + the convergence diff)
    val roll = new Stage.Rolling(keep = 2)
    var labels = roll.table(
      init.fold(vertices.withColumn("component", col("id"))) { warm =>
        vertices.join(
            warm.select(col("doc_id").as("id"), col("component").as("warm")),
            Seq("id"), "left")
          .select(col("id"), coalesce(col("warm"), col("id")).as("component"))
      },
      "cc_labels")
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val propagated = edges.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("component"))
      val next = roll.table(
        labels.unionByName(propagated)
          .groupBy("id").agg(min("component").as("component")),
        "cc_labels")
      changed = next.as("n")
        .join(labels.select(col("id"), col("component").as("old")), Seq("id"))
        .where(col("component") =!= col("old"))
        .count()
      labels = next
      iter += 1
    }
    // a maxIter exit without convergence means some component is only
    // partially merged — never truncate silently
    if (changed > 0)
      System.err.println(s"[graft] connectedComponents hit maxIter=$maxIter with " +
        s"$changed labels still changing — components are UNCONVERGED " +
        "(raise maxIter, or the graph has a chain longer than template spam should)")
    labels.select(col("id").as("doc_id"), col("component"))
  }

  /** INCREMENTAL components: merge a batch of new edges into an existing
    * WRITTEN component map without ever re-scanning the old edge list —
    * the ingest-time completion of the incremental dedup story (d14 finds
    * the new candidate edges incrementally; this folds them into the
    * component stage incrementally).
    *
    * Quotient-graph argument: every old component is connected, so
    * contracting each to its representative (= its min vertex id)
    * preserves the connectivity the new edges add. Each new edge's
    * endpoints map through the old map (identity for unseen vertices);
    * self-loops (an edge internal to one old component) drop; components
    * run over the CONTRACTED edges only — a graph with one vertex per
    * TOUCHED component or new doc, so the iterative work is O(|new
    * edges|), independent of the corpus graph size. Labels stay the
    * global min-id invariant: an old component's rep IS its min, so the
    * contracted min over {reps, new ids} is the union graph's min —
    * the result equals a from-scratch run on old∪new edges row-for-row
    * (pinned in DedupClustersSpec; certified at suite level by d24
    * sharing d08's from-scratch oracle).
    *
    * `oldComp`: (doc_id, component) over the old graph; `newPairs`:
    * (aCol, bCol) edge batch. Returns (doc_id, component) for every
    * vertex of the union graph.
    */
  def incrementalComponents(oldComp: DataFrame, newPairs: DataFrame,
                            aCol: String, bCol: String,
                            maxIter: Int = 20): DataFrame = {
    val reps = oldComp.select(col("doc_id").as("vid"), col("component").as("rep"))
    val newVerts = newPairs.select(col(aCol).as("vid"))
      .union(newPairs.select(col(bCol).as("vid"))).distinct()
    val allVerts = oldComp.select(col("doc_id").as("vid"))
      .union(newVerts).distinct()
    // vertex -> contracted id (its old rep, or itself if never seen)
    val vm = Stage.table(
      allVerts.join(reps, Seq("vid"), "left")
        .select(col("vid"), coalesce(col("rep"), col("vid")).as("cv")),
      "cc_inc_vm")
    val ce = newPairs
      .join(vm.select(col("vid").as(aCol), col("cv").as("ca")), Seq(aCol))
      .join(vm.select(col("vid").as(bCol), col("cv").as("cb")), Seq(bCol))
      .where(col("ca") =!= col("cb"))
      .select("ca", "cb")
    val contracted = connectedComponents(ce, "ca", "cb", maxIter)
      .select(col("doc_id").as("cv"), col("component").as("merged"))
    vm.join(contracted, Seq("cv"), "left")
      .select(col("vid").as("doc_id"),
        coalesce(col("merged"), col("cv")).as("component"))
  }
}
