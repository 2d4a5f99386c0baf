package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank in exact integer (ppm) arithmetic.
  *
  * The classic iteration r'(v) = (1-d) + d * Σ_{u→v} r(u)/deg(u) with
  * d = 0.85, scaled to parts-per-million and computed with floor
  * division: each edge contributes `(r(u) * 17) DIV (deg(u) * 20)`
  * (17/20 IS 0.85 — the damping is exact, only the per-edge quotient
  * floors), so every rank is a BIGINT and the per-node Σ is a sum of
  * longs — associative, order-free, bit-identical across engines and
  * partitionings. Float PageRank would diverge between engines on
  * accumulation order alone.
  *
  * Scale shape (the standard distributed formulation): the edge list
  * joined with out-degrees is a WRITTEN stage scanned once per
  * iteration; each iteration is one hash equi-join (edges x ranks on
  * src) + one uniform-key aggregate (sum by dst) — shuffle volume
  * O(|E|) per iteration with map-side partial sums, no driver
  * participation, no N^2 anything. Iterations chain a fixed, small
  * number of plans (the caller picks `iters`; the d20 query uses 5),
  * so lineage stays bounded without checkpointing.
  *
  * Callers pass a SYMMETRIZED (or otherwise dangling-free) edge list:
  * every node must appear as a `src` so rank mass has an outlet —
  * true by construction for the near-dup graphs this engine builds
  * (pairs are emitted in both directions). The contract is ENFORCED,
  * not just documented: [[ranksPpm]] fails fast if any `dst` never
  * appears as a `src` (a dangling node would silently lose rank mass
  * and drop out of the output). The check is one cheap anti-join over
  * the already-written edge stage, paid once per call.
  */
object PageRank {

  /** Rank scale: ranks start at 1e6 ppm (= 1.0). */
  val ScalePpm = 1000000L

  /** (1 - d) * scale with d = 0.85. */
  val BasePpm = 150000L

  /** Iterated integer PageRank over a directed edge list with columns
    * (`src`, `dst`); returns (`id`, `pr_ppm`).
    */
  def ranksPpm(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    // one written stage feeds every iteration's join side. The dst side
    // is left-joined against the SAME deg aggregate during the build, so
    // the dangling-node contract check below is a filter over the
    // written stage — no extra distinct/anti-join jobs per call.
    val ed = Stage.table(
      edges.join(deg, Seq("src"))
        .join(deg.select(col("src").as("dst"), col("deg").as("dst_deg")),
          Seq("dst"), "left"),
      "pagerank_edges")
    // contract check: distinct(dst) ⊆ distinct(src). A dangling dst
    // (no out-edges) would lose its inbound mass and vanish from the
    // output — fail fast instead of returning silently-wrong ranks.
    require(ed.where(col("dst_deg").isNull).isEmpty,
      "PageRank.ranksPpm requires a dangling-free edge list: every dst " +
        "must also appear as a src (symmetrize or add self-loops first)")
    var r = ed.select(col("src").as("id")).distinct()
      .select(col("id"), lit(ScalePpm).as("pr"))
    for (_ <- 1 to iters) {
      r = ed.join(r, ed("src") === r("id"))
        .groupBy(ed("dst"))
        .agg(expr(s"CAST($BasePpm + sum((pr * 17) DIV (deg * 20)) AS BIGINT)").as("pr"))
        .select(col("dst").as("id"), col("pr"))
    }
    r
  }
}
