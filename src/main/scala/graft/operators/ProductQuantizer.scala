package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftNative
import graft.functions.VecSumAgg

/** Product quantization (PQ) for ANN at memory-bound scale: split each
  * vector into `subs` contiguous subvectors, learn a small k-means
  * codebook PER SUBSPACE, and store each vector as `subs` small codes —
  * 64 longs collapse to 4 bytes per vector, the compression that lets a
  * billion-vector index live in executor memory where raw vectors cannot.
  *
  * Search is asymmetric distance computation (ADC): the probe stays
  * full-precision; per (probe, subspace, code) a dot-product lookup table
  * is precomputed (|probes| x subs x codes rows — tiny, broadcast), and a
  * vector's approximate dot is the sum of its codes' table entries. The
  * scan side therefore touches only the code columns — never the raw
  * vectors.
  *
  * Training reuses the [[KMeansIvf]] discipline, generalized to grouped
  * (per-subspace) Lloyd iterations: assignment is a map-side pass against
  * broadcast centroid numerators (exact integer sums + counts, no floating
  * accumulation), update is a (sub, code)-keyed [[VecSumAgg]] aggregate
  * with map-side partials, and every iteration's centroid table is cut by
  * [[Stage.table]] so lineage never nests.
  */
object ProductQuantizer {

  /** Per-subspace rows (vec_id, sub, qs, n2s) from (vec_id, q). The
    * subvector length is derived from the data (dim / subs); `q` must
    * have a fixed dimension divisible by `subs`.
    */
  def subvectors(qv: DataFrame, subs: Int, dim: Int): DataFrame = {
    require(dim % subs == 0, s"dim $dim not divisible by $subs subspaces")
    val len = dim / subs
    val spark = qv.sparkSession
    GraftNative.ensure(spark)
    qv.select(col("vec_id"),
        explode(array((0 until subs).map(s =>
          struct(lit(s).as("sub"), slice(col("q"), s * len + 1, len).as("qs"))): _*))
          .as("sv"))
      .select(col("vec_id"), col("sv.sub").as("sub"), col("sv.qs").as("qs"))
      .withColumn("n2s", GraftNative.longDot(col("qs"), col("qs")))
  }

  /** Initial codebook: per subspace, the `codes` lowest-id vectors'
    * subvectors (deterministic, input-order-free).
    */
  private def init(sv: DataFrame, codes: Int): DataFrame = {
    val w = Window.partitionBy("sub").orderBy("vec_id")
    sv.withColumn("rn", row_number().over(w))
      .where(col("rn") <= codes)
      .select(col("sub"), (col("rn") - 1).as("code"),
        col("qs").as("sq"), lit(1L).as("cnt"))
  }

  /** Nearest sub-centroid per (vector, subspace): broadcast codebook,
    * exact-long distance numerators, one double division at the edge.
    * The argmin is a hash AGGREGATE — `min(struct(dist, code, ...))`,
    * ordered by (dist, code) so ties break deterministically — not a
    * ranking window: the aggregate gets map-side partial reduction, so
    * the candidate fan-out (|vectors| x codes rows) collapses to one row
    * per (sub, vec_id) BEFORE any shuffle, where a window would shuffle
    * and sort the whole fan-out.
    */
  private def assign(sv: DataFrame, codebook: DataFrame): DataFrame =
    sv.join(broadcast(codebook), Seq("sub"))
      .withColumn("dist",
        col("n2s").cast("double")
          - lit(2.0) * GraftNative.longDot(col("qs"), col("sq")).cast("double") / col("cnt")
          + GraftNative.longDot(col("sq"), col("sq")).cast("double") / (col("cnt") * col("cnt")))
      .groupBy("sub", "vec_id")
      .agg(min(struct(col("dist"), col("code"), col("qs"), col("n2s"))).as("best"))
      .select(col("vec_id"), col("sub"),
        col("best.qs").as("qs"), col("best.n2s").as("n2s"),
        col("best.code").as("code"))

  /** Train the per-subspace codebooks: `iters` grouped Lloyd iterations.
    * Returns centroid numerators (sub, code, sq, cnt).
    */
  def fit(sv: DataFrame, codes: Int, iters: Int): DataFrame = {
    // rolling slot: round i+1's write scans round i, older rounds are
    // unreferenced — the loop keeps O(1) live stage dirs
    val roll = new Stage.Rolling(keep = 2)
    var codebook = roll.table(init(sv, codes), "pq_c0")
    var i = 0
    while (i < iters) {
      codebook = roll.table(
        assign(sv, codebook)
          .groupBy("sub", "code")
          .agg(VecSumAgg.vecSum(col("qs")).as("sq"), count(lit(1)).as("cnt")),
        s"pq_c${i + 1}")
      i += 1
    }
    codebook
  }

  /** Encode into the compact packed index: one row per vector,
    * `codes` = array of its sub-codes ordered by subspace, plus its true
    * squared norm (PQ indexes store norms alongside codes for cosine
    * ranking). This is the WRITTEN index: subs bytes + one long per
    * vector; the raw vectors are no longer needed at search time.
    */
  def encodePacked(sv: DataFrame, codebook: DataFrame, norms: DataFrame): DataFrame =
    assign(sv, codebook)
      .groupBy("vec_id")
      .agg(sort_array(collect_list(struct(col("sub"), col("code")))).as("sc"))
      .select(col("vec_id"),
        transform(col("sc"), x => x.getField("code")).as("codes"))
      .join(norms, Seq("vec_id"))

  /** ADC search: per (probe, subspace) a code->dot lookup table is
    * precomputed from the probe's subvectors x the codebook (map-valued
    * so codebook cells emptied by Lloyd can't positionally misindex),
    * packed per probe as an array of maps, and BROADCAST. Each index row
    * then computes its approximate dot entirely map-side —
    * `sum_s table[s][codes[s]]` via one aggregate() over `subs` elements
    * — so the packed index NEVER shuffles: the whole search is one scan,
    * the PQ promise at scale. Output: (probe_id, vec_id, approx_cosine).
    */
  def adcScores(probeSv: DataFrame, codebook: DataFrame, packed: DataFrame,
      probeNorms: DataFrame, subs: Int): DataFrame = {
    val perSub = probeSv
      .select(col("vec_id").as("probe_id"), col("sub"), col("qs").as("ps"))
      .join(codebook, Seq("sub"))
      .select(col("probe_id"), col("sub"), col("code"),
        (GraftNative.longDot(col("ps"), col("sq")).cast("double") / col("cnt"))
          .as("dot_s"))
      .groupBy("probe_id", "sub")
      .agg(sort_array(collect_list(struct(col("code"), col("dot_s")))).as("cd"))
      .select(col("probe_id"), col("sub"), map_from_entries(col("cd")).as("dots"))
    // tbl: map sub -> (map code -> dot); map_from_entries needs no struct
    // ordering (maps are not sort_array-comparable) and sub keys are dense
    val tableWide = perSub
      .groupBy("probe_id")
      .agg(map_from_entries(collect_list(struct(col("sub"), col("dots")))).as("tbl"))
      .join(probeNorms, Seq("probe_id"))
    packed
      .join(broadcast(tableWide))
      .withColumn("approx_dot",
        aggregate(sequence(lit(0), lit(subs - 1)), lit(0.0),
          (acc, s) => acc +
            element_at(element_at(col("tbl"), s), element_at(col("codes"), s + 1))))
      .where(col("n2") > 0 && col("p_n2") > 0)
      .select(col("probe_id"), col("vec_id"),
        (col("approx_dot") / sqrt((col("n2") * col("p_n2")).cast("double")))
          .as("approx_cosine"))
  }
}
