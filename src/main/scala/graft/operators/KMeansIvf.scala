package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftNative
import graft.functions.VecSumAgg

/** K-means cell construction for IVF-style ANN (the step that produces
  * the `cell` assignments v02-style cell-restricted search prunes on; the
  * test fixtures ship precomputed `label` cells — this operator is how a
  * pipeline builds them from raw vectors).
  *
  * Lloyd's algorithm as pure DataFrame lineage per iteration:
  *   assign:   one map-side pass over the vectors against a BROADCAST
  *             centroid table (k centroids are always small), ranking by
  *             exact-long-arithmetic distance — no shuffle of the vectors;
  *   update:   groupBy(cell) with the typed [[VecSumAgg]] — map-side
  *             partial aggregation, k x dim longs shuffled.
  *
  * Centroids are carried as exact integer numerators (sum vector + count),
  * never floating means, so assignment is deterministic and
  * shuffle-order-free. dist^2(v, s/n) is compared via
  * n2 - 2*(v.s)/n + (s.s)/n^2 with the dot products exact longs and one
  * double division at the edge.
  *
  * Each iteration's centroid table is tiny (k rows) and collected lineage
  * is cut by [[Stage.table]] — without the barrier, iteration i's plan
  * would inline all i-1 previous assignment trees (the classic iterative-
  * algorithm lineage blowup).
  */
object KMeansIvf {

  /** Initial centroids: the k vectors with the smallest ids, as cells
    * 0..k-1 (deterministic, input-order-free).
    */
  def init(qv: DataFrame, k: Int): DataFrame = {
    val w = Window.orderBy("vec_id")
    qv.orderBy("vec_id").limit(k)
      .withColumn("cell", row_number().over(w) - 1)
      .select(col("cell"), col("q").as("sq"), lit(1L).as("cnt"))
  }

  /** Nearest centroid per vector: map-side scoring against broadcast
    * centroid numerators. The argmin is a hash AGGREGATE —
    * `min(struct(dist, cell, ...))`, tie-broken deterministically by
    * (dist, cell) — not a ranking window: the aggregate gets map-side
    * partial reduction, so the |vectors| x k candidate fan-out collapses
    * to one row per vec_id BEFORE any shuffle, where a window would
    * shuffle and sort the whole fan-out.
    */
  def assign(qv: DataFrame, centroids: DataFrame): DataFrame = {
    val spark = qv.sparkSession
    GraftNative.ensure(spark)
    qv.join(broadcast(centroids))
      .withColumn("dist",
        col("n2").cast("double")
          - lit(2.0) * GraftNative.longDot(col("q"), col("sq")).cast("double") / col("cnt")
          + GraftNative.longDot(col("sq"), col("sq")).cast("double") / (col("cnt") * col("cnt")))
      .groupBy("vec_id")
      .agg(min(struct(col("dist"), col("cell"), col("q"), col("n2"))).as("best"))
      .select(col("vec_id"),
        col("best.q").as("q"), col("best.n2").as("n2"),
        col("best.cell").as("cell"))
  }

  /** `iters` Lloyd iterations; returns the final centroid numerators
    * (cell, sq, cnt). Empty cells drop out (standard Lloyd behavior).
    */
  def fit(qv: DataFrame, k: Int, iters: Int): DataFrame = {
    // rolling slot: round i+1's write scans round i, older rounds are
    // unreferenced — the loop keeps O(1) live stage dirs
    val roll = new Stage.Rolling(keep = 2)
    var centroids = roll.table(init(qv, k), "kmeans_c0")
    var i = 0
    while (i < iters) {
      centroids = roll.table(
        assign(qv, centroids)
          .groupBy("cell")
          .agg(VecSumAgg.vecSum(col("q")).as("sq"), count(lit(1)).as("cnt")),
        s"kmeans_c${i + 1}")
      i += 1
    }
    centroids
  }

  /** Final (vec_id, cell) table — the IVF index input. */
  def cells(qv: DataFrame, centroids: DataFrame): DataFrame =
    assign(qv, centroids).select("vec_id", "cell")
}
