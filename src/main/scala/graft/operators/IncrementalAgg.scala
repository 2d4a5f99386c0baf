package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: the algebra Spark applies inside a
  * job (map-side partial aggregation + reduce-side merge), lifted to the
  * PIPELINE level across runs. An aggregate STATE (count, decimal sum,
  * min, max per key) is mergeable — `merge(state(base), state(delta)) ==
  * state(base U delta)` — so a 100 TB nightly pipeline re-aggregates only
  * the new partition and folds it into yesterday's state table instead of
  * rescanning history. That identity is exactly what the q27 oracle
  * certifies (merged halves vs the full one-shot aggregate).
  *
  * Sums ride DECIMAL (order-free, exact) so the merged total is
  * bit-identical to the one-shot total; count/min/max are trivially
  * associative. AVG derives as sum/count at read time — never stored
  * (averages don't merge). Distinct counts need a sketch state instead:
  * that is q18's KMV / q22's HLL, whose registers merge the same way.
  */
object IncrementalAgg {

  /** The mergeable state of `df` grouped by `keys` over measure `m`:
    * (n, s decimal-sum, lo, hi). `n` counts NON-NULL measures — the same
    * rows sum/min/max see — so the derived AVG (s/n) is right even when
    * the measure column has nulls; a row count would silently deflate it.
    */
  def state(df: DataFrame, keys: Seq[String], m: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(col(m)).as("n"),
        sum(col(m).cast("decimal(28,2)")).as("s"),
        min(col(m)).as("lo"),
        max(col(m)).as("hi"))

  /** Fold any number of states into one: one union + one keyed aggregate
    * — the delta's state is typically tiny, so at scale this is a shuffle
    * of state ROWS (|keys| cardinality), never of raw data.
    */
  def merge(keys: Seq[String], states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("s")).as("s"),
        min(col("lo")).as("lo"),
        max(col("hi")).as("hi"))
}
