package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-guarded broadcast hints.
  *
  * Several operators join against a frame that is "small by construction"
  * — a tombstone batch, a probe set, a delete vector. Hinting
  * `broadcast(df)` there is right at the contract sizes, but the hint is
  * UNCONDITIONAL: Spark honors it regardless of actual size, so a 100x
  * contract violation (a bulk delete someone routed through the tombstone
  * path) silently OOMs the driver instead of degrading to a shuffle join.
  *
  * [[sizedBroadcast]] keeps the intent and bounds the failure mode: the
  * hint is applied only when the optimizer's own size estimate fits under
  * the cap; above it the frame joins unhinted (Spark plans a shuffle
  * join — slower, never fatal). For the WRITTEN stages these operators
  * join (tombstone lists, probe tables, delete vectors are parquet
  * stages), the estimate is file-bytes-based — the same signal
  * `autoBroadcastJoinThreshold` trusts — so the guard costs one
  * optimizer pass on a small plan and no data action.
  */
object Joins {

  /** Session conf key overriding [[DefaultMaxBroadcastBytes]]. */
  val MaxBroadcastKey = "spark.graft.maxBroadcastBytes"

  /** Default broadcast cap: 64 MB of estimated plan output — far above
    * every contract size the callers state (tombstone batches, probe
    * sets), far below what a driver collecting one copy plus an executor
    * holding N copies would survive at 100x.
    */
  val DefaultMaxBroadcastBytes: Long = 64L << 20

  /** `broadcast(df)` when the optimizer's size estimate fits the cap,
    * `df` unchanged otherwise.
    */
  def sizedBroadcast(df: DataFrame): DataFrame = {
    val cap = df.sparkSession.conf.getOption(MaxBroadcastKey)
      .map(_.toLong).getOrElse(DefaultMaxBroadcastBytes)
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(cap))
      broadcast(df)
    else df
  }
}
