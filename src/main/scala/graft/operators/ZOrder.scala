package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two integer
  * dimensions and cluster files by the interleaved value, so rows close in
  * EITHER dimension land in few files. Parquet footers then carry narrow
  * per-file (and per-row-group) min/max for BOTH columns, and a scan
  * filtered on either dimension skips most files. A single-column sort
  * layout only ever skips on its leading column — the trailing dimension's
  * min/max spans the whole domain in every file.
  *
  * This is a WRITE-side operator like [[Bucketing]]: pay one clustering
  * shuffle at layout time, harvest it on every subsequent scan. At 100 TB
  * the skip ratio is the difference between touching 1/numFiles of the
  * data and touching all of it; the clustering itself is one
  * `repartitionByRange` + in-partition sort — the same cost as any total
  * sort of the table.
  *
  * The z-value is composed from shiftright/and/or Column primitives, so it
  * stays inside whole-stage codegen; no UDF, no custom expression needed.
  */
object ZOrder {

  /** 2-D Morton code of `a` (even bit positions) and `b` (odd positions).
    * Inputs must already lie in [0, 2^bits) — callers with wider or
    * negative domains normalize first (rank, offset, or scale); with 21
    * bits each the result fits a positive long.
    */
  def zvalue(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 21, "bits must be in [1, 21] for a positive long z-value")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Normalize `c` into [0, 2^bits) by linear min/max scaling — the
    * equal-bit-budget step interleaving REQUIRES: raw domains of different
    * widths would let the wider column own all the high bits and the
    * z-order degenerate into a single-column sort. Linear scaling fits
    * roughly-uniform domains (keys, timestamps); heavily skewed columns
    * should be mapped through quantile boundaries instead (same idea as
    * range-partition ids), which composes here by pre-computing the rank
    * column before calling [[writeClustered]].
    */
  private def scaled(c: Column, lo: Column, hi: Column, bits: Int): Column =
    // subtract in DOUBLE, not the column's native integer type: an
    // IntegerType domain wider than Int.MaxValue (or a LongType one wider
    // than Long.MaxValue) would overflow `c - lo` into negative scaled
    // values and garbage z-values; double loses at most ulp-level
    // precision, irrelevant against a <= 2^21 bucket grid
    least(lit((1L << bits) - 1),
      floor((c.cast("double") - lo.cast("double")) /
          (hi.cast("double") - lo.cast("double") + 1.0d) * (1L << bits))
        .cast("long"))

  /** Write `df` into `numFiles` files clustered by the z-order of integer
    * columns (`a`, `b`): scale both dims into the shared bit budget (the
    * min/max bounds ride a one-row broadcast — no driver-side loop),
    * range-partition on the z-value (contiguous curve segments per file),
    * sort within each partition (narrow row-group stats too), and drop
    * the helper columns at the edge.
    */
  def writeClustered(df: DataFrame, a: String, b: String, numFiles: Int,
      path: String, bits: Int = 16): Unit = {
    val bounds = df.agg(
      min(col(a)).as("__alo"), max(col(a)).as("__ahi"),
      min(col(b)).as("__blo"), max(col(b)).as("__bhi"))
      .withColumn("__j", lit(1))
    df.withColumn("__j", lit(1))
      .join(broadcast(bounds), Seq("__j"))
      .withColumn("__z", zvalue(
        scaled(col(a), col("__alo"), col("__ahi"), bits),
        scaled(col(b), col("__blo"), col("__bhi"), bits), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "__j", "__alo", "__ahi", "__blo", "__bhi")
      .write.mode("overwrite").parquet(path)
  }
}
