package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact `percentile_cont` over LOW-CARDINALITY value domains, computed
  * from a distributed value HISTOGRAM instead of a per-group value
  * buffer.
  *
  * Spark's exact `percentile` aggregate materializes every value of a
  * group in one reducer's memory (an `OpenHashMap` merged on a single
  * row per group) — at 100 TB a 3-group percentile gathers ~N/3 values
  * per reducer and the query is only as scalable as the biggest group.
  * But when the VALUE DOMAIN is bounded (quantities 1..50, ratings,
  * token counts, ages, bucketed latencies — most percentile targets in
  * practice), the sufficient statistic is the (group, value) count
  * histogram, and exact interpolated percentiles fall out of cumulative
  * counts:
  *
  *  1. `groupBy(group, value).count()` — ONE shuffle whose map side
  *     combines to at most |groups| x |domain| rows per partition, so
  *     shuffle volume is bounded by the domain, not the data;
  *  2. cumulative counts over the per-group value order (a window over
  *     histogram-sized data) locate the two order statistics around
  *     `pos = (n-1) * q` — the value whose [cumStart, cumEnd) interval
  *     contains an index IS that order statistic;
  *  3. linear interpolation in the exact weighted double arithmetic of
  *     Spark's `percentile` (`lower*(hiIdx-pos) + higher*(pos-loIdx)`),
  *     so results are bit-identical to the aggregate this replaces —
  *     and therefore to DuckDB's `quantile_cont` wherever that equality
  *     already held (integral domains; q16's oracle).
  *
  * Every post-histogram stage runs over |groups| x |domain| rows —
  * metadata-sized at any corpus scale. This is NOT a general replacement:
  * an unbounded continuous domain makes the histogram the dataset (use
  * `approx_percentile`'s mergeable GK sketch there — q21's certified
  * path). ExactQuantilesSpec proves equality with Spark's `percentile`
  * on multi-group fixtures including single-value and single-row groups
  * and q in {0, 1}.
  */
object ExactQuantiles {

  /** One row per group: the group columns, `n`, and one exact
    * interpolated percentile column per `(q, alias)` pair. `valueCol`
    * must be numeric and SHOULD be low-cardinality (see class doc).
    *
    * NULL contract, stated precisely: `n` is the NON-NULL value count
    * (the population the percentile is computed over — what
    * `percentile` itself counts), and a group whose values are ALL null
    * is absent from the output entirely (nulls are filtered before the
    * groupBy, so such a group never forms). This differs from pairing
    * the builtin with `count(1)` — which would emit the group with the
    * raw row count and a null percentile; callers wanting that shape
    * must outer-join against `df.groupBy(groupCols).count()`. The
    * bit-identical-to-`percentile` claim is about the percentile VALUES
    * over groups with at least one non-null value (q16's domain,
    * `l_quantity`, is non-null, where the two shapes coincide).
    */
  def contByHistogram(df: DataFrame, groupCols: Seq[String], valueCol: String,
      qs: Seq[(Double, String)]): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    qs.foreach { case (q, _) =>
      require(q >= 0.0 && q <= 1.0, s"quantile $q outside [0, 1]")
    }
    val gs = groupCols.map(col)
    val v = col(valueCol).cast("double")

    // 1. the histogram: map-side-combined, domain-bounded shuffle
    val hist = df.select((gs :+ v.as("v")): _*)
      .where(col("v").isNotNull) // percentile ignores nulls
      .groupBy((groupCols.map(col) :+ col("v")): _*)
      .agg(count(lit(1)).as("cnt"))

    // 2. cumulative index intervals per value: this value's rows occupy
    // 0-based order-statistic indices [cumStart, cumEnd)
    val byGroup = Window.partitionBy(gs: _*)
    val ordered = byGroup.orderBy(col("v"))
    val cum = hist
      .withColumn("cumEnd", sum(col("cnt")).over(ordered))
      .withColumn("cumStart", col("cumEnd") - col("cnt"))
      .withColumn("n", sum(col("cnt")).over(byGroup))

    // 3. per quantile: mark the bracketing order statistics, then one
    // tiny per-group aggregate picks them out and interpolates
    def markers(q: Double, alias: String): Seq[(Column, String)] = {
      val pos = (col("n") - 1).cast("double") * lit(q)
      val loIdx = floor(pos).cast("long")
      val hiIdx = loIdx + 1
      Seq(
        (max(when(col("cumStart") <= loIdx && loIdx < col("cumEnd"), col("v"))),
          s"__lo_$alias"),
        (max(when(col("cumStart") <= hiIdx && hiIdx < col("cumEnd"), col("v"))),
          s"__hi_$alias"),
        (max(pos), s"__pos_$alias"))
    }
    val aggs = (max(col("n")).as("n") +:
      qs.flatMap { case (q, a) => markers(q, a).map { case (c, n) => c.as(n) } })
    val picked = cum.groupBy(gs: _*).agg(aggs.head, aggs.tail: _*)

    val outCols = gs ++ Seq(col("n")) ++ qs.map { case (_, a) =>
      val lo = col(s"__lo_$a"); val hi = col(s"__hi_$a"); val pos = col(s"__pos_$a")
      val loIdxD = floor(pos)
      val hiIdxD = loIdxD + 1.0
      // pos on an exact order statistic (incl. pos == n-1, where no
      // higher statistic exists): the lower statistic IS the percentile.
      // Otherwise the WEIGHTED form lower*(hiIdx-pos) + higher*(pos-loIdx)
      // — the exact double arithmetic Spark's builtin `percentile` runs,
      // so this path is bit-identical to the aggregate it replaces (and
      // to the oracle equality q16 already proved against it).
      when(pos === loIdxD || hi.isNull, lo)
        .otherwise(lo * (hiIdxD - pos) + hi * (pos - loIdxD)).as(a)
    }
    picked.select(outCols: _*)
  }
}
