package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.functions.udaf

/** `collect_list` with a HARD per-group bound — the aggregation a
  * df-capped inverted index actually needs. A plain collect-then-filter
  * (`collect_list` + `size(docs) <= cap`) has unbounded group state: at
  * corpus scale a stopword shingle appears in ~every document, and one
  * group's buffer becomes gigabytes before the filter ever sees it. This
  * aggregator stops retaining at `limit + 1` elements — the extra one
  * marks "over the cap" without storing the overflow — so every buffer,
  * map-side partial, and shuffled merge is at most `limit + 1` longs no
  * matter how hot the key. Downstream, `size(docs) BETWEEN 2 AND limit`
  * is then EXACTLY `COUNT(*) BETWEEN 2 AND limit` (capping only engages
  * past limit + 1), which is the oracle's df predicate.
  *
  * Shipped as a typed [[Aggregator]] (not a scalar udf) so Spark runs it
  * with map-side partial aggregation: each partition contributes at most
  * `limit + 1` values per live key to the shuffle — the "partial df on
  * the map side" that keeps the exploded-shingle aggregation sub-linear
  * in shuffle volume at 10-100x corpus growth.
  */
class BoundedCollectLongAgg(limit: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(limit >= 1, s"limit must be >= 1, got $limit")
  private val cap = limit + 1 // one surplus element = the overflow marker

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], a: Long): Array[Long] =
    if (b.length >= cap) b else b :+ a

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    if (x.length >= cap) x
    else if (y.length >= cap) y
    else if (x.length + y.length <= cap) x ++ y
    else (x ++ y).take(cap)

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object BoundedCollectLongAgg {
  /** Column form: `groupBy(k).agg(boundedCollect(col("doc_id"), 20))`.
    * Result length `limit + 1` means "more than limit values existed" —
    * the group is over the cap and carries only its first `limit + 1`.
    */
  def boundedCollect(c: Column, limit: Int): Column = {
    implicit val enc: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    udaf(new BoundedCollectLongAgg(limit)).apply(c)
  }
}
