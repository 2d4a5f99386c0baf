package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.functions.udaf

/** Element-wise sum of quantized vectors (`array<long>`): the exact
  * integer centroid-numerator aggregation for IVF/k-means assignment
  * (SURVEY §2.8's vector-centroid aggregator). A typed
  * `Aggregator[IN,BUF,OUT]` — NOT a black-box scalar udf — so Spark runs
  * it with map-side partial aggregation: each partition folds its vectors
  * into one buffer and only |labels| x dim longs shuffle, the same
  * partial-agg shape a built-in sum gets. Dimension is taken from the
  * data, not hardcoded; empty groups yield an empty array.
  */
class VecSumAgg extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], a: Seq[Long]): Array[Long] =
    if (b.isEmpty) a.toArray
    else {
      // explicit failure beats silently truncating a ragged vector
      require(a.length == b.length,
        s"vector length mismatch in group: ${a.length} vs ${b.length}")
      var i = 0
      while (i < b.length) { b(i) += a(i); i += 1 }
      b
    }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else {
      require(x.length == y.length,
        s"vector length mismatch in group: ${x.length} vs ${y.length}")
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object VecSumAgg {
  /** Column form: `groupBy(cell).agg(VecSumAgg.vecSum(col("q")))`. */
  def vecSum(c: Column): Column = {
    implicit val enc: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    udaf(new VecSumAgg).apply(c)
  }
}
