package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV) distinct-count sketch over md5-derived hashes —
  * a deterministic, mergeable cardinality estimator (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream"). The sketch of a group
  * is the set of its k smallest DISTINCT hash values; the union rule
  * `kmin(A ∪ B) = kmin(kmin(A) ∪ kmin(B))` makes it a classic map-side
  * partial aggregate: each partition ships at most k longs per group, so
  * the shuffle is k·|groups| regardless of row count — the property that
  * lets a 100 TB scan estimate per-group cardinalities in one pass.
  *
  * Determinism is the point (vs approx_count_distinct's HLL): hashes are
  * md5-derived 28-bit values computable identically in any engine
  * ([[GraftHash.base28]] == DuckDB `CAST('0x' || substring(md5(s), 1, 7)
  * AS BIGINT)`), so the estimate is bit-exact cross-engine and the oracle
  * can certify it.
  */
class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(k > 0, s"k must be positive: $k")

  /** Buffer: ascending, distinct, size <= k. */
  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(b, h)
    if (pos >= 0) b // already present
    else {
      val ins = -pos - 1
      if (ins >= k) b // larger than the current k-th minimum
      else {
        val n = math.min(b.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else {
      // merge two sorted distinct arrays, keep the k smallest distinct
      val out = new Array[Long](math.min(x.length + y.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < x.length || j < y.length)) {
        val takeX = j >= y.length || (i < x.length && x(i) <= y(j))
        val v = if (takeX) x(i) else y(j)
        if (takeX) i += 1 else j += 1
        if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object KmvSketch {

  /** Hash domain size: base28 yields values in [0, 2^28). */
  val HashSpace: Double = 268435456.0

  /** Column form: the k-min-values array of `hashCol` (a base28 hash). */
  def kmv(hashCol: Column, k: Int): Column = {
    implicit val enc: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    udaf(new KmvAgg(k)).apply(hashCol)
  }

  /** Cardinality estimate from a k-min array: exact count when the group
    * has fewer than k distinct hashes (the sketch IS the distinct set),
    * else (k-1) * H / h_k with h_k the k-th smallest hash — one double
    * multiply + divide, identical IEEE ops in any engine.
    */
  def estimate(kmvCol: Column, k: Int): Column =
    when(size(kmvCol) < k, size(kmvCol).cast("double"))
      .otherwise(lit((k - 1) * HashSpace) / element_at(kmvCol, k).cast("double"))
}
