package graft

import org.apache.spark.sql.functions._
import graft.functions.WinnowFingerprints

/** graft_winnow (d10's rolling-hash fingerprint primitive) vs an
  * independent per-position reimplementation written from the definition:
  * hash every k-byte gram with the polynomial sum c_j * B^(k-1-j) mod M
  * (recomputed per position — no rolling update), take the min per w-gram
  * tumbling block, distinct. The expression under test uses the Rabin-Karp
  * rolling update; equality proves the roll drops and re-adds byte weights
  * correctly, including the negative-mod corner.
  */
class WinnowSpec extends SparkTestBase {

  GraftNative.ensure(spark)

  /** Definitional (non-rolling) reference. */
  private def ref(s: String, k: Int, w: Int): Set[Long] = {
    val M = WinnowFingerprints.M
    val B = WinnowFingerprints.B
    val bytes = s.getBytes("UTF-8")
    val nGrams = bytes.length - k + 1
    if (nGrams <= 0) return Set.empty
    val hashes = (0 until nGrams).map { i =>
      var h = 0L
      var j = 0
      while (j < k) { h = (h * B + (bytes(i + j) & 0xffL)) % M; j += 1 }
      h
    }
    hashes.grouped(w).map(_.min).toSet
  }

  private def native(s: String, k: Int, w: Int): Set[Long] =
    sel(GraftNative.winnow(lit(s), k, w)).getSeq[Long](0).toSet

  test("matches the definitional reference on assorted texts") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", // degenerate: all grams equal
      "abcdefgh",                              // exactly one gram at k=8
      "ab" * 40,                               // periodic
      (0 until 200).map(i => ('a' + i % 26).toChar).mkString)
    for (t <- texts; k <- Seq(4, 8); w <- Seq(1, 5, 16)) {
      assert(native(t, k, w) == ref(t, k, w), s"text=${t.take(20)} k=$k w=$w")
    }
  }

  test("shorter-than-k text yields no fingerprints; null stays null") {
    assert(native("abc", 8, 16).isEmpty)
    assert(native("", 8, 16).isEmpty)
    assert(sel(GraftNative.winnow(lit(null).cast("string"), 8, 16)).isNullAt(0))
  }

  test("identical texts share every fingerprint; disjoint alphabets share none") {
    val a = "shared duplicated content that is long enough to span blocks " * 3
    assert(native(a, 8, 16) == native(a, 8, 16))
    val b = "0123456789" * 20
    assert(native(a, 8, 16).intersect(native(b, 8, 16)).isEmpty)
  }

  test("property: matches the definitional reference on fuzzed ASCII text") {
    val rnd = new scala.util.Random(20260813)
    val alphabet = (' ' to '~').mkString
    (0 until 200).foreach { i =>
      val len = rnd.nextInt(400)
      val t = Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val k = 2 + rnd.nextInt(10)
      val w = 1 + rnd.nextInt(24)
      assert(native(t, k, w) == ref(t, k, w),
        s"fuzz case $i: len=$len k=$k w=$w text=${t.take(40)}")
    }
  }

  test("hashSql unrolled arithmetic equals the native hash (Spark-evaluated)") {
    // hashSql targets DuckDB but uses only engine-generic SQL (ascii,
    // substring, % and *), so Spark can evaluate the same string: compute
    // all gram hashes of a text via the unrolled form with w=1 (winnow
    // with block size 1 = every gram hash, distinct).
    val t = "cross engine rolling hash parity check"
    val k = 8
    val n = t.length - k + 1
    val sqlHashes = spark.sql(
      s"""SELECT transform(sequence(1, $n),
         |  i -> ${WinnowFingerprints.hashSql(s"'$t'", k)}) AS hs""".stripMargin)
      .head().getSeq[Long](0).toSet
    assert(sqlHashes == native(t, k, 1))
  }
}
