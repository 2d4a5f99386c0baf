package graft

import org.apache.spark.sql.functions._
import graft.functions.DedupFns._

class DedupFnsSpec extends SparkTestBase {

  private def one(c: org.apache.spark.sql.Column): Any = sel(c).get(0)

  test("shingles: distinct word 3-grams; short docs fall back to whole text") {
    val sh = one(shingles(lit("a b c d c d"))).asInstanceOf[scala.collection.Seq[String]]
    assert(sh == Seq("a b c", "b c d", "c d c", "d c d")) // 4 distinct of 4
    val short = one(shingles(lit("  A  b "))).asInstanceOf[scala.collection.Seq[String]]
    assert(short == Seq("a b"))
  }

  test("minhash is permutation-invariant over the shingle set") {
    val a = one(minhash(shingles(lit("a b c d e f")), 0))
    // same shingle multiset in different doc order produces same min for
    // identical sets; here just assert determinism across evaluations
    val b = one(minhash(shingles(lit("a b c d e f")), 0))
    assert(a == b)
    val other = one(minhash(shingles(lit("x y z w")), 0))
    assert(a != other)
  }

  test("minhashSignature: one-pass fold equals per-seed minhash") {
    val sig = one(minhashSignature(shingles(lit("a b c d e f g")), 9))
      .asInstanceOf[scala.collection.Seq[String]]
    val perSeed = (0 until 9).map(j => one(minhash(shingles(lit("a b c d e f g")), j)))
    assert(sig == perSeed)
  }

  test("bandKeys: identical docs collide on every band") {
    def keys(t: String) =
      one(bandKeys(minhashSignature(shingles(lit(t)), 9), 3, 3))
        .asInstanceOf[scala.collection.Seq[String]]
    val k1 = keys("a b c d e")
    val k2 = keys("a  B c D e")
    assert(k1 == k2) // normalization collapses case/whitespace
    assert(k1.size == 3)
  }

  test("hamming: zero on equal strings, counts differing positions") {
    assert(one(hamming(lit("0101"), lit("0101"))) == 0L)
    assert(one(hamming(lit("0101"), lit("1101"))) == 1L)
    assert(one(hamming(lit("0000"), lit("1111"))) == 4L)
  }

  test("jaccard: exact on distinct arrays, 0 for empty union") {
    assert(one(jaccard(array(lit("a"), lit("b")), array(lit("b"), lit("c")))) ==
      (1.0 / 3.0))
    assert(one(jaccard(array(lit("a")), array(lit("a")))) == 1.0)
  }

  test("simhash16: 16 bits, equal for equal token sets") {
    val h = one(simhash16(lit("cat dog fish"))).asInstanceOf[String]
    assert(h.length == 16 && h.forall(c => c == '0' || c == '1'))
    assert(one(simhash16(lit("dog fish cat cat"))) == h) // set semantics
  }

  test("rollingFingerprint: deterministic, order-sensitive, ASCII projection") {
    val a = one(rollingFingerprint(lit("abc")))
    assert(a == ((('a' * 31 + 'b') * 31 + 'c') % 1000000007).toLong)
    assert(one(rollingFingerprint(lit("cba"))) != a)
    assert(one(rollingFingerprint(lit("a中bc"))) == a) // non-ASCII stripped
  }
}
