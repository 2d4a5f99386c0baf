package graft

import java.security.MessageDigest
import org.apache.spark.sql.functions._
import graft.functions.{DedupFns, VectorFns}

/** The native Catalyst expressions must compute exactly what their
  * Column-composition twins (or an independent in-test reimplementation)
  * compute — they exist for speed, not different semantics.
  */
class NativeExprsSpec extends SparkTestBase {

  GraftNative.ensure(spark)

  private def one(c: org.apache.spark.sql.Column): Any = sel(c).get(0)

  test("graft_long_dot equals the HOF qdot (and works from SQL)") {
    val a = array((1L to 64L).map(lit): _*)
    val b = array((64L to 1L by -1L).map(lit): _*)
    assert(one(GraftNative.longDot(a, b)) == one(VectorFns.qdot(a, b)))
    assert(one(GraftNative.longDot(a, a)) == one(VectorFns.qnorm2(a)))
    assert(spark.sql("SELECT graft_long_dot(array(1L,2L,3L), array(4L,5L,6L)) AS d")
      .head().getLong(0) == 32L)
  }

  test("graft_minhash_sig equals the HOF minhashSignature") {
    val sh = DedupFns.shingles(lit("the quick brown fox jumps over the lazy dog again and again"))
    val native = one(GraftNative.minhashSignature(sh, 9))
      .asInstanceOf[scala.collection.Seq[Long]]
    val hof = one(DedupFns.minhashSignature(sh, 9))
      .asInstanceOf[scala.collection.Seq[Long]]
    assert(native == hof)
    assert(native.size == 9)
  }

  test("graft_hamming equals the HOF hamming") {
    val pairs = Seq(("0101", "0101"), ("0101", "1010"), ("111", "101"))
    pairs.foreach { case (x, y) =>
      assert(one(GraftNative.hamming(lit(x), lit(y))) ==
        one(DedupFns.hamming(lit(x), lit(y))))
    }
  }

  test("graft_simhash64 matches an independent MessageDigest reimplementation") {
    // reference implementation, written from the definition (not the code
    // under test): bit j = majority vote of bit j of the first 16 md5 hex
    // digits of each shingle
    def ref(shingles: Seq[String]): String = {
      val md = MessageDigest.getInstance("MD5")
      val votes = new Array[Int](64)
      for (s <- shingles) {
        md.reset()
        val d = md.digest(s.getBytes("UTF-8"))
        var h = 0L
        for (i <- 0 until 8) h = (h << 8) | (d(i) & 0xffL)
        for (j <- 0 until 64)
          if (((h >>> (63 - j)) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
      }
      votes.map(v => if (v > 0) '1' else '0').mkString
    }
    val text = "pack my box with five dozen liquor jugs for the trip"
    val shingles = {
      val toks = text.split(" ").toSeq
      toks.sliding(3).map(_.mkString(" ")).distinct.toSeq
    }
    val native = one(GraftNative.simhash64(DedupFns.shingles(lit(text))))
      .asInstanceOf[String]
    assert(native == ref(shingles))
    assert(native.length == 64 && native.forall(c => c == '0' || c == '1'))
    // set/normalization invariance
    assert(one(GraftNative.simhash64(DedupFns.shingles(
      lit("PACK my  box with five dozen liquor jugs for the trip")))) == native)
  }

  test("graft_shingles equals the HOF shingles (order, distinct, short-doc fallback)") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c d c d a b c", // repeated shingles -> distinct keeps first
      "  two   words ",     // short doc -> whole normalized text
      "one")
    texts.foreach { t =>
      val native = one(GraftNative.shingles(DedupFns.normText(lit(t))))
      val hof = one(DedupFns.shingles(lit(t)))
      assert(native == hof, s"shingle mismatch on: '$t'")
    }
  }

  test("graft_rolling_fp equals the HOF rollingFingerprint (incl. non-ASCII)") {
    Seq("abc", "cba", "a中bc", "", "hello world! \t tab", "é mixé utf8 ñ")
      .foreach { t =>
        assert(one(GraftNative.rollingFingerprint(lit(t))) ==
          one(DedupFns.rollingFingerprint(lit(t))), s"mismatch on: '$t'")
      }
  }

  test("graft_text_stats equals the regex counters and the derived lang/quality") {
    import graft.functions.TextFns
    val texts = Seq(
      "The quick brown fox; and the lazy dog, of course!",
      "der die das und ist ein test",
      "le la les et est une pour dans",
      "el los y es una por para si",
      "punct!!! soup??? ###",
      "",
      "   ",
      "\tleading tab",
      "mixed 123 abc42 under_score the-end",
      "unicode: éàü 中文 text the end")
    texts.foreach { t =>
      val row = sel(
        GraftNative.textStats(lit(t)).as("st"),
        TextFns.wsTokenCount(lit(t)), TextFns.bpeTokenCount(lit(t)),
        TextFns.punctCount(lit(t)), TextFns.stopwordCount(lit(t)),
        TextFns.langIdGuess(lit(t)), TextFns.qualityScore10(lit(t)),
        TextFns.langIdGuessFrom(GraftNative.textStats(lit(t))),
        TextFns.qualityScore10From(GraftNative.textStats(lit(t)), lit(t)))
      val st = row.getStruct(0)
      assert(st.getLong(0) == row.getLong(1), s"ws_tokens mismatch on '$t'")
      assert(st.getLong(1) == row.getLong(2), s"bpe_tokens mismatch on '$t'")
      assert(st.getLong(2) == row.getLong(3), s"n_punct mismatch on '$t'")
      assert(st.getLong(3) == row.getLong(4), s"n_stop mismatch on '$t'")
      assert(row.getString(7) == row.getString(5), s"lang guess mismatch on '$t'")
      assert(row.getLong(8) == row.getLong(6), s"quality mismatch on '$t'")
    }
  }

  test("property: graft_text_stats/rolling_fp equal the regex twins on fuzzed text") {
    import org.scalacheck.Gen
    import graft.functions.{DedupFns, TextFns}
    // mix of word-ish tokens (incl. stopwords of every language set), digits,
    // punctuation, unicode, and whitespace runs
    val token: Gen[String] = Gen.frequency(
      3 -> Gen.oneOf(TextStatsTestWords.all),
      3 -> Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar)).map(_.mkString),
      1 -> Gen.oneOf("!", "?!", "##", ",", "...", "_", "a_b", "42x"),
      1 -> Gen.oneOf("é", "中文", "ñandú", "ü42"))
    val ws: Gen[String] = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    val text: Gen[String] = for {
      n <- Gen.choose(0, 30)
      toks <- Gen.listOfN(n, token)
      seps <- Gen.listOfN(n, ws)
      lead <- Gen.oneOf("", " ", "\t")
    } yield lead + toks.zip(seps).map { case (t, s) => t + s }.mkString
    val texts = Gen.listOfN(200, text).sample.getOrElse(fail("generator exhausted"))
    import spark.implicits._
    val bad = texts.toDF("t")
      .select(GraftNative.textStats(col("t")).as("st"), col("t"),
        TextFns.wsTokenCount(col("t")).as("r_ws"),
        TextFns.bpeTokenCount(col("t")).as("r_bpe"),
        TextFns.punctCount(col("t")).as("r_punct"),
        TextFns.stopwordCount(col("t")).as("r_stop"))
      .where(
        col("st.ws_tokens") =!= TextFns.wsTokenCount(col("t")) ||
        col("st.bpe_tokens") =!= TextFns.bpeTokenCount(col("t")) ||
        col("st.n_punct") =!= TextFns.punctCount(col("t")) ||
        col("st.n_stop") =!= TextFns.stopwordCount(col("t")) ||
        TextFns.langIdGuessFrom(col("st")) =!= TextFns.langIdGuess(col("t")) ||
        TextFns.qualityScore10From(col("st"), col("t")) =!= TextFns.qualityScore10(col("t")) ||
        GraftNative.rollingFingerprint(col("t")) =!= DedupFns.rollingFingerprint(col("t")))
      .collect()
    assert(bad.isEmpty, s"native/regex mismatch on: ${bad.take(3).mkString("; ")}")
  }

  test("graft_overlap equals size(array_intersect) on distinct arrays; jaccard matches") {
    val cases = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("a")),
      (Seq("a", "b"), Seq("c", "d")),
      (Seq.empty[String], Seq("a")),
      (Seq.empty[String], Seq.empty[String]),
      (Seq("x y z", "y z w"), Seq("y z w", "z w v", "q")))
    cases.foreach { case (a, b) =>
      val (ca, cb) = (array(a.map(lit): _*), array(b.map(lit): _*))
      assert(one(GraftNative.overlap(ca, cb)) ==
        one(size(array_intersect(ca, cb)).cast("long")), s"overlap mismatch on $a / $b")
      assert(one(GraftNative.jaccard(ca, cb)) == one(DedupFns.jaccard(ca, cb)),
        s"jaccard mismatch on $a / $b")
    }
  }

  test("graft_kv_parse equals the Column kv functions field-by-field") {
    import graft.functions.PathFns
    val raws = Seq(
      "keylength.file=16 file=/a/my file.d at pino=7 ino=42 uid=u1 gid=g1 treesize=99 size=7",
      "keylength.file=6 file=/a/b.c ino=9 uid=u gid=g size=3",
      "ino=5 uid=x") // no keylength prefix, missing keys
    raws.foreach { r =>
      val row = sel(
        GraftNative.kvParse(lit(r)).as("kv"),
        PathFns.kvIno(lit(r)).as("i"), PathFns.kvFile(lit(r)).as("f"),
        PathFns.kvUid(lit(r)).as("u"), PathFns.kvGid(lit(r)).as("g"),
        PathFns.kvSize(lit(r)).as("s"))
      val kv = row.getStruct(0)
      assert(kv.get(0) == row.get(1), s"ino mismatch on: $r")
      assert(kv.get(1) == row.get(2), s"file mismatch on: $r")
      assert(kv.get(2) == row.get(3), s"uid mismatch on: $r")
      assert(kv.get(3) == row.get(4), s"gid mismatch on: $r")
      assert(kv.get(4) == row.get(5), s"size mismatch on: $r")
    }
  }

  test("GraftExtensions injects the same functions at session build time") {
    // The builder path can't be exercised on the already-running shared
    // session; assert the extension wires every registration by applying
    // it to a fresh SparkSessionExtensions and checking the names.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builder list is shared
    assert(GraftNative.registrations.map(_._1.funcName).sorted ==
      Seq("graft_bloom_mc", "graft_dim_counts", "graft_hamming",
        "graft_jaccard", "graft_kv_parse", "graft_long_dot",
        "graft_minhash_sig", "graft_overlap", "graft_rolling_fp",
        "graft_shingles", "graft_simhash64", "graft_text_stats",
        "graft_winnow"))
  }

  test("graft_bloom_mc: no false negatives, and actually rejects non-members") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val members = spark.range(0, 2000)
      .select(concat(lit("member-"), col("id")).as("s"))
    val bf = members.stat.bloomFilter("s", 2000, 0.03)
    val bytes = GraftNative.serializeBloom(bf)
    // contract half: every inserted value probes true — this is what
    // makes the d15 prefilter result-identical to the exact join
    assert(members.where(!GraftNative.bloomMightContain(col("s"), bytes))
      .count() == 0L, "bloom false negative — prefilter would DROP rows")
    // usefulness half: the probe must reject (not pass-through) — at 3%
    // target fpp, 2000 fresh non-members pass at ~3%; 15% is 5x slack
    val fp = spark.range(0, 2000)
      .select(concat(lit("other-"), col("id")).as("s"))
      .where(GraftNative.bloomMightContain(col("s"), bytes))
      .count()
    assert(fp <= 300, s"bloom passed $fp/2000 non-members — prefilter is vacuous")
  }

  test("graft_dim_counts equals the HOF hashing-trick histogram") {
    import org.apache.spark.sql.functions.{conv, filter, md5, sequence, size, split, substring, transform, trim, lower}
    val dim = 64
    val toks = split(lower(trim(lit("The quick brown Fox jumps over the lazy dog " * 3))), "\\s+")
    val hof = {
      val bks = transform(toks, t => conv(substring(md5(t), 1, 7), 16, 10).cast("long") % dim)
      transform(sequence(lit(0L), lit(dim - 1L)),
        j => size(filter(bks, b => b === j)).cast("long"))
    }
    val native = one(GraftNative.dimCounts(toks, dim)).asInstanceOf[scala.collection.Seq[Long]]
    val expected = one(hof).asInstanceOf[scala.collection.Seq[Long]]
    assert(native == expected)
    assert(native.size == dim && native.sum == 27L)
  }
}

/** Word pool for the text-stats property: every stopword of every set,
  * so the language/quality counters are actually exercised.
  */
private object TextStatsTestWords {
  val all: Seq[String] =
    (graft.functions.TextStats.QualitySet ++
      graft.functions.TextStats.LangSets.flatten).toSeq.sorted
}
