package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns._

class TextFnsSpec extends SparkTestBase {

  private def one(c: org.apache.spark.sql.Column): Any = sel(c).get(0)

  test("wsTokenCount counts whitespace-separated tokens, 0 for blank") {
    assert(one(wsTokenCount(lit("a b  c\td"))) == 4L)
    assert(one(wsTokenCount(lit("   "))) == 0L)
    assert(one(wsTokenCount(lit(""))) == 0L)
  }

  test("bpeTokenCount splits letter runs, digit runs, single punctuation") {
    assert(one(bpeTokenCount(lit("ab12 cd!"))) == 4L) // ab, 12, cd, !
    assert(one(bpeTokenCount(lit("a.b.c"))) == 5L)
  }

  test("punctCount and stopwordCount") {
    assert(one(punctCount(lit("a, b. c!"))) == 3L)
    assert(one(stopwordCount(lit("The cat is on the mat"))) == 3L) // the, is, the
    assert(one(stopwordCount(lit("Theater therapy"))) == 0L) // word-boundary anchored
  }

  test("langIdGuess: argmax with deterministic tie-break, und for no hits") {
    assert(one(langIdGuess(lit("the cat and the dog with fur"))) == "en")
    assert(one(langIdGuess(lit("der hund und die katze ist"))) == "de")
    assert(one(langIdGuess(lit("xyz qwerty 12345"))) == "und")
  }

  test("qualityScore10: integer score components") {
    val good = "the quick brown fox jumps over the lazy dog and keeps running " +
      "through the field with great joy and speed every single day" // >100 chars, stopwords, no punct soup
    assert(one(qualityScore10(lit(good))) == 10L)
    assert(one(qualityScore10(lit("x!"))) == 0L) // short, punct-heavy, no stopwords
    assert(one(qualityScore(lit(good))) == 1.0)
  }

  test("fingerprint collapses case and whitespace differences") {
    val a = one(fingerprint(lit("Hello   World")))
    val b = one(fingerprint(lit("hello world")))
    val c = one(fingerprint(lit("hello worlds")))
    assert(a == b)
    assert(a != c)
  }

  test("t21 chunks: closed-form count, full coverage, exact overlap") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val (w, st) = (graft.queries.TextQueries.RagChunkTokens,
      graft.queries.TextQueries.RagChunkStride)
    val nTokens = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(lower(trim(col("text"))), "\\s+")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val chunks = SparkEntry.queries("t21_rag_chunks")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    assert(chunks.keySet == nTokens.keySet, "chunking dropped or invented docs")
    chunks.foreach { case (doc, cs) =>
      val n = nTokens(doc)
      val sorted = cs.sortBy(_._2)
      assert(sorted.length == (n - 1) / st + 1, s"doc $doc: chunk count")
      sorted.foreach { case (_, cid, tStart, nc) =>
        assert(tStart == cid * st, s"doc $doc chunk $cid: start drifted")
        assert(nc == math.min(w.toLong, n - tStart), s"doc $doc chunk $cid: length")
        assert(nc >= 1, s"doc $doc chunk $cid: empty chunk emitted")
      }
      // coverage: last chunk reaches n; consecutive full chunks overlap w-st
      assert(sorted.last._3 + sorted.last._4 == n, s"doc $doc: tail uncovered")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 + a._4 >= b._3, s"doc $doc: gap between chunks ${a._2},${b._2}")
        case _ => ()
      }
    }
    // overlap is non-vacuous: some doc actually has >= 2 chunks
    assert(chunks.values.exists(_.length >= 2), "no doc long enough to overlap")
  }
}
