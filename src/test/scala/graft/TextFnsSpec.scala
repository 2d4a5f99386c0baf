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
}
