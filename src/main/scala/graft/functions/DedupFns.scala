package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Near-duplicate detection building blocks for training-data pipelines:
  * word-shingles, MinHash signatures, LSH band keys, SimHash, Hamming.
  *
  * Everything is a pure Column expression — no UDFs, no driver collect.
  * NOTE on execution: Spark's higher-order functions (`transform` /
  * `aggregate` / `zip_with`) are INTERPRETED (CodegenFallback), with no
  * whole-stage codegen and no common-subexpression elimination. Two rules
  * follow, and this file + its call sites obey both:
  *   1. one pass per row — tokenize/hash once and carry the result through
  *      a single `aggregate`, never one HOF tree per bit/band (an
  *      interpreted tree re-evaluates shared subtrees every time);
  *   2. stage the results — callers write signatures to a table
  *      ([[graft.operators.Stage.table]]) before self-joins so the
  *      interpreted tree runs once per doc, not once per downstream
  *      operator.
  *
  * Hash parity with the DuckDB oracle is achieved by using md5 HEX STRINGS
  * as the hash domain: `min(md5(seed|shingle))` under lexicographic string
  * order is a valid MinHash (md5 is uniform on the hex alphabet) and both
  * engines agree byte-for-byte, sidestepping integer-hash implementation
  * differences.
  *
  * Scale notes (100 TB): signatures/bands are fixed-width per doc — the
  * LSH self-join shuffles on (band_idx, band_key), which is uniformly
  * distributed by construction (md5), so no skew; candidate verification
  * touches only same-bucket pairs, never the cross product.
  */
object DedupFns {

  /** Whitespace-collapsed, lowercased, trimmed text. */
  def normText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Distinct word n-gram shingles of the normalized text; docs shorter
    * than n words contribute their whole normalized text as one shingle.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val norm = normText(text)
    val toks = split(norm, " ")
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array(norm))
  }

  /** MinHash integer domain: the seed family h_i(x) = (A_i*x + B_i) mod P
    * over a 28-bit md5-derived base. ONE md5 per shingle total; each seed
    * hash is then three long ops — two orders of magnitude cheaper in the
    * interpreted HOF evaluator than one md5 per (shingle, seed), at the
    * same oracle parity (DuckDB: CAST('0x'||substring(md5(s),1,7) AS
    * BIGINT) and the same literal A/B/P).
    */
  val MinhashPrime = 2147483647L // 2^31-1; A*base+B < 2^59, no overflow
  def mhA(i: Int): Long = 1103515245L + 2L * i // odd multipliers
  def mhB(i: Int): Long = 12345L + 7919L * i

  /** 28-bit integer base hash of a shingle: first 7 hex digits of md5. */
  def shingleBase(s: Column): Column =
    conv(substring(md5(s), 1, 7), 16, 10).cast("long")

  /** One MinHash value: min over shingles of (A_seed*base + B_seed) mod P.
    * Prefer [[minhashSignature]] when more than one value is needed — this
    * traverses the shingle array once per call.
    */
  def minhash(shinglesCol: Column, seed: Int): Column =
    array_min(transform(shinglesCol,
      s => (lit(mhA(seed)) * shingleBase(s) + lit(mhB(seed))) % MinhashPrime))

  /** Full signature as `array<long>` of `numHashes` MinHash values in TWO
    * array passes: materialize the per-shingle 28-bit bases (one md5
    * each), then fold a running-min array where each base contributes its
    * `numHashes` seed hashes as pure long arithmetic. Same values as
    * `numHashes` calls to [[minhash]].
    */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    aggregate(
      transform(shinglesCol, shingleBase(_)),
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(numHashes - 1)),
        (m, i) => least(m,
          ((lit(1103515245L) + i.cast("long") * 2L) * h +
            (lit(12345L) + i.cast("long") * 7919L)) % MinhashPrime)))

  /** LSH band keys from a precomputed [[minhashSignature]]: `bands` groups
    * of `rowsPerBand` consecutive signature entries, each collapsed to one
    * md5 key. Two docs collide on a band iff that band's hashes all match.
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|",
        (0 until rowsPerBand).map(r =>
          element_at(sig, b * rowsPerBand + r + 1).cast("string")): _*))
    }: _*)

  /** Exact Jaccard similarity of two DISTINCT shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("long")
    val uni = size(a).cast("long") + size(b).cast("long") - inter
    when(uni === 0L, lit(0.0)).otherwise(inter.cast("double") / uni.cast("double"))
  }

  /** Majority-vote SimHash over per-token hex hashes: bit j of the
    * signature is set iff, summed over tokens, hex digit j of the token's
    * hash has its top bit set more often than not. One fold carrying a
    * `bits`-element vote array — tokens are hashed ONCE (the `hashes`
    * array is materialized before the fold), and each fold step does
    * `bits` cheap substring tests.
    */
  private def simhashBits(hashes: Column, bits: Int): Column = {
    val votes = aggregate(
      hashes,
      array_repeat(lit(0L), bits),
      (acc, h) => transform(acc, (v, j) =>
        v + when(h.substr(j + 1, lit(1)) >= "8", 1L).otherwise(-1L)))
    array_join(transform(votes, v => when(v > 0, lit("1")).otherwise(lit("0"))), "")
  }

  /** 16-bit SimHash (one md5 per distinct token) as a '0'/'1' string. */
  def simhash16(text: Column): Column =
    simhashBits(transform(array_distinct(split(normText(text), " ")), t => md5(t)), 16)

  // 64-bit SimHash lives in [[SimHash64Expr]] (native Catalyst expression,
  // exposed as graft.GraftNative.simhash64): a 16-bit signature space
  // (65,536 buckets) cannot carry a large corpus, and the 64-wide vote
  // fold is exactly the shape the interpreted HOF evaluator is worst at.
  // It hashes SHINGLES, not bare tokens, deliberately: template-heavy
  // corpora share most of their vocabulary, so a token-SET SimHash
  // collapses (measured on the test corpus: top band bucket 1505 of 5500
  // docs, 3.3M candidate pairs); shingles carry word order and keep
  // buckets small (top bucket 5, 1.8k candidates).

  /** Hamming distance between two equal-length '0'/'1' signature strings. */
  def hamming(a: Column, b: Column): Column =
    aggregate(
      zip_with(split(a, ""), split(b, ""),
        (x, y) => when(x === y, 0L).otherwise(1L)),
      lit(0L),
      (acc, x) => acc + x)

  /** Polynomial rolling-hash fingerprint over the printable-ASCII
    * projection of the text: acc = (acc*31 + codepoint) mod 1e9+7.
    * ASCII-only so char iteration order/semantics agree across engines.
    */
  def rollingFingerprint(text: Column): Column = {
    val asciiOnly = regexp_replace(text, "[^ -~]", "")
    // filter the empty strings Java's split-by-empty-pattern emits at the
    // boundaries (DuckDB's string_split never produces them)
    val chars = filter(split(asciiOnly, ""), c => c =!= "")
    aggregate(
      transform(chars, c => ascii(c).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % 1000000007L)
  }
}
