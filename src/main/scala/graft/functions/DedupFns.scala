package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Near-duplicate detection building blocks for training-data pipelines:
  * word-shingles, MinHash signatures, LSH band keys, SimHash.
  *
  * Everything is a pure Column expression (codegen'd higher-order
  * functions — no UDFs). Hash parity with the DuckDB oracle is achieved by
  * using md5 HEX STRINGS as the hash domain: `min(md5(seed|shingle))`
  * under lexicographic string order is a valid MinHash (md5 is uniform on
  * the hex alphabet) and both engines agree byte-for-byte, sidestepping
  * integer-hash implementation differences.
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

  /** One MinHash value: lexicographic min of md5("<seed>|" + shingle). */
  def minhash(shinglesCol: Column, seed: Int): Column =
    array_min(transform(shinglesCol, s => md5(concat(lit(s"$seed|"), s))))

  /** Full signature as `array<string>` of `numHashes` MinHash values. */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map(minhash(shinglesCol, _)): _*)

  /** LSH band keys: the signature split into `bands` groups of `rowsPerBand`
    * hashes, each group collapsed to one md5 key. Two docs collide on a band
    * iff that band's hashes all match.
    */
  def bandKeys(shinglesCol: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => minhash(shinglesCol, b * rowsPerBand + r))
      md5(concat_ws("|", parts: _*))
    }: _*)

  /** Exact Jaccard similarity of two DISTINCT shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("long")
    val uni = size(a).cast("long") + size(b).cast("long") - inter
    when(uni === 0L, lit(0.0)).otherwise(inter.cast("double") / uni.cast("double"))
  }

  /** 16-bit SimHash over the doc's DISTINCT tokens, as a '0'/'1' string:
    * bit j is the majority vote of hex digit j of each token's md5
    * (digit >= '8' means the nibble's top bit is set).
    */
  def simhash16(text: Column): Column = {
    val toks = array_distinct(split(normText(text), " "))
    val bits = (0 until 16).map { j =>
      val vote = aggregate(toks, lit(0L),
        (acc, t) => acc + when(substring(md5(t), j + 1, 1) >= "8", 1L).otherwise(-1L))
      when(vote > 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

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
