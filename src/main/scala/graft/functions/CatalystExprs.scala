package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup/ANN hot paths.
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`zip_with`) are
  * interpreted per ELEMENT — one lambda-evaluator round trip per array
  * element per enclosing lambda. For signature computations that means
  * (shingles x hashes) interpreter steps per row. These expressions
  * evaluate the same math as the Column compositions in [[DedupFns]] /
  * [[VectorFns]] (asserted equal in DedupFnsSpec/VectorFnsSpec) in one
  * tight Scala/Java loop per row:
  *
  *  - [[LongDotProduct]] and [[HammingDistance]] participate in
  *    whole-stage codegen (`doGenCode` emits a plain loop);
  *  - [[MinHashSignatureExpr]] and [[SimHash64Expr]] are CodegenFallback
  *    (one virtual call per ROW — the per-element interpreter overhead,
  *    which is the actual cost driver, is gone).
  *
  * Registered as SQL functions by [[graft.GraftExtensions]] /
  * [[graft.GraftNative]].
  */
object GraftHash {
  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  def md(): MessageDigest = { val m = mdLocal.get(); m.reset(); m }

  /** First 7 hex nibbles of md5(bytes) as a 28-bit long — identical to
    * `CAST('0x' || substring(md5(s),1,7) AS BIGINT)` (DuckDB) and
    * `conv(substring(md5(s),1,7),16,10)` (Spark).
    */
  def base28(bytes: Array[Byte]): Long = {
    val d = md().digest(bytes)
    ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) | ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >>> 4)
  }

  /** First 16 hex nibbles of md5(bytes) as a 64-bit value (big-endian). */
  def h64(bytes: Array[Byte]): Long = {
    val d = md().digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }
}

/** MinHash signature over an `array<string>` shingle column: for seed i,
  * min over shingles of (A_i*base28(s) + B_i) mod P with the [[DedupFns]]
  * constants — value-identical to [[DedupFns.minhashSignature]], one md5
  * and `numHashes` long-ops per shingle in a single loop.
  */
case class MinHashSignatureExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) { // null elements are absent, like least()/list_min()
        val h = GraftHash.base28(s.getBytes)
        var k = 0
        while (k < numHashes) {
          val v = ((DedupFns.mhA(k) * h) + DedupFns.mhB(k)) % DedupFns.MinhashPrime
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)
}

/** 64-bit SimHash over an `array<string>` shingle column, as a 64-char
  * '0'/'1' string: bit j is the majority vote of bit j of each shingle's
  * [[GraftHash.h64]]. One md5 + 64 shift/adds per shingle.
  */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      if (s != null) { // null shingles contribute no votes
        val h = GraftHash.h64(s.getBytes)
        var j = 0
        while (j < 64) {
          if (((h >>> (63 - j)) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](64)
    var j = 0
    while (j < 64) { out(j) = if (votes(j) > 0) '1' else '0'; j += 1 }
    UTF8String.fromBytes(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** Distinct word n-gram shingles of an already-NORMALIZED text (single
  * spaces, lowercased — [[DedupFns.normText]], which stays a codegen'd
  * regexp Column). Value-identical to [[DedupFns.shingles]]'s HOF form:
  * first-occurrence order (array_distinct semantics), whole text as the
  * single shingle when shorter than n words.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val toks = s.split(" ")
    if (toks.length >= n) {
      val seen = new java.util.LinkedHashSet[String]
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size())
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    } else new GenericArrayData(Array[Any](UTF8String.fromString(s)))
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Winnowed k-gram fingerprints (Schleimer/Wilkerson/Aiken MOSS-style,
  * block variant) over an already-cleaned printable-ASCII string: the
  * per-position polynomial hash of each k-byte gram
  * (`h_i = sum_j c_{i+j} * B^{k-1-j} mod M`, computed with a TRUE
  * Rabin-Karp rolling update — drop the outgoing byte's `B^(k-1)` term,
  * multiply, add the incoming byte — 3 long-ops per position instead of
  * k), then the minimum hash of every `w`-gram tumbling block, distinct
  * per document. Shared fingerprints = shared >=k-byte substrings, the
  * primitive behind plagiarism/near-dup detection at substring (not
  * whole-doc) granularity.
  *
  * Value-identical to the d10 oracle SQL's unrolled per-position
  * arithmetic (`ascii()`-based, same B/M literals via [[WinnowFingerprints.hashSql]]):
  * after `[^ -~]` cleaning every byte IS its codepoint, so byte-walking
  * equals the oracle's per-character walk. One pass, O(1) extra state per
  * position; output is |text|/w longs — the 16x reduction that makes a
  * substring-level index feasible at corpus scale.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  import WinnowFingerprints.{B, M}

  require(k >= 2 && w >= 1, "graft_winnow(text, k >= 2, w >= 1)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  // B^(k-1) mod M: the outgoing byte's positional weight in the roll.
  private lazy val bk1: Long = {
    var p = 1L; var i = 1
    while (i < k) { p = p * B % M; i += 1 }
    p
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    val nGrams = n - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + (s.getByte(i) & 0xffL)) % M; i += 1 }
    var blockMin = h
    var g = 1
    while (g < nGrams) {
      h = ((h - (s.getByte(g - 1) & 0xffL) * bk1) % M + M) % M
      h = (h * B + (s.getByte(g + k - 1) & 0xffL)) % M
      if (g % w == 0) { seen.add(blockMin); blockMin = h }
      else if (h < blockMin) blockMin = h
      g += 1
    }
    seen.add(blockMin)
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  /** Same modulus as [[RollingFingerprint]]; base > 255 so distinct byte
    * sequences of equal length map to distinct pre-mod polynomials.
    */
  val M = 1000000007L
  val B = 257L

  /** DuckDB twin of gram `i`'s hash over cleaned-text column `ct` (1-based
    * position `i`), as unrolled left-assoc arithmetic — `%`/`*` bind
    * equally in SQL so each step is ((acc % M) * B + c) with acc kept
    * below B*M (no BIGINT overflow).
    */
  def hashSql(ct: String, k: Int): String =
    (1 until k).foldLeft(s"CAST(ascii(substring($ct, i, 1)) AS BIGINT)") {
      (acc, j) => s"($acc % $M * $B + ascii(substring($ct, i + $j, 1)))"
    } + s" % $M"
}

/** Polynomial rolling-hash fingerprint over the printable-ASCII projection
  * of the text: acc = (acc*31 + codepoint) mod 1e9+7 — value-identical to
  * [[DedupFns.rollingFingerprint]], whose HOF form interprets one lambda
  * per CHARACTER. One byte loop per row; non-printable/non-ASCII bytes are
  * skipped, which equals the regex projection `[^ -~]` -> "" because UTF-8
  * continuation/lead bytes all fall outside 0x20..0x7e.
  */
case class RollingFingerprint(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_fp"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var acc = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xff
      if (b >= 0x20 && b <= 0x7e) acc = (acc * 31 + b) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

/** Single-pass text statistics, value-identical to the regex-based
  * [[TextFns]] counters (asserted in NativeExprsSpec):
  *
  *  - `ws_tokens`: Spark-split(`\s+`-after-space-trim, limit=-1) token
  *    count — i.e. non-ws runs, plus one empty token at each end where the
  *    space-trimmed text starts/ends with OTHER whitespace (limit=-1 keeps
  *    both leading and trailing empties), 0 for blank text;
  *  - `bpe_tokens`: matches of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]`;
  *  - `n_punct`: code points outside ASCII alnum and ASCII whitespace;
  *  - `n_stop`, `s_en/s_de/s_fr/s_es`: `\b`-bounded stopword occurrences
  *    over the lowercased text (every match of the word-alternation regex
  *    is exactly a full Unicode-word run — Java `\b` boundary chars —
  *    equal to a set member).
  *
  * The regex forms make 5+ full passes with Java-regex machinery per row;
  * this walks the text twice (raw + lowercased) with byte/char tests.
  */
case class TextStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  import TextStats._

  override def dataType: DataType = Schema
  override def prettyName: String = "graft_text_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].toString
    // pass 1: raw text — ws tokens, bpe tokens, punct
    var ws = 0L; var bpe = 0L; var punct = 0L
    val trimmed = trimSpaces(raw)
    if (trimmed.nonEmpty && isWs(trimmed.codePointAt(0))) ws += 1 // leading empty token
    if (trimmed.nonEmpty && isWs(trimmed.charAt(trimmed.length - 1))) ws += 1 // trailing
    var i = 0
    var inNonWs = false
    while (i < trimmed.length) {
      val cp = trimmed.codePointAt(i)
      if (isWs(cp)) inNonWs = false
      else { if (!inNonWs) ws += 1; inNonWs = true }
      i += Character.charCount(cp)
    }
    if (trimmed.isEmpty) ws = 0
    i = 0
    while (i < raw.length) {
      val cp = raw.codePointAt(i)
      if (isAsciiLetter(cp)) {
        bpe += 1
        while (i < raw.length && isAsciiLetter(raw.codePointAt(i))) i += 1
      } else if (isAsciiDigit(cp)) {
        bpe += 1
        while (i < raw.length && isAsciiDigit(raw.codePointAt(i))) i += 1
      } else {
        if (!isWs(cp)) { bpe += 1; punct += 1 }
        i += Character.charCount(cp)
      }
    }
    // pass 2: lowercased text — \w-run stopword counts per set
    val low = raw.toLowerCase(java.util.Locale.ROOT)
    var nStop = 0L
    val lang = new Array[Long](LangSets.length)
    i = 0
    val sb = new java.lang.StringBuilder
    while (i <= low.length) {
      val isWord = i < low.length && isWordChar(low.codePointAt(i))
      if (isWord) sb.appendCodePoint(low.codePointAt(i))
      else if (sb.length > 0) {
        val tok = sb.toString
        if (QualitySet.contains(tok)) nStop += 1
        var l = 0
        while (l < LangSets.length) {
          if (LangSets(l).contains(tok)) lang(l) += 1
          l += 1
        }
        sb.setLength(0)
      }
      i += (if (i < low.length) Character.charCount(low.codePointAt(i)) else 1)
    }
    InternalRow(ws, bpe, punct, nStop,
      lang(0), lang(1), lang(2), lang(3))
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  val Schema: StructType = StructType(Seq(
    StructField("ws_tokens", LongType, nullable = false),
    StructField("bpe_tokens", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("s_en", LongType, nullable = false),
    StructField("s_de", LongType, nullable = false),
    StructField("s_fr", LongType, nullable = false),
    StructField("s_es", LongType, nullable = false)))

  /** Stopword set of [[TextFns.stopwordCount]] (quality scoring). */
  val QualitySet: Set[String] =
    Set("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  /** Per-language sets, same order as [[TextFns.langStopwords]]. */
  val LangSets: Array[Set[String]] = Array(
    Set("the", "and", "of", "to", "is", "that", "with", "for"),
    Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    Set("le", "la", "les", "et", "est", "une", "pour", "dans"),
    Set("el", "la", "los", "y", "es", "una", "por", "para"))

  // Java/RE2 \s — ASCII whitespace only
  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b || cp == '\f' || cp == '\r'
  private def isAsciiLetter(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')
  private def isAsciiDigit(cp: Int): Boolean = cp >= '0' && cp <= '9'
  // Java \b boundary chars (Pattern.Bound): Unicode letter/digit or '_' —
  // NOT the ASCII \w class; Java's \b is Unicode-aware even when \w is not,
  // so "and" inside "ñandú" has no boundary and must not count.
  private def isWordChar(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)
  // Spark trim() strips 0x20 spaces only
  private def trimSpaces(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }
}

/** Intersection size of two string arrays whose elements are DISTINCT
  * within each array (shingle sets): hash-probe from the smaller side —
  * O(n+m) with two tight loops, vs `size(array_intersect(a, b))` which is
  * an interpreted per-element expression. Value-identical for distinct
  * inputs (asserted in NativeExprsSpec); the Jaccard verification of the
  * dedup candidate joins is built on it.
  */
case class ArrayOverlapCount(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_overlap"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (small, big) = if (x.numElements <= y.numElements) (x, y) else (y, x)
    val set = new java.util.HashSet[UTF8String](small.numElements * 2)
    var i = 0
    while (i < small.numElements) { set.add(small.getUTF8String(i)); i += 1 }
    var c = 0L
    i = 0
    while (i < big.numElements) {
      if (set.contains(big.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayOverlapCount =
    copy(left = newLeft, right = newRight)
}

/** Exact Jaccard similarity of two distinct-element string arrays as ONE
  * expression. The Column composition (`inter / (|a| + |b| - inter)` with
  * a guard) mentions the intersection subtree FOUR times, and interpreted
  * projections have no common-subexpression elimination — the candidate
  * verification of the dedup joins was paying 4 hash-probe passes per
  * pair. Value-identical to [[DedupFns.jaccard]] (asserted in
  * NativeExprsSpec): integer intersection/union then one double divide.
  */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (small, big) = if (x.numElements <= y.numElements) (x, y) else (y, x)
    val set = new java.util.HashSet[UTF8String](small.numElements * 2)
    var i = 0
    while (i < small.numElements) { set.add(small.getUTF8String(i)); i += 1 }
    var inter = 0L
    i = 0
    while (i < big.numElements) {
      if (set.contains(big.getUTF8String(i))) inter += 1
      i += 1
    }
    val uni = x.numElements.toLong + y.numElements.toLong - inter
    if (uni == 0L) 0.0 else inter.toDouble / uni.toDouble
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Hashing-trick embedding histogram: counts of base28(md5(token)) mod
  * `dim` over an `array<string>` token column, as ONE native pass —
  * value-identical to the Column HOF tree
  * `transform(sequence(0, dim-1), j -> size(filter(bks, b -> b = j)))`
  * over `bks = transform(toks, t -> conv(substring(md5(t),1,7),16,10) %
  * dim)` (asserted in NativeExprsSpec), but O(tokens) instead of
  * O(dim × tokens) interpreted lambda evaluations. v15's chunk index
  * (one embedding per chunk, corpus-sized) measured 44 s vs 4 s at
  * sf0.1 from exactly this difference; mm05's five probes never felt
  * it. Null tokens are skipped (split() never produces them).
  */
case class DimCountsExpr(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {
  require(dim > 0, s"dim must be positive: $dim")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_dim_counts"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Long](dim)
    var i = 0
    while (i < arr.numElements()) {
      val t = arr.getUTF8String(i)
      if (t != null) counts((GraftHash.base28(t.getBytes) % dim).toInt) += 1
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): DimCountsExpr =
    copy(child = newChild)
}

/** One-pass parse of an EOS `file info -m` record line into a
  * `(ino, file, uid, gid, size)` struct — the Column path needs five
  * separate regexp scans of the same string; this walks it once, using the
  * same plain-Scala parser as the `graft-kv` DSv2 source
  * ([[graft.sources.KvParse]]). Missing keys yield null (the shared
  * convention of `PathFns.kvGet`, this struct, and the DSv2 reader;
  * non-numeric longs are null too), and a present-but-empty value
  * (`key= `) yields "".
  */
case class KvRecordParse(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = KvRecordParse.Schema
  override def prettyName: String = "graft_kv_parse"

  override protected def nullSafeEval(input: Any): Any = {
    import graft.sources.KvParse
    val raw = input.asInstanceOf[UTF8String].toString
    InternalRow(
      KvParse.getLong(raw, "ino").map(Long.box).orNull,
      KvParse.file(raw).map(UTF8String.fromString).orNull,
      KvParse.get(raw, "uid").map(UTF8String.fromString).orNull,
      KvParse.get(raw, "gid").map(UTF8String.fromString).orNull,
      KvParse.getLong(raw, "size").map(Long.box).orNull)
  }

  override protected def withNewChildInternal(newChild: Expression): KvRecordParse =
    copy(child = newChild)
}

object KvRecordParse {
  val Schema: StructType = StructType(Seq(
    StructField("ino", LongType),
    StructField("file", StringType),
    StructField("uid", StringType),
    StructField("gid", StringType),
    StructField("size", LongType)))
}

/** Exact integer dot product of two `array<long>` columns (quantized
  * vectors). Whole-stage-codegen'd: the generated code is a plain loop
  * over the two ArrayDatas — no per-element lambda dispatch. Array
  * elements must be non-null (quantized vectors are by construction).
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_long_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Hamming distance between two equal-length ASCII signature strings:
  * count of differing byte positions (+ length difference if any).
  * Whole-stage-codegen'd byte loop.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hamming"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    val n = math.min(x.numBytes(), y.numBytes())
    var s = math.abs(x.numBytes() - y.numBytes()).toLong
    var i = 0
    while (i < n) { if (x.getByte(i) != y.getByte(i)) s += 1L; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numBytes(), $b.numBytes());
         |long $s = java.lang.Math.abs($a.numBytes() - $b.numBytes());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getByte($i) != $b.getByte($i)) $s++;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

/** Membership probe of a pre-built Bloom filter over a string column:
  * `left` is the probed value, `right` the SERIALIZED filter
  * (`org.apache.spark.util.sketch.BloomFilter.writeTo` bytes) as a
  * foldable binary literal — the filter travels with the plan exactly
  * like Spark's own runtime-filter `BloomFilterMightContain`, is
  * deserialized once per executor (transient lazy), and each row costs
  * `numHashFunctions` xxhash probes of a bit array. No false negatives
  * by the filter's contract, so a `WHERE graft_bloom_mc(x, bf)` prefilter
  * followed by an exact join is result-identical to the exact join alone
  * — it only removes rows early (the scale lever d15 pins: kill ~97% of
  * exploded corpus rows BEFORE the shuffle when the benchmark index has
  * outgrown broadcast).
  */
case class BloomMightContainExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_mc"

  @transient private lazy val bloom: org.apache.spark.util.sketch.BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(v: Any, @annotation.unused bf: Any): Any =
    bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainExpr =
    copy(left = newLeft, right = newRight)
}

/** The MIRROR of [[BloomMightContainExpr]] for per-FILE Bloom stamps:
  * here the BLOOM is the column (one serialized filter per data-file row
  * of a commit's bloom sidecar) and the PROBED VALUES are the foldable
  * literal (an array of xxhash64 key hashes, point-lookup-sized). Row
  * verdict: may the file contain ANY of the keys? — the planning join
  * that turns "scan every file of a hash-keyed table" into "open the ≤
  * fpp·N files whose filter fires". Hashing matches Spark's own
  * runtime-filter convention (BloomFilterAggregate over `xxhash64(key)`,
  * probed with `mightContainLong`), so build and probe can both ride
  * stock machinery. No false negatives by the filter's contract; the
  * deserialization cost is per candidate FILE (metadata-sized), never
  * per data row.
  */
case class BloomAnyMightContainExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_any"

  @transient private lazy val hashes: Array[Long] =
    right.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()

  override protected def nullSafeEval(bf: Any, @annotation.unused hs: Any): Any = {
    val bloom = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bf.asInstanceOf[Array[Byte]]))
    var i = 0
    while (i < hashes.length) {
      if (bloom.mightContainLong(hashes(i))) return true
      i += 1
    }
    false
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomAnyMightContainExpr =
    copy(left = newLeft, right = newRight)
}
