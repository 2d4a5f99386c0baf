package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.{DedupFns, TextFns}

/** Text-analysis surface over `documents`: language-ID, quality scoring,
  * token counting, fingerprinting — all per-row Column expressions (one
  * scan, no shuffle except the final aggregation), plus a token-frequency
  * aggregate. Regex patterns are Java/RE2-compatible so the DuckDB oracle
  * matches byte-for-byte.
  */
object TextQueries {

  /** t07 token budget per packed training sequence. */
  val PackBudget = 4096

  /** t21 retrieval chunk width in whitespace tokens. */
  val RagChunkTokens = 64

  /** t21 chunk stride: 48 gives a 16-token overlap so answer spans that
    * straddle a chunk boundary always appear whole in some chunk (any
    * span of <= overlap+1 tokens is contained in at least one window).
    */
  val RagChunkStride = 48

  /** t21's chunk table (doc_id, chunk_id BIGINT, ctoks) as a reusable
    * builder — v15's chunk-level retrieval embeds exactly these chunks,
    * so the retrieval index and the chunk listing can never drift.
    */
  private[queries] def ragChunkToks(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val (w, st) = (RagChunkTokens, RagChunkStride)
    Tables.documents(s, d)
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("ts"))
      .withColumn("n", size(col("ts")))
      .select(col("doc_id"), col("ts"),
        explode(expr(s"sequence(0, (n - 1) DIV $st)")).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        expr(s"slice(ts, chunk_id * $st + 1, $w)").as("ctoks"))
  }

  /** DuckDB twin of [[ragChunkToks]]: toks/nn/cc CTEs ending in a
    * `chunks` CTE (doc_id, chunk_id BIGINT, ctoks). No leading WITH.
    */
  private[queries] val ragChunksSqlBody: String = {
    val (w, st) = (RagChunkTokens, RagChunkStride)
    s"""toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
       |  FROM documents
       |),
       |nn AS (SELECT doc_id, ts, len(ts) AS n FROM toks),
       |cc AS (
       |  SELECT doc_id, ts, unnest(generate_series(0, (n - 1) // $st)) AS cid
       |  FROM nn
       |),
       |chunks AS (
       |  SELECT doc_id, CAST(cid AS BIGINT) AS chunk_id,
       |         array_slice(ts, cid * $st + 1, cid * $st + $w) AS ctoks
       |  FROM cc
       |)""".stripMargin
  }

  /** t20 KMV sketch size per source. 1024 longs per source bounds the
    * sketch-table shuffle at 8 KB/source while holding the Jaccard
    * estimator's 1σ error near sqrt(J(1−J)/k).
    */
  val KmvOverlapK = 1024

  /** t20 certification tolerance: |estimate − exact| must stay within
    * this absolute ppm floor PLUS exact/8 (the relative term tracks the
    * sqrt(J/k) error growth, so one bound travels across scales —
    * measured worst fixture margins at sf0.001/0.01/0.1 are 7.5k/10.1k/
    * 4.7k ppm against the 16k floor). Hash-gated: an estimator
    * regression fails the oracle.
    */
  val OverlapTolPpm = 16000L

  /** t09 count-min sketch shape: depth x width counters. Width 1024 keeps
    * collisions visible-but-rare at test vocab sizes; production scales
    * width with e/eps while depth stays small (ln(1/delta)).
    */
  val CmsDepth = 4
  val CmsWidth = 1024

  /** t12 bigram-LM scale (scores are parts-per-million of conditional
    * probability) and the keep floor on a document's mean bigram score —
    * set near the synthetic corpus's median (~253k ppm) so the filter
    * demonstrably splits; a production pipeline tunes it per corpus
    * exactly like a perplexity cutoff.
    */
  val LmScale = 1000000L
  val LmKeepMin = 250000L

  /** t15 trained byte-pair vocabulary size: the top-N within-word
    * character bigrams by corpus frequency (ties broken lexicographically
    * — deterministic in both engines) become the merge vocabulary.
    */
  val BpeVocabPairs = 64

  /** t16 BM25 retrieval shape: top-[[Bm25K]] docs per query; probe
    * queries are the distinct normalized tokens among every
    * [[Bm25QueryEvery]]-th doc's first [[Bm25QueryTerms]] token
    * POSITIONS (repeated positions collapse, so a query can carry fewer
    * than [[Bm25QueryTerms]] terms — deterministic, like the v-family's
    * `vec_id < NumProbes` probe sets).
    */
  val Bm25K = 10
  val Bm25QueryEvery = 101
  val Bm25QueryTerms = 8

  /** t17 PMI floor: pairs must co-occur at least this often (raw-PMI's
    * rare-pair noise guard).
    */
  val PmiMinCount = 5

  /** t13 deterministic PII fixture appended to every 25th doc (the corpus
    * itself is PII-free); one of each pattern class, no SQL-quote chars.
    */
  val PiiSuffix =
    "contact user.name+spam@example-mail.org via https://ex.org/u?id=7 or 555-123-4567"

  // ---- DuckDB twins of TextFns ----------------------------------------
  // (column-parametrized so composed pipelines — p01 — can apply them to
  // derived columns; the `text`-bound vals below keep existing call sites)

  /** DuckDB twin of [[DedupFns.normText]]. */
  private[queries] def normSqlOf(c: String) =
    s"trim(regexp_replace(lower($c), '\\s+', ' ', 'g'))"
  private val normDocSql = normSqlOf("text")

  private[queries] def wsTokSqlOf(c: String) =
    s"len(regexp_extract_all(trim($c), '\\S+'))"
  private val wsTokSql = wsTokSqlOf("text")
  private val bpeTokSql = """len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))"""
  private def punctSqlOf(c: String) =
    s"""len(regexp_extract_all($c, '[^A-Za-z0-9\\s]'))"""
  private val punctSql = punctSqlOf("text")
  private def stopSqlOf(c: String) =
    s"""len(regexp_extract_all(lower($c), '\\b(the|a|an|and|of|to|in|is|it|that)\\b'))"""
  private val stopSql = stopSqlOf("text")

  /** t13's RE2-safe PII patterns (shared with p01's scrub stage). */
  private[queries] val UrlRe = """https?://[^ \t\n\r\f]+"""
  private[queries] val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"""
  private[queries] val PhoneRe = """\+?[0-9][0-9]{2}[-. ]?[0-9][0-9]{2}[-. ]?[0-9][0-9]{3}"""

  /** Fixed-order url -> email -> phone redaction, DuckDB side. */
  private[queries] def redactedSqlOf(c: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace($c,
       |  '$UrlRe', '<URL>', 'g'),
       |  '$EmailRe', '<EMAIL>', 'g'),
       |  '$PhoneRe', '<PHONE>', 'g')""".stripMargin

  /** The same redaction as Column expressions (t13 + p01 + the streaming
    * curation twin).
    */
  private[graft] def redactedCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, UrlRe, "<URL>"),
        EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  private[queries] def quality10SqlOf(c: String): String =
    s"""(CASE WHEN length($c) BETWEEN 100 AND 2000 THEN 4 ELSE 0 END
       | + CASE WHEN ${punctSqlOf(c)} * 10 <= ${wsTokSqlOf(c)} THEN 3 ELSE 0 END
       | + CASE WHEN ${stopSqlOf(c)} > 0 THEN 3 ELSE 0 END)""".stripMargin

  private val langScoreSqls: Seq[(String, String)] = TextFns.langStopwords.map {
    case (lang, re) =>
      // single-quote-escape the Java regex for SQL (patterns contain none today)
      lang -> s"len(regexp_extract_all(lower(text), '${re.replace("'", "''")}'))"
  }

  private val langGuessSql: String = {
    val best = langScoreSqls.map(_._2).mkString("greatest(", ", ", ")")
    val cases = langScoreSqls.map { case (lang, sc) =>
      s"WHEN $best > 0 AND $sc = $best THEN '$lang'"
    }.mkString(" ")
    s"(CASE $cases ELSE 'und' END)"
  }

  private val quality10Sql: String =
    s"""(CASE WHEN length(text) BETWEEN 100 AND 2000 THEN 4 ELSE 0 END
       | + CASE WHEN $punctSql * 10 <= $wsTokSql THEN 3 ELSE 0 END
       | + CASE WHEN $stopSql > 0 THEN 3 ELSE 0 END)""".stripMargin

  private val rollingSql: String =
    """list_reduce(
      |  list_prepend(CAST(0 AS BIGINT),
      |    list_transform(
      |      list_filter(string_split(regexp_replace(text, '[^ -~]', '', 'g'), ''), c -> c <> ''),
      |      c -> CAST(ascii(c) AS BIGINT))),
      |  (a, b) -> (a * 31 + b) % 1000000007)""".stripMargin

  /** The t16 BM25 CTE chain (through the ranked-but-untruncated
    * `bmranked`), shared verbatim by the t16 oracle and t18's lexical
    * fusion side so the two can never drift.
    */
  private[queries] val bm25SqlCtes: String =
    s"""bmnd AS (SELECT doc_id, $normDocSql AS nt FROM documents),
       |bmtok AS (
       |  SELECT doc_id, t AS token, CAST(i AS BIGINT) AS i
       |  FROM (SELECT doc_id, unnest(string_split(nt, ' ')) AS t,
       |               unnest(range(len(string_split(nt, ' ')))) AS i FROM bmnd)
       |  WHERE t <> ''
       |),
       |bmtf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM bmtok GROUP BY doc_id, token),
       |bmdl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM bmtok GROUP BY doc_id),
       |bmn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |             CAST(SUM(dl) * 1000 // COUNT(*) AS BIGINT) AS avgdl1k FROM bmdl),
       |bmidx AS (
       |  SELECT tf.doc_id, tf.token, tf.tf,
       |         500 + (dl.dl * 500000) // n.avgdl1k AS norm1000
       |  FROM bmtf tf JOIN bmdl dl USING (doc_id) CROSS JOIN bmn n
       |),
       |bmq AS (SELECT DISTINCT doc_id AS query_id, token
       |      FROM bmtok WHERE doc_id % $Bm25QueryEvery = 0 AND i < $Bm25QueryTerms),
       |bmqd AS (
       |  SELECT q.query_id, q.token,
       |         CAST((2 * (n.n_docs - df.df) + 1) * 500000 // (2 * df.df + 1) AS BIGINT) AS idfs
       |  FROM bmq q JOIN (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM bmtf GROUP BY token) df
       |         USING (token)
       |       CROSS JOIN bmn n
       |),
       |bmsc AS (
       |  SELECT qd.query_id, idx.doc_id,
       |         CAST(SUM((qd.idfs * idx.tf * 2200)
       |           // (idx.tf * 1000 + (1200 * idx.norm1000) // 1000)) AS BIGINT) AS score
       |  FROM bmidx idx JOIN bmqd qd USING (token)
       |  GROUP BY qd.query_id, idx.doc_id
       |),
       |bmranked AS (
       |  SELECT query_id, doc_id, score,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY score DESC, doc_id) AS rnk
       |  FROM bmsc
       |)""".stripMargin

  /** The t16 BM25 retrieval pipeline: memoized written token + postings
    * stages ([[graft.operators.Stage.sharedTable]] — t18's hybrid fusion
    * scans the SAME index artifacts), broadcast query terms, integer
    * scoring, WindowGroupLimit top-k. Returns
    * (query_id, doc_id, rnk, score) with rnk <= [[Bm25K]].
    */
  private[queries] def bm25Ranked(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val tok = graft.operators.Stage.sharedTable(s, "t16_toks", d) {
      Tables.documents(s, d)
        .select(col("doc_id"), DedupFns.normText(col("text")).as("nt"))
        .select(col("doc_id"), posexplode(split(col("nt"), " ")).as(Seq("i", "token")))
        .where(col("token") =!= "")
    }
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val n = dl.agg(count(lit(1)).as("n_docs"),
        expr("CAST(sum(dl) * 1000 DIV count(1) AS BIGINT)").as("avgdl1k"))
      .withColumn("j", lit(1))
    // the inverted index: postings with the doc-length norm folded in,
    // written once (the artifact a production search pipeline persists)
    val idx = graft.operators.Stage.sharedTable(s, "t16_idx", d) {
      tf.join(dl, Seq("doc_id"))
        .withColumn("j", lit(1))
        .join(broadcast(n), Seq("j")) // 1-row scalar broadcast, as t08
        .select(col("doc_id"), col("token"), col("tf"),
          expr("500 + (dl * 500000) DIV avgdl1k").as("norm1000"))
    }
    val df_ = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val q = tok.where(col("doc_id") % Bm25QueryEvery === 0 && col("i") < Bm25QueryTerms)
      .select(col("doc_id").as("query_id"), col("token")).distinct()
    val qd = q.join(df_, Seq("token"))
      .withColumn("j", lit(1))
      .join(broadcast(n), Seq("j"))
      .select(col("query_id"), col("token"),
        expr("CAST((2 * (n_docs - df) + 1) * 500000 DIV (2 * df + 1) AS BIGINT)").as("idfs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    idx.join(broadcast(qd), Seq("token"))
      .groupBy("query_id", "doc_id")
      .agg(sum(expr(
        "(idfs * tf * 2200) DIV (tf * 1000 + (1200 * norm1000) DIV 1000)")).as("score"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= Bm25K)
      .select("query_id", "doc_id", "rnk", "score")
      .orderBy("query_id", "rnk")
  }

  /** t22 shuffle seed and shard size: the seed keys the deterministic
    * order; 128 docs/shard yields multiple full shards plus a remainder
    * at every test sf (both the full-shard and tail paths exercised).
    * Declared above [[entries]] — the oracle SQL interpolates them at
    * object init (the Merge0 ordering lesson).
    */
  val ShuffleSeed = "graft42"
  val ShardSize = 128

  /** Target rows per t22 sort bucket: each in-bucket sort handles ~this
    * many rows, and the bucket count (16^chars) is derived from the
    * corpus size to hit it — the same footer-metadata sizing discipline
    * as [[SimilarityQueries.beamPlaneCount]]. 64k rows sort in
    * milliseconds and fit any executor; the ceiling of 8 prefix chars
    * (16^8 ≈ 4.3e9 buckets) is beyond any corpus that names documents
    * with 64-bit ids.
    */
  val ShuffleBucketTarget = 65536L

  /** Hash-prefix chars of the t22 range bucketing for a corpus of `n`
    * docs: the least k (floor 1) with n / 16^k <= target. Derived from
    * parquet FOOTER counts (metadata), never a count() action, and
    * overridable per session via [[ShuffleCharsKey]] (how the scale spec
    * forces finer bucketing on small fixtures). The oracle is bucket-
    * blind — buckets only decide WHERE each row is sorted, the global
    * rank they compose is identical at every k — so the knob moves cost,
    * never the hash.
    */
  def shuffleBucketChars(spark: org.apache.spark.sql.SparkSession, n: Long): Int =
    spark.conf.getOption(ShuffleCharsKey).map(_.toInt).getOrElse {
      var k = 1
      while (k < 8 && (n >> (4 * k)) > ShuffleBucketTarget) k += 1
      k
    }

  /** Session conf overriding the derived t22 prefix-char count. */
  val ShuffleCharsKey = "spark.graft.shuffle.bucketChars"

  val entries: Seq[Q] = Seq(

    // Language-ID + quality distribution: per detected language, doc count,
    // exact quality sum, and how often the guess matches the labeled lang.
    Q("t01_lang_stats",
      s"""SELECT $langGuessSql AS lang_guess,
         |       COUNT(*) AS n_docs,
         |       CAST(SUM($quality10Sql) AS BIGINT) AS sum_quality10,
         |       CAST(SUM(CASE WHEN $langGuessSql = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_match
         |FROM documents
         |GROUP BY lang_guess ORDER BY lang_guess""".stripMargin) { (s, d) =>
      graft.GraftNative.ensure(s)
      Tables.documents(s, d)
        .withColumn("st", graft.GraftNative.textStats(col("text")))
        .select(col("lang"), col("text"), col("st"),
          TextFns.langIdGuessFrom(col("st")).as("lang_guess"))
        .groupBy("lang_guess")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(TextFns.qualityScore10From(col("st"), col("text"))).as("sum_quality10"),
          sum(when(col("lang_guess") === col("lang"), 1L).otherwise(0L)).as("n_match"))
        .orderBy("lang_guess")
    },

    // Per-doc feature vector: every text metric in one scan (the shape of a
    // training-data quality-filter pass: map-only, no shuffle).
    Q("t02_doc_features",
      s"""SELECT doc_id,
         |       CAST($wsTokSql AS BIGINT) AS ws_tokens,
         |       CAST($bpeTokSql AS BIGINT) AS bpe_tokens,
         |       CAST($punctSql AS BIGINT) AS n_punct,
         |       CAST($stopSql AS BIGINT) AS n_stop,
         |       CAST($quality10Sql AS BIGINT) AS quality10,
         |       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
         |       $rollingSql AS rolling_fp
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.GraftNative.ensure(s)
      Tables.documents(s, d)
        .withColumn("st", graft.GraftNative.textStats(col("text")))
        .select(
          col("doc_id"),
          col("st.ws_tokens").as("ws_tokens"),
          col("st.bpe_tokens").as("bpe_tokens"),
          col("st.n_punct").as("n_punct"),
          col("st.n_stop").as("n_stop"),
          TextFns.qualityScore10From(col("st"), col("text")).cast("long").as("quality10"),
          TextFns.fingerprint(col("text")).as("fp"),
          graft.GraftNative.rollingFingerprint(col("text")).as("rolling_fp"))
        .orderBy("doc_id")
    },

    // Quality filter + keep-rate per source: the canonical corpus-cleaning
    // aggregate (filter docs below threshold, report survivorship).
    Q("t03_quality_filter",
      s"""SELECT source,
         |       COUNT(*) AS n_total,
         |       CAST(SUM(CASE WHEN $quality10Sql >= 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |       CAST(SUM(CASE WHEN $quality10Sql >= 7 THEN length(text) ELSE 0 END) AS BIGINT) AS kept_chars
         |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      graft.GraftNative.ensure(s)
      val q10 = TextFns.qualityScore10From(graft.GraftNative.textStats(col("text")), col("text"))
      Tables.documents(s, d)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_total"),
          sum(when(q10 >= 7, 1L).otherwise(0L)).as("n_kept"),
          sum(when(q10 >= 7, length(col("text")).cast("long")).otherwise(0L)).as("kept_chars"))
        .orderBy("source")
    },

    // Token frequency top-20: explode + groupBy + deterministic top-k
    // (count desc, token asc). At scale: map-side partial counts make the
    // shuffle |vocab|-sized, then TakeOrdered — never a global sort of rows.
    Q("t04_token_topk",
      """SELECT token, n FROM (
        |  SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |        FROM documents)
        |  WHERE token <> ''
        |  GROUP BY token
        |) ORDER BY n DESC, token LIMIT 20""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
        .where(col("token") =!= "")
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    },

    // Deterministic stratified train/test split: the assignment must be a
    // pure function of the doc id (reproducible across runs, engines, and
    // repartitions — never rand()). First md5 hex digit < 'd' ~ 13/16 ~
    // 81% train. Reported per (lang, split) — the stratification check.
    Q("t05_train_test_split",
      """SELECT lang,
        |       CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'd'
        |            THEN 'train' ELSE 'test' END AS split,
        |       COUNT(*) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |GROUP BY lang, split ORDER BY lang, split""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("split",
          when(substring(md5(col("doc_id").cast("string")), 1, 1) < "d", "train")
            .otherwise("test"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
        .orderBy("lang", "split")
    },

    // Within-document repetition signals (the Gopher/C4-style quality
    // rules): most-frequent-token share and duplicate-2-gram share, with a
    // keep flag at the classic 0.2 thresholds. Per-token counts are an
    // explode + (doc_id, tok) groupBy — uniform keys, map-side partials —
    // joined back on doc_id; the 2-gram share is a pure per-row pass.
    Q("t06_repetition",
      s"""WITH t AS (SELECT doc_id, string_split($normDocSql, ' ') AS toks FROM documents),
         |tc AS (
         |  SELECT doc_id, MAX(c) AS top_c, CAST(SUM(c) AS BIGINT) AS n_toks
         |  FROM (SELECT doc_id, tok, COUNT(*) AS c
         |        FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
         |        GROUP BY doc_id, tok)
         |  GROUP BY doc_id
         |),
         |g AS (
         |  SELECT doc_id,
         |         CASE WHEN len(toks) >= 2 THEN len(toks) - 1 ELSE 0 END AS total2,
         |         CASE WHEN len(toks) >= 2
         |              THEN len(list_distinct(list_transform(
         |                     generate_series(1, len(toks) - 1),
         |                     i -> toks[i] || ' ' || toks[i + 1])))
         |              ELSE 0 END AS distinct2
         |  FROM t
         |)
         |SELECT doc_id, n_toks, top_tok_frac, dup_2gram_frac,
         |       (top_tok_frac <= 0.2 AND dup_2gram_frac <= 0.2) AS keep
         |FROM (
         |  SELECT tc.doc_id, tc.n_toks,
         |         CAST(tc.top_c AS DOUBLE) / CAST(tc.n_toks AS DOUBLE) AS top_tok_frac,
         |         CASE WHEN g.total2 > 0
         |              THEN 1.0 - CAST(g.distinct2 AS DOUBLE) / CAST(g.total2 AS DOUBLE)
         |              ELSE 0.0 END AS dup_2gram_frac
         |  FROM tc JOIN g ON tc.doc_id = g.doc_id
         |)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = split(DedupFns.normText(col("text")), " ")
      val docs = Tables.documents(s, d).select(col("doc_id"), toks.as("toks"))
      val tc = docs.select(col("doc_id"), explode(col("toks")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max("c").as("top_c"), sum("c").as("n_toks"))
      val grams = transform(
        sequence(lit(1), size(col("toks")) - 1),
        i => concat(element_at(col("toks"), i), lit(" "), element_at(col("toks"), i + 1)))
      val g = docs.select(col("doc_id"),
        when(size(col("toks")) >= 2, size(col("toks")) - 1).otherwise(0).as("total2"),
        when(size(col("toks")) >= 2, size(array_distinct(grams))).otherwise(0).as("distinct2"))
      tc.join(g, "doc_id")
        .select(col("doc_id"), col("n_toks"),
          (col("top_c").cast("double") / col("n_toks").cast("double")).as("top_tok_frac"),
          when(col("total2") > 0,
            lit(1.0) - col("distinct2").cast("double") / col("total2").cast("double"))
            .otherwise(lit(0.0)).as("dup_2gram_frac"))
        .withColumn("keep", col("top_tok_frac") <= 0.2 && col("dup_2gram_frac") <= 0.2)
        .orderBy("doc_id")
    },

    // Sequence packing (concat-and-chunk): assign docs, in deterministic
    // (source, doc_id) order, to fixed token-budget training sequences by
    // the exclusive running token count — the GPT-style "concatenate the
    // corpus, cut every 4096 tokens" layout. One shuffle (partition by
    // source), one in-partition running sum, then a per-sequence rollup.
    Q("t07_pack_sequences",
      s"""WITH w AS (
         |  SELECT source, doc_id, $wsTokSql AS ws,
         |         SUM($wsTokSql) OVER (PARTITION BY source ORDER BY doc_id
         |           ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM documents
         |)
         |SELECT source,
         |       CAST(floor((cum - ws) / $PackBudget.0) AS BIGINT) AS seq_id,
         |       COUNT(*) AS n_docs,
         |       CAST(SUM(ws) AS BIGINT) AS sum_tokens
         |FROM w GROUP BY source, seq_id ORDER BY source, seq_id""".stripMargin) { (s, d) =>
      graft.GraftNative.ensure(s)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"),
          graft.GraftNative.textStats(col("text")).getField("ws_tokens").as("ws"))
        .withColumn("cum", sum("ws").over(w))
        .groupBy(col("source"),
          floor((col("cum") - col("ws")) / lit(PackBudget.toDouble)).as("seq_id"))
        .agg(count(lit(1)).as("n_docs"), sum("ws").as("sum_tokens"))
        .orderBy("source", "seq_id")
    },

    // Count-min sketch heavy hitters: a fixed-size (depth x width)
    // counter summary of the token frequency stream, built with
    // deterministic md5 row-hashes so the oracle certifies the ESTIMATES
    // bit-for-bit (same family as q18's KMV vs q22's HLL). est(token) =
    // min over rows of its bucket sum — always >= exact (collisions only
    // ADD; the spec asserts the bound). Scale shape: the sketch is
    // CmsDepth x CmsWidth rows regardless of corpus size — a map-side
    // partial-aggregated shuffle of at most depth x width rows per
    // partition — and estimating any token's count afterwards is a
    // broadcast join against that constant-size table, no corpus rescan.
    Q("t09_cms_heavyhitters",
      s"""WITH tok AS (
         |  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token FROM documents
         |),
         |tc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok WHERE token <> '' GROUP BY token),
         |buck AS (
         |  SELECT token, n, d.d,
         |         CAST('0x' || substring(md5(CAST(d.d AS VARCHAR) || '|' || token), 1, 7) AS BIGINT) % $CmsWidth AS bucket
         |  FROM tc CROSS JOIN (VALUES ${(0 until CmsDepth).map(d => s"($d)").mkString(",")}) d(d)
         |),
         |sk AS (SELECT d, bucket, CAST(SUM(n) AS BIGINT) AS bsum FROM buck GROUP BY d, bucket),
         |top AS (SELECT token, n FROM tc ORDER BY n DESC, token LIMIT 20)
         |SELECT t.token, t.n AS n_exact, MIN(s.bsum) AS n_est
         |FROM top t JOIN buck b ON b.token = t.token
         |           JOIN sk s ON s.d = b.d AND s.bucket = b.bucket
         |GROUP BY t.token, t.n ORDER BY t.token""".stripMargin) { (s, d) =>
      val tc = Tables.documents(s, d)
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
        .where(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("n"))
      val buck = tc.select(col("token"), col("n"),
          explode(array((0 until CmsDepth).map(i => lit(i)): _*)).as("d"))
        .withColumn("bucket",
          conv(substring(md5(concat(col("d").cast("string"), lit("|"), col("token"))), 1, 7),
            16, 10).cast("long") % CmsWidth)
      val sk = buck.groupBy("d", "bucket").agg(sum("n").as("bsum"))
      val top = tc.orderBy(col("n").desc, col("token")).limit(20)
      top.join(buck.select("token", "d", "bucket"), Seq("token"))
        .join(broadcast(sk), Seq("d", "bucket"))
        .groupBy(col("token"), col("n").as("n_exact"))
        .agg(min("bsum").as("n_est"))
        .orderBy("token")
    },

    // Quality-weighted sampling — the data-mixing primitive (keep a doc
    // with probability proportional to its quality score): u < w with u a
    // deterministic md5-uniform of the doc id, so the "random" draw is a
    // pure function of the row — reproducible across runs, engines, and
    // repartitions, and the SAME docs are kept when the corpus is
    // re-processed (stable training mixtures). The comparison is pure
    // integer (hash % 1000 vs quality10 * 100) and the expected-kept
    // figure sums integers before one edge division, so the oracle
    // certifies sampler and expectation exactly. Map-only scan + one
    // per-source aggregate.
    Q("t10_weighted_sample",
      s"""SELECT source, COUNT(*) AS n_total,
         |       CAST(CAST(SUM($quality10Sql) AS BIGINT) AS DOUBLE) / 10.0 AS expected_kept,
         |       CAST(COUNT(CASE WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 1000
         |                            < $quality10Sql * 100 THEN 1 END) AS BIGINT) AS n_kept
         |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      graft.GraftNative.ensure(s)
      val q10 = TextFns.qualityScore10From(
        graft.GraftNative.textStats(col("text")), col("text"))
      val u = conv(substring(md5(col("doc_id").cast("string")), 1, 7), 16, 10)
        .cast("long") % 1000
      Tables.documents(s, d)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_total"),
          (sum(q10.cast("long")).cast("double") / 10.0).as("expected_kept"),
          count(when(u < q10 * 100, 1)).as("n_kept"))
        .orderBy("source")
    },

    // Top distinctive terms per document, TF-IDF style: tf from a
    // (doc, token) aggregate, df from a vocab-keyed aggregate, score =
    // tf * (N - df + 1) / df — an integer-ratio rare-term weighting chosen
    // over ln(N/df) deliberately: one integer product and one IEEE
    // division are bit-exact across engines, while libm ln is
    // implementation-defined and would make ranking ties flap. Scale
    // shape: tf and df are both uniform-key aggregates (no doc is a hot
    // key; vocab is zipf but df caps at N), the tf-df join is vocab-keyed,
    // and N rides a one-row broadcast — the per-doc top-3 then reduces
    // through a doc-partitioned rank window.
    Q("t08_tfidf_topterms",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents
        |),
        |tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
        |tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM tok2 GROUP BY doc_id, token),
        |df AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        |       FROM tok2 GROUP BY token),
        |n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |         CAST(tf.tf * (n.n_docs - df.df + 1) AS DOUBLE) / CAST(df.df AS DOUBLE) AS score
        |  FROM tf JOIN df USING (token) CROSS JOIN n
        |),
        |ranked AS (
        |  SELECT doc_id, token, tf, df, score,
        |         ROW_NUMBER() OVER (PARTITION BY doc_id
        |                            ORDER BY score DESC, token) AS rnk
        |  FROM scored
        |)
        |SELECT doc_id, token, tf, df, score FROM ranked
        |WHERE rnk <= 3 ORDER BY doc_id, token""".stripMargin) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
        .where(col("token") =!= "")
      val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val df = tok.groupBy("token").agg(countDistinct(col("doc_id")).as("df"))
      val n = Tables.documents(s, d)
        .agg(countDistinct(col("doc_id")).as("n_docs")).withColumn("j", lit(1))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("score").desc, col("token"))
      tf.join(df, Seq("token"))
        .withColumn("j", lit(1))
        // Catalyst folds the constant key, so this plans a 1-row
        // BroadcastNestedLoopJoin — i.e. a scalar broadcast of N, the
        // right shape (never a shuffle; the big side streams through)
        .join(broadcast(n), Seq("j"))
        .withColumn("score",
          (col("tf") * (col("n_docs") - col("df") + 1)).cast("double") /
            col("df").cast("double"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 3)
        .select("doc_id", "token", "tf", "df", "score")
        .orderBy("doc_id", "token")
    },

    // Skip-gram co-occurrence counts (word2vec / PMI input): token pairs
    // within a forward window of 2 positions, counted corpus-wide, top-20
    // with a total deterministic order. Scale shape: the (doc, pos, token)
    // table is a WRITTEN stage, so tokenization runs ONCE and both join
    // sides scan it (an un-staged self-join would re-run split+posexplode
    // per side); the windowed pairing is a pure EQUI-join on
    // (doc_id, position) against the same table shifted by an exploded
    // offset of {1,2} — never a per-doc cross product or a non-equi range
    // probe — so the pair volume is exactly 2x the token count and the
    // join hash-partitions on uniform (doc, pos) keys. The final count
    // shuffles |vocab|^2 partials at most, and TakeOrdered keeps the
    // top-k off the driver until the last 20 rows.
    Q("t11_skipgram_pairs",
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(string_split_regex(trim(lower(text)), '\s+')) AS token,
        |         unnest(range(len(string_split_regex(trim(lower(text)), '\s+')))) AS i
        |  FROM documents
        |),
        |pairs AS (
        |  SELECT a.token AS w1, b.token AS w2
        |  FROM toks a JOIN toks b
        |    ON a.doc_id = b.doc_id AND (b.i - a.i = 1 OR b.i - a.i = 2)
        |)
        |SELECT w1, w2, COUNT(*) AS n FROM pairs GROUP BY w1, w2
        |ORDER BY n DESC, w1, w2 LIMIT 20""".stripMargin) { (s, d) =>
      val toks = graft.operators.Stage.table(
        Tables.documents(s, d)
          .select(col("doc_id"),
            posexplode(split(trim(lower(col("text"))), "\\s+")).as(Seq("i", "token"))),
        "t11_toks")
      val shifted = toks
        .withColumn("off", explode(array(lit(1), lit(2))))
        .select(col("doc_id"), (col("i") + col("off")).as("i"), col("token").as("w1"))
      shifted.join(toks, Seq("doc_id", "i"))
        .groupBy(col("w1"), col("token").as("w2"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w1"), col("w2"))
        .limit(20)
    },

    // LM-based quality filtering — the CCNet/Gopher perplexity-filter
    // shape: score every document under a character-bigram language model
    // trained on the corpus itself, keep docs whose mean per-bigram
    // likelihood clears a floor (real pipelines train KenLM on a clean
    // reference corpus and threshold perplexity; the statistical shape —
    // train counts, broadcast the model, score per token, filter on the
    // mean — is identical). Everything is INTEGER arithmetic for
    // cross-engine bit parity: a bigram's score is
    // floor(n(c1c2) * 1e6 / n(c1·)) — the MLE conditional scaled to ppm —
    // and a doc's avg_score is the floor-mean over its bigram
    // occurrences. Scale shape: one pass builds the bigram table (a
    // written stage, since both the LM aggregation and the scoring join
    // consume it); the LM itself is |alphabet|^2 rows — broadcast — so
    // scoring is a map-side join + one doc_id-keyed aggregate; nothing
    // shuffles more than O(total chars) with map-side partial counts.
    // n12 * 1e6 stays < 2^63 up to ~9e12 corpus bigrams per bigram key —
    // beyond that, widen LmScale down or the counts to DECIMAL.
    Q("t12_lm_quality",
      s"""WITH nd AS (
         |  SELECT doc_id, $normDocSql AS nt FROM documents
         |),
         |nd2 AS (SELECT doc_id, nt FROM nd WHERE len(nt) >= 2),
         |bg AS (
         |  SELECT doc_id, substr(nt, CAST(i AS INTEGER), 2) AS bg
         |  FROM nd2, unnest(generate_series(1, len(nt) - 1)) AS t(i)
         |),
         |lm AS (SELECT bg, COUNT(*) AS n12 FROM bg GROUP BY bg),
         |pre AS (SELECT substr(bg, 1, 1) AS c1, CAST(SUM(n12) AS BIGINT) AS n1
         |        FROM lm GROUP BY 1),
         |sc AS (
         |  SELECT lm.bg, CAST(lm.n12 * $LmScale // pre.n1 AS BIGINT) AS s
         |  FROM lm JOIN pre ON substr(lm.bg, 1, 1) = pre.c1
         |),
         |doc AS (
         |  SELECT b.doc_id, COUNT(*) AS n_bigrams, CAST(SUM(sc.s) AS BIGINT) AS lm_sum
         |  FROM bg b JOIN sc ON b.bg = sc.bg GROUP BY b.doc_id
         |)
         |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams, lm_sum,
         |       CAST(lm_sum // n_bigrams AS BIGINT) AS avg_score,
         |       (lm_sum // n_bigrams) >= $LmKeepMin AS keep
         |FROM doc ORDER BY doc_id""".stripMargin) { (s, d) =>
      val nd = Tables.documents(s, d)
        .select(col("doc_id"), DedupFns.normText(col("text")).as("nt"))
        // sequence(1, len-1) needs len >= 2 (Spark descends when stop < start)
        .where(length(col("nt")) >= 2)
      val bg = graft.operators.Stage.table(
        nd.select(col("doc_id"),
          explode(expr("transform(sequence(1, length(nt) - 1), i -> substring(nt, i, 2))"))
            .as("bg")),
        "t12_bg")
      val lm = bg.groupBy("bg").agg(count(lit(1)).as("n12"))
      val pre = lm.groupBy(substring(col("bg"), 1, 1).as("c1"))
        .agg(sum(col("n12")).as("n1"))
      val scored = lm
        .join(pre, substring(col("bg"), 1, 1) === col("c1"))
        .select(col("bg"), expr(s"CAST(n12 * $LmScale DIV n1 AS BIGINT)").as("s"))
      bg.join(broadcast(scored), Seq("bg"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum(col("s")).as("lm_sum"))
        .withColumn("avg_score", expr("lm_sum DIV n_bigrams"))
        .withColumn("keep", col("avg_score") >= LmKeepMin)
        .orderBy("doc_id")
    },

    // PII scrubbing — the redaction pass every production corpus gets
    // before training: detect emails / URLs / phone-shaped numbers,
    // replace each with a typed placeholder token, and report per-doc
    // match counts plus the md5 of the redacted text (the fingerprint
    // downstream dedup would see). The synthetic corpus contains no PII,
    // so every 25th doc gets a deterministic PII suffix injected (same
    // dupdocs-style fixture convention as the d-family) — the counts and
    // changed fingerprints make the oracle check non-vacuous. Patterns
    // are RE2-safe (character classes + bounded repetition, no
    // backreferences or lookaround) so Java regex and the oracle's RE2
    // agree byte-for-byte; redaction order (url, then email, then phone)
    // is fixed and identical in both engines, so overlapping matches
    // resolve the same way. Scale shape: pure per-row expressions — one
    // scan, map-only, no shuffle but the output order; at 100 TB this
    // pipelines through whole-stage codegen with zero exchanges.
    Q("t13_pii_scrub",
      // DuckDB string literals are escape-free; the shared raw patterns
      // reach RE2 verbatim (\s / \. / \+)
      s"""WITH piidocs AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % 25 = 0
         |              THEN text || ' $PiiSuffix'
         |              ELSE text END AS t
         |  FROM documents
         |)
         |SELECT doc_id,
         |       CAST(len(regexp_extract_all(t, '$UrlRe')) AS BIGINT) AS n_url,
         |       CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_email,
         |       CAST(len(regexp_extract_all(t, '$PhoneRe')) AS BIGINT) AS n_phone,
         |       md5(${redactedSqlOf("t")}) AS redacted_fp
         |FROM piidocs ORDER BY doc_id""".stripMargin) { (s, d) =>
      val t = when(col("doc_id") % 25 === 0,
        concat(col("text"), lit(s" $PiiSuffix"))).otherwise(col("text"))
      Tables.documents(s, d).select(
        col("doc_id"),
        size(regexp_extract_all(t, lit(UrlRe), lit(0))).cast("long").as("n_url"),
        size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long").as("n_email"),
        size(regexp_extract_all(t, lit(PhoneRe), lit(0))).cast("long").as("n_phone"),
        md5(redactedCol(t).cast("binary")).as("redacted_fp"))
        .orderBy("doc_id")
    },

    // Domain-mixture reweighting (DoReMi / data-mixing shape): balance
    // the corpus to a target mixture — here an equal CHARACTER budget per
    // source (content-volume normalization; doc-count shares are already
    // uniform in this corpus, char volume is not — production pipelines
    // plug in learned target shares the same way). Each source gets
    // weight_ppm = min(1e6, char_budget * 1e6 / source_chars),
    // downsample-only, and a DETERMINISTIC per-doc sample hits it — the
    // md5-uniform draw t05/t10 use, so the same doc is kept on every run
    // and every engine. Integer arithmetic throughout. Scale shape: the
    // per-source char count is a map-side-combined aggregate, the weight
    // table is |sources| rows riding a broadcast join back onto the
    // corpus, the keep decision is a per-row hash compare, and the final
    // per-source rollup is a uniform-key aggregate — nothing shuffles
    // more than one pass of partial counts at any corpus size.
    Q("t14_source_mixture",
      s"""WITH cnt AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(n_chars) AS BIGINT) AS chars
         |  FROM documents GROUP BY source
         |),
         |tot AS (
         |  SELECT CAST(SUM(chars) AS BIGINT) AS c, CAST(COUNT(*) AS BIGINT) AS ns
         |  FROM cnt
         |),
         |w AS (
         |  SELECT source, n_docs, chars,
         |         CAST(LEAST(1000000, (CAST(c AS HUGEINT) // ns) * 1000000 // chars) AS BIGINT) AS weight_ppm
         |  FROM cnt CROSS JOIN tot
         |)
         |SELECT d.source, w.n_docs, w.chars, w.weight_ppm,
         |       CAST(COUNT(CASE WHEN CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 7) AS BIGINT)
         |                            % 1000000 < w.weight_ppm THEN 1 END) AS BIGINT) AS n_sampled
         |FROM documents d JOIN w ON d.source = w.source
         |GROUP BY d.source, w.n_docs, w.chars, w.weight_ppm
         |ORDER BY d.source""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
      val cnt = docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
      val tot = cnt.agg(sum(col("chars")).as("c"), count(lit(1)).as("ns"))
        .withColumn("j", lit(1))
      val w = cnt.withColumn("j", lit(1))
        .join(broadcast(tot), Seq("j")) // one-row scalar broadcast, as q26/t08
        // budget * 1e6 would overflow Long once the per-source character
        // budget passes ~9.2e12 (~9 TB of text) — inside this engine's
        // design scale — so the product runs in DECIMAL(38,0) (HUGEINT on
        // the oracle side). Integral DIV, not `/`+FLOOR: Spark's decimal
        // `/` rounds HALF_UP at scale 6 BEFORE a floor could run, which
        // diverges from DuckDB's exact `//` when the true fraction is
        // ≥ .9999995; IntegralDivide on the decimal is exact
        .withColumn("weight_ppm",
          least(lit(1000000L), expr(
            "CAST(CAST(c DIV ns AS DECIMAL(38,0)) * 1000000 DIV chars AS BIGINT)")))
        .select("source", "n_docs", "chars", "weight_ppm")
      val u = conv(substring(md5(col("doc_id").cast("string")), 1, 7), 16, 10)
        .cast("long") % 1000000L
      docs.join(broadcast(w), Seq("source"))
        .groupBy("source")
        .agg(
          min(col("n_docs")).as("n_docs"),         // constant per source
          min(col("chars")).as("chars"),           // constant per source
          min(col("weight_ppm")).as("weight_ppm"), // constant per source
          count(when(u < col("weight_ppm"), 1)).as("n_sampled"))
        .orderBy("source")
    },

    // Token-aware sequence packing with a TRAINED byte-pair vocabulary —
    // t07 packs whitespace tokens; real pipelines pack what the tokenizer
    // counts. Train (t12's train-broadcast-score shape): count all
    // within-word character bigrams across the corpus, keep the top
    // [[BpeVocabPairs]] (count desc, bigram asc — deterministic) as the
    // merge vocabulary, a WRITTEN stage like any tokenizer artifact.
    // Tokenize (order-free single-round BPE): each word's ALIGNED bigrams
    // (positions 1,3,5,... — fixed alignment makes the merge set
    // order-independent, so both engines compute it without a sequential
    // scan) that hit the vocabulary merge to one token;
    // tokens(word) = len(word) - merges. Pack: t07's exclusive
    // running-sum assignment of docs to [[PackBudget]]-token sequences.
    // Scale shape: the word stage is written once and feeds both the
    // trainer and the tokenizer; the vocabulary is a constant-size
    // broadcast; scoring is one map-side join + doc-keyed agg; packing
    // is one shuffle (partition by source) + in-partition window.
    Q("t15_bpe_packing",
      s"""WITH nd AS (SELECT doc_id, source, $normDocSql AS nt FROM documents),
         |ww AS (
         |  SELECT doc_id, source, w FROM (
         |    SELECT doc_id, source, unnest(string_split(nt, ' ')) AS w FROM nd
         |  ) WHERE w <> ''
         |),
         |allbg AS (
         |  SELECT substr(w, CAST(i AS INTEGER), 2) AS bg
         |  FROM ww, unnest(generate_series(1, len(w) - 1)) AS t(i)
         |),
         |vocab AS (
         |  SELECT bg FROM (
         |    SELECT bg, COUNT(*) AS n FROM allbg GROUP BY bg
         |    ORDER BY n DESC, bg LIMIT $BpeVocabPairs)
         |),
         |chars AS (
         |  SELECT doc_id, source, CAST(SUM(len(w)) AS BIGINT) AS n_chars
         |  FROM ww GROUP BY doc_id, source
         |),
         |apairs AS (
         |  SELECT doc_id, substr(w, CAST(i AS INTEGER), 2) AS bg
         |  FROM ww, unnest(generate_series(1, len(w) - 1, 2)) AS t(i)
         |),
         |hits AS (
         |  SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
         |  FROM apairs a JOIN vocab v ON a.bg = v.bg GROUP BY a.doc_id
         |),
         |toks AS (
         |  SELECT c.source, c.doc_id, c.n_chars - COALESCE(h.n_hits, 0) AS n_tok
         |  FROM chars c LEFT JOIN hits h ON c.doc_id = h.doc_id
         |),
         |packed AS (
         |  SELECT source, doc_id, n_tok,
         |         SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |           ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM toks
         |)
         |SELECT source, CAST(floor((cum - n_tok) / $PackBudget.0) AS BIGINT) AS seq_id,
         |       COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
         |FROM packed GROUP BY source, seq_id ORDER BY source, seq_id""".stripMargin) { (s, d) =>
      val ww = graft.operators.Stage.table(
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), DedupFns.normText(col("text")).as("nt"))
          .select(col("doc_id"), col("source"), explode(split(col("nt"), " ")).as("w"))
          .where(col("w") =!= ""),
        "t15_words")
      // guard: sequence(1, 0) DESCENDS in Spark; single-char words have
      // no bigrams in either engine
      def wordPairs(step: Int): org.apache.spark.sql.Column =
        explode(when(length(col("w")) >= 2,
          expr(s"transform(sequence(1, length(w) - 1, $step), i -> substring(w, i, 2))"))
          .otherwise(array().cast("array<string>")))
      val vocab = graft.operators.Stage.table(
        ww.select(wordPairs(1).as("bg"))
          .groupBy("bg").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bg")).limit(BpeVocabPairs)
          .select("bg"),
        "t15_vocab")
      val chars = ww.groupBy("doc_id", "source")
        .agg(sum(length(col("w")).cast("long")).as("n_chars"))
      val hits = ww.select(col("doc_id"), wordPairs(2).as("bg"))
        .join(broadcast(vocab), Seq("bg"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      val toks = chars.join(hits, Seq("doc_id"), "left")
        .select(col("source"), col("doc_id"),
          (col("n_chars") - coalesce(col("n_hits"), lit(0L))).as("n_tok"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      toks.withColumn("cum", sum("n_tok").over(w))
        .groupBy(col("source"),
          floor((col("cum") - col("n_tok")) / lit(PackBudget.toDouble)).as("seq_id"))
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tokens"))
        .orderBy("source", "seq_id")
    },

    // Full-text retrieval — BM25 top-k over an inverted index, the search
    // side of a training-data pipeline (nearest-neighbor queries over
    // TEXT, the lexical complement of the v-family's vector ANN; also the
    // retrieval primitive of RAG data curation). Index = the classic
    // postings shape (token -> (doc, tf) with stored doc length), a
    // WRITTEN stage like any production index build. Queries = every
    // [[Bm25QueryEvery]]-th doc's distinct normalized tokens among its
    // first [[Bm25QueryTerms]] token positions (deterministic probe
    // fixtures, t05-style; repeated positions collapse).
    // Scoring is the BM25 shape with k1=1.2, b=0.5 in pure INTEGER
    // arithmetic for cross-engine bit parity: the idf surrogate
    // (N-df+0.5)/(df+0.5) is computed exactly as (2(N-df)+1)/(2df+1)
    // scaled to 500000 ppm-halves, the length norm (1 - b + b*dl/avgdl)
    // as norm1000 per doc, and each term's partial score with a single
    // floor DIV — so the per-(query,doc) score is a SUM of longs (order-
    // free), never a float sum whose accumulation order could diverge.
    // idfs*tf*2200 stays < 2^63 up to ~N*tf ~ 4e14 doc-occurrences;
    // beyond that widen to DECIMAL as t14 does. Scale shape: the index
    // build is two uniform-key aggregates + one doc-keyed join, written
    // once; the query-term table is tiny by construction and rides a
    // broadcast (its df/idf join touches |q terms| vocab rows); scoring
    // streams the postings of the queried terms only (common-term
    // postings are the inherent BM25 cost — production engines bound it
    // with impact-ordered/WAND pruning, a lossy shortcut deliberately
    // not taken here so the oracle stays exact); the final top-k rides
    // the same WindowGroupLimit partial-group-limit as the v-family.
    Q("t16_bm25_search",
      s"""WITH $bm25SqlCtes
         |SELECT query_id, doc_id, rnk, score FROM bmranked
         |WHERE rnk <= $Bm25K ORDER BY query_id, rnk""".stripMargin) { (s, d) =>
      bm25Ranked(s, d)
    },

    // PMI collocations — the association-scoring pass over t11's skip-gram
    // co-occurrence counts (the statistic behind word2vec's SGNS objective
    // and phrase-mining "new york"-style merges). score = p(xy)/(p(x)p(y))
    // over the PAIR event space: n_xy * T / (marg(x) * marg(y)) with T the
    // total pair count and marg the per-slot marginals — the log is
    // monotone, so ranking by the ratio IS ranking by PMI while staying
    // libm-free. Numerator n_xy * T and denominator marg1 * marg2 are
    // exact BIGINT products (each < 2^53 up to ~10^8 pairs — past that,
    // pre-scale T down) and the score is ONE correctly-rounded IEEE
    // division — bit-identical across engines, no float accumulation
    // anywhere. A [[PmiMinCount]] floor drops the noise pairs classic PMI
    // is notorious for promoting. Scale shape: identical to t11 (written
    // token stage, positional equi-join) plus three uniform-key
    // aggregates; the marginals join pair-keyed partials, never rows.
    Q("t17_pmi_collocations",
      s"""WITH toks AS (
         |  SELECT doc_id,
         |         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token,
         |         unnest(range(len(string_split_regex(trim(lower(text)), '\\s+')))) AS i
         |  FROM documents
         |),
         |pairs AS (
         |  SELECT a.token AS w1, b.token AS w2
         |  FROM toks a JOIN toks b
         |    ON a.doc_id = b.doc_id AND (b.i - a.i = 1 OR b.i - a.i = 2)
         |),
         |pc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY w1, w2),
         |m1 AS (SELECT w1, CAST(SUM(n) AS BIGINT) AS c1 FROM pc GROUP BY w1),
         |m2 AS (SELECT w2, CAST(SUM(n) AS BIGINT) AS c2 FROM pc GROUP BY w2),
         |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM pc)
         |SELECT w1, w2, n,
         |       CAST(n * total AS DOUBLE) / CAST(c1 * c2 AS DOUBLE) AS score
         |FROM pc JOIN m1 USING (w1) JOIN m2 USING (w2) CROSS JOIN t
         |WHERE n >= $PmiMinCount
         |ORDER BY score DESC, w1, w2 LIMIT 20""".stripMargin) { (s, d) =>
      val toks = graft.operators.Stage.table(
        Tables.documents(s, d)
          .select(col("doc_id"),
            posexplode(split(trim(lower(col("text"))), "\\s+")).as(Seq("i", "token"))),
        "t17_toks")
      val shifted = toks
        .withColumn("off", explode(array(lit(1), lit(2))))
        .select(col("doc_id"), (col("i") + col("off")).as("i"), col("token").as("w1"))
      val pc = shifted.join(toks, Seq("doc_id", "i"))
        .groupBy(col("w1"), col("token").as("w2"))
        .agg(count(lit(1)).as("n"))
      val m1 = pc.groupBy("w1").agg(sum("n").as("c1"))
      val m2 = pc.groupBy("w2").agg(sum("n").as("c2"))
      val t = pc.agg(sum("n").as("total")).withColumn("j", lit(1))
      pc.where(col("n") >= PmiMinCount)
        .join(m1, Seq("w1"))
        .join(m2, Seq("w2"))
        .withColumn("j", lit(1))
        .join(broadcast(t), Seq("j"))
        .select(col("w1"), col("w2"), col("n"),
          ((col("n") * col("total")).cast("double") /
            (col("c1") * col("c2")).cast("double")).as("score"))
        .orderBy(col("score").desc, col("w1"), col("w2"))
        .limit(20)
    },

    // Multi-ROUND BPE training (t19) — the iterative trainer t15's
    // single-round approximation deliberately skips (documented there):
    // TWO aligned-merge rounds, each a full train-then-apply pass, so
    // round 2's vocabulary is learned over the TOKENS round 1 produced
    // and its merges can fuse a round-1 merged pair with a neighbor —
    // producing 3- and 4-character tokens a single-round trainer can
    // never form (RetrievalSpec pins multichar_merges > 0). Order-free
    // by the same alignment trick as t15: round-r merges apply only at
    // EVEN round-r token positions, so both engines compute every merge
    // closed-form (no sequential within-word scan), and the token index
    // after round 1 is reconstructible arithmetically (2j − merges
    // before j — a prefix-sum window, not a scan). Scale shape: the
    // word, token and vocabulary stages are WRITTEN shared tables; both
    // vocabularies broadcast; the round-2 pair build is a (doc, word,
    // position) equi-join of the token stage with itself (t17's shape);
    // every aggregate is uniform-key with map-side partials. Output =
    // per-source totals after each round + the multichar-merge count,
    // hash-sensitive to every individual merge decision in both rounds.
    Q("t19_bpe_multiround",
      s"""WITH nd AS (SELECT doc_id, source, $normDocSql AS nt FROM documents),
         |ww AS (
         |  SELECT doc_id, source, wpos, w FROM (
         |    SELECT doc_id, source, unnest(string_split(nt, ' ')) AS w,
         |           unnest(range(len(string_split(nt, ' ')))) AS wpos FROM nd)
         |  WHERE w <> ''
         |),
         |vocab1 AS (SELECT bg FROM (
         |  SELECT substr(w, CAST(i AS INTEGER), 2) AS bg, COUNT(*) AS n
         |  FROM ww, unnest(generate_series(1, len(w) - 1)) AS t(i)
         |  WHERE len(w) >= 2
         |  GROUP BY bg ORDER BY n DESC, bg LIMIT $BpeVocabPairs)),
         |segs AS (
         |  SELECT doc_id, source, wpos, j, substr(w, CAST(2*j+1 AS INTEGER), 2) AS seg
         |  FROM ww, unnest(range(CAST(ceil(len(w) / 2.0) AS BIGINT))) AS t(j)
         |),
         |m AS (SELECT s.doc_id, s.source, s.wpos, s.j, s.seg,
         |        (len(s.seg) = 2 AND v.bg IS NOT NULL) AS merged
         |      FROM segs s LEFT JOIN vocab1 v ON s.seg = v.bg),
         |mb AS (SELECT *, COALESCE(SUM(CASE WHEN merged THEN 1 ELSE 0 END)
         |         OVER (PARTITION BY doc_id, wpos ORDER BY j
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS mbefore
         |       FROM m),
         |tokens AS (
         |  SELECT doc_id, source, wpos, 2*j - mbefore AS t_idx, seg AS tok
         |  FROM mb WHERE merged
         |  UNION ALL
         |  SELECT doc_id, source, wpos, 2*j - mbefore AS t_idx, substr(seg, 1, 1) AS tok
         |  FROM mb WHERE NOT merged
         |  UNION ALL
         |  SELECT doc_id, source, wpos, 2*j - mbefore + 1 AS t_idx, substr(seg, 2, 1) AS tok
         |  FROM mb WHERE NOT merged AND len(seg) = 2
         |),
         |pairs2 AS (
         |  SELECT a.doc_id, a.wpos, a.t_idx, a.tok AS t1, b.tok AS t2
         |  FROM tokens a JOIN tokens b
         |    ON a.doc_id = b.doc_id AND a.wpos = b.wpos AND b.t_idx = a.t_idx + 1
         |),
         |vocab2 AS (SELECT t1, t2 FROM (
         |  SELECT t1, t2, COUNT(*) AS n FROM pairs2 GROUP BY t1, t2
         |  ORDER BY n DESC, t1, t2 LIMIT $BpeVocabPairs)),
         |h AS (
         |  SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS h2,
         |         CAST(SUM(CASE WHEN len(p.t1) + len(p.t2) >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS mc
         |  FROM pairs2 p JOIN vocab2 v ON p.t1 = v.t1 AND p.t2 = v.t2
         |  WHERE p.t_idx % 2 = 0 GROUP BY p.doc_id
         |),
         |t1c AS (SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS n1
         |        FROM tokens GROUP BY doc_id, source)
         |SELECT t1c.source, CAST(SUM(n1) AS BIGINT) AS sum_tok_r1,
         |       CAST(SUM(n1 - COALESCE(h.h2, 0)) AS BIGINT) AS sum_tok_r2,
         |       CAST(SUM(COALESCE(h.mc, 0)) AS BIGINT) AS multichar_merges
         |FROM t1c LEFT JOIN h ON t1c.doc_id = h.doc_id
         |GROUP BY t1c.source ORDER BY t1c.source""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ww = graft.operators.Stage.sharedTable(s, "t19_words", d) {
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), DedupFns.normText(col("text")).as("nt"))
          .select(col("doc_id"), col("source"),
            posexplode(split(col("nt"), " ")).as(Seq("wpos", "w")))
          .where(col("w") =!= "")
      }
      // round-1 vocabulary: t15's definition (all-position char bigrams,
      // count desc / bigram asc). sequence(1, 0) DESCENDS in Spark, so
      // single-char words are guarded to an empty array.
      val vocab1 = graft.operators.Stage.sharedTable(s, "t19_vocab1", d) {
        ww.select(explode(when(length(col("w")) >= 2,
            expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
            .otherwise(array().cast("array<string>"))).as("bg"))
          .groupBy("bg").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bg")).limit(BpeVocabPairs)
          .select("bg")
      }
      val segs = ww.select(col("doc_id"), col("source"), col("wpos"),
        posexplode(expr(
          "transform(sequence(0, CAST(ceil(length(w) / 2.0) AS INT) - 1), " +
            "j -> substring(w, 2*j+1, 2))")).as(Seq("j", "seg")))
      val m = segs.join(broadcast(vocab1.select(col("bg").as("seg"),
          lit(1).as("inv"))), Seq("seg"), "left")
        .withColumn("merged", length(col("seg")) === 2 && col("inv").isNotNull)
      val wj = Window.partitionBy("doc_id", "wpos").orderBy("j")
        .rowsBetween(Window.unboundedPreceding, -1)
      val mb = m.withColumn("mbefore",
        coalesce(sum(col("merged").cast("long")).over(wj), lit(0L)))
      val tokens = graft.operators.Stage.sharedTable(s, "t19_tokens", d) {
        mb.select(col("doc_id"), col("source"), col("wpos"),
            (col("j") * 2 - col("mbefore")).as("t_start"),
            posexplode(when(col("merged"), array(col("seg")))
              .otherwise(expr(
                "transform(sequence(1, length(seg)), i -> substring(seg, i, 1))")))
              .as(Seq("p", "tok")))
          .select(col("doc_id"), col("source"), col("wpos"),
            (col("t_start") + col("p")).as("t_idx"), col("tok"))
      }
      val a = tokens.select(col("doc_id"), col("wpos"), col("t_idx"), col("tok").as("t1"))
      val bnext = tokens.select(col("doc_id"), col("wpos"),
        (col("t_idx") - 1).as("t_idx"), col("tok").as("t2"))
      val pairs2 = a.join(bnext, Seq("doc_id", "wpos", "t_idx"))
      val vocab2 = graft.operators.Stage.sharedTable(s, "t19_vocab2", d) {
        pairs2.groupBy("t1", "t2").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("t1"), col("t2")).limit(BpeVocabPairs)
          .select("t1", "t2")
      }
      val hits2 = pairs2.where(col("t_idx") % 2 === 0)
        .join(broadcast(vocab2), Seq("t1", "t2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("h2"),
          sum(when(length(col("t1")) + length(col("t2")) >= 3, 1L).otherwise(0L)).as("mc"))
      val t1c = tokens.groupBy("doc_id", "source").agg(count(lit(1)).as("n1"))
      t1c.join(hits2, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(sum("n1").as("sum_tok_r1"),
          sum(col("n1") - coalesce(col("h2"), lit(0L))).as("sum_tok_r2"),
          sum(coalesce(col("mc"), lit(0L))).as("multichar_merges"))
        .orderBy("source")
    },

    // Retrieval chunking (t21) — the RAG ingestion shape: every doc is
    // split into overlapping fixed-size token windows (64-token chunks,
    // stride 48 → 16-token overlap so no boundary-straddling answer
    // span is ever lost), each chunk carrying its token offset and a
    // content fingerprint (the id an embedding/vector-index stage keys
    // on — v10's ingest and d13's chunk-dedup both consume exactly this
    // shape). Deliberately MAP-ONLY: tokenize → per-doc chunk-start
    // sequence → explode → slice+fingerprint, no shuffle except the
    // output ordering — chunking 100 TB is a scan, and anything that
    // shuffles per-chunk is wrong. Start positions are multiples of the
    // stride with the last window allowed short, so every token is
    // covered and coverage arithmetic is closed-form (pinned in
    // TextFnsSpec).
    Q("t21_rag_chunks",
      s"""WITH $ragChunksSqlBody
         |SELECT doc_id, chunk_id,
         |       chunk_id * $RagChunkStride AS t_start,
         |       CAST(len(ctoks) AS BIGINT) AS n_tokens,
         |       md5(array_to_string(ctoks, ' ')) AS chunk_fp
         |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
      ragChunkToks(s, d)
        .select(col("doc_id"), col("chunk_id"),
          (col("chunk_id") * RagChunkStride).as("t_start"),
          size(col("ctoks")).cast("long").as("n_tokens"),
          md5(concat_ws(" ", col("ctoks"))).as("chunk_fp"))
        .orderBy("doc_id", "chunk_id")
    },

    // Cross-source content overlap via KMV sketches (t20) — "how much do
    // my sources duplicate each other" is the first question a mixture
    // designer asks, and answering it exactly needs an all-pairs
    // shingle-set intersection no one can afford at corpus scale. The
    // mergeable-sketch answer: ONE pass builds a k-min-values sketch of
    // each source's shingle set (map-side k-bounded partial aggregate —
    // the shuffle is k·|sources| longs regardless of corpus size), and
    // every pairwise Jaccard estimate then comes from the |sources|-row
    // sketch table alone: est = |kmin_k(A ∪ B) ∩ A ∩ B| / |kmin_k(A ∪ B)|
    // (Bar-Yossef et al.; same deterministic md5 hash family as q18 so
    // the oracle is bit-exact). The exact side — one per-shingle
    // source-set aggregate exploded into pairs, never a pair join — is
    // the eval-time certification, and the hash-gated boolean pins
    // every estimate within [[OverlapTolPpm]] of truth.
    Q("t20_source_overlap", {
      val k = KmvOverlapK
      s"""WITH shs AS (
         |  SELECT DISTINCT source, unnest(${DedupQueries.shinglesSql}) AS sh
         |  FROM documents
         |),
         |h AS (SELECT source, sh,
         |             CAST('0x' || substring(md5(sh), 1, 7) AS BIGINT) AS h
         |      FROM shs),
         |km AS (SELECT source, list_sort(list(DISTINCT h))[:$k] AS kmv FROM h GROUP BY source),
         |cnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM shs GROUP BY source),
         |shared AS (
         |  SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS n_shared
         |  FROM shs a JOIN shs b ON a.sh = b.sh AND a.source < b.source
         |  GROUP BY 1, 2
         |),
         |pairs AS (
         |  SELECT x.source AS src_a, y.source AS src_b, x.kmv AS ka, y.kmv AS kb,
         |         ca.n AS na, cb.n AS nb, COALESCE(s.n_shared, 0) AS n_shared
         |  FROM km x JOIN km y ON x.source < y.source
         |  JOIN cnt ca ON ca.source = x.source
         |  JOIN cnt cb ON cb.source = y.source
         |  LEFT JOIN shared s ON s.src_a = x.source AND s.src_b = y.source
         |),
         |est AS (
         |  SELECT src_a, src_b, na, nb, n_shared,
         |         CAST(n_shared * 1000000 // (na + nb - n_shared) AS BIGINT) AS exact_jppm,
         |         CAST(len(list_filter(list_sort(list_distinct(ka || kb))[:$k],
         |                x -> list_contains(ka, x) AND list_contains(kb, x))) * 1000000
         |              // len(list_sort(list_distinct(ka || kb))[:$k]) AS BIGINT) AS est_jppm
         |  FROM pairs
         |),
         |tol AS (SELECT MAX(ABS(est_jppm - exact_jppm) - exact_jppm // 8)
         |               <= $OverlapTolPpm AS ok FROM est)
         |SELECT e.src_a, e.src_b, e.n_shared, e.exact_jppm, e.est_jppm, t.ok AS within_tol
         |FROM est e CROSS JOIN tol t
         |ORDER BY e.src_a, e.src_b""".stripMargin
    }) { (s, d) =>
      graft.GraftNative.ensure(s)
      val k = KmvOverlapK
      // one corpus scan: distinct (source, shingle) + its 28-bit hash,
      // written once and shared by the sketch, count, and exact sides
      val shs = graft.operators.Stage.sharedTable(s, "t20_src_shingles", d) {
        Tables.documents(s, d)
          .select(col("source"),
            explode(graft.GraftNative.shingles(DedupFns.normText(col("text")))).as("sh"))
          .distinct()
          .withColumn("h", conv(substring(md5(col("sh")), 1, 7), 16, 10).cast("long"))
      }
      val km = shs.groupBy("source").agg(graft.functions.KmvSketch.kmv(col("h"), k).as("kmv"))
      val cnt = shs.groupBy("source").agg(count(lit(1)).as("n"))
      // exact pairwise overlap WITHOUT a self-join: one groupBy(sh) →
      // collect_set(source) (bounded by |sources| per group, partial
      // map-side) → explode the sorted source pairs → count per pair —
      // d17's no-pair-join discipline. The old form self-joined the
      // (source, shingle) stage on the shingle STRING, shuffling the full
      // shingle inventory by string key twice; this shuffles it once and
      // the pair fan-out per shingle is |sources_holding_it| choose 2,
      // bounded by |sources|² — independent of corpus size. Grouping is
      // on the string `sh`, not the 28-bit `h`: an h collision between
      // distinct shingles would merge their source sets and diverge from
      // the oracle's string-keyed join.
      val shared = shs.groupBy("sh")
        .agg(array_sort(collect_set(col("source"))).as("srcs"))
        .where(size(col("srcs")) > 1)
        .select(explode(expr(
          """flatten(transform(srcs, (a, i) ->
            |  transform(slice(srcs, i + 2, size(srcs)),
            |            b -> struct(a AS src_a, b AS src_b))))""".stripMargin)).as("p"))
        .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
        .agg(count(lit(1)).as("n_shared"))
      val pairs = km.as("x").join(km.as("y"), col("x.source") < col("y.source"))
        .select(col("x.source").as("src_a"), col("y.source").as("src_b"),
          col("x.kmv").as("ka"), col("y.kmv").as("kb"))
        .join(broadcast(cnt.select(col("source").as("src_a"), col("n").as("na"))), Seq("src_a"))
        .join(broadcast(cnt.select(col("source").as("src_b"), col("n").as("nb"))), Seq("src_b"))
        .join(broadcast(shared), Seq("src_a", "src_b"), "left")
        .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      // est numerator via hash-based array_intersect (O(k) per pair), not
      // filter+array_contains (a LambdaFunction probing a 2k-array per
      // element = O(k²) interpreted — measured 6.5 s of the query at
      // sf0.1 for 190 pairs x k=1024)
      val est = pairs
        .withColumn("merged", expr(s"slice(array_sort(array_union(ka, kb)), 1, $k)"))
        .withColumn("exact_jppm", expr("CAST(n_shared * 1000000 DIV (na + nb - n_shared) AS BIGINT)"))
        .withColumn("est_jppm", expr(
          "CAST(size(array_intersect(merged, array_intersect(ka, kb)))" +
            " * 1000000 DIV size(merged) AS BIGINT)"))
        .select("src_a", "src_b", "n_shared", "exact_jppm", "est_jppm")
      val tol = est.agg(
          (max(abs(col("est_jppm") - col("exact_jppm")) - expr("exact_jppm DIV 8"))
            <= OverlapTolPpm).as("ok"))
        .withColumn("j", lit(1))
      est.withColumn("j", lit(1)).join(broadcast(tol), Seq("j"))
        .select(col("src_a"), col("src_b"), col("n_shared"),
          col("exact_jppm"), col("est_jppm"), col("ok").as("within_tol"))
        .orderBy("src_a", "src_b")
    },

    // Deterministic global shuffle + shard assignment (t22) — the last
    // step of every training-data pipeline: the curated corpus must be
    // written in a SEEDED random order, cut into fixed-size shards, and
    // reproducibly so (the same seed re-derives the same shards on any
    // cluster, any partitioning — resumable jobs, cross-run diffing).
    // Order = (md5(seed || doc_id), doc_id): deterministic, uniform, and
    // oracle-recomputable. The interesting part is the GLOBAL rank at
    // scale: a ranking window with no PARTITION BY plans a single-
    // partition sort — the one-reducer bottleneck that dies at 100 TB.
    // Instead the total order is built distributively from the hash's
    // OWN structure: the first [[ShuffleBucketChars]] hex chars of h
    // are a deterministic range bucketing (bucket order IS hash order,
    // because the bucket is a prefix of the sort key — no sampled range
    // boundaries, so the assignment is identical across plan
    // re-evaluations, executors, and runs), per-bucket counts become
    // rank offsets via a prefix sum over the |buckets|-row frame (the
    // one place a single-partition window is CORRECT — it sees 256
    // rows), and row_number() WITHIN each bucket + its offset is the
    // exact global rank, no node ever sorting more than one bucket
    // (~n/256 rows; more prefix chars at bigger corpora). Shard =
    // (rank-1) / ShardSize; output is the |shards|-row manifest (sizes,
    // id checksums, hash boundaries) — what a shard writer would
    // partitionBy. The oracle recomputes the ranks with DuckDB's global
    // window, so a single misplaced row anywhere breaks the hash.
    Q("t22_shuffle_shards",
      s"""WITH h AS (
         |  SELECT doc_id, md5('$ShuffleSeed' || CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents
         |),
         |r AS (
         |  SELECT doc_id, h, ROW_NUMBER() OVER (ORDER BY h, doc_id) AS rnk FROM h
         |)
         |SELECT CAST(floor((rnk - 1) / $ShardSize) AS BIGINT) AS shard,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
         |       MIN(h) AS min_h, MAX(h) AS max_h
         |FROM r GROUP BY 1 ORDER BY shard""".stripMargin) { (s, d) =>
      // bucket count from footer metadata (rows/16^k <= target), never a
      // count() action; ShuffleCharsKey forces finer bucketing in specs
      val chars = shuffleBucketChars(s,
        graft.operators.Stage.rowCount(s, s"$d/documents.parquet"))
      val hashed = Tables.documents(s, d)
        .select(col("doc_id"),
          md5(concat(lit(ShuffleSeed), col("doc_id").cast("string"))).as("h"))
        .withColumn("part", substring(col("h"), 1, chars))
      val wOff = Window.orderBy("part")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = hashed.groupBy("part").agg(count(lit(1)).as("n"))
        .withColumn("offset", coalesce(sum("n").over(wOff), lit(0L)))
        .select("part", "offset")
      val wIn = Window.partitionBy("part").orderBy("h", "doc_id")
      hashed.join(broadcast(offsets), Seq("part"))
        .withColumn("rnk", row_number().over(wIn) + col("offset"))
        .withColumn("shard", floor((col("rnk") - 1) / ShardSize).cast("long"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_ids"),
          min("h").as("min_h"), max("h").as("max_h"))
        .orderBy("shard")
    }
  )
}
