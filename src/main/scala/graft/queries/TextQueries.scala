package graft.queries

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

  // ---- DuckDB twins of TextFns ----------------------------------------

  private val wsTokSql = "len(regexp_extract_all(trim(text), '\\S+'))"
  private val bpeTokSql = """len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))"""
  private val punctSql = """len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))"""
  private val stopSql =
    """len(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it|that)\b'))"""

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
    }
  )
}
