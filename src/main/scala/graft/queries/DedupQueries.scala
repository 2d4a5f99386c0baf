package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{Q, Tables}
import graft.functions.{DedupFns, TextFns, VectorFns}

/** Deduplication operator family over the `documents` / `embeddings`
  * tables: exact (normalized-hash groupBy), MinHash+LSH near-dup,
  * SimHash clustering, embedding-cosine near-dup — each oracle-paired
  * with a DuckDB twin.
  *
  * The fixtures inject deterministic duplicates (same construction in both
  * engines) so the dedup paths are actually exercised: every 10th doc /
  * every 50th vector reappears under id+100000.
  *
  * Scale design: every query is a key-partitioned groupBy or a bucketed
  * self-join (LSH band keys / label cells) — never an all-pairs cross
  * product — so the plans survive 1000× the rows.
  */
object DedupQueries {

  /** documents + exact-dup copies of every 10th doc (id+100000). */
  private def dupDocs(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    docs.unionByName(
      docs.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
  }

  private val dupDocsSql: String =
    """dupdocs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
      |)""".stripMargin

  /** embeddings + exact-dup copies of every 50th vector (id+100000). */
  private def dupEmb(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    e.unionByName(
      e.where(col("vec_id") % 50 === 0)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"), col("label")))
  }

  private val dupEmbSql: String =
    """dupemb AS (
      |  SELECT vec_id, embedding, label FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000, embedding, label FROM embeddings WHERE vec_id % 50 = 0
      |)""".stripMargin

  // ---- oracle SQL helpers (DuckDB twins of DedupFns) --------------------

  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** DuckDB twin of [[DedupFns.shingles]] (3-gram word shingles). */
  private val shinglesSql: String =
    s"""CASE WHEN len(string_split($normSql, ' ')) >= 3
       |     THEN list_distinct(list_transform(
       |            generate_series(1, len(string_split($normSql, ' ')) - 2),
       |            i -> array_to_string(array_slice(string_split($normSql, ' '), i, i + 2), ' ')))
       |     ELSE [$normSql] END""".stripMargin

  /** DuckDB twin of [[DedupFns.minhash]]. */
  private def minhashSql(seed: Int): String =
    s"list_min(list_transform(sh, s -> md5('$seed|' || s)))"

  /** DuckDB twin of [[DedupFns.bandKeys]] for band `b` (3 rows per band). */
  private def bandKeySql(b: Int): String =
    s"md5(${(0 until 3).map(r => minhashSql(b * 3 + r)).mkString(" || '|' || ")})"

  val Bands = 3
  val RowsPerBand = 3

  val entries: Seq[Q] = Seq(

    // Exact dedup: hash-groupBy on the normalized-text fingerprint. One
    // shuffle on an md5 key (uniform, no skew); keeper = min doc id.
    Q("d01_dedup_exact",
      s"""WITH $dupDocsSql
         |SELECT md5($normSql) AS fp,
         |       MIN(doc_id) AS keeper,
         |       COUNT(*) AS n_copies
         |FROM dupdocs
         |GROUP BY fp
         |HAVING COUNT(*) > 1
         |ORDER BY fp""".stripMargin) { (s, d) =>
      dupDocs(s, d)
        .groupBy(TextFns.fingerprint(col("text")).as("fp"))
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
        .where(col("n_copies") > 1)
        .orderBy("fp")
    },

    // MinHash + LSH near-dup: signature -> band keys -> bucket self-join ->
    // exact Jaccard verification on candidates only. The self-join shuffles
    // on (band, key); verification re-joins shingle arrays by doc id.
    Q("d02_minhash_lsh",
      s"""WITH $dupDocsSql,
         |sh AS (SELECT doc_id, $shinglesSql AS sh FROM dupdocs),
         |bands AS (
         |${(0 until Bands).map(b =>
             s"  SELECT doc_id, $b AS band, ${bandKeySql(b)} AS key FROM sh").mkString(" UNION ALL\n")}
         |),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
         |                           AND a.doc_id < b.doc_id
         |)
         |SELECT c.doc_a, c.doc_b,
         |       CAST(len(list_filter(x.sh, s -> list_contains(y.sh, s))) AS DOUBLE)
         |       / CAST(len(x.sh) + len(y.sh) - len(list_filter(x.sh, s -> list_contains(y.sh, s))) AS DOUBLE)
         |       AS jaccard
         |FROM cand c JOIN sh x ON c.doc_a = x.doc_id JOIN sh y ON c.doc_b = y.doc_id
         |WHERE CAST(len(list_filter(x.sh, s -> list_contains(y.sh, s))) AS DOUBLE)
         |      / CAST(len(x.sh) + len(y.sh) - len(list_filter(x.sh, s -> list_contains(y.sh, s))) AS DOUBLE) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      // Persist the signature stage (cache = the local stand-in for writing
      // signatures to a table, as a 100 TB pipeline would): without the
      // barrier Catalyst's projection collapse inlines the shingle+minhash
      // trees into every downstream operator — 9x recompute per side of the
      // self-join and minutes of optimizer/codegen time on giant trees.
      val sh = dupDocs(s, d)
        .select(col("doc_id"), DedupFns.shingles(col("text")).as("sh"))
        .cache()
      val bands = sh.select(col("doc_id"),
        posexplode(DedupFns.bandKeys(col("sh"), Bands, RowsPerBand)).as(Seq("band", "key")))
        .cache()
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      cand
        .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
        .withColumn("jaccard", DedupFns.jaccard(col("sh_a"), col("sh_b")))
        .where(col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    },

    // SimHash clustering: 16-bit signature groupBy; clusters with >1 doc
    // are near-dup candidates. Single shuffle on the signature key.
    Q("d03_simhash_clusters",
      s"""WITH $dupDocsSql,
         |t AS (SELECT doc_id,
         |  list_distinct(string_split($normSql, ' ')) AS toks
         |  FROM dupdocs),
         |s AS (SELECT doc_id, ${(1 to 16).map(j =>
             s"(CASE WHEN list_sum(list_transform(toks, t -> CASE WHEN substring(md5(t), $j, 1) >= '8' THEN 1 ELSE -1 END)) > 0 THEN '1' ELSE '0' END)"
           ).mkString(" || ")} AS simhash FROM t)
         |SELECT simhash, MIN(doc_id) AS keeper, COUNT(*) AS n_docs
         |FROM s GROUP BY simhash HAVING COUNT(*) > 1
         |ORDER BY simhash""".stripMargin) { (s, d) =>
      dupDocs(s, d)
        .select(col("doc_id"), DedupFns.simhash16(col("text")).as("simhash"))
        .groupBy("simhash")
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_docs"))
        .where(col("n_docs") > 1)
        .orderBy("simhash")
    },

    // Embedding-cosine near-dup: candidate pairs only WITHIN a label cell
    // (IVF-style bucketing — the 100 TB path: co-partition by cell id,
    // never all-pairs). Integer-quantized cosine for exact cross-engine
    // parity and order-free aggregation.
    Q("d04_embedding_neardup",
      s"""WITH $dupEmbSql,
         |qv AS (SELECT vec_id, label,
         |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |       FROM dupemb),
         |n AS (SELECT vec_id, label, q,
         |        CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2 FROM qv)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
         |       CAST(CAST(list_sum(list_transform(list_zip(a.q, b.q), s -> s[1] * s[2])) AS BIGINT) AS DOUBLE)
         |         / sqrt(CAST(a.n2 * b.n2 AS DOUBLE)) AS cosine
         |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE a.n2 > 0 AND b.n2 > 0
         |  AND CAST(CAST(list_sum(list_transform(list_zip(a.q, b.q), s -> s[1] * s[2])) AS BIGINT) AS DOUBLE)
         |      / sqrt(CAST(a.n2 * b.n2 AS DOUBLE)) >= 0.95
         |ORDER BY vec_a, vec_b""".stripMargin) { (s, d) =>
      // quantize + norms once per vector, persisted (feature-table stage)
      val qv = dupEmb(s, d).select(col("vec_id"), col("label"),
        VectorFns.quantize(col("embedding")).as("q"))
        .withColumn("n2", VectorFns.qnorm2(col("q")))
        .cache()
      val a = qv.select(col("vec_id").as("vec_a"), col("label"),
        col("q").as("q_a"), col("n2").as("n2_a"))
      val b = qv.select(col("vec_id").as("vec_b"), col("label"),
        col("q").as("q_b"), col("n2").as("n2_b"))
      a.join(b, Seq("label"))
        .where(col("vec_a") < col("vec_b"))
        .where(col("n2_a") > 0 && col("n2_b") > 0)
        .withColumn("cosine",
          VectorFns.qdot(col("q_a"), col("q_b")).cast("double") /
            sqrt((col("n2_a") * col("n2_b")).cast("double")))
        .where(col("cosine") >= 0.95)
        .select(col("vec_a"), col("vec_b"), col("label"), col("cosine"))
        .orderBy("vec_a", "vec_b")
    }
  )
}
