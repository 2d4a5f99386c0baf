package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftNative, Q}

/** Hybrid retrieval — fusing the lexical (t16 BM25) and vector
  * (v-family LSH ANN) rankings into one result list, the production
  * search composition (RAG retrieval, dedup-aware search UIs) that
  * neither index serves alone: BM25 nails exact-term matches the
  * embedding blurs, ANN recalls paraphrases sharing no tokens.
  *
  * Fusion is reciprocal-rank fusion (RRF, Cormack et al.'s standard
  * score-free combiner): score(d) = Σ_lists 1/(60 + rank_list(d)),
  * computed in integer parts-per-million (`1000000 DIV (60 + rank)`,
  * missing list → 0) so the fused score is a sum of longs — order-free
  * and bit-identical across engines, where float RRF could diverge on
  * accumulation order.
  *
  * Scale shape: BOTH inputs are the WRITTEN index stages that already
  * exist — t16's postings index (`t16_toks`/`t16_idx`) and the
  * v-family's bucketed quantized corpus (`v11_bucketed`) — each scanned
  * once; the query sets are tiny by construction and broadcast; each
  * side's top-k is bounded BEFORE fusion (WindowGroupLimit), so the
  * fusion join touches at most 2k rows per query regardless of corpus
  * size. No cartesian anywhere; the final re-rank is another
  * WindowGroupLimit over ≤ 2k rows per query.
  *
  * The query fixture rides t16's: every [[TextQueries.Bm25QueryEvery]]-th
  * doc queries BOTH indexes — its first-8-position distinct tokens hit
  * BM25, its own embedding (doc_id = vec_id, the same id space mm05's
  * cross-modal retrieval uses) probes the LSH buckets (multi-probe,
  * Hamming ≤ 1, self included — a real query pipeline embeds the query
  * text; the fixture's aligned ids stand in for that encoder).
  */
object HybridQueries {

  /** RRF rank-offset constant (the k in 1/(k + rank); 60 is the value
    * from the original RRF paper and the common default).
    */
  val RrfK = 60

  // The vector side's top-k bound arrives implicitly through
  // SimilarityQueries.scoreAndRank (which cuts at SimilarityQueries.K),
  // while the oracle SQL truncates both lists at TextQueries.Bm25K. They
  // are equal today by design, not coincidence — enforce it at object
  // init so changing either constant fails loudly here instead of as a
  // silent engine/oracle desynchronization a suite run has to catch.
  require(SimilarityQueries.K == TextQueries.Bm25K,
    s"t18 fuses two top-k lists cut at different depths: SimilarityQueries.K=" +
      s"${SimilarityQueries.K} vs TextQueries.Bm25K=${TextQueries.Bm25K}")

  val entries: Seq[Q] = Seq(

    Q("t18_hybrid_rrf",
      s"""WITH ${TextQueries.bm25SqlCtes},
         |${SimilarityQueries.qvSqlNamed("vqv", "vn")},
         |vb AS (SELECT vec_id, q, n2, ${SimilarityQueries.lshBucketSql("q")} AS bucket FROM vn),
         |vec_scored AS (
         |  SELECT p.vec_id AS query_id, c.vec_id AS doc_id,
         |         ${SimilarityQueries.cosineSql} AS cosine
         |  FROM vb p JOIN vb c
         |    ON ${SimilarityQueries.bucketHamLe1Sql("p.bucket", "c.bucket")}
         |  WHERE p.vec_id % ${TextQueries.Bm25QueryEvery} = 0
         |    AND p.n2 > 0 AND c.n2 > 0
         |),
         |vec_rank AS (
         |  SELECT query_id, doc_id, rnk AS vec_rnk FROM (
         |    SELECT query_id, doc_id,
         |           ROW_NUMBER() OVER (PARTITION BY query_id
         |                              ORDER BY cosine DESC, doc_id) AS rnk
         |    FROM vec_scored) WHERE rnk <= ${TextQueries.Bm25K}
         |),
         |lex_rank AS (
         |  SELECT query_id, doc_id, rnk AS lex_rnk FROM bmranked
         |  WHERE rnk <= ${TextQueries.Bm25K}
         |),
         |fused AS (
         |  SELECT COALESCE(l.query_id, v.query_id) AS query_id,
         |         COALESCE(l.doc_id, v.doc_id) AS doc_id,
         |         CAST(COALESCE(l.lex_rnk, 0) AS BIGINT) AS lex_rnk,
         |         CAST(COALESCE(v.vec_rnk, 0) AS BIGINT) AS vec_rnk,
         |         CAST(COALESCE(1000000 // ($RrfK + l.lex_rnk), 0)
         |            + COALESCE(1000000 // ($RrfK + v.vec_rnk), 0) AS BIGINT) AS rrf_ppm
         |  FROM lex_rank l FULL OUTER JOIN vec_rank v
         |    ON l.query_id = v.query_id AND l.doc_id = v.doc_id
         |)
         |SELECT query_id, doc_id, rnk, lex_rnk, vec_rnk, rrf_ppm FROM (
         |  SELECT query_id, doc_id, lex_rnk, vec_rnk, rrf_ppm,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY rrf_ppm DESC, doc_id) AS rnk
         |  FROM fused)
         |WHERE rnk <= ${TextQueries.Bm25K}
         |ORDER BY query_id, rnk""".stripMargin) { (s, d) =>
      GraftNative.ensure(s)
      val lex = TextQueries.bm25Ranked(s, d)
        .select(col("query_id"), col("doc_id"), col("rnk").cast("long").as("lex_rnk"))
      // vector side: the query doc's own embedding probes the shared
      // bucketed index (multi-probe: own bucket + Hamming-1 neighbors,
      // self included — same disjoint-bucket trick as v06)
      val b = SimilarityQueries.bucketedQv(s, d)
      val probes = b.where(col("vec_id") % TextQueries.Bm25QueryEvery === 0)
        .select(col("vec_id").as("probe_id"),
          explode(SimilarityQueries.probeBuckets(col("bucket"))).as("p_bucket"),
          col("q").as("p_q"), col("n2").as("p_n2"))
      val vec = SimilarityQueries.scoreAndRank(
          b.join(broadcast(probes), col("bucket") === col("p_bucket")))
        .select(col("probe_id").as("query_id"),
          col("neighbor_id").as("doc_id"), col("rnk").cast("long").as("vec_rnk"))
      val w = Window.partitionBy("query_id").orderBy(col("rrf_ppm").desc, col("doc_id"))
      lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
        .select(col("query_id"), col("doc_id"),
          coalesce(col("lex_rnk"), lit(0L)).as("lex_rnk"),
          coalesce(col("vec_rnk"), lit(0L)).as("vec_rnk"))
        .withColumn("rrf_ppm", expr(
          s"""CAST(CASE WHEN lex_rnk > 0 THEN 1000000 DIV ($RrfK + lex_rnk) ELSE 0 END
             |   + CASE WHEN vec_rnk > 0 THEN 1000000 DIV ($RrfK + vec_rnk) ELSE 0 END
             | AS BIGINT)""".stripMargin))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= TextQueries.Bm25K)
        .select("query_id", "doc_id", "rnk", "lex_rnk", "vec_rnk", "rrf_ppm")
        .orderBy("query_id", "rnk")
    }
  )
}
