package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.{SimilarityQueries, TextQueries}

/** Semantics of the retrieval additions beyond their oracle hash checks:
  * t16 BM25 (relevance ordering on an injected rare-term fixture, rank
  * contiguity), t17 PMI (an injected collocation wins; floors hold), and
  * v11 kNN graph (per-source rank structure + exact agreement with v04's
  * bucketed search on the shared probe set).
  */
class RetrievalSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  /** Write a synthetic documents table (driver schema) to a temp dir. */
  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-retrieval").toString
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("synth").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("t16: rare-term match outranks non-matches; non-matchers are absent") {
    // doc 0 is the probe (0 % Bm25QueryEvery == 0): its terms include the
    // rare 'zyzzyva'. doc 1 shares it; docs 2-9 share nothing.
    val filler = (2L to 9L).map(i => i -> s"common filler words number $i here")
    val dir = docsDir(Seq(
      0L -> "zyzzyva alpha beta",
      1L -> "zyzzyva gamma delta epsilon") ++ filler)
    val rows = SparkEntry.queries("t16_bm25_search")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val q0 = rows.filter(_._1 == 0L).sortBy(_._3)
    assert(q0.map(_._2).toSet == Set(0L, 1L),
      s"query 0 must retrieve exactly the two zyzzyva docs, got $q0")
    assert(q0.head._2 == 0L, "the probe doc (all terms, 3x rare) must rank first")
    assert(q0.map(_._3).toSeq == Seq(1, 2), "ranks must be contiguous from 1")
  }

  test("t16: sf0.001 ranks are contiguous with non-increasing scores") {
    val rows = SparkEntry.queries("t16_bm25_search")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(rows.nonEmpty, "no BM25 results at sf0.001 — probe fixture vacuous")
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1 to rs.length).toSeq,
        s"query $qid: ranks not contiguous")
      assert(sorted.length <= TextQueries.Bm25K)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 >= b._4,
          s"query $qid: score rose with rank (${a._4} -> ${b._4})")
        case _ =>
      }
    }
  }

  test("t17: an injected collocation is found, floors and ordering hold") {
    // 'vorpal blade' co-occurs 6x (above PmiMinCount); every other word is
    // unique to its doc, so every other pair count is 1 (below the floor)
    val docs = (0L to 5L).map(i =>
      i -> s"w${i}a w${i}b vorpal blade w${i}c w${i}d")
    val dir = docsDir(docs)
    val rows = SparkEntry.queries("t17_pmi_collocations")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.forall(_._3 >= TextQueries.PmiMinCount), "count floor violated")
    assert(rows.map(r => (r._1, r._2)).toSeq == Seq(("vorpal", "blade")),
      s"expected ('vorpal','blade') as the only above-floor pair, got ${rows.toSeq}")
  }

  test("v12: exact quotas — capped labels hit the quota, small labels keep all") {
    val rows = SparkEntry.queries("v12_stratified_sample")(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (label, n, kept) =>
      assert(kept == math.min(n, SimilarityQueries.StratQuota.toLong),
        s"label $label: kept $kept != min($n, quota)")
    }
    assert(rows.exists(_._2 > SimilarityQueries.StratQuota), "no capped label — vacuous")
    assert(rows.exists(_._2 < SimilarityQueries.StratQuota), "no deficit label — vacuous")
  }

  test("v13: tombstoned neighbors vanish and the masking is non-vacuous") {
    val v10 = SparkEntry.queries("v10_incremental_ann")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val v13 = SparkEntry.queries("v13_ann_tombstones")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(v13.nonEmpty)
    v13.foreach { case (_, n) =>
      assert(n % SimilarityQueries.TombstoneMod != 0,
        s"tombstoned neighbor $n returned by v13")
    }
    // some v10 top-k entry must have been a now-deleted vector, so the
    // two rankings must differ (else the fixture proves nothing)
    assert(v10.exists(_._2 % SimilarityQueries.TombstoneMod == 0),
      "no tombstoned id ever ranked in v10 — fixture vacuous")
    assert(v13.toSet != v10, "deletions changed nothing in the top-k")
  }

  test("t18: RRF score is exactly recomputable and fusion is non-vacuous") {
    val rows = SparkEntry.queries("t18_hybrid_rrf")(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // the integer-ppm RRF contract: score derives from the two ranks alone
    rows.foreach { case (q, doc, _, lex, vec, rrf) =>
      val expected = (if (lex > 0) 1000000L / (60 + lex) else 0L) +
        (if (vec > 0) 1000000L / (60 + vec) else 0L)
      assert(rrf == expected, s"query $q doc $doc: rrf $rrf != $expected")
      assert(lex > 0 || vec > 0, s"query $q doc $doc in neither list")
    }
    // fusion must demonstrably mix: lex-only, vec-only, and (on this
    // fixture) at least one doc ranked by BOTH lists
    assert(rows.exists(r => r._4 > 0 && r._5 == 0), "no lex-only row — vacuous")
    assert(rows.exists(r => r._4 == 0 && r._5 > 0), "no vec-only row — vacuous")
    assert(rows.exists(r => r._4 > 0 && r._5 > 0), "no dual-list row — vacuous")
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1 to rs.length).toSeq,
        s"query $q: ranks not contiguous")
      assert(sorted.length <= TextQueries.Bm25K)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._6 >= b._6,
          s"query $q: rrf rose with rank (${a._6} -> ${b._6})")
        case _ =>
      }
    }
  }

  test("t19: round 2 merges round-1 tokens — the merge t15 cannot produce") {
    // every word is 'abcd': round 1 learns {ab, cd} (among others) and
    // merges both aligned pairs -> 2 tokens/word; round 2 learns the
    // TOKEN pair (ab, cd) and fuses it -> 1 four-char token/word. A
    // single-round trainer can never emit a >2-char token.
    val dir = docsDir((0L to 9L).map(i => i -> "abcd abcd abcd"))
    val rows = SparkEntry.queries("t19_bpe_multiround")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 1)
    val (_, r1, r2, mc) = rows.head
    val nWords = 30L
    assert(r1 == 2 * nWords, s"round 1 should merge both aligned pairs: $rows")
    assert(r2 == nWords, s"round 2 should fuse (ab, cd) in every word: $rows")
    assert(mc == nWords, s"every round-2 merge fuses two 2-char tokens: $rows")
  }

  test("t19: on the corpus, round 2 strictly reduces and multichar merges exist") {
    val rows = SparkEntry.queries("t19_bpe_multiround")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, r1, r2, mc) =>
      assert(r2 <= r1, s"$src: round 2 grew the token count")
      assert(mc >= 0)
    }
    assert(rows.map(_._3).sum < rows.map(_._2).sum, "round 2 merged nothing — vacuous")
    assert(rows.map(_._4).sum > 0, "no multichar merge anywhere — round 2 is not compounding")
  }

  test("d22/d23: aggregate recall floors derive from the real counts") {
    import graft.queries.DedupQueries
    def rows(name: String) = SparkEntry.queries(name)(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val d22 = rows("d22_simhash_recall")
    assert(d22.nonEmpty)
    d22.foreach { case (id, nt, nf, _) =>
      assert(nf <= nt, s"probe $id found more than truth ($nf > $nt)")
      assert(nt > 0, s"probe $id with empty truth should not appear")
    }
    // the floor boolean is the aggregate statistic, recomputed here
    val agg22 = d22.map(_._3).sum.toDouble / d22.map(_._2).sum
    assert(d22.forall(_._4 == (agg22 >= DedupQueries.SimhashAggRecallFloor)))
    // SimHash honestly misses some strong pairs — certification must not
    // be vacuous (all-found would certify nothing about the floor)
    assert(d22.exists(r => r._3 < r._2), "no missed truth pair — fixture vacuous")
    val d23 = rows("d23_embedding_recall")
    assert(d23.nonEmpty)
    d23.foreach { case (id, nt, nf, _) => assert(nf <= nt && nt > 0, s"probe $id") }
    val agg23 = d23.map(_._3).sum.toDouble / d23.map(_._2).sum
    assert(d23.forall(_._4 == (agg23 >= DedupQueries.EmbAggRecallFloor)))
    assert(agg23 >= DedupQueries.EmbAggRecallFloor,
      s"embedding detector recall regressed to $agg23")
  }

  test("v11: rank structure holds and probe rows equal v04's top-k prefix") {
    val graph = SparkEntry.queries("v11_knn_graph")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(graph.nonEmpty)
    graph.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.length <= SimilarityQueries.KnnGraphK)
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length).toSeq,
        s"src $src: ranks not contiguous")
      assert(rs.forall(_._2 != src), s"src $src: self edge")
    }
    // same buckets, same scoring, same tie-break => the graph restricted
    // to v04's probe set must equal v04's ranking truncated to KnnGraphK
    val v04 = SparkEntry.queries("v04_knn_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .filter(_._3 <= SimilarityQueries.KnnGraphK)
    val probeGraph = graph.filter(_._1 < SimilarityQueries.NumProbes)
    assert(probeGraph.toSet == v04.toSet,
      "kNN graph disagrees with v04 on the shared probe set")
  }

  test("v15: ranked per probe, no self-matches, and chunk granularity matters") {
    val rows = SparkEntry.queries("v15_chunk_retrieval")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._1 != r._2), "a probe retrieved its own doc")
    rows.groupBy(_._1).foreach { case (p, rs) =>
      val byRank = rs.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1L to byRank.length).toSeq,
        s"probe $p: ranks not dense")
      assert(byRank.map(_._5).toSeq == byRank.map(_._5).sortBy(-_).toSeq,
        s"probe $p: cosine not descending with rank")
    }
    // the late-interaction point: some doc must win on a NON-FIRST chunk
    // (a whole-doc-vector index could never report that passage)
    assert(rows.exists(_._3 > 0L),
      "every match is chunk 0 — chunk granularity added nothing (vacuous)")
  }
}
