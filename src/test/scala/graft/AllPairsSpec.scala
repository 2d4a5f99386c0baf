package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.DedupFns
import graft.queries.DedupQueries

/** d28 exact set-similarity join: prefix filtering must lose NOTHING —
  * certified against a literal brute-force over every doc pair (feasible
  * at sf0.001: ~550 docs, ~150k pairs), plus containment of d06's
  * df-capped result and the structural index facts that make the prefix
  * route scale.
  */
class AllPairsSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  /** DedupQueries.dupDocs reconstructed (documents + every 10th at
    * id+BatchIdOffset — the injected-duplicate fixture).
    */
  private def dupDocs: DataFrame = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    docs.unionByName(docs.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + DedupQueries.BatchIdOffset).as("doc_id"), col("text")))
  }

  private def shingleSets: Array[(Long, Set[String])] = {
    GraftNative.ensure(spark)
    dupDocs.select(col("doc_id"),
        GraftNative.shingles(DedupFns.normText(col("text"))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
  }

  private def d28Pairs: Set[(Long, Long)] =
    SparkEntry.queries("d28_allpairs_exact")(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("prefix-filter join == brute-force all-pairs at J >= 0.5 (exactness)") {
    val sets = shingleSets
    val truth = (for {
      i <- sets.indices.iterator
      j <- (i + 1) until sets.length
    } yield {
      val (ida, sa) = sets(i)
      val (idb, sb) = sets(j)
      val inter = sa.count(sb)
      val j2 = inter.toDouble / (sa.size + sb.size - inter)
      (if (ida < idb) (ida, idb) else (idb, ida), j2)
    }).filter(_._2 >= 0.5).map(_._1).toSet

    val got = d28Pairs
    assert(truth.nonEmpty, "fixture degenerate: no true pairs at sf0.001")
    assert(got == truth,
      s"missed=${(truth -- got).take(5)} spurious=${(got -- truth).take(5)}")
  }

  test("d06's df-capped pairs are contained in the exact join") {
    val d06 = SparkEntry.queries("d06_ngram_jaccard")(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val d28 = d28Pairs
    assert(d06.nonEmpty)
    assert((d06 -- d28).isEmpty,
      s"d06 found pairs the exact join missed: ${(d06 -- d28).take(5)}")
  }

  test("prefix index is a strict reduction and is rarest-first per doc") {
    GraftNative.ensure(spark)
    val sh = dupDocs.select(col("doc_id"),
      GraftNative.shingles(DedupFns.normText(col("text"))).as("sh"))
    val inv = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val nInv = inv.count()
    val pre = DedupQueries.prefixIndex(spark, sfDir)
    val nPre = pre.count()
    assert(nPre > 0 && nPre < nInv / 2,
      s"prefix index $nPre not a reduction of inverted index $nInv")

    // The structural guarantee that keeps hot tokens out at ANY scale:
    // each doc indexes a PREFIX of the global (df asc, shingle asc)
    // order, so every excluded df>=2 token of a doc must rank strictly
    // after every indexed token of that doc. (df=1 tokens are dropped
    // post-ranking — they cannot produce a pair — so they are exempt.)
    val dft = inv.groupBy("shingle").agg(count(lit(1)).as("df"))
    val ranked = inv.join(dft, Seq("shingle")).where(col("df") >= 2)
      .join(pre.select(col("doc_id"), col("shingle"), lit(1).as("indexed")),
        Seq("doc_id", "shingle"), "left")
      .select(col("doc_id"), struct(col("df"), col("shingle")).as("key"),
        coalesce(col("indexed"), lit(0)).as("indexed"))
    val perDoc = ranked.groupBy("doc_id").agg(
        max(when(col("indexed") === 1, col("key"))).as("max_in"),
        min(when(col("indexed") === 0, col("key"))).as("min_out"))
      .where(col("max_in").isNotNull && col("min_out").isNotNull)
    assert(perDoc.count() > 0, "fixture degenerate: no doc has both " +
      "indexed and excluded df>=2 tokens")
    val violations = perDoc.where(col("max_in") >= col("min_out")).count()
    assert(violations === 0L,
      s"$violations docs index a token ranked after an excluded one")
  }
}
