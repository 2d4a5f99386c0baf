package graft

import org.apache.spark.sql.functions._
import graft.queries.DedupQueries

/** d17 exact substring dedup semantics (beyond the oracle hash check):
  * full-copy pairs yield exactly one whole-doc span on both sides, and
  * chimera fixtures yield multiple spans that break at the junction —
  * the maximal-run reconstruction, not just "some rows came back".
  */
class SubstringDedupSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"
  private val L = DedupQueries.SubstrMinTokens

  private lazy val spans: Map[Long, Seq[(Long, Long)]] =
    SparkEntry.queries("d17_substring_dedup")(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap

  private lazy val docTokens: Map[Long, Int] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(lower(trim(col("text"))), "\\s+")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("full-copy pairs produce exactly one whole-doc span on both sides") {
    val pairs = docTokens.keys.filter(d => d % 10 == 0 && docTokens(d) >= L)
    assert(pairs.nonEmpty, "no full-copy fixture docs with >= L tokens — vacuous")
    pairs.foreach { d =>
      val n = docTokens(d).toLong
      assert(spans(d) == Seq((1L, n)),
        s"doc $d: expected single whole-doc span (1,$n), got ${spans(d)}")
      assert(spans(d + DedupQueries.BatchIdOffset) == Seq((1L, n)),
        s"copy of $d: expected single whole-doc span (1,$n)")
    }
  }

  test("chimera docs break into multiple spans at the junction") {
    // >=2 spans only guaranteed when BOTH source prefixes carry a full
    // length-L shingle; a sub-L part contributes no span of its own
    val chimeras = spans.keys.filter(_ >= DedupQueries.SubstrIdOffset).filter { c =>
      val a = c - DedupQueries.SubstrIdOffset
      Seq(a, a + 10).forall(d =>
        math.min(docTokens(d), DedupQueries.SubstrPrefixTokens) >= L)
    }
    assert(chimeras.nonEmpty, "no chimera with two >=L parts — fixture vacuous")
    chimeras.foreach { c =>
      val ss = spans(c)
      assert(ss.size >= 2,
        s"chimera $c: expected >=2 spans (junction must break the run), got $ss")
      // spans never overlap and never touch: consecutive duplicated
      // positions would have merged into one island
      ss.sliding(2).foreach {
        case Seq((s1, l1), (s2, _)) =>
          assert(s1 + l1 - L + 1 < s2, s"chimera $c: spans $ss not maximal")
        case _ =>
      }
    }
  }

  test("docs shorter than L tokens never appear") {
    val short = docTokens.filter(_._2 < L).keys.filter(spans.contains)
    assert(short.isEmpty, s"sub-L docs flagged: $short")
    assert(docTokens.values.exists(_ < L), "no sub-L docs at this sf — vacuous")
  }
}
