package graft

import org.apache.spark.sql.functions._
import graft.operators.ProductQuantizer

/** v07 product quantization: codes must be a faithful compression (same
  * vector -> same codes; clustered vectors -> shared codes), the
  * two-stage search (ADC shortlist + exact re-rank) must clear a recall
  * floor on the fixture, and the whole pipeline must be deterministic —
  * k-means init, code assignment and ADC contain no randomness.
  */
class PqSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("vectors sharing a prototype get identical codes; codebook recovers the clusters") {
    import spark.implicits._
    GraftNative.ensure(spark)
    // 4 well-separated prototypes in 8 dims, 10 copies each
    val protos = Seq(
      Array(1000L, 1000L, 0L, 0L, 0L, 0L, 0L, 0L),
      Array(0L, 0L, 1000L, 1000L, 0L, 0L, 0L, 0L),
      Array(0L, 0L, 0L, 0L, 1000L, 1000L, 0L, 0L),
      Array(0L, 0L, 0L, 0L, 0L, 0L, 1000L, 1000L))
    // interleave prototypes across vec_ids (id % 4 = prototype) so the
    // deterministic lowest-id k-means init sees one vector of each
    // cluster — grouped ids would hand init 4 copies of prototype 0 and
    // Lloyd could never split them apart (standard k-means init
    // sensitivity; callers feed representative ids)
    val rows = for (p <- protos.indices; c <- 0 until 10)
      yield ((c * 4 + p).toLong, protos(p))
    val qv = rows.toDF("vec_id", "q")
    val sv = ProductQuantizer.subvectors(qv, subs = 2, dim = 8)
    val codebook = ProductQuantizer.fit(sv, codes = 4, iters = 3)
    val norms = qv.select(col("vec_id"),
      GraftNative.longDot(col("q"), col("q")).as("n2"))
    val packed = ProductQuantizer.encodePacked(sv, codebook, norms)
    val codesByVec = packed.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    // same prototype -> same code word
    for (p <- protos.indices; c <- 1 until 10)
      assert(codesByVec(p.toLong) == codesByVec((c * 4 + p).toLong),
        s"copies of prototype $p disagree on codes")
    // different prototypes -> different code words (separated clusters)
    val distinctWords = protos.indices.map(p => codesByVec(p.toLong)).distinct
    assert(distinctWords.size == protos.size, s"prototypes collapsed: $distinctWords")
    // ADC: a prototype-0 probe scores its own cluster at approx_cosine ~ 1
    val probeSv = sv.where(col("vec_id") === 0)
    val probeNorms = norms.where(col("vec_id") === 0)
      .select(col("vec_id").as("probe_id"), col("n2").as("p_n2"))
    val adc = ProductQuantizer.adcScores(probeSv, codebook, packed, probeNorms, subs = 2)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    for (c <- 1 until 10)
      assert(math.abs(adc((c * 4).toLong) - 1.0) < 1e-9,
        s"same-cluster vec ${c * 4} scored ${adc((c * 4).toLong)}")
    assert(adc(1L) < 0.5, s"cross-cluster vec scored ${adc(1L)}")
  }

  test("two-stage recall clears the floor on the fixture") {
    val rows = graft.queries.SimilarityQueries.pqRecallRaw(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows.size == 5)
    rows.foreach { case (p, r) =>
      assert(r >= 0.6, s"probe $p recall $r below floor — shortlist re-rank broken")
    }
    val mean = rows.values.sum / rows.size
    assert(mean >= 0.7, s"mean recall $mean below 0.7")
  }

  test("the PQ pipeline is deterministic across runs") {
    def run() = graft.queries.SimilarityQueries.pqRecallRaw(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(run() == run())
  }

  test("IVF-PQ composite clears the recall floor while scoring ~1/cells of the corpus") {
    val rows = graft.queries.SimilarityQueries.ivfpqRecallRaw(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows.size == 5)
    rows.foreach { case (p, r) =>
      assert(r >= 0.6, s"probe $p recall $r below floor — cell restriction or ADC broken")
    }
    val mean = rows.values.sum / rows.size
    assert(mean >= 0.7, s"mean recall $mean below 0.7")
  }

  test("the certified v07/v08 outputs report the floor as met with the exact-side count") {
    for (name <- Seq("v07_ann_recall_pq", "v08_ann_recall_ivfpq")) {
      val rows = SparkEntry.queries(name)(spark, sfDir).collect()
      assert(rows.length == 5, s"$name probe count")
      rows.foreach { r =>
        assert(r.getLong(1) == 10L, s"$name probe ${r.getLong(0)} n_exact ${r.getLong(1)}")
        assert(r.getBoolean(2), s"$name probe ${r.getLong(0)} floor not met")
      }
    }
  }
}
