package graft

import org.apache.spark.sql.functions._
import graft.queries.SimilarityQueries

/** v16 graph-based ANN: the beam walk must dominate the single-probe LSH
  * search it enters through — per-probe (structural: its candidate pool
  * is a superset) and strictly in aggregate (the graph hops actually buy
  * recall on the fixture) — and clear the certified floor.
  */
class BeamSearchSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.01"

  test("beam recall >= v04 per probe, strictly above in aggregate, floor met") {
    val beam = SimilarityQueries.beamRecallRaw(spark, sfDir)
      .select("probe_id", "recall").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // v05's output IS v04's single-probe recall per probe
    val single = SparkEntry.queries("v05_ann_recall")(spark, sfDir)
      .select("probe_id", "recall").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(beam.keySet == single.keySet, "probe sets diverge")
    single.foreach { case (p, r) =>
      assert(beam(p) >= r, s"probe $p: beam ${beam(p)} < single-probe $r")
    }
    assert(beam.values.sum > single.values.sum,
      s"beam aggregate ${beam.values.sum} not strictly above single-probe ${single.values.sum}")
    beam.foreach { case (p, r) =>
      assert(r >= SimilarityQueries.BeamRecallFloor,
        s"probe $p: beam recall $r below floor ${SimilarityQueries.BeamRecallFloor}")
    }
  }

  test("scaled-plane path: multi-probe entry + CONSTANT capped walk holds the floor") {
    // force the data-scaled bucketing two planes finer than the fixture
    // (4x more, 4x smaller buckets — the sf1+ shape) and verify the
    // HNSW-style coarse entry (own bucket + every Hamming-1 flip) keeps
    // recall above the certified floor WITHOUT the old per-plane growth
    // of hops/width: the walk runs at the same BeamHops/BeamWidth the
    // certification sfs use.
    val p = SimilarityQueries.LshPlanes + 2
    val beam = SimilarityQueries.beamRecallRaw(spark, sfDir, pOverride = Some(p))
      .select("probe_id", "recall").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(beam.nonEmpty)
    // the scale walk certifies the PQ-level floor (0.6; measured 0.7 at
    // sf1) — the raised 0.8 beam floor is the CERTIFICATION-path bar
    beam.foreach { case (pr, r) =>
      assert(r >= SimilarityQueries.RecallFloor,
        s"probe $pr: scaled-path recall $r below floor with capped walk")
    }
  }

  test("beam search is deterministic and ranked per probe") {
    val a = SimilarityQueries.beamKnn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val b = SimilarityQueries.beamKnn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(a.toSeq == b.toSeq, "beam search nondeterministic")
    // exactly K ranked rows per probe, ranks 1..K, no self-matches
    a.groupBy(_._1).foreach { case (p, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length),
        s"probe $p ranks not 1..${rows.length}")
      assert(rows.length <= SimilarityQueries.K)
      assert(!rows.exists(_._2 == p), s"probe $p matched itself")
    }
  }
}
