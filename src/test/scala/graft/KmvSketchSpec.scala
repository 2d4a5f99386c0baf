package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.functions.{KmvAgg, KmvSketch}

/** The KMV sketch must equal the brute-force k smallest distinct values —
  * through any partitioning (merge order) — and its estimator must be the
  * documented closed form.
  */
class KmvSketchSpec extends SparkTestBase {

  private def brute(xs: Seq[Long], k: Int): Seq[Long] =
    xs.distinct.sorted.take(k)

  test("reduce/merge equal brute force on fuzzed inputs and splits") {
    val k = 8
    val agg = new KmvAgg(k)
    val inputs: Gen[List[Long]] =
      Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 40L))) // dense -> duplicates
    val cases = Gen.listOfN(80, inputs).sample.getOrElse(fail("generator exhausted"))
    cases.foreach { xs =>
      val direct = xs.foldLeft(agg.zero)(agg.reduce)
      assert(direct.toSeq == brute(xs, k), s"reduce mismatch on $xs")
      // any split point: merge(partial, partial) must agree
      val cut = xs.length / 3
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(merged.toSeq == brute(xs, k), s"merge mismatch on $xs split at $cut")
    }
  }

  test("udaf form: map-side partials across partitions equal brute force") {
    import spark.implicits._
    val k = 8
    val rows = (1L to 500L).map(i => (i % 3, i % 97)) // 3 groups, 97 distinct values
    val got = rows.toDF("g", "h").repartition(13)
      .groupBy("g").agg(KmvSketch.kmv(col("h"), k).as("kmv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    (0L to 2L).foreach { g =>
      val expect = brute(rows.filter(_._1 == g).map(_._2), k)
      assert(got(g) == expect, s"group $g")
    }
  }

  test("estimator: exact below k, (k-1)*H/h_k at k") {
    import spark.implicits._
    val k = 4
    // distinct hashes 10,20,30 -> fewer than k -> estimate == 3.0
    // distinct hashes 10,20,30,40(,...) -> (k-1)*H/40
    val df = Seq(
      (1L, Seq(10L, 20L, 30L)),
      (2L, Seq(10L, 20L, 30L, 40L))).toDF("g", "kmv")
    val got = df.select(col("g"), KmvSketch.estimate(col("kmv"), k).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 3.0)
    assert(got(2L) == 3 * KmvSketch.HashSpace / 40.0)
  }

  test("t20: every pair certified within tolerance and overlap is real") {
    val rows = SparkEntry.queries("t20_source_overlap")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3), r.getLong(4),
        r.getBoolean(5)))
    assert(rows.length > 1, "fewer than two source pairs")
    assert(rows.forall(_._5), "within_tol gate false at sf0.001")
    assert(rows.exists(_._3 > 20000L),
      "no source pair above 2% exact Jaccard — the overlap signal is noise-level")
    rows.foreach { case (a, b, exact, est, _) =>
      assert(math.abs(est - exact) - exact / 8 <= graft.queries.TextQueries.OverlapTolPpm,
        s"($a,$b): est $est vs exact $exact outside the certified bound")
    }
  }
}
