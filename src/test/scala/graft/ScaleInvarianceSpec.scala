package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame

/** Scale EQUIVARIANCE: correctness (not just timing) above the generated
  * scale factors. [[ScaleData.scaleDocuments]]' replication is a per-
  * replica bijection of tokens, so for the dedup operators whose
  * candidate generation is deterministic-complete — exact fingerprint
  * groups (d01/d05), the df-capped inverted index (d06), chunk hashing
  * (d13) — the output over an N-fold corpus must be EXACTLY the original
  * output repeated N times with ids shifted by the replica step. Any
  * deviation (a lost pair, a cross-replica pair, a df cap tripping
  * early) is an engine defect at scale, caught row-for-row here.
  * (d02/d03 are excluded by design: LSH band and SimHash candidate
  * recall is hash-dependent, so their outputs are not bijection-stable —
  * their scale behavior is covered by the recorded smokes instead.)
  */
class ScaleInvarianceSpec extends SparkTestBase {

  private val src = "/root/testdata/sf0.001"
  private val Factor = 3

  private lazy val (scaledDir, step) = {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val dir = Files.createTempDirectory("graft-scale3").toString
    ScaleData.scaleDocuments(docs, Factor)
      .write.parquet(s"$dir/documents.parquet")
    (dir, ScaleData.stepFor(docs, "doc_id"))
  }

  /** Map an original output id into replica r's id space (fixture-
    * injected ids above BatchIdOffset shift within their band).
    */
  private def mapId(id: Long, r: Int): Long = {
    val off = graft.queries.DedupQueries.BatchIdOffset
    if (id >= off) id - off + r * step + off else id + r * step
  }

  private def run(name: String, dir: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  private def assertEquivariant(name: String, idCols: Seq[String]): Unit = {
    val cols = run(name, src).columns.toSeq
    val idIdx = idCols.map(cols.indexOf)
    assert(idIdx.forall(_ >= 0), s"$name lacks id cols $idCols in $cols")
    val orig = run(name, src).collect().map(_.toSeq).toSeq
    val expected = (0 until Factor).flatMap { r =>
      orig.map(_.zipWithIndex.map {
        case (v: Long, i) if idIdx.contains(i) => mapId(v, r)
        case (v, _) => v
      })
    }
    val actual = run(name, scaledDir).collect().map(_.toSeq).toSeq
    assert(actual.size == expected.size,
      s"$name: ${actual.size} rows at ${Factor}x vs ${expected.size} expected")
    assertSameMultiset(actual, expected,
      s"$name output is not the per-replica shift of the original")
  }

  /** True multiset equality: size + toSet misses multiplicity swaps
    * (expected A,A,B vs actual A,B,B passes both), so compare per-row
    * occurrence counts.
    */
  private def assertSameMultiset(actual: Seq[Seq[Any]], expected: Seq[Seq[Any]],
                                 msg: String): Unit = {
    val a = actual.groupBy(identity).view.mapValues(_.size).toMap
    val e = expected.groupBy(identity).view.mapValues(_.size).toMap
    assert(a == e, msg)
  }

  test("d05 exact-dedup apply is exactly equivariant under 3x replication") {
    assertEquivariant("d05_dedup_apply", Seq("doc_id"))
  }

  test("d06 n-gram Jaccard pairs are exactly equivariant under 3x replication") {
    assertEquivariant("d06_ngram_jaccard", Seq("doc_a", "doc_b"))
  }

  test("d17 substring-dedup spans are exactly equivariant under 3x replication") {
    // rolling-shingle inventory + islands is deterministic-complete like
    // d01/d06/d13; replica token bijection preserves positions, so spans
    // must replicate with doc ids shifted (chimera ids = source + offset
    // shift by the same step; mapId's >=offset band covers them)
    assertEquivariant("d17_substring_dedup", Seq("doc_id"))
  }

  test("d13 chunk dedup is exactly equivariant under 3x replication") {
    assertEquivariant("d13_chunk_dedup", Seq("doc_id"))
  }

  test("d21 substring-apply ledger is exactly equivariant under 3x replication") {
    // same deterministic-complete inventory as d17; MIN-ownership is
    // order-stable under the per-band id shift (shifts preserve order
    // within and across bands), so drop/retain ledgers replicate exactly
    assertEquivariant("d21_substring_apply", Seq("doc_id"))
  }

  test("t21 chunk structure is exactly equivariant under 3x replication") {
    // the replica token bijection preserves per-doc token COUNTS, so
    // chunk ids/offsets/lengths must replicate exactly; chunk_fp is
    // content-derived and changes under the bijection (by design), so
    // the structural columns are compared without it
    val orig = run("t21_rag_chunks", src).drop("chunk_fp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val expected = (0 until Factor).flatMap(r => orig.map {
      case (id, cid, ts, n) => (mapId(id, r), cid, ts, n)
    })
    val actual = run("t21_rag_chunks", scaledDir).drop("chunk_fp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assertSameMultiset(actual.map(t => Seq[Any](t._1, t._2, t._3, t._4)),
      expected.map(t => Seq[Any](t._1, t._2, t._3, t._4)),
      "t21 chunk structure is not the per-replica shift of the original")
  }

  test("d04 embedding pairs are exactly equivariant under rotation replication") {
    // below EmbMaxCell the in-cell candidate set is exact all-pairs
    // (deterministic-complete), and a dimension rotation is an isometry
    // that COMMUTES with floor quantization, so the verified pairs —
    // cosines included — must replicate bit-exactly. The fixture's own
    // dup pairs are identical vectors (for which even a float-level
    // isometry would suffice), so inject a TRUE near-dup — one component
    // nudged, quantizing differently from its twin — to make the
    // bit-exactness claim non-vacuous.
    import org.apache.spark.sql.functions.{col, lit, max, transform, when}
    val base = spark.read.parquet(s"$src/embeddings.parquet")
    val twinId = base.agg(max(col("vec_id"))).head().getLong(0) + 1
    val nudged = base.where(col("vec_id") === 1L).select(
      lit(twinId).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, x + lit(0.0117f)).otherwise(x)).as("embedding"),
      col("label"))
    val emb = base.unionByName(nudged)
    val oneDir = Files.createTempDirectory("graft-scale1e").toString
    emb.write.parquet(s"$oneDir/embeddings.parquet")
    val dir = Files.createTempDirectory("graft-scale3e").toString
    ScaleData.scaleEmbeddings(emb, Factor).write.parquet(s"$dir/embeddings.parquet")
    val estep = ScaleData.stepFor(emb, "vec_id")
    def emap(id: Long, r: Int): Long = {
      val off = graft.queries.DedupQueries.BatchIdOffset
      if (id >= off) id - off + r * estep + off else id + r * estep
    }
    val orig = run("d04_embedding_neardup", oneDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    assert(orig.exists(p => Set(p._1, p._2).contains(twinId)),
      "the nudged twin produced no near-dup pair — the bit-exactness claim is untested")
    val expected = (0 until Factor).flatMap(r => orig.map {
      case (a, b, l, c) => (emap(a, r), emap(b, r), l, c)
    }).toSet
    val actual = run("d04_embedding_neardup", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(actual == expected,
      s"d04 pairs drifted under isometric replication (${actual.size} vs ${expected.size})")
  }

  // --- event family: user-shift equivariance under ScaleData.scaleEvents ---

  private lazy val (evDir, evUserStep, evIdStep) = {
    val ev = Tables.events(spark, src)
    val dir = Files.createTempDirectory("graft-scale3ev").toString
    ScaleData.scaleEvents(ev, Factor).write.parquet(s"$dir/events.parquet")
    (dir, ScaleData.stepFor(ev, "user_id"), ScaleData.stepFor(ev, "event_id"))
  }

  /** Expected N-fold output: original rows with the named id columns
    * shifted per replica (user ids by the user step, event ids by the
    * event step); null ids stay null (e05's unmatched as-of rows).
    */
  private def shiftedEvents(name: String, userCols: Set[String],
                            eventCols: Set[String]): (Seq[Seq[Any]], Seq[Seq[Any]]) = {
    val cols = run(name, src).columns.toSeq
    val orig = run(name, src).collect().map(_.toSeq).toSeq
    val expected = (0 until Factor).flatMap { r =>
      orig.map(_.zipWithIndex.map {
        case (v: Long, i) if userCols(cols(i))  => v + r * evUserStep
        case (v: Long, i) if eventCols(cols(i)) => v + r * evIdStep
        case (v, _) => v
      })
    }
    (expected, run(name, evDir).collect().map(_.toSeq).toSeq)
  }

  test("e03 sessionization is exactly equivariant under 3x user replication") {
    val (expected, actual) = shiftedEvents("e03_sessionize", Set("user_id"), Set.empty)
    assertSameMultiset(actual, expected,
      s"e03 sessions drifted under replication (${actual.size} vs ${expected.size})")
    assert(actual.nonEmpty, "e03 returned no rows — vacuous equivariance")
  }

  test("e05 as-of join is exactly equivariant under 3x user replication") {
    val (expected, actual) = shiftedEvents("e05_asof_join",
      Set("user_id"), Set("p_id", "c_id"))
    assertSameMultiset(actual, expected,
      s"e05 as-of pairs drifted under replication (${actual.size} vs ${expected.size})")
    assert(actual.nonEmpty, "e05 returned no rows — vacuous equivariance")
  }

  test("e11 burst flags are invariant and counts scale by exactly N under replication") {
    // replication multiplies every hourly count AND every trailing sum by
    // N, so the integer comparison n*24 > 2*prev_sum is scale-free: the
    // flagged hours must be IDENTICAL, with n and prev_sum exactly N x
    val key = (r: org.apache.spark.sql.Row) => r.getTimestamp(0)
    val orig = run("e11_burst_detect", src).collect()
      .map(r => key(r) -> (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getBoolean(3))).toMap
    val scaled = run("e11_burst_detect", evDir).collect()
      .map(r => key(r) -> (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getBoolean(3))).toMap
    assert(scaled.keySet == orig.keySet, "hourly grid drifted under replication")
    val bad = orig.collect {
      case (h, (n, ps, b)) if scaled(h) != ((n * Factor,
        if (ps < 0) -1L else ps * Factor, b)) => (h, (n, ps, b), scaled(h))
    }
    assert(bad.isEmpty, s"burst series not exactly ${Factor}x-equivariant: ${bad.take(3)}")
    assert(orig.values.exists(_._3), "no burst flagged — vacuous invariance")
  }

  test("e06 cohort retention counts scale by exactly N under user replication") {
    // users are disjoint across replicas with identical activity patterns,
    // so every (cohort_day, day_offset) cell's distinct-user count is
    // exactly N x the original — the aggregate form of equivariance
    val key = (r: org.apache.spark.sql.Row) => (r.getString(0), r.getLong(1))
    val orig = run("e06_cohort_retention", src).collect()
      .map(r => key(r) -> r.getLong(2)).toMap
    val scaled = run("e06_cohort_retention", evDir).collect()
      .map(r => key(r) -> r.getLong(2)).toMap
    assert(scaled.keySet == orig.keySet, "retention matrix cells drifted")
    val bad = orig.collect {
      case (k, n) if scaled(k) != n * Factor => (k, n, scaled(k))
    }
    assert(bad.isEmpty, s"cells not exactly ${Factor}x: ${bad.take(5)}")
  }

  test("d01 exact-dedup groups: keepers and copy counts replicate exactly") {
    // fp is the md5 of the (suffixed) text, so it differs per replica —
    // compare the (keeper, n_copies) multiset instead of full rows
    val orig = run("d01_dedup_exact", src).collect()
      .map(r => (r.getAs[Long]("keeper"), r.getAs[Long]("n_copies"))).toSeq
    val expected = (0 until Factor).flatMap(r => orig.map {
      case (k, n) => (mapId(k, r), n)
    }).groupBy(identity).view.mapValues(_.size).toMap
    val actual = run("d01_dedup_exact", scaledDir).collect()
      .map(r => (r.getAs[Long]("keeper"), r.getAs[Long]("n_copies"))).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(actual == expected, "d01 keeper/copy structure drifted under replication")
  }

  test("t22 global shuffle is bucket-count invariant: forced finer bucketing leaves every shard identical") {
    // the bucket prefix only decides WHERE each row is sorted — the
    // composed global rank must be identical at any prefix width, so the
    // data-driven sizing knob can never move the answer
    import graft.queries.TextQueries.ShuffleCharsKey
    def shards(chars: Int, dir: String): Seq[Seq[Any]] = {
      spark.conf.set(ShuffleCharsKey, chars.toString)
      try run("t22_shuffle_shards", dir).collect().map(_.toSeq).toSeq
      finally spark.conf.unset(ShuffleCharsKey)
    }
    val coarse = shards(1, src)   // 16 buckets
    val fine = shards(3, src)     // 4096 buckets (most hold 0-1 rows)
    assert(coarse.nonEmpty && coarse == fine,
      "t22 shards drifted under a different bucket count")
    // ... and the derived width actually responds to corpus size
    import graft.queries.TextQueries.{shuffleBucketChars, ShuffleBucketTarget}
    assert(shuffleBucketChars(spark, 1000L) == 1)
    assert(shuffleBucketChars(spark, ShuffleBucketTarget * 16 + 16) == 2)
    assert(shuffleBucketChars(spark, Long.MaxValue) == 8)
  }
}
