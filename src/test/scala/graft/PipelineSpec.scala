package graft

/** p01 composition semantics: the ledger is monotone, every stage
  * actually fires, and the quality stage agrees exactly with t03's
  * certified keep rule.
  */
class PipelineSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val ledger: Map[String, (Long, Long, Long, Long, Long)] =
    SparkEntry.queries("p01_curation_pipeline")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

  test("survivorship is monotone and packing only counts survivors") {
    assert(ledger.nonEmpty)
    ledger.foreach { case (src, (nIn, nQ, nU, nSeq, toks)) =>
      assert(nIn >= nQ && nQ >= nU, s"$src: ledger not monotone ($nIn, $nQ, $nU)")
      assert((nU == 0) == (nSeq == 0), s"$src: sequences without survivors")
      assert(nU == 0 || toks > 0, s"$src: survivors but zero tokens")
    }
  }

  test("every stage fires somewhere: filter, dedup both drop rows") {
    val (nIn, nQ, nU) = (ledger.values.map(_._1).sum,
      ledger.values.map(_._2).sum, ledger.values.map(_._3).sum)
    assert(nQ < nIn, "quality gate dropped nothing — threshold vacuous")
    assert(nU < nQ, "dedup dropped nothing — corpus dup fixture vacuous")
  }

  test("the quality stage equals t03's certified keep counts per source") {
    import org.apache.spark.sql.functions._
    val t03 = SparkEntry.queries("t03_quality_filter")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // p01 runs on the copy-injected corpus: its quality survivors are
    // t03's keepers plus the keepers among the injected %10 copies
    GraftNative.ensure(spark)
    val q10 = graft.functions.TextFns.qualityScore10From(
      GraftNative.textStats(col("text")), col("text"))
    val copyKeep = Tables.documents(spark, sfDir)
      .where(col("doc_id") % 10 === 0 && q10 >= graft.queries.PipelineQueries.QualityMin)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    ledger.foreach { case (src, (_, nQ, _, _, _)) =>
      val expected = t03(src) + copyKeep.getOrElse(src, 0L)
      assert(expected == nQ, s"$src: p01 n_quality $nQ != t03+copies $expected")
    }
  }

  // p02: the incremental-admission ledger. Columns:
  // (source, n_batch, n_gated, n_dup_corpus, n_dup_batch, n_admitted,
  //  n_sequences, sum_tokens)
  private lazy val p02: Map[String, (Long, Long, Long, Long, Long, Long, Long)] =
    SparkEntry.queries("p02_incremental_curation")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap

  test("p02: every gated doc lands in exactly one admission bucket") {
    assert(p02.nonEmpty)
    p02.foreach { case (src, (nB, nG, dupC, dupB, adm, nSeq, toks)) =>
      assert(nB >= nG, s"$src: gated more than arrived")
      assert(nG == dupC + dupB + adm,
        s"$src: admission buckets don't partition the gated set " +
          s"($nG != $dupC + $dupB + $adm)")
      assert((adm == 0) == (nSeq == 0), s"$src: sequences without admits")
      assert(adm == 0 || toks > 0, s"$src: admits but zero tokens")
    }
  }

  test("p02: all three admission outcomes fire somewhere") {
    assert(p02.values.map(_._3).sum > 0, "no corpus-dup ever dropped")
    assert(p02.values.map(_._4).sum > 0, "no within-batch dup ever dropped")
    assert(p02.values.map(_._5).sum > 0, "nothing ever admitted")
  }

  test("p02: each admitted v2 doc has exactly its one batch twin dropped") {
    // The fixture ships every fresh-content doc twice (at +2*off and
    // +3*off with identical text); first-id-wins must admit exactly one
    // and drop exactly one PER PAIR — so per source the two counts match.
    p02.foreach { case (src, (_, _, _, dupB, adm, _, _)) =>
      assert(dupB == adm,
        s"$src: batch-dup count $dupB != admitted count $adm — " +
          "first-id-wins is not pairing the duplicated variants")
    }
  }

  test("p02: the corpus-dup bucket equals the gated exact-copy arm") {
    // Exact copies of gated corpus docs (the +off arm) must ALL be caught
    // by the written-index anti-join — none admitted, none batch-dup.
    import org.apache.spark.sql.functions._
    GraftNative.ensure(spark)
    val q10 = graft.functions.TextFns.qualityScore10From(
      GraftNative.textStats(col("text")), col("text"))
    val gatedCopies = Tables.documents(spark, sfDir)
      .where(col("doc_id") % 10 === 0 && q10 >= graft.queries.PipelineQueries.QualityMin)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    p02.foreach { case (src, (_, _, dupC, _, _, _, _)) =>
      assert(gatedCopies.getOrElse(src, 0L) == dupC,
        s"$src: corpus-dup $dupC != gated exact copies ${gatedCopies.getOrElse(src, 0L)}")
    }
  }

  // p03: (source, avail, weight, quota, n_kept, kept_id_sum)
  private lazy val p03: Seq[(String, Long, Long, Long, Long, Long)] =
    SparkEntry.queries("p03_mixture_recipe")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq

  test("p03: quotas re-derive from availability and weights, and fill exactly") {
    assert(p03.nonEmpty)
    val tw = p03.map(_._3).sum
    val nMax = p03.map { case (_, avail, w, _, _, _) => avail * tw / w }.min
    p03.foreach { case (src, avail, w, quota, nKept, _) =>
      assert(quota == w * nMax / tw,
        s"$src: quota $quota != floor($w * $nMax / $tw)")
      assert(quota <= avail, s"$src: quota exceeds availability")
      assert(nKept == quota, s"$src: selection under-filled ($nKept of $quota)")
    }
  }

  test("p03: the recipe is maximal — one more unit overruns a source") {
    val tw = p03.map(_._3).sum
    val nMax = p03.map { case (_, avail, w, _, _, _) => avail * tw / w }.min
    // real-valued mixture constraint w*N/W <= avail: violated at N+1 for
    // the binding source (this is exactly what the min construction says)
    assert(p03.exists { case (_, avail, w, _, _, _) => w * (nMax + 1) > avail * tw },
      "N_max + 1 still fits every source's real-valued share — min not binding")
    // and the binding source's integer quota is within 1 of exhausting it
    // (floor(w*N/W) > avail - w/W >= avail - 1)
    assert(p03.exists { case (_, avail, _, quota, _, _) => avail - quota <= 1 },
      "no source near-exhausted — either vacuous or the min is wrong")
  }

  test("p03: weights are non-uniform so the mixture actually reshapes") {
    assert(p03.map(_._3).distinct.size > 1,
      "all sources got the same weight — the recipe is a no-op rescale")
  }

  test("p04: admitted rows grow the pool and every quota still fills exactly") {
    val p04 = SparkEntry.queries("p04_incremental_recipe")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(p04.nonEmpty && p04.map(_._1).toSet == p03.map(_._1).toSet)
    val availBySrc = p03.map(t => t._1 -> t._2).toMap
    assert(p04.exists { case (src, avail, _, _, _, _) => avail > availBySrc(src) },
      "no source grew — the admitted batch is vacuous for the recipe")
    val tw = p04.map(_._3).sum
    val nMax = p04.map { case (_, avail, w, _, _, _) => avail * tw / w }.min
    p04.foreach { case (src, avail, w, quota, nKept, _) =>
      assert(quota == w * nMax / tw, s"$src: quota $quota != floor($w * $nMax / $tw)")
      assert(quota <= avail && nKept == quota, s"$src: selection under-filled")
    }
  }

  test("p04: the per-ingest plan never re-ranks the corpus (no Window operator)") {
    // build the standing rank stage first (it may legitimately window once)
    SparkEntry.queries("p04_incremental_recipe")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    // the steady-state ingest plan reads the WRITTEN rank stage: union
    // ranks are pure arithmetic over it, so no Window node may appear
    val plan = SparkEntry.queries("p04_incremental_recipe")(spark, sfDir)
      .queryExecution.sparkPlan
    def ops(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      p.nodeName +: (p.children ++ p.subqueries).flatMap(ops)
    val windows = ops(plan).filter(_.toLowerCase.contains("window"))
    assert(windows.isEmpty,
      s"incremental recipe re-ranks (found $windows) — the written rank stage is not load-bearing")
  }
}
