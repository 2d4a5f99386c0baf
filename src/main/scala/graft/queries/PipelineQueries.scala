package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftNative, Q, Tables}
import graft.functions.TextFns
import graft.operators.Stage

/** End-to-end corpus curation — the composed pipeline every stage of this
  * engine exists to feed, certified as ONE query: quality gate → PII
  * scrub → exact dedup (keep the lowest-id copy of each redacted
  * fingerprint) → sequence packing, with a per-source survivorship ledger
  * at every stage. Each stage is the already-certified operator (t03's
  * quality rule, t13's fixed-order redaction, d01's keeper rule, t07's
  * exclusive running-sum packing) — p01 certifies their COMPOSITION,
  * where stage-ordering bugs (scrubbing before fingerprinting, packing
  * pre-dedup survivors) would hide from the per-operator oracles.
  *
  * Scale shape: quality + scrub are map-only over one scan; the scrubbed
  * survivors are a WRITTEN stage (the corpus edit a production run
  * persists) consumed by both the dedup aggregate and the packer; dedup
  * is one uniform-key fingerprint aggregate + a key-partitioned
  * semi-join; packing is t07's single shuffle-by-source window; the
  * ledger is a |sources|-row join of four tiny aggregates.
  */
object PipelineQueries {

  /** Quality floor (t03's keep rule). */
  val QualityMin = 7

  /** p02's ingest-batch fixture (corpus-dups + fresh variants + batch-
    * internal dups), shared verbatim by p04's incremental recipe.
    */
  private def ingestBatch(raw: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val off = DedupQueries.BatchIdOffset
    raw.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + off).as("doc_id"), col("source"), col("text"))
      .unionByName(raw.where(col("doc_id") % 15 === 0)
        .select((col("doc_id") + 2 * off).as("doc_id"), col("source"),
          concat(col("text"), lit(" fresh snapshot v2")).as("text")))
      .unionByName(raw.where(col("doc_id") % 15 === 0)
        .select((col("doc_id") + 3 * off).as("doc_id"), col("source"),
          concat(col("text"), lit(" fresh snapshot v2")).as("text")))
  }

  /** p02's batch admission (gate → scrub → fingerprint → drop corpus
    * fingerprints → first-id-wins), returning the admitted (doc_id,
    * source) — the ingest half p04 composes with the recipe math. Scans
    * only the batch plus ONE anti-join against the written corpus
    * fingerprint index (the memoized `p02_corpus_fp` stage, shared with
    * p02 itself).
    */
  private def admittedBatch(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val raw = Tables.documents(s, d).select("doc_id", "source", "text")
    def itextOf = when(col("doc_id") % 25 === 0,
      concat(col("text"), lit(s" ${TextQueries.PiiSuffix}"))).otherwise(col("text"))
    def q10 = TextFns.qualityScore10From(GraftNative.textStats(col("text")), col("text"))
    val corpusFp = Stage.sharedTable(s, "p02_corpus_fp", d) {
      raw.where(q10 >= QualityMin)
        .select(TextFns.fingerprint(TextQueries.redactedCol(itextOf)).as("fp"))
        .distinct()
    }
    val gated = ingestBatch(raw).where(q10 >= QualityMin)
      .select(col("doc_id"), col("source"),
        TextFns.fingerprint(TextQueries.redactedCol(itextOf)).as("fp"))
    val newFp = gated.join(corpusFp, Seq("fp"), "left_anti")
    val keepers = newFp.groupBy("fp").agg(min("doc_id").as("doc_id")).select("doc_id")
    newFp.join(keepers, Seq("doc_id"), "left_semi").select("doc_id", "source")
  }

  val entries: Seq[Q] = Seq(
    Q("p01_curation_pipeline",
      s"""WITH base AS (
         |  SELECT doc_id, source, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + ${DedupQueries.BatchIdOffset} AS doc_id, source, text
         |  FROM documents WHERE doc_id % 10 = 0
         |),
         |inj AS (
         |  SELECT doc_id, source, text,
         |         CASE WHEN doc_id % 25 = 0
         |              THEN text || ' ${TextQueries.PiiSuffix}'
         |              ELSE text END AS itext
         |  FROM base
         |),
         |qual AS (
         |  SELECT doc_id, source, itext FROM inj
         |  WHERE ${TextQueries.quality10SqlOf("text")} >= $QualityMin
         |),
         |scrub AS (
         |  SELECT doc_id, source, ${TextQueries.redactedSqlOf("itext")} AS rtext
         |  FROM qual
         |),
         |fp AS (
         |  SELECT doc_id, source, rtext,
         |         md5(${TextQueries.normSqlOf("rtext")}) AS fp
         |  FROM scrub
         |),
         |keep AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY fp),
         |uniq AS (SELECT f.doc_id, f.source, f.rtext FROM fp f JOIN keep k ON f.doc_id = k.doc_id),
         |tok AS (
         |  SELECT doc_id, source,
         |         CAST(${TextQueries.wsTokSqlOf("rtext")} AS BIGINT) AS ws
         |  FROM uniq
         |),
         |pk AS (
         |  SELECT source, doc_id, ws,
         |         SUM(ws) OVER (PARTITION BY source ORDER BY doc_id
         |                       ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM tok
         |),
         |seqs AS (
         |  SELECT source, CAST(floor((cum - ws) / ${TextQueries.PackBudget}.0) AS BIGINT) AS seq_id, ws
         |  FROM pk
         |),
         |a_in AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_in FROM inj GROUP BY source),
         |a_q AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_quality FROM qual GROUP BY source),
         |a_u AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_unique FROM uniq GROUP BY source),
         |a_p AS (SELECT source, CAST(COUNT(DISTINCT seq_id) AS BIGINT) AS n_sequences,
         |               CAST(SUM(ws) AS BIGINT) AS sum_tokens
         |        FROM seqs GROUP BY source)
         |SELECT i.source, i.n_in,
         |       COALESCE(q.n_quality, 0) AS n_quality,
         |       COALESCE(u.n_unique, 0) AS n_unique,
         |       COALESCE(p.n_sequences, 0) AS n_sequences,
         |       COALESCE(p.sum_tokens, 0) AS sum_tokens
         |FROM a_in i
         |LEFT JOIN a_q q ON q.source = i.source
         |LEFT JOIN a_u u ON u.source = i.source
         |LEFT JOIN a_p p ON p.source = i.source
         |ORDER BY i.source""".stripMargin) { (s, d) =>
      GraftNative.ensure(s)
      // the d-family's exact-copy fixture corpus (copies of every 10th
      // doc at id+offset), so the dedup stage is non-vacuous: the raw
      // corpus's injected near-dups differ by a token and survive exact
      // fingerprinting
      val raw = Tables.documents(s, d).select("doc_id", "source", "text")
      val docs = raw.unionByName(
        raw.where(col("doc_id") % 10 === 0)
          .select((col("doc_id") + DedupQueries.BatchIdOffset).as("doc_id"),
            col("source"), col("text")))
      val itext = when(col("doc_id") % 25 === 0,
        concat(col("text"), lit(s" ${TextQueries.PiiSuffix}"))).otherwise(col("text"))
      val q10 = TextFns.qualityScore10From(GraftNative.textStats(col("text")), col("text"))
      // stages 1+2 fused map-only: gate on the RAW text, scrub the gated
      val scrubbed = Stage.table(
        docs.where(q10 >= QualityMin)
          .select(col("doc_id"), col("source"),
            TextQueries.redactedCol(itext).as("rtext")),
        "p01_scrubbed")
      // stage 3: exact dedup on the REDACTED fingerprint (post-scrub ids
      // collide where raw ones would not — the ordering p01 certifies)
      val withFp = scrubbed.withColumn("fp", TextFns.fingerprint(col("rtext")))
      val keepers = withFp.groupBy("fp").agg(min("doc_id").as("doc_id")).select("doc_id")
      val uniq = withFp.join(keepers, Seq("doc_id"), "left_semi")
      // stage 4: t07's packing over the survivors
      val tok = uniq.select(col("doc_id"), col("source"),
        GraftNative.textStats(col("rtext")).getField("ws_tokens").as("ws"))
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val seqs = tok.withColumn("cum", sum("ws").over(w))
        .select(col("source"),
          floor((col("cum") - col("ws")) / lit(TextQueries.PackBudget.toDouble)).as("seq_id"),
          col("ws"))
      val aIn = docs.groupBy("source").agg(count(lit(1)).as("n_in"))
      val aQ = scrubbed.groupBy("source").agg(count(lit(1)).as("n_quality"))
      val aU = uniq.groupBy("source").agg(count(lit(1)).as("n_unique"))
      val aP = seqs.groupBy("source")
        .agg(countDistinct("seq_id").as("n_sequences"), sum("ws").as("sum_tokens"))
      aIn.join(aQ, Seq("source"), "left")
        .join(aU, Seq("source"), "left")
        .join(aP, Seq("source"), "left")
        .select(col("source"), col("n_in"),
          coalesce(col("n_quality"), lit(0L)).as("n_quality"),
          coalesce(col("n_unique"), lit(0L)).as("n_unique"),
          coalesce(col("n_sequences"), lit(0L)).as("n_sequences"),
          coalesce(col("sum_tokens"), lit(0L)).as("sum_tokens"))
        .orderBy("source")
    },

    // INCREMENTAL curation admission (p02) — p01 run as a production
    // pipeline actually runs: the corpus is ALREADY curated and its
    // redacted-fingerprint index is a WRITTEN stage; an ingest batch
    // flows gate → scrub → fingerprint → two-level admission (drop
    // fingerprints the corpus already holds, then first-id-wins within
    // the batch) → pack ONLY the admitted docs into the next training
    // shard. The corpus is never re-gated, re-scrubbed or re-packed per
    // ingest — the pipeline-level analogue of d14's asymmetric probe.
    // Fixture exercises all three admission outcomes: exact copies of
    // every 10th doc (corpus-dups), a 'fresh snapshot v2' variant of
    // every 15th doc (admitted — new content), and a second copy of each
    // variant at a higher id (batch-internal dups; first id wins).
    // Scale shape: batch-side stages are map-only over the (small) batch
    // scan; the corpus-dup check is ONE fp-keyed anti-join against the
    // written index (bucketed by fp in production, so it co-locates);
    // within-batch dedup is a batch-sized aggregate; packing shuffles
    // only admitted rows. Ledger identity n_gated = n_dup_corpus +
    // n_dup_batch + n_admitted is pinned in PipelineSpec.
    Q("p02_incremental_curation", {
      val off = DedupQueries.BatchIdOffset
      s"""WITH cinj AS (
         |  SELECT doc_id, source, text,
         |         CASE WHEN doc_id % 25 = 0
         |              THEN text || ' ${TextQueries.PiiSuffix}'
         |              ELSE text END AS itext
         |  FROM documents
         |),
         |cfp AS (
         |  SELECT DISTINCT md5(${TextQueries.normSqlOf(TextQueries.redactedSqlOf("itext"))}) AS fp
         |  FROM cinj WHERE ${TextQueries.quality10SqlOf("text")} >= $QualityMin
         |),
         |batch AS (
         |  SELECT doc_id + $off AS doc_id, source, text
         |  FROM documents WHERE doc_id % 10 = 0
         |  UNION ALL
         |  SELECT doc_id + ${2 * off}, source, text || ' fresh snapshot v2'
         |  FROM documents WHERE doc_id % 15 = 0
         |  UNION ALL
         |  SELECT doc_id + ${3 * off}, source, text || ' fresh snapshot v2'
         |  FROM documents WHERE doc_id % 15 = 0
         |),
         |binj AS (
         |  SELECT doc_id, source, text,
         |         CASE WHEN doc_id % 25 = 0
         |              THEN text || ' ${TextQueries.PiiSuffix}'
         |              ELSE text END AS itext
         |  FROM batch
         |),
         |bq AS (
         |  SELECT doc_id, source, ${TextQueries.redactedSqlOf("itext")} AS rtext
         |  FROM binj WHERE ${TextQueries.quality10SqlOf("text")} >= $QualityMin
         |),
         |bfp AS (
         |  SELECT doc_id, source, rtext, md5(${TextQueries.normSqlOf("rtext")}) AS fp
         |  FROM bq
         |),
         |newfp AS (SELECT * FROM bfp WHERE fp NOT IN (SELECT fp FROM cfp)),
         |keep AS (SELECT MIN(doc_id) AS doc_id FROM newfp GROUP BY fp),
         |adm AS (SELECT n.doc_id, n.source, n.rtext FROM newfp n JOIN keep k ON n.doc_id = k.doc_id),
         |tok AS (
         |  SELECT doc_id, source,
         |         CAST(${TextQueries.wsTokSqlOf("rtext")} AS BIGINT) AS ws
         |  FROM adm
         |),
         |pk AS (
         |  SELECT source, doc_id, ws,
         |         SUM(ws) OVER (PARTITION BY source ORDER BY doc_id
         |                       ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM tok
         |),
         |seqs AS (
         |  SELECT source, CAST(floor((cum - ws) / ${TextQueries.PackBudget}.0) AS BIGINT) AS seq_id, ws
         |  FROM pk
         |),
         |a_b AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_batch FROM batch GROUP BY source),
         |a_g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_gated FROM bq GROUP BY source),
         |a_n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_new FROM newfp GROUP BY source),
         |a_a AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_admitted FROM adm GROUP BY source),
         |a_p AS (SELECT source, CAST(COUNT(DISTINCT seq_id) AS BIGINT) AS n_sequences,
         |               CAST(SUM(ws) AS BIGINT) AS sum_tokens
         |        FROM seqs GROUP BY source)
         |SELECT b.source, b.n_batch,
         |       COALESCE(g.n_gated, 0) AS n_gated,
         |       COALESCE(g.n_gated, 0) - COALESCE(n.n_new, 0) AS n_dup_corpus,
         |       COALESCE(n.n_new, 0) - COALESCE(a.n_admitted, 0) AS n_dup_batch,
         |       COALESCE(a.n_admitted, 0) AS n_admitted,
         |       COALESCE(p.n_sequences, 0) AS n_sequences,
         |       COALESCE(p.sum_tokens, 0) AS sum_tokens
         |FROM a_b b
         |LEFT JOIN a_g g ON g.source = b.source
         |LEFT JOIN a_n n ON n.source = b.source
         |LEFT JOIN a_a a ON a.source = b.source
         |LEFT JOIN a_p p ON p.source = b.source
         |ORDER BY b.source""".stripMargin
    }) { (s, d) =>
      GraftNative.ensure(s)
      val off = DedupQueries.BatchIdOffset
      val raw = Tables.documents(s, d).select("doc_id", "source", "text")
      def itextOf = when(col("doc_id") % 25 === 0,
        concat(col("text"), lit(s" ${TextQueries.PiiSuffix}"))).otherwise(col("text"))
      def q10 = TextFns.qualityScore10From(GraftNative.textStats(col("text")), col("text"))
      // the already-curated corpus's fingerprint index — a memoized
      // WRITTEN stage (in production it pre-exists; repeated ingests
      // scan, never rebuild)
      val corpusFp = Stage.sharedTable(s, "p02_corpus_fp", d) {
        raw.where(q10 >= QualityMin)
          .select(TextFns.fingerprint(TextQueries.redactedCol(itextOf)).as("fp"))
          .distinct()
      }
      val batch = raw.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + off).as("doc_id"), col("source"), col("text"))
        .unionByName(raw.where(col("doc_id") % 15 === 0)
          .select((col("doc_id") + 2 * off).as("doc_id"), col("source"),
            concat(col("text"), lit(" fresh snapshot v2")).as("text")))
        .unionByName(raw.where(col("doc_id") % 15 === 0)
          .select((col("doc_id") + 3 * off).as("doc_id"), col("source"),
            concat(col("text"), lit(" fresh snapshot v2")).as("text")))
      // gate + scrub fused, map-only over the batch scan (p01's shape)
      val gated = Stage.table(
        batch.where(q10 >= QualityMin)
          .select(col("doc_id"), col("source"),
            TextQueries.redactedCol(itextOf).as("rtext")),
        "p02_gated")
      val bfp = gated.withColumn("fp", TextFns.fingerprint(col("rtext")))
      // admission level 1: the corpus already has it — one fp-keyed
      // anti-join against the written index
      val newFp = bfp.join(corpusFp, Seq("fp"), "left_anti")
      // admission level 2: first-id-wins within the batch (d01's keeper)
      val keepers = newFp.groupBy("fp").agg(min("doc_id").as("doc_id")).select("doc_id")
      val admitted = newFp.join(keepers, Seq("doc_id"), "left_semi")
      // pack only the admitted docs — the next training shard
      val tok = admitted.select(col("doc_id"), col("source"),
        GraftNative.textStats(col("rtext")).getField("ws_tokens").as("ws"))
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val seqs = tok.withColumn("cum", sum("ws").over(w))
        .select(col("source"),
          floor((col("cum") - col("ws")) / lit(TextQueries.PackBudget.toDouble)).as("seq_id"),
          col("ws"))
      val aB = batch.groupBy("source").agg(count(lit(1)).as("n_batch"))
      val aG = gated.groupBy("source").agg(count(lit(1)).as("n_gated"))
      val aN = newFp.groupBy("source").agg(count(lit(1)).as("n_new"))
      val aA = admitted.groupBy("source").agg(count(lit(1)).as("n_admitted"))
      val aP = seqs.groupBy("source")
        .agg(countDistinct("seq_id").as("n_sequences"), sum("ws").as("sum_tokens"))
      aB.join(aG, Seq("source"), "left")
        .join(aN, Seq("source"), "left")
        .join(aA, Seq("source"), "left")
        .join(aP, Seq("source"), "left")
        .select(col("source"), col("n_batch"),
          coalesce(col("n_gated"), lit(0L)).as("n_gated"),
          (coalesce(col("n_gated"), lit(0L)) - coalesce(col("n_new"), lit(0L)))
            .as("n_dup_corpus"),
          (coalesce(col("n_new"), lit(0L)) - coalesce(col("n_admitted"), lit(0L)))
            .as("n_dup_batch"),
          coalesce(col("n_admitted"), lit(0L)).as("n_admitted"),
          coalesce(col("n_sequences"), lit(0L)).as("n_sequences"),
          coalesce(col("sum_tokens"), lit(0L)).as("sum_tokens"))
        .orderBy("source")
    },

    // Mixture-targeted corpus recipe (p03) — the "data recipe" step after
    // curation: given per-source target weights, build the LARGEST corpus
    // whose composition matches the target exactly, from the gated pool.
    // N_max = min_s floor(avail_s * W / w_s) (the binding source runs
    // out first); quota_s = floor(w_s * N_max / W); the quota rows per
    // source are selected by deterministic md5 hash-rank (v12's sampler),
    // and kept_id_sum is the order-free checksum certifying WHICH rows.
    // Weights derive from the source-name hash (1..4) so the recipe is
    // data-independent and non-uniform. All arithmetic is integer
    // (BIGINT products, integral DIV) — hash-exact across engines.
    // Scale shape: avail/weights/quotas are |sources|-row aggregates
    // joined by broadcast; the only corpus-sized operations are the gate
    // scan and ONE rank shuffle partitioned by source. Exact per-source
    // rank cannot be bounded map-side when the quota is computed (not a
    // literal — contrast v12); a 100 TB deployment would two-phase it:
    // sample an approximate per-source hash threshold, then rank only
    // the boundary stratum. The certified semantics here are the spec
    // for that optimization.
    Q("p03_mixture_recipe",
      s"""WITH gated AS (
         |  SELECT doc_id, source FROM documents
         |  WHERE ${TextQueries.quality10SqlOf("text")} >= $QualityMin
         |),
         |avail AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS avail FROM gated GROUP BY source
         |),
         |w AS (
         |  SELECT source, avail,
         |         1 + CAST('0x' || substring(md5(source), 1, 7) AS BIGINT) % 4 AS weight
         |  FROM avail
         |),
         |tot AS (SELECT CAST(SUM(weight) AS BIGINT) AS tw FROM w),
         |nmax AS (SELECT CAST(MIN(avail * tw // weight) AS BIGINT) AS n
         |         FROM w CROSS JOIN tot),
         |quota AS (
         |  SELECT source, avail, weight, CAST(weight * n // tw AS BIGINT) AS quota
         |  FROM w CROSS JOIN tot CROSS JOIN nmax
         |),
         |r AS (
         |  SELECT source, doc_id,
         |         ROW_NUMBER() OVER (PARTITION BY source
         |                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
         |  FROM gated
         |)
         |SELECT q.source, q.avail, q.weight, q.quota,
         |       CAST(COUNT(r.doc_id) AS BIGINT) AS n_kept,
         |       CAST(COALESCE(SUM(r.doc_id), 0) AS BIGINT) AS kept_id_sum
         |FROM quota q LEFT JOIN r ON r.source = q.source AND r.rk <= q.quota
         |GROUP BY q.source, q.avail, q.weight, q.quota
         |ORDER BY q.source""".stripMargin) { (s, d) =>
      GraftNative.ensure(s)
      val q10 = TextFns.qualityScore10From(GraftNative.textStats(col("text")), col("text"))
      val gated = Tables.documents(s, d)
        .where(q10 >= QualityMin).select("doc_id", "source")
      val avail = gated.groupBy("source").agg(count(lit(1)).as("avail"))
      val wtab = avail.withColumn("weight",
        conv(substring(md5(col("source")), 1, 7), 16, 10).cast("long") % 4 + 1)
      val tot = wtab.agg(sum("weight").cast("long").as("tw")).withColumn("j", lit(1))
      val wt = wtab.withColumn("j", lit(1)).join(broadcast(tot), Seq("j"))
      val nmax = wt.agg(min(expr("avail * tw DIV weight")).as("n")).withColumn("j", lit(1))
      val quota = wt.join(broadcast(nmax), Seq("j"))
        .select(col("source"), col("avail"), col("weight"),
          expr("weight * n DIV tw").as("quota"))
      val rankW = Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      val kept = gated.withColumn("rk", row_number().over(rankW))
        .join(broadcast(quota.select("source", "quota")), Seq("source"))
        .where(col("rk") <= col("quota"))
      quota.join(
          kept.groupBy("source")
            .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("kept_id_sum")),
          Seq("source"), "left")
        .select(col("source"), col("avail"), col("weight"), col("quota"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("kept_id_sum"), lit(0L)).as("kept_id_sum"))
        .orderBy("source")
    },

    // INCREMENTAL mixture-recipe admission (p04) — p03 run the way
    // production re-balances as sources grow: an ingest batch flows
    // p02's admission (gate → scrub-fingerprint → corpus-index anti-join
    // → first-id-wins), and the recipe quotas update over corpus ∪
    // admitted WITHOUT RE-RANKING THE STANDING CORPUS. The standing
    // artifact is ONE written per-source hash-rank table of the gated
    // corpus (`p04_corpus_rank`, built once, memoized); per ingest, the
    // union rank of every pool doc is derived from it arithmetically:
    //   corpus doc:  union_rk = rk + |admitted in its source hashing
    //                below it| (a size(filter(...)) over the broadcast
    //                per-source admitted array — MAP-ONLY over the rank
    //                stage, no window, no sort);
    //   batch doc:   union_rk = |corpus docs hashing below it| (one
    //                broadcast fan-out over the rank stage scan with a
    //                map-side count) + |batch docs below it| + 1.
    // Selection is union_rk <= quota — exactly p03's hash-rank draw on
    // the union, certified by the oracle running FROM-SCRATCH p03 over
    // the union pool (d14/d24's incremental-equals-batch discipline).
    // PipelineSpec pins the physical claim: the per-ingest plan contains
    // NO Window operator once the rank stage exists.
    // Scale shape: the batch and every per-source aggregate broadcast;
    // the only corpus-sized work per ingest is scans of the written rank
    // stage (map-only filter + one map-side-aggregated fan-out, fan-out
    // bound = admitted-batch rows per source).
    Q("p04_incremental_recipe", {
      val off = DedupQueries.BatchIdOffset
      s"""WITH cinj AS (
         |  SELECT doc_id, source, text,
         |         CASE WHEN doc_id % 25 = 0
         |              THEN text || ' ${TextQueries.PiiSuffix}'
         |              ELSE text END AS itext
         |  FROM documents
         |),
         |cfp AS (
         |  SELECT DISTINCT md5(${TextQueries.normSqlOf(TextQueries.redactedSqlOf("itext"))}) AS fp
         |  FROM cinj WHERE ${TextQueries.quality10SqlOf("text")} >= $QualityMin
         |),
         |batch AS (
         |  SELECT doc_id + $off AS doc_id, source, text
         |  FROM documents WHERE doc_id % 10 = 0
         |  UNION ALL
         |  SELECT doc_id + ${2 * off}, source, text || ' fresh snapshot v2'
         |  FROM documents WHERE doc_id % 15 = 0
         |  UNION ALL
         |  SELECT doc_id + ${3 * off}, source, text || ' fresh snapshot v2'
         |  FROM documents WHERE doc_id % 15 = 0
         |),
         |binj AS (
         |  SELECT doc_id, source, text,
         |         CASE WHEN doc_id % 25 = 0
         |              THEN text || ' ${TextQueries.PiiSuffix}'
         |              ELSE text END AS itext
         |  FROM batch
         |),
         |bfp AS (
         |  SELECT doc_id, source, md5(${TextQueries.normSqlOf(TextQueries.redactedSqlOf("itext"))}) AS fp
         |  FROM binj WHERE ${TextQueries.quality10SqlOf("text")} >= $QualityMin
         |),
         |newfp AS (SELECT * FROM bfp WHERE fp NOT IN (SELECT fp FROM cfp)),
         |keep AS (SELECT MIN(doc_id) AS doc_id FROM newfp GROUP BY fp),
         |adm AS (SELECT n.doc_id, n.source FROM newfp n JOIN keep k ON n.doc_id = k.doc_id),
         |pool AS (
         |  SELECT doc_id, source FROM documents
         |  WHERE ${TextQueries.quality10SqlOf("text")} >= $QualityMin
         |  UNION ALL
         |  SELECT doc_id, source FROM adm
         |),
         |avail AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS avail FROM pool GROUP BY source
         |),
         |w AS (
         |  SELECT source, avail,
         |         1 + CAST('0x' || substring(md5(source), 1, 7) AS BIGINT) % 4 AS weight
         |  FROM avail
         |),
         |tot AS (SELECT CAST(SUM(weight) AS BIGINT) AS tw FROM w),
         |nmax AS (SELECT CAST(MIN(avail * tw // weight) AS BIGINT) AS n
         |         FROM w CROSS JOIN tot),
         |quota AS (
         |  SELECT source, avail, weight, CAST(weight * n // tw AS BIGINT) AS quota
         |  FROM w CROSS JOIN tot CROSS JOIN nmax
         |),
         |r AS (
         |  SELECT source, doc_id,
         |         ROW_NUMBER() OVER (PARTITION BY source
         |                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
         |  FROM pool
         |)
         |SELECT q.source, q.avail, q.weight, q.quota,
         |       CAST(COUNT(r.doc_id) AS BIGINT) AS n_kept,
         |       CAST(COALESCE(SUM(r.doc_id), 0) AS BIGINT) AS kept_id_sum
         |FROM quota q LEFT JOIN r ON r.source = q.source AND r.rk <= q.quota
         |GROUP BY q.source, q.avail, q.weight, q.quota
         |ORDER BY q.source""".stripMargin
    }) { (s, d) =>
      GraftNative.ensure(s)
      def q10 = TextFns.qualityScore10From(GraftNative.textStats(col("text")), col("text"))
      // the standing artifact: gated corpus hash-RANKED per source, ONCE
      val corpusRank = Stage.sharedTable(s, "p04_corpus_rank", d) {
        val rankW = Window.partitionBy("source")
          .orderBy(col("h"), col("doc_id"))
        Tables.documents(s, d).where(q10 >= QualityMin)
          .select(col("doc_id"), col("source"),
            md5(col("doc_id").cast("string")).as("h"))
          .withColumn("rk", row_number().over(rankW))
      }
      // the ingest: admitted batch rows, hashed; tiny by construction
      val adm = Stage.table(
        admittedBatch(s, d)
          .withColumn("h", md5(col("doc_id").cast("string"))),
        "p04_admitted")
      // per-source sorted admitted arrays (broadcast into the rank scan)
      val bArr = adm.groupBy("source")
        .agg(sort_array(collect_list(struct(col("h"), col("doc_id")))).as("barr"))
      // updated quotas from corpus counts + admitted deltas (all tiny;
      // full outer so a source whose corpus slice gated to zero still
      // counts its admitted rows)
      val avail = corpusRank.groupBy("source").agg(count(lit(1)).as("c_avail"))
        .join(adm.groupBy("source").agg(count(lit(1)).as("b_avail")), Seq("source"), "full")
        .select(col("source"),
          (coalesce(col("c_avail"), lit(0L)) + coalesce(col("b_avail"), lit(0L))).as("avail"))
      val wtab = avail.withColumn("weight",
        conv(substring(md5(col("source")), 1, 7), 16, 10).cast("long") % 4 + 1)
      val tot = wtab.agg(sum("weight").cast("long").as("tw")).withColumn("j", lit(1))
      val wt = wtab.withColumn("j", lit(1)).join(broadcast(tot), Seq("j"))
      val nmax = wt.agg(min(expr("avail * tw DIV weight")).as("n")).withColumn("j", lit(1))
      val quota = wt.join(broadcast(nmax), Seq("j"))
        .select(col("source"), col("avail"), col("weight"),
          expr("weight * n DIV tw").as("quota"))
      val quotaB = broadcast(quota.select("source", "quota"))
      // corpus keeps: written rank + a map-only shift past admitted rows
      def lexLt(xh: Column, xid: Column, h: Column, id: Column): Column =
        xh < h || (xh === h && xid < id)
      val corpusKept = corpusRank
        .join(broadcast(bArr), Seq("source"), "left")
        .withColumn("shift",
          when(col("barr").isNull, lit(0)).otherwise(size(filter(col("barr"),
            x => lexLt(x("h"), x("doc_id"), col("h"), col("doc_id"))))))
        .join(quotaB, Seq("source"))
        .where(col("rk") + col("shift") <= col("quota"))
        .select("source", "doc_id")
      // batch keeps: union position from one counted fan-out over the
      // rank stage (map-side partial agg) + the in-batch offset
      val cLt = corpusRank.join(broadcast(adm.select(col("source"),
          col("doc_id").as("b_id"), col("h").as("b_h"))), Seq("source"))
        .where(lexLt(col("h"), col("doc_id"), col("b_h"), col("b_id")))
        .groupBy(col("source").as("cl_source"), col("b_id"))
        .agg(count(lit(1)).as("c_lt"))
      val batchKept = adm
        .join(broadcast(bArr), Seq("source"))
        .withColumn("b_lt", size(filter(col("barr"),
          x => lexLt(x("h"), x("doc_id"), col("h"), col("doc_id")))))
        .join(broadcast(cLt), col("source") === col("cl_source") &&
          col("doc_id") === col("b_id"), "left")
        .select(col("source"), col("doc_id"),
          (coalesce(col("c_lt"), lit(0L)) + col("b_lt") + 1).as("union_rk"))
        .join(quotaB, Seq("source"))
        .where(col("union_rk") <= col("quota"))
        .select("source", "doc_id")
      quota.join(
          corpusKept.unionByName(batchKept).groupBy("source")
            .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("kept_id_sum")),
          Seq("source"), "left")
        .select(col("source"), col("avail"), col("weight"), col("quota"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("kept_id_sum"), lit(0L)).as("kept_id_sum"))
        .orderBy("source")
    }
  )
}
