package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.GraftNative
import graft.functions.TextFns
import graft.queries.{PipelineQueries, TextQueries}

/** Streaming twin of the p01 curation pipeline: documents stream in,
  * the map-only quality gate + PII scrub run per micro-batch with the
  * EXACT batch expressions, and exact dedup keeps the first-arriving
  * copy of each redacted fingerprint via keyed state — so a corpus
  * replayed in id order yields precisely p01's survivor set
  * (first-seen == lowest id), asserted row-for-row by
  * CurationStreamsSpec.
  *
  * Scale notes: the gate/scrub stages are stateless per-row expressions
  * (no shuffle, arbitrary parallelism); the dedup state is ONE long per
  * distinct fingerprint, keyed uniformly by md5 — the smallest possible
  * exact-dedup state — and evictable via TTL exactly like
  * [[DedupStreams]]' horizon when the deployment wants
  * dedup-within-a-window semantics rather than all-history.
  */
object CurationStreams {

  final case class SrcDoc(doc_id: Long, source: String, text: String)

  /** A curation survivor: kept doc + its post-scrub token count (the
    * packer's input, carried so downstream needs no re-tokenize).
    */
  final case class Kept(doc_id: Long, source: String, ws_tokens: Long)

  /** Internal keyed shape between the scrub stage and the dedup state. */
  final case class FpDoc(fp: String, doc_id: Long, source: String, ws_tokens: Long)

  /** Stages 1+2, exactly p01's expressions: PII-inject fixture, gate on
    * the RAW text, scrub the survivors. Works on batch frames too (the
    * parity test routes the batch twin through this same code).
    */
  def gateAndScrub(spark: SparkSession, docs: Dataset[SrcDoc]): DataFrame = {
    GraftNative.ensure(spark)
    val itext = when(col("doc_id") % 25 === 0,
      concat(col("text"), lit(s" ${TextQueries.PiiSuffix}"))).otherwise(col("text"))
    val q10 = TextFns.qualityScore10From(GraftNative.textStats(col("text")), col("text"))
    docs.toDF()
      .where(q10 >= PipelineQueries.QualityMin)
      .select(col("doc_id"), col("source"),
        TextQueries.redactedCol(itext).as("rtext"))
  }

  /** First-arrival-wins exact dedup keyed by fingerprint: state is one
    * long (the keeper id) per fp. Within a micro-batch rows fold in
    * doc_id order, so emission is deterministic under shuffle and an
    * id-ordered replay reproduces batch p01's MIN-id keeper rule.
    */
  final class KeeperProcessor extends StatefulProcessor[String, FpDoc, Kept] {
    @transient private var keeper: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      keeper = getHandle.getValueState[Long]("keeper",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(fp: String, rows: Iterator[FpDoc],
                                 timerValues: TimerValues): Iterator[Kept] = {
      if (keeper.exists()) { rows.foreach(_ => ()); Iterator.empty }
      else {
        val first = rows.minBy(_.doc_id)
        keeper.update(first.doc_id)
        Iterator.single(Kept(first.doc_id, first.source, first.ws_tokens))
      }
    }
  }

  /** The full streaming pipeline: gate -> scrub -> fingerprint -> keyed
    * first-wins dedup. Emits the curation survivors incrementally.
    */
  def curationSurvivors(spark: SparkSession, docs: Dataset[SrcDoc]): Dataset[Kept] = {
    import spark.implicits._
    fingerprinted(spark, docs)
      .groupByKey(_.fp)
      .transformWithState(new KeeperProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** gate -> scrub -> fingerprint, shared by [[curationSurvivors]] and
    * [[admittedDocs]].
    */
  private def fingerprinted(spark: SparkSession, docs: Dataset[SrcDoc]): Dataset[FpDoc] = {
    import spark.implicits._
    gateAndScrub(spark, docs)
      .select(
        TextFns.fingerprint(col("rtext")).as("fp"),
        col("doc_id"), col("source"),
        GraftNative.textStats(col("rtext")).getField("ws_tokens").as("ws_tokens"))
      .as[FpDoc]
  }

  /** Streaming twin of p02's incremental admission: ingest docs stream
    * in, and a doc is admitted only if (1) its redacted fingerprint is
    * absent from the ALREADY-CURATED corpus's written fingerprint index
    * — a stream-static left-anti join, re-planned per micro-batch
    * against the static side, exactly the broadcast/bucketed anti-join
    * the batch query runs — and (2) it is the first arrival of its
    * fingerprint within the stream (the same one-long-per-fp keyed
    * state as [[curationSurvivors]]). The corpus is never re-gated,
    * re-scrubbed, or re-fingerprinted per ingest; `corpusFp` is scanned
    * as data arrives, which is the production shape where the index is
    * a bucketed table the stream side co-partitions with.
    */
  def admittedDocs(spark: SparkSession, docs: Dataset[SrcDoc],
      corpusFp: DataFrame): Dataset[Kept] = {
    import spark.implicits._
    fingerprinted(spark, docs)
      .join(corpusFp.select(col("fp")), Seq("fp"), "left_anti")
      .as[FpDoc]
      .groupByKey(_.fp)
      .transformWithState(new KeeperProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Resolve a `graft.ns.t` identifier to its snapshot-table directory
    * through the registered catalog — admission by NAME, not by path.
    */
  private[streaming] def tableDirOf(spark: SparkSession, table: String): String = {
    val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(table)
    val catalog = spark.sessionState.catalogManager.catalog(parts.head)
    require(catalog.isInstanceOf[graft.sql.GraftTableCatalog],
      s"${parts.head} is not a graft snapshot catalog")
    catalog.asInstanceOf[graft.sql.GraftTableCatalog].tableDir(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        parts.tail.dropRight(1).toArray, parts.last))
  }

  /** Streaming dedup ADMISSION against a catalog-NAMED fingerprint index
    * — d29's MERGE-as-admission driven by a stream, the composition of
    * the by-name streaming surface with the dedup family. Each
    * micro-batch of (doc_id, fp) rows folds to one keeper candidate per
    * fingerprint and commits insert-if-absent into the index under the
    * manifest txn-stamp protocol ([[SnapshotStreams.applyEpoch]] —
    * exactly-once across checkpoint restarts, version races re-planned);
    * the per-doc outcome — `admitted`, or `duplicate` with its keeper —
    * is then (re)written to `outcomeDir/epoch=<id>` from a join against
    * the post-commit index. The outcome write is DETERMINISTIC and
    * epoch-keyed (overwrite), so a crash-replayed epoch recomputes
    * byte-identical outcomes whether or not its merge had committed:
    * keepers are immutable once admitted (later epochs only ever add
    * NEW fingerprints), which is what makes the two-sink shape
    * (index + outcomes) safe without a second ledger.
    */
  def admitByName(docs: DataFrame, indexTable: String, streamId: String,
      outcomeDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.operators.{Merge, SnapshotLog}
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val s = batch.sparkSession
        val dir = tableDirOf(s, indexTable)
        val cs = batch.groupBy("fp").agg(min(col("doc_id")).as("keeper"))
          .select(lit(Merge.OpInsert).as("op"), col("fp"), col("keeper"))
        SnapshotLog.commitWithRetry() {
          SnapshotStreams.applyEpoch(s, dir, cs, epochId, streamId, "fp")
        }
        // outcome via the PRUNED point lookup, not a full index scan: the
        // epoch's fingerprints open only their range/bucket/Bloom
        // footprint of the index — per-epoch cost stays batch-sized on a
        // 100 TB index
        val v = SnapshotLog.latestVersion(s, dir)
        batch.join(
          SnapshotLog.lookupKeys(s, dir, v, batch.select("fp").distinct()),
          Seq("fp"))
          .select(col("doc_id"),
            when(col("keeper") === col("doc_id"), lit("admitted"))
              .otherwise(lit("duplicate")).as("status"),
            col("keeper"))
          .write.mode("overwrite").parquet(s"$outcomeDir/epoch=$epochId")
        ()
      }
  }
}
