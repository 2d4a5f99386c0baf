package graft.streaming

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
import graft.GraftNative
import graft.functions.DedupFns
import graft.queries.DedupQueries

/** Streaming MinHash-LSH near-duplicate detection + verification — the
  * streaming twin of the batch d02 pipeline. Each incoming doc is
  * shingled, minhashed, and banded with the exact same expressions as the
  * batch query; the stream is keyed by LSH bucket (band index + band key)
  * and a bounded per-bucket list of previously seen doc ids turns every
  * arrival into candidate pairs against ALL earlier same-bucket docs —
  * exactly the pairs the batch bucket self-join produces, emitted
  * incrementally. Candidates then flow through [[verifyPairs]], the exact
  * Jaccard verification join against a doc store (batch d02's verify
  * stage), wired per micro-batch by [[verifiedNearDups]].
  *
  * Scale notes: state is a doc-id list per occupied bucket, keyed
  * uniformly by hash and CAPPED at [[MaxBucketDocs]] — an overflowing
  * bucket means template boilerplate (the same pathology d06's df cap
  * prunes), and capping it bounds both state size and pair fan-out to
  * cap² per bucket. The second bound is the dedup HORIZON: set
  * [[DedupTtlKey]] to a duration and every bucket entry evicts that long
  * after it was written (state-store native TTL, processing-time mode),
  * so an unbounded stream holds only the horizon's docs in state —
  * unset, state grows with the key space (the test default, matching
  * batch d02's whole-corpus semantics). Verification needs the shingle
  * sets, which
  * deliberately do NOT ride the banded stream (9x amplification) — they
  * come from the doc-store table the batch pipeline maintains (the
  * written shingle stage).
  */
object DedupStreams {

  final case class Doc(doc_id: Long, text: String)
  final case class BandHit(bucket: String, doc_id: Long)
  final case class DupCand(doc_id: Long, dup_of: Long, bucket: String)

  /** Per-bucket pair fan-out / state cap: buckets that accumulate more
    * docs than this stop emitting (and remembering) — at that occupancy
    * the bucket is boilerplate, not near-duplication, and its all-pairs
    * output would be quadratic. Batch d02 has no cap (its fixtures are
    * tiny); the streaming operator must bound state growth up front.
    */
  val MaxBucketDocs = 64

  /** Session conf key for the dedup-state TTL — a Spark duration string
    * ("30m", "24h"). Unset or empty = no eviction, state grows with the
    * occupied-bucket space.
    */
  val DedupTtlKey = "spark.graft.dedupTtl"

  /** The configured dedup horizon as a [[TTLConfig]]. */
  private def ttlOf(spark: SparkSession): TTLConfig =
    spark.conf.getOption(DedupTtlKey).filter(_.nonEmpty)
      .map { v =>
        val ms = org.apache.spark.network.util.JavaUtils.timeStringAsMs(v)
        // fail at plan time with the conf key in hand, not at runtime
        // inside the state store with an internal-state-name error
        require(ms > 0,
          s"$DedupTtlKey must be a positive duration (got '$v'); unset it for no eviction")
        TTLConfig(java.time.Duration.ofMillis(ms))
      }
      .getOrElse(TTLConfig.NONE)

  /** Per-bucket seen-docs state: each newcomer emits a candidate pair
    * against every doc already in the bucket, then joins it — so the
    * emitted pairs are precisely the batch bucket self-join's pairs,
    * arriving incrementally. Within a micro-batch, rows fold in doc_id
    * order so emission is deterministic under shuffle. With a TTL, each
    * list entry evicts `ttl` after it was appended (per-entry, not
    * per-bucket: a hot bucket keeps its recent docs while stale ones
    * age out), after which the doc no longer pairs and a re-arrival is
    * re-admitted as new.
    */
  final class LshBucketProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, BandHit, DupCand] {

    @transient private var seen: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[Long]("seen", Encoders.scalaLong, ttl)

    override def handleInputRows(bucket: String, rows: Iterator[BandHit],
                                 timerValues: TimerValues): Iterator[DupCand] = {
      val earlier = mutable.ArrayBuffer[Long](seen.get().toSeq: _*)
      val out = Seq.newBuilder[DupCand]
      rows.toSeq.sortBy(_.doc_id).foreach { r =>
        if (!earlier.contains(r.doc_id) && earlier.size < MaxBucketDocs) {
          earlier.foreach(f => out += DupCand(r.doc_id, f, bucket))
          earlier += r.doc_id
          seen.appendValue(r.doc_id)
        }
      }
      out.result().iterator
    }
  }

  /** The banded stream: doc -> (bucket, doc_id) rows, one per LSH band,
    * with the batch d02 expressions (native shingles + minhash). Works on
    * batch Datasets too — the batch twin in tests goes through the same
    * code.
    */
  def bandHits(spark: SparkSession, docs: Dataset[Doc]): Dataset[BandHit] = {
    import spark.implicits._
    GraftNative.ensure(spark)
    docs.select(col("doc_id"), posexplode(DedupFns.bandKeys(
        GraftNative.minhashSignature(
          GraftNative.shingles(DedupFns.normText(col("text"))),
          DedupQueries.Bands * DedupQueries.RowsPerBand),
        DedupQueries.Bands, DedupQueries.RowsPerBand)).as(Seq("band", "key")))
      .select(concat(col("band"), lit("|"), col("key")).as("bucket"), col("doc_id"))
      .as[BandHit]
  }

  /** Candidate near-dup pairs, incrementally, over an unbounded doc
    * stream.
    *
    * Pacing note: with a TTL configured the query runs in processing-time
    * mode, where Spark schedules micro-batches continuously to advance
    * the state clock even when no data is waiting. A deployment should
    * pace the writer with `Trigger.ProcessingTime(...)` so idle periods
    * do not busy-loop empty batches (and `processAllAvailable()` — a
    * test-only API — never latches in this mode; poll `lastProgress`
    * instead, as StreamingSpec does).
    */
  def nearDupCandidates(spark: SparkSession, docs: Dataset[Doc]): Dataset[DupCand] = {
    import spark.implicits._
    // state TTL rides processing time, so the time mode follows the conf
    val ttl = ttlOf(spark)
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    bandHits(spark, docs)
      .groupByKey(_.bucket)
      .transformWithState(new LshBucketProcessor(ttl), timeMode, OutputMode.Append())
  }

  /** A shingled doc store from a (doc_id, text) frame — the shape the
    * batch pipeline's written shingle stage persists; verification joins
    * against it by doc_id.
    */
  def shingleStore(docs: DataFrame): DataFrame = {
    GraftNative.ensure(docs.sparkSession)
    docs.select(col("doc_id"),
      GraftNative.shingles(DedupFns.normText(col("text"))).as("sh"))
  }

  /** Batch d02's verify stage applied to a (micro-)batch of candidates:
    * normalize pairs to (doc_a < doc_b), dedup across bands, join both
    * sides against the doc store's shingle sets, keep pairs with exact
    * Jaccard >= `threshold`.
    */
  def verifyPairs(cands: DataFrame, docStore: DataFrame,
                  threshold: Double): DataFrame = {
    val pairs = cands.select(
        least(col("doc_id"), col("dup_of")).as("doc_a"),
        greatest(col("doc_id"), col("dup_of")).as("doc_b"))
      .distinct()
    pairs
      .join(docStore.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(docStore.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("jaccard", GraftNative.jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** The full streaming near-dup pipeline: detection (transformWithState
    * candidates) + per-micro-batch verification against `docStore`.
    * `sink` receives each micro-batch's VERIFIED pairs — call `.start()`
    * on the returned writer (foreachBatch is the documented pattern for
    * joining a stream against batch tables that Structured Streaming's
    * stream-static join can't re-read per batch with arbitrary
    * post-aggregation).
    */
  def verifiedNearDups(spark: SparkSession, docs: Dataset[Doc], docStore: DataFrame,
                       threshold: Double = 0.5)(sink: (DataFrame, Long) => Unit)
      : DataStreamWriter[DupCand] =
    nearDupCandidates(spark, docs).writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[DupCand], batchId: Long) =>
        sink(verifyPairs(batch.toDF(), docStore, threshold), batchId)
      }
}
