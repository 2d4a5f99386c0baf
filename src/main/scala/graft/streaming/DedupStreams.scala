package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.GraftNative
import graft.functions.DedupFns
import graft.queries.DedupQueries

/** Streaming MinHash-LSH near-duplicate DETECTION — the streaming twin of
  * the batch d02 pipeline: each incoming doc is shingled, minhashed, and
  * banded with the exact same expressions as the batch query; the stream
  * is then keyed by LSH bucket (band index + band key) and a tiny per-
  * bucket state — the first doc that claimed the bucket — turns every
  * later arrival into a candidate pair. Candidates are exactly the pairs
  * the batch bucket self-join would produce against all previously seen
  * docs, emitted incrementally.
  *
  * Scale notes: state is ONE long per occupied bucket (not the docs
  * themselves), keyed uniformly by hash — the shape that holds at
  * 100 TB/day ingest; in a real deployment the ValueState carries a TTL
  * (dedup horizon) so buckets evict, and candidates flow into an exact
  * Jaccard verification join against a doc store (batch d02's verify
  * stage) — verification needs the texts, which deliberately do NOT ride
  * the banded stream (9x amplification).
  */
object DedupStreams {

  final case class Doc(doc_id: Long, text: String)
  final case class BandHit(bucket: String, doc_id: Long)
  final case class DupCand(doc_id: Long, dup_of: Long, bucket: String)

  /** Per-bucket claim state: first doc_id wins; later docs emit
    * candidates against it. Within a micro-batch, rows are folded in
    * doc_id order so emission is deterministic under shuffle.
    */
  final class LshBucketProcessor
      extends StatefulProcessor[String, BandHit, DupCand] {

    @transient private var first: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      first = getHandle.getValueState[Long]("first", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(bucket: String, rows: Iterator[BandHit],
                                 timerValues: TimerValues): Iterator[DupCand] = {
      val sorted = rows.toSeq.sortBy(_.doc_id)
      var claimant = if (first.exists()) Some(first.get()) else None
      val out = Seq.newBuilder[DupCand]
      sorted.foreach { r =>
        claimant match {
          case None => claimant = Some(r.doc_id)
          case Some(f) if r.doc_id != f => out += DupCand(r.doc_id, f, bucket)
          case _ => ()
        }
      }
      claimant.foreach(first.update)
      out.result().iterator
    }
  }

  /** The banded stream: doc -> (bucket, doc_id) rows, one per LSH band,
    * with the batch d02 expressions (native shingles + minhash).
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
    */
  def nearDupCandidates(spark: SparkSession, docs: Dataset[Doc]): Dataset[DupCand] = {
    import spark.implicits._
    bandHits(spark, docs)
      .groupByKey(_.bucket)
      .transformWithState(new LshBucketProcessor, TimeMode.None(), OutputMode.Append())
  }
}
