package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.{JdbcUpsert, UpsertConnectionFactory, UpsertOutcome, UpsertRow}

/** Epoch ledger for exactly-once micro-batch application: Structured
  * Streaming's foreachBatch is AT-LEAST-once — after a crash between the
  * batch function and the checkpoint commit, the same (streamId, epochId)
  * replays. The ledger records committed epochs so a replay skips the
  * side-effecting write instead of re-applying it. A production
  * deployment backs it with a table next to the target (committed epoch
  * ids are tiny); [[InMemoryEpochLedger]] is the single-JVM form.
  */
trait EpochLedger extends Serializable {
  /** Has this (stream, epoch) fully applied already? */
  def committed(streamId: String, epochId: Long): Boolean
  /** Record (stream, epoch) as fully applied. */
  def commit(streamId: String, epochId: Long): Unit
}

/** JVM-local ledger (tests / single-process deployments). */
final class InMemoryEpochLedger extends EpochLedger {
  private val done = ConcurrentHashMap.newKeySet[String]()
  override def committed(streamId: String, epochId: Long): Boolean =
    done.contains(s"$streamId|$epochId")
  override def commit(streamId: String, epochId: Long): Unit =
    done.add(s"$streamId|$epochId")
}

/** Streaming twin of the K1 keyed-upsert sink: an unbounded change-set
  * stream drains into [[JdbcUpsert.write]] one micro-batch at a time via
  * foreachBatch — the same per-partition connection + prepared-statement
  * reuse, affected-rows validation, and K4 continue-on-error outcomes as
  * the batch sink (one sink implementation, two execution modes; the
  * reference's one-shot `main` has no streaming at all, main.go:241-322).
  *
  * `onOutcomes` receives each micro-batch's outcome rows (audit/error
  * channels) together with the batch id. [[writeStreamExactlyOnce]] adds
  * replay protection: each epoch applies once, recorded in an
  * [[EpochLedger]]; a replayed micro-batch is skipped entirely. (The
  * UPDATE itself is idempotent — same values, same key — so even the
  * crash window between apply and ledger commit degrades to a harmless
  * re-write, never a double-apply of effects.)
  */
object UpsertStreams {

  def writeStream(cs: Dataset[UpsertRow], factory: UpsertConnectionFactory,
                  dryRun: Boolean = false, debug: Boolean = false)
                 (onOutcomes: (Dataset[UpsertOutcome], Long) => Unit)
      : DataStreamWriter[UpsertRow] =
    cs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[UpsertRow], batchId: Long) =>
        onOutcomes(JdbcUpsert.write(batch, factory, dryRun, debug), batchId)
      }

  /** One epoch's application, replay-safe: skip if the ledger already has
    * it; otherwise execute the upserts EXACTLY once (persist + count — so
    * a consumer re-reading the outcome rows never re-runs the
    * side-effecting mapPartitions), hand the materialized outcomes to the
    * caller, then commit the epoch. Returns false for a skipped replay.
    */
  def applyEpoch(batch: Dataset[UpsertRow], epochId: Long,
                 factory: UpsertConnectionFactory, ledger: EpochLedger,
                 streamId: String, dryRun: Boolean = false,
                 debug: Boolean = false)
                (onOutcomes: (Dataset[UpsertOutcome], Long) => Unit): Boolean =
    if (ledger.committed(streamId, epochId)) false
    else {
      val out = JdbcUpsert.write(batch, factory, dryRun, debug).persist()
      try {
        out.count() // the one execution of the side-effecting write
        onOutcomes(out, epochId)
      } finally out.unpersist()
      ledger.commit(streamId, epochId)
      true
    }

  /** [[writeStream]] with epoch-id replay protection through `ledger`. */
  def writeStreamExactlyOnce(cs: Dataset[UpsertRow],
                             factory: UpsertConnectionFactory,
                             ledger: EpochLedger, streamId: String,
                             dryRun: Boolean = false, debug: Boolean = false)
                            (onOutcomes: (Dataset[UpsertOutcome], Long) => Unit)
      : DataStreamWriter[UpsertRow] =
    cs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[UpsertRow], batchId: Long) =>
        applyEpoch(batch, batchId, factory, ledger, streamId, dryRun, debug)(onOutcomes)
        () // discard: foreachBatch wants Unit
      }
}
