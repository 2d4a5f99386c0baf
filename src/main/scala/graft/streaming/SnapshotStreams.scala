package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.{SnapshotCommit, SnapshotLog}

/** Streaming CDC into the manifest-committed snapshot table — m12's
  * continuous twin, with a twist the other streaming sinks can't offer:
  * THE TRANSACTION LOG IS THE EPOCH LEDGER. [[MergeStreams]] needs a
  * separate [[EpochLedger]] because its JDBC statements leave no
  * replay-detectable trace; here every commit is already an atomic,
  * exclusive manifest create, so the epoch stamp rides INSIDE the
  * manifest as commit metadata (`txn=<streamId>/<epochId>`) and replay
  * detection is one scan of the committed manifests. No second system to
  * keep consistent with the first — the commit and its dedup record are
  * the same atomic file create (the transaction-marker idea lakehouse
  * logs use for idempotent streaming writes).
  *
  * Failure window analysis (contrast [[MergeStreams.applyEpoch]]'s
  * forced commit-before-deliver ordering): there is NO window here. The
  * data files staged before a crashed commit are invisible-by-
  * construction (no manifest references them; [[SnapshotLog.vacuum]]
  * reclaims), and a replayed epoch either finds its txn stamp (skip) or
  * re-stages and commits fresh files — never a double apply, because the
  * stamp and the data commit are one atomic create.
  */
object SnapshotStreams {

  /** True iff some committed version carries this stream's epoch stamp. */
  def epochCommitted(spark: SparkSession, tableDir: String, streamId: String,
      epochId: Long): Boolean = {
    val stamp = s"txn=$streamId/$epochId"
    SnapshotLog.versions(spark, tableDir)
      .exists(v => SnapshotLog.manifestMeta(spark, tableDir, v).contains(stamp))
  }

  /** One epoch's changeset applied copy-on-write, replay-safe: skipped
    * (None) when the epoch's stamp is already in the log, otherwise
    * committed as the next version with the stamp in its manifest.
    * Single-writer-per-table discipline is the stream's contract; a
    * racing writer surfaces as [[graft.operators.ConcurrentCommitException]]
    * (re-plan, don't retry blindly).
    */
  def applyEpoch(spark: SparkSession, tableDir: String, batch: DataFrame,
      epochId: Long, streamId: String, key: String): Option[SnapshotCommit] =
    if (epochCommitted(spark, tableDir, streamId, epochId)) None
    else Some(SnapshotLog.merge(spark, tableDir, batch, key,
      meta = Seq(s"txn=$streamId/$epochId")))

  /** The stream sink: each micro-batch of changeset rows ([[
    * graft.operators.Merge]]'s op + key + payload contract) commits one
    * snapshot version through [[applyEpoch]]'s stamp seam; `onCommit`
    * sees every non-replayed epoch's commit report.
    */
  def writeStreamExactlyOnce(cs: DataFrame, tableDir: String,
      streamId: String, key: String)
      (onCommit: (SnapshotCommit, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    cs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyEpoch(batch.sparkSession, tableDir, batch, batchId, streamId, key)
          .foreach(c => onCommit(c, batchId))
        () // discard: foreachBatch wants Unit
      }
}
