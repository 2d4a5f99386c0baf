package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.{JdbcUpsert, UpsertConnectionFactory, UpsertOutcome, UpsertRow}

/** Streaming twin of the K1 keyed-upsert sink: an unbounded change-set
  * stream drains into [[JdbcUpsert.write]] one micro-batch at a time via
  * foreachBatch — the same per-partition connection + prepared-statement
  * reuse, affected-rows validation, and K4 continue-on-error outcomes as
  * the batch sink (one sink implementation, two execution modes; the
  * reference's one-shot `main` has no streaming at all, main.go:241-322).
  *
  * `onOutcomes` receives each micro-batch's outcome rows (audit/error
  * channels) together with the batch id — foreachBatch gives exactly-once
  * batch ids, so a production caller can make the upsert idempotent by
  * recording them; the UPDATE itself is naturally idempotent (same values,
  * same key).
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
}
