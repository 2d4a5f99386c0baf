package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftshim.CatalystBridge
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration
import graft.operators.SnapshotLog

/** DSv2 STREAMING_WRITE into a snapshot-log table — what makes
  * `df.writeStream.toTable("graft.t")` work, carrying the SAME
  * exactly-once transaction-stamp protocol the foreachBatch helpers use
  * ([[SnapshotStreams.applyEpoch]]: the epoch id rides inside the
  * manifest as `txn=<queryId>/<epochId>`, and commit = one atomic
  * exclusive manifest create, so the dedup record and the data commit
  * cannot diverge).
  *
  * The write is the standard two-phase DSv2 shape:
  *
  *  1. EXECUTORS stage the epoch's rows as parquet files under a
  *     `.stage-stream-*` scratch directory inside the table (one file
  *     per task, written through Spark's own [[ParquetFileFormat]]
  *     writer factory — identical bytes-on-disk path to a normal
  *     df.write). Staged files are invisible by construction: no
  *     manifest references them, and a crashed epoch's scratch is
  *     reclaimed by [[SnapshotLog.vacuum]]'s existing `.stage-*` sweep.
  *  2. The DRIVER's `commit(epochId, messages)` re-reads the staged
  *     rows and applies them as an all-`insert` changeset through
  *     [[SnapshotLog.merge]] with the txn stamp — INSERT-IF-ABSENT on
  *     the table key, exactly `INSERT INTO graft.t`'s batch semantics
  *     and exactly what the foreachBatch path commits, so the two
  *     ingest surfaces are semantically one. A replayed epoch (restart
  *     from checkpoint) finds its stamp and skips; a lost version race
  *     re-plans via [[SnapshotLog.commitWithRetry]].
  *
  * The merge re-clusters the staged rows into key-ordered (or
  * partitioned) files, so the stream pays a double write per epoch —
  * the price of landing micro-batches in the table's QUERYABLE layout
  * instead of as an append-only row heap. At 100 TB ingest that is the
  * right trade: reads dominate writes, and the alternative (blind file
  * append) would abandon key clustering, file skipping and
  * insert-if-absent semantics all at once.
  */
final class SnapshotStreamingWrite(dir: String, key: String,
    schema: StructType, queryId: String) extends StreamingWrite {

  private def spark = SparkSession.active

  override def useCommitCoordinator(): Boolean = false

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val s = spark
    val job = Job.getInstance(s.sparkContext.hadoopConfiguration)
    val factory = new ParquetFileFormat().prepareWrite(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      job, Map.empty, schema)
    val scratch = new Path(dir,
      s".stage-stream-${java.util.UUID.randomUUID().toString.take(8)}").toString
    new SnapshotEpochWriterFactory(factory, schema, scratch,
      CatalystBridge.serializableConf(job.getConfiguration))
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val s = spark
    val staged = messages.collect {
      case StagedEpochFile(path) if path != null => path
    }.toSeq
    val scratches = staged.map(p => new Path(p).getParent).distinct
    try {
      if (staged.nonEmpty &&
          !SnapshotStreams.epochCommitted(s, dir, queryId, epochId)) {
        val rows = s.read.schema(schema).parquet(staged: _*)
        val cs = rows.select(lit("insert").as("op") +:
          rows.columns.map(org.apache.spark.sql.functions.col).toSeq: _*)
        SnapshotLog.commitWithRetry() {
          SnapshotStreams.applyEpoch(s, dir, cs, epochId, queryId, key)
        }
      }
    } finally {
      val hconf = s.sparkContext.hadoopConfiguration
      scratches.foreach { p =>
        val hfs = p.getFileSystem(hconf)
        hfs.delete(p, true)
        // the epoch dirs' outer .stage-stream-* scratch, once drained
        val outer = p.getParent
        try {
          if (outer != null && outer.getName.startsWith(".stage-stream-") &&
              hfs.exists(outer) && hfs.listStatus(outer).isEmpty)
            hfs.delete(outer, true)
        } catch { case _: java.io.IOException => () } // racing epoch: keep
      }
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val s = spark
    val hconf = s.sparkContext.hadoopConfiguration
    messages.collect {
      case StagedEpochFile(path) if path != null => new Path(path).getParent
    }.distinct.foreach(p => p.getFileSystem(hconf).delete(p, true))
  }
}

/** One staged parquet file's path, reported from a completed task. */
private[streaming] final case class StagedEpochFile(path: String)
    extends WriterCommitMessage

private[streaming] final class SnapshotEpochWriterFactory(
    factory: OutputWriterFactory, schema: StructType, scratchDir: String,
    conf: SerializableConfiguration) extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var writer: org.apache.spark.sql.execution.datasources.OutputWriter = _
      private var path: String = _

      private def ensureOpen(): Unit = if (writer == null) {
        val hconf = CatalystBridge.confOf(conf)
        // epoch-keyed subdirectory: commit(epochId) reclaims the staged
        // files' PARENT, so overlapping epochs (Trigger.Continuous keeps
        // one factory for the whole query) must never share one — epoch
        // N's commit must not delete epoch N+1's in-flight files
        path = new Path(new Path(scratchDir, s"epoch-$epochId"),
          f"part-$partitionId%05d-$taskId-$epochId${factory.getFileExtension(
            new TaskAttemptContextImpl(hconf,
              new TaskAttemptID("graft-stream", 0, TaskType.MAP, partitionId, 0)))}")
          .toString
        val tac = new TaskAttemptContextImpl(hconf,
          new TaskAttemptID("graft-stream", 0, TaskType.MAP, partitionId, 0))
        writer = factory.newInstance(path, schema, tac)
      }

      override def write(record: InternalRow): Unit = {
        ensureOpen()
        writer.write(record)
      }

      override def commit(): WriterCommitMessage = {
        if (writer == null) return StagedEpochFile(null) // empty task
        writer.close()
        StagedEpochFile(path)
      }

      override def abort(): Unit = {
        if (writer != null) {
          writer.close()
          new Path(path).getFileSystem(CatalystBridge.confOf(conf))
            .delete(new Path(path), false)
        }
      }

      override def close(): Unit = ()
    }
}
