package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.GraftNative
import graft.functions.VectorFns
import graft.queries.SimilarityQueries

/** Streaming ANN ingest with incremental index maintenance — the
  * streaming twin of the batch v10 query: new vectors arrive as a stream,
  * each micro-batch PROBES the written bucket index (d14's asymmetric
  * admission-control shape: the corpus index is never re-signed and never
  * self-joined) and is then APPENDED to the index, so later arrivals
  * retrieve earlier ones without any rebuild.
  *
  * foreachBatch is the documented pattern here (as in
  * [[DedupStreams.verifiedNearDups]]): a stream-static join snapshots the
  * static side once per query, but an index that GROWS with the stream
  * must be re-read per micro-batch — exactly what foreachBatch's batch
  * context provides. The index lives as parquet under `indexDir` (on a
  * cluster: distributed storage), append-written through Spark's normal
  * committer; probing is a broadcast of the micro-batch into the index
  * scan plus the v-family's shared bounded top-k reduce.
  *
  * Within-batch pairs are intentionally NOT emitted (the probe runs
  * before the append, mirroring v10's batch-vs-corpus semantics);
  * a batch-internal self-join can be composed separately when needed.
  */
object AnnStreams {

  /** One incoming vector. */
  final case class Vec(vec_id: Long, embedding: Array[Float])

  /** Quantize + bucket vectors into index rows (vec_id, q, n2, bucket) —
    * the SAME expressions (integer quantization, fixed hyperplanes) as
    * the batch v-family, so streamed and batch-built index rows are
    * interchangeable.
    */
  def indexRows(vecs: DataFrame): DataFrame = {
    GraftNative.ensure(vecs.sparkSession)
    vecs.select(col("vec_id"), VectorFns.quantize(col("embedding")).as("q"))
      .withColumn("n2", GraftNative.longDot(col("q"), col("q")))
      .withColumn("bucket", SimilarityQueries.lshBucket(col("q")))
  }

  /** Probe `index` with `batch` (both in [[indexRows]] shape): bucket
    * equi-join, integer-quantized cosine, exact top-K per probe.
    */
  def probe(batch: DataFrame, index: DataFrame): DataFrame = {
    val probes = batch.select(col("vec_id").as("probe_id"),
      col("bucket").as("p_bucket"), col("q").as("p_q"), col("n2").as("p_n2"))
    SimilarityQueries.scoreAndRank(
      index.join(broadcast(probes), col("bucket") === col("p_bucket")))
  }

  /** The streaming pipeline: per micro-batch, probe the current index
    * under `indexDir`, hand the ranked matches to `sink`, then append the
    * batch's own index rows. Call `.start()` on the returned writer.
    */
  def incrementalAnn(spark: SparkSession, vecs: Dataset[Vec], indexDir: String)
                    (sink: (DataFrame, Long) => Unit): DataStreamWriter[Vec] =
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Vec], batchId: Long) =>
        val rows = indexRows(batch.toDF())
        sink(probe(rows, spark.read.parquet(indexDir)), batchId)
        rows.write.mode("append").parquet(indexDir)
      }

  /** Streaming ANN ingest against a catalog-NAMED index table — the
    * composition of [[incrementalAnn]] with the by-name snapshot surface,
    * the way [[CurationStreams.admitByName]] composed the dedup admission
    * (d31). The index lives as a snapshot table identity-PARTITIONED BY
    * its LSH `bucket` column, keyed on `vec_id`; each micro-batch of
    * (vec_id, embedding):
    *
    *  1. quantizes + buckets its vectors ([[indexRows]] — the SAME
    *     expressions as the batch v-family, so streamed and CTAS-built
    *     index rows are interchangeable);
    *  2. probes the COMMITTED index pruned to the batch's OWN cells —
    *     the `bucket IN (...)` predicate hits the identity partition
    *     tree at planning, so the per-epoch probe opens the matching
    *     `pt_bucket=` directories, never the index (the d14/d29
    *     admission-control asymmetry, in the vector family);
    *  3. writes the ranked matches deterministically per epoch
    *     (`matchesDir/epoch=N`, overwrite — crash-replay rewrites
    *     byte-identical output);
    *  4. commits the batch's rows insert-if-absent under the manifest
    *     txn-stamp protocol ([[SnapshotStreams.applyEpoch]] — a replayed
    *     epoch skips the commit).
    *
    * REPLAY STABILITY is why step 2 excludes index rows keyed by the
    * batch's own vec_ids: on crash-replay the epoch's rows are already
    * committed, and without the exclusion the replayed probe would see
    * them (self-matches the live run never saw) and write different
    * matches than the run it is replaying. With it, the probe's view is
    * "every row committed by EARLIER epochs" on both paths.
    */
  def ingestByName(vecs: DataFrame, indexTable: String, streamId: String,
      matchesDir: String): DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.operators.{Merge, SnapshotLog}
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val s = batch.sparkSession
        val dir = CurationStreams.tableDirOf(s, indexTable)
        val rows = indexRows(batch)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val cells = rows.select("bucket").distinct()
            .collect().map(_.getString(0)).toSeq
          val v = SnapshotLog.latestVersion(s, dir)
          val idx = SnapshotLog.read(s, dir, v)
            .where(col("bucket").isin(cells: _*))
            .join(rows.select("vec_id"), Seq("vec_id"), "left_anti")
          probe(rows, idx)
            .write.mode("overwrite").parquet(s"$matchesDir/epoch=$epochId")
          val cs = rows.select(lit(Merge.OpInsert).as("op"), col("vec_id"),
            col("q"), col("n2"), col("bucket"))
          SnapshotLog.commitWithRetry() {
            SnapshotStreams.applyEpoch(s, dir, cs, epochId, streamId, "vec_id")
          }
          ()
        } finally { rows.unpersist(blocking = false); () }
      }
  }
}
