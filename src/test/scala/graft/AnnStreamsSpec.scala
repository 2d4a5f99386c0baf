package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.AnnStreams
import graft.streaming.AnnStreams.Vec
import graft.queries.DedupQueries

/** Streaming ANN ingest: batch parity with the v10 oracle query, and the
  * incremental-index property (later arrivals retrieve earlier ones).
  */
class AnnStreamsSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("one-micro-batch stream reproduces v10's batch output exactly") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val indexDir = Files.createTempDirectory("graft-ann-index").toString + "/idx"
    AnnStreams.indexRows(emb).write.parquet(indexDir)

    val batch = emb.where(col("vec_id") % 50 === 0)
      .select((col("vec_id") + DedupQueries.BatchIdOffset).as("vec_id"), col("embedding"))
      .as[Vec].collect().toSeq
    assert(batch.nonEmpty, "no injected batch vectors — parity test vacuous")

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Double)]
    val ms = MemoryStream[Vec]
    ms.addData(batch)
    val q = AnnStreams.incrementalAnn(spark, ms.toDS(), indexDir) { (df, _) =>
      got ++= df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    }.start()
    try q.processAllAvailable() finally q.stop()

    val expected = SparkEntry.queries("v10_incremental_ann")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.nonEmpty && got.toSet == expected.toSet,
      s"streaming/batch divergence: ${got.size} streamed vs ${expected.length} batch rows")
  }

  test("index grows per micro-batch: later arrivals retrieve earlier ones") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val v = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.1f)
    val indexDir = Files.createTempDirectory("graft-ann-inc").toString + "/idx"
    AnnStreams.indexRows(Seq(Vec(1L, v)).toDF("vec_id", "embedding")).write.parquet(indexDir)

    val perBatch = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val ms = MemoryStream[Vec]
    val q = AnnStreams.incrementalAnn(spark, ms.toDS(), indexDir) { (df, id) =>
      perBatch(id) = df.collect().map(_.getLong(1)).toSet
    }.start()
    try {
      ms.addData(Vec(100L, v))
      q.processAllAvailable()
      ms.addData(Vec(200L, v))
      q.processAllAvailable()
    } finally q.stop()

    assert(perBatch(0L) == Set(1L), s"batch 0 saw ${perBatch(0L)}")
    // batch 1 must see BOTH the seed index row and batch 0's appended row
    assert(perBatch(1L) == Set(1L, 100L), s"batch 1 saw ${perBatch(1L)}")
  }
}
