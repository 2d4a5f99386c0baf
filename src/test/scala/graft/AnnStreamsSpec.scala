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

  test("ingestByName: epochs probe exactly the earlier-committed index, " +
      "commit exactly once, and a replayed probe is self-exclusion stable") {
    import spark.implicits._
    import graft.operators.SnapshotLog
    import graft.streaming.SnapshotStreams
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val w = Files.createTempDirectory("annbyname").toString
    spark.conf.set("spark.graft.catalog.location", w)
    val v = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.1f)
    AnnStreams.indexRows(Seq(Vec(1L, v)).toDF("vec_id", "embedding"))
      .createOrReplaceTempView("v18s_corpus")
    spark.sql("CREATE TABLE graft.v18sidx PARTITIONED BY (bucket) " +
      "TBLPROPERTIES ('key'='vec_id') AS SELECT * FROM v18s_corpus")
    val dir = s"$w/v18sidx"
    val v0 = SnapshotLog.latestVersion(spark, dir)

    val ms = MemoryStream[Vec]
    val q = AnnStreams.ingestByName(ms.toDF(), "graft.v18sidx",
      "v18-test", s"$w/matches")
      .option("checkpointLocation", s"$w/ckpt")
      .start()
    try {
      ms.addData(Vec(100L, v)); q.processAllAvailable()
      ms.addData(Vec(200L, v)); q.processAllAvailable()
    } finally q.stop()

    def neighbors(epoch: Long): Set[Long] =
      spark.read.parquet(s"$w/matches/epoch=$epoch")
        .select("neighbor_id").collect().map(_.getLong(0)).toSet
    // epoch 0 saw only the corpus; epoch 1 saw corpus + epoch 0's row
    assert(neighbors(0L) == Set(1L), s"epoch 0: ${neighbors(0L)}")
    assert(neighbors(1L) == Set(1L, 100L), s"epoch 1: ${neighbors(1L)}")

    // exactly-once: one txn-stamped commit per epoch; a replayed epoch
    // skips the merge
    val vLatest = SnapshotLog.latestVersion(spark, dir)
    assert(vLatest == v0 + 2, s"one commit per epoch: $v0 -> $vLatest")
    val replayCs = AnnStreams.indexRows(
      Seq(Vec(999L, v)).toDF("vec_id", "embedding"))
      .selectExpr("'insert' AS op", "vec_id", "q", "n2", "bucket")
    assert(SnapshotStreams.applyEpoch(spark, dir, replayCs, 1L, "v18-test",
      "vec_id").isEmpty, "replayed epoch must skip, never double-apply")

    // replay STABILITY of the probe itself: epoch 1's rows are now IN the
    // index, but a replayed probe excludes its own keys — same neighbor
    // set as the live run, no self-matches
    val rows = AnnStreams.indexRows(Seq(Vec(200L, v)).toDF("vec_id", "embedding"))
    val cells = rows.select("bucket").distinct().collect().map(_.getString(0)).toSeq
    val idx = SnapshotLog.read(spark, dir, vLatest)
      .where(col("bucket").isin(cells: _*))
      .join(rows.select("vec_id"), Seq("vec_id"), "left_anti")
    val replayed = AnnStreams.probe(rows, idx)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(replayed == Set(1L, 100L), s"replayed probe saw $replayed")
    spark.sql("DROP TABLE IF EXISTS graft.v18sidx")
  }
}
