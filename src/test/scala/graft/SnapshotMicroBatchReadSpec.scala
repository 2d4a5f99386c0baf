package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.SnapshotLog

/** `spark.readStream.table("graft.t")` — the DSv2 MICRO_BATCH_READ path
  * ([[graft.streaming.SnapshotMicroBatchStream]]): offsets are log
  * versions, each batch delivers the appended rows of its range, the
  * first batch bootstraps with the earliest surviving version's content,
  * checkpoint restart resumes from the committed version, update/delete
  * commits fail loudly (or are skipped under skipChangeCommits), and a
  * vacuumed mid-stream gap is a loud retention-contract violation —
  * parity with [[graft.streaming.SnapshotStreams.readVersionFeed]]'s
  * contracts, by table NAME instead of path.
  */
class SnapshotMicroBatchReadSpec extends SparkTestBase {

  private def freshWarehouse(prefix: String): String = {
    val w = Files.createTempDirectory(prefix).toString
    spark.conf.set("spark.graft.catalog.location", w)
    w
  }

  /** Drain the table stream into a parquet accumulator (append per
    * batch — the memory sink cannot recover from a checkpoint, and
    * batch frames must be consumed eagerly: the staged delta files are
    * reclaimed when the batch commits).
    */
  private def runToDir(table: String, outDir: String, ckpt: String,
      options: Map[String, String] = Map.empty): Unit = {
    val reader = spark.readStream
    options.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.table(table)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outDir)
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The accumulator's content; empty frame if no batch ever fired. */
  private def collected(outDir: String, cols: String*): org.apache.spark.sql.DataFrame =
    if (new java.io.File(outDir).exists()) spark.read.parquet(outDir)
    else spark.range(0).selectExpr(cols.map(c => s"id AS $c"): _*).where(lit(false))

  test("bootstrap + append: the streamed union equals the batch read, " +
    "and restart resumes from the committed version") {
    freshWarehouse("mbr")
    spark.sql("CREATE TABLE graft.mbr1 (id BIGINT, x BIGINT) " +
      "TBLPROPERTIES ('key'='id')")
    spark.range(0, 6).selectExpr("id", "id * 10 AS x")
      .createOrReplaceTempView("mbr1_in")
    spark.sql("INSERT INTO graft.mbr1 SELECT * FROM mbr1_in")

    val ckpt = Files.createTempDirectory("mbr-ckpt").toString
    val out1 = Files.createTempDirectory("mbr-out").toString + "/acc"
    runToDir("graft.mbr1", out1, ckpt)
    val first = collected(out1).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(first == (0L until 6L).map(i => (i, i * 10)),
      s"bootstrap must deliver the full table: $first")

    // new versions after the first run: only the appended rows arrive
    spark.range(6, 9).selectExpr("id", "id * 10 AS x")
      .createOrReplaceTempView("mbr1_in2")
    spark.sql("INSERT INTO graft.mbr1 SELECT * FROM mbr1_in2")
    val out2 = Files.createTempDirectory("mbr-out").toString + "/acc"
    runToDir("graft.mbr1", out2, ckpt)
    val resumed = collected(out2).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(resumed == (6L until 9L).map(i => (i, i * 10)),
      s"restart must deliver only versions after the committed offset: $resumed")

    // replaying the drained checkpoint delivers nothing
    val out3 = Files.createTempDirectory("mbr-out").toString + "/acc"
    runToDir("graft.mbr1", out3, ckpt)
    assert(collected(out3, "id", "x").isEmpty,
      "a drained checkpoint must deliver no rows")

    // end-to-end: streamed batches together are exactly the batch read
    val streamed = collected(out1).unionByName(collected(out2))
      .orderBy("id").collect().toSeq
    val batch = spark.sql("SELECT id, x FROM graft.mbr1 ORDER BY id")
      .collect().toSeq
    assert(streamed == batch, "stream union != batch read")
  }

  test("an update/delete commit fails the stream loudly; " +
    "skipChangeCommits drops the changes and keeps the inserts") {
    freshWarehouse("mbr")
    spark.sql("CREATE TABLE graft.mbr2 (id BIGINT, x BIGINT) " +
      "TBLPROPERTIES ('key'='id')")
    spark.range(0, 4).selectExpr("id", "id AS x")
      .createOrReplaceTempView("mbr2_in")
    spark.sql("INSERT INTO graft.mbr2 SELECT * FROM mbr2_in")

    val ckpt = Files.createTempDirectory("mbr-ckpt").toString
    val out1 = Files.createTempDirectory("mbr-out").toString + "/acc"
    runToDir("graft.mbr2", out1, ckpt)
    assert(collected(out1).count() == 4)

    // an UPDATE commit plus an insert commit land after the checkpoint
    spark.sql("UPDATE graft.mbr2 SET x = 999 WHERE id = 1").collect()
    spark.sql("INSERT INTO graft.mbr2 VALUES (10, 100)").collect()

    val outFail = Files.createTempDirectory("mbr-out").toString + "/acc"
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runToDir("graft.mbr2", outFail, ckpt)
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ rootMessages(x.getCause))
    assert(rootMessages(e).exists(_.contains("update or delete existing rows")),
      s"wrong failure: ${rootMessages(e)}")

    // same checkpoint, skipChangeCommits: the insert arrives, the update
    // image does not
    val outSkip = Files.createTempDirectory("mbr-out").toString + "/acc"
    runToDir("graft.mbr2", outSkip, ckpt,
      Map("skipChangeCommits" -> "true"))
    val rows = collected(outSkip).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((10L, 100L)),
      s"skipChangeCommits must keep inserts only: $rows")
  }

  test("a vacuumed mid-stream gap fails loudly; " +
    "a pre-stream vacuum just moves the bootstrap forward") {
    val w = freshWarehouse("mbr")
    spark.sql("CREATE TABLE graft.mbr3 (id BIGINT, x BIGINT) " +
      "TBLPROPERTIES ('key'='id')")
    spark.sql("INSERT INTO graft.mbr3 VALUES (1, 1)").collect()

    val ckpt = Files.createTempDirectory("mbr-ckpt").toString
    val out1 = Files.createTempDirectory("mbr-out").toString + "/acc"
    runToDir("graft.mbr3", out1, ckpt) // commits offset v1

    spark.sql("INSERT INTO graft.mbr3 VALUES (2, 2)").collect() // v2
    spark.sql("INSERT INTO graft.mbr3 VALUES (3, 3)").collect() // v3
    // vacuum away v0..v2 — the stream's committed offset (v1) is gone
    SnapshotLog.vacuum(spark, s"$w/mbr3", retainFrom = 3L, graceMs = 0L)

    val outFail = Files.createTempDirectory("mbr-out").toString + "/acc"
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runToDir("graft.mbr3", outFail, ckpt)
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ rootMessages(x.getCause))
    assert(rootMessages(e).exists(_.contains("vacuumed")),
      s"wrong failure: ${rootMessages(e)}")

    // a FRESH stream on the vacuumed table bootstraps from the earliest
    // survivor — nothing older is owed to a stream that never saw it
    val ckpt2 = Files.createTempDirectory("mbr-ckpt").toString
    val out2 = Files.createTempDirectory("mbr-out").toString + "/acc"
    runToDir("graft.mbr3", out2, ckpt2)
    val rows = collected(out2).orderBy("id")
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(1L, 2L, 3L), s"fresh bootstrap after vacuum: $rows")
  }

  test("a time-travel-pinned table refuses to stream") {
    freshWarehouse("mbr")
    spark.sql("CREATE TABLE graft.mbr4 (id BIGINT) TBLPROPERTIES ('key'='id')")
    spark.sql("INSERT INTO graft.mbr4 VALUES (1)").collect()
    val t = new graft.sql.GraftTableCatalog()
    t.initialize("graft", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      new java.util.HashMap[String, String]()))
    val pinnedTable = t.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty[String], "mbr4"), "0")
      .asInstanceOf[graft.sql.GraftSnapshotTable]
    val e = intercept[IllegalArgumentException] {
      pinnedTable.newScanBuilder(
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
    }
    assert(e.getMessage.contains("pinned"))
  }

  test("maxVersionsPerTrigger paces catch-up: one version per batch, " +
    "results identical to the unpaced stream") {
    freshWarehouse("mbr")
    spark.sql("CREATE TABLE graft.mbr6 (id BIGINT) TBLPROPERTIES ('key'='id')")
    (0 until 4).foreach(i =>
      spark.sql(s"INSERT INTO graft.mbr6 VALUES ($i)").collect())
    // versions now: 0 (empty init) + 4 inserts
    val ckpt = Files.createTempDirectory("mbr-ckpt").toString
    val out = Files.createTempDirectory("mbr-out").toString + "/acc"
    var batches = 0
    val q = spark.readStream
      .option("maxVersionsPerTrigger", "1")
      .table("graft.mbr6")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) batch.write.mode("append").parquet(out)
        batches += 1
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(batches >= 5,
      s"pacing must split the 5-version backlog into >=5 batches, got $batches")
    val rows = collected(out).orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(rows == (0L until 4L), s"paced union != table: $rows")
  }

  test("streaming reads compose with the layout levers: partitioned and " +
    "hash-bucketed tables stream their appended rows unchanged") {
    freshWarehouse("mbr")
    spark.sql("CREATE TABLE graft.mbr7p (id BIGINT, p INT) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('key'='id')")
    spark.sql("INSERT INTO graft.mbr7p VALUES (1, 0), (2, 1)").collect()
    spark.sql("INSERT INTO graft.mbr7p VALUES (3, 0)").collect()
    val outP = Files.createTempDirectory("mbr-out").toString + "/acc"
    runToDir("graft.mbr7p", outP,
      Files.createTempDirectory("mbr-ckpt").toString)
    assert(collected(outP).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((1L, 0), (2L, 1), (3L, 0)), "partitioned table stream")

    spark.sql("CREATE TABLE graft.mbr7b (id BIGINT, x BIGINT) " +
      "PARTITIONED BY (bucket(4, id)) TBLPROPERTIES ('key'='id')")
    spark.range(0, 40).selectExpr("id", "id AS x")
      .createOrReplaceTempView("mbr7b_in")
    spark.sql("INSERT INTO graft.mbr7b SELECT * FROM mbr7b_in")
    val outB = Files.createTempDirectory("mbr-out").toString + "/acc"
    runToDir("graft.mbr7b", outB,
      Files.createTempDirectory("mbr-ckpt").toString)
    assert(collected(outB).orderBy("id").collect()
      .map(_.getLong(0)).toSeq == (0L until 40L), "bucketed table stream")
  }

  test("startingVersion subscribes from a version: no snapshot " +
    "bootstrap, restart resumes, vacuumed start fails loudly") {
    val w = freshWarehouse("mbr")
    spark.sql("CREATE TABLE graft.mbr8 (id BIGINT) TBLPROPERTIES ('key'='id')")
    (0 until 4).foreach(i =>
      spark.sql(s"INSERT INTO graft.mbr8 VALUES ($i)").collect())
    // versions: 0 (empty init), 1..4 (one insert each)

    val ckpt = Files.createTempDirectory("mbr-ckpt").toString
    val out1 = Files.createTempDirectory("mbr-out").toString + "/acc"
    runToDir("graft.mbr8", out1, ckpt, Map("startingVersion" -> "3"))
    val first = collected(out1).orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(first == Seq(2L, 3L),
      s"startingVersion=3 must deliver versions 3..4 only: $first")

    // restart on the same checkpoint: only NEW versions arrive (the
    // option no longer matters once an offset is committed)
    spark.sql("INSERT INTO graft.mbr8 VALUES (9)").collect() // v5
    val out2 = Files.createTempDirectory("mbr-out").toString + "/acc"
    runToDir("graft.mbr8", out2, ckpt, Map("startingVersion" -> "3"))
    assert(collected(out2).collect().map(_.getLong(0)).toSeq == Seq(9L))

    // startingVersion=0 is exact "from the beginning": full v0 content
    // (empty) + all inserts
    val out0 = Files.createTempDirectory("mbr-out").toString + "/acc"
    runToDir("graft.mbr8", out0,
      Files.createTempDirectory("mbr-ckpt").toString,
      Map("startingVersion" -> "0"))
    assert(collected(out0).orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 1L, 2L, 3L, 9L))

    // vacuum v0..v2: startingVersion=3 now lacks its predecessor's
    // manifest (the delta (2, 3] cannot be diffed) — loud failure, and
    // startingVersion=0 is an explicit vacuumed-start failure
    SnapshotLog.vacuum(spark, s"$w/mbr8", retainFrom = 3L, graceMs = 0L)
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ rootMessages(x.getCause))
    val eMid = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runToDir("graft.mbr8",
        Files.createTempDirectory("mbr-out").toString + "/acc",
        Files.createTempDirectory("mbr-ckpt").toString,
        Map("startingVersion" -> "3"))
    }
    assert(rootMessages(eMid).exists(_.contains("vacuumed")),
      s"wrong failure: ${rootMessages(eMid)}")
    val eZero = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runToDir("graft.mbr8",
        Files.createTempDirectory("mbr-out").toString + "/acc",
        Files.createTempDirectory("mbr-ckpt").toString,
        Map("startingVersion" -> "0"))
    }
    assert(rootMessages(eZero).exists(_.contains("startingVersion=0")),
      s"wrong failure: ${rootMessages(eZero)}")

    // the earliest still-diffable start works: predecessor v3 survives
    val out4 = Files.createTempDirectory("mbr-out").toString + "/acc"
    runToDir("graft.mbr8", out4,
      Files.createTempDirectory("mbr-ckpt").toString,
      Map("startingVersion" -> "4"))
    assert(collected(out4).orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(3L, 9L))
  }

  test("startingTimestamp resolves FORWARD to the earliest commit at or " +
    "after it; combining both start options is rejected") {
    val w = freshWarehouse("mbr")
    spark.sql("CREATE TABLE graft.mbr9 (id BIGINT) TBLPROPERTIES ('key'='id')")
    (0 until 3).foreach(i =>
      spark.sql(s"INSERT INTO graft.mbr9 VALUES ($i)").collect())
    val tsV2 = SnapshotLog.commitTimeMs(spark, s"$w/mbr9", 2L).get
    val tz = java.time.ZoneId.of(
      spark.sessionState.conf.sessionLocalTimeZone)
    val tsText = java.time.Instant.ofEpochMilli(tsV2).atZone(tz)
      .toLocalDateTime.toString
    val out = Files.createTempDirectory("mbr-out").toString + "/acc"
    runToDir("graft.mbr9", out,
      Files.createTempDirectory("mbr-ckpt").toString,
      Map("startingTimestamp" -> tsText))
    val rows = collected(out).orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(1L, 2L),
      s"startingTimestamp at v2's stamp must deliver versions 2..3: $rows")

    val e = intercept[Exception] {
      runToDir("graft.mbr9",
        Files.createTempDirectory("mbr-out").toString + "/acc",
        Files.createTempDirectory("mbr-ckpt").toString,
        Map("startingVersion" -> "1", "startingTimestamp" -> tsText))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("cannot combine")), s"${msgs(e)}")
  }

  test("a startingVersion ahead of the log delivers nothing until new " +
    "commits land; an uninitialized directory fails with a clear error") {
    freshWarehouse("mbr")
    spark.sql("CREATE TABLE graft.mbr10 (id BIGINT) TBLPROPERTIES ('key'='id')")
    spark.sql("INSERT INTO graft.mbr10 VALUES (1)").collect() // v1
    val ckpt = Files.createTempDirectory("mbr-ckpt").toString
    val out1 = Files.createTempDirectory("mbr-out").toString + "/acc"
    runToDir("graft.mbr10", out1, ckpt, Map("startingVersion" -> "3"))
    assert(collected(out1, "id").isEmpty,
      "a future startingVersion must deliver nothing, not fail")
    spark.sql("INSERT INTO graft.mbr10 VALUES (2)").collect() // v2
    spark.sql("INSERT INTO graft.mbr10 VALUES (3)").collect() // v3
    val out2 = Files.createTempDirectory("mbr-out").toString + "/acc"
    runToDir("graft.mbr10", out2, ckpt, Map("startingVersion" -> "3"))
    assert(collected(out2).collect().map(_.getLong(0)).toSeq == Seq(3L),
      "the stream must pick up from the future start once it exists")

    // raw stream over an uninitialized dir: loud, named error — not a
    // NoSuchElementException from an empty version listing
    val empty = Files.createTempDirectory("mbr-empty").toString
    val st = new graft.streaming.SnapshotMicroBatchStream(empty, "id",
      new org.apache.spark.sql.types.StructType().add("id", "long"),
      Files.createTempDirectory("mbr-ckpt").toString,
      skipChangeCommits = false, maxVersionsPerTrigger = Some(1))
    val eEmpty = intercept[Exception] {
      st.latestOffset(graft.streaming.VersionOffset(-1L),
        org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    }
    assert(eEmpty.getMessage.contains("no committed versions"))
  }

  test("batch commit cleanup: committed ranges' staged deltas are reclaimed") {
    freshWarehouse("mbr")
    spark.sql("CREATE TABLE graft.mbr5 (id BIGINT) TBLPROPERTIES ('key'='id')")
    spark.sql("INSERT INTO graft.mbr5 VALUES (1)").collect()
    val ckpt = Files.createTempDirectory("mbr-ckpt").toString
    val out = Files.createTempDirectory("mbr-out").toString + "/acc"
    runToDir("graft.mbr5", out, ckpt)
    // stop() is best-effort total cleanup; at minimum no staged range at
    // or below the committed offset survives
    val scratch = new java.io.File(s"$ckpt/sources/0/graft-delta")
    val leftover = Option(scratch.listFiles()).getOrElse(Array.empty)
      .map(_.getName).toSeq
    assert(leftover.isEmpty, s"staged deltas must be reclaimed: $leftover")
  }
}
