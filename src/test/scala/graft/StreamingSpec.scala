package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Ev

/** Structured Streaming extension surface driven through MemoryStream
  * sources and memory sinks (real micro-batch execution, not batch DF).
  */
class StreamingSpec extends SparkTestBase {

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  private def ev(id: Long, min: Int, user: Long = 1L, typ: String = "click", v: Double = 1.0) =
    Ev(id, ts(min), user, typ, v)

  test("windowed counts with watermark over a stream") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(ev(1, 10), ev(2, 20), ev(3, 70), ev(4, 80, typ = "view"))
    EventStreams.runToMemorySink(
      EventStreams.hourlyCounts(ms.toDF()), "win_counts", OutputMode.Complete())
    val rows = spark.table("win_counts")
      .orderBy("window_start", "event_type").collect()
    assert(rows.map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSeq ==
      Seq(("2024-01-01 00:00:00.0", "click", 2L),
        ("2024-01-01 01:00:00.0", "click", 1L),
        ("2024-01-01 01:00:00.0", "view", 1L)))
  }

  test("dropDuplicatesWithinWatermark dedups repeated event ids") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(ev(1, 1), ev(1, 2), ev(2, 3), ev(2, 3), ev(3, 4))
    EventStreams.runToMemorySink(
      EventStreams.dedupEvents(ms.toDF()), "dedup_events", OutputMode.Append())
    assert(spark.table("dedup_events").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("stream-static enrichment join broadcasts the dim; misses flow through as nulls") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(ev(1, 1, user = 1), ev(2, 2, user = 2), ev(3, 3, user = 99))
    val dim = Seq((1L, "alice"), (2L, "bob")).toDF("user_id", "user_name")
    EventStreams.runToMemorySink(
      EventStreams.enrichWithDim(ms.toDF(), dim, "user_id"),
      "enriched", OutputMode.Append())
    val rows = spark.table("enriched")
      .select("event_id", "user_name").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows == Map(1L -> Some("alice"), 2L -> Some("bob"), 3L -> None))
  }

  test("session windows split on the 30-minute gap") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    // user 1: events at 0,10 (one session), then 60 (new session);
    // advance the watermark far enough to close all sessions
    ms.addData(ev(1, 0), ev(2, 10), ev(3, 60), ev(4, 300))
    EventStreams.runToMemorySink(
      EventStreams.sessionCounts(ms.toDF()), "sessions", OutputMode.Append())
    val rows = spark.table("sessions").orderBy("session_start").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(2)))
    assert(rows.take(2).toSeq ==
      Seq(("2024-01-01 00:00:00.0", 2L), ("2024-01-01 01:00:00.0", 1L)))
  }

  test("stream-stream interval join attributes purchases to in-window views") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val views = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val joined = EventStreams.viewPurchaseJoin(views.toDF(), purchases.toDF())
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      // user 1 views at :00 and :30; purchase :20 matches view :00 only
      // (:30 is after it); purchase :80 matches view :30 only (:00 is
      // more than 1h before).
      // user 2 purchases at :10 with no view: never emitted (inner join).
      views.addData(ev(10, 0), ev(11, 30))
      purchases.addData(ev(20, 20, v = 5.0), ev(21, 80, v = 7.0),
        ev(22, 10, user = 2))
      q.processAllAvailable()
      // advance both watermarks so all joinable state closes
      views.addData(ev(12, 400))
      purchases.addData(ev(23, 400, user = 99))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("attrib")
      .select("view_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 20L), (11L, 21L)))
  }

  test("transformWithState (ValueState + RocksDB store) matches the mapGroupsWithState twin") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Ev]
      val q = EventStreams.runningUserStatsTws(spark, ms.toDS())
        .writeStream.format("memory").queryName("user_stats_tws")
        .outputMode("update").start()
      try {
        ms.addData(ev(1, 1, user = 7, v = 2.0), ev(2, 2, user = 7, v = 3.0), ev(3, 3, user = 9, v = 1.0))
        q.processAllAvailable()
        ms.addData(ev(4, 4, user = 7, v = 5.0))
        q.processAllAvailable()
      } finally q.stop()
      val last = spark.table("user_stats_tws")
        .groupBy("user_id").agg(org.apache.spark.sql.functions.max("n_events").as("n"),
          org.apache.spark.sql.functions.max("total_value").as("tot"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(last(7L) == ((3L, 10.0)))
      assert(last(9L) == ((1L, 1.0)))
    } finally {
      prev.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
    }
  }

  test("streaming LSH near-dup flags duplicates against earlier batches") {
    import spark.implicits._
    import graft.streaming.DedupStreams
    import graft.streaming.DedupStreams.Doc
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Doc]
      val q = DedupStreams.nearDupCandidates(spark, ms.toDS())
        .writeStream.format("memory").queryName("near_dup")
        .outputMode("append").start()
      val base = "the quick brown fox jumps over the lazy dog near the river bank"
      try {
        // batch 1: three distinct docs, no candidates expected among them
        ms.addData(Doc(1, base),
          Doc(2, "completely different text about spark catalyst optimizer internals and more"),
          Doc(3, "a third unrelated document mentioning kmv sketches and asof joins today"))
        q.processAllAvailable()
        // batch 2: two exact copies of doc 1 arrive later
        ms.addData(Doc(101, base), Doc(102, base.toUpperCase))
        q.processAllAvailable()
      } finally q.stop()
      val pairs = spark.table("near_dup")
        .select("doc_id", "dup_of").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // normalization makes 102 identical too; each newcomer pairs with ALL
      // earlier same-bucket docs (batch self-join parity), so the two
      // late copies also pair with each other
      assert(pairs == Set((101L, 1L), (102L, 1L), (102L, 101L)), s"got $pairs")
    } finally {
      prev.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
    }
  }

  test("dedup state TTL evicts a bucket: an aged-out doc no longer pairs, a fresh one does") {
    import spark.implicits._
    import graft.streaming.DedupStreams
    import graft.streaming.DedupStreams.Doc
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // TTL long enough that the 101 -> 102 pairing window (a couple of
    // micro-batches) cannot plausibly expire on a loaded host, short
    // enough that one sleep proves eviction
    spark.conf.set(DedupStreams.DedupTtlKey, "10s")
    try {
      val ms = MemoryStream[Doc]
      val q = DedupStreams.nearDupCandidates(spark, ms.toDS())
        .writeStream.format("memory").queryName("near_dup_ttl")
        .outputMode("append").start()
      val base = "the quick brown fox jumps over the lazy dog near the river bank"
      // ProcessingTime mode runs micro-batches continuously to advance the
      // TTL clock, so processAllAvailable never latches "no new data" —
      // poll observable progress instead (a production job paces this with
      // a processing-time trigger)
      def waitUntil(what: String)(cond: => Boolean): Unit = {
        val t0 = System.currentTimeMillis
        while (!cond && System.currentTimeMillis - t0 < 60000) Thread.sleep(100)
        assert(cond, s"timed out waiting for $what")
      }
      def lastBatch: Long = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
      // the bounded recentProgress buffer rolls over under continuous
      // batches, so look for input SINCE a captured batch id, not a sum
      def sawInputSince(b: Long): Boolean =
        q.recentProgress.exists(p => p.batchId > b && p.numInputRows > 0)
      def pairs: Set[(Long, Long)] = spark.table("near_dup_ttl")
        .select("doc_id", "dup_of").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      try {
        val b0 = lastBatch
        ms.addData(Doc(1, base))
        waitUntil("doc 1 ingested")(sawInputSince(b0))
        Thread.sleep(21000) // well past the 10s horizon: doc 1's entry evicts
        // doc 101 is RE-ADMITTED into the now-empty bucket (no pair against
        // the aged-out doc 1), and doc 102 arriving within the horizon
        // pairs against 101 only
        val b1 = lastBatch
        ms.addData(Doc(101, base))
        waitUntil("doc 101 ingested")(sawInputSince(b1))
        ms.addData(Doc(102, base))
        waitUntil("the (102, 101) pair")(pairs.contains((102L, 101L)))
      } finally q.stop()
      assert(!pairs.contains((101L, 1L)), s"evicted doc still paired: $pairs")
    } finally {
      spark.conf.unset(DedupStreams.DedupTtlKey)
      prev.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
    }
  }

  test("streaming verified near-dups match the batch pipeline on the same slice") {
    import spark.implicits._
    import graft.streaming.DedupStreams
    import graft.streaming.DedupStreams.Doc
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = "the quick brown fox jumps over the lazy dog near the river bank today"
      val slice = Seq(
        Doc(1, base),
        Doc(2, "completely different text about spark catalyst optimizer internals and more"),
        Doc(3, "a third unrelated document mentioning kmv sketches and asof joins today"),
        Doc(101, base), // exact dup of 1, later batch
        Doc(102, base + " extra words"), // near dup of 1/101 (collides in a band; jaccard ~0.857)
        Doc(4, "yet another standalone document that matches nothing else at all"))
      // the doc store the batch pipeline maintains: shingle sets by doc_id
      val store = DedupStreams.shingleStore(slice.toDF("doc_id", "text"))

      val verified = scala.collection.mutable.Set[(Long, Long, Double)]()
      val ms = MemoryStream[Doc]
      val q = DedupStreams.verifiedNearDups(spark, ms.toDS(), store) { (df, _) =>
        verified ++= df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      }.start()
      try {
        ms.addData(slice.take(3): _*)
        q.processAllAvailable()
        ms.addData(slice.drop(3): _*)
        q.processAllAvailable()
      } finally q.stop()

      // batch twin: the SAME banding code in batch mode -> bucket self-join
      // -> the SAME verify stage
      val hits = DedupStreams.bandHits(spark, slice.toDS()).toDF()
      val cand = hits.as("a").join(hits.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
        .select(col("b.doc_id").as("doc_id"), col("a.doc_id").as("dup_of"))
      val batchPairs = DedupStreams.verifyPairs(cand, store, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

      assert(verified.toSet == batchPairs, s"streaming $verified vs batch $batchPairs")
      // the near-dup (not exact) pair survived verification with a real
      // jaccard in (0.5, 1), and the all-earlier emission covered the
      // late-arrival pair (101, 102)
      assert(batchPairs.exists(p => p._3 > 0.5 && p._3 < 1.0), s"no partial-jaccard pair in $batchPairs")
      assert(verified.map(p => (p._1, p._2)).contains((101L, 102L)), s"missing late-late pair in $verified")
    } finally {
      prev.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
    }
  }

  test("streaming change-set drains into the keyed upsert sink per micro-batch") {
    import spark.implicits._
    import graft.operators.{FakeJdbcFactory, FakeJdbcStore, JdbcUpsert, UpsertRow}
    import graft.streaming.UpsertStreams
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = "t-stream-upsert"
    FakeJdbcStore.reset(store)
    (1L to 8L).foreach(FakeJdbcStore.seed(store, _))

    val outcomes = scala.collection.mutable.ArrayBuffer[(Long, Long, Int, Option[String])]()
    val ms = MemoryStream[UpsertRow]
    val q = UpsertStreams.writeStream(ms.toDS(), new FakeJdbcFactory(store)) { (o, id) =>
      outcomes ++= o.collect().map(r => (id, r.id, r.affected, r.error))
    }.start()
    def row(i: Long) = UpsertRow(i, i.toString, s"/$i", i, s"/f$i.dat")
    try {
      ms.addData(row(1), row(2), row(3))
      q.processAllAvailable()
      ms.addData(row(4), row(99)) // 99 was never seeded: deleted-share path
      q.processAllAvailable()
    } finally q.stop()

    val byId = outcomes.map(o => o._2 -> o).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(i => byId(i)._3 == 1 && byId(i)._4.isEmpty))
    assert(byId(99L)._3 == 0 && byId(99L)._4.contains(JdbcUpsert.ErrShareDeleted))
    // batch ids separate the two micro-batches
    assert(outcomes.filter(_._1 == 0).map(_._2).toSet == Set(1L, 2L, 3L))
    assert(outcomes.filter(_._1 == 1).map(_._2).toSet == Set(4L, 99L))
    // the store holds the written values
    assert(FakeJdbcStore.rows(store)(3L) == Vector("3", "/3", 3L, "/f3.dat"))
  }

  test("exactly-once upsert stream: a replayed micro-batch does not re-apply") {
    import spark.implicits._
    import graft.operators.{FakeJdbcFactory, FakeJdbcStore, UpsertRow}
    import graft.streaming.{InMemoryEpochLedger, UpsertStreams}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = "t-stream-e1"
    FakeJdbcStore.reset(store)
    (1L to 6L).foreach(FakeJdbcStore.seed(store, _))
    def row(i: Long) = UpsertRow(i, i.toString, s"/$i", i, s"/f$i.dat")
    val ledger = new InMemoryEpochLedger
    val factory = new FakeJdbcFactory(store)
    val applied = scala.collection.mutable.ArrayBuffer[(Long, Long)]() // (epoch, id)

    // normal flow through the streaming writer
    val ms = MemoryStream[UpsertRow]
    val q = UpsertStreams.writeStreamExactlyOnce(
        ms.toDS(), factory, ledger, "upsert-s1") { (o, id) =>
      applied ++= o.collect().map(r => id -> r.id)
    }.start()
    try {
      ms.addData(row(1), row(2))
      q.processAllAvailable()
    } finally q.stop()
    assert(applied.toSet == Set(0L -> 1L, 0L -> 2L))
    assert(FakeJdbcStore.rows(store)(1L) == Vector("1", "/1", 1L, "/f1.dat"))

    // simulate the foreachBatch replay a checkpoint-recovery produces:
    // same epoch id, same data. The ledger skips it — the sentinel value
    // written in between survives, and no outcomes are emitted.
    FakeJdbcStore.table(store).put(1L, Vector("sentinel", "", 0L, ""))
    val replayed = UpsertStreams.applyEpoch(
      Seq(row(1), row(2)).toDS(), epochId = 0L, factory, ledger, "upsert-s1") {
      (o, id) => applied ++= o.collect().map(r => id -> r.id)
    }
    assert(!replayed, "replayed epoch must be skipped")
    assert(applied.size == 2, "replay emitted outcomes")
    assert(FakeJdbcStore.rows(store)(1L) == Vector("sentinel", "", 0L, ""),
      "replayed epoch re-applied the upsert")

    // a NEW epoch on the same stream still applies
    assert(UpsertStreams.applyEpoch(
      Seq(row(3)).toDS(), epochId = 1L, factory, ledger, "upsert-s1") { (_, _) => () })
    assert(FakeJdbcStore.rows(store)(3L) == Vector("3", "/3", 3L, "/f3.dat"))
  }

  test("applyEpoch outcomes are a written-table scan, severed from the write lineage") {
    import spark.implicits._
    import graft.operators.{FakeJdbcFactory, FakeJdbcStore, UpsertOutcome, UpsertRow}
    import graft.streaming.{InMemoryEpochLedger, UpsertStreams}
    val store = "t-stream-sever"
    FakeJdbcStore.reset(store)
    (1L to 2L).foreach(FakeJdbcStore.seed(store, _))
    var captured: org.apache.spark.sql.Dataset[UpsertOutcome] = null
    UpsertStreams.applyEpoch(
      Seq(UpsertRow(1L, "1", "/1", 1L, "/f1.dat")).toDS(), epochId = 0L,
      new FakeJdbcFactory(store), new InMemoryEpochLedger, "sever-s1") {
      (o, _) => captured = o
    }
    assert(FakeJdbcStore.rows(store)(1L) == Vector("1", "/1", 1L, "/f1.dat"))
    // the outcome frame the callback received is a SCAN of a written stage
    // table — not the JdbcUpsert mapPartitions lineage, and nothing passed
    // through the driver to get there
    val leaves = captured.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.nonEmpty && leaves.forall(_.toString.toLowerCase.contains("parquet")),
      s"outcomes not a written-table scan:\n${captured.queryExecution.optimizedPlan}")
    // severed lineage: re-running actions on it must NOT re-issue UPDATEs
    FakeJdbcStore.table(store).put(1L, Vector("sentinel", "", 0L, ""))
    assert(captured.collect().map(_.id).toSeq == Seq(1L))
    assert(captured.count() == 1L)
    assert(FakeJdbcStore.rows(store)(1L) == Vector("sentinel", "", 0L, ""),
      "an action on the outcome frame re-applied the upsert")
  }

  test("JdbcEpochLedger: replay protection survives a 'restart' (durable, Derby-backed)") {
    import spark.implicits._
    import graft.operators.{FakeJdbcFactory, FakeJdbcStore, UpsertRow}
    import graft.streaming.{JdbcEpochLedger, UpsertStreams}
    val url = "jdbc:derby:memory:graftledger;create=true"
    val available =
      try { java.sql.DriverManager.getConnection(url).close(); true }
      catch {
        case _: Throwable =>
          try {
            Class.forName("org.apache.derby.iapi.jdbc.AutoloadedDriver")
            java.sql.DriverManager.getConnection(url).close(); true
          } catch { case _: Throwable => false }
      }
    assume(available, "Derby driver not on classpath")

    val ledger = new JdbcEpochLedger(url).ensureTable()
    new JdbcEpochLedger(url).ensureTable() // idempotent, shareable
    assert(!ledger.committed("s1", 0L))
    ledger.commit("s1", 0L)
    ledger.commit("s1", 0L) // duplicate commit swallows the PK violation
    assert(ledger.committed("s1", 0L))
    assert(!ledger.committed("s1", 1L) && !ledger.committed("s2", 0L))

    // the durability point: a FRESH ledger instance (a restarted driver)
    // sees the committed epoch and skips the replayed batch
    val store = "t-ledger-jdbc"
    FakeJdbcStore.reset(store)
    (1L to 3L).foreach(FakeJdbcStore.seed(store, _))
    val restarted = new JdbcEpochLedger(url).ensureTable()
    FakeJdbcStore.table(store).put(1L, Vector("sentinel", "", 0L, ""))
    val replayed = UpsertStreams.applyEpoch(
      Seq(UpsertRow(1L, "1", "/1", 1L, "/f1.dat")).toDS(), epochId = 0L,
      new FakeJdbcFactory(store), restarted, "s1") { (_, _) => () }
    assert(!replayed, "restarted driver re-applied a durably-committed epoch")
    assert(FakeJdbcStore.rows(store)(1L) == Vector("sentinel", "", 0L, ""))
    // a new epoch still applies through the durable ledger
    assert(UpsertStreams.applyEpoch(
      Seq(UpsertRow(2L, "2", "/2", 2L, "/f2.dat")).toDS(), epochId = 1L,
      new FakeJdbcFactory(store), restarted, "s1") { (_, _) => () })
    assert(restarted.committed("s1", 1L))
    assert(FakeJdbcStore.rows(store)(2L) == Vector("2", "/2", 2L, "/f2.dat"))
  }

  test("mapGroupsWithState keeps running per-user counters across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = EventStreams.runningUserStats(spark, ms.toDS())
      .writeStream.format("memory").queryName("user_stats").outputMode("update").start()
    try {
      ms.addData(ev(1, 1, user = 7, v = 2.0), ev(2, 2, user = 7, v = 3.0), ev(3, 3, user = 9, v = 1.0))
      q.processAllAvailable()
      ms.addData(ev(4, 4, user = 7, v = 5.0))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("user_stats")
      .groupBy("user_id").agg(org.apache.spark.sql.functions.max("n_events").as("n"),
        org.apache.spark.sql.functions.max("total_value").as("tot"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(last(7L) == ((3L, 10.0)))
    assert(last(9L) == ((1L, 1.0)))
  }
}
