package graft

import scala.collection.mutable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators._
import graft.streaming.{InMemoryEpochLedger, MergeStreams}

/** Streaming CDC apply ([[graft.streaming.MergeStreams]]): a two-micro-
  * batch insert/update/delete stream against embedded Derby must land on
  * exactly the batch functional merge of the unioned changesets, and a
  * replayed epoch must be skipped by the ledger — NOT re-applied (a
  * replayed insert would otherwise trip the key constraint onto the
  * error channel; the non-idempotent ops are exactly why CDC needs the
  * epoch seam more than the update-only K1 stream does).
  */
class MergeStreamsSpec extends SparkTestBase {

  import spark.implicits._

  private val derbyUrl = "jdbc:derby:memory:graftmergestream;create=true"

  private def derbyAvailable: Boolean =
    try { java.sql.DriverManager.getConnection(derbyUrl).close(); true }
    catch {
      case _: Exception =>
        try {
          Class.forName("org.apache.derby.iapi.jdbc.AutoloadedDriver")
          java.sql.DriverManager.getConnection(derbyUrl).close(); true
        } catch { case _: Throwable => false }
    }

  private def resetTable(): Unit = {
    val c = java.sql.DriverManager.getConnection(derbyUrl)
    try {
      val st = c.createStatement()
      try st.execute("DROP TABLE oc_share") catch { case _: java.sql.SQLException => () }
      st.execute("""CREATE TABLE oc_share(
        id BIGINT PRIMARY KEY, item_source VARCHAR(64), item_target VARCHAR(64),
        file_source BIGINT, file_target VARCHAR(64))""")
      val ins = c.prepareStatement("INSERT INTO oc_share VALUES (?, ?, ?, ?, ?)")
      (1L to 6L).foreach { i =>
        ins.setLong(1, i); ins.setString(2, i.toString); ins.setString(3, s"/$i")
        ins.setLong(4, i); ins.setString(5, s"/f$i.dat"); ins.executeUpdate()
      }
      ins.close(); st.close()
    } finally c.close()
  }

  private def tableRows: Seq[(Long, String, String, Long, String)] = {
    val c = java.sql.DriverManager.getConnection(derbyUrl)
    try {
      val rs = c.createStatement().executeQuery(
        "SELECT id, item_source, item_target, file_source, file_target FROM oc_share ORDER BY id")
      Iterator.continually(rs).takeWhile(_.next())
        .map(r => (r.getLong(1), r.getString(2), r.getString(3),
          r.getLong(4), r.getString(5))).toList
    } finally c.close()
  }

  private val batch1 = Seq(
    MergeChange(Merge.OpUpdate, 2L, "u2", "/u2", 22L, "/fu2"),
    MergeChange(Merge.OpDelete, 3L, null, null, null, null),
    MergeChange(Merge.OpInsert, 7L, "7", "/7", 7L, "/f7.dat"))

  private val batch2 = Seq(
    MergeChange(Merge.OpUpdate, 7L, "u7", "/u7", 77L, "/fu7"), // row batch 1 inserted
    MergeChange(Merge.OpDelete, 5L, null, null, null, null),
    MergeChange(Merge.OpInsert, 8L, "8", "/8", 8L, "/f8.dat"))

  test("streaming CDC equals batch merge row-for-row; replayed epoch is skipped") {
    assume(derbyAvailable, "Derby driver not on classpath")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    resetTable()
    val ledger = new InMemoryEpochLedger
    val factory = new DriverManagerUpsertFactory(derbyUrl)
    val outcomes = mutable.Map.empty[Long, Seq[MergeOutcome]]

    val ms = MemoryStream[MergeChange]
    val q = MergeStreams.writeStreamExactlyOnce(ms.toDS(), factory, ledger,
        "cdc-spec", maxRetries = 1) { (out, epoch) =>
        outcomes(epoch) = out.collect().toSeq
      }.start()
    try {
      ms.addData(batch1: _*)
      q.processAllAvailable()
      assert(outcomes.keySet == Set(0L))
      assert(outcomes(0L).forall(_.error.isEmpty), s"epoch 0 errors: ${outcomes(0L)}")
      ms.addData(batch2: _*)
      q.processAllAvailable()
      assert(outcomes.keySet == Set(0L, 1L))
      assert(outcomes(1L).forall(_.error.isEmpty), s"epoch 1 errors: ${outcomes(1L)}")
      // batch 2's update targets the row batch 1 inserted — ordering is real
      assert(outcomes(1L).exists(o => o.id == 7L && o.op == "update" && o.affected == 1))
    } finally q.stop()

    // parity: Derby's final table == functional merge of batch1 then batch2
    val baseDf = (1L to 6L).map(i => (i, i.toString, s"/$i", i, s"/f$i.dat"))
      .toDF("id", "item_source", "item_target", "file_source", "file_target")
    def csDf(b: Seq[MergeChange]) = b.toDS().toDF()
      .select(col("op"), col("id"), col("new_item_source").as("item_source"),
        col("new_item_target").as("item_target"),
        col("new_file_source").as("file_source"),
        col("new_file_target").as("file_target"))
    val functional = Merge(Merge(baseDf, csDf(batch1), "id"), csDf(batch2), "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getLong(3), r.getString(4))).toSeq
    assert(tableRows == functional,
      s"streaming/batch divergence:\n$tableRows\nvs\n$functional")

    // replay epoch 0: the ledger must skip — no statements re-run (the
    // replayed insert of id 7 would hit the key constraint otherwise)
    val before = tableRows
    var callbacks = 0
    val applied = MergeStreams.applyEpoch(batch1.toDS(), 0L, factory, ledger,
      "cdc-spec", maxRetries = 1) { (_, _) => callbacks += 1 }
    assert(!applied && callbacks == 0, "replayed epoch was re-applied")
    assert(tableRows == before, "replay mutated the table")

    // a NEW stream id is a different ledger scope: the same epoch applies
    // (and the id-7 insert now errors on the key constraint, proving the
    // first run's skip was the ledger, not luck)
    val applied2 = MergeStreams.applyEpoch(batch1.toDS(), 0L, factory, ledger,
      "cdc-spec-2", maxRetries = 1) { (out, _) =>
      val byId = out.collect().map(o => (o.id, o.op) -> o).toMap
      assert(byId((7L, "insert")).error.nonEmpty, "expected key-constraint error")
    }
    assert(applied2)
  }
}
