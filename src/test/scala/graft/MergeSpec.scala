package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Keyed MERGE: functional semantics (partial update / delete /
  * WHEN-NOT-MATCHED insert), the duplicate-key pre-flight, and the
  * physical JDBC path — including functional/physical parity against
  * embedded Derby.
  */
class MergeSpec extends SparkTestBase {

  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
    .toDF("id", "name", "v")

  private def cs = Seq(
    (Merge.OpUpdate, 2L, null.asInstanceOf[String], java.lang.Long.valueOf(99L)),
    (Merge.OpDelete, 3L, null.asInstanceOf[String], null.asInstanceOf[java.lang.Long]),
    (Merge.OpInsert, 5L, "e", java.lang.Long.valueOf(50L)),
    (Merge.OpInsert, 1L, "DUP", java.lang.Long.valueOf(0L))) // matched insert -> ignored
    .toDF("op", "id", "name", "v")

  test("functional merge: partial update, delete, insert, matched-insert ignored") {
    val out = Merge(base, cs, "id").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (1L, "a", 10L),  // untouched; the matched insert did NOT duplicate it
      (2L, "b", 99L),  // v updated, null name kept base value
      (4L, "d", 40L),  // id 3 deleted
      (5L, "e", 50L))) // not-matched insert applied
  }

  test("update of a missing key is a no-op; duplicateKeys flags multi-change keys") {
    val cs2 = Seq(
      (Merge.OpUpdate, 77L, "x", java.lang.Long.valueOf(1L)),
      (Merge.OpUpdate, 2L, "y", java.lang.Long.valueOf(1L)),
      (Merge.OpDelete, 2L, null.asInstanceOf[String], null.asInstanceOf[java.lang.Long]))
      .toDF("op", "id", "name", "v")
    assert(Merge(base, cs2.where(col("id") === 77L), "id").count() == base.count())
    val dup = Merge.duplicateKeys(cs2, "id").collect()
    assert(dup.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2L, 2L)))
  }

  test("'__set_null' is a reserved name: a base table owning it is " +
    "rejected (by merge and at table birth)") {
    val poisoned = base.withColumn(Merge.SetNullCol,
      array(lit("name")))
    val e = intercept[IllegalArgumentException] {
      Merge(poisoned, cs.withColumn(Merge.SetNullCol,
        lit(null).cast("array<string>")), "id")
    }
    assert(e.getMessage.contains("reserved"), e.getMessage)
    val dir = java.nio.file.Files.createTempDirectory("setnull").toString + "/t"
    val e2 = intercept[IllegalArgumentException] {
      SnapshotLog.init(spark, dir, poisoned, "id", numFiles = 1)
    }
    assert(e2.getMessage.contains("reserved"), e2.getMessage)
  }

  test("changeset lacking payload columns fails loudly") {
    val bad = Seq((Merge.OpUpdate, 2L, "x")).toDF("op", "id", "name")
    val e = intercept[IllegalArgumentException](Merge(base, bad, "id"))
    assert(e.getMessage.contains("v"))
  }

  test("dry-run physical merge reports outcomes and touches nothing") {
    val changes = Seq(
      MergeChange(Merge.OpUpdate, 1L, "1", "/1", 1L, "/f1"),
      MergeChange(Merge.OpDelete, 2L, null, null, null, null)).toDS()
    val out = Merge.execute(changes, new FakeJdbcFactory("merge-dry"), dryRun = true)
      .collect()
    assert(out.length == 2 && out.forall(o => o.affected == 0 && o.error.isEmpty))
  }

  // --- physical path against embedded Derby + parity with functional ----

  private val derbyUrl = "jdbc:derby:memory:graftmerge;create=true"

  private def derbyAvailable: Boolean =
    try { java.sql.DriverManager.getConnection(derbyUrl).close(); true }
    catch {
      case _: Exception =>
        try {
          Class.forName("org.apache.derby.iapi.jdbc.AutoloadedDriver")
          java.sql.DriverManager.getConnection(derbyUrl).close(); true
        } catch { case _: Throwable => false }
    }

  test("physical merge against Derby matches the functional merge row-for-row") {
    assume(derbyAvailable, "Derby driver not on classpath")
    val setup = java.sql.DriverManager.getConnection(derbyUrl)
    try {
      val st = setup.createStatement()
      try st.execute("DROP TABLE oc_share") catch { case _: java.sql.SQLException => () }
      st.execute("""CREATE TABLE oc_share(
        id BIGINT PRIMARY KEY, item_source VARCHAR(64), item_target VARCHAR(64),
        file_source BIGINT, file_target VARCHAR(64))""")
      val ins = setup.prepareStatement("INSERT INTO oc_share VALUES (?, ?, ?, ?, ?)")
      (1L to 8L).foreach { i =>
        ins.setLong(1, i); ins.setString(2, i.toString); ins.setString(3, s"/$i")
        ins.setLong(4, i); ins.setString(5, s"/f$i.dat"); ins.executeUpdate()
      }
      ins.close(); st.close()
    } finally setup.close()

    // update 2 and 4, delete 3 and the absent 99 (idempotent), insert 9;
    // the duplicate insert of id 1 must surface on the error channel
    // (Derby's key constraint = the strict matched-insert signal)
    val changes = Seq(
      MergeChange(Merge.OpUpdate, 2L, "u2", "/u2", 22L, "/fu2"),
      MergeChange(Merge.OpUpdate, 4L, "u4", "/u4", 44L, "/fu4"),
      MergeChange(Merge.OpUpdate, 55L, "x", "/x", 0L, "/x"),
      MergeChange(Merge.OpDelete, 3L, null, null, null, null),
      MergeChange(Merge.OpDelete, 99L, null, null, null, null),
      MergeChange(Merge.OpInsert, 9L, "9", "/9", 9L, "/f9.dat"),
      MergeChange(Merge.OpInsert, 1L, "clash", "/c", 0L, "/c")).toDS()
    val out = Merge.execute(changes.repartition(3),
        new DriverManagerUpsertFactory(derbyUrl), maxRetries = 1)
      .collect().map(o => (o.id, o.op) -> o).toMap
    assert(out((2L, "update")).affected == 1 && out((4L, "update")).affected == 1)
    assert(out((55L, "update")).error.contains(JdbcUpsert.ErrShareDeleted))
    assert(out((3L, "delete")).affected == 1)
    assert(out((99L, "delete")).affected == 0 && out((99L, "delete")).error.isEmpty)
    assert(out((9L, "insert")).affected == 1)
    assert(out((1L, "insert")).affected == -1 && out((1L, "insert")).error.nonEmpty)

    // parity: the table Derby now holds == the functional merge of the
    // same changeset (matched insert ignored functionally, rejected
    // physically — same final table either way)
    val baseDf = (1L to 8L).map(i => (i, i.toString, s"/$i", i, s"/f$i.dat"))
      .toDF("id", "item_source", "item_target", "file_source", "file_target")
    val csDf = changes.toDF()
      .select(col("op"), col("id"), col("new_item_source").as("item_source"),
        col("new_item_target").as("item_target"),
        col("new_file_source").as("file_source"),
        col("new_file_target").as("file_target"))
    val functional = Merge(baseDf, csDf, "id").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4))).toSeq
    val check = java.sql.DriverManager.getConnection(derbyUrl)
    val physical = try {
      val rs = check.createStatement().executeQuery(
        "SELECT id, item_source, item_target, file_source, file_target FROM oc_share ORDER BY id")
      Iterator.continually(rs).takeWhile(_.next())
        .map(r => (r.getLong(1), r.getString(2), r.getString(3),
          r.getLong(4), r.getString(5))).toList
    } finally check.close()
    assert(functional == physical,
      s"functional/physical divergence:\n$functional\nvs\n$physical")
  }
}
