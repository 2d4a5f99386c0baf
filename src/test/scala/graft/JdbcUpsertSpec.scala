package graft

import org.apache.spark.sql.Encoders
import graft.operators._

/** K1 sink (main.go:217-240): prepared keyed upsert through the
  * connection seam, affected-rows validation, dry-run gating, and
  * per-partition statement reuse.
  */
class JdbcUpsertSpec extends SparkTestBase {

  private implicit val enc: org.apache.spark.sql.Encoder[UpsertRow] =
    Encoders.product[UpsertRow]

  private def changeset(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => UpsertRow(i, i.toString, s"/$i", i, s"/f$i.dat")).toDS()
  }

  test("affected-rows validation: 1 row = ok, 0 rows = share deleted (main.go:232-238)") {
    val store = "t-affected"
    FakeJdbcStore.reset(store)
    (1L to 10L).foreach(FakeJdbcStore.seed(store, _))
    val out = JdbcUpsert.write(changeset(1L to 12L), new FakeJdbcFactory(store))
      .collect().sortBy(_.id)
    assert(out.count(o => o.affected == 1 && o.error.isEmpty) == 10)
    val dangling = out.filter(_.id > 10)
    assert(dangling.forall(o =>
      o.affected == 0 && o.error.contains(JdbcUpsert.ErrShareDeleted)))
    // the store holds the written values
    assert(FakeJdbcStore.rows(store)(7L) == Vector("7", "/7", 7L, "/f7.dat"))
  }

  test("dry-run writes NOTHING and reports would-be outcomes (main.go:219-221)") {
    val store = "t-dryrun"
    FakeJdbcStore.reset(store)
    (1L to 5L).foreach(FakeJdbcStore.seed(store, _))
    val before = FakeJdbcStore.rows(store)
    val out = JdbcUpsert.write(changeset(1L to 5L), new FakeJdbcFactory(store),
      dryRun = true).collect()
    assert(out.length == 5 && out.forall(o => o.affected == 0 && o.error.isEmpty))
    assert(FakeJdbcStore.rows(store) == before)
  }

  test("writeWithConf consumes spark.graft.notouchdb + spark.graft.debug") {
    val store = "t-conf"
    FakeJdbcStore.reset(store)
    (1L to 3L).foreach(FakeJdbcStore.seed(store, _))
    spark.conf.set("spark.graft.notouchdb", "true")
    spark.conf.set("spark.graft.debug", "true")
    try {
      val out = JdbcUpsert.writeWithConf(spark, changeset(1L to 3L),
        new FakeJdbcFactory(store)).collect()
      assert(out.forall(_.affected == 0)) // dry-run honored
      assert(FakeJdbcStore.rows(store)(2L) == Vector("", "", 0L, "")) // untouched
    } finally {
      spark.conf.unset("spark.graft.notouchdb")
      spark.conf.unset("spark.graft.debug")
    }
  }

  test("statement prepared once per non-empty partition (SURVEY §4 reuse)") {
    val store = "t-prepare"
    FakeJdbcStore.reset(store)
    (1L to 100L).foreach(FakeJdbcStore.seed(store, _))
    val p0 = FakeJdbcStore.prepareCalls.get()
    val out = JdbcUpsert.write(changeset(1L to 100L).repartition(4),
      new FakeJdbcFactory(store)).collect()
    assert(out.length == 100)
    val prepared = FakeJdbcStore.prepareCalls.get() - p0
    assert(prepared >= 1 && prepared <= 4, s"prepared $prepared times for 4 partitions")
  }

  // --- real JDBC path: embedded Derby (from the Spark jars dir) ---------

  private val derbyUrl = "jdbc:derby:memory:graftupsert;create=true"

  private def derbyAvailable: Boolean =
    try { java.sql.DriverManager.getConnection(derbyUrl).close(); true }
    catch {
      case _: Exception =>
        try { // Derby >=10.15 autoloads via this class; force-register then retry
          Class.forName("org.apache.derby.iapi.jdbc.AutoloadedDriver")
          java.sql.DriverManager.getConnection(derbyUrl).close(); true
        } catch { case _: Throwable => false }
    }

  test("DriverManagerUpsertFactory against embedded Derby: real prepared statements + affected rows") {
    assume(derbyAvailable, "Derby driver not on classpath")
    val setup = java.sql.DriverManager.getConnection(derbyUrl)
    try {
      val st = setup.createStatement()
      try st.execute("DROP TABLE oc_share") catch { case _: java.sql.SQLException => () }
      st.execute("""CREATE TABLE oc_share(
        id BIGINT PRIMARY KEY, item_source VARCHAR(64), item_target VARCHAR(64),
        file_source BIGINT, file_target VARCHAR(64))""")
      val ins = setup.prepareStatement("INSERT INTO oc_share VALUES (?, '', '', 0, '')")
      (1L to 10L).foreach { i => ins.setLong(1, i); ins.executeUpdate() }
      ins.close(); st.close()
    } finally setup.close()

    // multiple partitions = multiple concurrent embedded connections
    val out = JdbcUpsert.write(changeset(1L to 12L).repartition(3),
      new DriverManagerUpsertFactory(derbyUrl)).collect().sortBy(_.id)
    assert(out.count(o => o.affected == 1 && o.error.isEmpty) == 10)
    assert(out.filter(_.id > 10).forall(o =>
      o.affected == 0 && o.error.contains(JdbcUpsert.ErrShareDeleted)))

    // the database holds the written values
    val check = java.sql.DriverManager.getConnection(derbyUrl)
    try {
      val rs = check.createStatement().executeQuery(
        "SELECT item_source, item_target, file_source, file_target FROM oc_share WHERE id = 7")
      assert(rs.next())
      assert((rs.getString(1), rs.getString(2), rs.getLong(3), rs.getString(4)) ==
        (("7", "/7", 7L, "/f7.dat")))
    } finally check.close()
  }

  test("continue-on-error: a failing id becomes an error row, the rest commit") {
    val store = "t-fail"
    FakeJdbcStore.reset(store)
    (1L to 6L).foreach(FakeJdbcStore.seed(store, _))
    val out = JdbcUpsert.write(changeset(1L to 6L),
      new FakeJdbcFactory(store, failIds = Set(4L)), maxRetries = 2)
      .collect().sortBy(_.id)
    val failed = out.filter(_.id == 4L)
    assert(failed.length == 1 && failed.head.affected == -1 &&
      failed.head.error.exists(_.contains("connection lost")))
    assert(out.count(o => o.affected == 1 && o.error.isEmpty) == 5)
    assert(FakeJdbcStore.rows(store)(5L) == Vector("5", "/5", 5L, "/f5.dat"))
    assert(FakeJdbcStore.rows(store)(4L) == Vector("", "", 0L, "")) // not written
  }
}
