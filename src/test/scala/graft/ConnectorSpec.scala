package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** K5/C4/C3/C2 connector seam: distributed create-if-absent with read-back
  * retry, exit-code-style dispatch (not-found is a value, failure is an
  * error row), and the rate-limited mapPartitions plumbing.
  */
class ConnectorSpec extends SparkTestBase {
  import spark.implicits._

  private def requests(ids: (Long, String)*): org.apache.spark.sql.Dataset[EnsureRequest] =
    ids.map { case (id, p) => EnsureRequest(id, p, uid = "u1", gid = "g1") }
      .toDS().repartition(2)

  test("K5: existing folder is read, not re-created") {
    val nsId = "k5-existing"
    FakeConnector.reset(nsId)
    val conn = new FakeConnector(nsId)
    conn.seed(NsMetadata(42L, "/home/u1/.sys.v#.a.dat", "u1", "g1", 0L))
    val before = FakeConnector.createCalls.get()
    val out = Connector.ensureVersionsFolders(
      requests(1L -> "/home/u1/.sys.v#.a.dat"), conn).collect()
    assert(out.toSeq == Seq(EnsureResult(1L, "/home/u1/.sys.v#.a.dat", Some(42L), None)))
    assert(FakeConnector.createCalls.get() == before)
  }

  test("K5: missing folder is created once and read back") {
    val nsId = "k5-create"
    FakeConnector.reset(nsId)
    val conn = new FakeConnector(nsId)
    val out = Connector.ensureVersionsFolders(
      requests(1L -> "/home/u1/.sys.v#.b.dat", 2L -> "/home/u1/.sys.v#.c.dat"), conn)
      .collect().sortBy(_.id)
    assert(out.forall(r => r.ino.isDefined && r.error.isEmpty))
    assert(conn.entries.keySet ==
      Set("/home/u1/.sys.v#.b.dat", "/home/u1/.sys.v#.c.dat"))
    // distinct inodes assigned
    assert(out.flatMap(_.ino).distinct.length == 2)
  }

  test("C3: replication lag is retried until the read-back succeeds") {
    val nsId = "c3-lag"
    FakeConnector.reset(nsId)
    val conn = new FakeConnector(nsId, lagReads = 2) // first 2 stats miss
    val out = Connector.ensureVersionsFolders(
      requests(1L -> "/home/u1/.sys.v#.lag.dat"), conn,
      maxRetries = 5).collect()
    assert(out.head.ino.isDefined && out.head.error.isEmpty)
  }

  test("C3: lag beyond maxRetries becomes an error row, not a task failure") {
    val nsId = "c3-exhausted"
    FakeConnector.reset(nsId)
    val conn = new FakeConnector(nsId, lagReads = 10)
    val out = Connector.ensureVersionsFolders(
      requests(1L -> "/home/u1/.sys.v#.slow.dat"), conn,
      maxRetries = 2).collect()
    assert(out.head.ino.isEmpty && out.head.error.isDefined)
  }

  test("C4: connector failure routes to the error channel; others continue") {
    val nsId = "c4-fail"
    FakeConnector.reset(nsId)
    val conn = new FakeConnector(nsId, failPaths = Set("/home/u1/.sys.v#.bad.dat"))
    val out = Connector.ensureVersionsFolders(
      requests(1L -> "/home/u1/.sys.v#.bad.dat", 2L -> "/home/u1/.sys.v#.ok.dat"), conn)
      .collect().sortBy(_.id)
    assert(out(0).error.exists(_.contains("connector failure")))
    assert(out(1).ino.isDefined && out(1).error.isEmpty)
  }

  test("missingFolderRequests selects exactly the REGULAR+miss residue") {
    val resolved = Seq(
      (1L, "REGULAR", null.asInstanceOf[java.lang.Long], "/h/.sys.v#.a", "5", "6"),
      (2L, "REGULAR", java.lang.Long.valueOf(9L), "/h/.sys.v#.b", "5", "6"),
      (3L, "VERSION", null.asInstanceOf[java.lang.Long], "/h/.sys.v#.c", "5", "6"),
      (4L, "ALREADY_MIGRATED", null.asInstanceOf[java.lang.Long], null, "5", "6"))
      .toDF("id", "decision", "versions_ino", "versions_path", "meta_uid", "meta_gid")
    val got = Connector.missingFolderRequests(resolved).collect().toSeq
    assert(got == Seq(EnsureRequest(1L, "/h/.sys.v#.a", "5", "6")))
  }

  test("C2: rate limiter spaces acquisitions") {
    val rl = new RateLimiter(100.0) // 10ms apart
    val t0 = System.nanoTime()
    (1 to 5).foreach(_ => rl.acquire())
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs >= 35.0, s"5 permits at 100/s took ${elapsedMs}ms (< 35ms)")
  }
}
