package graft

import java.nio.file.Files
import scala.sys.process.{Process, ProcessLogger}
import graft.operators.SnapshotLog

/** END-TO-END multi-process commit race: two SEPARATE JVMs (own
  * SparkSessions, own filesystem handles — nothing shared but the table
  * directory) race interleaved merges against one snapshot table while
  * this JVM runs concurrent VACUUMs. This is the validation the
  * in-process two-thread test cannot give: the exclusive-create commit
  * must hold across process boundaries (on a local filesystem that
  * means a kernel O_EXCL create — Hadoop's exists-then-truncate local
  * create has a cross-process TOCTOU window this spec exists to catch).
  *
  * Pass criteria: both writers exit 0 (every commit landed, losers
  * retried and re-planned); the version line is exactly one version per
  * commit (serialization — no version was won twice); the final table
  * holds EVERY key both writers inserted (no lost update — a truncated
  * or double-won manifest would drop rows); and the concurrent vacuums
  * honored the grace window (every retained version stays readable).
  */
class SnapshotRaceSpec extends SparkTestBase {

  test("two JVMs racing merges + concurrent vacuum: serialized commits, no lost updates") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_race").toString + "/t"
    SnapshotLog.init(spark, dir, Seq((0L, 0L)).toDF("id", "w"), "id", numFiles = 1)

    val n = 6
    val cp = sys.props("java.class.path")
    def spawn(w: Int) = Process(Seq(
      "java", "-Xmx3g", "--enable-native-access=ALL-UNNAMED",
      "-cp", cp, "graft.tools.RaceWriter", dir, w.toString, n.toString))
      .run(ProcessLogger(_ => (), _ => ()))
    val p1 = spawn(1)
    val p2 = spawn(2)

    // concurrent maintenance from a THIRD party (this JVM): expire all
    // but the newest 3 versions while the writers race. The 15-minute
    // grace window must keep every just-staged data file alive.
    var vacuums = 0
    val deadline = System.currentTimeMillis() + 5 * 60 * 1000
    while ((p1.isAlive() || p2.isAlive()) && System.currentTimeMillis() < deadline) {
      Thread.sleep(1000)
      val vs = SnapshotLog.versions(spark, dir)
      if (vs.size > 3) {
        SnapshotLog.vacuum(spark, dir, retainFrom = vs.max - 2)
        vacuums += 1
      }
    }
    assert(!p1.isAlive() && !p2.isAlive(), "race writers hung past the deadline")
    assert(p1.exitValue() == 0, "writer 1 failed — retries exhausted or state corrupted")
    assert(p2.exitValue() == 0, "writer 2 failed — retries exhausted or state corrupted")

    // one version per commit: init + 2n merges, retained tail contiguous
    val vs = SnapshotLog.versions(spark, dir)
    assert(vs.last == 2L * n,
      s"expected head version ${2 * n} (one per commit), got ${vs.last}")
    assert(vs == (vs.head to vs.last),
      s"retained version line has holes: $vs")
    assert(vacuums > 0, "the race finished before any concurrent vacuum ran — vacuous")

    // no lost updates: every key both writers committed is present
    val got = SnapshotLog.readLatest(spark, dir)
      .select("id").as[Long].collect().toSet
    val want = (0 until n).flatMap(i =>
      Seq(1000000L + i, 2000000L + i)).toSet + 0L
    assert(got == want,
      s"lost update: missing ${want -- got}, phantom ${got -- want}")

    // grace honored: every retained version still fully readable
    vs.foreach { v =>
      assert(SnapshotLog.read(spark, dir, v).count() >= 1,
        s"version $v lost data files to a concurrent vacuum")
    }
  }

  test("two JVMs racing MIXED op kinds (merge/delete/OPTIMIZE WHERE/compact): no lost updates, CDC still folds") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_race_mixed").toString + "/t"
    SnapshotLog.init(spark, dir, Seq((0L, 0L)).toDF("id", "w"), "id", numFiles = 1)

    val n = 8
    val cp = sys.props("java.class.path")
    def spawn(w: Int) = Process(Seq(
      "java", "-Xmx3g", "--enable-native-access=ALL-UNNAMED",
      "-cp", cp, "graft.tools.RaceWriter", dir, w.toString, n.toString, "mixed"))
      .run(ProcessLogger(_ => (), _ => ()))
    val p1 = spawn(1)
    val p2 = spawn(2)
    val deadline = System.currentTimeMillis() + 5 * 60 * 1000
    while ((p1.isAlive() || p2.isAlive()) && System.currentTimeMillis() < deadline)
      Thread.sleep(1000)
    assert(!p1.isAlive() && !p2.isAlive(), "mixed race writers hung")
    // non-zero exit = a writer SAW a lost update mid-race (RaceWriter
    // asserts its own live key set after every step) or exhausted retries
    assert(p1.exitValue() == 0, "writer 1 failed mid-race")
    assert(p2.exitValue() == 0, "writer 2 failed mid-race")

    // serialized: the version line is contiguous (no double-won version)
    val vs = SnapshotLog.versions(spark, dir)
    assert(vs == (vs.head to vs.last), s"version line has holes: $vs")

    // no lost updates across op KINDS: final set = inserts minus deletes
    def keysOf(w: Long) = (0 until n).map(w * 1000000L + _).toSet --
      (2 until n by 3).map(j => w * 1000000L + (j - 1)).toSet
    val got = SnapshotLog.readLatest(spark, dir)
      .select("id").as[Long].collect().toSet
    val want = keysOf(1L) ++ keysOf(2L) + 0L
    assert(got == want,
      s"lost update: missing ${want -- got}, phantom ${got -- want}")

    // CDC stays sound through the interleaved compactions: applying the
    // last version step's changes to the previous version IS the latest
    // table (cdc output is a Merge changeset by contract)
    val vLast = vs.last
    val changes = SnapshotLog.cdc(spark, dir, vLast - 1, vLast, "id")
    val applied = graft.operators.Merge(
      SnapshotLog.read(spark, dir, vLast - 1), changes, "id")
    val expected = SnapshotLog.read(spark, dir, vLast)
    assert(applied.orderBy("id").collect().toSeq ==
      expected.orderBy("id").collect().toSeq,
      "cdc between the final versions does not fold to the live table")
  }
}
