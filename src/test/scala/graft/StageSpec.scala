package graft

import java.nio.file.Files
import graft.operators.Stage

/** Stage-table root configuration: `spark.graft.stageDir` routes stage
  * writes (the knob a 100 TB deployment points at distributed storage);
  * unset falls back to the per-JVM tmp root.
  */
class StageSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("stage tables land under spark.graft.stageDir when set") {
    val dir = Files.createTempDirectory("graft-stagedir-test-").toString
    spark.conf.set(Stage.StageDirKey, dir)
    try {
      val staged = Stage.table(spark.range(10).toDF("id"), "conf_probe")
      assert(staged.count() == 10)
      val children = new java.io.File(dir).listFiles()
      assert(children != null && children.exists(_.getName.startsWith("conf_probe-")),
        s"no conf_probe-* under $dir")

      // sharedTable memoizes per (root, name, dir): same key scans, not rewrites
      var builds = 0
      def build = { builds += 1; spark.range(5).toDF("id") }
      val a = Stage.sharedTable(spark, "conf_shared", "x")(build)
      val b = Stage.sharedTable(spark, "conf_shared", "x")(build)
      assert(a.count() == 5 && b.count() == 5 && builds == 1)
      assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("conf_shared-")))
    } finally {
      spark.conf.unset(Stage.StageDirKey)
      Stage.resetShared()
    }
  }

  test("shared stages compose: building one inside another's thunk works") {
    // computeIfAbsent would throw "Recursive update" here — stages nest in
    // production (the component map builds over the band index, which
    // builds over the shingle stage), so nesting must be first-class
    try {
      var innerBuilds = 0
      def inner = Stage.sharedTable(spark, "nest_inner", "x") {
        innerBuilds += 1; spark.range(3).toDF("id")
      }
      val outer = Stage.sharedTable(spark, "nest_outer", "x") {
        inner.select(org.apache.spark.sql.functions.col("id"))
      }
      assert(outer.count() == 3 && innerBuilds == 1)
      assert(inner.count() == 3 && innerBuilds == 1) // memo hit after nesting
    } finally Stage.resetShared()
  }

  test("a concurrent duplicate build converges on one path and cleans the losing write") {
    val dir = Files.createTempDirectory("graft-stage-race-").toString
    spark.conf.set(Stage.StageDirKey, dir)
    try {
      // both threads must observe the memo EMPTY before either publishes,
      // forcing the duplicate-build race deterministically
      val bothEntered = new java.util.concurrent.CountDownLatch(2)
      import scala.concurrent.{Await, ExecutionContext, Future}
      // a dedicated 2-thread pool, NOT the global EC: on a 1-CPU host the
      // global pool has one thread, the latch never reaches zero, and the
      // race would go unexercised until the await timeout
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      val counts = try {
        Seq(1, 2).map { _ =>
          Future {
            Stage.sharedTable(spark, "race_probe", "x") {
              bothEntered.countDown()
              assert(bothEntered.await(30, java.util.concurrent.TimeUnit.SECONDS),
                "second builder never entered — race not exercised")
              spark.range(7).toDF("id")
            }.count()
          }
        }.map(Await.result(_, scala.concurrent.duration.Duration("120s")))
      } finally pool.shutdown()
      assert(counts == Seq(7L, 7L))
      // exactly one race_probe-* dir survives: the loser deleted its copy
      val probes = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("race_probe-"))
      assert(probes.length == 1, s"expected one surviving stage dir, got ${probes.toSeq}")
    } finally {
      spark.conf.unset(Stage.StageDirKey)
      Stage.resetShared()
    }
  }

  test("unset stageDir falls back to tmp root and queries stay green") {
    // a Stage-using query end-to-end with the default root
    val out = SparkEntry.queries("d01_dedup_exact")(spark, sfDir)
    assert(out.count() > 0)
  }

  test("a Stage-using oracle query is green with a non-default stageDir") {
    val dir = Files.createTempDirectory("graft-stagedir-q-").toString
    spark.conf.set(Stage.StageDirKey, dir)
    Stage.resetShared() // drop memo entries built under the default root
    try {
      val out = SparkEntry.queries("d02_minhash_lsh")(spark, sfDir)
      assert(out.count() > 0)
      assert(new java.io.File(dir).listFiles().nonEmpty, s"no stage files under $dir")
    } finally {
      spark.conf.unset(Stage.StageDirKey)
      Stage.resetShared()
    }
  }

  test("Rolling slot: a 10-round loop leaves O(1) live dirs, older rounds deleted") {
    val dir = Files.createTempDirectory("graft-rolling-").toString
    spark.conf.set(Stage.StageDirKey, dir)
    try {
      import spark.implicits._
      val roll = new Stage.Rolling(keep = 2)
      var state = roll.table(Seq(1L, 2L, 3L).toDF("x"), "roll_state")
      for (_ <- 1 to 10) {
        // the standard loop shape: next state scans the previous round
        state = roll.table(
          state.select((org.apache.spark.sql.functions.col("x") + 1).as("x")),
          "roll_state")
      }
      assert(state.collect().map(_.getLong(0)).sorted.toSeq == Seq(11L, 12L, 13L),
        "rolling loop corrupted the state")
      val onDisk = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("roll_state-"))
      assert(onDisk.length == 2,
        s"expected 2 live round dirs (keep=2), found ${onDisk.length}: ${onDisk.toSeq}")
      assert(roll.liveDirs.size == 2)
      // the live dirs are the LAST two rounds (eviction is FIFO)
      assert(roll.liveDirs.forall(p => new java.io.File(p).exists()))
    } finally {
      spark.conf.unset(Stage.StageDirKey)
      Stage.resetShared()
    }
  }

  test("iterative operators through Rolling leave O(1) cc_labels dirs") {
    val dir = Files.createTempDirectory("graft-rolling-cc-").toString
    spark.conf.set(Stage.StageDirKey, dir)
    Stage.resetShared()
    try {
      import spark.implicits._
      // a 12-vertex chain forces ~6 label-propagation rounds
      val pairs = (0L until 11L).map(i => (i, i + 1)).toDF("a", "b")
      val comp = graft.operators.DedupClusters
        .connectedComponents(pairs, "a", "b", maxIter = 20)
      assert(comp.select("component").distinct().count() == 1L)
      val labelDirs = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cc_labels-"))
      assert(labelDirs.length <= 2,
        s"cc loop accumulated ${labelDirs.length} label dirs — rolling cleanup broken")
    } finally {
      spark.conf.unset(Stage.StageDirKey)
      Stage.resetShared()
    }
  }
}
