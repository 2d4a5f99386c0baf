package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Merge, SnapshotLog, SyntheticShares, ConcurrentCommitException}
import graft.queries.MigrationQueries.Merge0

/** Manifest-committed versioned table: time travel, file sharing across
  * versions, exclusive-create commit races, file-diff CDC, vacuum.
  */
class SnapshotLogSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def base: DataFrame = SyntheticShares.shares(Tables.orders(spark, sfDir))

  private def rows(df: DataFrame): Seq[String] =
    df.select(col("id"), col("share_type"), col("uid_owner"), col("item_type"),
        col("item_source"), col("item_target"), col("file_source"), col("file_target"))
      .collect().map(_.mkString("|")).sorted.toSeq

  /** Narrow changeset over the lowest key decile (CowMergeSpec's shape):
    * updates %5, deletes %9, one fresh insert far above the range.
    */
  private def narrowChangeset(b: DataFrame): DataFrame = {
    val maxId = b.agg(max("id")).head().getLong(0)
    val cut = maxId / 10
    val nullS = lit(null).cast("string")
    val nullI = lit(null).cast("int")
    val nullL = lit(null).cast("long")
    val csUpd = b.where(col("id") <= cut && col("id") % 5 === 0 && col("id") % 9 =!= 0)
      .select(lit(Merge.OpUpdate).as("op"), col("id"),
        nullI.as("share_type"), nullS.as("uid_owner"), nullS.as("item_type"),
        nullS.as("item_source"),
        concat(lit("/snap/"), col("id").cast("string")).as("item_target"),
        nullL.as("file_source"), nullS.as("file_target"))
    val csDel = b.where(col("id") <= cut && col("id") % 9 === 0)
      .select(lit(Merge.OpDelete).as("op"), col("id"),
        nullI.as("share_type"), nullS.as("uid_owner"), nullS.as("item_type"),
        nullS.as("item_source"), nullS.as("item_target"),
        nullL.as("file_source"), nullS.as("file_target"))
    import spark.implicits._
    val csIns = Seq((Merge.OpInsert, maxId + 1000L, 3, "snap_user", "file", "x",
      "/snap/new", 7L, "/n.dat"))
      .toDF("op", "id", "share_type", "uid_owner", "item_type",
        "item_source", "item_target", "file_source", "file_target")
    csUpd.unionByName(csDel).unionByName(csIns)
  }

  test("latest-version pointer: commits refresh _log/_latest; a stale, " +
    "missing or corrupt hint falls back to the listing") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("hint").toString + "/t"
    SnapshotLog.init(spark, dir,
      spark.range(0, 10).selectExpr("id", "id AS x"), "id", 1)
    SnapshotLog.deleteKeys(spark, dir,
      spark.range(0, 1).selectExpr("id"), "id")
    val hint = new Path(s"$dir/_log/_latest")
    val hfs = hint.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(hfs.exists(hint), "every commit must refresh the pointer")
    assert(SnapshotLog.latestVersion(spark, dir) == 1L)

    // STALE hint (points below a committed successor): read-verify
    // detects the successor and falls back to the listing
    val out = hfs.create(hint, true)
    out.write("0".getBytes("UTF-8")); out.close()
    assert(SnapshotLog.latestVersion(spark, dir) == 1L,
      "a stale hint must never hide a committed version")

    // CORRUPT hint: fallback, not failure
    val out2 = hfs.create(hint, true)
    out2.write("not-a-number".getBytes("UTF-8")); out2.close()
    assert(SnapshotLog.latestVersion(spark, dir) == 1L)

    // MISSING hint (foreign tool removed it): fallback, and the next
    // commit re-creates it
    hfs.delete(hint, false)
    assert(SnapshotLog.latestVersion(spark, dir) == 1L)
    SnapshotLog.deleteKeys(spark, dir,
      spark.range(1, 2).selectExpr("id"), "id")
    assert(hfs.exists(hint))
    assert(SnapshotLog.latestVersion(spark, dir) == 2L)

    // hint AHEAD of reality (crashed writer wrote it for a manifest that
    // never landed — not our ordering, but a foreign tool's): fallback
    val out3 = hfs.create(hint, true)
    out3.write("99".getBytes("UTF-8")); out3.close()
    assert(SnapshotLog.latestVersion(spark, dir) == 2L)
  }

  test("time travel: v0 stays readable after the merge; versions share untouched files") {
    val dir = Files.createTempDirectory("graft_snap").toString + "/t"
    val b = base
    SnapshotLog.init(spark, dir, b, "id", numFiles = 8)
    val baseRows = rows(b)
    assert(rows(SnapshotLog.read(spark, dir, 0)) == baseRows)

    val cs = narrowChangeset(b)
    val commit = SnapshotLog.merge(spark, dir, cs, "id")
    assert(commit.version == 1L)
    assert(SnapshotLog.versions(spark, dir) == Seq(0L, 1L))

    // v1 is the functional merge; v0 is STILL the base — time travel
    assert(rows(SnapshotLog.read(spark, dir, 1)) == rows(Merge(b, cs, "id")))
    assert(rows(SnapshotLog.read(spark, dir, 0)) == baseRows)

    // untouched files are SHARED by reference: same names in both
    // manifests (same physical file — byte identity is free), and the
    // narrow changeset must leave most files shared
    val m0 = SnapshotLog.manifest(spark, dir, 0).toSet
    val m1 = SnapshotLog.manifest(spark, dir, 1).toSet
    assert((m0 & m1).size == commit.report.nUntouched)
    assert(commit.report.nRewritten > 0 &&
      commit.report.nRewritten < commit.report.nFilesBefore,
      s"fixture degenerate: ${commit.report.nRewritten} of ${commit.report.nFilesBefore}")
  }

  test("commit is exclusive-create: the version-race loser throws, the winner stands") {
    val dir = Files.createTempDirectory("graft_snap2").toString + "/t"
    val b = base
    SnapshotLog.init(spark, dir, b, "id", numFiles = 4)
    val table = new org.apache.hadoop.fs.Path(dir)
    val names = SnapshotLog.manifest(spark, dir, 0)
    // racer wins version 1 (a no-op commit re-referencing v0's files)
    SnapshotLog.commit(spark, table, 1L, names)
    // the loser of the same version number must throw, not overwrite
    intercept[ConcurrentCommitException] {
      SnapshotLog.commit(spark, table, 1L, names.take(1))
    }
    assert(SnapshotLog.manifest(spark, dir, 1) == names.sorted,
      "loser overwrote the winner's manifest")
    // the optimistic-concurrency recovery: re-read latest, re-plan — the
    // next merge lands at version 2 on top of the racer's commit
    val c = SnapshotLog.merge(spark, dir, narrowChangeset(b), "id")
    assert(c.version == 2L)
    assert(SnapshotLog.versions(spark, dir) == Seq(0L, 1L, 2L))
  }

  test("cdc equals the brute-force version diff and reads only non-shared files") {
    val dir = Files.createTempDirectory("graft_snap3").toString + "/t"
    val b = base
    SnapshotLog.init(spark, dir, b, "id", numFiles = 8)
    SnapshotLog.merge(spark, dir, narrowChangeset(b), "id")

    val v0 = SnapshotLog.read(spark, dir, 0)
    val v1 = SnapshotLog.read(spark, dir, 1)
    def keyed(df: DataFrame): Map[Long, String] =
      df.collect().map(r => r.getLong(r.fieldIndex("id")) -> r.mkString("|")).toMap
    val beforeM = keyed(v0)
    val afterM = keyed(v1)
    val expected = (
      (beforeM.keySet -- afterM.keySet).map(k => s"delete|$k") ++
        (afterM.keySet -- beforeM.keySet).map(k => s"insert|$k") ++
        (beforeM.keySet & afterM.keySet).collect {
          case k if beforeM(k) != afterM(k) => s"update|$k"
        }).toSeq.sorted

    val cdc = SnapshotLog.cdc(spark, dir, 0, 1, "id")
    val got = cdc.select("op", "id").collect()
      .map(r => s"${r.getString(0)}|${r.getLong(1)}").sorted.toSeq
    assert(got == expected, "cdc diverged from brute-force version diff")
    assert(got.nonEmpty)

    // after-image: update rows carry the merged payload, deletes null payload
    val upd = cdc.where(col("op") === Merge.OpUpdate)
    assert(upd.where(!col("item_target").startsWith("/snap/")).isEmpty)
    assert(cdc.where(col("op") === Merge.OpDelete)
      .where(col("item_target").isNotNull).isEmpty)

    // the scale fact: cdc scans ONLY files outside the shared set
    val m0 = SnapshotLog.manifest(spark, dir, 0).toSet
    val m1 = SnapshotLog.manifest(spark, dir, 1).toSet
    val sharedNames = m0 & m1
    val scanned = cdc.inputFiles.map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
    assert(scanned.nonEmpty && scanned.intersect(sharedNames).isEmpty,
      s"cdc read shared files: ${scanned.intersect(sharedNames)}")

    // identical versions diff to nothing
    assert(SnapshotLog.cdc(spark, dir, 1, 1, "id").isEmpty)
  }

  test("a merge chain replays: v2 == merge(merge(base, A), B); cross-version cdc works") {
    val dir = Files.createTempDirectory("graft_snap4").toString + "/t"
    val b = base
    SnapshotLog.init(spark, dir, b, "id", numFiles = 8)
    val csA = narrowChangeset(b)
    SnapshotLog.merge(spark, dir, csA, "id")
    val afterA = Merge(b, csA, "id")
    val csB = Merge0.changeset(b).where(col("op") =!= Merge.OpInsert)
    SnapshotLog.merge(spark, dir, csB, "id")
    assert(rows(SnapshotLog.read(spark, dir, 2)) == rows(Merge(afterA, csB, "id")))
    // non-adjacent diff: same file-diff machinery, v0 vs v2
    val keys0 = SnapshotLog.read(spark, dir, 0).select("id").collect()
      .map(_.getLong(0)).toSet
    val keys2 = SnapshotLog.read(spark, dir, 2).select("id").collect()
      .map(_.getLong(0)).toSet
    val cdc02 = SnapshotLog.cdc(spark, dir, 0, 2, "id")
    assert(cdc02.where(col("op") === Merge.OpDelete).count() == (keys0 -- keys2).size)
    assert(cdc02.where(col("op") === Merge.OpInsert).count() == (keys2 -- keys0).size)
  }

  test("vacuum drops expired manifests, their exclusive files, and crash orphans") {
    val dir = Files.createTempDirectory("graft_snap5").toString + "/t"
    val b = base
    SnapshotLog.init(spark, dir, b, "id", numFiles = 8)
    SnapshotLog.merge(spark, dir, narrowChangeset(b), "id")
    val v1Rows = rows(SnapshotLog.read(spark, dir, 1))
    // a crash orphan: staged but never committed
    val orphan = new java.io.File(s"$dir/data/part-orphan-never-committed.parquet")
    val ow = new java.io.FileWriter(orphan); ow.write("x"); ow.close()

    val m0 = SnapshotLog.manifest(spark, dir, 0).toSet
    val m1 = SnapshotLog.manifest(spark, dir, 1).toSet
    // a PLANNED time-travel read of the retained version, issued before
    // the vacuum — the reader contract: retained versions survive
    val retainedRead = SnapshotLog.read(spark, dir, 1)
    val (nManifests, nFiles) = SnapshotLog.vacuum(spark, dir, retainFrom = 1,
      graceMs = 0L)
    assert(nManifests == 1)
    assert(nFiles == (m0 -- m1).size + 1, "expected v0-exclusive files + the orphan")
    assert(!orphan.exists)
    assert(SnapshotLog.versions(spark, dir) == Seq(1L))
    // the retained version is untouched — including the mid-scan reader
    assert(rows(retainedRead) == v1Rows)
    assert(rows(SnapshotLog.read(spark, dir, 1)) == v1Rows)
    // retaining nothing is refused
    intercept[IllegalArgumentException] {
      SnapshotLog.vacuum(spark, dir, retainFrom = 99, graceMs = 0L)
    }
  }

  test("vacuum grace window: young unreferenced files (in-flight commits) survive; stale stage dirs are swept") {
    val dir = Files.createTempDirectory("graft_snapg").toString + "/t"
    val b = base
    SnapshotLog.init(spark, dir, b, "id", numFiles = 4)
    SnapshotLog.merge(spark, dir, narrowChangeset(b), "id")
    // a FRESH orphan — indistinguishable from a concurrent commit's just-
    // staged data file (staged under data/ BEFORE its manifest create)
    val fresh = new java.io.File(s"$dir/data/part-inflight-commit.parquet")
    val fw = new java.io.FileWriter(fresh); fw.write("x"); fw.close()
    // a STALE crashed-stage scratch dir (writer died before its renames)
    val staleStage = new java.io.File(s"$dir/.stage-deadbeef")
    staleStage.mkdirs()
    val sf = new java.io.File(staleStage, "part-crashed.parquet")
    val sw = new java.io.FileWriter(sf); sw.write("y"); sw.close()
    staleStage.setLastModified(System.currentTimeMillis() - 3600L * 1000)

    val m0 = SnapshotLog.manifest(spark, dir, 0).toSet
    val m1 = SnapshotLog.manifest(spark, dir, 1).toSet
    // default grace: NO young unreferenced file is deleted — not the
    // orphan (it may be an in-flight commit's staged data) and not even
    // v0's just-expired exclusive files (a reader may still be scanning
    // them; they wait out the grace window, Delta's retention rule) —
    // while the STALE stage dir is reclaimed
    val (nM, nF) = SnapshotLog.vacuum(spark, dir, retainFrom = 1)
    assert(nM == 1)
    assert(fresh.exists, "grace window violated: fresh unreferenced file deleted")
    assert(!staleStage.exists, "stale .stage-* scratch not reclaimed")
    assert(nF == 1, "expected exactly the stale stage orphan")
    // once the grace expires (forced here via graceMs = 0), the expired
    // version's files and the orphan are reclaimed on the next sweep
    val (_, nF2) = SnapshotLog.vacuum(spark, dir, retainFrom = 1, graceMs = 0L)
    assert(nF2 == (m0 -- m1).size + 1, "expected v0-exclusive files + the orphan")
    assert(!fresh.exists)
  }

  test("commitWithRetry: the race loser re-plans and lands; both writers' commits stand") {
    val dir = Files.createTempDirectory("graft_snapr").toString + "/t"
    val b = base
    SnapshotLog.init(spark, dir, b, "id", numFiles = 4)
    val table = new org.apache.hadoop.fs.Path(dir)
    val v0Names = SnapshotLog.manifest(spark, dir, 0)

    // writer A plans against the version it read, but writer B commits
    // that version first (the injected interleaving) — A's first attempt
    // throws ConcurrentCommitException; the retry re-reads the log and
    // lands on top of B
    var attempts = 0
    SnapshotLog.commitWithRetry(maxAttempts = 3) {
      val v = SnapshotLog.latestVersion(spark, dir)
      attempts += 1
      if (attempts == 1) // B sneaks in between A's read and A's create
        SnapshotLog.commit(spark, table, v + 1, v0Names, meta = Seq("writer=B"))
      SnapshotLog.commit(spark, table, v + 1, v0Names, meta = Seq("writer=A"))
    }
    assert(attempts == 2, s"expected one race retry, took $attempts attempts")
    assert(SnapshotLog.versions(spark, dir) == Seq(0L, 1L, 2L))
    assert(SnapshotLog.manifestMeta(spark, dir, 1).contains("writer=B"))
    assert(SnapshotLog.manifestMeta(spark, dir, 2).contains("writer=A"))

    // exhausted retries rethrow the race signal
    intercept[ConcurrentCommitException] {
      SnapshotLog.commitWithRetry(maxAttempts = 2) {
        SnapshotLog.commit(spark, table, 1L, v0Names)
      }
    }
  }

  test("two CONCURRENT mergers with commitWithRetry serialize; final state = composed merges") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_snapc").toString + "/t"
    val b = base
    SnapshotLog.init(spark, dir, b, "id", numFiles = 4)
    // disjoint update-only changesets (commute, so the final state is
    // order-independent): writer A moves %4 targets, writer B %4+1
    def cs(residue: Int, tag: String): DataFrame = {
      val nullS = lit(null).cast("string")
      b.where(col("id") % 4 === residue)
        .select(lit(Merge.OpUpdate).as("op"), col("id"),
          lit(null).cast("int").as("share_type"), nullS.as("uid_owner"),
          nullS.as("item_type"), nullS.as("item_source"),
          concat(lit(s"/$tag/"), col("id").cast("string")).as("item_target"),
          lit(null).cast("long").as("file_source"), nullS.as("file_target"))
    }
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(residue: Int, tag: String) = new Thread(() =>
      try {
        barrier.await() // both mergers plan against the same base version
        SnapshotLog.commitWithRetry(maxAttempts = 5) {
          SnapshotLog.merge(spark, dir, cs(residue, tag), "id")
        }
        ()
      } catch { case t: Throwable => errs.add(t) })
    val (t1, t2) = (writer(0, "wa"), writer(1, "wb"))
    t1.start(); t2.start(); t1.join(120000); t2.join(120000)
    assert(errs.isEmpty, s"concurrent merger failed: ${errs.peek()}")
    assert(SnapshotLog.versions(spark, dir) == Seq(0L, 1L, 2L),
      "both mergers must land, serially")
    val expected = rows(Merge(Merge(b, cs(0, "wa"), "id"), cs(1, "wb"), "id"))
    assert(rows(SnapshotLog.readLatest(spark, dir)) == expected,
      "concurrent merges lost an update")
  }

  test("commit-time range stamps equal footer ranges; unstamped manifests fall back to footers") {
    import graft.operators.CowMerge
    val dir = Files.createTempDirectory("graft_snaprg").toString + "/t"
    val b = base
    SnapshotLog.init(spark, dir, b, "id", numFiles = 8)
    SnapshotLog.merge(spark, dir, narrowChangeset(b), "id")

    def footerRanges(v: Long) = CowMerge.keyRangesOf(spark,
      SnapshotLog.manifest(spark, dir, v)
        .map(n => new org.apache.hadoop.fs.Path(s"$dir/data/$n")), "id")
      .map(st => (st.file, st.lo, st.hi, st.hasStats)).sortBy(_._1)
    def stamped(v: Long) = SnapshotLog.keyRangesOfVersion(spark, dir, v, "id")
      .map(st => (st.file, st.lo, st.hi, st.hasStats)).sortBy(_._1)

    // every committed version carries stamps identical to the footers
    (0L to 1L).foreach { v =>
      assert(SnapshotLog.manifestMeta(spark, dir, v).exists(_.startsWith("range=")),
        s"v$v missing range stamps")
      assert(stamped(v) == footerRanges(v), s"v$v stamps diverge from footers")
    }
    // a raw commit with NO stamps (older-code manifests): planning falls
    // back to footer reads and keeps working
    val names = SnapshotLog.manifest(spark, dir, 1)
    SnapshotLog.commit(spark, new org.apache.hadoop.fs.Path(dir), 2L, names,
      meta = Seq("key=id"))
    assert(stamped(2L) == footerRanges(2L), "fallback diverged from footers")
    import spark.implicits._
    val someId = SnapshotLog.read(spark, dir, 2L).agg(min("id")).head().getLong(0)
    val hit = SnapshotLog.lookupKeys(spark, dir, 2L, Seq(someId).toDF("id"))
    assert(hit.count() == 1L)
    assert(hit.inputFiles.length < names.size, "lookup on fallback ranges scanned everything")
  }

  test("compactZ: z-ordered OPTIMIZE is CDC-invisible and narrows footers on BOTH dims") {
    import spark.implicits._
    import graft.operators.CowMerge
    val dir = Files.createTempDirectory("graft_snapz").toString + "/t"
    // ts decorrelated from id (Knuth multiplicative hash), so the
    // key-clustered layout leaves every file's ts span ~ the full domain
    val df = (1L to 4096L).map(i => (i, (i * 2654435761L) % 4096L, s"v$i"))
      .toDF("id", "ts", "v")
    SnapshotLog.init(spark, dir, df, "id", numFiles = 8)
    def avgSpan(v: Long, colName: String): Double = {
      val paths = SnapshotLog.manifest(spark, dir, v)
        .map(n => new org.apache.hadoop.fs.Path(s"$dir/data/$n"))
      val rs = CowMerge.keyRangesOf(spark, paths, colName)
      assert(rs.forall(_.hasStats), s"missing $colName stats at v$v")
      rs.map(r => (r.hi - r.lo).toDouble).sum / rs.size
    }
    val preTs = avgSpan(0, "ts")
    assert(preTs > 4096 * 0.6, s"fixture degenerate: pre-z ts span $preTs")

    val c = SnapshotLog.compactZ(spark, dir, "id", "ts", numFiles = 16)
    // logical table unchanged, CDC-invisible like any compaction
    assert(SnapshotLog.read(spark, dir, c.version).count() == 4096L)
    assert(SnapshotLog.cdc(spark, dir, 0, c.version, "id").isEmpty)
    // both dims now narrow per file: either-dimension scans skip files
    val postTs = avgSpan(c.version, "ts")
    val postId = avgSpan(c.version, "id")
    assert(postTs < preTs * 0.6, s"z-order did not narrow ts: $preTs -> $postTs")
    assert(postId < 4096 * 0.6, s"z-order left id unprunable: $postId")
    // key lookups still footer-prune over the curve-segmented ranges
    val hit = SnapshotLog.lookupKeys(spark, dir, c.version, Seq(77L).toDF("id"))
    assert(hit.collect().map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((77L, "v77")))
    assert(hit.inputFiles.length < 16, "lookup scanned every z file")
  }

  test("streaming epochs stamp the manifest; a replayed epoch is skipped, never re-applied") {
    import spark.implicits._
    import graft.streaming.SnapshotStreams
    val dir = Files.createTempDirectory("graft_snap6").toString + "/t"
    SnapshotLog.init(spark, dir,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), "id", numFiles = 2)
    val e0 = Seq(("update", 1L, "a2"), ("insert", 10L, "j")).toDF("op", "id", "v")
    val e1 = Seq(("delete", 2L, null.asInstanceOf[String])).toDF("op", "id", "v")
    assert(SnapshotStreams.applyEpoch(spark, dir, e0, 0L, "s1", "id")
      .exists(_.version == 1L))
    assert(SnapshotStreams.applyEpoch(spark, dir, e1, 1L, "s1", "id")
      .exists(_.version == 2L))
    // replay of epoch 0 after a lost checkpoint: the txn stamp skips it
    assert(SnapshotStreams.applyEpoch(spark, dir, e0, 0L, "s1", "id").isEmpty)
    assert(SnapshotLog.versions(spark, dir) == Seq(0L, 1L, 2L))
    assert(SnapshotLog.manifestMeta(spark, dir, 1).contains("txn=s1/0"))
    assert(SnapshotLog.manifestMeta(spark, dir, 2).contains("txn=s1/1"))
    val got = SnapshotLog.readLatest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a2"), (3L, "c"), (10L, "j")))
  }

  test("writeStreamExactlyOnce commits one version per drained micro-batch") {
    import spark.implicits._
    import graft.streaming.SnapshotStreams
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("graft_snap7").toString
    val dir = s"$root/t"
    SnapshotLog.init(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "id", numFiles = 1)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long, String)]
    var commits = List.empty[(Long, Long)]
    val q = SnapshotStreams.writeStreamExactlyOnce(
        mem.toDF().toDF("op", "id", "v"), dir, "s2", "id") { (c, e) =>
        commits ::= (c.version, e)
      }
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try {
      mem.addData(("update", 1L, "x"))
      q.processAllAvailable()
      mem.addData(("insert", 20L, "y"))
      q.processAllAvailable()
    } finally q.stop()
    assert(SnapshotLog.versions(spark, dir) == Seq(0L, 1L, 2L))
    assert(commits.reverse.map(_._2) == List(0L, 1L))
    val got = SnapshotLog.readLatest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "x"), (2L, "b"), (20L, "y")))
  }

  test("merge-source materialization: non-deterministic changesets persist, " +
      "deterministic ones don't, conf overrides both ways") {
    import spark.implicits._
    val det = Seq(("insert", 1L, "a")).toDF("op", "id", "x")
    val nondet = det.withColumn("x",
      concat(lit("r"), (rand() * 10).cast("long").cast("string")))
    assert(!SnapshotLog.shouldMaterialize(spark, det),
      "a deterministic changeset must not pay the cache pass")
    assert(SnapshotLog.shouldMaterialize(spark, nondet),
      "a non-deterministic changeset MUST materialize: the planned " +
        "footprint and the written rows would otherwise draw independently")
    try {
      spark.conf.set("spark.graft.mergeMaterialize", "true")
      assert(SnapshotLog.shouldMaterialize(spark, det))
      spark.conf.set("spark.graft.mergeMaterialize", "false")
      assert(!SnapshotLog.shouldMaterialize(spark, nondet))
    } finally spark.conf.unset("spark.graft.mergeMaterialize")
    // end-to-end: a rand()-routed changeset merges into a consistent
    // table (row count conserved, every key present exactly once)
    val dir = java.nio.file.Files.createTempDirectory("mat").toString + "/t"
    val base = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "x")
    SnapshotLog.init(spark, dir, base, "id", numFiles = 4)
    val cs = base.where(rand() < 0.5)
      .select(lit("update").as("op"), col("id"),
        concat(lit("u"), col("id").cast("string")).as("x"))
    SnapshotLog.merge(spark, dir, cs, "id")
    val after = SnapshotLog.readLatest(spark, dir)
    assert(after.count() == 100L)
    assert(after.select("id").distinct().count() == 100L)
  }
}
