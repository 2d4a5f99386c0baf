package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import graft.functions.PathFns
import graft.sources.KvParse

/** DSv2 `graft-kv` source: EOS `file info -m` record files as a scannable
  * table (S2 ingestion), with column pruning reaching the parse.
  */
class KvRecordSourceSpec extends SparkTestBase {

  private val records = Seq(
    "keylength.file=16 file=/a/my file.d at pino=7 ino=42 uid=u1 gid=g1 treesize=99 size=7",
    "keylength.file=6 file=/a/b.c pino=8 ino=43 uid=u2 gid=g2 treesize=100 size=9",
    "keylength.file=10 file=/x/y/z.dat pino=9 ino=44 uid=u3 gid=g3 treesize=101 size=11")

  private def writeFixture(): String = {
    val f = Files.createTempFile("kvrecords", ".txt")
    Files.writeString(f, records.mkString("\n") + "\n")
    f.toFile.deleteOnExit()
    f.toString
  }

  test("reads records into the typed schema, length-prefixed file= with spaces") {
    val df = spark.read.format("graft-kv").load(writeFixture())
    val rows = df.orderBy("ino").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[Long]("ino") == 42L)
    assert(rows(0).getAs[String]("file") == "/a/my file.d at ") // 16 chars, space kept
    assert(rows(0).getAs[String]("uid") == "u1")
    assert(rows(0).getAs[Long]("size") == 7L) // not treesize=99
    assert(rows(1).getAs[String]("file") == "/a/b.c")
  }

  test("multi-path load() reads every file (Spark passes paths as a JSON array)") {
    val df = spark.read.format("graft-kv").load(writeFixture(), writeFixture())
    assert(df.count() == 6)
    assert(df.select("ino").distinct().count() == 3)
  }

  test("write path: records roundtrip through the writer and back, spaces intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("kvwrite").toString + "/dump"
    val in = Seq(
      (42L, "/a/my file.d at ", "u1", "g1", 7L),
      (43L, "/a/b.c", "u2", "g2", 9L),
      (44L, null.asInstanceOf[String], "u3", null.asInstanceOf[String], 11L))
      .toDF("ino", "file", "uid", "gid", "size")
    in.write.format("graft-kv").mode("overwrite").save(dir)
    val back = spark.read.format("graft-kv").load(dir)
      .select("ino", "file", "uid", "gid", "size")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(canon(back) == canon(in))
    // null fields were OMITTED from the record, not written as "null"
    val raws = spark.read.format("graft-kv").load(dir)
      .where(col("ino") === 44L).select("raw").head().getString(0)
    assert(!raws.contains("file=") && !raws.contains("gid="), raws)
  }

  test("write rejects values the line-based format cannot represent") {
    import spark.implicits._
    val dir = Files.createTempDirectory("kvwrite").toString + "/dump"
    val badUid = Seq((1L, "/p", "u 1", "g", 5L)).toDF("ino", "file", "uid", "gid", "size")
    val e1 = intercept[org.apache.spark.SparkException] {
      badUid.write.format("graft-kv").mode("overwrite").save(dir)
    }
    assert(e1.getMessage.contains("whitespace") ||
      Option(e1.getCause).exists(_.getMessage.contains("whitespace")), e1.getMessage)
    val badFile = Seq((1L, "/p\nq", "u", "g", 5L)).toDF("ino", "file", "uid", "gid", "size")
    val e2 = intercept[org.apache.spark.SparkException] {
      badFile.write.format("graft-kv").mode("overwrite").save(dir)
    }
    assert(e2.getMessage.contains("line break") ||
      Option(e2.getCause).exists(_.getMessage.contains("line break")), e2.getMessage)
    // a file payload embedding ' key=' would shadow a later real token
    // under the whole-line scan — unrepresentable, rejected
    val spoof = Seq((1L, "/a uid=999 b", "42", "g", 5L))
      .toDF("ino", "file", "uid", "gid", "size")
    val e3 = intercept[org.apache.spark.SparkException] {
      spoof.write.format("graft-kv").mode("overwrite").save(dir)
    }
    assert(e3.getMessage.contains("misparse") ||
      Option(e3.getCause).exists(_.getMessage.contains("misparse")), e3.getMessage)
    // an all-null row would vanish as an empty line — rejected
    val allNull = Seq((null.asInstanceOf[java.lang.Long], null.asInstanceOf[String]))
      .toDF("ino", "file")
    val e4 = intercept[org.apache.spark.SparkException] {
      allNull.write.format("graft-kv").mode("overwrite").save(dir)
    }
    assert(e4.getMessage.contains("not representable") ||
      Option(e4.getCause).exists(_.getMessage.contains("not representable")), e4.getMessage)
    // '=' WITHOUT an internal space cannot start a token match — writes fine
    Seq((2L, "/a/b=c", "u", "g", 5L)).toDF("ino", "file", "uid", "gid", "size")
      .write.format("graft-kv").mode("overwrite").save(dir)
    assert(spark.read.format("graft-kv").load(dir)
      .select("file").head().getString(0) == "/a/b=c")
    // ...but '=' in a NON-file value is dropped by the reference Go
    // parser (split-on-'=' with len==2) — unreadable there, rejected here
    val eqUid = Seq((3L, "/p", "u=1", "g", 5L)).toDF("ino", "file", "uid", "gid", "size")
    val e5 = intercept[org.apache.spark.SparkException] {
      eqUid.write.format("graft-kv").mode("overwrite").save(dir)
    }
    assert(e5.getMessage.contains("reference parser") ||
      Option(e5.getCause).exists(_.getMessage.contains("reference parser")), e5.getMessage)
  }

  test("write rejects mistyped columns at plan time (no silent int/long corruption)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("kvwrite").toString + "/dump"
    // ino as IntegerType: getLong over an int slot reads garbage for
    // negatives — must fail loudly before any executor runs
    val intIno = Seq((1, "/p")).toDF("ino", "file")
    val e1 = intercept[Exception] {
      intIno.write.format("graft-kv").mode("overwrite").save(dir)
    }
    assert(e1.getMessage.contains("must be LongType") ||
      Option(e1.getCause).exists(_.getMessage.contains("must be LongType")), e1.getMessage)
    // uid as LongType would crash opaquely executor-side
    val longUid = Seq((1L, 42L)).toDF("ino", "uid")
    val e2 = intercept[Exception] {
      longUid.write.format("graft-kv").mode("overwrite").save(dir)
    }
    assert(e2.getMessage.contains("must be StringType") ||
      Option(e2.getCause).exists(_.getMessage.contains("must be StringType")), e2.getMessage)
  }

  test("write rejects a multi-path table; reads expand nested dump directories in full") {
    import spark.implicits._
    val one = Seq((1L, "/p", "u", "g", 5L)).toDF("ino", "file", "uid", "gid", "size")
    val e = intercept[Exception] {
      one.write.format("graft-kv")
        .option("paths", s"""["/tmp/kv-a","/tmp/kv-b"]""")
        .mode("overwrite").save()
    }
    assert(e.getMessage.contains("exactly one path") ||
      Option(e.getCause).exists(_.getMessage.contains("exactly one path")), e.getMessage)
    // nested per-shard layout: root/shard-0/part.kv + a root-level file;
    // hidden dirs/files are skipped at every level
    val root = Files.createTempDirectory("kvnest")
    val shard = Files.createDirectory(root.resolve("shard-0"))
    val hidden = Files.createDirectory(root.resolve("_tmp"))
    Files.writeString(shard.resolve("part.kv"), records.head + "\n")
    Files.writeString(root.resolve("top.kv"), records(1) + "\n")
    Files.writeString(hidden.resolve("junk.kv"), records(2) + "\n")
    val inos = spark.read.format("graft-kv").load(root.toString)
      .select("ino").collect().map(_.getLong(0)).sorted.toSeq
    assert(inos == Seq(42L, 43L), s"nested read got $inos")
  }

  test("KvParse.file survives corrupt keylength digits (no crash, just None)") {
    assert(KvParse.file("keylength.file=99999999999 file=x").isEmpty)  // >9 digits
    assert(KvParse.file("keylength.file=2147483640 file=x").isEmpty)   // Int overflow
    assert(KvParse.file("keylength.file= file=x").isEmpty)             // no digits
    assert(KvParse.file("keylength.file=3 file=x").isEmpty)            // short payload
  }

  test("write overwrite truncates previous dump files; append keeps them") {
    import spark.implicits._
    val dir = Files.createTempDirectory("kvwrite").toString + "/dump"
    val one = Seq((1L, "/p", "u", "g", 5L)).toDF("ino", "file", "uid", "gid", "size")
    one.write.format("graft-kv").mode("overwrite").save(dir)
    one.write.format("graft-kv").mode("append").save(dir)
    assert(spark.read.format("graft-kv").load(dir).count() == 2)
    one.write.format("graft-kv").mode("overwrite").save(dir)
    assert(spark.read.format("graft-kv").load(dir).count() == 1)
  }

  test("column pruning reaches the parse (SupportsPushDownRequiredColumns)") {
    val df = spark.read.format("graft-kv").load(writeFixture()).select("ino")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.readSchema().fieldNames.toSeq
    }
    assert(scans == Seq(Seq("ino")))
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(42L, 43L, 44L))
  }

  test("filter pushdown reaches the parse loop (SupportsPushDownFilters)") {
    val p = writeFixture()
    val df = spark.read.format("graft-kv").load(p).where(col("ino") === 43L)
    // the filter is in the scan (visible in the plan), and the scan's own
    // evaluation is exact — Spark trusts it and plans no re-filter
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scans.nonEmpty && scans.head.contains("PushedFilters: [") &&
      scans.head.contains("EqualTo(ino,43)"), s"pushdown missing in: $scans")
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("ino") == 43L)

    // range + prefix + In, each matching exactly what Scala-side
    // filtering of the full read produces
    val all = spark.read.format("graft-kv").load(p)
      .select("ino", "file", "uid", "size").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    def pushedSet(dfq: org.apache.spark.sql.DataFrame) =
      dfq.select("ino", "file", "uid", "size").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    val base = spark.read.format("graft-kv").load(p)
    assert(pushedSet(base.where(col("size") > 7L && col("size") <= 11L)) ==
      all.filter(t => t._4 > 7 && t._4 <= 11).toSet)
    assert(pushedSet(base.where(col("file").startsWith("/a/"))) ==
      all.filter(_._2.startsWith("/a/")).toSet)
    assert(pushedSet(base.where(col("uid").isin("u1", "u3"))) ==
      all.filter(t => Set("u1", "u3")(t._3)).toSet)
  }

  test("unsupported predicates stay residual; missing fields obey SQL null semantics") {
    import spark.implicits._
    // a record with NO uid token: uid parses to null
    val f = Files.createTempFile("kvnull", ".txt")
    Files.writeString(f,
      "keylength.file=2 file=/n pino=1 ino=50 gid=g9 size=1\n" + records.mkString("\n") + "\n")
    f.toFile.deleteOnExit()
    val base = spark.read.format("graft-kv").load(f.toString)
    // comparisons never match null...
    assert(base.where(col("uid") === "u1").count() == 1)
    assert(base.where(col("uid") =!= "zzz").count() == 3) // null row dropped
    // ...while IsNull selects exactly it
    assert(base.where(col("uid").isNull).select("ino").as[Long].collect().toSeq == Seq(50L))
    // a predicate the source cannot evaluate (length()) must still apply:
    // Spark keeps it as a residual filter above the scan
    val mixed = base.where(col("ino") >= 43L && length(col("file")) === 6)
    assert(mixed.select("ino").as[Long].collect().sorted.toSeq == Seq(43L))
    val desc = mixed.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.description()
    }.head
    assert(desc.contains("GreaterThanOrEqual(ino,43)") && !desc.toLowerCase.contains("length"),
      s"pushdown split wrong: $desc")
  }

  test("KvParse equals the Column implementations (kvFile/kvGet)") {
    records.foreach { raw =>
      val row = spark.range(1).select(
        PathFns.kvFile(lit(raw)).as("f"),
        PathFns.kvIno(lit(raw)).as("i"),
        PathFns.kvUid(lit(raw)).as("u"),
        PathFns.kvSize(lit(raw)).as("s")).head()
      assert(KvParse.file(raw).contains(row.getAs[String]("f")))
      assert(KvParse.getLong(raw, "ino").contains(row.getAs[Long]("i")))
      assert(KvParse.get(raw, "uid").contains(row.getAs[String]("u")))
      assert(KvParse.getLong(raw, "size").contains(row.getAs[Long]("s")))
    }
    // misses return None, not garbage
    assert(KvParse.file("not a record").isEmpty)
    assert(KvParse.get("a=1", "b").isEmpty)
  }
}
