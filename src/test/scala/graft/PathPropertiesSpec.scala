package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.functions.PathFns._
import graft.operators.Migration
import graft.operators.Migration.Decision

/** Property-style tests (SURVEY §5.3): scalacheck generators sampled into
  * one DataFrame per property, evaluated in a single Spark job against a
  * Scala-side model.
  */
class PathPropertiesSpec extends SparkTestBase {

  private val seg: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar)).map(_.mkString)
  private val absPath: Gen[String] =
    Gen.choose(2, 6).flatMap(n => Gen.listOfN(n, seg)).map("/" + _.mkString("/"))

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).sample.getOrElse(fail("generator exhausted"))

  test("property: dirname + '/' + basename recomposes clean abs paths (depth >= 2)") {
    import spark.implicits._
    val paths = sample(absPath, 200)
    val bad = paths.toDF("p")
      .where(concat(pathDirname(col("p")), lit("/"), pathBasename(col("p"))) =!= col("p"))
      .count()
    assert(bad == 0)
  }

  test("property: versionsPath preserves dirname and prefixes basename") {
    import spark.implicits._
    val paths = sample(absPath, 200)
    val df = paths.toDF("p").select(col("p"), versionsPath(col("p")).as("vp"))
    assert(df.where(pathDirname(col("vp")) =!= pathDirname(col("p"))).count() == 0)
    assert(df.where(pathBasename(col("vp")) =!=
      concat(lit(VersionsPrefix), pathBasename(col("p")))).count() == 0)
  }

  test("property: router totality — every enriched row gets exactly one decision") {
    import spark.implicits._
    // paths biased across all guard branches + null meta (lookup miss)
    val metaPath: Gen[Option[String]] = Gen.frequency(
      1 -> Gen.const(None),
      2 -> absPath.map(p => Some(p)), // mostly NOT under the user prefix
      2 -> seg.map(s => Some(s"/eos/scratch/user/u1/$s")),
      2 -> seg.map(s => Some(s"/eos/scratch/user/u1/.sys.v#.$s")),
      2 -> seg.map(s => Some(s"/eos/scratch/user/u1/.sys.v#.$s/v1")))
    val rows = sample(metaPath, 300).zipWithIndex.map { case (p, i) => (i.toLong, p) }
    val enriched = rows.toDF("id", "meta_path")
      .withColumn("meta_ino", when(col("meta_path").isNotNull, col("id"))) // null path => null ino
    val routed = Migration.route(enriched)
    val decisions = Set(Decision.AlreadyMigrated, Decision.NotUnderHome,
      Decision.Version, Decision.Regular, Decision.ErrorMissing)
    assert(routed.where(col("decision").isNull).count() == 0)
    assert(routed.where(!col("decision").isin(decisions.toSeq.map(lit): _*)).count() == 0)
  }

  test("property: kvGet recovers exact-key values from fuzzed KV records") {
    import spark.implicits._
    val value: Gen[String] = Gen.choose(1, 10)
      .flatMap(n => Gen.listOfN(n, Gen.alphaNumChar)).map(_.mkString)
    val rec: Gen[(String, String, String)] = for {
      ino <- Gen.choose(1L, 1e12.toLong); pino <- Gen.choose(1L, 1e12.toLong)
      size <- Gen.choose(0L, 1e15.toLong); tree <- Gen.choose(0L, 1e15.toLong)
      uid <- value; gid <- value
      path <- absPath
    } yield {
      val raw = s"keylength.file=${path.length} file=$path pino=$pino ino=$ino " +
        s"treesize=$tree size=$size uid=$uid gid=$gid"
      (raw, s"$ino|$size|$uid|$gid", path)
    }
    val rows = sample(rec, 200)
    val df = rows.toDF("raw", "expect", "path")
    val parsed = concat_ws("|",
      kvIno(col("raw")).cast("string"), kvSize(col("raw")).cast("string"),
      kvUid(col("raw")), kvGid(col("raw")))
    assert(df.where(parsed =!= col("expect")).count() == 0)
    // kvFile recovers the path even though paths here are space-free;
    // the space case is covered by the golden in PathFnsSpec
    assert(df.where(kvFile(col("raw")) =!= col("path")).count() == 0)
  }
}
