package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Merge, SnapshotLog}

/** d29's physical/chaining facts: the fingerprint index admits batches
  * by MERGE, chained batches converge on the from-scratch index, and
  * the log inherits first-id-wins across batches (an exact copy arriving
  * in batch 2 of a doc ADMITTED in batch 1 must resolve to the batch-1
  * keeper, not re-admit).
  */
class DedupSnapshotSpec extends SparkTestBase {

  private def fp(text: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(text.trim.toLowerCase.replaceAll("\\s+", " ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)

  private def index(rows: Seq[(String, Long)]): DataFrame = {
    import spark.implicits._
    rows.map { case (t, id) => (fp(t), id) }.toDF("fp", "keeper")
      .groupBy("fp").agg(min("keeper").as("keeper"))
  }

  private def mergeBatch(dir: String, rows: Seq[(String, Long)]): Unit = {
    val cs = index(rows)
      .select(lit(Merge.OpInsert).as("op"), col("fp"), col("keeper"))
    SnapshotLog.merge(spark, dir, cs, "fp")
  }

  test("chained batch admissions converge on the from-scratch index; cross-batch dups resolve to the first admitter") {
    val dir = Files.createTempDirectory("graft_d29").toString + "/idx"
    val corpus = Seq(("alpha beta", 1L), ("gamma delta", 2L), ("epsilon", 3L))
    SnapshotLog.init(spark, dir, index(corpus), "fp", numFiles = 2)

    // batch 1: one corpus dup, one fresh doc
    val b1 = Seq(("alpha  BETA", 101L) /* dup of 1 via normalization */ ,
      ("zeta eta", 102L))
    mergeBatch(dir, b1)
    // batch 2: a dup of batch 1's ADMITTED doc + a fresh one + a corpus dup
    val b2 = Seq(("ZETA eta", 201L), ("theta iota", 202L), ("epsilon", 203L))
    mergeBatch(dir, b2)

    val got = SnapshotLog.readLatest(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // from-scratch over everything, first-id-wins
    val expected = index(corpus ++ b1 ++ b2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, "chained admissions diverged from from-scratch")
    // the cross-batch dup resolves to batch 1's keeper
    assert(got(fp("zeta eta")) == 102L)
    assert(got(fp("epsilon")) == 3L)
    assert(got(fp("theta iota")) == 202L)
    // three commits: init + 2 batch merges, each a new version
    assert(SnapshotLog.versions(spark, dir) == Seq(0L, 1L, 2L))
  }
}
