package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.SnapshotLog

/** Separate-JVM writer for SnapshotRaceSpec's end-to-end concurrency
  * test: `RaceWriter <tableDir> <writerId> <nCommits>` opens its OWN
  * SparkSession (own process, own filesystem view — nothing shared with
  * the other writer but the table directory itself) and applies
  * `nCommits` single-row insert merges through
  * [[SnapshotLog.commitWithRetry]]. Every commit inserts the key
  * `writerId * 1_000_000 + i`, so the spec can prove no-lost-updates by
  * set equality over the final table. Exit code 0 = every commit landed
  * (possibly after retries); any uncaught failure (retries exhausted,
  * truncated manifest, vacuumed state) exits non-zero and fails the
  * spec.
  */
object RaceWriter {
  def main(args: Array[String]): Unit = {
    val Array(dir, writerId, nStr) = args
    val n = nStr.toInt
    val w = writerId.toLong
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-race-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    (0 until n).foreach { i =>
      SnapshotLog.commitWithRetry(maxAttempts = 100) {
        // re-built per attempt: commitWithRetry's contract is that the
        // plan re-reads table state, which merge() does on entry
        val cs = Seq(("insert", w * 1000000L + i, w)).toDF("op", "id", "w")
        SnapshotLog.merge(spark, dir, cs, "id")
      }
    }
    spark.stop()
  }
}
