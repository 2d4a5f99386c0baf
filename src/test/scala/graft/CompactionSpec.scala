package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Compaction

/** Compaction rewrites a fragmented table into few right-sized files
  * without changing its rows, and the sorted variant restores per-file
  * clustering on the sort key.
  */
class CompactionSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("fragmented table compacts to ~target-size files with identical rows") {
    val root = Files.createTempDirectory("graft_compact").toString
    val li = Tables.lineitem(spark, sfDir)
    li.repartition(64).write.parquet(s"$root/frag")
    val fragFiles = spark.read.parquet(s"$root/frag").inputFiles.length
    assert(fragFiles >= 32, s"fixture not fragmented: $fragFiles files")

    val bytes = Compaction.dataBytes(spark, s"$root/frag")
    assert(bytes > 0)
    val n = Compaction.compact(spark, s"$root/frag", s"$root/compact", bytes / 4 + 1)
    val outFiles = spark.read.parquet(s"$root/compact").inputFiles.length
    assert(outFiles <= 4 && outFiles < fragFiles,
      s"expected <= 4 files after compaction, got $outFiles (planned $n)")
    // rows unchanged: same count and same checksum of a stable projection
    def sig(dir: String) = spark.read.parquet(dir)
      .agg(count(lit(1)), sum(col("l_orderkey") * col("l_linenumber"))).head()
    assert(sig(s"$root/frag") == sig(s"$root/compact"))
  }

  test("v14: compaction physically removes tombstones and probes match v13 row-for-row") {
    val queries = SparkEntry.queries
    val v13 = queries("v13_ann_tombstones")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val v14 = queries("v14_ann_compaction")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(v14.nonEmpty)
    assert(v14.toSeq == v13.toSeq,
      "compacted-index probe diverged from the masked-index probe")
    // the physical facts: files contain NO tombstoned corpus id, live
    // rows all survive, and the returned count is the ACTUAL file count,
    // bounded above by the byte-sized plan (range partitions can come up
    // empty and write no file — actual == planned is not an invariant)
    import graft.queries.{DedupQueries, SimilarityQueries}
    val (idx, idxPath) = SimilarityQueries.dupEmbIndexWithPath(spark, sfDir)
    val root = Files.createTempDirectory("graft_tomb").toString
    val tomb = SimilarityQueries.tombstones(spark, sfDir)
    val actual = Compaction.compactMinus(spark, idxPath, s"$root/compacted",
      SimilarityQueries.CompactTargetBytes, tomb, "vec_id", sortBy = Seq("bucket"))
    assert(actual == Compaction.dataFileCount(spark, s"$root/compacted"),
      "compactMinus must return the written data-file count")
    val planned = math.max(1L, (Compaction.dataBytes(spark, idxPath) +
      SimilarityQueries.CompactTargetBytes - 1) / SimilarityQueries.CompactTargetBytes)
    assert(actual >= 1 && actual <= planned,
      s"actual file count $actual outside [1, planned=$planned]")
    val compacted = spark.read.parquet(s"$root/compacted")
    val deletedPresent = compacted
      .where(col("vec_id") % SimilarityQueries.TombstoneMod === 0 &&
        col("vec_id") < DedupQueries.BatchIdOffset).count()
    assert(deletedPresent == 0L, "a tombstoned id survived compaction")
    val nTomb = tomb.count()
    assert(nTomb > 0L, "tombstone fixture vacuous")
    assert(compacted.count() == idx.count() - nTomb,
      "compaction changed live-row count")
  }

  test("sorted compaction restores narrow per-file min/max on the sort key") {
    val root = Files.createTempDirectory("graft_compact").toString
    val li = Tables.lineitem(spark, sfDir)
    li.repartition(32).write.parquet(s"$root/frag")
    val bytes = Compaction.dataBytes(spark, s"$root/frag")
    Compaction.compact(spark, s"$root/frag", s"$root/sorted", bytes / 4 + 1,
      sortBy = Seq("l_orderkey"))
    val ranges = spark.read.parquet(s"$root/sorted")
      .groupBy(input_file_name())
      .agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val span = {
      val r = li.agg(min("l_orderkey"), max("l_orderkey")).head()
      (r.getLong(1) - r.getLong(0)).toDouble
    }
    val avgFrac = ranges.map { case (lo, hi) => (hi - lo) / span }.sum / ranges.length
    assert(avgFrac < 0.5,
      s"sorted compaction left wide per-file ranges (avg frac $avgFrac)")
  }
}
