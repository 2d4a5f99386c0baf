package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the housekeeping operator every long-lived
  * 100 TB table needs: streaming sinks, incremental loads and per-task
  * writers accumulate files far below the ~128 MB sweet spot, and scan
  * cost degrades into file-open overhead (plus driver memory for the
  * file index). Compaction rewrites a directory into
  * ceil(totalBytes / targetFileBytes) files in one job.
  *
  * The file count comes from the actual byte size via the Hadoop
  * FileSystem API (works on hdfs:// and object stores, not just local
  * paths), never from a row count — row width varies, bytes don't lie.
  * With `sortBy` columns the rewrite range-partitions and sorts, so
  * compaction simultaneously restores clustering (narrow min/max stats —
  * compose with [[ZOrder]] for two-dimensional layouts); without, a
  * round-robin repartition balances file sizes exactly.
  */
object Compaction {

  /** Total bytes of data files under `dir` (dotfiles and _SUCCESS
    * markers excluded).
    */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) total += f.getLen
    }
    total
  }

  /** Rewrite the parquet table at `inDir` into `outDir` with
    * ~`targetFileBytes` files; returns the file count written.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long, sortBy: Seq[String] = Nil): Int = {
    val n = math.max(1L, (dataBytes(spark, inDir) + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(inDir)
    val laid =
      if (sortBy.nonEmpty) {
        val cols = sortBy.map(org.apache.spark.sql.functions.col)
        df.repartitionByRange(n, cols: _*).sortWithinPartitions(cols: _*)
      } else df.repartition(n)
    laid.write.mode("overwrite").parquet(outDir)
    n
  }

  /** Tombstone compaction: rewrite the table at `inDir` into `outDir`
    * MINUS the keyed `tombstones` set — the job that makes query-time
    * tombstone masking (v13's broadcast anti-join) permanent, so
    * steady-state reads stop paying the mask. Same sizing/layout rules
    * as [[compact]] (PLANNED file count from the INPUT's bytes — a
    * conservative over-estimate when the delete fraction is large; the
    * next routine compaction converges it). The tombstone side is a
    * delete batch, small by construction, so the anti-join broadcasts and
    * the rewrite stays one map-side pass over the input files.
    *
    * Returns the ACTUAL written data-file count, not the plan:
    * `repartitionByRange` can produce empty partitions (few distinct sort
    * keys, or a large delete fraction), and empty partitions write no
    * parquet file — so actual <= planned is the invariant, equality only
    * when every planned partition received rows.
    */
  def compactMinus(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long, tombstones: org.apache.spark.sql.DataFrame,
      key: String, sortBy: Seq[String] = Nil): Int = {
    val n = math.max(1L, (dataBytes(spark, inDir) + targetFileBytes - 1) / targetFileBytes).toInt
    // size-guarded hint: a contract-sized tombstone batch broadcasts; a
    // 100x one degrades to a shuffle anti-join instead of OOMing the driver
    val df = spark.read.parquet(inDir)
      .join(Joins.sizedBroadcast(tombstones), Seq(key), "left_anti")
    val laid =
      if (sortBy.nonEmpty) {
        val cols = sortBy.map(org.apache.spark.sql.functions.col)
        df.repartitionByRange(n, cols: _*).sortWithinPartitions(cols: _*)
      } else df.repartition(n)
    laid.write.mode("overwrite").parquet(outDir)
    dataFileCount(spark, outDir)
  }

  /** Parquet data-file count under `dir` (the post-compaction audit). */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var nFiles = 0
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) nFiles += 1
    }
    nFiles
  }
}
