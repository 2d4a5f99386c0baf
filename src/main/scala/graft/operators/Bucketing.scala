package graft.operators

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}

/** Bucketed-table layout: pay a table's join shuffle ONCE, at write time.
  *
  * A 100 TB fact table that is equi-joined or aggregated on the same key
  * by every downstream run (the reference's `oc_share.id`-keyed reads and
  * `file_source` enrichment joins, re-run per migration wave —
  * `main.go:88`, `main.go:241-322`; a corpus keyed by doc fingerprint,
  * re-deduplicated per ingest) should not re-shuffle per run. Writing it
  * `bucketBy(n, key)` hash-partitions rows into `n` per-partition bucket
  * files; the scan then reports `HashPartitioning(key, n)`, so Catalyst's
  * EnsureRequirements inserts NO exchange for joins/aggregations keyed on
  * the bucket columns — two tables bucketed the same way co-locate and
  * sort-merge join with zero shuffle on either side.
  *
  * `sortBy` additionally orders rows inside each bucket file, letting the
  * join skip its per-task sort when each bucket holds one file.
  *
  * The write goes through `saveAsTable` because bucket metadata lives in
  * the catalog, not the parquet footers — on a cluster this is the
  * metastore; reads must use `spark.table(name)` (a bare
  * `read.parquet(path)` sees plain files and forgets the layout).
  */
object Bucketing {

  /** Write `df` as an external parquet table at `path`, bucketed (and
    * bucket-sorted when `sorted`) on `keys` into `numBuckets` buckets,
    * registered in the catalog as `table`.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    keys: Seq[String], numBuckets: Int,
                    sorted: Boolean = true): Unit = {
    require(keys.nonEmpty, "bucket keys must be non-empty")
    require(numBuckets > 0, "numBuckets must be positive")
    val w: DataFrameWriter[Row] = df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
    (if (sorted) w.sortBy(keys.head, keys.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Read a [[writeBucketed]] table WITH its layout — the catalog read is
    * the only form that carries the bucket metadata into planning. A bare
    * `read.parquet(path)` of the same files parses fine but silently
    * forgets the layout (every downstream join re-shuffles); this helper
    * keeps callers on the safe path and fails loudly when the table was
    * never registered.
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame = {
    require(spark.catalog.tableExists(table),
      s"bucketed table '$table' is not in the catalog — bucket layout " +
        "lives in catalog metadata, not the parquet files; write it with " +
        "writeBucketed first (read.parquet would silently drop the layout)")
    spark.table(table)
  }
}
