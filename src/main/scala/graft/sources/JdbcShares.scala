package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** S1's physical form (main.go:86-97): the reference's only scan is ONE
  * MySQL query with a server-side WHERE, an explicit column list, and an
  * ORDER BY. The Spark twin is `spark.read.jdbc`: downstream
  * `filter`/`select` lineage (e.g. [[graft.operators.Migration.scanShares]])
  * is pushed by Catalyst into the generated SQL — the JDBC scan node shows
  * `PushedFilters` and projects only the requested columns, so the
  * database does exactly the filtering the reference's hand-written query
  * does, while the plan stays declarative.
  *
  * Scale shape: [[read]] is a single-connection scan (the reference's own
  * shape — fine for dimension-sized tables); [[readPartitioned]] splits
  * the scan into `numPartitions` range-bounded queries on a numeric key,
  * which is the 100 TB form — N executors each pull one id range, no
  * single-connection bottleneck, no driver materialization. Bounds come
  * from the caller (a production job reads them from `MIN(id)`/`MAX(id)`
  * or a catalog) so the source itself never runs a pre-query.
  *
  * Works against any JDBC driver on the executor classpath — MySQL in the
  * reference deployment, embedded Derby in this sandbox's tests
  * (JdbcMigrationSpec), same seam as
  * [[graft.operators.DriverManagerUpsertFactory]] on the write side.
  */
object JdbcShares {

  /** The reference's share table (main.go:88). */
  val DefaultTable = "oc_share"

  private def reader(spark: SparkSession, url: String, table: String,
                     props: Map[String, String]): DataFrameReader =
    props.foldLeft(
      spark.read.format("jdbc").option("url", url).option("dbtable", table)
    ) { case (r, (k, v)) => r.option(k, v) }

  /** Single-range scan of `table` — filters/projection applied on top are
    * pushed into the database query by Catalyst.
    */
  def read(spark: SparkSession, url: String, table: String = DefaultTable,
           props: Map[String, String] = Map.empty): DataFrame =
    reader(spark, url, table, props).load()

  /** Range-partitioned scan: `numPartitions` concurrent queries, each
    * bounded on `partitionColumn` — the cluster-parallel read the
    * reference's single connection cannot do.
    */
  def readPartitioned(spark: SparkSession, url: String,
                      partitionColumn: String, lowerBound: Long,
                      upperBound: Long, numPartitions: Int,
                      table: String = DefaultTable,
                      props: Map[String, String] = Map.empty): DataFrame =
    reader(spark, url, table, props)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()
}
