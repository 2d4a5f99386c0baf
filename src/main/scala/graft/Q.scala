package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checkable query: the Spark implementation plus (when
  * SQL-expressible) the equivalent DuckDB SQL the driver runs as oracle.
  * Column names/aliases MUST match between the two (the driver sorts
  * columns by name before hashing).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  /** Non-SQL-expressible op: the driver records a weaker rows-only check. */
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
