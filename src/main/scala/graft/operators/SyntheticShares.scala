package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic share-table + namespace fixtures derived from the driver's
  * `orders` parquet, so the migration pipeline (Migration.scala) is
  * oracle-checkable: the DuckDB side rebuilds the exact same inputs from the
  * exact same parquet via the SQL in [[sharesSql]] / [[nsSql]].
  *
  * Branch coverage by o_orderkey modulus (priority order = CASE order):
  *   %11 == 0 -> basename already `.sys.v#.`-prefixed  (main.go:280)
  *   %13 == 0 -> path outside the user prefix          (main.go:284)
  *   %17 == 0 -> share points INTO a versions folder   (main.go:288)
  *   else     -> regular file                          (main.go:304)
  * plus error cases: %19 == 0 missing from the namespace (lookup miss),
  * %23 == 0 NULL file_source (the reference's inode-0 null trap).
  * Versions folders exist for regular files unless %3 == 0 (create path,
  * main.go:148-173).
  */
object SyntheticShares {

  /** `oc_share` fixture (schema: FIXTURES.md A1, columns the pipeline touches). */
  def shares(orders: DataFrame): DataFrame =
    orders.select(
      col("o_orderkey").as("id"),
      (col("o_orderkey") % 5).cast("int").as("share_type"),
      concat(lit("user"), (col("o_custkey") % 100).cast("string")).as("uid_owner"),
      when(col("o_orderkey") % 7 === 0, "folder").otherwise("file").as("item_type"),
      col("o_orderkey").cast("string").as("item_source"),
      concat(lit("/old/"), col("o_orderkey").cast("string")).as("item_target"),
      when(col("o_orderkey") % 23 === 0, lit(null).cast("long"))
        .otherwise(col("o_orderkey")).as("file_source"),
      concat(lit("/f"), col("o_orderkey").cast("string"), lit(".dat")).as("file_target"))

  /** EOS namespace snapshot fixture (FIXTURES.md A2): file entries for every
    * order (minus %19 misses) + versions-FOLDER entries (for version-branch
    * parents and for regular files whose folder pre-exists).
    */
  def eosNamespace(orders: DataFrame): DataFrame = {
    val k = col("o_orderkey")
    val home = concat(lit("/eos/scratch/user/u"), (col("o_custkey") % 100).cast("string"))
    val fname = concat(lit("f"), k.cast("string"), lit(".dat"))

    val filePath =
      when(k % 11 === 0, concat(home, lit("/.sys.v#."), fname))
        .when(k % 13 === 0, concat(lit("/other/data/"), fname))
        .when(k % 17 === 0, concat(home, lit("/.sys.v#."), fname, lit("/v1")))
        .otherwise(concat(home, lit("/"), fname))

    val files = orders
      .where(k % 19 =!= 0)
      .select(
        k.as("ino"), filePath.as("file"),
        (col("o_custkey") % 100).cast("string").as("uid"),
        lit("2766").as("gid"),
        (k * 131 % 1000000).as("size"))

    val versionParents = orders
      .where(k % 11 =!= 0 && k % 13 =!= 0 && k % 17 === 0)
      .select(
        (k + 100000000L).as("ino"),
        concat(home, lit("/.sys.v#."), fname).as("file"),
        (col("o_custkey") % 100).cast("string").as("uid"),
        lit("2766").as("gid"), lit(0L).as("size"))

    val preexistingVersionFolders = orders
      .where(k % 11 =!= 0 && k % 13 =!= 0 && k % 17 =!= 0 && k % 3 =!= 0)
      .select(
        (k + 200000000L).as("ino"),
        concat(home, lit("/.sys.v#."), fname).as("file"),
        (col("o_custkey") % 100).cast("string").as("uid"),
        lit("2766").as("gid"), lit(0L).as("size"))

    files.unionByName(versionParents).unionByName(preexistingVersionFolders)
  }

  /** Deterministic inode for simulated create-if-absent (main.go:152). */
  val CreatedInodeOffset = 300000000L

  // ---------------------------------------------------------------------
  // DuckDB oracle twins — same logic, SQL text, used as CTEs by the oracle
  // queries in SparkEntry.oracleSql.
  // ---------------------------------------------------------------------

  val sharesSql: String =
    """shares AS (
      |  SELECT o_orderkey AS id,
      |         CAST(o_orderkey % 5 AS INT) AS share_type,
      |         'user' || CAST(o_custkey % 100 AS VARCHAR) AS uid_owner,
      |         CASE WHEN o_orderkey % 7 = 0 THEN 'folder' ELSE 'file' END AS item_type,
      |         CAST(o_orderkey AS VARCHAR) AS item_source,
      |         '/old/' || CAST(o_orderkey AS VARCHAR) AS item_target,
      |         CASE WHEN o_orderkey % 23 = 0 THEN NULL ELSE o_orderkey END AS file_source,
      |         '/f' || CAST(o_orderkey AS VARCHAR) || '.dat' AS file_target
      |  FROM orders
      |)""".stripMargin

  val nsSql: String =
    """ns AS (
      |  SELECT o_orderkey AS ino,
      |         CASE WHEN o_orderkey % 11 = 0 THEN '/eos/scratch/user/u' || CAST(o_custkey % 100 AS VARCHAR) || '/.sys.v#.f' || CAST(o_orderkey AS VARCHAR) || '.dat'
      |              WHEN o_orderkey % 13 = 0 THEN '/other/data/f' || CAST(o_orderkey AS VARCHAR) || '.dat'
      |              WHEN o_orderkey % 17 = 0 THEN '/eos/scratch/user/u' || CAST(o_custkey % 100 AS VARCHAR) || '/.sys.v#.f' || CAST(o_orderkey AS VARCHAR) || '.dat/v1'
      |              ELSE '/eos/scratch/user/u' || CAST(o_custkey % 100 AS VARCHAR) || '/f' || CAST(o_orderkey AS VARCHAR) || '.dat' END AS file,
      |         CAST(o_custkey % 100 AS VARCHAR) AS uid,
      |         '2766' AS gid,
      |         o_orderkey * 131 % 1000000 AS size
      |  FROM orders WHERE o_orderkey % 19 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + 100000000, '/eos/scratch/user/u' || CAST(o_custkey % 100 AS VARCHAR) || '/.sys.v#.f' || CAST(o_orderkey AS VARCHAR) || '.dat',
      |         CAST(o_custkey % 100 AS VARCHAR), '2766', 0
      |  FROM orders WHERE o_orderkey % 11 <> 0 AND o_orderkey % 13 <> 0 AND o_orderkey % 17 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 200000000, '/eos/scratch/user/u' || CAST(o_custkey % 100 AS VARCHAR) || '/.sys.v#.f' || CAST(o_orderkey AS VARCHAR) || '.dat',
      |         CAST(o_custkey % 100 AS VARCHAR), '2766', 0
      |  FROM orders WHERE o_orderkey % 11 <> 0 AND o_orderkey % 13 <> 0 AND o_orderkey % 17 <> 0 AND o_orderkey % 3 <> 0
      |)""".stripMargin
}
