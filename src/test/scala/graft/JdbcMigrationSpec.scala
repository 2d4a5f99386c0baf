package graft

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.JdbcShares

/** S1's real physical form + the closed reference loop (main.go:241-322):
  * shares are READ from an actual JDBC database (embedded Derby standing in
  * for the reference's MySQL), the filter/projection lineage is pushed into
  * the generated SQL, the pipeline routes and resolves, and the change-set
  * is written BACK to the same database through the K1 prepared-upsert
  * sink — then verified against the functional `applyChangeset` result and
  * shown idempotent on a second pass (the P4 `.sys.v#.` guard).
  */
class JdbcMigrationSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private val url = "jdbc:derby:memory:graftscan;create=true"

  private def derbyAvailable: Boolean =
    try { java.sql.DriverManager.getConnection(url).close(); true }
    catch {
      case _: Exception =>
        try { // Derby >=10.15 autoloads via this class; force-register then retry
          Class.forName("org.apache.derby.iapi.jdbc.AutoloadedDriver")
          java.sql.DriverManager.getConnection(url).close(); true
        } catch { case _: Throwable => false }
    }

  /** (Re)create `oc_share` via plain DDL — UNQUOTED identifiers, exactly as
    * the reference's MySQL schema would be — then append the parquet-derived
    * fixture through Spark's JDBC writer (executor-parallel INSERTs).
    * Column names are upper-cased for the append because Derby folds
    * unquoted DDL identifiers to uppercase while Spark's writer quotes the
    * DataFrame's names verbatim; reads stay case-insensitive.
    */
  private def seedShares(shares: DataFrame): Unit = {
    val setup = java.sql.DriverManager.getConnection(url)
    try {
      val st = setup.createStatement()
      try st.execute("DROP TABLE oc_share") catch { case _: java.sql.SQLException => () }
      st.execute("""CREATE TABLE oc_share(
        id BIGINT PRIMARY KEY, share_type INT, uid_owner VARCHAR(32),
        item_type VARCHAR(16), item_source VARCHAR(32), item_target VARCHAR(64),
        file_source BIGINT, file_target VARCHAR(64))""")
      st.close()
    } finally setup.close()
    shares.toDF(shares.columns.map(_.toUpperCase): _*)
      .write.mode("append").jdbc(url, "oc_share", new java.util.Properties())
  }

  private def ordersDf = Tables.orders(spark, dir)
  private def createdInode = lit(SyntheticShares.CreatedInodeOffset) + col("id")

  test("S1 JDBC scan: filters and 6-column projection are pushed into the database query") {
    assume(derbyAvailable, "Derby driver not on classpath")
    seedShares(SyntheticShares.shares(ordersDf))

    val scanned = Migration.scanShares(JdbcShares.read(spark, url))
    val rows = scanned.collect()
    assert(rows.nonEmpty)

    val plan = scanned.queryExecution.executedPlan.toString
    val lp = plan.toLowerCase
    assert(lp.contains("pushedfilters:"), s"no pushed filters in:\n$plan")
    // both equality guards reach the scan (the server-side WHERE of main.go:88)
    assert(lp.contains("share_type") && lp.contains("item_type"),
      s"scan filters missing from:\n$plan")
    val pushed = lp.substring(lp.indexOf("pushedfilters:"))
      .takeWhile(_ != ']')
    assert(pushed.contains("share_type") && pushed.contains("item_type"),
      s"equality filters not in the pushed set:\n$plan")
    // projection pushdown: the unused 8th column never leaves the database
    assert(!lp.contains("uid_owner"), s"scan reads a column the query never uses:\n$plan")
  }

  test("S1 JDBC scan parity: same rows as the parquet-fixture scan") {
    assume(derbyAvailable, "Derby driver not on classpath")
    val fixture = SyntheticShares.shares(ordersDf)
    seedShares(fixture)
    val viaJdbc = Migration.scanShares(JdbcShares.read(spark, url)).collect()
    val viaParquet = Migration.scanShares(fixture).collect()
    assert(viaJdbc.length == viaParquet.length)
    assert(viaJdbc.map(_.toSeq).toSeq == viaParquet.map(_.toSeq).toSeq)
  }

  test("partitioned JDBC read: N range queries, same result set") {
    assume(derbyAvailable, "Derby driver not on classpath")
    val fixture = SyntheticShares.shares(ordersDf)
    seedShares(fixture)
    val bounds = fixture.agg(min("id"), max("id")).head()
    val part = JdbcShares.readPartitioned(spark, url, "id",
      bounds.getLong(0), bounds.getLong(1), numPartitions = 3)
    assert(part.rdd.getNumPartitions == 3, "expected 3 range partitions")
    val viaPart = Migration.scanShares(part).collect()
    val viaSingle = Migration.scanShares(JdbcShares.read(spark, url)).collect()
    assert(viaPart.map(_.toSeq).toSeq == viaSingle.map(_.toSeq).toSeq)
  }

  test("end-to-end: Derby scan -> route -> changeset -> prepared upsert back -> equals functional apply; re-run is a no-op") {
    assume(derbyAvailable, "Derby driver not on classpath")
    val orders = ordersDf
    val fixture = SyntheticShares.shares(orders)
    val ns = SyntheticShares.eosNamespace(orders)
    seedShares(fixture)

    // pass 1: read shares FROM the database, resolve, stage the change-set
    // (written barrier — the scan completes before any write-back starts)
    val resolved = Stage.table(
      Migration.resolvedPipeline(JdbcShares.read(spark, url), ns, createdInode),
      "jdbc_e2e_resolved")
    val cs = Stage.table(Migration.changeset(resolved), "jdbc_e2e_cs")
    assert(cs.count() > 0, "fixture produced an empty change-set")

    implicit val enc: org.apache.spark.sql.Encoder[UpsertRow] = Encoders.product[UpsertRow]
    val outcomes = JdbcUpsert.write(cs.as[UpsertRow].repartition(3),
      new DriverManagerUpsertFactory(url)).collect()
    // every change-set id exists in the table (joined on its PK): exactly
    // one row affected each, no error channel traffic
    assert(outcomes.nonEmpty && outcomes.forall(o => o.affected == 1 && o.error.isEmpty),
      s"unexpected outcomes: ${outcomes.filterNot(o => o.affected == 1 && o.error.isEmpty).take(5).toSeq}")

    // the database now equals the functional applyChangeset result
    val cols = fixture.columns.toSeq
    val functional = Migration.applyChangeset(fixture, cs)
      .select(cols.map(col): _*)
    val readBack = JdbcShares.read(spark, url).select(cols.map(c => col(c)): _*)
    assert(readBack.count() == functional.count())
    assert(readBack.exceptAll(functional).isEmpty && functional.exceptAll(readBack).isEmpty,
      "database state diverges from the functional apply")

    // pass 2: the connector's read-back — created versions folders now
    // exist in the namespace — then re-scan the MIGRATED table. Every
    // previously-updated share routes ALREADY_MIGRATED (P4 guard on the
    // .sys.v#. prefix), so the second change-set is EMPTY: idempotence.
    val created = resolved
      .where(col("decision") === Migration.Decision.Regular &&
        col("versions_ino") >= SyntheticShares.CreatedInodeOffset)
      .select(col("versions_ino").as("ino"), col("versions_path").as("file"),
        lit("0").as("uid"), lit("2766").as("gid"), lit(0L).as("size"))
    val ns2 = ns.unionByName(created)
    val cs2 = Migration.changeset(
      Migration.resolvedPipeline(JdbcShares.read(spark, url), ns2, createdInode))
    assert(cs2.isEmpty,
      s"second pass is not a no-op: ${cs2.limit(5).collect().toSeq}")
  }
}
