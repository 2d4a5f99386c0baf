package graft

import org.apache.spark.sql.functions._
import graft.operators.{Migration, SyntheticShares}
import graft.operators.Migration.Decision

/** End-to-end pipeline semantics on the deterministic fixtures
  * (reference main.go:241-322 behaviors).
  */
class MigrationSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val orders = Tables.orders(spark, sfDir)
  private lazy val shares = SyntheticShares.shares(orders).cache()
  private lazy val ns = SyntheticShares.eosNamespace(orders).cache()
  private def createdInode = lit(SyntheticShares.CreatedInodeOffset) + col("id")
  private lazy val resolved =
    Migration.resolvedPipeline(shares, ns, createdInode).cache()

  test("scan pushes filters and keeps the 6-column projection (main.go:86-97)") {
    val scanned = Migration.scanShares(shares)
    assert(scanned.columns.toSeq ==
      Seq("id", "share_type", "item_source", "item_target", "file_source", "file_target"))
    assert(scanned.count() > 0)
    // user filter variant (P3)
    val u = Migration.scanShares(shares, Some("user1"))
    assert(u.where(col("share_type") =!= 3).count() == 0)
  }

  test("router totality: every scanned row gets exactly one decision (C1)") {
    val total = Migration.scanShares(shares).count()
    val byDecision = resolved.groupBy("decision").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDecision.values.sum == total)
    // all five reachable branches occur in the fixture
    Seq(Decision.AlreadyMigrated, Decision.NotUnderHome, Decision.Version,
      Decision.Regular, Decision.ErrorMissing).foreach { dec =>
      assert(byDecision.getOrElse(dec, 0L) > 0L, s"branch $dec unreached")
    }
  }

  test("null file_source routes to the error channel, not inode 0 (main.go:272 trap)") {
    val nullIds = Migration.scanShares(shares)
      .where(col("file_source").isNull).select("id").collect().map(_.getLong(0)).toSet
    assert(nullIds.nonEmpty)
    val errIds = Migration.errors(resolved)
      .where(col("error") === Decision.ErrorMissing)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(nullIds.subsetOf(errIds))
  }

  test("changeset formatting matches main.go:218,228 (string inode, / prefixes)") {
    val row = Migration.changeset(resolved).orderBy("id").head()
    val ino = row.getAs[Long]("new_file_source")
    assert(row.getAs[String]("new_item_source") == ino.toString)
    assert(row.getAs[String]("new_item_target") == s"/$ino")
    assert(row.getAs[String]("new_file_target").startsWith("/.sys.v#."))
  }

  test("idempotence: migrating an already-migrated table is a fixpoint (P4)") {
    val once = Migration.run(shares, ns, createdInode).cache()
    // Updated shares now point at versions folders: their basenames carry the
    // .sys.v#. prefix, so a second pass routes them ALREADY_MIGRATED (or to
    // the error channel for created-but-unlisted inodes) and changes nothing.
    val twice = Migration.run(once, ns, createdInode)
    assert(twice.except(once).count() == 0 && once.except(twice).count() == 0)
    once.unpersist()
  }

  test("dry-run returns the input unchanged (K2, main.go:219-221)") {
    val dry = Migration.run(shares, ns, createdInode, dryRun = true)
    assert(dry.except(shares).count() == 0 && shares.except(dry).count() == 0)
  }

  test("K1 validation: dangling change-set ids become error rows (main.go:232-238)") {
    val cs = Migration.changeset(resolved)
    val someId = cs.select("id").head().getLong(0)
    val target = shares.where(col("id") =!= someId)
    val bad = Migration.validateChangeset(cs, target).collect()
    assert(bad.map(_.getLong(0)).toSet == Set(someId))
    assert(bad.head.getString(1) == Migration.ErrorShareDeleted)
    // intact target -> no errors
    assert(Migration.validateChangeset(cs, shares).count() == 0)
  }

  test("P7: empty scan aborts (main.go:255-258)") {
    val empty = shares.where(lit(false))
    intercept[IllegalStateException] {
      Migration.requireNonEmpty(Migration.scanShares(empty))
    }
    assert(Migration.requireNonEmpty(Migration.scanShares(shares)).columns.length == 6)
  }

  test("C3: retry with backoff retries then succeeds / exhausts") {
    var calls = 0
    val v = Migration.retryWithBackoff(maxRetries = 5, initialDelayMs = 1) { () =>
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      42
    }
    assert(v == 42 && calls == 3)
    intercept[RuntimeException] {
      Migration.retryWithBackoff(maxRetries = 2, initialDelayMs = 1) { () =>
        throw new RuntimeException("always")
      }
    }
  }
}
