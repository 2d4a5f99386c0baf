package graft.operators

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import graft.GraftConf

/** One change-set row, shaped exactly like [[Migration.changeset]] output. */
final case class UpsertRow(id: Long, new_item_source: String, new_item_target: String,
                           new_file_source: Long, new_file_target: String)

/** Per-row write outcome: `affected` is the driver-reported row count
  * (-1 when the statement itself failed), `error` the K4 continue-on-error
  * channel.
  */
final case class UpsertOutcome(id: Long, affected: Int, error: Option[String])

/** A prepared keyed-update statement (JDBC `PreparedStatement` shape):
  * bind positional params, execute, report affected rows.
  */
trait PreparedUpsert extends AutoCloseable {
  def executeUpdate(params: Seq[Any]): Int
  override def close(): Unit
}

/** One database connection; `prepare` compiles the statement ONCE so every
  * row in the partition reuses it (SURVEY §4's per-partition
  * prepared-statement reuse; the reference re-prepares per row,
  * main.go:222-226 — one of the things we deliberately do better).
  */
trait UpsertConnection extends AutoCloseable {
  def prepare(sql: String): PreparedUpsert
  override def close(): Unit
}

/** Serializable seam: shipped to executors, each partition opens its own
  * connection. A real MySQL implementation wraps `java.sql.DriverManager`;
  * the sandbox has no database, so [[FakeJdbcFactory]] is the test double
  * (same pattern as `NamespaceConnector`/`FakeConnector`).
  */
trait UpsertConnectionFactory extends Serializable {
  def connect(): UpsertConnection
}

/** K1 sink (main.go:217-240): the validated keyed upsert writer.
  *
  * The reference writes one prepared `UPDATE oc_share ... WHERE id=?` per
  * share from a per-row goroutine and asserts exactly one row was
  * affected. Spark-native shape: `mapPartitions` over the change-set —
  * one connection + one prepared statement per partition, one
  * `executeUpdate` per row, affected-rows validation mapped onto the K4
  * error channel (0 rows = "share id does not exist anymore",
  * main.go:232-238; >1 rows = corrupt-key assertion). At 100 TB the
  * change-set is the small residue of the pipeline, and cluster-wide write
  * parallelism = partition count, sized by the caller via `repartition`.
  */
object JdbcUpsert {

  /** The reference's UPDATE (main.go:222-224), positional params in the
    * same order + id last.
    */
  val UpdateSql: String =
    "UPDATE oc_share SET item_source=?, item_target=?, file_source=?, file_target=? WHERE id=?"

  val ErrShareDeleted = "share id does not exist anymore" // main.go:236

  /** Write the change-set through the connection seam. `dryRun` (K2,
    * main.go:219-221) emits the would-be outcomes without touching the
    * sink; `debug` (main.go:30,35 per-command trace) logs each bound
    * statement.
    */
  def write(cs: Dataset[UpsertRow], factory: UpsertConnectionFactory,
            dryRun: Boolean = false, debug: Boolean = false,
            maxRetries: Int = 5): Dataset[UpsertOutcome] = {
    implicit val enc = Encoders.product[UpsertOutcome]
    if (dryRun) cs.map { r =>
      if (debug) System.err.println(s"[graft dry-run] $UpdateSql <- ${bind(r)}")
      UpsertOutcome(r.id, 0, None)
    }
    else cs.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val conn = factory.connect()
        val stmt = conn.prepare(UpdateSql) // prepared ONCE per partition
        var closed = false
        def closeOnce(): Unit =
          if (!closed) { closed = true; stmt.close(); conn.close() }
        // close on task completion even when the iterator is abandoned
        // mid-stream (limit/take downstream, task failure) — otherwise the
        // connection leaks once per partition
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
        val out = it.map { r =>
          if (debug) System.err.println(s"[graft] $UpdateSql <- ${bind(r)}")
          try {
            val n = Migration.retryWithBackoff(maxRetries, initialDelayMs = 10) {
              () => stmt.executeUpdate(bind(r))
            }
            if (n == 1) UpsertOutcome(r.id, n, None)
            else if (n == 0) UpsertOutcome(r.id, 0, Some(ErrShareDeleted))
            else UpsertOutcome(r.id, n, Some(s"expected 1 row affected, got $n"))
          } catch {
            case e: Exception =>
              UpsertOutcome(r.id, -1,
                Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
          }
        }
        new Iterator[UpsertOutcome] {
          def hasNext: Boolean = {
            val h = out.hasNext
            if (!h) closeOnce()
            h
          }
          def next(): UpsertOutcome = out.next()
        }
      }
    }
  }

  /** Config-driven entry: dry-run from `spark.graft.notouchdb` (K2), trace
    * from `spark.graft.debug` — the consumers of those GraftConf flags.
    */
  def writeWithConf(spark: SparkSession, cs: Dataset[UpsertRow],
                    factory: UpsertConnectionFactory): Dataset[UpsertOutcome] = {
    val conf = GraftConf.fromSession(spark)
    write(cs, factory, dryRun = conf.noTouchDb, debug = conf.debug)
  }

  private def bind(r: UpsertRow): Seq[Any] =
    Seq(r.new_item_source, r.new_item_target, r.new_file_source, r.new_file_target, r.id)
}

/** The real-JDBC implementation of the connection seam: one
  * `java.sql.Connection` per partition via `DriverManager`, statements
  * compiled once per partition through `prepareStatement` and re-executed
  * per row with positional binds. Serializable by construction — it
  * carries only the URL and properties; every executor partition opens
  * its own connection (the reference opens ONE process-wide MySQL
  * connection, main.go:81-86; partition-scoped connections are the
  * cluster-parallel equivalent). Works against any JDBC driver on the
  * executor classpath — MySQL in the reference deployment, embedded
  * Derby in this sandbox's tests (JdbcUpsertSpec).
  */
final class DriverManagerUpsertFactory(url: String,
                                       props: Map[String, String] = Map.empty)
    extends UpsertConnectionFactory {

  override def connect(): UpsertConnection = new UpsertConnection {
    private val conn = {
      val p = new java.util.Properties()
      props.foreach { case (k, v) => p.setProperty(k, v) }
      java.sql.DriverManager.getConnection(url, p)
    }
    override def prepare(sql: String): PreparedUpsert = new PreparedUpsert {
      private val ps = conn.prepareStatement(sql)
      override def executeUpdate(params: Seq[Any]): Int = {
        params.zipWithIndex.foreach { case (v, i) => ps.setObject(i + 1, v) }
        ps.executeUpdate()
      }
      override def close(): Unit = ps.close()
    }
    override def close(): Unit = conn.close()
  }
}

/** In-JVM fake database for tests/local runs: a shared id-keyed table per
  * `storeId`. `executeUpdate` affects 1 row when the id exists, 0 when it
  * does not (the reference's deleted-share case), and throws for ids in
  * `failIds` (exercising retry + the error channel).
  */
final class FakeJdbcFactory(storeId: String, failIds: Set[Long] = Set.empty)
    extends UpsertConnectionFactory {

  override def connect(): UpsertConnection = new UpsertConnection {
    FakeJdbcStore.connectCalls.incrementAndGet()
    override def prepare(sql: String): PreparedUpsert = {
      FakeJdbcStore.prepareCalls.incrementAndGet()
      require(sql == JdbcUpsert.UpdateSql, s"unexpected statement: $sql")
      new PreparedUpsert {
        override def executeUpdate(params: Seq[Any]): Int = {
          val Seq(itemSource, itemTarget, fileSource, fileTarget, id) = params
          val key = id.asInstanceOf[Long]
          if (failIds(key)) throw new RuntimeException(s"connection lost on id $key")
          val table = FakeJdbcStore.table(storeId)
          if (table.replace(key,
              Vector(itemSource, itemTarget, fileSource, fileTarget)) != null) 1
          else 0
        }
        override def close(): Unit = ()
      }
    }
    override def close(): Unit = ()
  }
}

object FakeJdbcStore {
  // JVM-wide: executor threads in local mode share it with the driver.
  private val tables =
    new ConcurrentHashMap[String, ConcurrentHashMap[Long, Vector[Any]]]()
  val prepareCalls = new AtomicLong(0L)
  val connectCalls = new AtomicLong(0L)

  def table(storeId: String): ConcurrentHashMap[Long, Vector[Any]] =
    tables.computeIfAbsent(storeId, _ => new ConcurrentHashMap())
  def seed(storeId: String, id: Long): Unit =
    table(storeId).put(id, Vector("", "", 0L, ""))
  def rows(storeId: String): Map[Long, Vector[Any]] = {
    import scala.jdk.CollectionConverters._
    table(storeId).asScala.toMap
  }
  def reset(storeId: String): Unit = tables.remove(storeId)
}
