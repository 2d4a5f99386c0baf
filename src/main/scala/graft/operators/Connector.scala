package graft.operators

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Namespace-entry metadata (reference `Metadata`, main.go:62-68). */
final case class NsMetadata(ino: Long, path: String, uid: String, gid: String, size: Long)

/** Request/result rows for the distributed create-if-absent pass. */
final case class EnsureRequest(id: Long, vf_key: String, uid: String, gid: String)
final case class EnsureResult(id: Long, vf_key: String,
                              ino: Option[Long], error: Option[String])

/** K5/C4 seam: the external-effect interface the reference implements with
  * `eos` subprocess calls. C4's exit-code dispatch (main.go:148-151: EOS exit
  * status 2 = not-found triggers the create path; anything else propagates)
  * is mapped onto types: not-found is a VALUE (`None`), real failures are
  * exceptions routed to the error side-output by the caller.
  *
  * Implementations must be Serializable — instances are closed over by
  * executor-side `mapPartitions` lambdas.
  */
trait NamespaceConnector extends Serializable {

  /** `eos file info <path> -m` (main.go:123-137): Some(meta), or None when
    * the entry does not exist (exit status 2). Other failures throw.
    */
  def statPath(path: String): Option[NsMetadata]

  /** `eos -r <uid> <gid> file version <path>` (main.go:208-216): create the
    * versions folder as the file's owner. Idempotent: creating an existing
    * folder is a no-op.
    */
  def createVersionsFolder(filePath: String, uid: String, gid: String): Unit
}

/** Simple token-bucket rate limiter (C2 twin): the reference bounds RPC
  * fan-out with a 20-wide semaphore (main.go:260-271); on Spark the
  * task scheduler bounds *parallelism*, and this bounds per-partition
  * *request rate* against the external service.
  */
final class RateLimiter(permitsPerSecond: Double) extends Serializable {
  private val intervalNanos = (1e9 / permitsPerSecond).toLong
  private val nextFree = new AtomicLong(System.nanoTime())
  def acquire(): Unit = {
    val target = nextFree.getAndAdd(intervalNanos)
    val wait = target - System.nanoTime()
    if (wait > 0) Thread.sleep(wait / 1000000, (wait % 1000000).toInt)
  }
}

/** Distributed create-if-absent (K5, main.go:139-180) as a Spark operator:
  * the per-row goroutine + subprocess of the reference becomes one
  * `mapPartitions` pass over only the rows whose versions folder was missing
  * from the bulk namespace snapshot — at 100 TB that's the small residue of
  * the left join, not the full share table.
  */
object Connector {

  /** For every request: stat; if absent, create then re-read until the
    * replica sees it (C3, main.go:156-172 — the reference hot-loops 5 reads;
    * [[Migration.retryWithBackoff]] adds exponential backoff). Failures
    * become error rows (K4 continue-on-error), never task failures.
    *
    * `requestsPerSecond` throttles each partition's RPC rate (C2); total
    * cluster rate = partitions x requestsPerSecond, so callers size
    * `requests.repartition(n)` to the external service's capacity.
    */
  def ensureVersionsFolders(requests: Dataset[EnsureRequest],
                            connector: NamespaceConnector,
                            requestsPerSecond: Double = 1000.0,
                            maxRetries: Int = 5): Dataset[EnsureResult] = {
    implicit val enc = Encoders.product[EnsureResult]
    requests.mapPartitions { it =>
      val limiter = new RateLimiter(requestsPerSecond)
      it.map { r =>
        try {
          limiter.acquire()
          val meta = connector.statPath(r.vf_key).getOrElse {
            connector.createVersionsFolder(r.vf_key, r.uid, r.gid)
            Migration.retryWithBackoff(maxRetries) { () =>
              limiter.acquire()
              connector.statPath(r.vf_key)
                .getOrElse(throw new IllegalStateException(
                  s"versions folder not visible yet: ${r.vf_key}"))
            }
          }
          EnsureResult(r.id, r.vf_key, Some(meta.ino), None)
        } catch {
          case e: Exception =>
            EnsureResult(r.id, r.vf_key, None,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
  }

  /** The REGULAR-decision rows whose folder the namespace snapshot didn't
    * have — the exact population the reference's create path serves.
    */
  def missingFolderRequests(resolved: DataFrame): Dataset[EnsureRequest] = {
    implicit val enc = Encoders.product[EnsureRequest]
    resolved
      .where(col("decision") === Migration.Decision.Regular &&
        col("versions_ino").isNull)
      .select(col("id"), col("versions_path").as("vf_key"),
        col("meta_uid").as("uid"), col("meta_gid").as("gid"))
      .as[EnsureRequest]
  }
}

/** Deterministic in-JVM connector for tests and local runs: a shared
  * namespace map, with a configurable replication lag (the first `lagReads`
  * stats after a create return not-found — exercising the C3 retry) and an
  * optional failing path (exercising the K4 error channel).
  */
final class FakeConnector(namespaceId: String,
                          lagReads: Int = 0,
                          failPaths: Set[String] = Set.empty)
    extends NamespaceConnector {
  import FakeConnector._
  private def ns = namespaces.computeIfAbsent(namespaceId, _ => new ConcurrentHashMap())
  private def lags = pendingLag.computeIfAbsent(namespaceId, _ => new ConcurrentHashMap())

  override def statPath(path: String): Option[NsMetadata] = {
    if (failPaths(path)) throw new RuntimeException(s"connector failure: $path")
    Option(ns.get(path)).filter { _ =>
      val remaining = lags.getOrDefault(path, 0)
      if (remaining > 0) { lags.put(path, remaining - 1); false } else true
    }
  }

  override def createVersionsFolder(filePath: String, uid: String, gid: String): Unit = {
    val created = NsMetadata(
      ino = inodeSeq.incrementAndGet(), path = filePath, uid = uid, gid = gid, size = 0L)
    if (ns.putIfAbsent(filePath, created) == null && lagReads > 0)
      lags.put(filePath, lagReads)
    createCalls.incrementAndGet()
  }

  def seed(meta: NsMetadata): Unit = ns.put(meta.path, meta)
  def entries: Map[String, NsMetadata] = {
    import scala.jdk.CollectionConverters._
    ns.asScala.toMap
  }
}

object FakeConnector {
  // JVM-wide state: executor threads in local mode share it with the driver.
  private val namespaces = new ConcurrentHashMap[String, ConcurrentHashMap[String, NsMetadata]]()
  private val pendingLag = new ConcurrentHashMap[String, ConcurrentHashMap[String, Integer]]()
  private val inodeSeq = new AtomicLong(500000000L)
  val createCalls = new AtomicLong(0L)
  def reset(namespaceId: String): Unit = {
    namespaces.remove(namespaceId); pendingLag.remove(namespaceId)
  }
}
