package graft.operators

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import org.apache.spark.sql.DataFrame

/** Written-table stage barrier.
  *
  * Heavy derived columns (MinHash signatures, SimHash bit votes, quantized
  * embeddings, the migration pipeline's regex-derived paths) must not be
  * left as lazy expression trees: Catalyst's projection collapse inlines
  * them into every downstream operator, so a self-join recomputes the
  * signature once per side per band key, and the duplicated trees blow up
  * optimizer/codegen time. `.cache()` also stops the inlining, but it pins
  * executor memory and is not what a 100 TB pipeline does — there, each
  * expensive feature pass is WRITTEN as a table (parquet on distributed
  * storage) and downstream stages scan it, giving a durable, re-scannable,
  * memory-independent barrier.
  *
  * [[table]] is exactly that: write the frame as parquet once, hand back a
  * fresh scan of it. The stage root comes from `spark.graft.stageDir`
  * ([[StageDirKey]]) — on a cluster, point it at distributed storage
  * (`hdfs://…`, `s3a://…`; the writes go through Spark's normal committer,
  * so any supported scheme works). Unset, it falls back to one per-JVM
  * local tmp root that a shutdown hook removes (the test/bench sandbox;
  * configured dirs are the caller's to manage — a production pipeline
  * keeps its stage tables).
  */
object Stage {

  /** Session conf key for the stage-table root directory. */
  val StageDirKey = "spark.graft.stageDir"

  private lazy val tmpRoot: Path = {
    val dir = Files.createTempDirectory("graft-stage-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(dir)))
    dir
  }

  private def rootFor(spark: org.apache.spark.sql.SparkSession): String =
    spark.conf.getOption(StageDirKey).filter(_.nonEmpty)
      .getOrElse(tmpRoot.toString)

  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Materialize `df` as a written parquet table; return a scan of it. */
  def table(df: DataFrame, name: String): DataFrame = {
    val path = s"${rootFor(df.sparkSession)}/$name-${seq.incrementAndGet()}"
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  private val shared = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Memoized written stage, keyed by (stage name, input dir): the first
    * caller writes, later callers scan the same parquet. This is the
    * reference's actual shape — ONE pipeline run feeds the audit, error,
    * change-set and apply sinks (main.go:241-322) — so sink queries over
    * the same inputs share the upstream materialization instead of each
    * rebuilding it. Unlike caching DataFrames, the map holds only a path
    * string: no executor memory is pinned and no session is retained.
    * Whichever query runs first pays the build (the per-suite TOTAL is the
    * meaningful figure); [[resetShared]] clears the memo so benchmark
    * passes stay independent.
    */
  def sharedTable(spark: org.apache.spark.sql.SparkSession, name: String,
                  dir: String)(df: => DataFrame): DataFrame =
    sharedTableWithPath(spark, name, dir)(df)._1

  /** [[sharedTable]] that also exposes the written directory — for
    * consumers that operate on the FILES of a stage rather than its rows
    * (compaction, file-count audits).
    */
  def sharedTableWithPath(spark: org.apache.spark.sql.SparkSession, name: String,
                          dir: String)(df: => DataFrame): (DataFrame, String) = {
    val p = sharedDir(spark, name, dir) { path =>
      df.write.mode("overwrite").parquet(path)
    }
    (spark.read.parquet(p), p)
  }

  /** Memoized shared OUTPUT DIRECTORY: like [[sharedTable]] but the
    * builder writes the path itself (e.g. [[Compaction.compact]], whose
    * output layout is the whole point). First caller builds; later
    * callers get the same path.
    */
  def sharedDir(spark: org.apache.spark.sql.SparkSession, name: String,
                dir: String)(write: String => Unit): String = {
    val root = rootFor(spark) // memo key includes it: a re-pointed stageDir
    val key = s"$root|$name|$dir"
    // get-then-putIfAbsent rather than computeIfAbsent: stages COMPOSE
    // (building one shared stage may build another inside the thunk), and
    // a nested computeIfAbsent on the same map throws "Recursive update".
    // The non-reentrant form allows nesting; the two failure modes it
    // trades away are restored explicitly: a SELF-recursive stage (its own
    // key in its own thunk) fails fast below instead of overflowing the
    // stack, and a concurrent duplicate build deletes the losing write
    // instead of orphaning it under a user-managed stageDir.
    val path = shared.get(key) match {
      case p: String => p
      case null =>
        require(building.get.add(key),
          s"shared stage '$name' builds itself (cycle through its own thunk)")
        val p = s"$root/$name-${seq.incrementAndGet()}"
        def dropDir(): Unit =
          try {
            val hp = new org.apache.hadoop.fs.Path(p)
            hp.getFileSystem(spark.sessionState.newHadoopConf())
              .delete(hp, true)
          } catch { case _: Throwable => () } // best-effort cleanup
        try {
          write(p)
        } catch { case e: Throwable =>
          dropDir() // a failed write must not orphan a partial dir either
          throw e
        } finally building.get.remove(key)
        shared.putIfAbsent(key, p) match {
          case null => p
          case winner => // lost a race: adopt the winner, drop our copy
            dropDir()
            winner
        }
    }
    path
  }

  // keys this thread is currently building (self-recursion detector)
  private val building =
    new ThreadLocal[scala.collection.mutable.Set[String]] {
      override def initialValue() = scala.collection.mutable.Set.empty[String]
    }

  /** Forget memoized shared stages (files stay until JVM exit). */
  def resetShared(): Unit = shared.clear()

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
}
