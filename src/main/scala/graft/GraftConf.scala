package graft

import org.apache.spark.SparkConf
import org.apache.spark.sql.SparkSession

/** S5 (reference main.go:38-53): the reference's CLI-flag surface re-expressed
  * as session-level configuration. Keys live under `spark.graft.*` so they
  * flow uniformly through `--conf`, spark-defaults, or
  * `SparkSession.builder.config`, and reach executors through Spark's normal
  * conf broadcast — the Spark-native replacement for a global flags struct.
  *
  * Defaults mirror the reference's flag defaults (main.go:39-49).
  */
final case class GraftConf(
    dbUsername: String = "",
    dbPassword: String = "",
    dbHost: String = "",
    dbPort: Int = 0,
    dbName: String = "",
    noTouchDb: Boolean = false, // K2 dry-run flag (main.go:45)
    eosMgmUrl: String = "root://eospps-slave.cern.ch", // main.go:46
    userPrefix: String = "/eos/scratch/user/", // main.go:47
    user: Option[String] = None, // single-user filter (main.go:48)
    debug: Boolean = false) {

  /** DSN assembly twin (main.go:79-80), password redacted — config objects
    * get logged; secrets must not.
    */
  def dsnRedacted: String = s"$dbUsername:***@tcp($dbHost:$dbPort)/$dbName"
}

object GraftConf {
  val Prefix = "spark.graft."

  /** Read the config from an active session (runtime-settable keys). */
  def fromSession(spark: SparkSession): GraftConf = {
    def get(k: String, dflt: String): String =
      spark.conf.getOption(Prefix + k).getOrElse(dflt)
    val d = GraftConf()
    GraftConf(
      dbUsername = get("db.username", d.dbUsername),
      dbPassword = get("db.password", d.dbPassword),
      dbHost = get("db.host", d.dbHost),
      dbPort = get("db.port", d.dbPort.toString).toInt,
      dbName = get("db.name", d.dbName),
      noTouchDb = get("notouchdb", d.noTouchDb.toString).toBoolean,
      eosMgmUrl = get("eos.mgmurl", d.eosMgmUrl),
      userPrefix = get("userprefix", d.userPrefix),
      user = spark.conf.getOption(Prefix + "user").filter(_.nonEmpty),
      debug = get("debug", d.debug.toString).toBoolean)
  }

  /** S6 (main.go:243, `os.Setenv("EOS_MGM_URL", …)`): propagate the MGM URL
    * to every executor process. Executor env is fixed at JVM launch, so this
    * must be applied to the SparkConf BEFORE the context starts —
    * the Spark-native twin of the reference setting the env var before
    * spawning subprocesses.
    */
  def withExecutorEnv(conf: SparkConf, gc: GraftConf): SparkConf =
    conf.set("spark.executorEnv.EOS_MGM_URL", gc.eosMgmUrl)
}
