package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch `events` analytics
  * (graft.queries.EventQueries): the same logical transforms lifted onto
  * unbounded input with watermarks bounding state. The reference is
  * batch-only (SURVEY §2.8) — this is the extension surface.
  *
  * State-scale notes: every stateful op below keys its state by a bounded
  * dimension (window x event_type, event_id within watermark, user_id), and
  * watermarks let Spark evict state — the properties that keep a stream
  * job running at 100 TB/day ingest.
  */
object EventStreams {

  /** Tumbling 1-hour windowed counts with a 2-hour watermark (late data
    * beyond that is dropped; state for closed windows is evicted).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Exactly-once style dedup on event_id, bounded by the watermark. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Session windows per user (30-min gap), the streaming twin of
    * e03_sessionize.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))

  /** Stream-stream interval join: attribute each purchase to the same
    * user's page views in the preceding hour. Both sides carry watermarks
    * and the join condition bounds purchase_ts to [view_ts, view_ts + 1h],
    * so the state store holds only one hour of either stream per user —
    * the two properties (watermark + time-range predicate) that make a
    * stream-stream join's state finite. Without the range bound Spark
    * would buffer both streams forever.
    */
  def viewPurchaseJoin(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views
      .select(col("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
      .withWatermark("view_ts", "1 hour")
    val p = purchases
      .select(col("user_id").as("purchase_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "1 hour")
    v.join(p,
      col("user_id") === col("purchase_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("view_ts"), col("purchase_ts"), col("value"))
  }

  /** Stream-static enrichment join — the workhorse streaming shape:
    * every micro-batch of the stream joins a BROADCAST static dimension
    * (user table, product catalog) with NO streaming state at all (the
    * static side is bounded; nothing needs buffering across batches).
    * Left join so dimension misses flow through with nulls for the error
    * channel rather than silently dropping events — the K4 discipline
    * applied to streams.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Typed event for custom-state pipelines. */
  final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                      event_type: String, value: Double)

  /** Per-user running aggregate via custom state. */
  final case class UserStat(user_id: Long, n_events: Long, total_value: Double)

  /** Custom stateful op (mapGroupsWithState): running per-user counters —
    * the escape hatch when SQL windows can't express the state machine.
    * (NoTimeout: a processing-time timeout would make the engine schedule
    * continuous empty timeout-batches; evict via watermark/TTL in real
    * deployments.)
    */
  def runningUserStats(spark: SparkSession, events: Dataset[Ev]): Dataset[UserStat] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserStat, UserStat](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(userId, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { e => n += 1; tot += e.value }
          val next = UserStat(userId, n, tot)
          state.update(next)
          next
      }
  }

  /** The same per-user state machine on Spark 4's arbitrary-state API
    * (`transformWithState`): explicit named [[org.apache.spark.sql.streaming.ValueState]]
    * with per-state TTL hooks and timers — the operationally scalable form
    * (requires the RocksDB state store provider; state lives off-heap and
    * TTL eviction is per state variable, not per operator).
    */
  final class UserStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, UserStat] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var stat: ValueState[UserStat] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stat = getHandle.getValueState[UserStat]("stat",
        Encoders.product[UserStat], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Ev],
                                 timerValues: TimerValues): Iterator[UserStat] = {
      val prev = if (stat.exists()) stat.get() else UserStat(user, 0L, 0.0)
      var n = prev.n_events
      var tot = prev.total_value
      rows.foreach { e => n += 1; tot += e.value }
      val next = UserStat(user, n, tot)
      stat.update(next)
      Iterator.single(next)
    }
  }

  /** [[runningUserStats]] via `transformWithState`. */
  def runningUserStatsTws(spark: SparkSession, events: Dataset[Ev]): Dataset[UserStat] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .groupByKey(_.user_id)
      .transformWithState(new UserStatsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Convenience: run a streaming query over a memory sink until all
    * currently-available input is processed; returns the sink table name.
    */
  def runToMemorySink(df: DataFrame, name: String, mode: OutputMode): Unit = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable()
    finally q.stop()
  }
}
