package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Batch analytics over the `events` stream table: JSON props extraction,
  * tumbling-window aggregation, and gap-based sessionization. These are the
  * batch twins of the Structured Streaming pipelines in
  * `graft.streaming.EventStreams` (same logical transforms; streaming adds
  * watermarks) — registered here so the semantics are oracle-certified.
  *
  * Money/metric sums go through DECIMAL (exact, order-free) and are cast
  * back to double at the edge.
  */
object EventQueries {

  /** e12 attribution lookback: 7 days in epoch microseconds. */
  val AttribWindowUs: Long = 7L * 24 * 3600 * 1000000L

  val entries: Seq[Q] = Seq(

    // JSON extraction + per-type aggregate: one scan, shuffle on the
    // low-cardinality event_type key with map-side partial aggregation.
    Q("e01_json_agg",
      """SELECT event_type,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
          sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
        .orderBy("event_type")
    },

    // Tumbling 1-hour windows per event type (the batch shape of a
    // streaming windowed count; partition-wise partial agg, then one
    // shuffle on (window, type)).
    Q("e02_hourly_windows",
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
        |       event_type,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(
          window(col("ts"), "1 hour").getField("start").as("window_start"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy("window_start", "event_type")
    },

    // Gap-based sessionization (30-min inactivity): lag -> new-session flag
    // -> running sum = session id, then per-session rollup. Two window
    // passes over the same (user_id, time) partitioning — one shuffle,
    // reused by both windows and the final groupBy.
    Q("e03_sessionize",
      """WITH x AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS t,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pt
        |  FROM events
        |),
        |flagged AS (
        |  SELECT *, CASE WHEN pt IS NULL OR t - pt > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM x
        |),
        |sessions AS (
        |  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, session_id,
        |       COUNT(*) AS n_events,
        |       MIN(ts) AS session_start,
        |       CAST(MAX(t) - MIN(t) AS BIGINT) AS duration_us
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
      val byTime = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val running = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("t", unix_micros(col("ts")))
        .withColumn("pt", lag(unix_micros(col("ts")), 1).over(byTime))
        .withColumn("new_session",
          when(col("pt").isNull || col("t") - col("pt") > 1800000000L, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(running))
        .groupBy("user_id", "session_id")
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          (max(col("t")) - min(col("t"))).as("duration_us"))
        .orderBy("user_id", "session_id")
    },

    // Funnel: users who viewed, then clicked within 1h of the first view,
    // then purchased within 1h of that click. Three conditional-min
    // aggregations chained by equi-joins — every join and groupBy keys on
    // user_id, so one hash partitioning serves the whole funnel; no
    // cross joins, no per-user collect.
    Q("e04_funnel",
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
        |u AS (
        |  SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN t END) AS v
        |  FROM ev GROUP BY user_id
        |),
        |c AS (
        |  SELECT e.user_id, MIN(e.t) AS c
        |  FROM ev e JOIN u ON e.user_id = u.user_id
        |  WHERE e.event_type = 'click' AND u.v IS NOT NULL
        |    AND e.t > u.v AND e.t <= u.v + 3600000000
        |  GROUP BY e.user_id
        |),
        |p AS (
        |  SELECT e.user_id, MIN(e.t) AS p
        |  FROM ev e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND e.t > c.c AND e.t <= c.c + 3600000000
        |  GROUP BY e.user_id
        |)
        |SELECT CAST(SUM(CASE WHEN u.v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |       CAST(SUM(CASE WHEN c.c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
        |       CAST(SUM(CASE WHEN p.p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click_purchase
        |FROM u LEFT JOIN c ON u.user_id = c.user_id
        |       LEFT JOIN p ON u.user_id = p.user_id""".stripMargin) { (s, d) =>
      val HourUs = 3600000000L
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
      val u = ev.groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("t"))).as("v"))
      val c = ev.where(col("event_type") === "click").join(u, "user_id")
        .where(col("v").isNotNull && col("t") > col("v") && col("t") <= col("v") + HourUs)
        .groupBy("user_id").agg(min("t").as("c"))
      val p = ev.where(col("event_type") === "purchase").join(c, "user_id")
        .where(col("t") > col("c") && col("t") <= col("c") + HourUs)
        .groupBy("user_id").agg(min("t").as("p"))
      u.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .agg(
          sum(when(col("v").isNotNull, 1L).otherwise(0L)).as("n_view"),
          sum(when(col("c").isNotNull, 1L).otherwise(0L)).as("n_view_click"),
          sum(when(col("p").isNotNull, 1L).otherwise(0L)).as("n_view_click_purchase"))
    },

    // As-of join (backward, inclusive): each purchase joins the most recent
    // click at-or-before it by the same user — the time-series join Spark
    // has no builtin for (DuckDB: ASOF JOIN). Composition, not a per-key
    // loop: tag both sides, union, then ONE shuffle on user_id and one
    // in-partition sort; last(_, ignoreNulls) over (t, side, c_id) carries
    // the latest click forward into each purchase row. Ordering clicks by
    // c_id within equal t makes the carried click the max-event_id one —
    // the oracle's per-(user, t) MAX(event_id) dedup — without a separate
    // groupBy shuffle. This is the scale shape: no range join, no per-user
    // collect, ONE exchange (plus the output sort).
    Q("e05_asof_join",
      """WITH p AS (
        |  SELECT user_id, event_id AS p_id, epoch_us(ts) AS t
        |  FROM events WHERE event_type = 'purchase'
        |),
        |c AS (
        |  SELECT user_id, epoch_us(ts) AS t, MAX(event_id) AS c_id
        |  FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts)
        |)
        |SELECT p.p_id, p.user_id, p.t AS t_purchase,
        |       c.c_id, c.t AS t_click,
        |       CAST(p.t - c.t AS BIGINT) AS gap_us
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.t >= c.t
        |ORDER BY p_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("t"))
      val p = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("t"), lit(1).as("side"),
          col("event_id").as("p_id"), lit(null).cast("long").as("c_id"))
      val c = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("t"), lit(0).as("side"),
          lit(null).cast("long").as("p_id"), col("event_id").as("c_id"))
      // clicks (side=0) sort before purchases (side=1) at equal t => the
      // join is inclusive (p.t >= c.t), matching ASOF's default; c_id in
      // the order makes equal-t click ties resolve to the max event_id
      val w = Window.partitionBy("user_id").orderBy(col("t"), col("side"), col("c_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      p.unionByName(c)
        .withColumn("last_c_id", last(col("c_id"), ignoreNulls = true).over(w))
        .withColumn("last_c_t",
          last(when(col("c_id").isNotNull, col("t")), ignoreNulls = true).over(w))
        .where(col("side") === 1)
        .select(col("p_id"), col("user_id"), col("t").as("t_purchase"),
          col("last_c_id").as("c_id"), col("last_c_t").as("t_click"),
          (col("t") - col("last_c_t")).as("gap_us"))
        .orderBy("p_id")
    },

    // Cohort retention: each user's cohort = first active day; retention
    // cell (cohort_day, day_offset) counts distinct users from that cohort
    // active offset days later — the standard engagement matrix, and the
    // shape of "which training-data snapshot did a doc first appear in".
    // Scale shape: one map-side day projection of the event scan, a
    // (user, day) distinct (uniform keys), a user-keyed aggregate for the
    // cohort map (|users| rows, << events — AQE broadcasts it or
    // co-shuffles both sides on user_id), then a (cohort, offset) agg over
    // |users| x |days| rows at most. No window over the full event table.
    Q("e06_cohort_retention",
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS active_day
        |  FROM events
        |),
        |cohort AS (
        |  SELECT user_id, MIN(active_day) AS cohort_day FROM act GROUP BY user_id
        |)
        |SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
        |       CAST(date_diff('day', c.cohort_day, a.active_day) AS BIGINT) AS day_offset,
        |       COUNT(DISTINCT a.user_id) AS n_users
        |FROM act a JOIN cohort c ON a.user_id = c.user_id
        |GROUP BY c.cohort_day, day_offset
        |ORDER BY cohort_day, day_offset""".stripMargin) { (s, d) =>
      val act = Tables.events(s, d)
        .select(col("user_id"), to_date(date_trunc("day", col("ts"))).as("active_day"))
        .distinct()
      val cohort = act.groupBy("user_id").agg(min("active_day").as("cohort_day"))
      act.join(cohort, Seq("user_id"))
        // a date column would round-trip as Timestamp through the oracle's
        // pandas compare; an ISO string is type-stable cross-engine
        .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
          datediff(col("active_day"), col("cohort_day")).cast("long").as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    },

    // Hopping (sliding) windows: 1-hour windows every 30 minutes — each
    // event lands in exactly 2 windows (window/slide = 2x row expansion,
    // then the same uniform (window, type) keyed aggregate as e02; the
    // expansion factor, not the data, sets the cost — never materialize
    // overlapping windows wider than the slide ratio). Batch twin of
    // streaming `window(ts, "1 hour", "30 minutes")`; DuckDB enumerates
    // the two containing window starts per event explicitly.
    Q("e07_hopping_windows",
      """SELECT window_start, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
        |                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
        |           AS window_start,
        |         event_type, value
        |  FROM events
        |)
        |GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(
          window(col("ts"), "1 hour", "30 minutes").getField("start").as("window_start"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy("window_start", "event_type")
    },

    // Gap-filled hourly series: e02's aggregate LEFT-joined onto the
    // complete (hour x event_type) grid so empty hours surface as
    // explicit zeros — what downstream time-series consumers (charting,
    // anomaly scoring, forecasting) need. The hour spine derives from a
    // ONE-ROW min/max aggregate exploded through sequence() — never a
    // driver-side loop — and the grid (span-hours x |types|) is tiny
    // relative to the events, so the only data-sized work is e02's own
    // aggregate; the grid join is hour-keyed on post-aggregate rows.
    Q("e08_gap_fill",
      """WITH bounds AS (
        |  SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
        |  FROM events
        |),
        |hours AS (
        |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS window_start FROM bounds
        |),
        |types AS (SELECT DISTINCT event_type FROM events),
        |grid AS (SELECT window_start, event_type FROM hours CROSS JOIN types),
        |agg AS (
        |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
        |         COUNT(*) AS n,
        |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY window_start, event_type
        |)
        |SELECT g.window_start, g.event_type,
        |       CAST(COALESCE(a.n, 0) AS BIGINT) AS n,
        |       COALESCE(a.sum_value, 0.0) AS sum_value
        |FROM grid g LEFT JOIN agg a
        |  ON g.window_start = a.window_start AND g.event_type = a.event_type
        |ORDER BY g.window_start, g.event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val bounds = ev.agg(
        date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      val hours = bounds.select(
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
          .as("window_start"))
      val types = ev.select("event_type").distinct()
      val grid = hours.join(broadcast(types))
      val agg = ev.groupBy(
          window(col("ts"), "1 hour").getField("start").as("window_start"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      grid.join(agg, Seq("window_start", "event_type"), "left")
        .select(col("window_start"), col("event_type"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
        .orderBy("window_start", "event_type")
    },

    // Event-type transition matrix (per-user Markov bigrams): lag() over
    // the same deterministic (user_id; ts, event_id) ordering e03 uses,
    // then a count per (prev, next) pair. One shuffle on user_id for the
    // window; the final aggregate shuffles only |types|^2 partial counts
    // — the matrix itself is tiny at any corpus size. The canonical
    // session-modeling / next-event-prediction feature input.
    Q("e09_transitions",
      """WITH x AS (
        |  SELECT user_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           AS prev_type
        |  FROM events
        |)
        |SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        |FROM x WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, next_type
        |ORDER BY prev_type, next_type""".stripMargin) { (s, d) =>
      val byTime = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_type", lag(col("event_type"), 1).over(byTime))
        .where(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("prev_type", "next_type")
    },

    // Behavioral-motif mining: each user's first 8 events (by the
    // deterministic e03 ordering) joined into a '>'-separated path
    // string, then the 20 most common paths. The aggregation is a
    // DETERMINISTIC ordered collect — `collect_list` alone is
    // partition-order-dependent (the classic Spark correctness trap), so
    // the list carries its row_number and is array_sort'ed before the
    // join, making the path a pure function of the data. State is
    // bounded: the rn <= 8 filter rides q07's WindowGroupLimit pushdown
    // (per-partition bounded pass before the full sort), each user's
    // collect holds at most 8 structs, and the final top-20 is a
    // TakeOrdered, never a global sort.
    Q("e10_event_paths",
      """WITH r AS (
        |  SELECT user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        |),
        |p AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 8 GROUP BY user_id
        |)
        |SELECT path, COUNT(*) AS n_users FROM p GROUP BY path
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin) { (s, d) =>
      val byTime = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(byTime))
        .where(col("rn") <= 8)
        .groupBy("user_id")
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("rn"), col("event_type").as("et")))),
            x => x.getField("et")),
          ">").as("path"))
        .groupBy("path")
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path"))
        .limit(20)
    },

    // Burst / anomaly detection over the hourly series: flag hours whose
    // event count exceeds 2x the trailing-24h average — the monitoring
    // query every ingest pipeline runs over its own throughput, and the
    // shape of "did a crawler dump a spike into this snapshot". The
    // series is GAP-FILLED onto the complete hour spine first (e08's
    // sequence()-derived grid, zero-filled), so "24 PRECEDING" means 24
    // WALL-CLOCK hours — an ingest pause contributes zeros to the
    // baseline instead of silently stretching the window onto days-old
    // rows. The comparison is INTEGER (count * 24 > 2 * trailing_sum over
    // full windows only), so both engines agree exactly; partial leading
    // windows (fewer than 24 prior hours) are never flagged — a burst
    // needs a full day of context. Scale shape: the raw scan collapses to
    // an hourly aggregate FIRST (map-side partials onto |hours| rows —
    // tiny), and the spine join + sliding window run over that series,
    // never over events; a years-long series is still only ~10k rows.
    // The spine spans min(ts)..max(ts), so ONE corrupt far-future
    // timestamp would inflate it (same exposure as e08's grid, and
    // identically in the oracle) — q33's events_ts_in_range rule is the
    // loud upstream catch; run the DQ suite before the time-series ones.
    Q("e11_burst_detect",
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1
        |),
        |bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
        |spine AS (
        |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds
        |),
        |grid AS (
        |  SELECT s.h, COALESCE(hourly.n, 0) AS n
        |  FROM spine s LEFT JOIN hourly ON s.h = hourly.h
        |),
        |w AS (
        |  SELECT h, n,
        |         CAST(SUM(n) OVER (ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS BIGINT) AS prev_sum,
        |         CAST(COUNT(*) OVER (ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS BIGINT) AS prev_n
        |  FROM grid
        |)
        |SELECT h, n, prev_sum,
        |       (prev_n = 24 AND n * 24 > 2 * prev_sum) AS burst
        |FROM w ORDER BY h""".stripMargin) { (s, d) =>
      val hourly = Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
      val spine = hourly
        .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(explode(sequence(col("h0"), col("h1"),
          expr("INTERVAL 1 HOUR"))).as("h"))
      val trailing = Window.orderBy(col("h")).rowsBetween(-24, -1)
      spine.join(hourly, Seq("h"), "left")
        .select(col("h"), coalesce(col("n"), lit(0L)).as("n"))
        .withColumn("prev_sum", sum(col("n")).over(trailing))
        .withColumn("prev_n", count(lit(1)).over(trailing))
        .select(col("h"), col("n"), col("prev_sum"),
          (col("prev_n") === 24 && col("n") * 24 > col("prev_sum") * 2).as("burst"))
        .orderBy("h")
    },

    // Multi-touch attribution (e12): split each purchase's conversion
    // credit across the user's click/view touches in the preceding 7
    // days, U-shaped 40/20/40 (first 40%, last 40%, middles share 20%;
    // two touches split 50/50, a solo touch takes 100% — credit conserves
    // up to the middle-share floor) — the marketing-analytics generalization of
    // e05's single-touch as-of join. Credit is integer ppm with one
    // floor DIV for the middle share (k >= 3 whenever a middle exists),
    // so per-class sums are sums of longs — exact in both engines.
    // Scale shape: the touch-to-conversion pairing is an EQUI-join on
    // user_id with the 7-day bound as a residual range predicate (per
    // user the pairing is bounded by activity density, never all-pairs
    // across users); ranking partitions by conversion id — bounded by
    // touches-per-conversion; the rollup is a tiny uniform-key
    // aggregate. The streaming twin of the pairing is
    // [[graft.streaming.EventStreams.viewPurchaseJoin]]'s watermarked
    // interval join.
    Q("e12_attribution",
      s"""WITH c AS (
         |  SELECT event_id AS p_id, user_id, epoch_us(ts) AS t
         |  FROM events WHERE event_type = 'purchase'
         |),
         |tch AS (
         |  SELECT event_id AS t_id, user_id, event_type, epoch_us(ts) AS t
         |  FROM events WHERE event_type IN ('click', 'view')
         |),
         |pr AS (
         |  SELECT c.p_id, tch.t_id, tch.event_type, tch.t
         |  FROM c JOIN tch ON tch.user_id = c.user_id
         |                 AND tch.t >= c.t - $AttribWindowUs AND tch.t < c.t
         |),
         |rk AS (
         |  SELECT p_id, event_type,
         |         ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY t, t_id) AS rn,
         |         COUNT(*) OVER (PARTITION BY p_id) AS k
         |  FROM pr
         |),
         |wgt AS (
         |  SELECT event_type,
         |         CASE WHEN k = 1 THEN 'solo' WHEN rn = 1 THEN 'first'
         |              WHEN rn = k THEN 'last' ELSE 'middle' END AS pos_class,
         |         CASE WHEN k = 1 THEN 1000000 WHEN k = 2 THEN 500000
         |              WHEN rn = 1 THEN 400000
         |              WHEN rn = k THEN 400000 ELSE 200000 // (k - 2) END AS w
         |  FROM rk
         |)
         |SELECT event_type AS touch_type, pos_class,
         |       CAST(COUNT(*) AS BIGINT) AS n_touches,
         |       CAST(SUM(w) AS BIGINT) AS credit_ppm_sum
         |FROM wgt GROUP BY touch_type, pos_class
         |ORDER BY touch_type, pos_class""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("t"))
      val c = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("t").as("ct"))
      val tch = ev.where(col("event_type").isin("click", "view"))
        .select(col("event_id").as("t_id"), col("user_id"),
          col("event_type"), col("t"))
      val pr = c.join(tch, Seq("user_id"))
        .where(col("t") >= col("ct") - AttribWindowUs && col("t") < col("ct"))
      val wp = Window.partitionBy("p_id")
      val rk = pr
        .withColumn("rn", row_number().over(wp.orderBy("t", "t_id")))
        .withColumn("k", count(lit(1)).over(wp))
      rk.select(col("event_type"),
          when(col("k") === 1, "solo").when(col("rn") === 1, "first")
            .when(col("rn") === col("k"), "last").otherwise("middle").as("pos_class"),
          when(col("k") === 1, 1000000L).when(col("k") === 2, 500000L)
            .when(col("rn") === 1, 400000L)
            .when(col("rn") === col("k"), 400000L)
            .otherwise(expr("200000 DIV (k - 2)")).as("w"))
        .groupBy(col("event_type").as("touch_type"), col("pos_class"))
        .agg(count(lit(1)).as("n_touches"), sum("w").as("credit_ppm_sum"))
        .orderBy("touch_type", "pos_class")
    },

    // Native session windows (e14) — the same 30-min-gap sessionization
    // as e03, but through Spark's built-in `session_window` operator
    // (SessionWindowing + MergingSessionsExec — the merge-on-overlap
    // machinery Structured Streaming uses for watermarked session aggs)
    // instead of e03's lag/flag/running-sum window composition. Both
    // paths are certified: e03 pins the composition, e14 pins the
    // native operator, and ApplyOpsSpec pins their agreement — incl.
    // the boundary: session_window treats window touching as overlap,
    // so a gap of EXACTLY 30 min still merges (same `diff > gap`
    // split rule as e03; pinned on a synthetic exact-gap fixture).
    // Scale: one shuffle on user_id, in-partition sort + linear
    // merge — no self-join.
    Q("e14_session_window",
      """WITH x AS (
        |  SELECT user_id, ts, epoch_us(ts) AS t, CAST(value AS DECIMAL(18,2)) AS v,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS pt
        |  FROM events
        |),
        |flagged AS (
        |  SELECT *, CASE WHEN pt IS NULL OR t - pt > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM x
        |),
        |sess AS (
        |  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        |  FROM flagged
        |)
        |SELECT user_id,
        |       MIN(ts) AS session_start,
        |       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(v) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start")
    },

    // Time-interval RANGE frames (e15) — per-user trailing-24h activity
    // at EVERY event: the window surface e11/e13 don't cover (their
    // trailing frames are ROWS over a gap-filled hourly grid; this is
    // RANGE over the raw event times — no grid, frame membership decided
    // by timestamp arithmetic, ties all included). The canonical
    // feature-engineering shape ("how active was this user in the 24h
    // before this event") for fraud/abuse scoring. Frame bounds are
    // epoch-microsecond longs on both engines, and the in-frame value
    // sum runs in DECIMAL (order-free exact) before the double edge
    // cast. One shuffle on user_id; per-partition the frame is a
    // two-pointer sliding window over the sorted events — state bounded
    // by 24h of per-user activity, never the whole history.
    Q("e15_trailing_range",
      """SELECT event_id, user_id, ts,
        |       CAST(COUNT(*) OVER tw AS BIGINT) AS n_24h,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER tw AS DOUBLE) AS sum_24h
        |FROM events
        |WINDOW tw AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |              RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts, event_id""".stripMargin) { (s, d) =>
      val tw = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
        .rangeBetween(-86400000000L, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          count(lit(1)).over(tw).as("n_24h"),
          sum(col("value").cast("decimal(18,2)")).over(tw).cast("double").as("sum_24h"))
        .orderBy("user_id", "ts", "event_id")
    },

    // Per-type rolling z-score anomaly detection (e13) — the
    // variance-aware complement to e11's global mean-ratio burst rule: a
    // (type, hour) cell flags when its count deviates from the trailing
    // 24 h mean by more than 2 trailing standard deviations. e11's 2×
    // rule both misses low-variance drifts (n jumps 40→55 on a ±2
    // series) and over-flags genuinely noisy types; the z-score
    // normalizes per type. The σ comparison is INTEGER-exact — z² > 4
    // multiplied through by 24² gives (24n − S)² > 4(24·SS − S²) with S
    // and SS the trailing sum and sum-of-squares, all BIGINT, so both
    // engines agree bit-for-bit (a float σ could not hash-match).
    // Scale shape: one (type, hour) aggregate shuffle; the gap-filled
    // grid is |types| × |hours| (tiny — types broadcast onto the hour
    // spine); the trailing window partitions by type with 24 rows of
    // state. Zero-variance windows flag ANY deviation (strict >), and
    // cells without a full 24 h history never flag.
    Q("e13_zscore_anomaly",
      """WITH bounds AS (
        |  SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
        |  FROM events
        |),
        |hours AS (
        |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds
        |),
        |types AS (SELECT DISTINCT event_type FROM events),
        |grid AS (SELECT h, event_type FROM hours CROSS JOIN types),
        |agg AS (
        |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, event_type,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY h, event_type
        |),
        |g AS (
        |  SELECT grid.h, grid.event_type, COALESCE(agg.n, 0) AS n
        |  FROM grid LEFT JOIN agg USING (h, event_type)
        |),
        |w AS (
        |  SELECT h, event_type, n,
        |         CAST(COALESCE(SUM(n) OVER tw, 0) AS BIGINT) AS prev_sum,
        |         CAST(COALESCE(SUM(n * n) OVER tw, 0) AS BIGINT) AS prev_sumsq,
        |         CAST(COUNT(*) OVER tw AS BIGINT) AS prev_n
        |  FROM g
        |  WINDOW tw AS (PARTITION BY event_type ORDER BY h
        |                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
        |)
        |SELECT h, event_type, n, prev_sum, prev_sumsq,
        |       (prev_n = 24 AND
        |        (24 * n - prev_sum) * (24 * n - prev_sum)
        |          > 4 * (24 * prev_sumsq - prev_sum * prev_sum)) AS anomaly
        |FROM w ORDER BY h, event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val bounds = ev.agg(
        date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      val hours = bounds.select(
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
      val types = ev.select("event_type").distinct()
      val grid = hours.join(broadcast(types))
      val agg = ev.groupBy(
          window(col("ts"), "1 hour").getField("start").as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val trailing = Window.partitionBy("event_type").orderBy("h").rowsBetween(-24, -1)
      grid.join(agg, Seq("h", "event_type"), "left")
        .select(col("h"), col("event_type"), coalesce(col("n"), lit(0L)).as("n"))
        .withColumn("prev_sum", coalesce(sum(col("n")).over(trailing), lit(0L)))
        .withColumn("prev_sumsq", coalesce(sum(col("n") * col("n")).over(trailing), lit(0L)))
        .withColumn("prev_n", count(lit(1)).over(trailing))
        .select(col("h"), col("event_type"), col("n"), col("prev_sum"), col("prev_sumsq"),
          (col("prev_n") === 24 &&
            (lit(24) * col("n") - col("prev_sum")) * (lit(24) * col("n") - col("prev_sum"))
              > lit(4) * (lit(24) * col("prev_sumsq") - col("prev_sum") * col("prev_sum")))
            .as("anomaly"))
        .orderBy("h", "event_type")
    }
  )
}
