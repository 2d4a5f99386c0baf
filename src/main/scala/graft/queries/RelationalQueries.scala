package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** General relational operator surface (SURVEY §2.4-§2.5 ABSENT rows + M6):
  * scans, joins (broadcast/multi/semi/anti), hash aggregation, windows,
  * rollup, set ops, top-k, having — all Spark builtins so Catalyst plans
  * pushdown, partial aggregation and join strategy selection.
  *
  * Float discipline: double sums are order-dependent across engines, so
  * every SUM first casts to an exact decimal, then the final value is cast
  * back to double — bit-identical in Spark and the DuckDB oracle.
  */
object RelationalQueries {

  /** q18 sketch size: 64 k-min values per group. */
  val KmvK = 64

  // sum(cast(x as decimal)) cast back to double — exact, engine-agnostic.
  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    sum(c.cast(s"decimal(28,$scale)")).cast("double")

  val entries: Seq[Q] = Seq(

    // TPC-H Q1-style pricing summary: partial agg (map-side combine) then
    // final — one shuffle on a low-cardinality key; scales linearly.
    Q("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
        |       COUNT(*) AS count_order
        |FROM lineitem WHERE l_discount <= 0.06
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_discount") <= 0.06)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // S1 twin: filter + projection + sort, all pushed into the parquet scan.
    Q("q02_scan_filter_project",
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_orderstatus = 'O' AND o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .where(col("o_orderstatus") === "O" && col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    },

    // Fact-dim equi-join + group: dim side broadcast (customer << orders).
    Q("q03_join_agg",
      """SELECT c_mktsegment,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
        .orderBy("c_mktsegment")
    },

    // TPC-H Q5-style 5-way join; small dims broadcast, fact tables shuffle
    // on join keys once each — the shape that must survive 100 TB.
    Q("q04_multi_join_revenue",
      """SELECT n_name,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name IN ('ASIA', 'EUROPE')
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name").isin("ASIA", "EUROPE"))
        .groupBy("n_name")
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    },

    // Broadcast dim join on the largest fact table.
    Q("q05_broadcast_dim_join",
      """SELECT p_brand,
        |       COUNT(*) AS n_items,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 25
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).where(col("p_size") <= 25)),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("p_brand")
    },

    // Conditional aggregation (C1-style routing counts, single pass).
    Q("q06_conditional_agg",
      """SELECT o_orderstatus,
        |       CAST(SUM(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
        |       CAST(SUM(CASE WHEN o_orderpriority LIKE '5%' THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |       COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          sum(when(col("o_orderpriority").like("1%"), 1L).otherwise(0L)).as("n_urgent"),
          sum(when(col("o_orderpriority").like("5%"), 1L).otherwise(0L)).as("n_low"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },

    // Ranking window: top-3 orders per customer (deterministic tie-break).
    Q("q07_window_topk_per_group",
      """SELECT o_custkey, o_orderkey, rnk FROM (
        |  SELECT o_custkey, o_orderkey,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
        .orderBy("o_custkey", "rnk")
    },

    // Analytic window with frame: running revenue per customer.
    Q("q08_window_running_sum",
      """SELECT o_custkey, o_orderkey,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("running", sum(col("o_totalprice").cast("decimal(28,2)")).over(w).cast("double"))
        .select("o_custkey", "o_orderkey", "running")
        .orderBy("o_custkey", "o_orderkey")
    },

    // Global top-k: Spark plans TakeOrderedAndProject — no full sort at scale.
    Q("q09_global_topk",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(100)
    },

    // Set ops: building-segment customers minus open-order customers,
    // intersected back — exercises EXCEPT + INTERSECT distinct semantics.
    Q("q10_setops",
      """(SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        | EXCEPT
        | SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
        |INTERSECT
        |SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0
        |ORDER BY k""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val building = c.where(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
      val finished = Tables.orders(s, d).where(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("k"))
      val positive = c.where(col("c_acctbal") > 0).select(col("c_custkey").as("k"))
      building.except(finished).intersect(positive).orderBy("k")
    },

    // Exact distinct aggregation (expand + two-phase under the hood).
    Q("q11_distinct_agg",
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_suppkey) AS n_supp,
        |       COUNT(DISTINCT l_partkey) AS n_part,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // The sketch escape hatch for q11's exact COUNT(DISTINCT): HyperLogLog++
    // (approx_count_distinct) carries a fixed-size register set per group
    // with mergeable map-side partials — one shuffle of sketch bytes, no
    // per-key distinct expansion — the form that survives billions of
    // distinct keys. Completes the distinct-count family: exact (q11),
    // deterministic KMV (q18), HLL (q22). DuckDB's HLL is a different
    // build and cannot value-match the raw estimates, so the CERTIFIED
    // output is the bound check itself: exact counts (oracle-computable)
    // plus booleans asserting the HLL estimate landed within 3-sigma of
    // its documented rsd (0.05 -> 15%); the oracle emits the same exact
    // counts and literal TRUE. Bit-stable, and the booleans' truth
    // depends on the real sketch estimates, so the approximate path is
    // genuinely exercised. DistinctApproxSpec asserts the same bound on
    // the raw estimates.
    Q("q22_distinct_approx",
      """SELECT l_returnflag,
        |       COUNT(*) AS n,
        |       COUNT(DISTINCT l_suppkey) AS n_supp,
        |       COUNT(DISTINCT l_partkey) AS n_part,
        |       TRUE AS supp_within_bound,
        |       TRUE AS part_within_bound
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      def within(approx: Column, exact: Column): Column =
        abs(approx - exact) <= greatest(lit(1L), (exact.cast("double") * 0.15).cast("long"))
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          approx_count_distinct(col("l_suppkey")).as("n_supp_approx"),
          approx_count_distinct(col("l_partkey")).as("n_part_approx"))
        .select(col("l_returnflag"), col("n"), col("n_supp"), col("n_part"),
          within(col("n_supp_approx"), col("n_supp")).as("supp_within_bound"),
          within(col("n_part_approx"), col("n_part")).as("part_within_bound"))
        .orderBy("l_returnflag")
    },

    // ROLLUP hierarchy totals (grouping-set expansion).
    Q("q12_rollup",
      """SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
        |       COALESCE(l_linestatus, 'ALL') AS lstatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rflag, lstatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("sum_qty"), col("n"))
        .orderBy("rflag", "lstatus")
    },

    // CUBE: all 2^2 grouping combinations in one pass (rollup's sibling —
    // Spark expands grouping sets before the hash aggregate, so this is
    // still one shuffle). COALESCE folds the grouping nulls exactly as in
    // q12 so the oracle compare is unambiguous.
    Q("q19_cube",
      """SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
        |       COALESCE(CAST(ship_year AS VARCHAR), 'ALL') AS syear,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        |       COUNT(*) AS n
        |FROM (SELECT l_returnflag, CAST(year(l_shipdate) AS INT) AS ship_year, l_quantity
        |      FROM lineitem)
        |GROUP BY CUBE(l_returnflag, ship_year)
        |ORDER BY rflag, syear""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), year(col("l_shipdate")).as("ship_year"),
          col("l_quantity"))
        .cube("l_returnflag", "ship_year")
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("ship_year").cast("string"), lit("ALL")).as("syear"),
          col("sum_qty"), col("n"))
        .orderBy("rflag", "syear")
    },

    // Explicit GROUPING SETS (the third §2.5 grouping form, via Spark 4's
    // Dataset.groupingSets): per-returnflag and per-linestatus marginals in
    // ONE pass/shuffle — the form rollup/cube can't express (no grand
    // total, no cross combination).
    Q("q20_grouping_sets",
      """SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
        |       COALESCE(l_linestatus, 'ALL') AS lstatus,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY rflag, lstatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("n"), col("sum_qty"))
        .orderBy("rflag", "lstatus")
    },

    // Semi join (EXISTS): customers with at least one urgent open order.
    Q("q13_semi_join",
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).where(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    },

    // Anti join (NOT EXISTS): customers with no finished orders.
    Q("q14_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).where(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // HAVING: post-aggregation filter.
    Q("q15_having",
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS spend
        |FROM orders GROUP BY o_custkey
        |HAVING COUNT(*) >= 12 ORDER BY o_custkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
        .where(col("n_orders") >= 12)
        .orderBy("o_custkey")
    },

    // Exact interpolated percentiles per group (Spark `percentile` ==
    // DuckDB `quantile_cont`, both linear interpolation; l_quantity is
    // integral so midpoints are exact in binary — no cross-engine ulp
    // drift). At scale exact percentile holds the group's values; swap to
    // approx_percentile (t-digest sketch) when groups outgrow memory.
    Q("q16_percentile",
      """SELECT l_returnflag,
        |       COUNT(*) AS n,
        |       quantile_cont(l_quantity, 0.5) AS med_qty,
        |       quantile_cont(l_quantity, 0.95) AS p95_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      // histogram-based exact percentile ([[ExactQuantiles]]): l_quantity
      // is a bounded integral domain (1..50, never null), so the exact
      // interpolated percentile needs only the (flag, quantity) count
      // histogram — one map-side-combined shuffle bounded by the domain,
      // not a per-group value buffer on one reducer (what the builtin
      // `percentile` holds; q21's r12 recording showed that buffer as the
      // 7.1x scale ratio). Bit-identical to the builtin and to DuckDB's
      // quantile_cont — same (n-1)*q interpolation (ExactQuantilesSpec).
      graft.operators.ExactQuantiles.contByHistogram(
          Tables.lineitem(s, d), Seq("l_returnflag"), "l_quantity",
          Seq(0.5 -> "med_qty", 0.95 -> "p95_qty"))
        .select(col("l_returnflag"), col("n"), col("med_qty"), col("p95_qty"))
        .orderBy("l_returnflag")
    },

    // The approx escape hatch for q16: approx_percentile (Greenwald-Khanna
    // sketch, mergeable map-side partials) holds O(1/accuracy) state per
    // group instead of the group's values — the form that survives groups
    // that outgrow executor memory. Rank error is bounded by n/accuracy
    // (~6 of 60k rows here). DuckDB's approx_quantile is a different
    // sketch (t-digest) and cannot value-match the raw estimates, so the
    // CERTIFIED output is the bound check itself: exact interpolated
    // percentiles (oracle-computable, as q16) plus booleans asserting the
    // GK estimate landed within 1.0 of exact (the rank-error bound in
    // value terms on integral 1..50 l_quantity); the oracle emits the
    // same exact values and literal TRUE. The booleans' truth depends on
    // the real sketch output, so the approximate path is genuinely
    // exercised. PercentileApproxSpec asserts the same bound on the raw
    // estimates.
    Q("q21_percentile_approx",
      """SELECT l_returnflag,
        |       COUNT(*) AS n,
        |       quantile_cont(l_quantity, 0.5) AS med_qty,
        |       quantile_cont(l_quantity, 0.95) AS p95_qty,
        |       TRUE AS med_within_bound,
        |       TRUE AS p95_within_bound
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      // exact side from the domain-bounded histogram (see q16) so the
      // certification never gathers per-group value buffers; the GK
      // sketch side keeps its own mergeable map-side partials. Both
      // aggregations are scalable alone; the 3-row join is broadcast.
      val exact = graft.operators.ExactQuantiles.contByHistogram(
        Tables.lineitem(s, d), Seq("l_returnflag"), "l_quantity",
        Seq(0.5 -> "med_qty", 0.95 -> "p95_qty"))
      val approx = Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          approx_percentile(col("l_quantity"), lit(0.5), lit(10000)).as("med_approx"),
          approx_percentile(col("l_quantity"), lit(0.95), lit(10000)).as("p95_approx"))
      exact.join(broadcast(approx), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n"), col("med_qty"), col("p95_qty"),
          (abs(col("med_approx") - col("med_qty")) <= 1.0).as("med_within_bound"),
          (abs(col("p95_approx") - col("p95_qty")) <= 1.0).as("p95_within_bound"))
        .orderBy("l_returnflag")
    },

    // Range (band) join, bucketized: pairs of same-brand parts whose retail
    // prices lie within 1.0 of each other. The naive form is an inequality
    // join (nested-loop at any scale); the scale-safe form is an equi-join
    // on (brand, integer price bucket) with each left row exploded into its
    // bucket and the next one down, then an exact band refine. floor() on
    // doubles is bit-exact in both engines, so bucket keys agree; max() is
    // order-free so the double aggregate is exact cross-engine.
    Q("q17_band_join",
      """WITH b AS (
        |  SELECT p_partkey, p_brand, p_retailprice,
        |         CAST(floor(p_retailprice) AS BIGINT) AS bucket
        |  FROM part
        |),
        |pairs AS (
        |  SELECT x.p_brand, x.p_partkey AS key_a, y.p_partkey AS key_b,
        |         abs(x.p_retailprice - y.p_retailprice) AS gap
        |  FROM b x JOIN b y ON x.p_brand = y.p_brand
        |                   AND y.bucket BETWEEN x.bucket - 1 AND x.bucket + 1
        |                   AND x.p_partkey < y.p_partkey
        |  WHERE abs(x.p_retailprice - y.p_retailprice) <= 1.0
        |)
        |SELECT p_brand, COUNT(*) AS n_pairs, MAX(gap) AS max_gap
        |FROM pairs GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
      val b = Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
          floor(col("p_retailprice")).cast("long").as("bucket"))
      // explode the LEFT side into (bucket, bucket+1) so each candidate
      // pair meets in exactly the right bucket of an equi-join: a pair with
      // |gap| <= 1 has b.bucket - a.bucket in {-1, 0, 1}; probing from
      // a.bucket-1..a.bucket+1 is the same set seen from the right side's
      // own bucket. Equi-keys (brand, bucket) -> hash join, never BNLJ.
      val left = b.select(col("p_brand"), col("p_partkey").as("key_a"),
          col("p_retailprice").as("price_a"),
          explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1))
            .as("bucket"))
      val right = b.select(col("p_brand"), col("p_partkey").as("key_b"),
        col("p_retailprice").as("price_b"), col("bucket"))
      left.join(right, Seq("p_brand", "bucket"))
        .where(col("key_a") < col("key_b"))
        .withColumn("gap", abs(col("price_a") - col("price_b")))
        .where(col("gap") <= 1.0)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_pairs"), max("gap").as("max_gap"))
        .orderBy("p_brand")
    },

    // KMV distinct sketch: per-group cardinality estimate from the k
    // smallest md5-derived 28-bit hashes ([[graft.functions.KmvSketch]]).
    // Unlike approx_count_distinct (HLL, engine-specific) the sketch is
    // deterministic and engine-independent, so the oracle certifies the
    // ESTIMATE bit-for-bit. The typed Aggregator runs with map-side
    // partials: k longs per group per partition shuffle, independent of
    // row count. n_exact is alongside to show the estimate is close.
    Q("q18_kmv_distinct",
      s"""WITH h AS (
         |  SELECT DISTINCT l_returnflag,
         |         CAST('0x' || substring(md5(CAST(l_partkey AS VARCHAR)), 1, 7) AS BIGINT) AS h
         |  FROM lineitem
         |),
         |s AS (
         |  SELECT l_returnflag, list_sort(list(h))[:${KmvK}] AS kmv
         |  FROM h GROUP BY l_returnflag
         |),
         |e AS (
         |  SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact
         |  FROM lineitem GROUP BY l_returnflag
         |)
         |SELECT e.l_returnflag, e.n_exact,
         |       CASE WHEN len(s.kmv) < ${KmvK} THEN CAST(len(s.kmv) AS DOUBLE)
         |            ELSE ${KmvK - 1} * 268435456.0 / CAST(s.kmv[${KmvK}] AS DOUBLE)
         |       END AS est_distinct
         |FROM e JOIN s ON e.l_returnflag = s.l_returnflag
         |ORDER BY e.l_returnflag""".stripMargin) { (s, d) =>
      import graft.functions.KmvSketch
      // pre-distinct the (group, key) pairs once: count(*) over them IS the
      // exact distinct count, and the sketch is insensitive to duplicates —
      // this avoids the Expand a countDistinct-next-to-another-agg plans
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_partkey"))
        .distinct()
        .withColumn("h",
          conv(substring(md5(col("l_partkey").cast("string")), 1, 7), 16, 10)
            .cast("long"))
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n_exact"),
          KmvSketch.kmv(col("h"), KmvK).as("kmv"))
        .select(col("l_returnflag"), col("n_exact"),
          KmvSketch.estimate(col("kmv"), KmvK).as("est_distinct"))
        .orderBy("l_returnflag")
    },

    // Skew-salted equi-join ([[graft.operators.Skew]]): lineitem x supplier
    // with the fact side salted 8 ways and the dimension replicated once
    // per salt, so a hot supplier key spreads over 8 reducer tasks instead
    // of pinning one. The dim side carries a shuffle_hash hint — the
    // premise of salting is a dimension too big to broadcast, and without
    // the hint AQE would just broadcast it at this SF and hide the shape
    // under test. Results are identical to the unsalted join (each fact
    // row matches exactly one replica), which is what the oracle certifies.
    Q("q23_salted_join",
      """SELECT s_nationkey,
        |       COUNT(*) AS n_items,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS total
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin) { (s, d) =>
      import graft.operators.Skew
      val facts = Tables.lineitem(s, d).select("l_suppkey", "l_extendedprice")
      val dim = Tables.supplier(s, d)
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
        .hint("shuffle_hash")
      Skew.saltedJoin(facts, dim, Seq("l_suppkey"), salts = 8)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("total"))
        .orderBy("s_nationkey")
    },

    // PIVOT: per-order-year revenue spread across the five priority
    // classes as columns — `groupBy().pivot(col, values)`. Pinning the
    // pivot values keeps the plan a single pass (no extra distinct-values
    // job) and makes the output schema static — the form that scales:
    // one shuffle on the groupBy key, conditional aggregation underneath
    // (exactly what the oracle SQL spells out). Missing (year, priority)
    // cells surface as null from pivot and are folded to 0 like the
    // oracle's ELSE 0.
    Q("q24_pivot",
      """SELECT CAST(year(o_orderdate) AS INT) AS oyear,
        |       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(28,2)) ELSE CAST(0 AS DECIMAL(28,2)) END) AS DOUBLE) AS urgent,
        |       CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(28,2)) ELSE CAST(0 AS DECIMAL(28,2)) END) AS DOUBLE) AS high,
        |       CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(o_totalprice AS DECIMAL(28,2)) ELSE CAST(0 AS DECIMAL(28,2)) END) AS DOUBLE) AS medium,
        |       CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(o_totalprice AS DECIMAL(28,2)) ELSE CAST(0 AS DECIMAL(28,2)) END) AS DOUBLE) AS notspec,
        |       CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(o_totalprice AS DECIMAL(28,2)) ELSE CAST(0 AS DECIMAL(28,2)) END) AS DOUBLE) AS low
        |FROM orders GROUP BY oyear ORDER BY oyear""".stripMargin) { (s, d) =>
      val pivoted = Tables.orders(s, d)
        .select(year(col("o_orderdate")).as("oyear"), col("o_orderpriority"),
          col("o_totalprice").cast("decimal(28,2)").as("tp"))
        .groupBy("oyear")
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(sum(col("tp")))
      def cell(v: String, alias: String) =
        coalesce(pivoted(s"`$v`").cast("double"), lit(0.0)).as(alias)
      pivoted.select(col("oyear"),
        cell("1-URGENT", "urgent"), cell("2-HIGH", "high"),
        cell("3-MEDIUM", "medium"), cell("4-NOT SPECIFIED", "notspec"),
        cell("5-LOW", "low"))
        .orderBy("oyear")
    },

    // FULL OUTER join: per-nation counts of rare customers (deeply
    // negative balance) vs rare suppliers (very high balance) — each side
    // is a pre-aggregated, nation-keyed table, so the outer join runs on
    // two small inputs AFTER aggregation (never an outer join of the raw
    // fact tables — aggregate first, join second is the scale rule). The
    // filters guarantee one-side-only nations at every SF, so both null
    // directions are actually exercised.
    Q("q25_full_outer",
      """WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
        |           FROM customer WHERE c_acctbal < -800 GROUP BY c_nationkey),
        |     s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
        |           FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey)
        |SELECT COALESCE(c.nk, s.nk) AS nk,
        |       CAST(COALESCE(c.n_cust, 0) AS BIGINT) AS n_cust,
        |       CAST(COALESCE(s.n_supp, 0) AS BIGINT) AS n_supp
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk
        |ORDER BY nk""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).where(col("c_acctbal") < -800)
        .groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val sup = Tables.supplier(s, d).where(col("s_acctbal") > 9000)
        .groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(sup, Seq("nk"), "full_outer")
        .select(col("nk"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nk")
    },

    // Scalar subquery: parts priced above the GLOBAL average, per brand.
    // The global aggregate rides a one-row broadcast joined on a constant
    // key (a broadcast hash join with a single build row — the big side
    // streams map-side, nothing shuffles before the groupBy). The
    // above-average predicate compares price*count > sum in EXACT decimal
    // arithmetic, so no cross-engine float-division drift can flip a row
    // at the boundary.
    Q("q26_scalar_subquery",
      """WITH g AS (SELECT SUM(CAST(p_retailprice AS DECIMAL(28,2))) AS total,
        |                  COUNT(*) AS cnt FROM part)
        |SELECT p_brand, COUNT(*) AS n_above, MAX(p_retailprice) AS max_price
        |FROM part, g
        |WHERE CAST(p_retailprice AS DECIMAL(28,2)) * g.cnt > g.total
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
      val part = Tables.part(s, d)
      val g = part.agg(
        sum(col("p_retailprice").cast("decimal(28,2)")).as("total"),
        count(lit(1)).as("cnt")).withColumn("j", lit(1))
      part.withColumn("j", lit(1))
        .join(broadcast(g), Seq("j"))
        .where(col("p_retailprice").cast("decimal(28,2)") * col("cnt") > col("total"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_above"), max(col("p_retailprice")).as("max_price"))
        .orderBy("p_brand")
    },

    // Incremental aggregate maintenance ([[graft.operators.IncrementalAgg]]):
    // the orders table is split at a date boundary, each half is
    // aggregated to a mergeable STATE (count, decimal sum, min, max), and
    // the two states are merged — the oracle certifies the merge equals
    // the full one-shot aggregate bit-for-bit. This is the materialized-
    // view pattern a 100 TB nightly pipeline lives on: re-aggregate only
    // the new partition, fold it into yesterday's state table; the merge
    // shuffles state ROWS (key cardinality), never raw history.
    Q("q27_incremental_agg",
      """SELECT o_orderstatus, COUNT(o_totalprice) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total,
        |       MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      import graft.operators.IncrementalAgg
      val orders = Tables.orders(s, d)
      val keys = Seq("o_orderstatus")
      val base = IncrementalAgg.state(
        orders.where(year(col("o_orderdate")) <= 1996), keys, "o_totalprice")
      val delta = IncrementalAgg.state(
        orders.where(year(col("o_orderdate")) >= 1997), keys, "o_totalprice")
      IncrementalAgg.merge(keys, base, delta)
        .select(col("o_orderstatus"), col("n"),
          col("s").cast("double").as("total"),
          col("lo").as("min_price"), col("hi").as("max_price"))
        .orderBy("o_orderstatus")
    },

    // Equi-width histogram per group — the stats backbone (optimizer
    // cardinality estimates, data profiling, drift monitors). Bounds come
    // from a one-row min/max broadcast (q26's scalar pattern); bucket
    // assignment is PURE INTEGER arithmetic on price cents — `div` in
    // Spark, `//` in DuckDB, both exact on non-negative longs — so no
    // float-division boundary can put a row in different buckets across
    // engines. One scan + one (group, bucket) aggregate.
    Q("q28_histogram",
      """WITH b AS (SELECT l_returnflag,
        |                  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |           FROM lineitem),
        |g AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM b)
        |SELECT l_returnflag,
        |       CAST((cents - lo) * 8 // (hi - lo + 1) AS BIGINT) AS bucket,
        |       COUNT(*) AS n
        |FROM b, g GROUP BY l_returnflag, bucket
        |ORDER BY l_returnflag, bucket""".stripMargin) { (s, d) =>
      val b = Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
      val g = b.agg(min("cents").as("lo"), max("cents").as("hi"))
        .withColumn("j", lit(1))
      b.withColumn("j", lit(1))
        .join(broadcast(g), Seq("j"))
        .withColumn("bucket", expr("(cents - lo) * 8 div (hi - lo + 1)"))
        .groupBy("l_returnflag", "bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag", "bucket")
    },

    // Approximate query processing by deterministic hash sampling: a 1/16
    // sample selected by the first md5 hex digit of the key (pure
    // function of the row — reproducible across runs, engines, and
    // repartitions, never rand()), scaled by 16 into an unbiased
    // estimate, reported NEXT TO the exact figures so the oracle
    // certifies the estimator itself. At 100 TB the sample predicate
    // prunes at the scan and the estimate costs 1/16th of the exact scan;
    // the same hash prefix always selects the same logical sample, so
    // estimates are comparable across days.
    Q("q29_sample_estimate",
      """SELECT o_orderstatus,
        |       COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS exact_total,
        |       CAST(COUNT(CASE WHEN substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
        |                       THEN 1 END) * 16 AS BIGINT) AS est_rows,
        |       CAST(SUM(CASE WHEN substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
        |                     THEN CAST(o_totalprice AS DECIMAL(28,2))
        |                     ELSE CAST(0 AS DECIMAL(28,2)) END) * 16 AS DOUBLE) AS est_total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      val inSample = substring(md5(col("o_orderkey").cast("string")), 1, 1) === "0"
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n_rows"),
          dsum(col("o_totalprice")).as("exact_total"),
          (count(when(inSample, 1)) * 16).as("est_rows"),
          (sum(when(inSample, col("o_totalprice").cast("decimal(28,2)"))
            .otherwise(lit(0).cast("decimal(28,2)"))) * 16).cast("double").as("est_total"))
        .orderBy("o_orderstatus")
    },

    // Correlated scalar subquery ("orders above 1.5x their customer's
    // average"), decorrelated the way Catalyst plans it at scale: one
    // per-key aggregate over the same table, joined back on the
    // correlation key. Both the aggregate's shuffle and the join key on
    // (o_custkey) — one hash partitioning serves both sides, no
    // re-correlated per-row subquery execution. The predicate compares
    // price * 2 * n > sum * 3 in EXACT decimal arithmetic (price >
    // 1.5 * avg without the float division), so no boundary row can flip
    // between engines. The oracle states the ORIGINAL correlated form —
    // certifying the decorrelation itself.
    Q("q30_correlated_subquery",
      """SELECT o.o_orderkey, o.o_custkey,
        |       CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM orders o
        |WHERE CAST(o.o_totalprice AS DECIMAL(18,2)) * 2 *
        |        (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |      > 3 * (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(18,2)))
        |             FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
        |ORDER BY o.o_orderkey""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast("decimal(18,2)").as("price"))
      val perCust = o.groupBy("o_custkey")
        .agg(count(lit(1)).as("n_ord"), sum(col("price")).as("sum_price"))
      o.join(perCust, Seq("o_custkey"))
        .where(col("price") * 2 * col("n_ord") > col("sum_price") * 3)
        .select(col("o_orderkey"), col("o_custkey"),
          col("price").cast("double").as("price"))
        .orderBy("o_orderkey")
    },

    // Unpivot / melt: wide per-flag aggregates relayed long as
    // (key, metric, value) rows — the feature-store/metrics-table layout
    // flip. Spark's `unpivot` is a zero-shuffle Expand over the already-
    // aggregated (tiny) wide table; all heavy lifting stays in the
    // up-front hash aggregate. Values go through exact decimal sums and
    // cast to double only at the edge (file-header float discipline).
    Q("q31_unpivot",
      """WITH wide AS (
        |  SELECT l_returnflag,
        |         SUM(CAST(l_quantity AS DECIMAL(28,2))) AS sum_qty,
        |         SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS sum_price
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, metric, CAST(value AS DOUBLE) AS value
        |FROM wide UNPIVOT (value FOR metric IN (sum_qty, sum_price))
        |ORDER BY l_returnflag, metric""".stripMargin) { (s, d) =>
      val wide = Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          sum(col("l_quantity").cast("decimal(28,2)")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(28,2)")).as("sum_price"))
      wide.unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price")),
          "metric", "value")
        .select(col("l_returnflag"), col("metric"), col("value").cast("double").as("value"))
        .orderBy("l_returnflag", "metric")
    },

    // Per-group quantile bucketing: ntile(4) within each market segment
    // (ordered by balance with the key as tiebreak — a total order, so
    // bucket assignment is deterministic across engines and partition
    // counts), then per-(segment, quartile) aggregates. The window
    // partitions by segment — parallel across groups, never a global
    // single-partition sort; a GLOBAL ntile at 100 TB would serialize and
    // belongs to the approx-percentile path (q21) instead. Both engines
    // implement SQL-standard ntile (larger buckets first), so counts per
    // bucket agree exactly.
    Q("q32_ntile_quartiles",
      """WITH ranked AS (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |         ntile(4) OVER (PARTITION BY c_mktsegment
        |                        ORDER BY c_acctbal, c_custkey) AS quartile
        |  FROM customer
        |)
        |SELECT c_mktsegment, quartile, COUNT(*) AS n,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
        |       MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
        |FROM ranked GROUP BY c_mktsegment, quartile
        |ORDER BY c_mktsegment, quartile""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .withColumn("quartile", ntile(4).over(w))
        .groupBy("c_mktsegment", "quartile")
        .agg(
          count(lit(1)).as("n"),
          dsum(col("c_acctbal"), 2).as("sum_bal"),
          min(col("c_acctbal")).as("min_bal"),
          max(col("c_acctbal")).as("max_bal"))
        .orderBy("c_mktsegment", "quartile")
    },

    // Data-quality expectation suite (the Deequ/Great-Expectations shape):
    // one pass emits a (check, n_checked, n_violations) row per rule —
    // referential integrity via anti-join counts, null-rate, range, and
    // column-consistency rules — the gate a production pipeline evaluates
    // before promoting a snapshot, and the natural producer for the K4
    // error channel. Scale shape: every FK rule is an aggregate over an
    // anti-join (broadcast when the parent side is a dim, shuffled
    // hash otherwise), every row rule is a map-side conditional count;
    // the union glues together one-row results. A rule passing with 0
    // violations is the healthy steady state — the tight quantity rule
    // is deliberately violated so the nonzero path stays exercised.
    Q("q33_dq_checks",
      """SELECT 'nation_region_fk' AS check_name,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM nation) AS n_checked,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM nation n
        |        WHERE NOT EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)) AS n_violations
        |UNION ALL
        |SELECT 'orders_customer_fk',
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
        |        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |UNION ALL
        |SELECT 'lineitem_orders_fk',
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
        |        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |UNION ALL
        |SELECT 'lineitem_qty_positive',
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem WHERE NOT (l_quantity > 0))
        |UNION ALL
        |SELECT 'lineitem_qty_at_most_25',
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem WHERE NOT (l_quantity <= 25))
        |UNION ALL
        |SELECT 'orders_totalprice_nonnull',
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders WHERE o_totalprice IS NULL)
        |UNION ALL
        |SELECT 'documents_nchars_consistent',
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM documents),
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM documents WHERE n_chars <> len(text))
        |UNION ALL
        |SELECT 'events_ts_in_range',
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM events),
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM events
        |        WHERE ts < TIMESTAMP '2020-01-01' OR ts >= TIMESTAMP '2030-01-01' OR ts IS NULL)
        |ORDER BY check_name""".stripMargin) { (s, d) =>
      val nation = Tables.nation(s, d); val region = Tables.region(s, d)
      val orders = Tables.orders(s, d); val customer = Tables.customer(s, d)
      val lineitem = Tables.lineitem(s, d); val documents = Tables.documents(s, d)
      val events = Tables.events(s, d)
      // each table's n_checked aggregate is hoisted and shared by every
      // rule over that table; the actual scan dedup comes from Spark's
      // ReuseExchange over the canonically-identical one-row aggregates —
      // the hoisting makes that identity obvious to the reader (and keeps
      // it canonical under future edits), it is not itself the mechanism
      def countOf(df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n_checked")).withColumn("j", lit(1))
      val nNation = countOf(nation); val nOrders = countOf(orders)
      val nLineitem = countOf(lineitem); val nDocuments = countOf(documents)
      def rule(name: String, nChecked: org.apache.spark.sql.DataFrame,
               violations: org.apache.spark.sql.DataFrame) =
        violations.agg(count(lit(1)).as("n_violations")).withColumn("j", lit(1))
          .join(broadcast(nChecked), Seq("j")) // two one-row aggregates glued
          .select(lit(name).as("check_name"), col("n_checked"), col("n_violations"))
      Seq(
        rule("nation_region_fk", nNation,
          nation.join(broadcast(region),
            nation("n_regionkey") === region("r_regionkey"), "left_anti")),
        rule("orders_customer_fk", nOrders,
          orders.join(customer,
            orders("o_custkey") === customer("c_custkey"), "left_anti")),
        rule("lineitem_orders_fk", nLineitem,
          lineitem.join(orders,
            lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")),
        rule("lineitem_qty_positive", nLineitem,
          lineitem.where(!(col("l_quantity") > 0))),
        rule("lineitem_qty_at_most_25", nLineitem,
          lineitem.where(!(col("l_quantity") <= 25))),
        rule("orders_totalprice_nonnull", nOrders,
          orders.where(col("o_totalprice").isNull)),
        rule("documents_nchars_consistent", nDocuments,
          documents.where(col("n_chars") =!= length(col("text")))),
        // timestamp sanity gates the time-series queries: e08/e11 build
        // an hour spine from min(ts) to max(ts), so one corrupt
        // far-future sentinel would blow the spine up to millions of
        // rows — this rule is the loud upstream catch for that
        rule("events_ts_in_range", countOf(events),
          events.where(col("ts") < lit("2020-01-01").cast("timestamp") ||
            col("ts") >= lit("2030-01-01").cast("timestamp") ||
            col("ts").isNull)))
        .reduce(_ unionByName _)
        .orderBy("check_name")
    }
  )
}
