package graft.ops

import graft.{Q, Tables => T}
import graft.util.Det._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2b relational surface: scans, filters, joins, aggregations,
  * windows, top-k, set ops, scalar functions, event-time batch queries.
  *
  * Design rules (SURVEY.md §5.2 / FIXTURES.md):
  *  - every query ends in a total ORDER BY over a unique key set;
  *  - double outputs go through Det.dsum/davg/r2 (2dp, order-independent);
  *  - raw nanosecond timestamps never appear in output — epoch millis
  *    (BIGINT, floor) or DATE instead, so Spark-µs vs DuckDB-ns can't skew;
  *  - all plans are plain Catalyst-optimizable DataFrame ops: filters and
  *    projections reach the parquet scan, small dims are broadcast.
  */
object Relational {

  private def li(s: SparkSession, d: String) = T.lineitem(s, d)

  // ---------------------------------------------------------------- scans

  /** Projection + per-row arithmetic; column pruning showcase.
    * The ORDER BY must be TOTAL over the projected columns:
    * (l_orderkey, l_linenumber) is NOT unique in the fixture (118k dup
    * pairs at sf0.1), so a two-key sort leaves tie order to each
    * engine's sort stability — it happened to agree at sf<=0.1 and
    * diverged at sf1. With all four output columns in the key, any
    * remaining ties are fully identical rows, which no row-by-row
    * compare can tell apart. */
  val qScanProject = Q(
    "q_scan_project",
    (s, d) =>
      li(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          r2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "revenue"),
    Some(s"""SELECT l_orderkey, l_linenumber, l_quantity,
            ${sqlR2("l_extendedprice * (1 - l_discount)")} AS revenue
            FROM lineitem
            ORDER BY l_orderkey, l_linenumber, l_quantity, revenue"""))

  /** TPC-H Q6 shape: conjunctive predicates, pushed to the parquet scan. */
  val qFilterPred = Q(
    "q_filter_pred",
    (s, d) =>
      li(s, d)
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(
          dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n_rows")),
    Some(s"""SELECT ${sqlDsum("l_extendedprice * l_discount")} AS revenue,
            count(*) AS n_rows
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24"""))

  // ---------------------------------------------------------------- joins

  /** Fact-to-dim equi-join + aggregation per market segment. */
  val qJoinInner = Q(
    "q_join_inner",
    (s, d) =>
      T.orders(s, d)
        .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy("c_mktsegment"),
    Some(s"""SELECT c_mktsegment, count(*) AS n_orders,
            ${sqlDsum("o_totalprice")} AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Small-dim joins: nation+region are broadcast (no shuffle of customer). */
  val qJoinBroadcast = Q(
    "q_join_broadcast",
    (s, d) =>
      T.customer(s, d)
        .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"), davg(col("c_acctbal")).as("avg_bal"))
        .orderBy("r_name", "n_name"),
    Some(s"""SELECT r_name, n_name, count(*) AS n_cust,
            ${sqlDavg("c_acctbal")} AS avg_bal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name ORDER BY r_name, n_name"""))

  /** Left outer join keeping zero-order customers. */
  val qJoinLeft = Q(
    "q_join_left",
    (s, d) =>
      T.customer(s, d)
        .join(T.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          r2(coalesce(
            sum(floor(col("o_totalprice") * lit(1e6) + lit(0.5)).cast("long")
              .cast(DecimalType(18, 0))).cast("double") / lit(1e6),
            lit(0.0))).as("total"))
        .orderBy("c_custkey"),
    Some(s"""SELECT c_custkey, count(o_orderkey) AS n_orders,
            ${sqlR2(s"coalesce(CAST(${sqlScaledSum("o_totalprice")} AS DOUBLE) / 1e6, 0)")} AS total
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey ORDER BY c_custkey"""))

  /** Full outer join: every customer and every high-value order survive,
    * matched where possible — both null sides exercised (customers with
    * no qualifying order, qualifying orders dangling off the sampled
    * customer range never occur, so the oracle pins the null semantics
    * on the customer side and the coalesce on both). */
  val qJoinFull = Q(
    "q_join_full",
    (s, d) =>
      T.customer(s, d).filter(col("c_custkey") % 10 === 0)
        .join(
          T.orders(s, d).filter(col("o_totalprice") > 400000.0),
          col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), lit(-1L)).as("custkey"),
          coalesce(col("o_orderkey"), lit(-1L)).as("orderkey"),
          coalesce(col("c_name"), lit("NONE")).as("name"))
        .orderBy("custkey", "orderkey"),
    Some("""SELECT coalesce(c_custkey, -1) AS custkey,
                   coalesce(o_orderkey, -1) AS orderkey,
                   coalesce(c_name, 'NONE') AS name
           FROM (SELECT * FROM customer WHERE c_custkey % 10 = 0) c
           FULL OUTER JOIN
                (SELECT * FROM orders WHERE o_totalprice > 400000) o
             ON c_custkey = o_custkey
           ORDER BY custkey, orderkey"""))

  /** Left-semi: customers with at least one finished ('F') order. */
  val qJoinSemi = Q(
    "q_join_semi",
    (s, d) =>
      T.customer(s, d)
        .join(
          T.orders(s, d).filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name FROM customer
           WHERE EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
           ORDER BY c_custkey"""))

  /** Left-anti: customers with no finished ('F') order — the exact
    * complement of [[qJoinSemi]]. The filter on the right side is what
    * makes the gate non-vacuous: every fixture customer has SOME order,
    * so "no orders at all" returns 0 rows at every sf and a 0=0 hash
    * match would prove nothing about anti-join semantics. Restricting
    * the probe side to finished orders leaves a real survivor set. */
  val qJoinAnti = Q(
    "q_join_anti",
    (s, d) =>
      T.customer(s, d)
        .join(
          T.orders(s, d).filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name FROM customer
           WHERE NOT EXISTS (SELECT 1 FROM orders
                             WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
           ORDER BY c_custkey"""))

  /** Theta/range self-join: same-user event pairs within 5 minutes
    * (coincidence matching — the TDC trigger-window analogue). Equi part
    * (user_id) keys the shuffle; the range predicate filters pairs.
    * Millisecond floors on both sides keep µs-vs-ns engines identical. */
  val qJoinThetaRange = Q(
    "q_join_theta_range",
    (s, d) => {
      val e = T.events(s, d)
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
      val a = e.select(col("user_id"), col("event_id").as("id1"), col("ms").as("ms1"))
      val b = e.select(col("user_id").as("u2"), col("event_id").as("id2"), col("ms").as("ms2"))
      a.join(b,
          col("user_id") === col("u2") &&
          col("ms2") > col("ms1") && col("ms2") - col("ms1") <= lit(300000L))
        .select(col("user_id"), col("id1"), col("id2"),
                (col("ms2") - col("ms1")).as("delta_ms"))
        .orderBy("user_id", "id1", "id2")
    },
    Some("""SELECT a.user_id, a.event_id AS id1, b.event_id AS id2,
           epoch_ms(b.ts) - epoch_ms(a.ts) AS delta_ms
           FROM events a JOIN events b
             ON a.user_id = b.user_id
            AND epoch_ms(b.ts) > epoch_ms(a.ts)
            AND epoch_ms(b.ts) - epoch_ms(a.ts) <= 300000
           ORDER BY a.user_id, id1, id2"""))

  /** The binned spelling of [[qJoinThetaRange]] — same result, skew-proof
    * shuffle. The plain variant shuffles on user_id alone, so one zipf
    * hot user concentrates its entire event history (and the quadratic
    * pair enumeration over it) in a single task. Here both sides key on
    * (user_id, 5-minute bin): with tolerance == bin width, a qualifying
    * pair's later event lands in the earlier event's bin or the next one,
    * so the left side explodes into exactly {bin, bin+1} (fan-out 2),
    * the join is a plain equi-join on (user_id, bin), and a residual
    * range filter restores exact semantics. Each matching pair meets in
    * exactly one bin — the right event's — so no post-join dedup. Per-task
    * work is now bounded by a user's events per 10 minutes, not per
    * lifetime; the shape survives both hot keys and 100x growth (same
    * trick as [[Analytics.qJoinIntervalBinned]]). */
  val qJoinThetaRangeBinned = Q(
    "q_join_theta_range_binned",
    (s, d) => {
      val tol = 300000L
      val e = T.events(s, d)
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
      val a = e.select(col("user_id"), col("event_id").as("id1"), col("ms").as("ms1"))
        .withColumn("bin",
          explode(array(floor(col("ms1") / tol), floor(col("ms1") / tol) + 1)))
      val b = e.select(col("user_id").as("u2"), col("event_id").as("id2"),
          col("ms").as("ms2"))
        .withColumn("bin2", floor(col("ms2") / tol))
      a.join(b,
          col("user_id") === col("u2") && col("bin") === col("bin2") &&
          col("ms2") > col("ms1") && col("ms2") - col("ms1") <= lit(tol))
        .select(col("user_id"), col("id1"), col("id2"),
                (col("ms2") - col("ms1")).as("delta_ms"))
        .orderBy("user_id", "id1", "id2")
    },
    // identical semantics -> identical oracle to the plain variant
    Some("""SELECT a.user_id, a.event_id AS id1, b.event_id AS id2,
           epoch_ms(b.ts) - epoch_ms(a.ts) AS delta_ms
           FROM events a JOIN events b
             ON a.user_id = b.user_id
            AND epoch_ms(b.ts) > epoch_ms(a.ts)
            AND epoch_ms(b.ts) - epoch_ms(a.ts) <= 300000
           ORDER BY a.user_id, id1, id2"""))

  /** TPC-H Q5 shape: 6-table join; Catalyst reorders, dims broadcast. */
  val qJoinMultiway = Q(
    "q_join_multiway",
    (s, d) =>
      T.customer(s, d)
        .join(T.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(li(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(T.supplier(s, d),
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(T.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .filter(
          col("r_name") === "ASIA" &&
          col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") <  lit("1999-01-01").cast("timestamp"))
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
             count(lit(1)).as("n_rows"))
        .orderBy("n_name"),
    Some(s"""SELECT n_name,
            ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue,
            count(*) AS n_rows
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate <  TIMESTAMP '1999-01-01'
            GROUP BY n_name ORDER BY n_name"""))

  // --------------------------------------------------------- aggregations

  /** TPC-H Q1: the flagship grouped aggregation. */
  val qAggGroup = Q(
    "q_agg_group",
    (s, d) =>
      li(s, d)
        .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some(s"""SELECT l_returnflag, l_linestatus,
            ${sqlDsum("l_quantity")} AS sum_qty,
            ${sqlDsum("l_extendedprice")} AS sum_base_price,
            ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
            ${sqlDsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
            ${sqlDavg("l_quantity")} AS avg_qty,
            ${sqlDavg("l_extendedprice")} AS avg_price,
            ${sqlDavg("l_discount")} AS avg_disc,
            count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2001-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  /** Exact count-distinct per day (expand + two-phase agg). */
  val qAggDistinct = Q(
    "q_agg_distinct",
    (s, d) =>
      T.events(s, d)
        .groupBy(to_date(col("ts")).as("event_date"))
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("event_type")).as("n_types"),
          count(lit(1)).as("n_events"))
        .orderBy("event_date"),
    Some("""SELECT CAST(ts AS DATE) AS event_date,
           count(DISTINCT user_id) AS n_users,
           count(DISTINCT event_type) AS n_types,
           count(*) AS n_events
           FROM events GROUP BY 1 ORDER BY event_date"""))

  private def gidAgg(s: SparkSession, d: String, mode: String): DataFrame = {
    val o = T.orders(s, d)
    val grouped = mode match {
      case "rollup" => o.rollup(col("o_orderstatus"), col("o_orderpriority"))
      case "cube"   => o.cube(col("o_orderstatus"), col("o_orderpriority"))
    }
    grouped
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total"))
      .select(
        col("gid"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total"))
      .orderBy("gid", "status", "priority")
  }

  private def gidSql(clause: String): String =
    s"""SELECT grouping_id(o_orderstatus, o_orderpriority) AS gid,
       coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders, ${sqlDsum("o_totalprice")} AS total
       FROM orders GROUP BY $clause ORDER BY gid, status, priority"""

  /** ROLLUP totals; NULL group keys are coalesced so NULL-ordering
    * differences between engines can't affect the hash. */
  val qAggRollup = Q("q_agg_rollup", (s, d) => gidAgg(s, d, "rollup"),
    Some(gidSql("ROLLUP(o_orderstatus, o_orderpriority)")))

  /** CUBE totals. */
  val qAggCube = Q("q_agg_cube", (s, d) => gidAgg(s, d, "cube"),
    Some(gidSql("CUBE(o_orderstatus, o_orderpriority)")))

  /** Explicit GROUPING SETS. */
  val qAggGroupingSets = Q(
    "q_agg_grouping_sets",
    (s, d) => {
      T.orders(s, d).createOrReplaceTempView("graft_orders_gs")
      s.sql(s"""SELECT grouping_id(o_orderstatus, o_orderpriority) AS gid,
               coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(1) AS n_orders,
               floor(CAST(sum(CAST(CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT) AS DECIMAL(18,0))) AS DOUBLE) / 1e6 * 100 + 0.5) / 100 AS total
               FROM graft_orders_gs
               GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
               ORDER BY gid, status, priority""")
    },
    Some(gidSql("GROUPING SETS ((o_orderstatus), (o_orderpriority), ())")))

  /** Occupancy-style histogram: events per (type, fixed-width value bucket)
    * — the FPGA×TDC_CHANNEL occupancy analogue. Bucket = floor(value/10);
    * exact-integer boundaries make floor identical across engines. */
  val qAggHistogram = Q(
    "q_agg_histogram",
    (s, d) =>
      T.events(s, d)
        .groupBy(
          col("event_type"),
          floor(col("value") / 10.0).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "bucket"),
    Some("""SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bucket,
           count(*) AS n
           FROM events GROUP BY 1, 2 ORDER BY event_type, bucket"""))

  /** Same histogram via the custom one-pass sketch aggregate
    * ([[graft.functions.HistogramAgg]]): one shuffled row per group
    * carrying the whole map, exploded back to rows — result and oracle
    * SQL identical to q_agg_histogram, plan shuffles |groups| rows
    * instead of |groups|x|buckets|. */
  val qAggHistogramSketch = Q(
    "q_agg_histogram_sketch",
    (s, d) =>
      T.events(s, d)
        .groupBy("event_type")
        .agg(graft.functions.HistogramAgg.histogram(col("value"), 10.0).as("h"))
        .select(col("event_type"), explode(col("h")).as(Seq("bucket", "n")))
        .orderBy("event_type", "bucket"),
    Some("""SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bucket,
           count(*) AS n
           FROM events GROUP BY 1, 2 ORDER BY event_type, bucket"""))

  /** SLIDING (overlapping) event-time windows in batch — the built-in
    * `window(ts, "1 hour", "15 minutes")` primitive gate-checked the
    * way [[qEventsSessionWindow]] checks `session_window`: every event
    * lands in exactly 4 overlapping hour windows (window/slide = 4 on
    * aligned grids), an expansion Spark performs inside the Expand
    * operator, and the oracle replays it as explicit integer
    * arithmetic — start_ms = (ms div 900000 - k)·900000 for k ∈ 0..3 —
    * so the window-assignment rule itself is what hash-matches. Counts
    * and the Det value sum per (window, type); output bounded by
    * |grid|·|types|. */
  val qEventsSliding = Q(
    "q_events_sliding",
    (s, d) =>
      T.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("v_sum"))
        .select(unix_millis(col("window.start")).as("w_start_ms"),
          col("event_type"), col("n"), col("v_sum"))
        .orderBy("w_start_ms", "event_type"),
    Some(s"""WITH e AS (SELECT event_type, value,
               epoch_ms(ts) AS ms FROM events),
             x AS (SELECT event_type, value,
               (ms // 900000 - k) * 900000 AS w_start_ms
               FROM e, (VALUES (0), (1), (2), (3)) t(k))
           SELECT w_start_ms, event_type, count(*) AS n,
             ${sqlDsum("value")} AS v_sum
           FROM x GROUP BY w_start_ms, event_type
           ORDER BY w_start_ms, event_type"""))

  /** MERGEABLE frequency sketches — the third leg of the sketch-union
    * triad ([[qAggDistinctSketchUnion]] = distinct counts,
    * [[qAggQuantileHistUnion]] = quantiles, this = point frequencies):
    * one Count-Min sketch per (event_type, day), coarser frequency
    * answers from UNIONING sketches with the raw data never re-scanned.
    * CMS union is element-wise counter addition — associative,
    * commutative, exact — so the unioned sketch is IDENTICAL to the
    * sketch built directly over the whole slice, under any partitioning:
    * for every probe key, est_union == est_direct exactly (the pinned
    * semantic content), and both upper-bound the exact count. The union
    * itself is spelled relationally (posexplode the counter arrays, sum
    * per position, rebuild) — the merge visits |types|·|days| fixed-size
    * rows, never the corpus. Probe keys are each type's top-3 users by
    * exact count (deterministic ties). Rows-only: counter positions are
    * murmur3 layout, engine-specific (the q_agg_heavy_hitters_sketch
    * argument); RelationalSpec pins union==direct, the upper-bound
    * property, and the 2N/width error envelope. */
  val qAggFreqSketchUnion = Q(
    "q_agg_freq_sketch_union",
    (s, d) => {
      val cm = graft.functions.CountMin
      val e = T.events(s, d).select(col("event_type"),
        to_date(col("ts")).as("day"), col("user_id").cast("string").as("k"))
      val daily = e.groupBy("event_type", "day").agg(cm.cms(col("k")).as("sk"))
      val unioned = daily
        .select(col("event_type"), posexplode(col("sk")).as(Seq("pos", "v")))
        .groupBy("event_type", "pos").agg(sum("v").as("v"))
        .groupBy("event_type")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("v")))),
          x => x.getField("v")).as("sk_u"))
      val direct = e.groupBy("event_type").agg(cm.cms(col("k")).as("sk_d"))
      val probes = e.groupBy("event_type", "k").agg(count(lit(1)).as("n_exact"))
        .withColumn("rn", row_number().over(Window.partitionBy("event_type")
          .orderBy(col("n_exact").desc, col("k"))))
        .filter(col("rn") <= 3).drop("rn")
      probes.join(unioned, "event_type").join(direct, "event_type")
        .select(col("event_type"), col("k").as("user_id"), col("n_exact"),
          cm.estimate(col("sk_u"), col("k")).as("est_union"),
          cm.estimate(col("sk_d"), col("k")).as("est_direct"))
        .withColumn("union_eq_direct", col("est_union") === col("est_direct"))
        .orderBy("event_type", "user_id")
    },
    None)

  /** MERGEABLE quantiles from unioned histogram sketches — the quantile
    * twin of [[qAggDistinctSketchUnion]], and the property
    * `approx_percentile` can't give: a warehouse keeps one fixed-width
    * [[graft.functions.HistogramAgg]] sketch per (event_type, day) and
    * answers coarser rollups by UNIONING sketches — per-bucket count
    * sums, associative/commutative/exact — with the raw data never
    * re-scanned. Per type the query runs BOTH paths: union-of-daily
    * sketches and one direct whole-slice sketch; because the merge is
    * exact integer arithmetic the two percentile-bucket answers are
    * EQUAL under any partitioning (the pinned semantic content — the
    * gate fails if the union path ever drifts from direct). p50/p90 are
    * the smallest buckets whose cumulative count passes the rank
    * threshold, all in integer space (`2·cum ≥ total`, `10·cum ≥
    * 9·total` — no float quantile maths anywhere); the estimate columns
    * are bucket midpoints on the Det grid. Scale shape: the shuffle
    * carries one fixed-size sketch row per (type, day) — not per
    * (type, day, bucket) — and every post-sketch frame is bounded by
    * |types|·|buckets|, regardless of corpus size. */
  val qAggQuantileHistUnion = Q(
    "q_agg_quantile_hist_union",
    (s, d) => {
      val hist = graft.functions.HistogramAgg.histogram(col("value"), 5.0)
      val e = T.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      def percentiles(buckets: DataFrame, prefix: String): DataFrame = {
        val w = Window.partitionBy("event_type").orderBy("bucket")
        val wAll = Window.partitionBy("event_type")
        buckets
          .withColumn("cum", sum("n").over(w))
          .withColumn("total", sum("n").over(wAll))
          .groupBy("event_type")
          .agg(max("total").as(s"${prefix}n"),
            min(when(col("cum") * 2 >= col("total"), col("bucket")))
              .as(s"${prefix}p50_bucket"),
            min(when(col("cum") * 10 >= col("total") * 9, col("bucket")))
              .as(s"${prefix}p90_bucket"))
      }
      val daily = e.groupBy("event_type", "day").agg(hist.as("h"))
      val unioned = percentiles(
        daily.select(col("event_type"), explode(col("h")).as(Seq("bucket", "n")))
          .groupBy("event_type", "bucket").agg(sum("n").as("n")),
        "")
      val direct = percentiles(
        e.groupBy("event_type").agg(hist.as("h"))
          .select(col("event_type"), explode(col("h")).as(Seq("bucket", "n"))),
        "d_")
      val days = daily.groupBy("event_type").agg(count(lit(1)).as("n_days"))
      unioned.join(direct, "event_type").join(days, "event_type")
        .select(col("event_type"), col("n_days"), col("n"),
          col("p50_bucket"), col("p90_bucket"),
          r2(col("p50_bucket") * lit(5.0) + lit(2.5)).as("p50_est"),
          r2(col("p90_bucket") * lit(5.0) + lit(2.5)).as("p90_est"),
          (col("p50_bucket") === col("d_p50_bucket") &&
            col("p90_bucket") === col("d_p90_bucket") &&
            col("n") === col("d_n")).as("union_eq_direct"))
        .orderBy("event_type")
    },
    Some(s"""WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(floor(value / 5.0) AS BIGINT) AS bucket FROM events),
             u AS (SELECT event_type, bucket, count(*) AS n
                   FROM e GROUP BY event_type, bucket),
             c AS (SELECT event_type, bucket, n,
                     sum(n) OVER (PARTITION BY event_type ORDER BY bucket)
                       AS cum,
                     sum(n) OVER (PARTITION BY event_type) AS total
                   FROM u),
             p AS (SELECT event_type, CAST(max(total) AS BIGINT) AS n,
                     min(CASE WHEN 2 * cum >= total THEN bucket END)
                       AS p50_bucket,
                     min(CASE WHEN 10 * cum >= 9 * total THEN bucket END)
                       AS p90_bucket
                   FROM c GROUP BY event_type),
             hd AS (SELECT event_type, count(DISTINCT day) AS n_days
                    FROM e GROUP BY event_type)
           SELECT p.event_type, hd.n_days, p.n, p.p50_bucket, p.p90_bucket,
             ${sqlR2("p.p50_bucket * 5.0 + 2.5")} AS p50_est,
             ${sqlR2("p.p90_bucket * 5.0 + 2.5")} AS p90_est,
             TRUE AS union_eq_direct
           FROM p JOIN hd USING (event_type)
           ORDER BY p.event_type"""))

  /** Approximate percentiles — the sketch-backed scale path beside
    * q_agg_percentile, as approx_count_distinct is to count distinct.
    * Engine-specific values -> no SQL oracle; scalatest bounds it
    * against the exact percentile. */
  val qAggApproxPercentile = Q(
    "q_agg_approx_percentile",
    (s, d) =>
      li(s, d)
        .groupBy("l_returnflag")
        .agg(
          r2(expr("approx_percentile(l_extendedprice, 0.5, 1000)"))
            .as("p50_approx"),
          r2(expr("approx_percentile(l_extendedprice, 0.9, 1000)"))
            .as("p90_approx"))
        .orderBy("l_returnflag"),
    None)

  /** HLL sketch — engine-specific values, so no SQL oracle; the scalatest
    * suite bounds it against the exact distinct count instead. */
  val qAggApproxDistinct = Q(
    "q_agg_approx_distinct",
    (s, d) =>
      T.events(s, d)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
        .orderBy("event_type"),
    None)

  /** MERGEABLE distinct-count sketches — the property one-shot
    * `approx_count_distinct` can't give you and the reason sketch
    * columns exist in warehouse tables at all: build one Datasketches
    * HLL per (event_type, day), store it, and answer ANY coarser
    * rollup later by UNIONING sketches — the raw data is never
    * re-scanned. Per event_type: days covered, exact distinct users
    * (the verification target), the estimate from unioning the daily
    * sketches, and the estimate from sketching the whole slice
    * directly. HLL register merge is a max — associative, commutative,
    * idempotent — so `est_union` equals `est_direct` EXACTLY under any
    * partitioning (RelationalSpec pins the equality and the accuracy
    * envelope vs exact; the spec's pin is the semantic content — no
    * SQL oracle, DuckDB's HLL is a different sketch).
    *
    * Scale shape: the daily sketch agg is two-phase (ObjectHashAggregate
    * partial map-side); ONE fixed-size sketch row per (type, day)
    * crosses the wire, and the union pass shuffles |types|·|days| rows
    * regardless of corpus size — at 100 TB the rollup reads KBs. */
  val qAggDistinctSketchUnion = Q(
    "q_agg_distinct_sketch_union",
    (s, d) => {
      val e = T.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"),
          col("user_id"))
      val daily = e.groupBy("event_type", "day")
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val rolled = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_union"))
      val whole = e.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_exact"),
          hll_sketch_estimate(hll_sketch_agg(col("user_id")))
            .as("est_direct"))
      rolled.join(whole, "event_type")
        .select(col("event_type"), col("n_days"), col("n_exact"),
          col("est_union"), col("est_direct"))
        .orderBy("event_type")
    },
    None)

  // -------------------------------------------------------------- windows

  private val wCust = Window.partitionBy(col("o_custkey"))
    .orderBy(col("o_totalprice").desc, col("o_orderkey"))

  /** Top-3 orders per customer by totalprice (rank over partition). */
  val qWindowRank = Q(
    "q_window_rank",
    (s, d) =>
      T.orders(s, d)
        .withColumn("rnk", rank().over(wCust))
        .filter(col("rnk") <= 3)
        .select("o_custkey", "rnk", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rnk", "o_orderkey"),
    Some("""SELECT o_custkey, CAST(rnk AS INT) AS rnk, o_orderkey,
                  o_totalprice FROM (
             SELECT o_custkey, o_orderkey, o_totalprice,
                    rank() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS rnk
             FROM orders)
           WHERE rnk <= 3 ORDER BY o_custkey, rnk, o_orderkey"""))

  /** Running revenue per customer over order date (cumulative frame). */
  val qWindowRunning = Q(
    "q_window_running",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"),
          dsumOver(col("o_totalprice"), w).as("running"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some(s"""SELECT o_custkey, o_orderkey,
            ${sqlR2("""CAST(sum(CAST(CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT)
                          AS DECIMAL(18,0)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) / 1e6""")} AS running
            FROM orders ORDER BY o_custkey, o_orderkey"""))

  /** Inter-event time per user (lag) — the inter-hit-time analogue. */
  val qWindowLag = Q(
    "q_window_lag",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ms"), col("event_id"))
      T.events(s, d)
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
        .withColumn("delta_ms", col("ms") - lag(col("ms"), 1).over(w))
        .select("user_id", "event_id", "delta_ms")
        .orderBy("user_id", "event_id")
    },
    Some("""SELECT user_id, event_id,
           epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id
               ORDER BY epoch_ms(ts), event_id) AS delta_ms
           FROM events ORDER BY user_id, event_id"""))

  /** Moving average over a trailing 4-row frame per user. */
  val qWindowFrameRange = Q(
    "q_window_frame_range",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ms"), col("event_id"))
        .rowsBetween(-3, Window.currentRow)
      T.events(s, d)
        .select(col("user_id"), col("event_id"),
                unix_millis(col("ts")).as("ms"), col("value"))
        .withColumn("moving_avg", davgOver(col("value"), w))
        .select("user_id", "event_id", "moving_avg")
        .orderBy("user_id", "event_id")
    },
    Some(s"""SELECT user_id, event_id,
            ${sqlR2("""CAST(sum(CAST(CAST(floor(value * 1e6 + 0.5) AS BIGINT)
                          AS DECIMAL(18,0))) OVER w AS DOUBLE) / 1e6
                 / count(*) OVER w""")} AS moving_avg
            FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
           ORDER BY user_id, event_id"""))

  /** Value-based (RANGE) window frame: per-user trailing ONE-HOUR moving
    * aggregate over events — "everything in the last 3 600 000 ms", not
    * "the last k rows". This is a distinct Spark execution path from the
    * ROWS sibling above ([[qWindowFrameRange]]): Catalyst plans a
    * `RangeFrame` whose bounds slide by ORDER-BY *value*, so rows with
    * equal `ms` are frame peers and the result is tie-order independent
    * by construction (no tiebreaker column needed — and `rangeBetween`
    * only admits a single numeric sort key anyway). Scale shape is the
    * same single hash-partition shuffle on user_id as every other
    * per-user window here; the frame bound adds no extra exchange.
    * Both dialects spell the frame over epoch-ms BIGINT (DuckDB's
    * numeric RANGE), dodging interval-literal dialect gaps. */
  val qWindowRangeTime = Q(
    "q_window_range_time",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ms"))
        .rangeBetween(-3600000L, Window.currentRow)
      T.events(s, d)
        .select(col("user_id"), col("event_id"),
                unix_millis(col("ts")).as("ms"), col("value"))
        .withColumn("hour_sum", dsumOver(col("value"), w))
        .withColumn("hour_n", count(lit(1)).over(w))
        .select("user_id", "event_id", "ms", "hour_sum", "hour_n")
        .orderBy("user_id", "event_id")
    },
    Some(s"""SELECT user_id, event_id, epoch_ms(ts) AS ms,
            ${sqlR2("""CAST(sum(CAST(CAST(floor(value * 1e6 + 0.5) AS BIGINT)
                          AS DECIMAL(18,0))) OVER w AS DOUBLE) / 1e6""")}
              AS hour_sum,
            count(*) OVER w AS hour_n
            FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
                        RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
           ORDER BY user_id, event_id"""))

  /** first_value / last_value over an unbounded frame: each customer row
    * tagged with the partition's highest- and lowest-priced order keys.
    * Total ordering inside the frame makes both edges deterministic. */
  val qWindowFirstLast = Q(
    "q_window_first_last",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T.orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("best_order"),
          last(col("o_orderkey")).over(w).as("worst_order"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS best_order,
           last_value(o_orderkey) OVER w AS worst_order
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND UNBOUNDED FOLLOWING)
           ORDER BY o_custkey, o_orderkey"""))

  /** Rank-function family beyond rank(): dense_rank, percent_rank and
    * ntile quartiles of each customer's orders by price. */
  val qWindowRankFamily = Q(
    "q_window_rank_family",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T.orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"),
          dense_rank().over(w).as("drank"),
          r2(percent_rank().over(w)).as("prank"),
          ntile(4).over(w).as("quartile"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some(s"""SELECT o_custkey, o_orderkey,
            CAST(dense_rank() OVER w AS INT) AS drank,
            ${sqlR2("percent_rank() OVER w")} AS prank,
            CAST(ntile(4) OVER w AS INT) AS quartile
            FROM orders
           WINDOW w AS (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey)
           ORDER BY o_custkey, o_orderkey"""))

  /** PIVOT: order counts per priority, one column per status value
    * (explicit value list so both dialects emit identical columns). */
  val qAggPivot = Q(
    "q_agg_pivot",
    (s, d) =>
      T.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        .na.fill(0L)
        .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
           count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
           count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
           FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Conditional-aggregation matrix per event_type: filtered counts,
    * boolean aggregates, and a filtered deterministic mean — the
    * FILTER-clause surface (Spark count_if/bool_or/bool_and ≡ standard
    * FILTER spellings, which the oracle uses; the filtered mean reuses
    * the Det machinery under a CASE so both engines sum the same scaled
    * integers). */
  val qAggConditional = Q(
    "q_agg_conditional",
    (s, d) => {
      val hi = col("value") > 50.0
      T.events(s, d)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          count_if(hi).as("n_hi"),
          bool_or(hi).as("any_hi"),
          bool_and(hi).as("all_hi"),
          dsum(when(hi, col("value")).otherwise(lit(0.0))).as("sum_hi"))
        .orderBy("event_type")
    },
    Some(s"""SELECT event_type, count(*) AS n,
            CAST(count(*) FILTER (WHERE value > 50.0) AS BIGINT) AS n_hi,
            bool_or(value > 50.0) AS any_hi,
            bool_and(value > 50.0) AS all_hi,
            ${sqlDsum("CASE WHEN value > 50.0 THEN value ELSE 0.0 END")}
              AS sum_hi
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Unpivot (wide → long): melt the four lineitem measure columns into
    * (metric, value) rows — the inverse reshaping of [[qAggPivot]].
    * Spark's `stack` generator is map-side (no shuffle; the only
    * exchange is the final aggregation's), and the oracle spells the
    * same melt as a UNION ALL so both engines state it in portable SQL.
    * Aggregated per metric with the deterministic sum so the long-form
    * table round-trips through the gate. */
  val qUnpivot = Q(
    "q_unpivot",
    (s, d) =>
      T.lineitem(s, d)
        .select(expr(
          """stack(4,
               'quantity', l_quantity,
               'extendedprice', l_extendedprice,
               'discount', l_discount,
               'tax', l_tax) AS (metric, value)"""))
        .groupBy("metric")
        .agg(count(lit(1)).as("n_rows"), dsum(col("value")).as("total"))
        .orderBy("metric"),
    Some(s"""SELECT metric, count(*) AS n_rows, ${sqlDsum("value")} AS total
            FROM (
              SELECT 'quantity' AS metric, l_quantity AS value FROM lineitem
              UNION ALL
              SELECT 'extendedprice', l_extendedprice FROM lineitem
              UNION ALL
              SELECT 'discount', l_discount FROM lineitem
              UNION ALL
              SELECT 'tax', l_tax FROM lineitem)
            GROUP BY metric ORDER BY metric"""))

  /** Exact interpolated percentiles (median / p90) — SortAggregate-backed;
    * DuckDB's quantile_cont uses the same interpolation. */
  val qAggPercentile = Q(
    "q_agg_percentile",
    (s, d) =>
      li(s, d)
        .groupBy("l_returnflag")
        .agg(
          r2(expr("percentile(l_quantity, 0.5)")).as("p50_qty"),
          r2(expr("percentile(l_extendedprice, 0.9)")).as("p90_price"))
        .orderBy("l_returnflag"),
    Some(s"""SELECT l_returnflag,
            ${sqlR2("quantile_cont(l_quantity, 0.5)")} AS p50_qty,
            ${sqlR2("quantile_cont(l_extendedprice, 0.9)")} AS p90_price
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Correlated scalar subquery: customers above their nation's average
    * balance (decorrelates to an aggregate + join under Catalyst). */
  val qSubqueryScalar = Q(
    "q_subquery_scalar",
    (s, d) => {
      T.customer(s, d).createOrReplaceTempView("graft_cust_sq")
      // exact scaled-sum average on both sides: an FP avg could flip
      // boundary rows between engines
      s.sql(s"""SELECT c_custkey, c_nationkey,
               ${sqlR2("c_acctbal")} AS bal
               FROM graft_cust_sq o
               WHERE c_acctbal > (SELECT CAST(sum(CAST(CAST(floor((c_acctbal) * 1e6 + 0.5) AS BIGINT) AS DECIMAL(18,0))) AS DOUBLE) / 1e6 / count(*)
                                  FROM graft_cust_sq i
                                  WHERE i.c_nationkey = o.c_nationkey)
               ORDER BY c_custkey""")
    },
    Some(s"""SELECT c_custkey, c_nationkey, ${sqlR2("c_acctbal")} AS bal
            FROM customer o
            WHERE c_acctbal > (SELECT CAST(sum(CAST(CAST(floor((c_acctbal) * 1e6 + 0.5) AS BIGINT) AS DECIMAL(18,0))) AS DOUBLE) / 1e6 / count(*)
                               FROM customer i
                               WHERE i.c_nationkey = o.c_nationkey)
            ORDER BY c_custkey"""))

  // ---------------------------------------------------------- sort / topk

  /** Global top-20 by price — TakeOrderedAndProject, no full sort. */
  val qTopk = Q(
    "q_topk",
    (s, d) =>
      li(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20),
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20"""))

  // -------------------------------------------------------------- set ops

  /** Union-all of two status slices, tagged and re-sorted. */
  val qUnion = Q(
    "q_union",
    (s, d) => {
      val o = T.orders(s, d)
      val open = o.filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), col("o_totalprice"), lit("open").as("bucket"))
      val done = o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_totalprice"), lit("done").as("bucket"))
      open.unionAll(done).orderBy("o_orderkey", "bucket")
    },
    Some("""SELECT o_orderkey, o_totalprice, 'open' AS bucket FROM orders
           WHERE o_orderstatus = 'O'
           UNION ALL
           SELECT o_orderkey, o_totalprice, 'done' AS bucket FROM orders
           WHERE o_orderstatus = 'F'
           ORDER BY o_orderkey, bucket"""))

  /** INTERSECT (distinct): BUILDING-segment customers who have F orders. */
  val qIntersect = Q(
    "q_intersect",
    (s, d) =>
      T.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
        .intersect(
          T.orders(s, d).filter(col("o_orderstatus") === "F")
            .select(col("o_custkey").as("custkey")))
        .orderBy("custkey"),
    Some("""SELECT * FROM (
             SELECT c_custkey AS custkey FROM customer
             WHERE c_mktsegment = 'BUILDING'
             INTERSECT
             SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
           ORDER BY custkey"""))

  /** EXCEPT (distinct): customers with orders but none in state F. */
  val qExcept = Q(
    "q_except",
    (s, d) => {
      val o = T.orders(s, d)
      o.select(col("o_custkey").as("custkey"))
        .except(o.filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey")))
        .orderBy("custkey")
    },
    Some("""SELECT * FROM (
             SELECT o_custkey AS custkey FROM orders
             EXCEPT
             SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
           ORDER BY custkey"""))

  /** Bounded cross join: region x nation grid (the one join type with no
    * key at all — legitimate only when one side is tiny and broadcast). */
  val qJoinCross = Q(
    "q_join_cross",
    (s, d) =>
      T.region(s, d).select(col("r_name"))
        .crossJoin(broadcast(T.nation(s, d).select(col("n_name"))))
        .orderBy("r_name", "n_name"),
    Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
           ORDER BY r_name, n_name"""))

  /** EXCEPT ALL — multiplicity-preserving difference: order keys of 'O'
    * orders minus one occurrence per urgent order. */
  val qExceptAll = Q(
    "q_except_all",
    (s, d) => {
      val o = T.orders(s, d)
      o.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
        .exceptAll(o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("custkey")))
        .groupBy("custkey").agg(count(lit(1)).as("n"))
        .orderBy("custkey")
    },
    Some("""SELECT custkey, count(*) AS n FROM (
             SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
             EXCEPT ALL
             SELECT o_custkey AS custkey FROM orders
             WHERE o_orderpriority = '1-URGENT')
           GROUP BY custkey ORDER BY custkey"""))

  /** Bitwise-operator matrix over the key columns — the scalar family's
    * integer-bit coverage (hash bucketing, bitmap flags, shard masks all
    * reduce to these): AND/OR/XOR, shifts, popcount, aggregated to exact
    * integer sums per returnflag so the output is small and every bit
    * path is summed over the whole table. Dialect note: Spark's `^` is
    * bitwise XOR while DuckDB's is exponentiation, so the oracle spells
    * `xor()` — same function, different surface syntax. */
  val qScalarBitwise = Q(
    "q_scalar_bitwise",
    (s, d) =>
      li(s, d)
        .select(col("l_returnflag"),
          (col("l_orderkey").bitwiseAND(lit(255L))).as("band"),
          (col("l_orderkey").bitwiseOR(col("l_partkey"))).as("orv"),
          (col("l_orderkey").bitwiseXOR(col("l_partkey"))).as("xorv"),
          shiftleft(col("l_orderkey") % 1024, 3).cast("long").as("shl"),
          shiftright(col("l_orderkey"), 4).as("shr"),
          bit_count(col("l_orderkey")).cast("long").as("pc"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum("band").as("sum_and"), sum("orv").as("sum_or"),
          sum("xorv").as("sum_xor"), sum("shl").as("sum_shl"),
          sum("shr").as("sum_shr"), sum("pc").as("sum_popcount"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey & 255) AS BIGINT) AS sum_and,
             CAST(sum(l_orderkey | l_partkey) AS BIGINT) AS sum_or,
             CAST(sum(xor(l_orderkey, l_partkey)) AS BIGINT) AS sum_xor,
             CAST(sum((l_orderkey % 1024) << 3) AS BIGINT) AS sum_shl,
             CAST(sum(l_orderkey >> 4) AS BIGINT) AS sum_shr,
             CAST(sum(bit_count(l_orderkey)) AS BIGINT) AS sum_popcount
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Null semantics: nullif manufactures nulls, coalesce/nvl2-style
    * expressions collapse them, null-safe equality compares through
    * them — the null-handling matrix over real data. */
  val qScalarNull = Q(
    "q_scalar_null",
    (s, d) =>
      T.customer(s, d)
        .select(
          col("c_custkey"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_or_null"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")),
            lit("SUPPRESSED")).as("seg_filled"),
          when(nullif(col("c_mktsegment"), lit("BUILDING")).isNull, 0L)
            .otherwise(1L).as("kept"),
          (nullif(col("c_mktsegment"), lit("BUILDING")) <=> lit(null))
            .as("is_suppressed"))
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey,
           nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'SUPPRESSED')
             AS seg_filled,
           CAST(CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NULL THEN 0
                ELSE 1 END AS BIGINT) AS kept,
           nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM NULL
             AS is_suppressed
           FROM customer ORDER BY c_custkey"""))

  // ------------------------------------------------------ scalar functions

  /** String expressions over part names. */
  val qScalarString = Q(
    "q_scalar_string",
    (s, d) =>
      T.part(s, d)
        .filter(col("p_name").like("%a%"))
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 5).as("pfx"),
          length(col("p_name")).as("name_len"),
          concat_ws("#", col("p_brand"), col("p_type")).as("tag"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, upper(p_name) AS uname,
           substring(p_name, 1, 5) AS pfx,
           CAST(length(p_name) AS INT) AS name_len,
           concat(p_brand, '#', p_type) AS tag
           FROM part WHERE p_name LIKE '%a%' ORDER BY p_partkey"""))

  /** Datetime expressions over orders. */
  val qScalarDate = Q(
    "q_scalar_date",
    (s, d) =>
      T.orders(s, d)
        .select(
          col("o_orderkey"),
          to_date(date_trunc("month", col("o_orderdate"))).as("order_month"),
          (((dayofweek(col("o_orderdate")) + 5) % 7) + 1).as("isodow"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
            .as("days_since_95"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(isodow(o_orderdate) AS INT) AS isodow,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT)
             AS days_since_95
           FROM orders ORDER BY o_orderkey"""))

  /** Math expressions over part prices. */
  val qScalarMath = Q(
    "q_scalar_math",
    (s, d) =>
      T.part(s, d)
        .select(
          col("p_partkey"),
          r2(col("p_retailprice")).as("price_r"),
          floor(col("p_retailprice")).cast("long").as("price_floor"),
          abs(col("p_retailprice") - lit(1000.0)).as("dist_1k"),
          r2(sqrt(col("p_retailprice"))).as("price_sqrt"),
          r2(log(col("p_retailprice"))).as("price_ln"))
        .orderBy("p_partkey"),
    Some(s"""SELECT p_partkey, ${sqlR2("p_retailprice")} AS price_r,
            CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
            abs(p_retailprice - 1000.0) AS dist_1k,
            ${sqlR2("sqrt(p_retailprice)")} AS price_sqrt,
            ${sqlR2("ln(p_retailprice)")} AS price_ln
            FROM part ORDER BY p_partkey"""))

  /** CASE WHEN banding of account balances. */
  val qScalarCase = Q(
    "q_scalar_case",
    (s, d) =>
      T.customer(s, d)
        .select(
          when(col("c_acctbal") < 0, "overdrawn")
            .when(col("c_acctbal") < 5000, "standard")
            .otherwise("premium").as("band"),
          col("c_acctbal"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
        .orderBy("band"),
    Some(s"""SELECT CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                        WHEN c_acctbal < 5000 THEN 'standard'
                        ELSE 'premium' END AS band,
            count(*) AS n_cust, ${sqlDsum("c_acctbal")} AS total_bal
            FROM customer GROUP BY 1 ORDER BY band"""))

  /** JSON field extraction from event props + aggregation. */
  val qMapJson = Q(
    "q_map_json",
    (s, d) =>
      T.events(s, d)
        .select(
          col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
             min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type"),
    Some("""SELECT event_type, count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
           FROM events GROUP BY event_type ORDER BY event_type"""))

  // ------------------------------------------- event-time (batch-checkable)

  /** Tumbling 1-hour windows × type; window start as epoch millis. */
  val qEventsTumbling = Q(
    "q_events_tumbling",
    (s, d) =>
      T.events(s, d)
        .groupBy(
          unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .orderBy("hour_ms", "event_type"),
    Some(s"""SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
            count(*) AS n, ${sqlDsum("value")} AS total_value
            FROM events GROUP BY 1, 2 ORDER BY hour_ms, event_type"""))

  /** The BUILT-IN `session_window` run in batch and gate-checked: one
    * row per merged session, re-aggregated to per-user counts. The
    * oracle replays Spark's exact gap rule relationally: an event at
    * EXACTLY `last + gap` still MERGES (verified empirically in
    * RelationalSpec — the windows behave closed at the merge boundary),
    * so a new session starts only when the gap is strictly greater than
    * the duration — the same `>` rule as [[qEventsSession]], now pinned
    * against the primitive itself rather than assumed. */
  val qEventsSessionWindow = Q(
    "q_events_session_window",
    (s, d) =>
      T.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum("n").as("n_events"))
        .orderBy("user_id"),
    Some("""WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id
                       FROM events),
             flags AS (SELECT user_id,
               CASE WHEN lag(ms) OVER w IS NULL
                      OR ms - lag(ms) OVER w > 1800000 THEN 1
                    ELSE 0 END AS new_s
               FROM e WINDOW w AS (PARTITION BY user_id
                 ORDER BY ms, event_id))
           SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions,
                  count(*) AS n_events
           FROM flags GROUP BY user_id ORDER BY user_id"""))

  /** Sessionization with a 30-minute inactivity gap, expressed relationally
    * (lag -> new-session flag -> per-user session count) so DuckDB can
    * oracle it; the streaming twin uses session_window (stream package). */
  val qEventsSession = Q(
    "q_events_session",
    (s, d) => {
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("ms"), col("event_id"))
      T.events(s, d)
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
        .withColumn("prev_ms", lag(col("ms"), 1).over(wOrd))
        .withColumn("new_session",
          when(col("prev_ms").isNull || col("ms") - col("prev_ms") > 1800000L, 1L)
            .otherwise(0L))
        .groupBy("user_id")
        .agg(sum(col("new_session")).as("n_sessions"),
             count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events FROM (
             SELECT user_id,
                    CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000
                         THEN 1 ELSE 0 END AS new_session
             FROM (SELECT user_id, event_id, epoch_ms(ts) AS ms,
                          lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                              ORDER BY epoch_ms(ts), event_id) AS prev_ms
                   FROM events))
           GROUP BY user_id ORDER BY user_id"""))

  /** Second-moment statistics per group — stddev and correlation — via
    * EXACT scaled integer sums (Det.dsumRaw), not the native stddev/corr
    * aggregates: those accumulate doubles in partition order (and with
    * different inner algorithms per engine), so their low bits are not
    * reproducible across engines or partitionings. Deriving
    * mean/variance/covariance from order-independent integer sums with
    * the same IEEE-754 op sequence in both dialects makes the output
    * bit-identical by construction — the same trick dsum uses, lifted to
    * second moments. (Analytically: var = E[x²]−E[x]², corr =
    * (E[xy]−E[x]E[y])/(σx·σy).) */
  val qAggStatsMoments = Q(
    "q_agg_stats_moments",
    (s, d) => {
      val li = T.lineitem(s, d)
      val n = count(lit(1)).cast("double")
      val mq = dsumRaw(col("l_quantity")) / n
      val mp = dsumRaw(col("l_extendedprice")) / n
      val vq = dsumRaw(col("l_quantity") * col("l_quantity")) / n - mq * mq
      val vp = dsumRaw(col("l_extendedprice") * col("l_extendedprice")) / n - mp * mp
      val cov = dsumRaw(col("l_quantity") * col("l_extendedprice")) / n - mq * mp
      li.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
             r2(sqrt(vq)).as("std_qty"),
             r2(sqrt(vp)).as("std_price"),
             r2(cov / (sqrt(vq) * sqrt(vp))).as("corr_qty_price"))
        .orderBy("l_returnflag")
    },
    Some {
      val n = "CAST(count(*) AS DOUBLE)"
      val mq = s"${sqlDsumRaw("l_quantity")} / $n"
      val mp = s"${sqlDsumRaw("l_extendedprice")} / $n"
      val vq = s"${sqlDsumRaw("l_quantity * l_quantity")} / $n - ($mq) * ($mq)"
      val vp = s"${sqlDsumRaw("l_extendedprice * l_extendedprice")} / $n - ($mp) * ($mp)"
      val cov = s"${sqlDsumRaw("l_quantity * l_extendedprice")} / $n - ($mq) * ($mp)"
      s"""SELECT l_returnflag, count(*) AS n_rows,
            ${sqlR2(s"sqrt($vq)")} AS std_qty,
            ${sqlR2(s"sqrt($vp)")} AS std_price,
            ${sqlR2(s"($cov) / (sqrt($vq) * sqrt($vp))")} AS corr_qty_price
          FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
    })

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    * match each other instead of vanishing — the join-matrix corner the
    * plain equi-join can't express. Keys are made sparse-null
    * deterministically (nullif on a data predicate) so the gate
    * exercises the NULL-bucket semantics on both engines. */
  val qJoinNullsafe = Q(
    "q_join_nullsafe",
    (s, d) => {
      val a = T.orders(s, d)
        .select(nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("k"),
                col("o_orderkey"))
      val b = T.orders(s, d)
        .select(nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("k2"),
                lit(1L).as("one"))
        .groupBy("k2").agg(count(lit(1)).as("n_b"))
      a.join(b, col("k") <=> col("k2"))
        .groupBy("k").agg(count(lit(1)).as("n_rows"), max("n_b").as("n_b"))
        .orderBy(col("k").asc_nulls_first)
    },
    Some("""SELECT k, count(*) AS n_rows, max(n_b) AS n_b FROM
             (SELECT nullif(o_orderpriority, '3-MEDIUM') AS k, o_orderkey
              FROM orders) a
           JOIN (SELECT nullif(o_orderpriority, '3-MEDIUM') AS k2,
                        count(*) AS n_b
                 FROM orders GROUP BY k2) b
             ON a.k IS NOT DISTINCT FROM b.k2
           GROUP BY k ORDER BY k NULLS FIRST"""))

  /** TPC-H Q3 (shipping priority) driven through the SQL FRONT-END:
    * the tables register as temp views and ONE ANSI SQL string is both
    * the Spark query (`spark.sql`) and the DuckDB oracle, verbatim —
    * the strongest form of dialect parity the gate can check (every
    * other query pairs a DataFrame plan with a re-spelled oracle). The
    * deterministic revenue sum (Det's scaled-decimal formula) is itself
    * ANSI, which is what makes the single-spelling trick possible. */
  val sqlShippingPrioritySql: String =
    s"""SELECT l_orderkey,
          ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue,
          o_orderdate, o_orderpriority
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1995-03-15'
          AND l_shipdate  > TIMESTAMP '1995-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10"""

  val qSqlShippingPriority = Q(
    "q_sql_shipping_priority",
    (s, d) => {
      T.customer(s, d).createOrReplaceTempView("customer")
      T.orders(s, d).createOrReplaceTempView("orders")
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(sqlShippingPrioritySql)
    },
    Some(sqlShippingPrioritySql))

  /** TPC-H Q1 (pricing summary) through the SQL front-end, same
    * single-spelling contract as [[qSqlShippingPriority]] — this one
    * additionally runs the full Det aggregate battery (three scaled-
    * decimal sums, three deterministic means) through BOTH parsers, so
    * any drift in how either dialect folds the shared arithmetic fails
    * the gate. sum_qty is integral: CAST inside the sum keeps Spark at
    * BIGINT and the outer CAST collapses DuckDB's HUGEINT widening. */
  val sqlPricingSummarySql: String =
    s"""SELECT l_returnflag, l_linestatus,
          CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
          ${sqlDsum("l_extendedprice")} AS sum_base_price,
          ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
          ${sqlDsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")}
            AS sum_charge,
          ${sqlDavg("l_quantity")} AS avg_qty,
          ${sqlDavg("l_extendedprice")} AS avg_price,
          ${sqlDavg("l_discount")} AS avg_disc,
          count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""

  val qSqlPricingSummary = Q(
    "q_sql_pricing_summary",
    (s, d) => {
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(sqlPricingSummarySql)
    },
    Some(sqlPricingSummarySql))

  /** TPC-H Q10 (returned-item customers) through the SQL front-end —
    * the third single-spelling query, this one exercising a 4-table
    * join + group + top-k through both parsers. */
  val sqlReturnedCustomersSql: String =
    s"""SELECT c_custkey, c_name,
          ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue,
          n_name
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1995-10-01'
          AND o_orderdate <  TIMESTAMP '1996-01-01'
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20"""

  val qSqlReturnedCustomers = Q(
    "q_sql_returned_customers",
    (s, d) => {
      T.customer(s, d).createOrReplaceTempView("customer")
      T.orders(s, d).createOrReplaceTempView("orders")
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      T.nation(s, d).createOrReplaceTempView("nation")
      s.sql(sqlReturnedCustomersSql)
    },
    Some(sqlReturnedCustomersSql))

  /** TPC-H Q13 (customer order-count distribution) through the SQL
    * front-end: left join under a join-condition filter, a grouped
    * count, then a second aggregation OVER the first — pure integer
    * output, single spelling in both engines. */
  val sqlCustDistributionSql: String =
    """SELECT c_count, count(*) AS custdist
       FROM (SELECT c_custkey, count(o_orderkey) AS c_count
             FROM customer LEFT OUTER JOIN orders
               ON c_custkey = o_custkey
              AND o_orderpriority <> '3-MEDIUM'
             GROUP BY c_custkey)
       GROUP BY c_count
       ORDER BY custdist DESC, c_count DESC"""

  val qSqlCustDistribution = Q(
    "q_sql_cust_distribution",
    (s, d) => {
      T.customer(s, d).createOrReplaceTempView("customer")
      T.orders(s, d).createOrReplaceTempView("orders")
      s.sql(sqlCustDistributionSql)
    },
    Some(sqlCustDistributionSql))

  /** TPC-H Q18 (large-volume customers) through the SQL front-end: an
    * IN subquery with a grouped HAVING over the fact table, decorrelated
    * by both engines — quantity sums are integral doubles (exact in any
    * order), totalprice goes through Det. The ORDER BY names the
    * PROJECTED `totalprice` alias, not the `o_totalprice` source column
    * (r17 fold-back): the fixture's prices are exactly 2dp at every sf
    * (Det's round is a measured bit-exact identity on them, 0 non-
    * round-trip rows at sf0.01/0.1/10), so the ordering is value-
    * identical — and an output-column key is what lets the dump-side
    * order audit (tools/order_audit.py, ADVICE r16) verify this LIMIT
    * query's ordering without the column the dump doesn't carry. */
  val sqlLargeVolumeSql: String =
    s"""SELECT c_custkey, o_orderkey, o_orderdate,
          ${sqlR2("o_totalprice")} AS totalprice,
          CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM customer, orders, lineitem
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey
                             HAVING sum(l_quantity) > 250)
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY totalprice DESC, o_orderkey
        LIMIT 50"""

  val qSqlLargeVolume = Q(
    "q_sql_large_volume",
    (s, d) => {
      T.customer(s, d).createOrReplaceTempView("customer")
      T.orders(s, d).createOrReplaceTempView("orders")
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(sqlLargeVolumeSql)
    },
    Some(sqlLargeVolumeSql))

  /** TPC-H Q15 (top supplier) through the SQL front-end: a revenue CTE
    * consumed twice — once as the join input, once under a scalar MAX
    * subquery — the classic view-plus-aggregate-of-itself shape. The
    * equality predicate compares Det-rounded revenues, which are
    * bit-identical in both engines by construction, so a float-equality
    * join is safe here (and only here — never compare raw float
    * aggregates). */
  val sqlTopSupplierSql: String =
    s"""WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 ${sqlDsum("l_extendedprice * (1 - l_discount)")}
                   AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier, revenue
        WHERE s_suppkey = supplier_no
          AND total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey"""

  val qSqlTopSupplier = Q(
    "q_sql_top_supplier",
    (s, d) => {
      T.supplier(s, d).createOrReplaceTempView("supplier")
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(sqlTopSupplierSql)
    },
    Some(sqlTopSupplierSql))

  /** TPC-H Q5 (local supplier volume) through the SQL front-end — the
    * seventh single-spelling query, and the widest join in the family:
    * SIX tables with the customer-and-supplier-share-a-nation equality
    * that makes Q5 the canonical join-order stress (the region/nation
    * dims must broadcast; the c_nationkey = s_nationkey constraint
    * closes the snowflake into a cycle Catalyst has to order well).
    * Revenue through the Det scaled-decimal sum; n_name tie-break makes
    * the DESC ordering total. */
  val sqlLocalSupplierVolumeSql: String =
    s"""SELECT n_name,
          ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name"""

  val qSqlLocalSupplierVolume = Q(
    "q_sql_local_supplier_volume",
    (s, d) => {
      T.customer(s, d).createOrReplaceTempView("customer")
      T.orders(s, d).createOrReplaceTempView("orders")
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      T.supplier(s, d).createOrReplaceTempView("supplier")
      T.nation(s, d).createOrReplaceTempView("nation")
      T.region(s, d).createOrReplaceTempView("region")
      s.sql(sqlLocalSupplierVolumeSql)
    },
    Some(sqlLocalSupplierVolumeSql))

  /** TPC-H Q4 (order priority checking) through the SQL front-end — the
    * eighth single-spelling query and the EXISTS shape the family
    * lacked: a correlated EXISTS subquery both engines must decorrelate
    * into a left-semi join before planning (Spark: RewritePredicateSubquery
    * → LeftSemi; the fixture's lineitem has no commit/receipt dates, so
    * the inner predicate is the high-quantity slice — identical
    * decorrelation work, dialect-portable spelling). Pure integer
    * output; o_orderpriority totalizes the order. */
  val sqlOrderPrioritySql: String =
    """SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-07-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority"""

  val qSqlOrderPriority = Q(
    "q_sql_order_priority",
    (s, d) => {
      T.orders(s, d).createOrReplaceTempView("orders")
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(sqlOrderPrioritySql)
    },
    Some(sqlOrderPrioritySql))

  /** TPC-H Q14 (promotion effect) through the SQL front-end — the ninth
    * single-spelling query and the family's first RATIO-of-aggregates:
    * promo revenue share per ship month. The percent is a division of
    * two Det scaled-decimal sums lifted to double — both operands exit
    * the exact integer space through the identical op sequence in both
    * engines, so the quotient (and its 2dp floor-round) is bit-identical
    * by construction; the denominator can't be zero because a group
    * exists only if it has revenue rows. The part join broadcasts (3.4k
    * rows at sf0.01 — a dim table at any sf). */
  val sqlPromoRevenueSql: String = {
    val disc = "l_extendedprice * (1 - l_discount)"
    val promo = s"CASE WHEN p_type = 'PROMO' THEN $disc ELSE 0 END"
    // CAST: Spark's date_trunc always returns TIMESTAMP while DuckDB's
    // returns DATE for a DATE input — invisible to the pandas gate
    // (both land as datetime64) but a declared-type mismatch under the
    // r16 hash-compare mode, which checks DESCRIBE-level types.
    s"""SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS mon,
          ${sqlR2(s"100 * ${sqlDsumRaw(promo)} / ${sqlDsumRaw(disc)}")}
            AS promo_pct,
          ${sqlDsum(disc)} AS revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY date_trunc('month', l_shipdate)
        ORDER BY mon"""
  }

  val qSqlPromoRevenue = Q(
    "q_sql_promo_revenue",
    (s, d) => {
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      T.part(s, d).createOrReplaceTempView("part")
      s.sql(sqlPromoRevenueSql)
    },
    Some(sqlPromoRevenueSql))

  /** TPC-H Q19 (discounted revenue) through the SQL front-end — the
    * tenth single-spelling query and the family's disjunctive-predicate
    * stress: three OR-ed conjunction groups mixing join-side (p_brand,
    * p_size) and fact-side (l_quantity) conditions. The planner work
    * under test is what each engine extracts from the disjunction — the
    * common `l_partkey = p_partkey` must still join hash/merge, and the
    * shared quantity/size envelopes are pushable as a coarse pre-filter
    * even though no single branch is. Revenue per brand through the Det
    * scaled-decimal sum; brand totalizes the order. */
  val sqlDiscountedRevenueSql: String =
    s"""SELECT p_brand,
          count(*) AS n_items,
          ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND ((p_brand = 'Brand#1' AND p_size <= 15
                AND l_quantity >= 1 AND l_quantity <= 21)
            OR (p_brand = 'Brand#12' AND p_size <= 25
                AND l_quantity >= 10 AND l_quantity <= 30)
            OR (p_brand = 'Brand#23' AND p_size <= 35
                AND l_quantity >= 20 AND l_quantity <= 40))
        GROUP BY p_brand
        ORDER BY p_brand"""

  val qSqlDiscountedRevenue = Q(
    "q_sql_discounted_revenue",
    (s, d) => {
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      T.part(s, d).createOrReplaceTempView("part")
      s.sql(sqlDiscountedRevenueSql)
    },
    Some(sqlDiscountedRevenueSql))

  /** `cume_dist` — the one ranking function the rank-family query
    * doesn't cover: the cumulative distribution of quantity within each
    * returnflag. Spelled aggregate-then-window (the [[qAggMode]] trick):
    * a `Window.partitionBy(l_returnflag)` over the raw table would pour
    * the whole corpus into 3 sort partitions — three tasks sorting 1/3
    * of 100 TB each while the cluster idles. Instead the fully-parallel
    * two-phase `groupBy(flag, qty).count()` collapses the table to the
    * tiny (flag, qty) frequency frame, and cume_dist falls out of its
    * own definition: running_sum(cnt) ordered by qty / total. Tied rows
    * share one cume_dist value by definition (rows ≤ current / total —
    * order-within-tie never matters), so the per-distinct-value
    * projection is deterministic without any tie-break machinery, and
    * the window sorts |distinct qty|×3 rows instead of the corpus. */
  val qWindowCumeDist = Q(
    "q_window_cume_dist",
    (s, d) =>
      li(s, d)
        .groupBy(col("l_returnflag"),
          col("l_quantity").cast("long").as("qty"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("l_returnflag"), col("qty"),
          r2(sum("cnt").over(
              Window.partitionBy("l_returnflag").orderBy("qty"))
            .cast("double") /
            sum("cnt").over(Window.partitionBy("l_returnflag"))).as("cd"))
        .orderBy("l_returnflag", "qty"),
    Some(s"""SELECT DISTINCT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
              ${sqlR2("""cume_dist() OVER (PARTITION BY l_returnflag
                ORDER BY CAST(l_quantity AS BIGINT))""")} AS cd
            FROM lineitem ORDER BY l_returnflag, qty"""))

  /** Deterministic mode per group: the most frequent l_quantity per
    * returnflag (ties to the smallest value), via count-then-argmax —
    * the same struct trick as [[qAggArgmax]] lifted one level: the
    * frequency table is a tiny (group, value) aggregate, the mode is
    * `max(struct(cnt, -value))` over it. Both aggregations two-phase;
    * no window, no sort. (Spark's native `mode` is tie-arbitrary, like
    * max_by — unusable under a hash gate.) */
  val qAggMode = Q(
    "q_agg_mode",
    (s, d) =>
      li(s, d)
        .groupBy(col("l_returnflag"),
          col("l_quantity").cast("long").as("qty"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("l_returnflag")
        .agg(max(struct(col("cnt").as("c"), (-col("qty")).as("nq")))
          .as("m"))
        .select(col("l_returnflag"), (-col("m.nq")).as("mode_qty"),
          col("m.c").as("n_occurrences"))
        .orderBy("l_returnflag"),
    Some("""WITH tf AS (SELECT l_returnflag,
               CAST(l_quantity AS BIGINT) AS qty, count(*) AS cnt
             FROM lineitem GROUP BY 1, 2),
             rk AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
               ORDER BY cnt DESC, qty ASC) AS rn FROM tf)
           SELECT l_returnflag, qty AS mode_qty, cnt AS n_occurrences
           FROM rk WHERE rn = 1 ORDER BY l_returnflag"""))

  /** Deterministic argmax/argmin per group: the orderkey carrying each
    * returnflag's max (and min) extendedprice. Native `max_by` keeps
    * whichever tied row a task saw first — partition-order-dependent —
    * so the argmax is spelled `max(struct(price, -orderkey))`: Spark's
    * struct ordering is lexicographic, making the tie-break (smallest
    * orderkey) part of the VALUE. One two-phase aggregation; the oracle
    * spells the same total order with ranked windows. */
  val qAggArgmax = Q(
    "q_agg_argmax",
    (s, d) =>
      li(s, d)
        .groupBy("l_returnflag")
        .agg(
          max(struct(col("l_extendedprice").as("p"),
            (-col("l_orderkey")).as("nk"))).as("mx"),
          min(struct(col("l_extendedprice").as("p"),
            col("l_orderkey").as("k"))).as("mn"))
        .select(col("l_returnflag"),
          (-col("mx.nk")).as("top_orderkey"), r2(col("mx.p")).as("top_price"),
          col("mn.k").as("bottom_orderkey"), r2(col("mn.p")).as("bottom_price"))
        .orderBy("l_returnflag"),
    Some(s"""WITH rk AS (SELECT l_returnflag, l_orderkey, l_extendedprice,
               row_number() OVER (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice DESC, l_orderkey ASC) AS ra,
               row_number() OVER (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice ASC, l_orderkey ASC) AS rb
             FROM lineitem)
           SELECT t1.l_returnflag,
                  t1.l_orderkey AS top_orderkey,
                  ${sqlR2("t1.l_extendedprice")} AS top_price,
                  t2.l_orderkey AS bottom_orderkey,
                  ${sqlR2("t2.l_extendedprice")} AS bottom_price
           FROM (SELECT * FROM rk WHERE ra = 1) t1
           JOIN (SELECT * FROM rk WHERE rb = 1) t2
             USING (l_returnflag)
           ORDER BY l_returnflag"""))

  val all: Seq[Q] = Seq(
    qAggStatsMoments, qJoinNullsafe, qSqlShippingPriority,
    qSqlPricingSummary, qSqlReturnedCustomers, qSqlCustDistribution,
    qSqlLargeVolume, qSqlTopSupplier, qSqlLocalSupplierVolume,
    qSqlOrderPriority, qSqlPromoRevenue, qSqlDiscountedRevenue,
    qAggArgmax, qAggMode,
    qScanProject, qFilterPred,
    qJoinInner, qJoinBroadcast, qJoinLeft, qJoinFull, qJoinSemi, qJoinAnti,
    qJoinThetaRange, qJoinThetaRangeBinned, qJoinMultiway,
    qAggGroup, qAggDistinct, qAggRollup, qAggCube, qAggGroupingSets,
    qAggHistogram, qAggHistogramSketch, qAggApproxDistinct,
    qAggDistinctSketchUnion, qAggQuantileHistUnion, qAggFreqSketchUnion,
    qAggApproxPercentile,
    qWindowRank, qWindowRankFamily, qWindowCumeDist, qWindowFirstLast, qWindowRunning, qWindowLag,
    qWindowFrameRange, qWindowRangeTime, qAggPercentile, qAggPivot, qUnpivot, qAggConditional,
    qSubqueryScalar, qJoinCross,
    qExceptAll,
    qTopk, qUnion, qIntersect, qExcept,
    qScalarString, qScalarDate, qScalarMath, qScalarCase, qScalarNull,
    qScalarBitwise,
    qMapJson,
    qEventsTumbling, qEventsSession, qEventsSessionWindow, qEventsSliding)
}
