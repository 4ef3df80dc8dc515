package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.business
import graft.ops.relational

/**
 * ETL-parity query set: every operator shape from SURVEY.md §2 (scans,
 * predicates, joins J1–J9, aggregations A1–A5, windows, set ops, scalar
 * rules C/D/M/T) exercised over the driver's TPC-H-ish fixtures with a
 * DuckDB oracle per query.
 *
 * Float-determinism policy: any aggregated double goes through
 * `CAST(x AS DECIMAL(18,4))` before SUM on both engines (decimal addition
 * is exact and associative ⇒ bit-identical totals regardless of execution
 * order), with a final cast back to DOUBLE.
 */
object EtlQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact, order-insensitive sum of a double column (see policy above). */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,4)")).cast("double")

  val specs: Seq[QuerySpec] = Seq(

    // ── aggregation over incremental scan (A-class; TPC-H Q1 shape) ──
    QuerySpec("q01_pricing_summary",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        l.filter(to_date(col("l_shipdate")) <= lit("1998-09-02").cast("date"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("sum_disc_price"),
            count(lit(1)).as("count_order"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
          CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
          count(*) AS count_order
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus"""),
      "groupBy/agg with exact decimal sums (SURVEY §2.4)"),

    // ── S1/A1/O1: watermark argmax (top-1 by finish desc) ──
    QuerySpec("q02_watermark_argmax",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        .limit(1)
        .select(col("o_orderkey").as("watermark_orderkey"),
          to_date(col("o_orderdate")).as("watermark_date")),
      Some("""
        SELECT o_orderkey AS watermark_orderkey,
               CAST(o_orderdate AS DATE) AS watermark_date
        FROM orders WHERE o_orderstatus = 'F'
        ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1"""),
      "latest-successful-run lookup (Pembelian/run.js:41-50)"),

    // ── S2/P1/P2: incremental scan with projection/aliases ──
    QuerySpec("q03_incremental_scan",
      (s, dir) => relational.incrementalScan(
          t(s, dir, "lineitem"), col("l_shipdate"),
          lit("2000-06-01").cast("timestamp"))
        .select(col("l_orderkey").as("order_id"),
          col("l_linenumber").as("line_no"),
          col("l_quantity").as("qty"),
          to_date(col("l_shipdate")).as("ship_date")),
      Some("""
        SELECT l_orderkey AS order_id, l_linenumber AS line_no,
               l_quantity AS qty, CAST(l_shipdate AS DATE) AS ship_date
        FROM lineitem
        WHERE l_shipdate > TIMESTAMP '2000-06-01 00:00:00'"""),
      "watermark predicate scan (Pembelian/run.js:120-170)"),

    // ── P4: NOT-IN literal filter ──
    QuerySpec("q04_notin_filter",
      (s, dir) => relational.notInKeepNulls(t(s, dir, "orders"),
          col("o_orderpriority"), Seq("1-URGENT", "2-HIGH"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n")),
      Some("""
        SELECT o_orderstatus, count(*) AS n
        FROM orders
        WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        GROUP BY o_orderstatus"""),
      "test-user exclusion filter (Pembelian/run.js:166-167)"),

    // ── J1: multiway equi-join chain (document chain analog) ──
    QuerySpec("q05_join_chain",
      (s, dir) => {
        val l = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
        val c = t(s, dir, "customer"); val sup = t(s, dir, "supplier")
        val n = t(s, dir, "nation"); val r = t(s, dir, "region")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .groupBy(col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"), count(lit(1)).as("n_rows"))
      },
      Some("""
        SELECT n_name,
          CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
          count(*) AS n_rows
        FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
          JOIN nation   ON c_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name"""),
      "multi-table join chain (Pembelian/run.js:165); dims broadcast"),

    // ── J4/S3: broadcast dimension join — deliberately hint-free: the
    // dim fits the auto-broadcast threshold, so AQE picks the broadcast
    // (asserted in PlanSpec), and the same plan degrades gracefully to a
    // shuffle join if the dim ever outgrows executor memory ──
    QuerySpec("q06_broadcast_dim",
      (s, dir) => t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("n_lines")),
      Some("""
        SELECT p_brand,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
          count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand"""),
      "small-dim broadcast hash join (Pembelian/run.js:191-195)"),

    // ── J6: keep-first-match left join ──
    QuerySpec("q07_keepfirst_join",
      (s, dir) => {
        val c = t(s, dir, "customer").select(col("c_custkey"))
        val o = t(s, dir, "orders").select(
          col("o_custkey").as("c_custkey"),
          col("o_orderkey"), col("o_orderdate"))
        relational.keepFirstMatch(c, o, Seq("c_custkey"),
            Seq(col("o_orderdate").asc, col("o_orderkey").asc))
          .select(col("c_custkey"),
            col("o_orderkey").as("first_order_key"),
            to_date(col("o_orderdate")).as("first_order_date"))
      },
      Some("""
        SELECT c_custkey, o.o_orderkey AS first_order_key,
               CAST(o.o_orderdate AS DATE) AS first_order_date
        FROM customer c LEFT JOIN (
          SELECT o_custkey, o_orderkey, o_orderdate,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders) o
        ON c.c_custkey = o.o_custkey AND o.rn = 1"""),
      "first-match-wins lookup (ProductionOrderStatus/run.js:101-125)"),

    // ── A2: argmax per group (Mongo $sort+$first analog) ──
    QuerySpec("q08_argmax_per_group",
      (s, dir) => relational.argmaxPerGroup(Tables.events(s, dir),
          Seq("user_id"), col("ts"), Seq(col("event_id").desc))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"),
          col("value").as("last_value")),
      Some("""
        SELECT user_id, event_id AS last_event_id,
               event_type AS last_event_type, value AS last_value
        FROM (SELECT *, row_number() OVER (
                PARTITION BY user_id
                ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
              FROM events)
        WHERE rn = 1"""),
      "latest record per group (MigrationLogFunc/index.js:32-42)"),

    // ── J8: as-of join (latest signup at-or-before each event) ──
    QuerySpec("q09_asof_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val sg = ev.filter(col("event_type") === "signup")
          .select(col("event_id").as("sg_id"), col("user_id").as("sg_user"),
            col("ts").as("sg_ts"))
        relational.asOfJoin(ev, sg, col("user_id") === col("sg_user"),
            col("ts"), col("sg_ts"), col("event_id"),
            Seq(col("sg_id").desc))
          .select(col("event_id"), col("user_id"),
            col("sg_id").as("asof_signup_id"))
      },
      Some("""
        WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                   FROM events),
        sg AS (SELECT event_id AS sg_id, user_id AS sg_user,
                      CAST(ts AS TIMESTAMP) AS sg_ts
               FROM events WHERE event_type = 'signup'),
        j AS (SELECT e.event_id, sg.sg_id,
                     row_number() OVER (PARTITION BY e.event_id
                       ORDER BY sg.sg_ts DESC, sg.sg_id DESC) AS rn
              FROM e JOIN sg ON sg.sg_user = e.user_id AND sg.sg_ts <= e.ts)
        SELECT e.event_id, e.user_id, j.sg_id AS asof_signup_id
        FROM e LEFT JOIN j ON j.event_id = e.event_id AND j.rn = 1"""),
      "point-in-time rate lookup (GarmentTotalHutang/run.js:121-133)"),

    // ── U2: union with literal discriminator ──
    QuerySpec("q10_union_discriminator",
      (s, dir) => {
        val o = t(s, dir, "orders")
        def branch(st: String, label: String) =
          o.filter(col("o_orderstatus") === st)
            .withColumn("channel", lit(label))
        branch("F", "Spinning")
          .unionByName(branch("O", "Weaving"))
          .unionByName(branch("P", "Finishing Printing"))
          .groupBy(col("channel"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total_value"))
      },
      Some("""
        SELECT channel, count(*) AS n,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM (
          SELECT 'Spinning' AS channel, o_totalprice FROM orders WHERE o_orderstatus = 'F'
          UNION ALL
          SELECT 'Weaving', o_totalprice FROM orders WHERE o_orderstatus = 'O'
          UNION ALL
          SELECT 'Finishing Printing', o_totalprice FROM orders WHERE o_orderstatus = 'P')
        GROUP BY channel"""),
      "three-stream union into one fact (SpinningSC/WeavingSC/FP-SC)"),

    // ── U3: explode/flatten ──
    QuerySpec("q11_explode_tokens",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("doc_id")).as("n_docs")),
      Some("""
        SELECT token, count(*) AS n_occurrences,
               count(DISTINCT doc_id) AS n_docs
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents)
        WHERE token <> ''
        GROUP BY token"""),
      "nested flatten (Pembelian/run.js:282) as explode + agg"),

    // ── C1/C2/D2: lead-time bucketing ──
    QuerySpec("q12_leadtime_buckets",
      (s, dir) => {
        val days = datediff(lit("1998-12-01").cast("date"),
          to_date(col("o_orderdate")))
        t(s, dir, "orders")
          .select(business.monthBucket(days).as("month_bucket"),
            business.weekBucket(days).as("week_bucket"))
          .groupBy(col("month_bucket"), col("week_bucket"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""
        SELECT
          CASE WHEN days <= 30 THEN '0-30 hari' WHEN days <= 60 THEN '31-60 hari'
               WHEN days <= 90 THEN '61-90 hari' ELSE '>90 hari' END AS month_bucket,
          CASE WHEN days <= 7 THEN '0-7 hari' WHEN days <= 14 THEN '8-14 hari'
               WHEN days <= 30 THEN '15-30 hari' ELSE '>30 hari' END AS week_bucket,
          count(*) AS n
        FROM (SELECT datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS days
              FROM orders)
        GROUP BY 1, 2"""),
      "day-count bucketing (Pembelian/run.js:65-87)"),

    // ── M2/T4: UOM conversion ──
    QuerySpec("q13_uom_conversion",
      (s, dir) => {
        val uom = when(col("l_returnflag") === "R", "YDS").otherwise("MTR")
        t(s, dir, "lineitem")
          .select(col("l_returnflag"),
            business.orderQtyConversion(uom, col("l_quantity")).as("qty_m"))
          .groupBy(col("l_returnflag"))
          .agg(dsum(col("qty_m")).as("sum_qty_m"), count(lit(1)).as("n"))
      },
      Some("""
        SELECT l_returnflag,
          CAST(sum(CAST(
            CASE WHEN lower(CASE WHEN l_returnflag = 'R' THEN 'YDS' ELSE 'MTR' END)
                   IN ('yard', 'yds')
                 THEN l_quantity * CAST(0.9144 AS DOUBLE) ELSE l_quantity END
            AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty_m,
          count(*) AS n
        FROM lineitem GROUP BY l_returnflag"""),
      "yard→metre conversion (ProductionOrder/run.js:97-105)"),

    // ── C5/D2: on-time status ──
    QuerySpec("q14_ontime_status",
      (s, dir) => {
        val j = t(s, dir, "lineitem").join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        j.select(business.onTimeStatus(col("l_shipdate"),
            date_add(to_date(col("o_orderdate")), 90).cast("timestamp"))
            .as("delivery_status"))
          .groupBy(col("delivery_status"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""
        SELECT CASE WHEN datediff('day', CAST(o_orderdate AS DATE) + 90,
                                  CAST(l_shipdate AS DATE)) <= 0
                    THEN 'Tepat Waktu' ELSE 'Tidak Tepat Waktu' END AS delivery_status,
               count(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1"""),
      "on-time bucket (Pembelian/run.js:97-106), 90-day promise window"),

    // ── window: running total per partition ──
    QuerySpec("q15_running_total",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(18,4)")).over(w)
            .cast("double").as("running_spend"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
            AS running_spend
        FROM orders"""),
      "running aggregation window (SURVEY §2.5)"),

    // ── O1: deterministic top-k ──
    QuerySpec("q16_topk_customers",
      (s, dir) => t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("spend"))
        .orderBy(col("spend").desc, col("o_custkey").asc)
        .limit(10)
        .select(col("o_custkey"), col("spend").cast("double").as("total_spend")),
      Some("""
        SELECT o_custkey,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
        FROM orders GROUP BY o_custkey
        ORDER BY sum(CAST(o_totalprice AS DECIMAL(18,4))) DESC, o_custkey
        LIMIT 10"""),
      "top-k with exact-decimal ordering (SURVEY §2.6)"),

    // ── D5 + ROLLUP: month formatting with subtotals ──
    QuerySpec("q17_monthly_rollup",
      (s, dir) => t(s, dir, "orders")
        .rollup(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"),
          col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total_value")),
      Some("""
        SELECT strftime(o_orderdate, '%Y-%m') AS order_month, o_orderstatus,
               count(*) AS n,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM orders
        GROUP BY ROLLUP (strftime(o_orderdate, '%Y-%m'), o_orderstatus)"""),
      "date_format + rollup subtotals (SURVEY §2.8 D5, §2.4)"),

    // ── D6: min-date repair ──
    QuerySpec("q18_validate_date",
      (s, dir) => {
        val dd = when(pmod(col("o_orderkey"), lit(100)) === 0,
            make_date(lit(1700), month(col("o_orderdate")), lit(15)))
          .otherwise(to_date(col("o_orderdate")))
        val fixed = business.validDate(dd.cast("timestamp"), lit(2020))
          .cast("date")
        t(s, dir, "orders")
          .select(year(fixed).as("y"), month(fixed).as("m"))
          .groupBy(col("y"), col("m"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""
        WITH d AS (
          SELECT CASE WHEN o_orderkey % 100 = 0
                      THEN make_date(1700, CAST(month(o_orderdate) AS INTEGER), 15)
                      ELSE CAST(o_orderdate AS DATE) END AS dd
          FROM orders),
        r AS (SELECT CASE WHEN dd < DATE '1753-01-01'
                          THEN make_date(2020, CAST(month(dd) AS INTEGER),
                                         CAST(day(dd) AS INTEGER))
                          ELSE dd END AS fixed FROM d)
        SELECT CAST(year(fixed) AS INTEGER) AS y,
               CAST(month(fixed) AS INTEGER) AS m, count(*) AS n
        FROM r GROUP BY 1, 2"""),
      "SQL Server 1753 date-floor repair (Pembelian/run.js:108-118)"),

    // ── A4: weighted score with null-as-zero semantics ──
    QuerySpec("q19_weighted_scores",
      (s, dir) => {
        val per = t(s, dir, "lineitem").groupBy(col("l_orderkey")).agg(
          sum(when(col("l_quantity") < 15, 1).otherwise(0)).as("a"),
          sum(when(col("l_quantity") >= 15 && col("l_quantity") < 30, 1)
            .otherwise(0)).as("b"),
          sum(when(col("l_quantity") >= 30 && col("l_quantity") < 45, 1)
            .otherwise(0)).as("c"),
          sum(when(col("l_quantity") >= 45, 1).otherwise(0)).as("d"))
        per.select(business.weightedScore(col("a"), col("b"), col("c"),
            col("d")).as("score"))
          .groupBy(col("score"))
          .agg(count(lit(1)).as("n_orders"))
      },
      Some("""
        WITH per AS (
          SELECT l_orderkey,
            CAST(sum(CASE WHEN l_quantity < 15 THEN 1 ELSE 0 END) AS BIGINT) AS a,
            CAST(sum(CASE WHEN l_quantity >= 15 AND l_quantity < 30 THEN 1 ELSE 0 END) AS BIGINT) AS b,
            CAST(sum(CASE WHEN l_quantity >= 30 AND l_quantity < 45 THEN 1 ELSE 0 END) AS BIGINT) AS c,
            CAST(sum(CASE WHEN l_quantity >= 45 THEN 1 ELSE 0 END) AS BIGINT) AS d
          FROM lineitem GROUP BY l_orderkey)
        SELECT CAST(a*1 + b*3 + c*5 + d*10 AS BIGINT) AS score,
               count(*) AS n_orders
        FROM per GROUP BY 1"""),
      "weighted QC score A·1+B·3+C·5+D·10 (FabricQC/run.js:120-124)"),

    // ── left-semi join ──
    QuerySpec("q20_semi_join",
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "lineitem").filter(col("l_quantity") >= 49),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderstatus")),
      Some("""
        SELECT o_orderkey, o_orderstatus FROM orders
        WHERE o_orderkey IN
          (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)"""),
      "IN-list semi-join pushdown (GarmentPembelian/run.js:303-331)"),

    // ── left-anti join ──
    QuerySpec("q21_anti_join",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name")),
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')"""),
      "customers with no urgent orders (anti-join; SURVEY §2.3)"),

    // ── distinct aggregate ──
    QuerySpec("q22_count_distinct",
      (s, dir) => t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
          count(lit(1)).as("n_lines")),
      Some("""
        SELECT p_brand, count(DISTINCT l_suppkey) AS n_suppliers,
               count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand"""),
      "distinct aggregate (engine surface beyond reference's in-app set)"),

    // ── sessionization (gap-based) over the event stream table ──
    QuerySpec("q23_sessionize",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
          .withColumn("prev_us", lag(col("us"), 1).over(w))
          .withColumn("is_new",
            when(col("prev_us").isNull ||
              col("us") - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
          .groupBy(col("user_id"))
          .agg(sum(col("is_new")).cast("long").as("n_sessions"),
            count(lit(1)).as("n_events"))
      },
      Some("""
        WITH e AS (SELECT user_id, event_id,
                          epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        g AS (SELECT user_id,
                CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                     THEN 1 ELSE 0 END AS is_new
              FROM (SELECT user_id, us, lag(us) OVER (
                      PARTITION BY user_id ORDER BY us, event_id) AS prev_us
                    FROM e))
        SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM g GROUP BY user_id"""),
      "30-min-gap sessionization — micro-batch analog of stream sessions"),

    // ── tumbling-window aggregation over events ──
    QuerySpec("q24_hourly_events",
      (s, dir) => Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value")),
      Some("""
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
               event_type, count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2"""),
      "tumbling event-time window (batch twin of the streaming agg)"),

    // ── S9: derived calendar dimension ──
    QuerySpec("q25_calendar_dim",
      (s, dir) => t(s, dir, "orders")
        .agg(min(to_date(col("o_orderdate"))).as("mn"),
          max(to_date(col("o_orderdate"))).as("mx"))
        .select(explode(sequence(col("mn"), col("mx"))).as("cal_date"))
        .select(col("cal_date"),
          year(col("cal_date")).as("y"), month(col("cal_date")).as("m"),
          dayofmonth(col("cal_date")).as("d"),
          (weekday(col("cal_date")) + 1).as("dow")),
      Some("""
        WITH mm AS (SELECT CAST(min(o_orderdate) AS DATE) AS mn,
                           CAST(max(o_orderdate) AS DATE) AS mx FROM orders)
        SELECT CAST(g AS DATE) AS cal_date,
               CAST(year(g) AS INTEGER) AS y, CAST(month(g) AS INTEGER) AS m,
               CAST(day(g) AS INTEGER) AS d, CAST(isodow(g) AS INTEGER) AS dow
        FROM (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS g
              FROM mm)"""),
      "DIMTIME maintenance (Pembelian/run.js:331-333) as derived dim")
  )
}
