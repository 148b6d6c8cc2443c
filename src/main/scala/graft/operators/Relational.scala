package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions.Exact
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The relational query inventory Q1-Q20 from SURVEY.md §2C.
  *
  * Each entry is a declarative DataFrame plan (Catalyst handles pushdown,
  * pruning, join selection, AQE) paired with the ANSI-SQL oracle DuckDB
  * runs over the same parquet files. Column names/aliases are identical on
  * both sides — the driver sorts columns by name before hashing.
  *
  * Determinism rules applied throughout (so results hash-match for ANY
  * partitioning, i.e. stay stable at 1000 executors):
  *  - float SUM/AVG go through [[Exact.dsum]]/[[Exact.davg]] (exact
  *    DECIMAL accumulation, order-insensitive);
  *  - every window/top-k ordering carries a unique tiebreaker key;
  *  - per-row double arithmetic (no reduction) is IEEE-deterministic as-is.
  *
  * Reference semantics covered here: the republish projection
  * `numPublishes + 1` (reference util/PulsarClientSetup.scala:17) as Q2,
  * workload set-diff EXCEPT semantics
  * (reference part4/WorkloadManagementService.scala:46-48) as Q16.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Q1 — full scan with count/min/max over lineitem. */
  val q1Scan: QuerySpec = QuerySpec(
    "q1_scan",
    (s, dir) =>
      t(s, dir, "lineitem").agg(
        count(lit(1)).as("cnt"),
        min("l_shipdate").cast("timestamp_ntz").as("min_ship"),
        max("l_shipdate").cast("timestamp_ntz").as("max_ship")),
    Some("""SELECT COUNT(*) AS cnt, MIN(l_shipdate) AS min_ship,
           | MAX(l_shipdate) AS max_ship FROM lineitem""".stripMargin.replaceAll("\n", "")))

  /** Q2 — republish projection: the reference's `numPublishes + 1` hop
    * (reference util/PulsarClientSetup.scala:17) expressed over the events
    * table viewed as a keyed payload stream.
    */
  val q2Republish: QuerySpec = QuerySpec(
    "q2_republish",
    (s, dir) =>
      t(s, dir, "events").select(
        col("event_type").as("name"),
        col("user_id").cast("string").as("key"),
        ((col("event_id") % 10).cast("int") + 1).as("num_publishes")),
    Some("""SELECT event_type AS name, CAST(user_id AS VARCHAR) AS key,
           | CAST(event_id % 10 AS INT) + 1 AS num_publishes FROM events""".stripMargin.replaceAll("\n", "")))

  /** Q3 — filter + projection with arithmetic (pushdown-friendly). */
  val q3FilterProject: QuerySpec = QuerySpec(
    "q3_filter_project",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
          && col("l_quantity") > 30)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue")),
    Some("""SELECT l_orderkey, l_linenumber,
           | l_extendedprice * (1.0 - l_discount) AS revenue FROM lineitem
           | WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' AND l_quantity > 30""".stripMargin.replaceAll("\n", "")))

  /** Q4 — 3-way equi join, TPC-H Q3 shape. customer/orders/lineitem all
    * scale with data size, so these stay shuffle joins (sort-merge/hash via
    * AQE); only fixed-size dims are broadcast (Q5).
    */
  val q4Join3: QuerySpec = QuerySpec(
    "q4_join3",
    (s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate").cast("timestamp_ntz").as("o_orderdate"))
        .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    },
    Some(s"""SELECT o_orderkey, o_orderdate,
            | ${Exact.dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
            | FROM customer JOIN orders ON c_custkey = o_custkey
            | JOIN lineitem ON l_orderkey = o_orderkey
            | WHERE c_mktsegment = 'BUILDING'
            | GROUP BY o_orderkey, o_orderdate""".stripMargin.replaceAll("\n", "")))

  /** Q5 — broadcast join of the two fixed-size dims (region: 5 rows,
    * nation: 25 rows — constant at any scale factor, so broadcast is
    * always correct here).
    */
  val q5BroadcastJoin: QuerySpec = QuerySpec(
    "q5_broadcast_join",
    (s, dir) =>
      t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name")),
    Some("""SELECT n_nationkey, n_name, r_name FROM nation
           | JOIN region ON n_regionkey = r_regionkey""".stripMargin.replaceAll("\n", "")))

  /** Q6 — left outer join + count (customers with zero orders get 0). */
  val q6LeftOuter: QuerySpec = QuerySpec(
    "q6_left_outer",
    (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("num_orders")),
    Some("""SELECT c_custkey, c_name, COUNT(o_orderkey) AS num_orders
           | FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           | GROUP BY c_custkey, c_name""".stripMargin.replaceAll("\n", "")))

  /** Q7 — left semi + left anti joins (EXISTS / NOT EXISTS). */
  val q7SemiAnti: QuerySpec = QuerySpec(
    "q7_semi_anti",
    (s, dir) => {
      val sup = t(s, dir, "supplier")
      val li = t(s, dir, "lineitem")
      val has = sup.join(li, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), lit("has").as("tag"))
      val none = sup.join(li, col("s_suppkey") === col("l_suppkey"), "left_anti")
        .select(col("s_suppkey"), lit("none").as("tag"))
      has.unionAll(none)
    },
    Some("""SELECT s_suppkey, 'has' AS tag FROM supplier
           | WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
           | UNION ALL
           | SELECT s_suppkey, 'none' AS tag FROM supplier
           | WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)""".stripMargin.replaceAll("\n", "")))

  /** Q8 — range self-join on events, implemented scale-first: instead of a
    * theta join (cartesian per user), each left row is exploded into its
    * two candidate 5-minute time buckets and the join is a pure EQUI join
    * on (user_id, bucket) — shuffle-partitionable, no per-key quadratic
    * blowup beyond the genuine range matches. The exact range predicate is
    * applied post-join.
    */
  val q8RangeJoin: QuerySpec = QuerySpec(
    "q8_range_join",
    (s, dir) => {
      val e = t(s, dir, "events")
      val left = e.select(
          col("user_id"), col("ts").as("ts1"),
          floor(unix_timestamp(col("ts")) / 300).as("b1"))
        .withColumn("bucket", explode(array(col("b1"), col("b1") + 1)))
      val right = e.select(
        col("user_id").as("r_user_id"), col("ts").as("ts2"),
        floor(unix_timestamp(col("ts")) / 300).as("bucket2"))
      left.join(right,
          col("user_id") === col("r_user_id") && col("bucket") === col("bucket2"))
        .filter(col("ts2") > col("ts1")
          && col("ts2") <= col("ts1") + expr("INTERVAL 5 MINUTES"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("pair_cnt"))
    },
    Some("""SELECT a.user_id AS user_id, COUNT(*) AS pair_cnt
           | FROM events a JOIN events b ON a.user_id = b.user_id
           | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
           | GROUP BY a.user_id""".stripMargin.replaceAll("\n", "")))

  /** Q9 — hash aggregate, TPC-H Q1 shape (the flagship query). */
  val q9Agg: QuerySpec = QuerySpec(
    "q9_agg",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Exact.dsum(col("l_quantity")).as("sum_qty"),
          Exact.dsum(col("l_extendedprice")).as("sum_base"),
          Exact.davg(col("l_extendedprice")).as("avg_price"),
          Exact.davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("cnt")),
    Some(s"""SELECT l_returnflag, l_linestatus,
            | ${Exact.dsumSql("l_quantity")} AS sum_qty,
            | ${Exact.dsumSql("l_extendedprice")} AS sum_base,
            | ${Exact.davgSql("l_extendedprice")} AS avg_price,
            | ${Exact.davgSql("l_discount")} AS avg_disc,
            | COUNT(*) AS cnt
            | FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin.replaceAll("\n", "")))

  /** Q10 — exact COUNT(DISTINCT). */
  val q10Distinct: QuerySpec = QuerySpec(
    "q10_distinct",
    (s, dir) =>
      t(s, dir, "events").agg(countDistinct(col("user_id")).as("uniq_users")),
    Some("SELECT COUNT(DISTINCT user_id) AS uniq_users FROM events"))

  /** Q11 — approx_count_distinct (HLL). The sketch value itself is
    * engine-specific, so the gated result is the exact count plus a
    * tolerance verdict: |approx - exact| <= 10% * exact must hold.
    */
  val q11ApproxDistinct: QuerySpec = QuerySpec(
    "q11_approx_distinct",
    (s, dir) =>
      t(s, dir, "events")
        .agg(
          countDistinct(col("user_id")).as("exact_cnt"),
          approx_count_distinct(col("user_id")).as("approx"))
        .select(
          col("exact_cnt"),
          (abs(col("approx") - col("exact_cnt")) <= col("exact_cnt") * 0.1).as("acd_ok")),
    Some("SELECT COUNT(DISTINCT user_id) AS exact_cnt, TRUE AS acd_ok FROM events"))

  /** Q12 — ROLLUP grouping sets over events. */
  val q12Rollup: QuerySpec = QuerySpec(
    "q12_rollup",
    (s, dir) =>
      t(s, dir, "events")
        .withColumn("day", date_trunc("day", col("ts")).cast("timestamp_ntz"))
        .rollup(col("event_type"), col("day"))
        .agg(count(lit(1)).as("cnt"), Exact.dsum(col("value")).as("sum_value")),
    Some(s"""SELECT event_type, day, COUNT(*) AS cnt,
            | ${Exact.dsumSql("value")} AS sum_value
            | FROM (SELECT event_type, date_trunc('day', ts) AS day, value FROM events)
            | GROUP BY ROLLUP(event_type, day)""".stripMargin.replaceAll("\n", "")))

  /** Q13 — ROW_NUMBER ranking: latest 3 orders per customer. Ordering
    * carries o_orderkey as unique tiebreaker so ranks are deterministic.
    */
  val q13RowNumber: QuerySpec = QuerySpec(
    "q13_row_number",
    (s, dir) =>
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_orderdate").desc, col("o_orderkey"))).cast(LongType))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("timestamp_ntz").as("o_orderdate"), col("rn")),
    Some("""SELECT o_custkey, o_orderkey, o_orderdate, rn FROM (
           | SELECT o_custkey, o_orderkey, o_orderdate,
           | ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey) AS rn
           | FROM orders) WHERE rn <= 3""".stripMargin.replaceAll("\n", "")))

  /** Q14 — frame-bounded running SUM (ROWS BETWEEN 2 PRECEDING AND
    * CURRENT ROW), exact-decimal accumulation, unique tiebreaker.
    */
  val q14WindowFrame: QuerySpec = QuerySpec(
    "q14_window_frame",
    (s, dir) =>
      t(s, dir, "events")
        .withColumn("run_sum", Exact.dsumOver(col("value"),
          Window.partitionBy(col("user_id"))
            .orderBy(col("ts"), col("event_id"))
            .rowsBetween(-2, Window.currentRow)))
        .select(col("event_id"), col("user_id"), col("value"), col("run_sum")),
    Some("""SELECT event_id, user_id, value,
           | CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
           |   PARTITION BY user_id ORDER BY ts, event_id
           |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum
           | FROM events""".stripMargin.replaceAll("\n", "")))

  /** Q15 — ORDER BY + LIMIT top-k (Spark plans this as TakeOrderedAndProject:
    * per-partition top-k then a k-row merge on the driver — no global sort).
    */
  val q15TopK: QuerySpec = QuerySpec(
    "q15_topk",
    (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .limit(10),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
           | ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin.replaceAll("\n", "")))

  /** Q16 — EXCEPT: the workload manager's desired-vs-running set diff
    * (reference part4/WorkloadManagementService.scala:46-48) as a
    * relational operator: customers that never ordered.
    */
  val q16Except: QuerySpec = QuerySpec(
    "q16_except",
    (s, dir) =>
      t(s, dir, "customer").select(col("c_custkey").as("custkey"))
        .except(t(s, dir, "orders").select(col("o_custkey").as("custkey"))),
    Some("""SELECT c_custkey AS custkey FROM customer
           | EXCEPT SELECT o_custkey AS custkey FROM orders""".stripMargin.replaceAll("\n", "")))

  /** Q17 — UNION ALL + INTERSECT over event partitions. */
  val q17UnionIntersect: QuerySpec = QuerySpec(
    "q17_union_intersect",
    (s, dir) => {
      val e = t(s, dir, "events")
      val clicksViews = e.filter(col("event_type") === "click").select(col("user_id"))
        .unionAll(e.filter(col("event_type") === "view").select(col("user_id")))
      clicksViews.intersect(
        e.filter(col("event_type") === "purchase").select(col("user_id")))
    },
    Some("""SELECT user_id FROM (
           | SELECT user_id FROM events WHERE event_type = 'click'
           | UNION ALL
           | SELECT user_id FROM events WHERE event_type = 'view')
           | INTERSECT
           | SELECT user_id FROM events WHERE event_type = 'purchase'""".stripMargin.replaceAll("\n", "")))

  /** Q18 — JSON decode + regexp + date functions (references F1-F4:
    * JSON codec util/PulsarClientSetup.scala:21-29, topic normalization
    * part3/LimitedMessageProcessor.scala:75). The engine parses with
    * from_json; the oracle extracts the same value with a regexp so it
    * never depends on JSON formatting.
    */
  val q18JsonFns: QuerySpec = QuerySpec(
    "q18_json_fns",
    (s, dir) =>
      t(s, dir, "events").select(
        col("event_id"),
        from_json(col("props"), lit("k INT")).getField("k").as("k"),
        regexp_replace(col("event_type"), "^err", "warn").as("etype"),
        date_trunc("day", col("ts")).cast("timestamp_ntz").as("day")),
    Some("""SELECT event_id, CAST(regexp_extract(props, '[0-9]+') AS INT) AS k,
           | regexp_replace(event_type, '^err', 'warn') AS etype,
           | date_trunc('day', ts) AS day FROM events""".stripMargin.replaceAll("\n", "")))

  /** Q39 — ordered-statistics aggregate: exact interpolated percentiles
    * computed DISTRIBUTIVELY, plus the sketch path (`approx_percentile`,
    * t-digest-style, mergeable map-side) gated as a tolerance verdict
    * like Q11.
    *
    * Spark's builtin `percentile` is a holistic aggregate — with 3 groups
    * it sort-buffers ~N/3 raw values in each of 3 reducers, which does
    * not survive 100× scale. This plan replaces it with a per-group
    * compressed histogram: one hash-aggregate to (group, value) → count
    * rows (map-side combinable, shuffled on the composite key), a
    * cumulative-count window whose per-group input is |distinct values|
    * histogram buckets rather than |rows| raw values, and a conditional
    * aggregate that picks the bracketing order statistics by cumulative
    * rank. The interpolation reproduces Spark `percentile`'s exact
    * double arithmetic — position = (n−1)·p on rank-k values k =
    * floor/ceil(position), result = (ceil−pos)·v_lo + (pos−floor)·v_hi —
    * which round 2 verified matches DuckDB `quantile_cont` bitwise.
    */
  val q39Percentiles: QuerySpec = QuerySpec(
    "q39_percentiles",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      // per-group compressed histogram (the mergeable exact-percentile
      // state); NULL values are excluded up front — `percentile` and
      // DuckDB `quantile_cont` both ignore NULLs, and an unfiltered NULL
      // bucket would inflate n and every cumulative rank
      val hist = li.filter(col("l_extendedprice").isNotNull)
        .groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(count(lit(1)).as("cnt"))
      // cumulative + total counts over histogram buckets; the orderBy key
      // is unique within a group (already merged), so the default RANGE
      // frame equals ROWS and the cumsum is deterministic
      val cum = hist
        .withColumn("cum", sum(col("cnt"))
          .over(Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))))
        .withColumn("n", sum(col("cnt"))
          .over(Window.partitionBy(col("l_returnflag"))))
      // 0-based interpolation position; v at 0-based rank k is the
      // smallest value whose cumulative count exceeds k
      def pos(p: Double): Column = (col("n") - 1).cast("double") * lit(p)
      def keyAt(rank0: Column): Column =
        min(when(col("cum") > rank0, col("l_extendedprice")))
      val exact = cum.groupBy(col("l_returnflag")).agg(
        max(col("n")).as("n"),
        keyAt(floor(pos(0.5))).as("lo50"), keyAt(ceil(pos(0.5))).as("hi50"),
        keyAt(floor(pos(0.95))).as("lo95"), keyAt(ceil(pos(0.95))).as("hi95"))
      def interp(p: Double, lo: Column, hi: Column): Column = {
        val position = (col("n") - 1).cast("double") * lit(p)
        when(ceil(position) === floor(position), lo)
          .otherwise((ceil(position).cast("double") - position) * lo +
            (position - floor(position).cast("double")) * hi)
      }
      // sketch path: mergeable approx aggregate straight off the raw rows;
      // 3-row broadcast join back onto the exact results
      val apx = li.groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("ap50"))
      exact.join(broadcast(apx), Seq("l_returnflag"))
        .select(col("l_returnflag"),
          interp(0.5, col("lo50"), col("hi50")).as("p50"),
          interp(0.95, col("lo95"), col("hi95")).as("p95"),
          col("ap50"))
        .select(col("l_returnflag"), col("p50"), col("p95"),
          (abs(col("ap50") - col("p50")) <= col("p50") * 0.05).as("apx_ok"))
    },
    Some("""SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS p50,
           | quantile_cont(l_extendedprice, 0.95) AS p95, TRUE AS apx_ok
           | FROM lineitem GROUP BY l_returnflag""".stripMargin.replaceAll("\n", "")))

  /** Q40 — pivot (wide conditional aggregation). The pivot values are
    * DECLARED, not discovered — at 100 TB a `pivot(col)` without explicit
    * values costs an extra full distinct scan and an unbounded column
    * count; declaring them keeps the plan a single pass.
    */
  val q40Pivot: QuerySpec = QuerySpec(
    "q40_pivot",
    (s, dir) => {
      val types = Seq("click", "view", "purchase", "signup", "error")
      val wide = t(s, dir, "events")
        .withColumn("day", date_trunc("day", col("ts")).cast("timestamp_ntz"))
        .groupBy(col("day"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      // absent (day, type) combos: pivot yields NULL, the conditional-agg
      // oracle yields 0 — normalize to 0
      wide.select(col("day") +: types.map(tp => coalesce(col(tp), lit(0L)).as(tp)): _*)
    },
    Some("""SELECT date_trunc('day', ts) AS day,
           | COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           | COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
           | COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           | COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           | COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
           | FROM events GROUP BY 1""".stripMargin.replaceAll("\n", "")))

  /** Q42 — scalar function surface: date, string, math and conditional
    * functions in one map-side pass. Functions are chosen to be exactly
    * cross-engine: integer date arithmetic, IEEE-exact math (sqrt yes,
    * exp/ln no — libm results differ), 1-based string positions in both
    * engines.
    */
  val q42ScalarFns: QuerySpec = QuerySpec(
    "q42_scalar_fns",
    (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
        datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_end"),
        upper(col("o_orderpriority")).as("prio_upper"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        lpad(col("o_orderkey").cast("string"), 12, "0").as("key_padded"),
        concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"),
        instr(col("o_orderpriority"), "-").cast("long").as("dash_pos"),
        reverse(col("o_orderstatus")).as("status_rev"),
        floor(col("o_totalprice")).cast("long").as("floor_price"),
        ceil(col("o_totalprice")).cast("long").as("ceil_price"),
        sqrt(col("o_totalprice")).as("sqrt_price"),
        greatest(col("o_totalprice"), lit(50000.0)).as("price_floor50k"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_or")),
    Some("""SELECT o_orderkey,
           | CAST(year(o_orderdate) AS BIGINT) AS yr,
           | CAST(month(o_orderdate) AS BIGINT) AS mo,
           | CAST(day(o_orderdate) AS BIGINT) AS dom,
           | CAST(o_orderdate AS DATE) + 30 AS due_date,
           | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT) AS days_to_end,
           | upper(o_orderpriority) AS prio_upper,
           | substring(o_orderpriority, 1, 1) AS prio_code,
           | lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS key_padded,
           | concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
           | CAST(strpos(o_orderpriority, '-') AS BIGINT) AS dash_pos,
           | reverse(o_orderstatus) AS status_rev,
           | CAST(floor(o_totalprice) AS BIGINT) AS floor_price,
           | CAST(ceil(o_totalprice) AS BIGINT) AS ceil_price,
           | sqrt(o_totalprice) AS sqrt_price,
           | greatest(o_totalprice, 50000.0) AS price_floor50k,
           | coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or
           | FROM orders""".stripMargin.replaceAll("\n", "")))

  /** Q20 — tumbling-window event-time aggregation (batch-equivalent of the
    * streaming windowed agg; the streaming variant with watermark lives in
    * graft.streaming and is invariant-tested).
    */
  val q20TumblingWindow: QuerySpec = QuerySpec(
    "q20_tumbling_window",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), Exact.dsum(col("value")).as("sum_value"))
        .select(
          col("window.start").cast("timestamp_ntz").as("window_start"),
          col("event_type"), col("cnt"), col("sum_value")),
    Some(s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
            | COUNT(*) AS cnt, ${Exact.dsumSql("value")} AS sum_value
            | FROM events GROUP BY 1, 2""".stripMargin.replaceAll("\n", "")))

  /** q57 — FULL OUTER join with unmatched rows on BOTH sides: rich
    * customers against urgent-order counts. Each side's filter leaves
    * keys the other side lacks, so the null-extension is exercised in
    * both directions; the join key is COALESCEd into one output column.
    * Shuffle SMJ on the key — both sides scale with data, correctly not
    * broadcast.
    */
  val q57FullOuter: QuerySpec = QuerySpec(
    "q57_full_outer",
    (s, dir) => {
      val rich = t(s, dir, "customer")
        .filter(col("c_acctbal") > 5000)
        .select(col("c_custkey"), col("c_acctbal"))
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_urgent"))
      rich.join(urgent, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_acctbal"), col("n_urgent"))
    },
    Some("""SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_acctbal, n_urgent
           | FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000) r
           | FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS n_urgent FROM orders
           |   WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) u
           | ON c_custkey = o_custkey""".stripMargin.replaceAll("\n", "")))

  /** q58 — CUBE: all 2^2 grouping combinations over (lang, source) in
    * one pass (q12 covers ROLLUP's prefix lattice; CUBE is the full
    * lattice). Same partial-aggregate expansion, one shuffle.
    */
  val q58Cube: QuerySpec = QuerySpec(
    "q58_cube",
    (s, dir) =>
      t(s, dir, "documents")
        .cube(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars")),
    Some("""SELECT lang, source, COUNT(*) AS n_docs,
           | CAST(SUM(n_chars) AS BIGINT) AS sum_chars
           | FROM documents GROUP BY CUBE(lang, source)""".stripMargin
      .replaceAll("\n", "")))

  /** q63 — exact Pearson correlation per group (n_chars vs whitespace
    * tokens, by lang): the five moment sums (n, Σx, Σy, Σxy, Σx², Σy²)
    * are INTEGER aggregates (both variables are integers), so the
    * partial-aggregated shuffle is order-insensitive and bit-exact; the
    * only floating-point steps are the final two sqrts and one divide of
    * a fixed parenthesization — identical IEEE results on both engines
    * (a naive corr() over doubles would be partition-order dependent).
    * BIGINT moments hold to ~10^9 rows × 10^4 magnitudes; past that the
    * sums graduate to DECIMAL(38) (DuckDB's HUGEINT does this
    * automatically — hence the oracle's explicit BIGINT casts).
    */
  val q63Correlation: QuerySpec = QuerySpec(
    "q63_correlation",
    (s, dir) => {
      val x = col("n_chars")
      val y = size(split(col("text"), " ")).cast("long")
      t(s, dir, "documents")
        .select(col("lang"), x.as("x"), y.as("y"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("lang"), col("n"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
              sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
            .as("pearson_r"))
    },
    Some("""WITH m AS (SELECT lang, COUNT(*) AS n,
           |  CAST(SUM(n_chars) AS BIGINT) AS sx,
           |  CAST(SUM(y) AS BIGINT) AS sy,
           |  CAST(SUM(n_chars * y) AS BIGINT) AS sxy,
           |  CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx,
           |  CAST(SUM(y * y) AS BIGINT) AS syy
           | FROM (SELECT lang, n_chars,
           |   CAST(len(string_split(text, ' ')) AS BIGINT) AS y FROM documents)
           | GROUP BY lang)
           | SELECT lang, n,
           |  CAST(n * sxy - sx * sy AS DOUBLE) /
           |   (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
           |    sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS pearson_r
           | FROM m""".stripMargin.replaceAll("\n", "")))

  /** q189 — market-basket association rules over order baskets (the
    * classic co-occurrence mining operator, Agrawal & Srikant 1994):
    * for every part pair co-ordered in ≥2 baskets, support count,
    * directional confidences, and lift — all in exact e6 fixed point
    * (every quantity is a non-negative integer count, so `div` ≡
    * DuckDB `//` and the result is bit-exact, no double division).
    *
    * Scale shape: candidate pairs come ONLY from the per-basket
    * self-equi-join on l_orderkey (a<b orientation halves it), bounded
    * by basket size (≤13 distinct parts per TPC-H order → ≤78
    * pairs/basket, independent of corpus size) — never an all-pairs
    * item join. The pair rollup is a map-side-combinable hash agg; item
    * supports join back on the pair's part keys (plain equi-joins that
    * AQE broadcast-picks when the item table is small); the basket
    * total is a single-row broadcast. BIGINT products hold to ~10^12
    * baskets × e6 scaling; past that the lift numerator graduates to
    * DECIMAL(38) — the q63 moment-sum rule.
    */
  val qMarketBasket: QuerySpec = QuerySpec(
    "q189_market_basket",
    (s, dir) => {
      // (ok, pk) distinct-collapses ONCE through scratch: it feeds the
      // basket total, the item supports, and both sides of the pair
      // join — four references that would each re-run the scan+distinct
      // (the union-branch re-execution trap). An un-flush was tried in
      // r19 and REVERTED: the optimizer specializes each branch below
      // the distinct (join-key IsNotNull pushdown; the basket total
      // collapses to a raw count_distinct scan), so the subtrees are
      // not canonically equal and exchange reuse cannot dedupe them
      // (static plan: 3 lineitem scans for a 0.97× local win)
      val items = Scratch.flush(s, "q189-items", t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct())
      val nb = items.agg(count_distinct(col("ok")).as("n_baskets"))
      val cnt = items.groupBy(col("pk")).agg(count(lit(1)).as("n"))
      items.select(col("ok"), col("pk").as("a"))
        .join(items.select(col("ok"), col("pk").as("b")), Seq("ok"))
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 2)
        .join(cnt.toDF("a", "n_a"), Seq("a"))
        .join(cnt.toDF("b", "n_b"), Seq("b"))
        .crossJoin(broadcast(nb))
        .select(col("a").as("part_a"), col("b").as("part_b"),
          col("n_ab"), col("n_a"), col("n_b"),
          expr("(n_ab * 1000000) div n_a").as("conf_ab_e6"),
          expr("(n_ab * 1000000) div n_b").as("conf_ba_e6"),
          expr("(n_ab * n_baskets * 1000000) div (n_a * n_b)").as("lift_e6"))
    },
    Some("""WITH i AS MATERIALIZED (
           |   SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           | nb AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_baskets FROM i),
           | c AS MATERIALIZED (
           |   SELECT pk, CAST(COUNT(*) AS BIGINT) AS n FROM i GROUP BY pk),
           | p AS (SELECT a.pk AS a, b.pk AS b, CAST(COUNT(*) AS BIGINT) AS n_ab
           |   FROM i a JOIN i b ON a.ok = b.ok AND a.pk < b.pk
           |   GROUP BY a.pk, b.pk)
           | SELECT p.a AS part_a, p.b AS part_b, p.n_ab AS n_ab,
           |  ca.n AS n_a, cb.n AS n_b,
           |  CAST((p.n_ab * 1000000) // ca.n AS BIGINT) AS conf_ab_e6,
           |  CAST((p.n_ab * 1000000) // cb.n AS BIGINT) AS conf_ba_e6,
           |  CAST((p.n_ab * n_baskets * 1000000) // (ca.n * cb.n) AS BIGINT)
           |    AS lift_e6
           | FROM p JOIN c ca ON p.a = ca.pk JOIN c cb ON p.b = cb.pk
           | CROSS JOIN nb
           | WHERE p.n_ab >= 2""".stripMargin.replaceAll("\n", "")))

  /** Hub cap for q188's wedge centers (declared before the oracle SQL
    * that interpolates it — the object-init-order rule). Common-neighbor
    * counting fans out as Σ C(deg(center), 2) wedges, so centers above
    * this degree are excluded — the MaxSpanDf discipline applied to
    * wedges: bounded per-center work at any corpus size, with the
    * approximation (hub centers contribute no wedges) stated rather
    * than silent. Co-order degrees at the gated scales peak at 51, so
    * the cap only engages on pathological hubs.
    */
  private val LinkDegCap = 64L

  /** q188 — co-purchase link prediction by wedge closure (item-based
    * collaborative filtering, Sarwar et al. 2001 neighborhood method +
    * the common-neighbors predictor of Liben-Nowell & Kleinberg 2003):
    * over the co-order graph — parts are nodes, an edge means co-ordered
    * in ≥2 baskets (q189's support floor) — every NON-adjacent part
    * pair reachable through a shared neighbor gets its common-neighbor
    * count and neighborhood-Jaccard `cn / (deg_a + deg_b − cn)` in
    * exact e6 fixed point: the "customers who bought these also
    * bought…" candidates, ranked.
    *
    * Scale shape: the edge list materializes ONCE through scratch (it
    * is referenced four times downstream — degree table, both wedge
    * scans, the adjacency anti-join — and per-branch re-execution of
    * the basket self-join is the union-branch trap); wedges come ONLY
    * from the hub-capped center equi-join (b<c orientation halves it),
    * never an all-pairs part join; existing edges leave via one
    * anti-join and degree lookups are node-sized equi-joins.
    */
  /** Symmetrized co-purchase edges — the graph under q188/q215/q216/
    * q217, computed once per (corpus, parallelism) per JVM through the
    * memoized [[CoGraph]] store (the DupGraph discipline).
    */
  private def coPurchaseEdges(s: SparkSession, dir: String): DataFrame =
    CoGraph.edges(s, dir)

  /** The SQL twin of [[coPurchaseEdges]] — `i`/`p`/`edges` CTEs shared
    * verbatim by the q188 and q215 oracles (the ccSqlCtes no-drift
    * discipline).
    */
  private val coEdgesSqlCtes =
    """i AS MATERIALIZED (
      |   SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |   FROM lineitem),
      | p AS (SELECT a.pk AS a, b.pk AS b
      |  FROM i a JOIN i b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY a.pk, b.pk HAVING COUNT(*) >= 2),
      | edges AS MATERIALIZED (SELECT a AS u, b AS v FROM p
      |  UNION ALL SELECT b, a FROM p)""".stripMargin

  val qLinkPrediction: QuerySpec = QuerySpec(
    "q188_link_prediction",
    (s, dir) => {
      val edges = coPurchaseEdges(s, dir)
      val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      val ce = edges
        .join(deg.filter(col("deg") <= LinkDegCap).select(col("u")), Seq("u"))
      val cn = ce.toDF("a", "b").join(ce.toDF("a", "c"), Seq("a"))
        .filter(col("b") < col("c"))
        .groupBy(col("b"), col("c")).agg(count(lit(1)).as("cn"))
      cn.join(edges.toDF("b", "c"), Seq("b", "c"), "left_anti")
        .join(deg.toDF("b", "deg_b"), Seq("b"))
        .join(deg.toDF("c", "deg_c"), Seq("c"))
        .select(col("b").as("part_a"), col("c").as("part_b"), col("cn"),
          expr("(cn * 1000000) div (deg_b + deg_c - cn)").as("jacc_e6"))
    },
    Some(s"""WITH $coEdgesSqlCtes,
            | deg AS MATERIALIZED (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg
            |  FROM edges GROUP BY u),
            | ce AS MATERIALIZED (SELECT e.u, e.v FROM edges e
            |  JOIN deg d ON e.u = d.u WHERE d.deg <= $LinkDegCap),
            | cn AS MATERIALIZED (SELECT x.v AS b, y.v AS c,
            |   CAST(COUNT(*) AS BIGINT) AS cn
            |  FROM ce x JOIN ce y ON x.u = y.u AND x.v < y.v
            |  GROUP BY x.v, y.v),
            | m AS (SELECT b, c, cn FROM cn
            |  WHERE NOT EXISTS (SELECT 1 FROM edges e
            |   WHERE e.u = cn.b AND e.v = cn.c))
            | SELECT m.b AS part_a, m.c AS part_b, m.cn AS cn,
            |  CAST((m.cn * 1000000) // (db.deg + dc.deg - m.cn) AS BIGINT)
            |   AS jacc_e6
            | FROM m JOIN deg db ON m.b = db.u
            | JOIN deg dc ON m.c = dc.u""".stripMargin.replaceAll("\n", "")))

  private val LpaIters = CoGraph.LpaIters

  /** q215 — label-propagation communities over the co-purchase graph
    * (Raghavan, Albert & Kumara 2007, the near-linear community
    * detector), made fully deterministic: synchronous updates for a
    * FIXED [[LpaIters]] rounds, each node adopting its neighbors' most
    * frequent label with ties broken to the SMALLEST label (the
    * lexicographic (count, −label) max — no randomized visit order, no
    * oscillation exposure at a fixed horizon). Complements the graph
    * family's structure axis: CC (q102's store) finds what is REACHABLE,
    * k-core/bridges (q114/q193) find density and fragility, LPA finds
    * the SHOPPING BASKETS — densely co-purchased part groups — without
    * a cluster-count parameter; per community it reports the stable id
    * (min member), member count and internal-edge count (the modularity
    * numerator a merchandiser reads).
    *
    * Scale shape: per round ONE edge-sized equi-join + a (node, label)
    * map-side-combined agg + a node-keyed argmax — the q102 PageRank
    * iteration shape, label frames node-sized; each generation is
    * materialized through an explicit [[Scratch.flush]] handle (the r5
    * localCheckpoint lesson: no unbounded lineage, superseded
    * generations reclaimable). The oracle unrolls the identical rounds
    * as MATERIALIZED CTEs (the q26b Lloyd discipline) with the same
    * `MAX([c, −lbl])` tie-break.
    */
  /** The SQL twin of [[CoGraph.labels]]: `l0` … `l{LpaIters}` CTE rounds,
    * shared verbatim by the q215 and q217 oracles.
    */
  private val lpaSqlCtes = {
    val rounds = (1 to LpaIters).map { k =>
      s""" c$k AS (SELECT e.u, l.lbl, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM edges e JOIN l${k - 1} l ON l.v = e.v GROUP BY 1, 2),
         | l$k AS MATERIALIZED (SELECT u AS v, -(MAX([c, -lbl])[2]) AS lbl
         |  FROM c$k GROUP BY u)""".stripMargin
    }.mkString(",")
    s""" l0 AS MATERIALIZED (SELECT DISTINCT u AS v, u AS lbl
       |  FROM edges),
       |$rounds""".stripMargin
  }

  val qLpaCommunities: QuerySpec = QuerySpec(
    "q215_lpa_communities",
    (s, dir) => {
      val edges = coPurchaseEdges(s, dir)
      val labels = CoGraph.labels(s, dir)
      val com = labels.groupBy(col("lbl"))
        .agg(min(col("v")).as("community"), count(lit(1)).as("n_members"))
      val internal = edges
        .join(labels.select(col("v").as("u"), col("lbl").as("lu")), Seq("u"))
        .join(labels.select(col("v"), col("lbl").as("lv")), Seq("v"))
        .filter(col("lu") === col("lv"))
        .groupBy(col("lu").as("lbl")).agg(count(lit(1)).as("c2"))
        .select(col("lbl"), expr("c2 div 2").as("n_internal"))
      com.join(internal, Seq("lbl"), "left")
        .select(col("community"), col("n_members"),
          coalesce(col("n_internal"), lit(0L)).as("n_internal"))
    },
    Some {
      s"""WITH $coEdgesSqlCtes,
         |$lpaSqlCtes,
         | com AS (SELECT lbl, MIN(v) AS community,
         |   CAST(COUNT(*) AS BIGINT) AS n_members
         |  FROM l$LpaIters GROUP BY lbl),
         | itn AS (SELECT lu.lbl AS lbl,
         |   CAST(COUNT(*) // 2 AS BIGINT) AS n_internal
         |  FROM edges e JOIN l$LpaIters lu ON lu.v = e.u
         |  JOIN l$LpaIters lv ON lv.v = e.v
         |  WHERE lu.lbl = lv.lbl GROUP BY 1)
         | SELECT community, n_members,
         |  COALESCE(n_internal, CAST(0 AS BIGINT)) AS n_internal
         | FROM com LEFT JOIN itn USING (lbl)""".stripMargin
        .replaceAll("\n", "")
    })

  /** q216 — degree assortativity of the co-purchase graph (Newman 2002):
    * the Pearson correlation of endpoint degrees across edges — the
    * one-number mixing audit read before trusting degree-capped plans:
    * r > 0 (hubs link hubs) means a degree cap like q188's LinkDegCap=64
    * concentrates its truncation inside a hub core; r < 0 (hub-leaf,
    * typical for baskets) means capping spreads evenly. By the symmetry
    * of the directed edge list (every undirected edge appears both
    * ways), the u- and v-marginals are IDENTICAL, so r collapses to the
    * all-integer rational (m·Σdudv − S²) / (m·Σd² − S²) with S = Σd over
    * edge endpoints — no sqrt at all; the single IEEE division is the
    * only FP step (the q63 moment discipline; BIGINT holds to ~10⁶
    * edges at deg ≤ 10³ — past that the moments graduate to
    * DECIMAL(38)).
    *
    * Scale shape: degree frame from one edge-keyed agg, joined back to
    * the edge list on each endpoint (node-sized equi-joins), ONE
    * single-row moment agg. Nothing above edge volume anywhere.
    */
  val qDegreeAssortativity: QuerySpec = QuerySpec(
    "q216_degree_assortativity",
    (s, dir) => {
      val edges = coPurchaseEdges(s, dir)
      val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("d"))
      edges
        .join(deg.select(col("u"), col("d").as("du")), Seq("u"))
        .join(deg.select(col("u").as("v"), col("d").as("dv")), Seq("v"))
        .agg(count(lit(1)).as("m2"),
          sum(col("du")).as("sd"),
          sum(col("du") * col("du")).as("sd2"),
          sum(col("du") * col("dv")).as("sdudv"))
        .select(col("m2"), col("sd"), col("sd2"), col("sdudv"),
          when(col("m2") * col("sd2") - col("sd") * col("sd") =!= 0L,
            (col("m2") * col("sdudv") - col("sd") * col("sd"))
              .cast("double") /
              (col("m2") * col("sd2") - col("sd") * col("sd"))
                .cast("double"))
            .as("assortativity"))
    },
    Some(s"""WITH $coEdgesSqlCtes,
            | deg AS MATERIALIZED (SELECT u,
            |   CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY u),
            | j AS (SELECT du.d AS du, dv.d AS dv
            |  FROM edges e JOIN deg du ON e.u = du.u
            |  JOIN deg dv ON e.v = dv.u),
            | mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2,
            |   CAST(SUM(du) AS BIGINT) AS sd,
            |   CAST(SUM(du * du) AS BIGINT) AS sd2,
            |   CAST(SUM(du * dv) AS BIGINT) AS sdudv FROM j)
            | SELECT m2, sd, sd2, sdudv,
            |  CASE WHEN m2 * sd2 - sd * sd <> 0 THEN
            |   CAST(m2 * sdudv - sd * sd AS DOUBLE)
            |    / CAST(m2 * sd2 - sd * sd AS DOUBLE) END
            |   AS assortativity
            | FROM mm""".stripMargin.replaceAll("\n", "")))

  /** q217 — modularity of the q215 LPA partition (Newman & Girvan 2004):
    * Q = Σ_c (e_c/m₂ − (d_c/m₂)²) over communities, with e_c the
    * DIRECTED internal edge count, d_c the community degree mass and
    * m₂ the directed edge total — the number that says whether q215's
    * labels found real structure (Q ≈ 0: no better than random at equal
    * degrees) and the convergence check a production LPA monitors
    * between rounds. Exact form: one signed truncating division at the
    * end, q_e6 = (10⁶·Σ_c(e_c·m₂ − d_c²)) div m₂² — per-community terms
    * summed as exact integers FIRST (one truncation total, not one per
    * community; Spark `div` ≡ DuckDB `//` truncate-toward-zero on the
    * possibly-negative numerator, the probed q110 rule). BIGINT holds
    * to m₂ ≈ 3·10⁶ directed edges at the e6 scale; past that the
    * moments graduate to DECIMAL(38), the q63 rule.
    *
    * Scale shape: the LPA rounds are q215's (shared [[CoGraph.labels]]);
    * after them, e_c = one edge-sized double label join + community
    * agg, d_c = one node-sized agg — both community-frame-sized
    * outputs, met by a full-outer on the community key and collapsed
    * to ONE row.
    */
  val qLpaModularity: QuerySpec = QuerySpec(
    "q217_lpa_modularity",
    (s, dir) => {
      val edges = coPurchaseEdges(s, dir)
      val labels = CoGraph.labels(s, dir)
      val ec = edges
        .join(labels.select(col("v").as("u"), col("lbl").as("lu")), Seq("u"))
        .join(labels.select(col("v"), col("lbl").as("lv")), Seq("v"))
        .filter(col("lu") === col("lv"))
        .groupBy(col("lu").as("lbl")).agg(count(lit(1)).as("ec"))
      val dc = edges.groupBy(col("u")).agg(count(lit(1)).as("d"))
        .join(labels.select(col("v").as("u"), col("lbl")), Seq("u"))
        .groupBy(col("lbl")).agg(sum(col("d")).as("dc"))
      val m2 = edges.agg(count(lit(1)).as("m2"))
      dc.join(ec, Seq("lbl"), "left")
        .select(col("lbl"), col("dc"),
          coalesce(col("ec"), lit(0L)).as("ec"))
        .crossJoin(broadcast(m2)) // single-row edge total
        .agg(count(lit(1)).as("n_communities"), max(col("m2")).as("m2"),
          sum(col("ec") * col("m2") - col("dc") * col("dc")).as("num"))
        .select(col("n_communities"), col("m2"), col("num"),
          expr("(1000000 * num) div (m2 * m2)").as("q_e6"))
    },
    Some(s"""WITH $coEdgesSqlCtes,
            |$lpaSqlCtes,
            | ec AS (SELECT lu.lbl AS lbl, CAST(COUNT(*) AS BIGINT) AS ec
            |  FROM edges e JOIN l$LpaIters lu ON lu.v = e.u
            |  JOIN l$LpaIters lv ON lv.v = e.v
            |  WHERE lu.lbl = lv.lbl GROUP BY 1),
            | dc AS (SELECT l.lbl, CAST(SUM(d.d) AS BIGINT) AS dc
            |  FROM (SELECT u, CAST(COUNT(*) AS BIGINT) AS d
            |        FROM edges GROUP BY u) d
            |  JOIN l$LpaIters l ON l.v = d.u GROUP BY l.lbl),
            | m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM edges),
            | g AS (SELECT dc.lbl, dc.dc,
            |   COALESCE(ec.ec, CAST(0 AS BIGINT)) AS ec, m.m2
            |  FROM dc LEFT JOIN ec USING (lbl), m)
            | SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
            |  MAX(m2) AS m2,
            |  CAST(SUM(ec * m2 - dc * dc) AS BIGINT) AS num,
            |  CAST((1000000 * CAST(SUM(ec * m2 - dc * dc) AS BIGINT))
            |   // (MAX(m2) * MAX(m2)) AS BIGINT) AS q_e6
            | FROM g""".stripMargin.replaceAll("\n", "")))

  /** q222 — global clustering coefficient of the co-purchase graph
    * (Watts–Strogatz transitivity, exact): 3·triangles / wedges — the
    * one-number answer to "do people who buy A-with-B and A-with-C also
    * buy B-with-C", and the density context behind q215's communities
    * (high transitivity = LPA's labels mean something) and q216's
    * mixing. Triangles counted EXACTLY by the degree-oriented wedge
    * join (every edge oriented low→high (degree, id); each triangle
    * counted once from its lowest-degree corner — the q107 discipline,
    * arboricity-bounded, no hub blowup, NO cap so the count is exact);
    * wedges = Σ C(d,2) in closed form from the degree frame. All
    * integers; cc_e6 = (3·10⁶·tri) div wedges.
    *
    * Scale shape: edges/degrees from the memoized [[CoGraph]] store;
    * the oriented wedge join is the only super-degree stage and it is
    * the exact triangle bound. The three scalar summaries are collected
    * driver-side (single rows — the q219 literal rule) and emitted as
    * one literal row.
    */
  val qClusteringCoefficient: QuerySpec = QuerySpec(
    "q222_clustering_coefficient",
    (s, dir) => {
      import s.implicits._
      val edges = CoGraph.edges(s, dir)
      val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      // r19: flush → repartition(u) (the sharedSigs form): the degree
      // joins run once below the shared exchange, whose u partitioning
      // both triangle-join sides reuse directly. Explicit no-op
      // isNotNulls + the closing branch's dv >= 0 reference keep the
      // three consumer subtrees canonically equal (the denseDayGrid
      // discipline; see q107)
      val oriented = edges
        .filter(col("u").isNotNull && col("v").isNotNull)
        .join(deg.toDF("u", "du"), Seq("u"))
        .join(deg.toDF("v", "dv"), Seq("v"))
        .filter(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")))
        .select(col("u"), col("v"), col("dv"))
        .repartition(col("u"))
      val base = deg.agg(count(lit(1)).as("n"),
        expr("sum((deg * (deg - 1)) div 2)").as("w"),
        expr("sum(deg) div 2").as("m")).collect().head
      val (nNodes, wedges, nEdges) =
        (base.getLong(0), base.getLong(1), base.getLong(2))
      // same-predicate-per-branch no-ops as q107: keep the three
      // oriented subtrees canonically equal under pushdown/pruning.
      // The join-back matches on dc = dv too — a no-op (dv = deg(v) is
      // functionally determined by v) that keeps dv CONSUMED above the
      // closing branch's exchange, so column pruning leaves all three
      // exchanges with the same (u, v, dv) signature (see q107)
      val tri = oriented.toDF("u", "b", "db")
        .filter(col("db") >= 0)
        .join(oriented.toDF("u", "c", "dc").filter(col("dc") >= 0),
          Seq("u"))
        .filter(col("db") < col("dc") ||
          (col("db") === col("dc") && col("b") < col("c")))
        .select(col("b"), col("c"), col("dc"))
        .join(oriented.filter(col("dv") >= 0)
            .select(col("u").as("b"), col("v").as("c"),
              col("dv").as("dc")),
          Seq("b", "c", "dc"))
        .count()
      Seq((nNodes, nEdges, wedges, tri,
        if (wedges > 0) Some(3000000L * tri / wedges) else None))
        .toDF("n_nodes", "n_edges", "wedges", "triangles", "global_cc_e6")
    },
    Some(s"""WITH $coEdgesSqlCtes,
            | deg AS MATERIALIZED (SELECT u,
            |   CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY u),
            | o AS MATERIALIZED (SELECT e.u, e.v, dv.deg AS dv
            |  FROM edges e JOIN deg du ON e.u = du.u
            |  JOIN deg dv ON e.v = dv.u
            |  WHERE du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)),
            | base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
            |   CAST(SUM((deg * (deg - 1)) // 2) AS BIGINT) AS wedges,
            |   CAST(SUM(deg) // 2 AS BIGINT) AS n_edges FROM deg),
            | tr AS (SELECT CAST(COUNT(*) AS BIGINT) AS triangles
            |  FROM o e1 JOIN o e2 ON e1.u = e2.u
            |   AND (e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v))
            |  JOIN o e3 ON e3.u = e1.v AND e3.v = e2.v)
            | SELECT n_nodes, n_edges, wedges, triangles,
            |  CASE WHEN wedges > 0 THEN
            |   CAST((3000000 * triangles) // wedges AS BIGINT) END
            |   AS global_cc_e6
            | FROM base, tr""".stripMargin.replaceAll("\n", "")))

  val specs: Seq[QuerySpec] = Seq(
    q1Scan, q2Republish, q3FilterProject, q4Join3, q5BroadcastJoin,
    q6LeftOuter, q7SemiAnti, q8RangeJoin, q9Agg, q10Distinct,
    q11ApproxDistinct, q12Rollup, q13RowNumber, q14WindowFrame, q15TopK,
    q16Except, q17UnionIntersect, q18JsonFns, q20TumblingWindow,
    q39Percentiles, q40Pivot, q42ScalarFns, q57FullOuter, q58Cube,
    q63Correlation, qMarketBasket, qLinkPrediction, qLpaCommunities,
    qDegreeAssortativity, qLpaModularity, qClusteringCoefficient)
}
