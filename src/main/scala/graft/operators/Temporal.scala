package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Temporal operators Spark has no single built-in for: AS-OF join and
  * gap-based sessionization. Both are implemented scale-first as ONE
  * shuffle on the key + a sorted window pass — never an inequality
  * (theta) join, which would go quadratic per key.
  *
  * Time arithmetic happens on exact integer epoch-microseconds
  * (`unix_micros` ≡ DuckDB `epoch_us`, both floor), so every comparison
  * and output value is bitwise-reproducible across engines and
  * partitionings.
  */
object Temporal {

  /** Q37 — AS-OF join: for every event, the most recent order of the same
    * key with order time ≤ event time (classic point-in-time lookup —
    * "state of the world when the event happened").
    *
    * Implementation: tag + union both sides, one window pass per key
    * ordered by (time, side, id) carrying the last non-null order key
    * forward, keep event rows. Cost = one shuffle on the key + a sort —
    * the same plan shape at 100 TB; an inequality join would be per-key
    * quadratic and a per-key `collect` would not be distributed.
    * Orders sort before events at equal time (side 0 < 1) making the
    * match inclusive; ties among identical (key, time) orders resolve to
    * the largest o_orderkey deterministically.
    */
  val qAsofJoin: QuerySpec = QuerySpec(
    "q37_asof_join",
    (s, dir) => {
      val e = Tables.load(s, dir, "events").select(
        col("user_id").as("k"), unix_micros(col("ts")).as("tus"),
        col("event_id"), lit(null).cast(LongType).as("okey"),
        lit(1).as("side"))
      val o = Tables.load(s, dir, "orders").select(
        col("o_custkey").as("k"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("tus"),
        lit(null).cast(LongType).as("event_id"),
        col("o_orderkey").as("okey"), lit(0).as("side"))
      val w = Window.partitionBy(col("k"))
        .orderBy(col("tus"), col("side"), coalesce(col("okey"), col("event_id")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.unionByName(o)
        .withColumn("last_order", last(col("okey"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("event_id"), col("k").as("user_id"), col("last_order"))
    },
    Some("""WITH u AS (
           |  SELECT user_id AS k, epoch_us(ts) AS tus, event_id,
           |   CAST(NULL AS BIGINT) AS okey, 1 AS side FROM events
           |  UNION ALL
           |  SELECT o_custkey, epoch_us(o_orderdate), CAST(NULL AS BIGINT),
           |   o_orderkey, 0 FROM orders),
           | m AS (SELECT *, last_value(okey IGNORE NULLS) OVER (
           |    PARTITION BY k ORDER BY tus, side, COALESCE(okey, event_id)
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_order
           |  FROM u)
           | SELECT event_id, k AS user_id, last_order
           | FROM m WHERE side = 1""".stripMargin.replaceAll("\n", "")))

  /** Q38 — gap-based sessionization: events of a user belong to one
    * session while consecutive gaps stay ≤ 30 min. One window pass:
    * lag → new-session flag → running sum = session sequence number,
    * then a per-(user, session) aggregate. Same single-shuffle shape at
    * any scale; the streaming twin is `session_window` with watermark.
    */
  val qSessionize: QuerySpec = QuerySpec(
    "q38_sessionize",
    (s, dir) => {
      val gapUs = 30L * 60 * 1000000
      val byTime = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"), col("event_id"))
      val e = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
        .withColumn("prev", lag(col("tus"), 1).over(byTime))
        .withColumn("new_sess",
          when(col("prev").isNull || col("tus") - col("prev") > gapUs, 1)
            .otherwise(0))
        .withColumn("session_seq",
          sum(col("new_sess")).over(
            byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      e.groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          min(col("event_id")).as("first_event_id"),
          min(col("tus")).as("start_us"))
    },
    Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
           | l AS (SELECT *, lag(tus) OVER (
           |    PARTITION BY user_id ORDER BY tus, event_id) AS prev FROM e),
           | n AS (SELECT *, CASE WHEN prev IS NULL OR tus - prev > 1800000000
           |    THEN 1 ELSE 0 END AS new_sess FROM l),
           | s AS (SELECT *, CAST(SUM(new_sess) OVER (
           |    PARTITION BY user_id ORDER BY tus, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |    AS session_seq FROM n)
           | SELECT user_id, session_seq, COUNT(*) AS n_events,
           |  MIN(event_id) AS first_event_id, MIN(tus) AS start_us
           | FROM s GROUP BY user_id, session_seq""".stripMargin.replaceAll("\n", "")))

  /** q53 — sequential-conversion funnel (view → click → purchase): per
    * user, the earliest view, the earliest click STRICTLY AFTER that
    * view, the earliest purchase strictly after that click; output the
    * per-stage user counts. The strictly-after chaining is what makes a
    * funnel a sequence query and not three independent counts.
    *
    * Shape: each stage is one hash-aggregate on user_id joined to the
    * previous stage's (user_id, cutoff) — all equi-joins on the funnel
    * key, re-shuffling only the (shrinking) per-stage event subsets. All
    * comparisons run in integer epoch-µs (`unix_micros` ≡ DuckDB
    * `epoch_us`), the one timestamp representation both engines agree on
    * bit-for-bit.
    */
  val qFunnel: QuerySpec = QuerySpec(
    "q53_funnel",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("tus"))
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("tus")).as("t1"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(t1, "user_id").filter(col("tus") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("tus")).as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, "user_id").filter(col("tus") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("tus")).as("t3"))
      t1.agg(count(lit(1)).as("users")).select(lit("view").as("stage"), col("users"))
        .unionAll(t2.agg(count(lit(1)).as("users"))
          .select(lit("click").as("stage"), col("users")))
        .unionAll(t3.agg(count(lit(1)).as("users"))
          .select(lit("purchase").as("stage"), col("users")))
    },
    Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
           | t1 AS (SELECT user_id, MIN(tus) AS t1 FROM e
           |   WHERE event_type = 'view' GROUP BY user_id),
           | t2 AS (SELECT e.user_id, MIN(e.tus) AS t2 FROM e
           |   JOIN t1 ON e.user_id = t1.user_id AND e.tus > t1.t1
           |   WHERE e.event_type = 'click' GROUP BY e.user_id),
           | t3 AS (SELECT e.user_id, MIN(e.tus) AS t3 FROM e
           |   JOIN t2 ON e.user_id = t2.user_id AND e.tus > t2.t2
           |   WHERE e.event_type = 'purchase' GROUP BY e.user_id)
           | SELECT 'view' AS stage, COUNT(*) AS users FROM t1
           | UNION ALL SELECT 'click', COUNT(*) FROM t2
           | UNION ALL SELECT 'purchase', COUNT(*) FROM t3""".stripMargin
      .replaceAll("\n", "")))

  /** q54 — cohort retention: users grouped by the DAY of their first
    * event (the cohort), counted once per later active day, keyed by the
    * day offset from their cohort day — the retention-curve table every
    * analytics engine ships. Days are integer epoch-day numbers
    * (`epoch-µs div 86400000000` — floor ≡ trunc, everything
    * non-negative), never DATE/TIMESTAMP values, so the two engines
    * cannot disagree on calendar semantics.
    *
    * Shape: one distinct on (user, day) with map-side partial agg, one
    * aggregate for first-day, one equi-join on user_id, one final small
    * aggregate — every shuffle is on the user key or the tiny cohort
    * grid.
    */
  val qRetention: QuerySpec = QuerySpec(
    "q54_retention",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .distinct()
      val f = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      e.join(f, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("period_offset"))
        .agg(count(lit(1)).as("users"))
    },
    Some("""WITH e AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
           |   FROM events),
           | f AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id)
           | SELECT f.cohort_day, e.day - f.cohort_day AS period_offset,
           |  COUNT(*) AS users
           | FROM e JOIN f ON e.user_id = f.user_id
           | GROUP BY 1, 2""".stripMargin.replaceAll("\n", "")))

  /** q98 — CDC changelog apply (the lakehouse MERGE INTO): materialize
    * the current state of a base snapshot under a keyed change log with
    * last-writer-wins semantics. The log is the events stream read as
    * ops on customer balances — `error` = delete, anything else =
    * upsert carrying `value` — and the base is a PARTIAL snapshot
    * (`c_custkey % 3 != 0`), so every outcome class is exercised at
    * every SF: kept (no op), updated (upsert on a present key),
    * inserted (upsert on an absent key), deleted (dropped), and a
    * delete of an absent key (a no-op, not an error).
    *
    * Scale shape: latest-op-per-key is ONE hash aggregation —
    * `max_by(payload, (epoch_µs, event_id))` with map-side partial
    * merge — NOT a row_number window, which would shuffle-sort every
    * key's full history to keep one row; then ONE full-outer equi-join
    * against the base. The unique event_id tiebreak makes the argmax
    * deterministic, so the oracle's window formulation is value-
    * identical. Balances pass through untouched (no double
    * arithmetic). At 100 TB both sides shuffle once on the merge key;
    * with the base bucketed on it (the q45 layout) the base side's
    * exchange disappears.
    */
  val qCdcApply: QuerySpec = QuerySpec(
    "q98_cdc_apply",
    (s, dir) => {
      val latest = Tables.load(s, dir, "events")
        .select(col("user_id").as("cust_id"),
          struct(
            when(col("event_type") === "error", lit("D")).otherwise(lit("U"))
              .as("op"),
            col("value").as("new_bal")).as("payload"),
          struct(unix_micros(col("ts")).as("tus"), col("event_id").as("eid"))
            .as("ord"))
        .groupBy(col("cust_id"))
        .agg(max_by(col("payload"), col("ord")).as("p"))
        .select(col("cust_id"), col("p.op").as("op"),
          col("p.new_bal").as("new_bal"))
      val base = Tables.load(s, dir, "customer")
        .filter(col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey").as("cust_id"),
          col("c_acctbal").as("base_bal"))
      base.join(latest, Seq("cust_id"), "full_outer")
        .filter(col("op").isNull || col("op") === "U")
        .select(col("cust_id"),
          when(col("op") === "U", col("new_bal")).otherwise(col("base_bal"))
            .as("balance"),
          when(col("op").isNull, lit("kept"))
            .when(col("base_bal").isNull, lit("inserted"))
            .otherwise(lit("updated")).as("src"))
    },
    Some("""WITH log AS (SELECT user_id AS cust_id,
           |   CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
           |   value AS new_bal,
           |   ROW_NUMBER() OVER (PARTITION BY user_id
           |     ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
           |  FROM events),
           | latest AS (SELECT cust_id, op, new_bal FROM log WHERE rn = 1),
           | base AS (SELECT c_custkey AS cust_id, c_acctbal AS base_bal
           |  FROM customer WHERE c_custkey % 3 != 0)
           | SELECT cust_id,
           |  CASE WHEN op = 'U' THEN new_bal ELSE base_bal END AS balance,
           |  CASE WHEN op IS NULL THEN 'kept'
           |   WHEN base_bal IS NULL THEN 'inserted'
           |   ELSE 'updated' END AS src
           | FROM base FULL OUTER JOIN latest USING (cust_id)
           | WHERE op IS NULL OR op = 'U'""".stripMargin.replaceAll("\n", "")))

  /** q109 — first-order event-transition matrix: for every ordered pair
    * of event types (src → dst), how many times a user's NEXT event was
    * `dst` given the current one was `src`, with the row-normalized
    * transition probability in fixed-point parts-per-million. The Markov
    * view of user behavior — path analysis ("what follows a view?"),
    * anomaly detection (transitions with near-zero mass), and the input
    * to sequence-model pretraining curricula.
    *
    * Scale shape: ONE shuffle on `user_id` for the ordered window pass
    * (`lead` over (time, event_id) — the unique-tiebreak rule), then one
    * type-pair hash aggregate with map-side combine (the pair domain is
    * |types|², tiny), then a broadcast join of per-src totals. Nothing
    * downstream of the window is corpus-sized. Probabilities use integer
    * `div` on non-negative counts, so `div` ≡ `//` and the oracle is
    * bit-exact.
    */
  /** The q109 (src, dst, cnt, ppm) transition frame — shared by the
    * gated q109 and q219's stationary-distribution iteration.
    */
  private def transitionPpm(s: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val pairs = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("dst", lead(col("event_type"), 1).over(byTime))
      .filter(col("dst").isNotNull)
      .groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("cnt"))
    val totals = pairs.groupBy(col("src"))
      .agg(sum(col("cnt")).as("total"))
    pairs.join(broadcast(totals), Seq("src"))
      .select(col("src"), col("dst"), col("cnt"),
        expr("(cnt * 1000000) div total").as("ppm"))
  }

  /** The SQL twin of [[transitionPpm]] (`e`/`nxt`/`p`/`t` CTEs) —
    * shared verbatim by the q109 and q219 oracles.
    */
  private val transSqlCtes =
    """e AS (SELECT user_id, event_id, event_type,
      |   epoch_us(ts) AS tus FROM events),
      | nxt AS (SELECT event_type AS src, LEAD(event_type) OVER (
      |   PARTITION BY user_id ORDER BY tus, event_id) AS dst FROM e),
      | p AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS cnt
      |   FROM nxt WHERE dst IS NOT NULL GROUP BY src, dst),
      | t AS (SELECT src, CAST(SUM(cnt) AS BIGINT) AS total
      |   FROM p GROUP BY src)""".stripMargin

  val qTransitions: QuerySpec = QuerySpec(
    "q109_transitions",
    (s, dir) => transitionPpm(s, dir),
    Some(s"""WITH $transSqlCtes
           | SELECT p.src, p.dst, p.cnt,
           |  CAST((p.cnt * 1000000) // t.total AS BIGINT) AS ppm
           | FROM p JOIN t ON p.src = t.src""".stripMargin
      .replaceAll("\n", "")))

  /** q163 — event cadence report: per event type, order statistics of
    * the inter-arrival gap (µs between an event and the SAME USER's
    * previous event of any type — the per-entity cadence operations
    * telemetry watches). Gaps are INTEGER epoch-µs differences and the
    * percentiles are exact integer ORDER STATISTICS (1-based rank
    * ⌈p·n⌉ via integer `(p·n + …) div` arithmetic — the lower-quantile
    * convention, no interpolation), so nothing straddles an FP boundary.
    *
    * Scale shape: the lag runs per-user (key cardinality grows with the
    * corpus — the q38/q109 window discipline, never a global sort);
    * percentile extraction is the q39 two-phase compressed histogram —
    * cumsum windows over (event_type, gap) HISTOGRAM buckets, one
    * conditional-min aggregate per type. No stage holds more than a
    * type's distinct-gap support.
    */
  val qEventCadence: QuerySpec = QuerySpec(
    "q163_event_cadence",
    (s, dir) => {
      val byTime = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"), col("event_id"))
      val gaps = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("tus"))
        .withColumn("prev", lag(col("tus"), 1).over(byTime))
        .filter(col("prev").isNotNull)
        .select(col("event_type"), (col("tus") - col("prev")).as("gap"))
      val hist = gaps.groupBy(col("event_type"), col("gap"))
        .agg(count(lit(1)).as("cnt"))
      val byGap = Window.partitionBy(col("event_type")).orderBy(col("gap"))
      val whole = Window.partitionBy(col("event_type"))
      val cum = hist
        .withColumn("cum", sum(col("cnt")).over(byGap))
        .withColumn("n", sum(col("cnt")).over(whole))
      def keyAt(rank1: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        min(when(col("cum") >= rank1, col("gap")))
      cum.groupBy(col("event_type")).agg(
        max(col("n")).as("n_gaps"),
        keyAt(expr("(n + 1) div 2")).as("p50_us"),
        keyAt(expr("(9 * n + 9) div 10")).as("p90_us"),
        max(col("gap")).as("max_us"))
    },
    Some("""WITH e AS (SELECT user_id, event_id, event_type,
           |   epoch_us(ts) AS tus FROM events),
           | g AS (SELECT event_type, tus - LAG(tus) OVER (
           |   PARTITION BY user_id ORDER BY tus, event_id) AS gap FROM e),
           | h AS (SELECT event_type, gap, CAST(COUNT(*) AS BIGINT) AS cnt
           |  FROM g WHERE gap IS NOT NULL GROUP BY event_type, gap),
           | c AS (SELECT event_type, gap,
           |   CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY gap)
           |    AS BIGINT) AS cum,
           |   CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
           |  FROM h)
           | SELECT event_type, MAX(n) AS n_gaps,
           |  MIN(CASE WHEN cum >= (n + 1) // 2 THEN gap END) AS p50_us,
           |  MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN gap END) AS p90_us,
           |  MAX(gap) AS max_us
           | FROM c GROUP BY event_type""".stripMargin.replaceAll("\n", "")))

  /** q185 — RFM segmentation (recency / frequency / monetary, the
    * classic behavioral-segmentation grid): per user over the events
    * stream, R = days since last activity (vs the corpus max day),
    * F = event count, M = value total in exact 1e-2 fixed point (the
    * `round(x·100)` rule the vector quantizer already proves identical
    * on both engines); each dimension scored into its exact QUARTILE
    * (rank-⌈p·n⌉ lower-quantile semantics, the q39/q163 discipline) and
    * the 3-digit segment code `100·r_q + 10·f_q + m_q` rolled up —
    * 111 = most recent/most active/highest spend quartile … 444 the
    * inverse, ≤64 report rows.
    *
    * Scale shape: the per-user agg (map-side combine, the ONE
    * corpus-keyed shuffle) runs twice — once feeding the threshold
    * histogram, once the final scoring pass. Quartile thresholds come
    * from ONE unpivoted (dimension, value, count) histogram — R and F
    * naturally low-cardinality, M bucketed to 10-unit bands (`div
    * 1000` on the e2 total, the q104 bounded-grid discipline: quartile
    * boundaries at band resolution, never a user-cardinality sort) —
    * with the q163 per-partition cumulative/total windows over the
    * bounded grid, collapsing to ONE single-row frame broadcast back
    * onto users; the final rollup is a ≤64-group map-side-combined agg.
    */
  val qRfmSegments: QuerySpec = QuerySpec(
    "q185_rfm_segments",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          expr("CAST(ROUND(value * 100) AS BIGINT)").as("v2"))
      val dmax = ev.agg(max(col("day")).as("dmax"))
      val u = ev.groupBy(col("user_id"))
        .agg(max(col("day")).as("uday"), count(lit(1)).as("f"),
          sum(col("v2")).as("m2"))
        .crossJoin(broadcast(dmax))
        .select(col("user_id"), (col("dmax") - col("uday")).as("r"),
          col("f"), col("m2"), expr("m2 div 1000").as("mb"))
      val byV = Window.partitionBy(col("dim")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val whole = Window.partitionBy(col("dim"))
      def keyAt(dim: String, rank1: Column): Column =
        min(when(col("dim") === dim && col("cum") >= rank1, col("v")))
      val thCols = Seq("r", "f", "mb").flatMap { d =>
        Seq(keyAt(d, expr("(n + 3) div 4")).as(s"${d}_t25"),
          keyAt(d, expr("(n + 1) div 2")).as(s"${d}_t50"),
          keyAt(d, expr("(3 * n + 3) div 4")).as(s"${d}_t75"))
      }
      val th = u
        .select(explode(array(
          struct(lit("r").as("dim"), col("r").as("v")),
          struct(lit("f").as("dim"), col("f").as("v")),
          struct(lit("mb").as("dim"), col("mb").as("v")))).as("x"))
        .select(col("x.dim").as("dim"), col("x.v").as("v"))
        .groupBy(col("dim"), col("v")).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(byV))
        .withColumn("n", sum(col("cnt")).over(whole))
        .agg(thCols.head, thCols.tail: _*)
      def quartile(dim: String): Column =
        lit(1L) + when(col(dim) > col(s"${dim}_t25"), 1L).otherwise(0L) +
          when(col(dim) > col(s"${dim}_t50"), 1L).otherwise(0L) +
          when(col(dim) > col(s"${dim}_t75"), 1L).otherwise(0L)
      u.crossJoin(broadcast(th))
        .select(col("user_id"), col("m2"),
          (quartile("r") * 100L + quartile("f") * 10L + quartile("mb"))
            .as("segment"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_users"), sum(col("m2")).as("m2_total"))
    },
    Some("""WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
           |   CAST(ROUND(value * 100) AS BIGINT) AS v2 FROM events),
           | dm AS (SELECT MAX(day) AS dmax FROM ev),
           | u AS MATERIALIZED (SELECT user_id, dmax - MAX(day) AS r,
           |   CAST(COUNT(*) AS BIGINT) AS f, CAST(SUM(v2) AS BIGINT) AS m2,
           |   CAST(SUM(v2) AS BIGINT) // 1000 AS mb
           |  FROM ev CROSS JOIN dm GROUP BY user_id, dmax),
           | n AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM u),
           | tr AS (SELECT MIN(CASE WHEN cum >= (n + 3) // 4 THEN r END)
           |    AS r_t25,
           |   MIN(CASE WHEN cum >= (n + 1) // 2 THEN r END) AS r_t50,
           |   MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN r END) AS r_t75
           |  FROM (SELECT r, CAST(SUM(COUNT(*)) OVER (ORDER BY r
           |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |     AS BIGINT) AS cum FROM u GROUP BY r) h CROSS JOIN n),
           | tf AS (SELECT MIN(CASE WHEN cum >= (n + 3) // 4 THEN f END)
           |    AS f_t25,
           |   MIN(CASE WHEN cum >= (n + 1) // 2 THEN f END) AS f_t50,
           |   MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN f END) AS f_t75
           |  FROM (SELECT f, CAST(SUM(COUNT(*)) OVER (ORDER BY f
           |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |     AS BIGINT) AS cum FROM u GROUP BY f) h CROSS JOIN n),
           | tm AS (SELECT MIN(CASE WHEN cum >= (n + 3) // 4 THEN mb END)
           |    AS mb_t25,
           |   MIN(CASE WHEN cum >= (n + 1) // 2 THEN mb END) AS mb_t50,
           |   MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN mb END) AS mb_t75
           |  FROM (SELECT mb, CAST(SUM(COUNT(*)) OVER (ORDER BY mb
           |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |     AS BIGINT) AS cum FROM u GROUP BY mb) h CROSS JOIN n),
           | seg AS (SELECT
           |   (1 + (CASE WHEN r > r_t25 THEN 1 ELSE 0 END)
           |      + (CASE WHEN r > r_t50 THEN 1 ELSE 0 END)
           |      + (CASE WHEN r > r_t75 THEN 1 ELSE 0 END)) * 100
           |   + (1 + (CASE WHEN f > f_t25 THEN 1 ELSE 0 END)
           |      + (CASE WHEN f > f_t50 THEN 1 ELSE 0 END)
           |      + (CASE WHEN f > f_t75 THEN 1 ELSE 0 END)) * 10
           |   + (1 + (CASE WHEN mb > mb_t25 THEN 1 ELSE 0 END)
           |      + (CASE WHEN mb > mb_t50 THEN 1 ELSE 0 END)
           |      + (CASE WHEN mb > mb_t75 THEN 1 ELSE 0 END)) AS segment,
           |   m2
           |  FROM u CROSS JOIN tr CROSS JOIN tf CROSS JOIN tm)
           | SELECT CAST(segment AS BIGINT) AS segment,
           |  CAST(COUNT(*) AS BIGINT) AS n_users,
           |  CAST(SUM(m2) AS BIGINT) AS m2_total
           | FROM seg GROUP BY segment""".stripMargin.replaceAll("\n", "")))

  /** q187 — peak session concurrency per day (the interval-stabbing /
    * gauge operator: how many user sessions are simultaneously open):
    * q38's gap-sessionized intervals become ±1 sweep-line deltas
    * (+1 at start_us, −1 at end_us+1), the running delta sum at each
    * change instant is the live-session gauge, and the per-day report
    * is its max. The sweep-line is THE scalable shape for interval
    * stabbing — no interval×interval overlap join exists anywhere in
    * the plan, so there is nothing quadratic to cap.
    *
    * Scale shape: a naive `SUM OVER (ORDER BY t)` is a single-partition
    * window; instead the prefix sum decomposes two-level exactly like
    * q56's token offsets — deltas collapse per instant (map-side
    * combine), the within-HOUR-bucket cumsum partitions by bucket, and
    * the carry-in is a window over the bounded hour GRID (one row per
    * hour with any session edge) broadcast back. The gate proves the
    * decomposition ≡ the oracle's direct one-window prefix sum. At even
    * larger per-hour volumes the bucket recurses to minutes — the q56
    * rule.
    */
  val qConcurrency: QuerySpec = QuerySpec(
    "q187_concurrency",
    (s, dir) => {
      val gapUs = 30L * 60 * 1000000
      val byTime = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"), col("event_id"))
      val sess = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("tus"))
        .withColumn("prev", lag(col("tus"), 1).over(byTime))
        .withColumn("new_sess",
          when(col("prev").isNull || col("tus") - col("prev") > gapUs, 1)
            .otherwise(0))
        .withColumn("session_seq", sum(col("new_sess")).over(
          byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(col("tus")).as("start_us"), max(col("tus")).as("end_us"))
      // the sessionize windows + instant collapse run ONCE: the delta
      // frame is aggregate-topped, so the carry aggregate and the
      // final join share its (t) agg exchange (r19: unflushed — the
      // parquet round trip measured slower than shuffle reuse)
      val deltas = sess
        .select(explode(array(
          struct(col("start_us").as("t"), lit(1L).as("d")),
          struct((col("end_us") + 1).as("t"), lit(-1L).as("d")))).as("x"))
        .select(col("x.t").as("t"), col("x.d").as("d"))
        .groupBy(col("t")).agg(sum(col("d")).as("d"))
        .withColumn("bucket", expr("t div 3600000000"))
      val wIn = Window.partitionBy(col("bucket")).orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wBkt = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val carry = deltas.groupBy(col("bucket")).agg(sum(col("d")).as("btot"))
        .withColumn("carry", coalesce(sum(col("btot")).over(wBkt), lit(0L)))
        .select(col("bucket"), col("carry"))
      deltas.withColumn("cum_in", sum(col("d")).over(wIn))
        .join(broadcast(carry), Seq("bucket"))
        .select(col("t"), (col("carry") + col("cum_in")).as("conc"))
        .groupBy(expr("t div 86400000000").as("day"))
        .agg(max(col("conc")).as("peak"), count(lit(1)).as("n_changes"))
    },
    Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus
           |  FROM events),
           | l AS (SELECT *, lag(tus) OVER (
           |   PARTITION BY user_id ORDER BY tus, event_id) AS prev FROM e),
           | n AS (SELECT *, CASE WHEN prev IS NULL OR tus - prev > 1800000000
           |   THEN 1 ELSE 0 END AS new_sess FROM l),
           | sq AS (SELECT *, CAST(SUM(new_sess) OVER (
           |   PARTITION BY user_id ORDER BY tus, event_id
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |   AS session_seq FROM n),
           | sess AS MATERIALIZED (SELECT user_id, session_seq,
           |   MIN(tus) AS start_us, MAX(tus) AS end_us
           |  FROM sq GROUP BY user_id, session_seq),
           | d AS (SELECT t, CAST(SUM(d) AS BIGINT) AS d FROM (
           |   SELECT start_us AS t, CAST(1 AS BIGINT) AS d FROM sess
           |   UNION ALL SELECT end_us + 1, CAST(-1 AS BIGINT) FROM sess) u
           |  GROUP BY t),
           | c AS (SELECT t, CAST(SUM(d) OVER (ORDER BY t
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |   AS conc FROM d)
           | SELECT t // 86400000000 AS day, MAX(conc) AS peak,
           |  CAST(COUNT(*) AS BIGINT) AS n_changes
           | FROM c GROUP BY day""".stripMargin.replaceAll("\n", "")))

  /** q192 — CUSUM changepoint detection on the daily event series
    * (Page 1954, the classic sequential drift detector): per event
    * type, the dense per-day count series (zero-filled — a silent day
    * IS signal), one-sided upper/lower CUSUM statistics against the
    * per-type mean with 5% drift allowance, and an alarm flag at the
    * conventional 4k decision interval. This is the level-shift
    * detector the distribution-drift family (q115/q128/q149) lacks: it
    * localizes WHEN a source's volume broke, not just that two
    * snapshots differ.
    *
    * The CUSUM recursion `s_d = max(0, s_{d−1} + e_d)` is not a plain
    * window aggregate — it ships via the prefix-sum identity
    * `s_d = p_d − min(0, min_{j≤d} p_j)` (p = running sum of e), two
    * stacked windows over the SAME partitioning, so Catalyst plans one
    * exchange. All arithmetic is integer (μ = total div days,
    * k = max(μ div 20, 1)), bit-exact on both engines.
    *
    * Scale shape: one corpus-keyed (type, day) count agg (map-side
    * combine) collapses everything to the bounded type×day GRID; the
    * dense grid cross-join, the windows, and the single-row-per-type μ
    * broadcast all run on that grid, never on events. The grid is
    * bounded by the calendar, not the corpus.
    */
  val qCusumChangepoint: QuerySpec = QuerySpec(
    "q192_cusum_changepoint",
    (s, dir) => {
      // ONE corpus agg; types/days derive from the grid-sized count
      // frame, every branch reusing its exchange (r19: unflushed —
      // see [[denseDayGrid]] for the subtree-alignment discipline)
      val counts = eventDayCounts(Tables.load(s, dir, "events"))
      val grid = denseDayGrid(counts)
      val mu = grid.groupBy(col("event_type"))
        .agg(sum(col("x")).as("tot"), count(lit(1)).as("nd"))
        .select(col("event_type"), expr("tot div nd").as("mu"))
        .withColumn("k", greatest(expr("mu div 20"), lit(1L)))
      val wCum = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(broadcast(mu), Seq("event_type"))
        .withColumn("p_up", sum(col("x") - col("mu") - col("k")).over(wCum))
        .withColumn("p_dn", sum(col("mu") - col("k") - col("x")).over(wCum))
        .withColumn("cusum_up",
          col("p_up") - least(lit(0L), min(col("p_up")).over(wCum)))
        .withColumn("cusum_dn",
          col("p_dn") - least(lit(0L), min(col("p_dn")).over(wCum)))
        .select(col("event_type"), col("day"), col("x"),
          col("cusum_up"), col("cusum_dn"),
          when(col("cusum_up") > lit(4L) * col("k") ||
            col("cusum_dn") > lit(4L) * col("k"), 1L).otherwise(0L)
            .as("alarm"))
    },
    Some("""WITH e AS MATERIALIZED (SELECT event_type,
           |   epoch_us(ts) // 86400000000 AS day FROM events),
           | cnt AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
           |  FROM e GROUP BY 1, 2),
           | grid AS MATERIALIZED (SELECT t.event_type, d.day,
           |   COALESCE(c.x, CAST(0 AS BIGINT)) AS x
           |  FROM (SELECT DISTINCT event_type FROM e) t
           |  CROSS JOIN (SELECT DISTINCT day FROM e) d
           |  LEFT JOIN cnt c ON c.event_type = t.event_type
           |   AND c.day = d.day),
           | mk AS (SELECT event_type,
           |   CAST(SUM(x) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS mu,
           |   GREATEST(CAST(SUM(x) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
           |    // 20, CAST(1 AS BIGINT)) AS k
           |  FROM grid GROUP BY event_type),
           | p AS (SELECT g.event_type, g.day, g.x, m.k,
           |   CAST(SUM(g.x - m.mu - m.k) OVER w AS BIGINT) AS p_up,
           |   CAST(SUM(m.mu - m.k - g.x) OVER w AS BIGINT) AS p_dn
           |  FROM grid g JOIN mk m ON g.event_type = m.event_type
           |  WINDOW w AS (PARTITION BY g.event_type ORDER BY g.day
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           | c2 AS (SELECT event_type, day, x, k,
           |   p_up - LEAST(CAST(0 AS BIGINT), MIN(p_up) OVER w) AS cusum_up,
           |   p_dn - LEAST(CAST(0 AS BIGINT), MIN(p_dn) OVER w) AS cusum_dn
           |  FROM p
           |  WINDOW w AS (PARTITION BY event_type ORDER BY day
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           | SELECT event_type, day, x, cusum_up, cusum_dn,
           |  CASE WHEN cusum_up > 4 * k OR cusum_dn > 4 * k
           |   THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS alarm
           | FROM c2""".stripMargin.replaceAll("\n", "")))

  /** q199 — top session paths (sequence mining over q38's sessions):
    * each session's first three event types, in exact time order, as a
    * `a>b>c` path string; the 10 most frequent paths with exact counts
    * — the entry-flow report behind every "how do users start a
    * session" dashboard, and the prefix-path complement of q109's
    * Markov transition pairs (q109 says which step follows which, this
    * says which whole OPENINGS dominate).
    *
    * Scale shape: one sessionize window (the q38 shuffle), a row_number
    * ≤ 3 filter that drops everything past each session's third event
    * BEFORE the per-session collapse, a conditional-min pivot (no
    * collect_list — order is explicit, never array-encoding-dependent),
    * a map-side-combinable path count, and a distributed TakeOrdered 10
    * with the path string as the unique tiebreak.
    */
  val qSessionPaths: QuerySpec = QuerySpec(
    "q199_session_paths",
    (s, dir) => {
      val gapUs = 30L * 60 * 1000000
      val byTime = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"), col("event_id"))
      val sess = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("tus"))
        .withColumn("prev", lag(col("tus"), 1).over(byTime))
        .withColumn("new_sess",
          when(col("prev").isNull || col("tus") - col("prev") > gapUs, 1)
            .otherwise(0))
        .withColumn("session_seq", sum(col("new_sess")).over(
          byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"), col("session_seq"))
            .orderBy(col("tus"), col("event_id"))))
        .filter(col("rn") <= 3)
      val paths = sess
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(when(col("rn") === 1, col("event_type"))).as("e1"),
          min(when(col("rn") === 2, col("event_type"))).as("e2"),
          min(when(col("rn") === 3, col("event_type"))).as("e3"))
        .select(concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      paths
        .withColumn("rank", row_number().over(
          Window.orderBy(col("n_sessions").desc, col("path"))))
        .filter(col("rank") <= 10)
    },
    Some("""WITH e AS (SELECT user_id, event_id, event_type,
           |   epoch_us(ts) AS tus FROM events),
           | l AS (SELECT *, lag(tus) OVER (
           |   PARTITION BY user_id ORDER BY tus, event_id) AS prev FROM e),
           | n AS (SELECT *, CASE WHEN prev IS NULL OR tus - prev > 1800000000
           |   THEN 1 ELSE 0 END AS new_sess FROM l),
           | sq AS (SELECT *, CAST(SUM(new_sess) OVER (
           |   PARTITION BY user_id ORDER BY tus, event_id
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |   AS session_seq FROM n),
           | r AS (SELECT *, row_number() OVER (
           |   PARTITION BY user_id, session_seq ORDER BY tus, event_id)
           |   AS rn FROM sq),
           | p AS (SELECT concat_ws('>',
           |    MIN(CASE WHEN rn = 1 THEN event_type END),
           |    MIN(CASE WHEN rn = 2 THEN event_type END),
           |    MIN(CASE WHEN rn = 3 THEN event_type END)) AS path
           |  FROM r WHERE rn <= 3 GROUP BY user_id, session_seq),
           | c AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
           |  FROM p GROUP BY path),
           | t AS (SELECT path, n_sessions, CAST(row_number() OVER (
           |   ORDER BY n_sessions DESC, path) AS INTEGER) AS rank FROM c)
           | SELECT path, n_sessions, rank FROM t
           | WHERE rank <= 10""".stripMargin.replaceAll("\n", "")))

  /** q200 — conversion-lag percentiles (how long from first view to
    * first purchase): per converting user the exact µs lag between
    * their earliest view and the earliest purchase strictly after it
    * (q53's chaining rule — a purchase BEFORE any view is not a
    * conversion), then exact p50/p90 of the lag distribution plus the
    * converting-user count — the time-to-convert report a funnel (q53,
    * which counts stages) doesn't give.
    *
    * Scale shape: two per-user min-aggregates (map-side combine) and
    * one user-keyed equi-join; the percentile pass is the q39/q163
    * histogram discipline over lags bucketed to SECONDS (the q104
    * bounded-grid rule: percentile resolution at 1 s, never a
    * user-cardinality sort).
    */
  val qConversionLag: QuerySpec = QuerySpec(
    "q200_conversion_lag",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("tus"))
      val firstView = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("tus")).as("v"))
      val lags = e.filter(col("event_type") === "purchase")
        .join(firstView, Seq("user_id"))
        .filter(col("tus") > col("v"))
        .groupBy(col("user_id")).agg(min(expr("tus - v")).as("lag_us"))
        .select(expr("lag_us div 1000000").as("lag_s"))
      val byLag = Window.orderBy(col("lag_s"))
        .rowsBetween(Window.unboundedPreceding, 0)
      lags.groupBy(col("lag_s")).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(byLag))
        .withColumn("n", sum(col("c")).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        .agg(max(col("n")).as("n_converted"),
          min(when(col("cum") >= expr("(n + 1) div 2"), col("lag_s")))
            .as("p50_lag_s"),
          min(when(col("cum") >= expr("(9 * n + 9) div 10"), col("lag_s")))
            .as("p90_lag_s"))
    },
    Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus
           |  FROM events),
           | fv AS (SELECT user_id, MIN(tus) AS v FROM e
           |  WHERE event_type = 'view' GROUP BY user_id),
           | lg AS (SELECT (MIN(e.tus - fv.v)) // 1000000 AS lag_s
           |  FROM e JOIN fv ON e.user_id = fv.user_id
           |  WHERE e.event_type = 'purchase' AND e.tus > fv.v
           |  GROUP BY e.user_id),
           | h AS (SELECT lag_s, CAST(COUNT(*) AS BIGINT) AS c FROM lg
           |  GROUP BY lag_s),
           | cw AS (SELECT lag_s, c,
           |   CAST(SUM(c) OVER (ORDER BY lag_s
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |    AS cum,
           |   CAST(SUM(c) OVER () AS BIGINT) AS n FROM h)
           | SELECT CAST(SUM(c) AS BIGINT) AS n_converted,
           |  MIN(CASE WHEN cum >= (n + 1) // 2 THEN lag_s END) AS p50_lag_s,
           |  MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN lag_s END)
           |   AS p90_lag_s
           | FROM cw""".stripMargin.replaceAll("\n", "")))

  /** q201 — daily-count autocorrelation at lags 1 and 7 (the
    * seasonality detector beside q192's level-shift detector: lag-1
    * says momentum/burstiness day-to-day, lag-7 says weekly cycle):
    * per event type over the dense zero-filled day grid, the exact
    * integer-rational ACF — multiply the textbook estimator through by
    * n² so every term is integer: with T = Σx,
    * `num = Σ (n·x_t − T)(n·x_{t+k} − T)`, `den = Σ (n·x_t − T)²`,
    * shipped as `num·10⁶ div den`. num may be negative — Spark `div`
    * and DuckDB integer `//` BOTH truncate toward zero (the probed
    * q110 rule), so the gate stays bit-exact. BIGINT holds to
    * n·x ≈ 3·10⁹ per day-cell; past that the moments graduate to
    * DECIMAL(38), the q63 rule.
    *
    * Scale shape: ONE corpus-keyed (type, day) count agg (flushed — it
    * feeds the grid, the totals, and both lag joins); the dense grid,
    * the single-row-per-type totals broadcast, and the lag-k
    * equi-joins (day+k, never a window spill) all run on the
    * calendar-bounded grid.
    */
  val qDailyAutocorr: QuerySpec = QuerySpec(
    "q201_daily_autocorr",
    (s, dir) => {
      // r19: unflushed — branches reuse the one agg exchange (see
      // [[denseDayGrid]] for the subtree-alignment discipline).
      // The no-op shift filters (day is never null) are stated BELOW
      // the grid's branch point: each lag join infers
      // IsNotNull(day − k) on its shifted branch and pushes it into
      // that branch's counts subtree, which would make the grid
      // branches unequal and block exchange reuse (3 events scans);
      // stating both shifts on the shared counts frame keeps every
      // branch canonically equal.
      val counts = eventDayCounts(Tables.load(s, dir, "events"))
        .filter((col("day") - lit(1L)).isNotNull &&
          (col("day") - lit(7L)).isNotNull)
      val grid = denseDayGrid(counts)
      val tot = grid.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("t"))
      val g = grid.join(broadcast(tot), Seq("event_type"))
        .select(col("event_type"), col("day"), col("n"),
          expr("n * x - t").as("d"))
      val lags = Seq(1L, 7L).map { k =>
        g.join(g.select(col("event_type"), (col("day") - k).as("day"),
            col("d").as("d2")), Seq("event_type", "day"))
          .groupBy(col("event_type"))
          .agg(max(col("n")).as("n_days"), sum(expr("d * d2")).as("num"))
          .withColumn("lag", lit(k))
      }
      val den = g.groupBy(col("event_type"))
        .agg(sum(expr("d * d")).as("den"))
      lags.reduce(_ unionByName _)
        .join(broadcast(den), Seq("event_type"))
        .select(col("event_type"), col("lag"), col("n_days"),
          when(col("den") > 0, expr("(num * 1000000) div den"))
            .as("acf_e6"))
    },
    Some("""WITH e AS (SELECT event_type,
           |   epoch_us(ts) // 86400000000 AS day FROM events),
           | cnt AS MATERIALIZED (SELECT event_type, day,
           |   CAST(COUNT(*) AS BIGINT) AS x FROM e GROUP BY 1, 2),
           | grid AS (SELECT t.event_type, d.day,
           |   COALESCE(c.x, CAST(0 AS BIGINT)) AS x
           |  FROM (SELECT DISTINCT event_type FROM cnt) t
           |  CROSS JOIN (SELECT DISTINCT day FROM cnt) d
           |  LEFT JOIN cnt c ON c.event_type = t.event_type
           |   AND c.day = d.day),
           | tt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           |   CAST(SUM(x) AS BIGINT) AS t FROM grid GROUP BY 1),
           | g AS MATERIALIZED (SELECT grid.event_type, day, n,
           |   n * x - t AS d
           |  FROM grid JOIN tt ON grid.event_type = tt.event_type),
           | den AS (SELECT event_type, CAST(SUM(d * d) AS BIGINT) AS den
           |  FROM g GROUP BY 1),
           | nums AS (
           |  SELECT a.event_type, CAST(1 AS BIGINT) AS lag,
           |   MAX(a.n) AS n_days, CAST(SUM(a.d * b.d) AS BIGINT) AS num
           |  FROM g a JOIN g b ON a.event_type = b.event_type
           |   AND b.day = a.day + 1 GROUP BY a.event_type
           |  UNION ALL
           |  SELECT a.event_type, CAST(7 AS BIGINT), MAX(a.n),
           |   CAST(SUM(a.d * b.d) AS BIGINT)
           |  FROM g a JOIN g b ON a.event_type = b.event_type
           |   AND b.day = a.day + 7 GROUP BY a.event_type)
           | SELECT nums.event_type AS event_type, lag, n_days,
           |  CASE WHEN den > 0
           |   THEN CAST((num * 1000000) // den AS BIGINT) END AS acf_e6
           | FROM nums JOIN den
           |  ON nums.event_type = den.event_type""".stripMargin
      .replaceAll("\n", "")))

  /** q202 — day-of-week activity profile (the seasonality REPORT next
    * to q201's seasonality test): per (event_type, weekday) the event
    * count and exact e6 share of the type's volume, plus a peak-day
    * flag — the shape a capacity planner and an anomaly baseline both
    * read. Weekday is derived arithmetically from the epoch-day index
    * (`(day + 4) % 7`, day 0 = Thursday ⇒ 0 = Sunday… 6 = Saturday), not
    * from locale-dependent date functions, so both engines agree by
    * construction.
    *
    * Scale shape: one corpus-keyed (type, dow) count agg (map-side
    * combine, ≤ types×7 groups); shares and the peak flag are windows
    * over that bounded grid.
    */
  val qDowProfile: QuerySpec = QuerySpec(
    "q202_dow_profile",
    (s, dir) => {
      val h = Tables.load(s, dir, "events")
        .select(col("event_type"),
          expr("((unix_micros(ts) div 86400000000) + 4) % 7").as("dow"))
        .groupBy(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("n"))
      val whole = Window.partitionBy(col("event_type"))
      h.withColumn("tot", sum(col("n")).over(whole))
        .withColumn("mx", max(col("n")).over(whole))
        .select(col("event_type"), col("dow"), col("n"),
          expr("(n * 1000000) div tot").as("share_e6"),
          when(col("n") === col("mx"), 1L).otherwise(0L).as("is_peak"))
    },
    Some("""WITH h AS (SELECT event_type,
           |   ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
           |   CAST(COUNT(*) AS BIGINT) AS n
           |  FROM events GROUP BY 1, 2),
           | w AS (SELECT event_type, dow, n,
           |   CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot,
           |   CAST(MAX(n) OVER (PARTITION BY event_type) AS BIGINT) AS mx
           |  FROM h)
           | SELECT event_type, dow, n,
           |  CAST((n * 1000000) // tot AS BIGINT) AS share_e6,
           |  CASE WHEN n = mx THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
           |   END AS is_peak
           | FROM w""".stripMargin.replaceAll("\n", "")))

  /** q210 — forecast-baseline evaluation per event type: relative MAE
    * of the seasonal-naive-7 forecast (x̂_t = x_{t−7}) against naive-1
    * (x̂_t = x_{t−1}) over the dense daily grid — the model-selection
    * readout behind every capacity plan and anomaly baseline: rel < 1e6
    * says last week beats yesterday (weekly seasonality is real, q201's
    * acf(7) made operational), rel > 1e6 says the series is trend/noise
    * dominated and a seasonal baseline would HURT. The comparison is
    * Hyndman's MASE family with the naive-1 error as the scale
    * denominator — ratio-of-|error|-sums, so it stays log-free and
    * integer-exact (banned `ln`/`exp` never enter).
    *
    * Semantics: q201's dense grid (zero-filled common day range — lag
    * means CALENDAR days, not observation rows); both forecasters are
    * scored on the SAME eval window, day ≥ d0+7, so neither gets free
    * days. rel_mae_e6 is NULL when the naive-1 error sum is zero (a
    * constant series — scale-free comparison undefined, both engines
    * agree via the guard).
    *
    * Scale shape: ONE events scan into a (type, day) hash agg (map-side
    * combine absorbs the corpus), scratch-flushed for its grid build;
    * everything after — the zero-fill grid (types × days, a bounded
    * summary cross under explicit broadcast: the PlanLint-whitelisted
    * q201 shape), the per-type lag windows, the per-type agg — runs
    * over the days×types frame, which grows with TIME, not event
    * volume.
    */
  val qForecastEval: QuerySpec = QuerySpec(
    "q210_forecast_eval",
    (s, dir) => {
      // r19: unflushed — branches reuse the one agg exchange (see
      // [[denseDayGrid]] for the subtree-alignment discipline)
      val counts = eventDayCounts(Tables.load(s, dir, "events"))
      val grid = denseDayGrid(counts)
      val wT = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val wAll = Window.partitionBy(col("event_type"))
      grid
        .withColumn("l1", lag(col("x"), 1).over(wT))
        .withColumn("l7", lag(col("x"), 7).over(wT))
        .withColumn("d0", min(col("day")).over(wAll))
        .filter(col("day") >= col("d0") + 7)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_eval_days"),
          sum(abs(col("x") - col("l1"))).as("abs_err_naive1"),
          sum(abs(col("x") - col("l7"))).as("abs_err_seasonal7"))
        .select(col("event_type"), col("n_eval_days"),
          col("abs_err_naive1"), col("abs_err_seasonal7"),
          when(col("abs_err_naive1") > 0,
            expr("(1000000 * abs_err_seasonal7) div abs_err_naive1"))
            .as("rel_mae_e6"))
    },
    Some("""WITH e AS (SELECT event_type,
           |   epoch_us(ts) // 86400000000 AS day FROM events),
           | cnt AS MATERIALIZED (SELECT event_type, day,
           |   CAST(COUNT(*) AS BIGINT) AS x FROM e GROUP BY 1, 2),
           | grid AS (SELECT t.event_type, d.day,
           |   COALESCE(c.x, CAST(0 AS BIGINT)) AS x
           |  FROM (SELECT DISTINCT event_type FROM cnt) t
           |  CROSS JOIN (SELECT DISTINCT day FROM cnt) d
           |  LEFT JOIN cnt c ON c.event_type = t.event_type
           |   AND c.day = d.day),
           | lg AS (SELECT event_type, day, x,
           |   lag(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS l1,
           |   lag(x, 7) OVER (PARTITION BY event_type ORDER BY day) AS l7,
           |   MIN(day) OVER (PARTITION BY event_type) AS d0
           |  FROM grid)
           | SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_eval_days,
           |  CAST(SUM(ABS(x - l1)) AS BIGINT) AS abs_err_naive1,
           |  CAST(SUM(ABS(x - l7)) AS BIGINT) AS abs_err_seasonal7,
           |  CASE WHEN CAST(SUM(ABS(x - l1)) AS BIGINT) > 0 THEN
           |   CAST((1000000 * CAST(SUM(ABS(x - l7)) AS BIGINT))
           |    // CAST(SUM(ABS(x - l1)) AS BIGINT) AS BIGINT) END
           |   AS rel_mae_e6
           | FROM lg WHERE day >= d0 + 7
           | GROUP BY event_type""".stripMargin.replaceAll("\n", "")))

  /** q214 — EWMA anomaly bands per event type: exponentially-weighted
    * moving level s_t and mean-absolute-deviation d_t over the dense
    * daily grid, with a day flagged anomalous when its count departs
    * from yesterday's level by more than 3 deviation bands — the
    * standard streaming telemetry monitor (Roberts 1959's EWMA control
    * chart, deviation-banded), completing the time-series family's
    * detection axis: q192's CUSUM finds the persistent LEVEL SHIFT,
    * this flags the single-day SPIKE/DROP; q210 says which baseline to
    * trust, q202 what shape a normal week has.
    *
    * Exactness: the recurrence is 1e-4 fixed-point integer — α = 1/8 as
    * s_t = (7·s_{t−1} + 10⁴·x_t) div 8, d_t = (7·d_{t−1} +
    * |10⁴·x_t − s_{t−1}|) div 8, seeds s_0 = 10⁴·x_0, d_0 = 0 — so both
    * engines walk bit-identical states (truncating `div` on
    * non-negatives ≡ `//`; no libm anywhere). The flag needs t ≥ 7
    * (warm-up) and an absolute floor of 2 events (err ≥ 2·10⁴) so a
    * constant series' zero deviation doesn't flag one-event noise.
    * Truncating integer division makes the recurrence non-linear, so
    * NO window/prefix-sum form exists — this is genuinely sequential
    * per type, which is why it folds.
    *
    * Scale shape: ONE events scan into the (type, day) hash agg
    * (map-side combine absorbs event volume), scratch-flushed for its
    * three grid consumers; the zero-fill grid is the q210
    * PlanLint-whitelisted bounded-summary cross. The fold then runs
    * per type over the day-ordered count list — an interpreted
    * higher-order `aggregate`, deliberately: the frame is one row per
    * event TYPE with a calendar-sized list, growing with TIME, not
    * event volume (the q26 HOF ban is about per-document hot paths;
    * a types-sized frame is the cheap side of that line). The oracle
    * walks the identical recurrence as one RECURSIVE CTE advancing
    * every type one day per step (the q207 discipline — never a
    * multi-row `list_reduce`).
    */
  /** The (event_type, day, x) daily count summary of an event frame —
    * ADDITIVE (counts of disjoint slices merge by per-cell sum), which
    * is what lets [[graft.streaming.AnomalyStream]] fold one bounded
    * summary per arriving batch and still serve the exact q214 report.
    */
  private[graft] def eventDayCounts(events: DataFrame): DataFrame =
    events
      // explicit (no-op — event_type is a required column): joins on
      // event_type in SOME consumer branches infer and push this
      // predicate below the aggregate; stating it on every branch
      // keeps the scan subtrees canonically equal so exchange reuse
      // dedupes them to one events pass (r19)
      .filter(col("event_type").isNotNull)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      // the grid's left join infers IsNotNull(day) on its probe branch
      // only — stated explicitly for the same one-scan reason
      .filter(col("day").isNotNull)
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("x"))

  /** Dense zero-filled (event_type × day) grid over an
    * (event_type, day, x) count frame — the calendar-completion every
    * daily-series operator (q192/q201/q210/q214/q220) starts from,
    * sharing the count frame's ONE aggregate exchange across all three
    * plan references. The `x > 0` filters are no-ops (x counts rows,
    * so x ≥ 1 on every input row); they exist to REFERENCE x in the
    * key-derivation branches, which stops the optimizer from
    * collapsing the aggregate out of those branches
    * (RemoveRedundantAggregates + column pruning would otherwise
    * rewrite `counts.select(k).distinct()` into a separate raw scan) —
    * with the reference, the three subtrees stay canonically equal and
    * exchange reuse dedupes them to ONE corpus pass (r19; verified on
    * the static plan, AQE off).
    */
  private[graft] def denseDayGrid(counts: DataFrame): DataFrame =
    counts.filter(col("x") > 0).select(col("event_type")).distinct()
      .crossJoin(broadcast(
        counts.filter(col("x") > 0).select(col("day")).distinct()))
      .join(counts, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("x"), lit(0L)).as("x"))

  /** q214's recurrence over a MATERIALIZED (event_type, day, x) count
    * frame — zero-fill grid + per-type integer EWMA fold, shared by the
    * gated query and [[graft.streaming.AnomalyStream]] serving so the
    * streamed and batch anomaly boards can never fork.
    */
  private[graft] def ewmaFromCounts(counts: DataFrame): DataFrame = {
      val grid = denseDayGrid(counts)
      grid
        .groupBy(col("event_type"))
        .agg(sort_array(collect_list(struct(col("day"), col("x"))))
          .as("xs"))
        .select(col("event_type"), explode(expr(
          """aggregate(xs,
            | cast(array() as
            |  array<struct<day:bigint,x:bigint,s:bigint,d:bigint,a:bigint>>),
            | (acc, e) -> concat(acc, array(if(size(acc) = 0,
            |  named_struct('day', e.day, 'x', e.x, 's', 10000 * e.x,
            |   'd', cast(0 as bigint), 'a', cast(0 as bigint)),
            |  named_struct('day', e.day, 'x', e.x,
            |   's', (7 * (element_at(acc, -1)).s + 10000 * e.x) div 8,
            |   'd', (7 * (element_at(acc, -1)).d
            |     + abs(10000 * e.x - (element_at(acc, -1)).s)) div 8,
            |   'a', if(size(acc) >= 7
            |     and abs(10000 * e.x - (element_at(acc, -1)).s)
            |       > 3 * (element_at(acc, -1)).d
            |     and abs(10000 * e.x - (element_at(acc, -1)).s) >= 20000,
            |    cast(1 as bigint), cast(0 as bigint)))))))""".stripMargin
            .replaceAll("\n", ""))))
        .select(col("event_type"), col("col.day").as("day"),
          col("col.x").as("x"), col("col.s").as("ewma_e4"),
          col("col.d").as("dev_e4"), col("col.a").as("anomaly"))
  }

  val qEwmaAnomaly: QuerySpec = QuerySpec(
    "q214_ewma_anomaly",
    // r19: unflushed — aggregate-topped, branches reuse the exchange
    (s, dir) => ewmaFromCounts(
      eventDayCounts(Tables.load(s, dir, "events"))),
    Some("""WITH RECURSIVE e AS (SELECT event_type,
           |   epoch_us(ts) // 86400000000 AS day FROM events),
           | cnt AS MATERIALIZED (SELECT event_type, day,
           |   CAST(COUNT(*) AS BIGINT) AS x FROM e GROUP BY 1, 2),
           | dd AS MATERIALIZED (SELECT day,
           |   CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT) AS t
           |  FROM (SELECT DISTINCT day FROM cnt)),
           | grid AS MATERIALIZED (SELECT ty.event_type, dd.day, dd.t,
           |   COALESCE(c.x, CAST(0 AS BIGINT)) AS x
           |  FROM (SELECT DISTINCT event_type FROM cnt) ty
           |  CROSS JOIN dd
           |  LEFT JOIN cnt c ON c.event_type = ty.event_type
           |   AND c.day = dd.day),
           | rec(event_type, t, day, x, s, d, a) AS (
           |  SELECT event_type, t, day, x, 10000 * x,
           |    CAST(0 AS BIGINT), CAST(0 AS BIGINT)
           |   FROM grid WHERE t = 0
           |  UNION ALL
           |  SELECT g.event_type, g.t, g.day, g.x,
           |   CAST((7 * r.s + 10000 * g.x) // 8 AS BIGINT),
           |   CAST((7 * r.d + abs(10000 * g.x - r.s)) // 8 AS BIGINT),
           |   CAST(CASE WHEN g.t >= 7
           |     AND abs(10000 * g.x - r.s) > 3 * r.d
           |     AND abs(10000 * g.x - r.s) >= 20000
           |    THEN 1 ELSE 0 END AS BIGINT)
           |  FROM rec r JOIN grid g ON g.event_type = r.event_type
           |   AND g.t = r.t + 1)
           | SELECT event_type, day, x, CAST(s AS BIGINT) AS ewma_e4,
           |  CAST(d AS BIGINT) AS dev_e4, CAST(a AS BIGINT) AS anomaly
           | FROM rec""".stripMargin.replaceAll("\n", "")))

  private val StationarySteps = 8

  /** q219 — Markov stationary distribution of the event-type chain:
    * where does the process SPEND ITS TIME in the long run, the
    * one-step q109 transition matrix iterated to its fixed point — the
    * occupancy readout behind session mix planning (q109 says what
    * follows what; this says what fraction of all activity each type
    * converges to). Power iteration for a FIXED [[StationarySteps]]
    * rounds in 1e-6 fixed point: π₀ = 10⁶ div n uniform,
    * π_{k+1}(j) = (Σ_i π_k(i)·ppm(i,j)) div 10⁶ — ONE truncating
    * division per (round, state), after the exact integer sum, so both
    * engines walk bit-identical vectors (Σπ decays by ≤ n per round —
    * the price of exactness, identical on both sides). Types observed
    * only as destinations get a 10⁶ self-loop (the standard absorbing
    * patch) so no probability mass silently leaks.
    *
    * Scale shape: the transition matrix is the gated q109 plan
    * collapsed to ≤ types² rows — collected and iterated DRIVER-SIDE
    * as exact longs, the q120/q141 bounded-collect rule (a types²
    * literal is cheaper than 8 rounds of joined subplans; the corpus
    * is touched exactly once, by q109's one lag-window pass). The
    * oracle unrolls the identical rounds as MATERIALIZED CTEs.
    */
  val qMarkovStationary: QuerySpec = QuerySpec(
    "q219_markov_stationary",
    (s, dir) => {
      import s.implicits._
      val pm = transitionPpm(s, dir)
        .select(col("src"), col("dst"), col("ppm")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val states = (pm.map(_._1) ++ pm.map(_._2)).distinct.sorted
      val idx = states.zipWithIndex.toMap
      val n = states.length
      val hasOut = pm.map(_._1).toSet
      val full = pm.toSeq ++
        states.filterNot(hasOut).map(t => (t, t, 1000000L))
      val mat = Array.ofDim[Long](n, n)
      full.foreach { case (a, b, w) => mat(idx(a))(idx(b)) += w }
      var pi = Array.fill(n)(1000000L / n)
      for (_ <- 1 to StationarySteps) {
        val nx = Array.fill(n)(0L)
        for (i <- 0 until n; j <- 0 until n) nx(j) += pi(i) * mat(i)(j)
        pi = nx.map(_ / 1000000L)
      }
      states.zipWithIndex.map { case (t, i) => (t, pi(i)) }
        .toSeq.toDF("event_type", "pi_e6")
    },
    Some {
      val rounds = (1 to StationarySteps).map { k =>
        s""" k$k AS MATERIALIZED (SELECT pm.dst AS ty,
           |  CAST(SUM(k.pi * pm.ppm) // 1000000 AS BIGINT) AS pi
           |  FROM pm JOIN k${k - 1} k ON k.ty = pm.src
           |  GROUP BY pm.dst)""".stripMargin
      }.mkString(",")
      s"""WITH $transSqlCtes,
         | st AS MATERIALIZED (SELECT DISTINCT ty FROM
         |  (SELECT src AS ty FROM p UNION SELECT dst FROM p)),
         | nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n
         |  FROM st),
         | pm AS MATERIALIZED (
         |  SELECT p.src, p.dst,
         |    CAST((p.cnt * 1000000) // t.total AS BIGINT) AS ppm
         |   FROM p JOIN t ON p.src = t.src
         |  UNION ALL
         |  SELECT s.ty, s.ty, CAST(1000000 AS BIGINT) FROM st s
         |   WHERE s.ty NOT IN (SELECT src FROM p)),
         | k0 AS MATERIALIZED (SELECT ty,
         |   CAST(1000000 // n AS BIGINT) AS pi FROM st, nn),
         |$rounds
         | SELECT st.ty AS event_type,
         |  COALESCE(k$StationarySteps.pi, CAST(0 AS BIGINT)) AS pi_e6
         | FROM st LEFT JOIN k$StationarySteps
         |  ON k$StationarySteps.ty = st.ty""".stripMargin
        .replaceAll("\n", "")
    })

  /** q220 — weekly seasonality STRENGTH per event type: the
    * variance-decomposition number behind the family's other readouts
    * (q201 tests whether acf(7) is nonzero, q202 draws the weekday
    * profile, q210 scores the seasonal forecaster — this one says how
    * much of the daily variance the weekday profile EXPLAINS):
    * strength = 1 − SS_within-weekday / SS_total over the dense daily
    * grid, Hyndman's seasonal-strength measure with the dow-mean fit.
    * ≈ 0: the weekday profile is noise (drop the seasonal model);
    * → 1: the calendar explains nearly everything.
    *
    * Exactness: SS_total = (n·Σx² − T²)/n and SS_within =
    * Σ_d (c_d·Σ_{t∈d}x² − S_d²)/c_d are rationals with small
    * denominators — each is shipped e6 fixed-point with ONE truncating
    * division per term (per type for SS_total, per (type, weekday) for
    * SS_within, summed as integers — order-insensitive), and the final
    * ratio is one more `div`. Truncation can push ss_within_e6 a few
    * units past ss_total_e6 on a perfectly-fit series (strength then
    * dips microscopically below 0) — deterministic and identical on
    * both engines, the price of exactness. Weekday from the arithmetic
    * epoch-day index ((day+4) % 7), the q202 convention. BIGINT to
    * ~10⁹ events/day·type at e6; past that the q63 DECIMAL graduation.
    *
    * Scale shape: ONE events scan into the flushed (type, day) agg
    * (shared eventDayCounts), the q210/q214 zero-fill grid
    * (PlanLint-whitelisted bounded cross), then two aggs over the
    * days×types frame — grows with TIME, not event volume.
    */
  val qSeasonalStrength: QuerySpec = QuerySpec(
    "q220_seasonal_strength",
    (s, dir) => {
      // r19: both flushes removed — all grid references reuse the one
      // agg exchange (see [[denseDayGrid]]); the grid join above it is
      // calendar-bounded, so its per-branch re-execution is cheaper
      // than two parquet round trips
      val counts = eventDayCounts(Tables.load(s, dir, "events"))
      val grid = denseDayGrid(counts)
        .withColumn("dow", expr("(day + 4) % 7"))
      val tot = grid.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("t"),
          sum(col("x") * col("x")).as("sx2"))
        .select(col("event_type"), col("n"),
          expr("(1000000 * (n * sx2 - t * t)) div n").as("ss_total_e6"))
      val within = grid.groupBy(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("cd"), sum(col("x")).as("sd"),
          sum(col("x") * col("x")).as("sxd2"))
        .select(col("event_type"),
          expr("(1000000 * (cd * sxd2 - sd * sd)) div cd").as("w"))
        .groupBy(col("event_type"))
        .agg(sum(col("w")).as("ss_within_e6"))
      tot.join(within, Seq("event_type"))
        .select(col("event_type"), col("n").as("n_days"),
          col("ss_total_e6"), col("ss_within_e6"),
          when(col("ss_total_e6") > 0,
            expr("""(1000000 * (ss_total_e6 - ss_within_e6))
                   | div ss_total_e6""".stripMargin.replaceAll("\n", "")))
            .as("strength_e6"))
    },
    Some("""WITH e AS (SELECT event_type,
           |   epoch_us(ts) // 86400000000 AS day FROM events),
           | cnt AS MATERIALIZED (SELECT event_type, day,
           |   CAST(COUNT(*) AS BIGINT) AS x FROM e GROUP BY 1, 2),
           | grid AS MATERIALIZED (SELECT ty.event_type, d.day,
           |   COALESCE(c.x, CAST(0 AS BIGINT)) AS x,
           |   (d.day + 4) % 7 AS dow
           |  FROM (SELECT DISTINCT event_type FROM cnt) ty
           |  CROSS JOIN (SELECT DISTINCT day FROM cnt) d
           |  LEFT JOIN cnt c ON c.event_type = ty.event_type
           |   AND c.day = d.day),
           | tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           |   CAST((1000000 * (COUNT(*) * SUM(x * x)
           |     - SUM(x) * SUM(x))) // COUNT(*) AS BIGINT)
           |    AS ss_total_e6
           |  FROM grid GROUP BY event_type),
           | wd AS (SELECT event_type, dow,
           |   CAST((1000000 * (COUNT(*) * SUM(x * x)
           |     - SUM(x) * SUM(x))) // COUNT(*) AS BIGINT) AS w
           |  FROM grid GROUP BY event_type, dow),
           | wi AS (SELECT event_type, CAST(SUM(w) AS BIGINT)
           |    AS ss_within_e6 FROM wd GROUP BY event_type)
           | SELECT tot.event_type, tot.n AS n_days, tot.ss_total_e6,
           |  wi.ss_within_e6,
           |  CASE WHEN tot.ss_total_e6 > 0 THEN
           |   CAST((1000000 * (tot.ss_total_e6 - wi.ss_within_e6))
           |    // tot.ss_total_e6 AS BIGINT) END AS strength_e6
           | FROM tot JOIN wi ON tot.event_type = wi.event_type""".stripMargin
      .replaceAll("\n", "")))

  /** q224 — sessionization gap-sensitivity curve: the session count and
    * mean events-per-session that q38's gap parameter IMPLIES at 10/30/
    * 60-minute thresholds — the calibration readout behind every
    * session-derived metric (q53 funnel, q199 paths, q200 lag): if the
    * counts swing hard between adjacent thresholds, the "session" is an
    * artifact of the parameter, not of user behavior, and downstream
    * numbers inherit that fragility. A session START is a row whose
    * same-user predecessor is absent or more than the gap away (q38's
    * rule), so n_sessions(g) is a pure conditional count off ONE lag
    * pass — all three thresholds in a single aggregate, no per-threshold
    * re-sessionization. Mean length in exact e6 (`div` on
    * non-negatives).
    *
    * Scale shape: one per-user lag window (key cardinality grows with
    * the corpus — the q38 discipline), one single-row aggregate, a
    * 3-row literal-grid explode. Nothing above event volume anywhere.
    */
  val qSessionSensitivity: QuerySpec = QuerySpec(
    "q224_session_sensitivity",
    (s, dir) => {
      val byTime = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"), col("event_id"))
      val lagged = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("tus"))
        .withColumn("d", col("tus") - lag(col("tus"), 1).over(byTime))
      def starts(gapS: Long) =
        sum(when(col("d").isNull || col("d") > gapS * 1000000L, 1L)
          .otherwise(0L)).as(s"s$gapS")
      lagged
        .agg(count(lit(1)).as("n_events"),
          starts(600), starts(1800), starts(3600))
        .select(col("n_events"), explode(array(
          struct(lit(600L).as("gap_s"), col("s600").as("n_sessions")),
          struct(lit(1800L).as("gap_s"), col("s1800").as("n_sessions")),
          struct(lit(3600L).as("gap_s"), col("s3600").as("n_sessions")))))
        .select(col("col.gap_s").as("gap_s"),
          col("col.n_sessions").as("n_sessions"),
          expr("(1000000 * n_events) div col.n_sessions")
            .as("mean_len_e6"))
    },
    Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus
           |  FROM events),
           | lg AS (SELECT tus - LAG(tus) OVER (PARTITION BY user_id
           |   ORDER BY tus, event_id) AS d FROM e),
           | agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           |  CAST(SUM(CASE WHEN d IS NULL OR d > CAST(600 AS BIGINT) * 1000000
           |   THEN 1 ELSE 0 END) AS BIGINT) AS s600,
           |  CAST(SUM(CASE WHEN d IS NULL OR d > CAST(1800 AS BIGINT) * 1000000
           |   THEN 1 ELSE 0 END) AS BIGINT) AS s1800,
           |  CAST(SUM(CASE WHEN d IS NULL OR d > CAST(3600 AS BIGINT) * 1000000
           |   THEN 1 ELSE 0 END) AS BIGINT) AS s3600 FROM lg)
           | SELECT g.gap_s, g.n_sessions,
           |  CAST((1000000 * n_events) // g.n_sessions AS BIGINT)
           |   AS mean_len_e6
           | FROM agg, LATERAL (VALUES
           |  (CAST(600 AS BIGINT), s600),
           |  (CAST(1800 AS BIGINT), s1800),
           |  (CAST(3600 AS BIGINT), s3600)) g(gap_s, n_sessions)""".stripMargin
      .replaceAll("\n", "")))

  /** q226 — within-session event-type co-occurrence lift: for every
    * unordered type pair, how much more often do the two types appear
    * in the SAME q38 session than independence predicts —
    * lift = P(a,b)/(P(a)·P(b)) over sessions, in exact e6 as
    * (10⁶·n_ab·N) div (n_a·n_b). The UNORDERED complement of q109's
    * adjacent transitions (q109 sees what follows what; this sees what
    * belongs to the same visit regardless of order or distance) and the
    * session-level twin of q83's token collocations — the cross-sell /
    * journey-design readout. Sessions are exactly q38's (30-minute gap,
    * (tus, event_id) tie-break); session membership is DISTINCT types,
    * so repeat events don't inflate lift.
    *
    * Scale shape: one per-user lag+cumsum window pass (the q38
    * discipline) → distinct (session, type) rows → the pair self-join
    * on session id (≤ C(types, 2) ≤ 10 pairs/session, the q189 basket
    * bound) → one types²-bounded rollup; marginals are type-keyed
    * broadcast joins and the session total rides as a collected literal
    * (one count — the q219 rule). Session ids pack as
    * user·10⁶ + seq (≤ 10⁶ sessions per user, generous at any scale).
    */
  val qSessionColift: QuerySpec = QuerySpec(
    "q226_session_colift",
    (s, dir) => {
      val byTime = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"), col("event_id"))
      val st = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("tus"))
        .withColumn("d", col("tus") - lag(col("tus"), 1).over(byTime))
        .withColumn("st",
          when(col("d").isNull || col("d") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("seq", sum(col("st")).over(
          byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select((col("user_id") * 1000000L + col("seq")).as("sid"),
          col("event_type").as("ty"))
        .distinct()
      val sess = Scratch.flush(s, "q226-st", st)
      val total = sess.select(col("sid")).distinct().count()
      val m = sess.groupBy(col("ty")).agg(count(lit(1)).as("n"))
      sess.select(col("sid"), col("ty").as("type_a"))
        .join(sess.select(col("sid"), col("ty").as("type_b")), Seq("sid"))
        .filter(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n_ab"))
        .join(broadcast(m.select(col("ty").as("type_a"),
          col("n").as("na"))), Seq("type_a"))
        .join(broadcast(m.select(col("ty").as("type_b"),
          col("n").as("nb"))), Seq("type_b"))
        .select(col("type_a"), col("type_b"), col("n_ab"),
          expr(s"(1000000 * n_ab * ${total}L) div (na * nb)")
            .as("lift_e6"))
    },
    Some("""WITH e AS (SELECT user_id, event_id, event_type,
           |   epoch_us(ts) AS tus FROM events),
           | lg AS (SELECT user_id, event_id, event_type, tus,
           |   tus - LAG(tus) OVER (PARTITION BY user_id
           |    ORDER BY tus, event_id) AS d FROM e),
           | sx AS (SELECT user_id, event_type, CAST(SUM(CASE WHEN
           |    d IS NULL OR d > CAST(1800 AS BIGINT) * 1000000
           |    THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
           |    ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING)
           |   AS BIGINT) AS seq FROM lg),
           | st AS MATERIALIZED (SELECT DISTINCT
           |   user_id * 1000000 + seq AS sid, event_type AS ty FROM sx),
           | m AS MATERIALIZED (SELECT ty, CAST(COUNT(*) AS BIGINT) AS n
           |  FROM st GROUP BY ty),
           | nn AS (SELECT CAST(COUNT(DISTINCT sid) AS BIGINT) AS total
           |  FROM st),
           | p AS (SELECT a.ty AS type_a, b.ty AS type_b,
           |   CAST(COUNT(*) AS BIGINT) AS n_ab
           |  FROM st a JOIN st b ON a.sid = b.sid AND a.ty < b.ty
           |  GROUP BY 1, 2)
           | SELECT type_a, type_b, n_ab,
           |  CAST((1000000 * n_ab * total) // (ma.n * mb.n) AS BIGINT)
           |   AS lift_e6
           | FROM p JOIN m ma ON ma.ty = type_a
           | JOIN m mb ON mb.ty = type_b, nn""".stripMargin
      .replaceAll("\n", "")))

  val specs: Seq[QuerySpec] =
    Seq(qAsofJoin, qSessionize, qFunnel, qRetention, qCdcApply, qTransitions,
      qEventCadence, qRfmSegments, qConcurrency, qCusumChangepoint,
      qSessionPaths, qConversionLag, qDailyAutocorr, qDowProfile,
      qForecastEval, qEwmaAnomaly, qMarkovStationary, qSeasonalStrength,
      qSessionSensitivity, qSessionColift)
}
