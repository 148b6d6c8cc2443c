package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions.Exact
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — the manual fallback for hot keys that
  * Spark's automatic machinery can't spread:
  *
  *  - map-side partial aggregation handles most aggregation skew, but NOT
  *    high-fan-in cases where one reducer key still receives orders of
  *    magnitude more partials than its peers (or holistic aggregates like
  *    collect_list that can't combine map-side);
  *  - AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) handles
  *    sort-merge joins, but not aggregations, not bucketed/pre-shuffled
  *    inputs, and not stateful streaming joins.
  *
  * Salting spreads ONE logical key over `buckets` physical reducer keys
  * and merges afterwards. Both operators here are gated queries whose
  * DuckDB oracles are the PLAIN formulations — proving the technique is
  * result-invariant (with [[Exact]] decimal sums, invariant bitwise).
  *
  * At 100 TB: `buckets` should be sized to the observed skew ratio (a key
  * carrying p% of rows needs ~p% × shuffle.partitions buckets to level
  * out); salting costs one extra narrow stage (agg) or a `buckets`×
  * replication of the build side (join), so apply it per hot key set, not
  * blanket.
  */
object Skew {

  /** Deterministic salt in [0, buckets): xxhash64 over spread-source
    * columns (NOT rand() — results must be stable under retries and
    * reproducible across runs).
    */
  def salt(buckets: Int, src: Column*): Column =
    pmod(xxhash64(src: _*), lit(buckets.toLong)).cast("int")

  /** Two-phase salted aggregation: stage 1 aggregates on (keys ++ salt),
    * spreading each hot key over `buckets` reducers; stage 2 merges the
    * partials per key. Caller supplies matching partial/merge aggregate
    * lists (e.g. [[Exact.dsumPartial]] → [[Exact.dsumMerge]],
    * `count → sum`, `min → min`).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
      saltSrc: Seq[Column], partials: Seq[Column], merges: Seq[Column]): DataFrame =
    df.withColumn("__salt", salt(buckets, saltSrc: _*))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)

  /** Skew-resistant equi-join: the probe side is salted deterministically
    * and the build side replicated `buckets`×, so one hot key's rows land
    * on `buckets` reducers instead of one straggler task. Row-identical
    * to the plain join (each probe row still matches each build row
    * exactly once — at exactly one salt value).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      buckets: Int, probeSaltSrc: Seq[Column]): DataFrame = {
    val p = probe.withColumn("__salt", salt(buckets, probeSaltSrc: _*))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    p.join(b, Seq(key, "__salt")).drop("__salt")
  }

  /** The production form: salt ONLY declared hot keys. Blanket salting
    * replicates the entire build side `buckets`×; with a hot-key set
    * (from stats, a previous run's straggler report, or AQE skew metrics)
    * only the hot slice pays for replication — cold keys take the plain
    * join untouched. Hot keys ride a deterministic salt on the probe side
    * and a `buckets`× replicated hot-build slice; the two joins union.
    * Row-identical to the plain join for ANY hot-key set, so the choice
    * of set is purely a performance knob.
    */
  def saltedJoinHotKeys(probe: DataFrame, build: DataFrame, key: String,
      hotKeys: Column => Column, buckets: Int,
      probeSaltSrc: Seq[Column]): DataFrame = {
    val isHot = hotKeys(col(key))
    val cold = probe.filter(!isHot).join(build.filter(!isHot), Seq(key))
    val hot = saltedJoin(probe.filter(isHot), build.filter(isHot), key,
      buckets, probeSaltSrc)
    cold.unionByName(hot)
  }

  // ---- gated queries -----------------------------------------------------

  /** Q34 — salted two-phase aggregation over lineitem's 6-value
    * (returnflag, linestatus) key space (maximally skewed: ~100k rows per
    * key at sf0.1, millions at scale). Oracle: the PLAIN group-by.
    */
  val qSaltedAgg: QuerySpec = QuerySpec(
    "q34_salted_agg",
    (s, dir) =>
      saltedAgg(
        Tables.load(s, dir, "lineitem"),
        keys = Seq("l_returnflag", "l_linestatus"),
        buckets = 16,
        saltSrc = Seq(col("l_orderkey"), col("l_linenumber")),
        partials = Seq(
          Exact.dsumPartial(col("l_quantity")).as("p_qty"),
          count(lit(1)).as("p_cnt")),
        merges = Seq(
          Exact.dsumMerge(col("p_qty")).as("sum_qty"),
          sum(col("p_cnt")).as("cnt"))),
    Some(s"""SELECT l_returnflag, l_linestatus,
            | ${Exact.dsumSql("l_quantity")} AS sum_qty, COUNT(*) AS cnt
            | FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin
      .replaceAll("\n", "")))

  /** Q35 — hot-key-salted equi-join lineitem⋈orders + aggregation by
    * priority. The "hot" set here is a synthetic 10% slice of orderkeys
    * (`% 10 = 0` — in production it comes from stats or AQE skew
    * metrics); only that slice pays the `buckets`× build replication,
    * cold keys join plainly. Oracle: the PLAIN join — the hot-key choice
    * is invisible in the result.
    */
  val qSaltedJoin: QuerySpec = QuerySpec(
    "q35_salted_join",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"),
          col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      val ord = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      saltedJoinHotKeys(li, ord, "o_orderkey", k => k % 10 === 0,
        buckets = 8,
        probeSaltSrc = Seq(col("o_orderkey"), col("l_linenumber")))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"), Exact.dsum(col("rev")).as("revenue"))
    },
    Some(s"""SELECT o_orderpriority, COUNT(*) AS cnt,
            | ${Exact.dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
            | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            | GROUP BY o_orderpriority""".stripMargin.replaceAll("\n", "")))

  val specs: Seq[QuerySpec] = Seq(qSaltedAgg, qSaltedJoin)
}
