package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions.Exact
import org.apache.spark.sql.functions._

/** Data profiling: the validation pass every ingest pipeline runs before
  * trusting a new drop of data. ONE scan computes per-column null
  * counts, ranges, and cardinalities — at 100 TB this matters because
  * the alternative (one query per column) rescans the table per metric;
  * here every metric is a partial-aggregable expression in a single
  * whole-stage-codegen'd pass with map-side combine.
  */
object Profiling {

  /** Q44 — one-pass profile of the orders table. */
  val qProfile: QuerySpec = QuerySpec(
    "q44_profile",
    (s, dir) =>
      Tables.load(s, dir, "orders").agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
        sum(when(col("o_totalprice").isNull, 1L).otherwise(0L)).as("null_price"),
        sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L)).as("null_status"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        countDistinct(col("o_orderstatus")).as("n_status"),
        countDistinct(col("o_orderpriority")).as("n_prio"),
        min(col("o_orderdate")).cast("timestamp_ntz").as("min_date"),
        max(col("o_orderdate")).cast("timestamp_ntz").as("max_date")),
    Some("""SELECT COUNT(*) AS n_rows,
           | CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
           | CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_price,
           | CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_status,
           | MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
           | MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
           | COUNT(DISTINCT o_orderstatus) AS n_status,
           | COUNT(DISTINCT o_orderpriority) AS n_prio,
           | MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date
           | FROM orders""".stripMargin.replaceAll("\n", "")))

  /** q70 — embedding-quality report: the vector-side validation pass —
    * row count, degenerate (all-zero / null / empty) vectors, dimension
    * consistency, and the norm range. Zero vectors make cosine NaN
    * ([[graft.functions.VectorOps]] fails fast on them in the ANN path),
    * so catching them AT INGEST, in one scan, is what keeps a bad
    * embedding drop from aborting a 100 TB index build hours in.
    *
    * One whole-stage-codegen'd pass: the self-dot is the native [[QDot]]
    * on [[Exact.quantize]]d fixed-point (an exact integer — zero iff the
    * quantized vector is zero on BOTH engines); norm = one sqrt + one
    * divide (IEEE-exact); the mean norm goes through [[Exact.davg]].
    */
  val qEmbeddingQuality: QuerySpec = QuerySpec(
    "q70_embedding_quality",
    (s, dir) => {
      val qe = Exact.quantize(col("embedding"))
      val selfDot = Exact.qdot(qe, qe)
      val norm = sqrt(selfDot.cast("double")) / 1000000.0d
      Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), selfDot.as("sd"), norm.as("norm"),
          size(col("embedding")).as("dim"))
        .agg(
          count(lit(1)).as("n_vecs"),
          count(when(col("sd").isNull, 1)).as("n_degenerate"),
          count(when(col("sd") === 0L, 1)).as("n_zero"),
          countDistinct(col("dim")).cast("long").as("n_dims"),
          min(col("dim")).cast("long").as("min_dim"),
          max(col("dim")).cast("long").as("max_dim"),
          min(col("norm")).as("min_norm"),
          max(col("norm")).as("max_norm"),
          Exact.davg(col("norm")).as("avg_norm"))
    },
    Some {
      val qe = Exact.quantizeSql("embedding")
      val sd = Exact.qdotSql("qe", "qe")
      s"""WITH e AS (SELECT vec_id, $qe AS qe, len(embedding) AS dim
         |  FROM embeddings),
         | n AS (SELECT vec_id, dim, $sd AS sd,
         |   sqrt(CAST($sd AS DOUBLE)) / 1000000.0 AS norm FROM e)
         | SELECT COUNT(*) AS n_vecs,
         |  COUNT(CASE WHEN sd IS NULL THEN 1 END) AS n_degenerate,
         |  COUNT(CASE WHEN sd = 0 THEN 1 END) AS n_zero,
         |  CAST(COUNT(DISTINCT dim) AS BIGINT) AS n_dims,
         |  CAST(MIN(dim) AS BIGINT) AS min_dim,
         |  CAST(MAX(dim) AS BIGINT) AS max_dim,
         |  MIN(norm) AS min_norm, MAX(norm) AS max_norm,
         |  ${Exact.davgSql("norm")} AS avg_norm
         | FROM n""".stripMargin.replaceAll("\n", "")
    })

  /** q96 — HyperLogLog++ distinct-count accuracy report: per event
    * type, the EXACT distinct-user count (the gated value) and a
    * tolerance verdict on Spark's mergeable `approx_count_distinct`
    * sketch (the q39 convention for sketches DuckDB cannot replay:
    * exact values are hash-compared, the sketch is gated as a boolean
    * that must hold). Completes the sketch family — CMS (q84) bounds
    * frequency, Bloom (q85) bounds membership, t-digest (q39) bounds
    * quantiles, HLL bounds cardinality. At scale the two sides swap
    * roles: `countDistinct` rewrites to an expand + two-phase exact agg
    * (one extra shuffle, exact), while the HLL sketch is a fixed-size
    * map-side accumulator merged per group — the report quantifies the
    * error that cheapness buys, which is the number a 100 TB profiling
    * pass needs before replacing exact counts with sketches. 3σ of the
    * default 5% rsd ≈ 15%; the verdict pins 10%, comfortably wide for
    * the gate corpus and partition-count independent (HLL merge is
    * commutative over a fixed hash).
    */
  val qHllAccuracy: QuerySpec = QuerySpec(
    "q96_hll_accuracy",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.05).as("est"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("est") - col("exact_users")).cast("double") <=
            col("exact_users").cast("double") * 0.1).as("apx_ok")),
    Some("""SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
           | TRUE AS apx_ok FROM events GROUP BY event_type""".stripMargin
      .replaceAll("\n", "")))

  /** q97 — join-cardinality estimation via count-min inner product: the
    * pre-flight a planner runs BEFORE paying a 100 TB shuffle join.
    * Each side folds its join-key frequencies into the shared 4×64 CMS
    * banding (q84's [[graft.functions.MinHash]] permutation family over
    * `key % P`), and the inner product of the two sketches — per row r,
    * `Σ_b cmsA[r,b]·cmsB[r,b]`, minimized over rows — is a one-sided
    * OVERestimate of the true join size `Σ_k cntA(k)·cntB(k)`
    * (Alon-Matias-Szegedy / Cormode-Muthukrishnan, public literature).
    * All integer, fully deterministic, so BOTH values are hash-gated
    * (not a tolerance verdict) along with `overcount ≥ 0`.
    *
    * Scale shape: the sketch path is two map-side-combinable per-key
    * aggregations collapsing to ≤256 cells each and a ≤256-row join —
    * constant-size regardless of input; at 100 TB only that path runs,
    * and sketches are mergeable across shards (counts sum per cell).
    * The exact side (per-key counts + key equi-join) exists ONLY to
    * measure the estimation error, the q84/q85 accuracy-report
    * convention. Probed pair: events.user_id ⋈ orders.o_custkey — the
    * fan-out join whose size a planner most wants cheaply.
    */
  val qJoinCardinality: QuerySpec = QuerySpec(
    "q97_join_cardinality",
    (s, dir) => {
      import org.apache.spark.sql.{Column, DataFrame}
      import graft.functions.{MinHash, PolyHash}
      val R = Corpus.CmsRows
      val W = Corpus.CmsWidth
      val pA = array((0 until R).map(j => lit(MinHash.permA(j))): _*)
      val pB = array((0 until R).map(j => lit(MinHash.permB(j))): _*)
      def bucket(r: Column, k: Column): Column =
        pmod(element_at(pA, r + 1) * pmod(k, lit(PolyHash.P)) +
          element_at(pB, r + 1), lit(PolyHash.P)) % W
      def keyCounts(df: DataFrame, key: String): DataFrame =
        df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
      def sketch(kc: DataFrame): DataFrame = kc
        .select(col("k"), col("c"),
          explode(sequence(lit(0), lit(R - 1))).as("r"))
        .select(col("r"), bucket(col("r"), col("k")).as("bucket"), col("c"))
        .groupBy(col("r"), col("bucket")).agg(sum(col("c")).as("c"))
      val ec = keyCounts(Tables.load(s, dir, "events"), "user_id")
      val oc = keyCounts(Tables.load(s, dir, "orders"), "o_custkey")
      val exact = ec.join(oc.toDF("k", "c2"), Seq("k"))
        .agg(coalesce(sum(col("c") * col("c2")), lit(0L)).as("exact_pairs"))
      val est = sketch(ec)
        .join(sketch(oc).toDF("r", "bucket", "c2"), Seq("r", "bucket"))
        .groupBy(col("r")).agg(sum(col("c") * col("c2")).as("ip"))
        .agg(min(col("ip")).as("est_pairs"))
      exact.crossJoin(est)
        .select(col("exact_pairs"), col("est_pairs"),
          (col("est_pairs") - col("exact_pairs")).as("overcount"))
    },
    Some {
      import graft.functions.{MinHash, PolyHash}
      val R = Corpus.CmsRows
      val W = Corpus.CmsWidth
      val pA = (0 until R).map(MinHash.permA).mkString("[", ", ", "]")
      val pB = (0 until R).map(MinHash.permB).mkString("[", ", ", "]")
      val bucket = (k: String) =>
        s"(($pA[CAST(r AS INT) + 1] * ($k % ${PolyHash.P}) +" +
          s" $pB[CAST(r AS INT) + 1]) % ${PolyHash.P}) % $W"
      s"""WITH ec AS (SELECT user_id AS k, COUNT(*) AS c
         |  FROM events GROUP BY 1),
         | oc AS (SELECT o_custkey AS k, COUNT(*) AS c
         |  FROM orders GROUP BY 1),
         | ex AS (SELECT CAST(COALESCE(SUM(ec.c * oc.c), 0) AS BIGINT)
         |   AS exact_pairs FROM ec JOIN oc USING (k)),
         | eb AS (SELECT r, ${bucket("k")} AS bucket,
         |   CAST(SUM(c) AS BIGINT) AS c
         |  FROM ec, range(0, $R) t(r) GROUP BY 1, 2),
         | ob AS (SELECT r, ${bucket("k")} AS bucket,
         |   CAST(SUM(c) AS BIGINT) AS c
         |  FROM oc, range(0, $R) t(r) GROUP BY 1, 2),
         | ip AS (SELECT eb.r, SUM(eb.c * ob.c) AS ip FROM eb
         |  JOIN ob ON eb.r = ob.r AND eb.bucket = ob.bucket GROUP BY eb.r),
         | est AS (SELECT CAST(MIN(ip) AS BIGINT) AS est_pairs FROM ip)
         | SELECT exact_pairs, est_pairs,
         |  est_pairs - exact_pairs AS overcount FROM ex, est""".stripMargin
        .replaceAll("\n", "")
    })

  /** q104 — mergeable fixed-grid quantile sketch + exact-accuracy probe:
    * the quantile member of the sketch family (HLL q96, count-min
    * q84/q97). The sketch is a bucket histogram (width
    * [[QSketchWidth]], a power of two so `x / width` and `floor` are
    * IEEE-exact in both engines): per-bucket counts are mergeable
    * across shards by construction (counts sum per cell — one
    * map-side-combinable aggregation at any scale). A per-mille
    * quantile p is answered from the cumulative histogram as the first
    * bucket whose cumsum reaches rank ⌈n·p/1000⌉; the reported estimate
    * is that bucket's upper edge, so the error is one-sided and bounded
    * by the bucket width.
    *
    * The EXACT side exists only to measure that error (the q84/q96
    * accuracy-report convention) and is itself the scalable two-phase
    * exact-quantile algorithm: the histogram localizes rank r to one
    * bucket plus a residual, and only THAT bucket's rows are sorted
    * (per-p window over one bucket's occupancy, never a global sort —
    * the q99 discipline). The cumsum window runs over histogram rows
    * (bounded by value-range/width, independent of data size), and the
    * 4-row bucket selection broadcasts back onto the scan. All rank
    * arithmetic is integer (`(n·p + 999) div 1000` ≡ ceil); the only
    * doubles are the data values themselves and the exact edge product.
    */
  private val QSketchWidth = 64.0
  private val QSketchPmille = Seq(500L, 900L, 990L, 999L)
  val qQuantileSketch: QuerySpec = QuerySpec(
    "q104_quantile_sketch",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").as("x"))
        .withColumn("b", floor(col("x") / lit(QSketchWidth)).cast("long"))
      val h = li.groupBy(col("b")).agg(count(lit(1)).as("cnt"))
      // single-partition window + 1-row cross join are over HISTOGRAM
      // rows (~1.6k buckets), not data rows
      val hc = h.withColumn("cum",
        sum(col("cnt")).over(Window.orderBy(col("b"))))
      val tot = h.agg(sum(col("cnt")).as("n"))
      val sel = hc.crossJoin(broadcast(tot))
        .select(col("b"), col("cnt"), col("cum"), col("n"),
          explode(typedlit(QSketchPmille)).as("p"))
        .withColumn("trk", expr("(n * p + 999) div 1000"))
        .filter(col("cum") >= col("trk"))
        .groupBy(col("p"))
        .agg(min_by(struct(col("b"), col("cnt"), col("cum"), col("n"),
          col("trk")), col("b")).as("s"))
        .select(col("p"), col("s.b").as("b"), col("s.n").as("n"),
          col("s.trk").as("trk"),
          (col("s.trk") - (col("s.cum") - col("s.cnt"))).as("res"))
      val wx = Window.partitionBy(col("p"))
        .orderBy(col("x"), col("l_orderkey"), col("l_linenumber"))
      li.join(broadcast(sel), Seq("b"))
        .withColumn("rn", row_number().over(wx))
        .filter(col("rn") === col("res"))
        .select(col("p").as("p_mille"), col("n"),
          col("trk").as("target_rank"), col("b").as("bucket"),
          ((col("b") + 1).cast("double") * lit(QSketchWidth)).as("est_hi"),
          col("x").as("exact_x"),
          ((col("b") + 1).cast("double") * lit(QSketchWidth) - col("x"))
            .as("err"))
    },
    Some(s"""WITH li AS (SELECT l_orderkey, l_linenumber,
            |   l_extendedprice AS x,
            |   CAST(floor(l_extendedprice / $QSketchWidth) AS BIGINT) AS b
            |  FROM lineitem),
            | h AS MATERIALIZED (SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt
            |  FROM li GROUP BY b),
            | hc AS MATERIALIZED (SELECT b, cnt,
            |   CAST(SUM(cnt) OVER (ORDER BY b) AS BIGINT) AS cum FROM h),
            | tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM h),
            | sel AS MATERIALIZED (SELECT p, b, n, trk,
            |   trk - (cum - cnt) AS res FROM (
            |  SELECT p, b, cnt, cum, n, (n * p + 999) // 1000 AS trk,
            |   ROW_NUMBER() OVER (PARTITION BY p ORDER BY b) AS rnb
            |  FROM hc, tot, (SELECT CAST(unnest([500, 900, 990, 999])
            |    AS BIGINT) AS p) pp
            |  WHERE cum >= (n * p + 999) // 1000) WHERE rnb = 1)
            | SELECT p AS p_mille, n, trk AS target_rank, b AS bucket,
            |  CAST(b + 1 AS DOUBLE) * $QSketchWidth AS est_hi,
            |  x AS exact_x,
            |  CAST(b + 1 AS DOUBLE) * $QSketchWidth - x AS err
            | FROM (SELECT p, li.b, n, trk, res, x, ROW_NUMBER() OVER (
            |   PARTITION BY p ORDER BY x, l_orderkey, l_linenumber) AS rn
            |  FROM li JOIN sel ON li.b = sel.b)
            | WHERE rn = res""".stripMargin.replaceAll("\n", "")))

  /** q110 — per-event-type OLS trend of daily volume: the closed-form
    * least-squares slope of (day index, daily count), in fixed-point
    * events-per-day-per-million. The drift detector every feed monitor
    * needs — "is this source growing, dying, or flat?" — done exactly:
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) on INTEGER moments, the
    * q63 discipline extended to regression.
    *
    * Scale shape: one corpus-sized hash agg to (type, day) counts with
    * map-side combine, then everything downstream is |types|×|days|
    * rows: a per-type min-day join centers x (keeping every moment far
    * from Long range at any corpus size), one moment agg, one
    * projection. The numerator can be NEGATIVE (declining feeds) —
    * and DuckDB's INTEGER `//` truncates toward zero (probed:
    * -7 // 2 = -3; only its DOUBLE `//` floors), exactly matching
    * Spark's integer `div`, so plain `div` is the bit-exact choice
    * here and the floor identity would be off by one on every
    * declining slope.
    */
  val qTrend: QuerySpec = QuerySpec(
    "q110_trend",
    (s, dir) => {
      val byType = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
      Tables.load(s, dir, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("cnt"))
        // centering x keeps every moment far from Long range at any
        // corpus size; the window runs over |types|×|days| rows (post-
        // aggregate), NOT the corpus — and avoids a second events scan
        // that a min-day self-join would re-execute
        .select(col("event_type"),
          (col("day") - min(col("day")).over(byType)).as("x"),
          col("cnt").as("y"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"), sum(col("y")).as("total"),
          sum(col("x")).as("sx"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .filter(col("n_days") >= 2)
        .select(col("event_type"), col("n_days"), col("total"),
          expr("(1000000 * (n_days * sxy - sx * total))" +
            " div (n_days * sxx - sx * sx)").as("slope_ppm"))
    },
    Some("""WITH daily AS (SELECT event_type,
           |   epoch_us(ts) // 86400000000 AS day,
           |   CAST(COUNT(*) AS BIGINT) AS cnt
           |  FROM events GROUP BY 1, 2),
           | c AS (SELECT event_type, day - MIN(day) OVER (
           |   PARTITION BY event_type) AS x, cnt AS y FROM daily),
           | m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
           |   CAST(SUM(y) AS BIGINT) AS total, CAST(SUM(x) AS BIGINT) AS sx,
           |   CAST(SUM(x * y) AS BIGINT) AS sxy,
           |   CAST(SUM(x * x) AS BIGINT) AS sxx
           |  FROM c GROUP BY 1)
           | SELECT event_type, n_days, total,
           |  CAST((1000000 * (n_days * sxy - sx * total))
           |   // (n_days * sxx - sx * sx) AS BIGINT) AS slope_ppm
           | FROM m WHERE n_days >= 2""".stripMargin.replaceAll("\n", "")))

  /** Poisson-bootstrap replica count and the per-1/10000 CDF thresholds
    * of Poisson(1): P(0)=P(1)=.3679, P(2)=.1839, P(3)=.0613, tail → 4.
    * Declared before the oracle SQL that interpolates them (the
    * object-init-order rule).
    */
  private val BootReps = 32
  private val BootCdf = Seq(3679L, 7358L, 9197L, 9810L)

  /** q111 — Poisson bootstrap over the corpus: 32 deterministic
    * resampling replicas of mean document length, each document's
    * per-replica multiplicity drawn from a Poisson(1) CDF inverse on an
    * LCG hash of (doc_id, replica). The spread of the replica means IS
    * the sampling distribution — error bars on any corpus statistic
    * with no distributional assumptions and no second pass over the
    * data (public technique: Efron 1979; the per-element independent-
    * Poisson form is the standard streaming/parallel variant).
    *
    * Scale shape: ONE scan; the replica fan-out explodes a 32-literal
    * array (codegen'd Generate, no shuffle growth — the 32-group hash
    * agg absorbs it map-side), multiplicities are pure integer
    * arithmetic, and the mean is fixed-point `(10^6·Σ(w·len)) div Σw`
    * on non-negative integers, so `div` ≡ `//` and the oracle is
    * bit-exact. No RNG anywhere: the LCG closed form is evaluated
    * identically in both engines.
    */
  val qBootstrap: QuerySpec = QuerySpec(
    "q111_bootstrap",
    (s, dir) => {
      val h = pmod(lit(1103515245L) * (col("doc_id") * BootReps + col("b"))
        + lit(12345L), lit(2147483648L)) % 10000L
      val w = when(h < BootCdf(0), 0L).when(h < BootCdf(1), 1L)
        .when(h < BootCdf(2), 2L).when(h < BootCdf(3), 3L).otherwise(4L)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          explode(typedlit((0 until BootReps).map(_.toLong))).as("b"))
        .select(col("b"), w.as("w"), col("n_chars"))
        .groupBy(col("b"))
        .agg(sum(col("w")).as("n_eff"),
          sum(col("w") * col("n_chars")).as("wsum"))
        .select(col("b"), col("n_eff"),
          expr("(1000000 * wsum) div n_eff").as("mean_ppm"))
    },
    Some(s"""WITH r AS (SELECT doc_id, n_chars, UNNEST(range($BootReps)) AS b
            |  FROM documents),
            | w AS (SELECT b, n_chars, CASE
            |   WHEN h < ${BootCdf(0)} THEN 0 WHEN h < ${BootCdf(1)} THEN 1
            |   WHEN h < ${BootCdf(2)} THEN 2 WHEN h < ${BootCdf(3)} THEN 3
            |   ELSE 4 END AS w FROM (SELECT b, n_chars,
            |    (1103515245 * (doc_id * $BootReps + b) + 12345)
            |     % 2147483648 % 10000 AS h FROM r))
            | SELECT CAST(b AS BIGINT) AS b, CAST(SUM(w) AS BIGINT) AS n_eff,
            |  CAST((1000000 * CAST(SUM(w * n_chars) AS BIGINT))
            |   // CAST(SUM(w) AS BIGINT) AS BIGINT) AS mean_ppm
            | FROM w GROUP BY b""".stripMargin.replaceAll("\n", "")))

  /** q116 — per-source 10%-trimmed mean of document length: drop each
    * source's shortest and longest decile (by exact rank) and average
    * the middle 80% — the robust location estimate a feed monitor
    * alerts on (a plain mean moves with one pathological megadocument;
    * the trimmed mean moves only when the BULK of the feed shifts).
    * Reported beside the plain mean so the gap between them is the
    * outlier-mass signal.
    *
    * Exactness: the trim boundary is integer rank arithmetic
    * (lo = n div 10, keep lo < rn ≤ n − lo) over the unique
    * (n_chars, doc_id) order, so both engines select the identical row
    * set; means are fixed-point `(100·Σ) div count` on non-negative
    * integers (truncating in both engines).
    *
    * Scale shape: ONE shuffle — the per-source window that ranks each
    * source's lengths (exact trimming is a sort by definition); the
    * rollup reuses the same partitioning. A corpus whose per-source
    * slice exceeds executor memory trades exactness for q104's
    * mergeable histogram instead.
    */
  val qTrimmedMean: QuerySpec = QuerySpec(
    "q116_trimmed_mean",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
      Tables.load(s, dir, "documents")
        .select(col("source"), col("n_chars"), col("doc_id"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("lo", expr("n div 10"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("s_all"),
          sum(when(col("rn") > col("lo") && col("rn") <= col("n") - col("lo"),
            col("n_chars"))).as("s_trim"),
          sum(when(col("rn") > col("lo") && col("rn") <= col("n") - col("lo"),
            1L).otherwise(0L)).as("n_trim"))
        .select(col("source"), col("n_docs"), col("n_trim"),
          expr("(100 * s_all) div n_docs").as("mean_e2"),
          expr("(100 * s_trim) div n_trim").as("trim_mean_e2"))
    },
    Some("""WITH r AS (SELECT source, n_chars,
           |   CAST(ROW_NUMBER() OVER (PARTITION BY source
           |     ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
           |   CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
           |  FROM documents),
           | t AS (SELECT source, rn, n_chars, n, n // 10 AS lo FROM r)
           | SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(CASE WHEN rn > lo AND rn <= n - lo
           |   THEN 1 ELSE 0 END) AS BIGINT) AS n_trim,
           |  CAST((100 * CAST(SUM(n_chars) AS BIGINT)) // COUNT(*)
           |   AS BIGINT) AS mean_e2,
           |  CAST((100 * CAST(SUM(CASE WHEN rn > lo AND rn <= n - lo
           |    THEN n_chars END) AS BIGINT))
           |   // CAST(SUM(CASE WHEN rn > lo AND rn <= n - lo
           |    THEN 1 ELSE 0 END) AS BIGINT) AS BIGINT) AS trim_mean_e2
           | FROM t GROUP BY source""".stripMargin.replaceAll("\n", "")))

  /** q128 — ingestion-order drift: per-doc quality metrics averaged
    * over 20 equal doc_id-range buckets — the monitoring report that
    * catches a crawler or upstream filter change mid-ingest (lengths
    * creeping down, stopword density creeping up) while q115's
    * source-level drift stays flat because every source shifted
    * together. doc_id is the ingestion-order proxy; buckets are
    * id-range (not rank) so the assignment is one integer map with no
    * global sort.
    *
    * Scale shape: the max id is a one-row aggregate broadcast back
    * (cross-join with a single-row frame); bucket assignment and
    * metrics are map-side; the ≤20-group aggregation map-side-combines.
    * Double averages ride [[Exact.davg]] (decimal-exact,
    * order-insensitive — the gated-sum convention).
    */
  val qIngestionDrift: QuerySpec = QuerySpec(
    "q128_ingestion_drift",
    (s, dir) => {
      import graft.TextMetrics
      val docs = Tables.load(s, dir, "documents")
      val maxId = docs.agg(max(col("doc_id")).as("mx"))
      val words = TextMetrics.wordCount(col("text"))
      val stops = TextMetrics.stopCount(col("text"))
      docs.crossJoin(broadcast(maxId))
        .select(
          least(expr("(doc_id * 20) div (mx + 1)"), lit(19L)).as("bucket"),
          col("n_chars"),
          TextMetrics.stopRatio(words, stops).as("sr"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          Exact.davg(col("n_chars").cast("double")).as("avg_chars"),
          Exact.davg(col("sr")).as("avg_stop_ratio"))
    },
    Some(s"""WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents),
            | b AS (SELECT least((doc_id * 20) // (mx.mx + 1), 19) AS bucket,
            |   n_chars, ${graft.TextMetrics.stopRatioSql("text")} AS sr
            |  FROM documents, mx)
            | SELECT bucket, COUNT(*) AS n_docs,
            |  ${Exact.davgSql("CAST(n_chars AS DOUBLE)")} AS avg_chars,
            |  ${Exact.davgSql("sr")} AS avg_stop_ratio
            | FROM b GROUP BY bucket""".stripMargin.replaceAll("\n", "")))

  /** q139 — the one-row DATASET CARD: the corpus-level summary a data
    * drop ships with (doc/token/char volume, language and source
    * cardinality, exact-duplicate ratio, classifier keep rate, Gopher
    * rule pass rate). q44 profiles a relational table's columns; this
    * is its corpus twin, rolling the certified per-document signals up
    * to ONE row — the number block at the top of every dataset card.
    * The Gopher rate comes from the gated q135 frame itself (one
    * definition; its oracle nests q135's oracle verbatim, the q33
    * composition pattern), the keep rate from the q80 kernel.
    *
    * Scale shape: two map-side corpus scans (signals + rules — both
    * pure map, partial-agg to one row each) cross-joined as single-row
    * frames; countDistinct on lang/source/text-hash partial-aggregates
    * map-side. All ratios are single IEEE divisions of exact counts.
    */
  val qDatasetCard: QuerySpec = QuerySpec(
    "q139_dataset_card",
    (s, dir) => {
      val f = graft.functions.HashedLinearScore(col("text"),
        TextAnalysis.ClassifierModulus)
      val base = Tables.load(s, dir, "documents")
        .select(col("n_chars"), col("lang"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          graft.functions.PolyHash(col("text")).as("h"),
          element_at(f, 1).as("score"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"),
          countDistinct(col("h")).as("n_distinct_texts"),
          sum(when(col("score") >= 0, 1L).otherwise(0L)).as("n_keep"))
      val gp = Curation.qGopherRules.build(s, dir)
        .agg(sum(col("pass")).as("n_gopher_pass"))
      base.crossJoin(gp) // both single-row by construction
        .select(col("n_docs"), col("total_tokens"), col("total_chars"),
          col("n_langs"), col("n_sources"),
          ((col("n_docs") - col("n_distinct_texts")).cast("double") /
            col("n_docs").cast("double")).as("exact_dup_ratio"),
          (col("n_keep").cast("double") / col("n_docs").cast("double"))
            .as("keep_rate"),
          (col("n_gopher_pass").cast("double") / col("n_docs").cast("double"))
            .as("gopher_pass_rate"))
    },
    Some(s"""WITH ${TextAnalysis.classifierScoreCtes},
            | base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
            |   CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
            |   CAST(SUM(n_chars) AS BIGINT) AS total_chars,
            |   CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
            |   CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
            |   CAST(COUNT(DISTINCT ${graft.functions.PolyHash.oracleSql("text")})
            |     AS BIGINT) AS n_distinct_texts
            |  FROM documents),
            | kr AS (SELECT CAST(SUM(CASE WHEN score >= 0 THEN 1 ELSE 0 END)
            |   AS BIGINT) AS n_keep FROM sc),
            | gp AS (SELECT CAST(SUM(pass) AS BIGINT) AS n_gopher_pass
            |  FROM (${Curation.qGopherRules.oracle.get}))
            | SELECT n_docs, total_tokens, total_chars, n_langs, n_sources,
            |  CAST(n_docs - n_distinct_texts AS DOUBLE) / CAST(n_docs AS DOUBLE)
            |   AS exact_dup_ratio,
            |  CAST(n_keep AS DOUBLE) / CAST(n_docs AS DOUBLE) AS keep_rate,
            |  CAST(n_gopher_pass AS DOUBLE) / CAST(n_docs AS DOUBLE)
            |   AS gopher_pass_rate
            | FROM base, kr, gp""".stripMargin.replaceAll("\n", "")))

  /** q145 — vocabulary-growth (Heaps-law) curve: cumulative distinct
    * vocabulary vs cumulative token volume over 10 ingestion-order
    * checkpoints (q128's id-range buckets), with the per-checkpoint
    * new-term count and type/token ratio. THE profile read before
    * sizing a tokenizer vocabulary or diagnosing a feed of templated
    * text (a flat curve = the corpus stopped contributing new language;
    * a jump = a new domain landed mid-ingest). Heaps' law itself is a
    * power fit — log-free here by REPORTING the curve, not fitting it:
    * every column is exact integer except the one IEEE ttr division.
    *
    * Scale shape: bucket assignment is the q128 map (one-row max-id
    * broadcast); token volume map-side-combines to ≤10 rows; the
    * vocabulary pass is ONE min-aggregate per distinct word hash
    * (first-seen bucket, map-side combinable) collapsed to a ≤10-row
    * histogram — the q122 novelty shape without the per-doc join back;
    * cumulative sums ride windows over the bounded summary (the q123
    * discipline).
    */
  val qVocabGrowth: QuerySpec = QuerySpec(
    "q145_vocab_growth",
    (s, dir) => {
      import graft.functions.WordShingleHashes
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, dir, "documents")
      val maxId = docs.agg(max(col("doc_id")).as("mx"))
      val based = docs.crossJoin(broadcast(maxId)) // one-row frame
        .select(least(expr("(doc_id * 10) div (mx + 1)"), lit(9L)).as("bucket"),
          col("text"))
      val toks = based
        .select(col("bucket"), size(split(col("text"), " ")).cast("long").as("n_tok"))
        .groupBy(col("bucket"))
        .agg(sum(col("n_tok")).as("b_tok"), count(lit(1)).as("b_docs"))
      val news = based
        .select(col("bucket"), explode(WordShingleHashes(col("text"), 1)).as("h"))
        .groupBy(col("h")).agg(min(col("bucket")).as("fb"))
        .groupBy(col("fb").as("bucket")).agg(count(lit(1)).as("b_new"))
      val upTo = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, 0)
      toks.join(news, Seq("bucket"), "full_outer")
        .select(col("bucket"),
          coalesce(col("b_docs"), lit(0L)).as("n_docs"),
          coalesce(col("b_tok"), lit(0L)).as("b_tok"),
          coalesce(col("b_new"), lit(0L)).as("new_terms"))
        .withColumn("cum_tokens", sum(col("b_tok")).over(upTo))
        .withColumn("cum_vocab", sum(col("new_terms")).over(upTo))
        .select(col("bucket"), col("n_docs"), col("cum_tokens"),
          col("new_terms"), col("cum_vocab"),
          (col("cum_vocab").cast("double") / col("cum_tokens").cast("double"))
            .as("ttr"))
    },
    Some(s"""WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents),
            | b AS (SELECT least((doc_id * 10) // (mx.mx + 1), 9) AS bucket,
            |   text FROM documents, mx),
            | tk AS (SELECT bucket,
            |   CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS b_tok,
            |   COUNT(*) AS b_docs FROM b GROUP BY bucket),
            | dh AS (SELECT bucket, unnest(list_distinct(list_transform(
            |   string_split(text, ' '),
            |   s -> ${graft.functions.PolyHash.oracleSql("s")}))) AS h FROM b),
            | fs AS (SELECT h, MIN(bucket) AS fb FROM dh GROUP BY h),
            | nw AS (SELECT fb AS bucket, COUNT(*) AS b_new FROM fs GROUP BY fb),
            | j AS (SELECT COALESCE(tk.bucket, nw.bucket) AS bucket,
            |   COALESCE(b_docs, 0) AS n_docs, COALESCE(b_tok, 0) AS b_tok,
            |   COALESCE(b_new, 0) AS new_terms
            |  FROM tk FULL JOIN nw ON tk.bucket = nw.bucket),
            | c AS (SELECT bucket, n_docs, new_terms,
            |   CAST(SUM(b_tok) OVER (ORDER BY bucket
            |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            |    AS cum_tokens,
            |   CAST(SUM(new_terms) OVER (ORDER BY bucket
            |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            |    AS cum_vocab
            |  FROM j)
            | SELECT bucket, CAST(n_docs AS BIGINT) AS n_docs, cum_tokens,
            |  CAST(new_terms AS BIGINT) AS new_terms, cum_vocab,
            |  CAST(cum_vocab AS DOUBLE) / CAST(cum_tokens AS DOUBLE) AS ttr
            | FROM c""".stripMargin.replaceAll("\n", "")))

  /** q191 — MAD-based robust outlier screening per event type (median
    * absolute deviation, the robust-statistics alternative to mean±3σ
    * that a single corrupt burst cannot drag): per type, the exact
    * median of `round(value·100)`, the exact median of |v − med|, and
    * the count of rows beyond the 3·1.4826·MAD fence — the consistency
    * scaling 1.4826 rides as the e4 integer 14826 so the fence test is
    * pure integer arithmetic (`dev · 10⁴ > 3 · 14826 · mad`),
    * bit-exact on both engines.
    *
    * Scale shape: the corpus is scanned ONCE into the (type, v2)
    * histogram (map-side combine; grid bounded by the VALUE DOMAIN at
    * e2 resolution, not the corpus — the q39/q104 exact-percentile
    * discipline; a wider domain would band to coarser units first).
    * Both medians, the deviation histogram, and the fence counts all
    * derive from that histogram: the deviation histogram is a regroup
    * of histogram ROWS around the broadcast per-type median, and the
    * outlier count weighs histogram rows — no second corpus pass
    * anywhere.
    */
  val qMadOutliers: QuerySpec = QuerySpec(
    "q191_mad_outliers",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // the one corpus scan: the histogram is aggregate-topped, so the
      // median pass and the deviation regroup reuse its exchange and
      // neither rescans events (r19: unflushed — the parquet round
      // trip measured slower than shuffle reuse)
      val h = Tables.load(s, dir, "events")
        .select(col("event_type"),
          expr("CAST(ROUND(value * 100) AS BIGINT)").as("v2"))
        .groupBy(col("event_type"), col("v2")).agg(count(lit(1)).as("cnt"))
      def medianOf(hist: org.apache.spark.sql.DataFrame, v: String,
          out: String): org.apache.spark.sql.DataFrame = {
        val byV = Window.partitionBy(col("event_type")).orderBy(col(v))
          .rowsBetween(Window.unboundedPreceding, 0)
        hist.withColumn("cum", sum(col("cnt")).over(byV))
          .withColumn("n",
            sum(col("cnt")).over(Window.partitionBy(col("event_type"))))
          .groupBy(col("event_type"))
          .agg(max(col("n")).as("n"),
            min(when(col("cum") >= expr("(n + 1) div 2"), col(v))).as(out))
      }
      val med = medianOf(h, "v2", "med")
      val devh = h
        .join(broadcast(med.select(col("event_type"), col("med"))),
          Seq("event_type"))
        .select(col("event_type"), abs(col("v2") - col("med")).as("dev"),
          col("cnt"))
        .groupBy(col("event_type"), col("dev")).agg(sum(col("cnt")).as("cnt"))
      val mad = medianOf(devh, "dev", "mad")
        .select(col("event_type"), col("mad"))
      devh.join(broadcast(mad), Seq("event_type"))
        .join(broadcast(med), Seq("event_type"))
        .groupBy(col("event_type"), col("n"), col("med"), col("mad"))
        .agg(sum(when(col("dev") * 10000L > lit(3L) * 14826L * col("mad"),
          col("cnt")).otherwise(lit(0L))).as("n_outliers"))
        .select(col("event_type"), col("n"), col("med").as("med_e2"),
          col("mad").as("mad_e2"), col("n_outliers"),
          expr("(n_outliers * 1000000) div n").as("outlier_ppm"))
    },
    Some("""WITH h AS MATERIALIZED (SELECT event_type,
           |   CAST(ROUND(value * 100) AS BIGINT) AS v2,
           |   CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
           | c AS (SELECT event_type, v2, cnt,
           |   CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY v2
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |    AS cum,
           |   CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
           |  FROM h),
           | med AS MATERIALIZED (SELECT event_type, MAX(n) AS n,
           |   MIN(CASE WHEN cum >= (n + 1) // 2 THEN v2 END) AS med
           |  FROM c GROUP BY event_type),
           | dh AS MATERIALIZED (SELECT h.event_type,
           |   ABS(v2 - med) AS dev, CAST(SUM(cnt) AS BIGINT) AS cnt
           |  FROM h JOIN med ON h.event_type = med.event_type GROUP BY 1, 2),
           | dc AS (SELECT event_type, dev, cnt,
           |   CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY dev
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |    AS cum,
           |   CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
           |  FROM dh),
           | mad AS (SELECT event_type,
           |   MIN(CASE WHEN cum >= (n + 1) // 2 THEN dev END) AS mad
           |  FROM dc GROUP BY event_type),
           | f AS (SELECT dh.event_type AS event_type, med.n AS n,
           |   med.med AS med_e2, mad.mad AS mad_e2,
           |   CAST(SUM(CASE WHEN dh.dev * 10000 > 3 * 14826 * mad.mad
           |    THEN dh.cnt ELSE 0 END) AS BIGINT) AS n_outliers
           |  FROM dh JOIN med ON dh.event_type = med.event_type
           |  JOIN mad ON dh.event_type = mad.event_type
           |  GROUP BY dh.event_type, med.n, med.med, mad.mad)
           | SELECT event_type, n, med_e2, mad_e2, n_outliers,
           |  CAST((n_outliers * 1000000) // n AS BIGINT) AS outlier_ppm
           | FROM f""".stripMargin.replaceAll("\n", "")))

  /** q194 — mergeable HLL register cube (Flajolet et al. 2007, the
    * register-level construction q96's builtin-tolerance check does not
    * expose): per (event_type, day) a 64-register sketch of distinct
    * users — the pre-aggregated distinct-count CUBE a 100 TB pipeline
    * maintains so any date-range cardinality question is answered from
    * register max-merge, never a rescan. The gate runs a 14-day range
    * both ways — merged from the daily cube vs built directly from the
    * range's rows — and pins them EQUAL (max-merge associativity made
    * real in the implementation: dense-grid handling, zero registers,
    * bucket math), alongside the exact distinct count for calibration.
    *
    * Everything is integer: register index = polyhash % 64, the
    * remaining 25 hash bits give ρ = leading-zero rank via a 24-term
    * comparison sum (the q183 branch-free discipline — no log), and
    * the raw HLL estimator α·m²/Σ2^(−ρ) ships scaled by 2²⁶ with the
    * bias constant as the e5 integer 70934, so `div` ≡ `//` end to end.
    * 25-bit registers follow the 31-bit polyhash budget (documented
    * saturation ≈ 2²⁵ distincts/bucket; a production 64-bit hash widens
    * them — same plan shape).
    *
    * Scale shape: the cube build is ONE map-side-combinable max-agg to
    * ≤ types × days × 64 rows; every downstream step (range merge,
    * dense 64-bucket grid, estimator) runs on register-grid frames. The
    * direct and exact sides exist only to gate the cube (the q84/q96
    * accuracy-report convention) — at 100 TB only the cube path runs.
    */
  /** Unsigned right shift with a COLUMN shift amount (the q85 shim —
    * `functions.shiftrightunsigned` only takes a literal).
    */
  private def hllSrl(x: org.apache.spark.sql.Column,
      n: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftShims
    import org.apache.spark.sql.catalyst.expressions.ShiftRightUnsigned
    GraftShims.column(
      ShiftRightUnsigned(GraftShims.expression(x), GraftShims.expression(n)))
  }

  /** HLL estimator numerator: α₆₄ (e5 integer 70934) · m² (64²) · 2²⁶
    * (the ρ-term scale). Estimate = HllEstNum div (100000 · Z) where
    * Z = Σ_b 2^(26−ρ_b).
    */
  private[operators] val HllEstNum = 70934L * 4096L * 67108864L

  /** (event_type, user_id, day, bucket, rho) HLL register rows over an
    * arbitrary (event_type, user_id, day) frame — shared by q194 (range
    * cube gate), q197 (rolling serving) and the streaming front door
    * ([[graft.streaming.DistinctStream]]): register index =
    * polyhash % 64, ρ = leading-zero rank of the remaining 25 hash bits
    * via a 24-term comparison sum (no log).
    */
  private[graft] def hllRegisterRows(
      e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.functions.PolyHash
    val fl = (1 to 24)
      .map(k => when(col("w") >= lit(1L << k), 1L).otherwise(lit(0L)))
      .reduce(_ + _)
    e.select(col("event_type"), col("user_id"), col("day"),
        PolyHash(concat(lit("hll|"), col("user_id").cast("string")))
          .as("h"))
      .withColumn("bucket", col("h") % 64L)
      .withColumn("w", expr("h div 64"))
      .withColumn("rho",
        when(col("w") === 0L, lit(26L)).otherwise(lit(25L) - fl))
      .select(col("event_type"), col("user_id"), col("day"), col("bucket"),
        col("rho"))
  }

  /** [[hllRegisterRows]] over the events table. */
  private def hllRows(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    hllRegisterRows(Tables.load(s, dir, "events")
      // explicit no-op (required column): keeps every consumer
      // branch's pushed scan filters identical so exchange reuse can
      // dedupe them (the denseDayGrid discipline, r19)
      .filter(col("event_type").isNotNull)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      // the dense grid's left join infers IsNotNull on its probe
      // branch's keys only — stated explicitly for the one-scan reason
      .filter(col("day").isNotNull))
      .filter(col("bucket").isNotNull)

  /** The rolling 7-day estimate plan over a daily register cube
    * (event_type, day, bucket, r) — ONE definition shared by q197 and
    * the streaming store's serve so the two can never fork: dense
    * (type × day × 64) grid, RANGE-windowed max-merge, integer
    * estimator.
    */
  private[graft] def hllRolling(
      daily: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the r >= 0 filters are no-ops (r = max leading-zero rank ≥ 0);
    // they reference r so the key-derivation branches keep the daily
    // aggregate in their subtree and reuse its exchange instead of
    // re-scanning events (the Temporal.denseDayGrid discipline, r19)
    val dense = daily.filter(col("r") >= 0)
      .select(col("event_type")).distinct()
      .crossJoin(broadcast(
        daily.filter(col("r") >= 0).select(col("day")).distinct()))
      .select(col("event_type"), col("day"),
        explode(sequence(lit(0L), lit(63L))).as("bucket"))
      .join(daily, Seq("event_type", "day", "bucket"), "left")
      .select(col("event_type"), col("day"), col("bucket"),
        coalesce(col("r"), lit(0L)).as("r"))
    val wRoll = Window.partitionBy(col("event_type"), col("bucket"))
      .orderBy(col("day")).rangeBetween(-6, 0)
    dense.withColumn("rr", max(col("r")).over(wRoll))
      .select(col("event_type"), col("day"),
        hllSrl(lit(67108864L), col("rr").cast("int")).as("term"))
      .groupBy(col("event_type"), col("day")).agg(sum(col("term")).as("z"))
      .select(col("event_type"), col("day"),
        expr(s"($HllEstNum) div (100000 * z)").as("est_users_7d"))
  }

  /** The DuckDB twin of [[hllRows]]: CTEs ending in
    * `hrows(event_type, user_id, day, bucket, rho)`.
    */
  private def hllRowsSql: String = {
    val flSql = (1 to 24)
      .map(k => s"(CASE WHEN w >= ${1L << k} THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""r0 AS MATERIALIZED (SELECT event_type, user_id,
       |   epoch_us(ts) // 86400000000 AS day,
       |   ${graft.functions.PolyHash.oracleSql(
             "'hll|' || CAST(user_id AS VARCHAR)")} AS h
       |  FROM events),
       | hrows AS MATERIALIZED (SELECT event_type, user_id, day,
       |   h % 64 AS bucket,
       |   CAST(CASE WHEN w = 0 THEN 26 ELSE 25 - ($flSql) END AS BIGINT)
       |    AS rho
       |  FROM (SELECT *, h // 64 AS w FROM r0) r1)""".stripMargin
  }

  val qHllCube: QuerySpec = QuerySpec(
    "q194_hll_cube",
    (s, dir) => {
      import org.apache.spark.sql.DataFrame
      val rows0 = hllRows(s, dir)
      val dmin = rows0.agg(min(col("day")).as("dmin"))
      // the hashed/ranked range rows flush once: they feed the daily
      // cube, the direct registers, and the exact count. A repartition
      // swap was tried in r19 and REVERTED: the three consumers prune
      // different columns THROUGH the repartition (rho vs user_id), so
      // the exchange subtrees are not canonically equal and reuse
      // cannot dedupe them (static plan: 4 events scans for a 0.92×
      // local win)
      val rows = Scratch.flush(s, "q194-rows",
        rows0.crossJoin(broadcast(dmin))
          .filter(col("day") < col("dmin") + 14))
      val daily = rows.groupBy(col("event_type"), col("day"), col("bucket"))
        .agg(max(col("rho")).as("r"))
      val gridKeys = rows.select(col("event_type")).distinct()
        .select(col("event_type"),
          explode(sequence(lit(0L), lit(63L))).as("bucket"))
      def estimate(regs: DataFrame, out: String): DataFrame =
        gridKeys.join(regs, Seq("event_type", "bucket"), "left")
          .select(col("event_type"),
            hllSrl(lit(67108864L), coalesce(col("r"), lit(0L)).cast("int"))
              .as("term"))
          .groupBy(col("event_type")).agg(sum(col("term")).as("z"))
          .select(col("event_type"),
            expr(s"($HllEstNum) div (100000 * z)").as(out))
      val merged = estimate(daily.groupBy(col("event_type"), col("bucket"))
        .agg(max(col("r")).as("r")), "est_merged")
      val direct = estimate(rows.groupBy(col("event_type"), col("bucket"))
        .agg(max(col("rho")).as("r")), "est_direct")
      rows.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
        .join(merged, Seq("event_type"))
        .join(direct, Seq("event_type"))
        .select(col("event_type"), col("exact_users"), col("est_merged"),
          col("est_direct"),
          when(col("est_merged") === col("est_direct"), 1L).otherwise(0L)
            .as("merge_ok"))
    },
    Some(
      s"""WITH $hllRowsSql,
         | rr AS MATERIALIZED (SELECT h.* FROM hrows h
         |  CROSS JOIN (SELECT MIN(day) AS dmin FROM hrows) m
         |  WHERE day < dmin + 14),
         | daily AS (SELECT event_type, day, bucket, MAX(rho) AS r
         |  FROM rr GROUP BY 1, 2, 3),
         | gk AS MATERIALIZED (SELECT t.event_type,
         |   CAST(g.range AS BIGINT) AS bucket
         |  FROM (SELECT DISTINCT event_type FROM rr) t
         |  CROSS JOIN range(64) g),
         | zm AS (SELECT gk.event_type, CAST(SUM(
         |    67108864 >> CAST(COALESCE(d.r, 0) AS INTEGER)) AS BIGINT) AS z
         |  FROM gk LEFT JOIN (SELECT event_type, bucket, MAX(r) AS r
         |    FROM daily GROUP BY 1, 2) d
         |   ON gk.event_type = d.event_type AND gk.bucket = d.bucket
         |  GROUP BY gk.event_type),
         | zd AS (SELECT gk.event_type, CAST(SUM(
         |    67108864 >> CAST(COALESCE(d.r, 0) AS INTEGER)) AS BIGINT) AS z
         |  FROM gk LEFT JOIN (SELECT event_type, bucket, MAX(rho) AS r
         |    FROM rr GROUP BY 1, 2) d
         |   ON gk.event_type = d.event_type AND gk.bucket = d.bucket
         |  GROUP BY gk.event_type),
         | ex AS (SELECT event_type,
         |   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
         |  FROM rr GROUP BY event_type)
         | SELECT ex.event_type AS event_type, ex.exact_users,
         |  CAST($HllEstNum // (100000 * zm.z) AS BIGINT) AS est_merged,
         |  CAST($HllEstNum // (100000 * zd.z) AS BIGINT) AS est_direct,
         |  CASE WHEN $HllEstNum // (100000 * zm.z)
         |    = $HllEstNum // (100000 * zd.z)
         |   THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS merge_ok
         | FROM ex JOIN zm ON ex.event_type = zm.event_type
         | JOIN zd ON ex.event_type = zd.event_type""".stripMargin
        .replaceAll("\n", "")))

  /** q195 — referential-integrity audit of the whole star schema (the
    * ingest gate every warehouse drop runs before trusting joins): for
    * each of the 8 foreign-key edges (lineitem→orders/part/supplier,
    * orders→customer, customer→nation, supplier→nation, nation→region,
    * events→customer), the child row count, the orphan row count
    * (non-NULL FK with no parent), and orphans-per-million. A healthy
    * drop is all-zeros; a nonzero row names the broken edge before a
    * downstream inner join silently drops the orphans.
    *
    * Scale shape: each CHILD table is scanned exactly once for all its
    * edges — lineitem's three FK probes ride ONE pass as three left
    * joins against distinct-key parent projections (key-only columns,
    * the narrowest possible shuffles; AQE broadcasts the dim sides) —
    * and the per-child multi-edge counters unpivot from one aggregate
    * row. 6 child scans cover 8 edges; nothing is scanned twice.
    */
  val qReferentialAudit: QuerySpec = QuerySpec(
    "q195_referential_audit",
    (s, dir) => {
      import org.apache.spark.sql.DataFrame
      def keys(t: String, k: String): DataFrame =
        Tables.load(s, dir, t).select(col(k)).distinct()
      def audit(child: DataFrame,
          edges: Seq[(String, String, DataFrame)]): DataFrame = {
        var j = child
        edges.zipWithIndex.foreach { case ((_, fk, parent), i) =>
          j = j.join(
            parent.toDF(fk).withColumn(s"hit$i", lit(1)), Seq(fk), "left")
        }
        val aggs = count(lit(1)).as("n_rows") +:
          edges.zipWithIndex.map { case ((_, fk, _), i) =>
            sum(when(col(fk).isNotNull && col(s"hit$i").isNull, 1L)
              .otherwise(0L)).as(s"orph$i")
          }
        j.agg(aggs.head, aggs.tail: _*)
          .select(explode(array(edges.zipWithIndex.map { case ((e, _, _), i) =>
            struct(lit(e).as("edge"), col("n_rows"),
              col(s"orph$i").as("n_orphans"))
          }: _*)).as("x"))
          .select(col("x.edge").as("edge"), col("x.n_rows").as("n_rows"),
            col("x.n_orphans").as("n_orphans"))
      }
      val li = audit(
        Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey")),
        Seq(
          ("lineitem.l_orderkey->orders", "l_orderkey",
            keys("orders", "o_orderkey")),
          ("lineitem.l_partkey->part", "l_partkey",
            keys("part", "p_partkey")),
          ("lineitem.l_suppkey->supplier", "l_suppkey",
            keys("supplier", "s_suppkey"))))
      val rest = Seq(
        ("orders", "o_custkey", "orders.o_custkey->customer",
          ("customer", "c_custkey")),
        ("customer", "c_nationkey", "customer.c_nationkey->nation",
          ("nation", "n_nationkey")),
        ("supplier", "s_nationkey", "supplier.s_nationkey->nation",
          ("nation", "n_nationkey")),
        ("nation", "n_regionkey", "nation.n_regionkey->region",
          ("region", "r_regionkey")),
        ("events", "user_id", "events.user_id->customer",
          ("customer", "c_custkey")))
        .map { case (ct, fk, e, (pt, pk)) =>
          audit(Tables.load(s, dir, ct).select(col(fk)),
            Seq((e, fk, keys(pt, pk))))
        }
      rest.foldLeft(li)(_ unionByName _)
        .withColumn("orphan_ppm", expr("(n_orphans * 1000000) div n_rows"))
    },
    Some("""WITH li AS (SELECT COUNT(*) AS n,
           |   SUM(CASE WHEN l_orderkey IS NOT NULL AND o.k IS NULL
           |    THEN 1 ELSE 0 END) AS o0,
           |   SUM(CASE WHEN l_partkey IS NOT NULL AND p.k IS NULL
           |    THEN 1 ELSE 0 END) AS o1,
           |   SUM(CASE WHEN l_suppkey IS NOT NULL AND sp.k IS NULL
           |    THEN 1 ELSE 0 END) AS o2
           |  FROM lineitem
           |  LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) o
           |   ON l_orderkey = o.k
           |  LEFT JOIN (SELECT DISTINCT p_partkey AS k FROM part) p
           |   ON l_partkey = p.k
           |  LEFT JOIN (SELECT DISTINCT s_suppkey AS k FROM supplier) sp
           |   ON l_suppkey = sp.k),
           | oc AS (SELECT COUNT(*) AS n, SUM(CASE WHEN o_custkey IS NOT NULL
           |    AND c.k IS NULL THEN 1 ELSE 0 END) AS o0 FROM orders
           |  LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) c
           |   ON o_custkey = c.k),
           | cn AS (SELECT COUNT(*) AS n, SUM(CASE WHEN c_nationkey IS NOT
           |    NULL AND nt.k IS NULL THEN 1 ELSE 0 END) AS o0 FROM customer
           |  LEFT JOIN (SELECT DISTINCT n_nationkey AS k FROM nation) nt
           |   ON c_nationkey = nt.k),
           | sn AS (SELECT COUNT(*) AS n, SUM(CASE WHEN s_nationkey IS NOT
           |    NULL AND nt.k IS NULL THEN 1 ELSE 0 END) AS o0 FROM supplier
           |  LEFT JOIN (SELECT DISTINCT n_nationkey AS k FROM nation) nt
           |   ON s_nationkey = nt.k),
           | nr AS (SELECT COUNT(*) AS n, SUM(CASE WHEN n_regionkey IS NOT
           |    NULL AND rg.k IS NULL THEN 1 ELSE 0 END) AS o0 FROM nation
           |  LEFT JOIN (SELECT DISTINCT r_regionkey AS k FROM region) rg
           |   ON n_regionkey = rg.k),
           | ec AS (SELECT COUNT(*) AS n, SUM(CASE WHEN user_id IS NOT NULL
           |    AND c.k IS NULL THEN 1 ELSE 0 END) AS o0 FROM events
           |  LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) c
           |   ON user_id = c.k),
           | u AS (
           |  SELECT 'lineitem.l_orderkey->orders' AS edge, n,
           |   CAST(o0 AS BIGINT) AS n_orphans FROM li
           |  UNION ALL SELECT 'lineitem.l_partkey->part', n,
           |   CAST(o1 AS BIGINT) FROM li
           |  UNION ALL SELECT 'lineitem.l_suppkey->supplier', n,
           |   CAST(o2 AS BIGINT) FROM li
           |  UNION ALL SELECT 'orders.o_custkey->customer', n,
           |   CAST(o0 AS BIGINT) FROM oc
           |  UNION ALL SELECT 'customer.c_nationkey->nation', n,
           |   CAST(o0 AS BIGINT) FROM cn
           |  UNION ALL SELECT 'supplier.s_nationkey->nation', n,
           |   CAST(o0 AS BIGINT) FROM sn
           |  UNION ALL SELECT 'nation.n_regionkey->region', n,
           |   CAST(o0 AS BIGINT) FROM nr
           |  UNION ALL SELECT 'events.user_id->customer', n,
           |   CAST(o0 AS BIGINT) FROM ec)
           | SELECT edge, CAST(n AS BIGINT) AS n_rows, n_orphans,
           |  CAST((n_orphans * 1000000) // n AS BIGINT) AS orphan_ppm
           | FROM u""".stripMargin.replaceAll("\n", "")))

  /** q196 — token-mass Gini concentration per source (the Lorenz/Gini
    * inequality audit of per-document token counts: G = 0 means every
    * doc contributes equally, G → 1 means a few giants carry the
    * source — the concentration signal a mixture designer reads before
    * trusting doc-count-based source weights). Exact rational: with
    * docs grouped by token-count value v (count c, prior cumulative p,
    * source total n), the sorted-rank Gini numerator
    * Σ (2·rank − n − 1)·x collapses per GROUP to
    * v·(2·(c·p + c(c+1)/2) − c·(n+1)) — all integers — and ships as
    * `num·10⁶ div (n · Σ tokens)`, non-negative because values are
    * rank-sorted. BIGINT holds to ~10⁹ docs/source (n² in the rank
    * sum); past that the numerator graduates to DECIMAL(38), the q63
    * moment rule.
    *
    * Scale shape: ONE corpus scan collapses to the per-source
    * token-count histogram (grid bounded by the length DOMAIN, the
    * q104 discipline); ranks come from cumulative windows over that
    * bounded grid, never a doc-cardinality sort.
    */
  val qTokenGini: QuerySpec = QuerySpec(
    "q196_token_gini",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val h = Tables.load(s, dir, "documents")
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("v"))
        .groupBy(col("source"), col("v")).agg(count(lit(1)).as("c"))
      val byV = Window.partitionBy(col("source")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, 0)
      h.withColumn("cum", sum(col("c")).over(byV))
        .withColumn("p", col("cum") - col("c"))
        .withColumn("n", sum(col("c")).over(Window.partitionBy(col("source"))))
        .withColumn("num_g",
          expr("v * (2 * (c * p + (c * (c + 1)) div 2) - c * (n + 1))"))
        .groupBy(col("source"))
        .agg(max(col("n")).as("n_docs"), sum(expr("v * c")).as("tok_total"),
          sum(col("num_g")).as("num"))
        .select(col("source"), col("n_docs"), col("tok_total"),
          expr("(num * 1000000) div (n_docs * tok_total)").as("gini_e6"))
    },
    Some("""WITH h AS (SELECT source,
           |   CAST(len(string_split(text, ' ')) AS BIGINT) AS v,
           |   CAST(COUNT(*) AS BIGINT) AS c
           |  FROM documents GROUP BY 1, 2),
           | w AS (SELECT source, v, c,
           |   CAST(SUM(c) OVER (PARTITION BY source ORDER BY v
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |    - c AS p,
           |   CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n
           |  FROM h),
           | g AS (SELECT source, MAX(n) AS n_docs,
           |   CAST(SUM(v * c) AS BIGINT) AS tok_total,
           |   CAST(SUM(v * (2 * (c * p + (c * (c + 1)) // 2)
           |    - c * (n + 1))) AS BIGINT) AS num
           |  FROM w GROUP BY source)
           | SELECT source, n_docs, tok_total,
           |  CAST((num * 1000000) // (n_docs * tok_total) AS BIGINT)
           |   AS gini_e6
           | FROM g""".stripMargin.replaceAll("\n", "")))

  /** q197 — rolling 7-day distinct users per (event_type, day), served
    * ENTIRELY from q194's daily HLL register cube: per day, the
    * trailing-week registers max-merge in a range window and the
    * estimator runs on the merged grid — the "weekly active users"
    * time series at sketch cost, no day re-scanned, no distinct
    * recomputed (the query answered from the cube that the q194 gate
    * proved ≡ direct construction).
    *
    * Scale shape: ONE corpus pass builds the daily cube (flushed — the
    * dense grid and the join both read it); everything after is
    * register-grid-sized: the dense (type × day × 64) frame, the
    * RANGE-windowed max-merge (range, not rows, so calendar gaps merge
    * correctly), and the per-(type, day) estimator rollup.
    */
  val qRollingDistinct: QuerySpec = QuerySpec(
    "q197_rolling_distinct",
    (s, dir) =>
      // r19: unflushed — aggregate-topped, branches reuse the exchange
      hllRolling(hllRows(s, dir)
        .groupBy(col("event_type"), col("day"), col("bucket"))
        .agg(max(col("rho")).as("r"))),
    Some(
      s"""WITH $hllRowsSql,
         | daily AS MATERIALIZED (SELECT event_type, day, bucket,
         |   MAX(rho) AS r FROM hrows GROUP BY 1, 2, 3),
         | dense AS (SELECT t.event_type, d.day,
         |   CAST(g.range AS BIGINT) AS bucket, COALESCE(dl.r, 0) AS r
         |  FROM (SELECT DISTINCT event_type FROM daily) t
         |  CROSS JOIN (SELECT DISTINCT day FROM daily) d
         |  CROSS JOIN range(64) g
         |  LEFT JOIN daily dl ON dl.event_type = t.event_type
         |   AND dl.day = d.day AND dl.bucket = g.range),
         | rolled AS (SELECT event_type, day,
         |   MAX(r) OVER (PARTITION BY event_type, bucket ORDER BY day
         |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS rr
         |  FROM dense),
         | zz AS (SELECT event_type, day, CAST(SUM(
         |    67108864 >> CAST(rr AS INTEGER)) AS BIGINT) AS z
         |  FROM rolled GROUP BY event_type, day)
         | SELECT event_type, day,
         |  CAST($HllEstNum // (100000 * z) AS BIGINT) AS est_users_7d
         | FROM zz""".stripMargin.replaceAll("\n", "")))

  /** q198 — token-mass-weighted length percentiles per source: the
    * count-median of doc length answers "what does a typical DOCUMENT
    * look like", the mass-median answers "what does a typical TOKEN's
    * document look like" — the quantity a packing/curriculum designer
    * actually budgets against (a source can be count-short but
    * mass-long when a few giants carry it; q196's Gini says HOW
    * concentrated, this says WHERE the mass sits). Exact rank-⌈p·W⌉
    * lower-percentile semantics (the q39/q163 discipline) applied to
    * the token-mass cumulative instead of the row cumulative — same
    * histogram, two weightings, one pass.
    *
    * Scale shape: ONE corpus scan collapses to the per-source length
    * histogram (grid bounded by the length DOMAIN); both cumulative
    * weightings are windows over that bounded grid; output is
    * source-cardinality.
    */
  val qWeightedPercentiles: QuerySpec = QuerySpec(
    "q198_weighted_percentiles",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val h = Tables.load(s, dir, "documents")
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("v"))
        .groupBy(col("source"), col("v")).agg(count(lit(1)).as("c"))
        .withColumn("w", expr("v * c"))
      val byV = Window.partitionBy(col("source")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val whole = Window.partitionBy(col("source"))
      h.withColumn("cumc", sum(col("c")).over(byV))
        .withColumn("cumw", sum(col("w")).over(byV))
        .withColumn("n", sum(col("c")).over(whole))
        .withColumn("tw", sum(col("w")).over(whole))
        .groupBy(col("source"))
        .agg(max(col("n")).as("n_docs"), max(col("tw")).as("tok_total"),
          min(when(col("cumc") >= expr("(n + 1) div 2"), col("v")))
            .as("p50_len_docs"),
          min(when(col("cumw") >= expr("(tw + 1) div 2"), col("v")))
            .as("p50_len_mass"),
          min(when(col("cumw") >= expr("(9 * tw + 9) div 10"), col("v")))
            .as("p90_len_mass"))
    },
    Some("""WITH h AS (SELECT source,
           |   CAST(len(string_split(text, ' ')) AS BIGINT) AS v,
           |   CAST(COUNT(*) AS BIGINT) AS c
           |  FROM documents GROUP BY 1, 2),
           | w AS (SELECT source, v, c, v * c AS w FROM h),
           | cw AS (SELECT source, v,
           |   CAST(SUM(c) OVER win AS BIGINT) AS cumc,
           |   CAST(SUM(w) OVER win AS BIGINT) AS cumw,
           |   CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n,
           |   CAST(SUM(w) OVER (PARTITION BY source) AS BIGINT) AS tw
           |  FROM w
           |  WINDOW win AS (PARTITION BY source ORDER BY v
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           | SELECT source, MAX(n) AS n_docs, MAX(tw) AS tok_total,
           |  MIN(CASE WHEN cumc >= (n + 1) // 2 THEN v END)
           |   AS p50_len_docs,
           |  MIN(CASE WHEN cumw >= (tw + 1) // 2 THEN v END)
           |   AS p50_len_mass,
           |  MIN(CASE WHEN cumw >= (9 * tw + 9) // 10 THEN v END)
           |   AS p90_len_mass
           | FROM cw GROUP BY source""".stripMargin.replaceAll("\n", "")))

  val specs: Seq[QuerySpec] =
    Seq(qProfile, qEmbeddingQuality, qHllAccuracy, qJoinCardinality,
      qQuantileSketch, qTrend, qBootstrap, qTrimmedMean, qIngestionDrift,
      qDatasetCard, qVocabGrowth, qMadOutliers, qHllCube, qReferentialAudit,
      qTokenGini, qRollingDistinct, qWeightedPercentiles)
}
