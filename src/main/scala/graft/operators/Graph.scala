package graft.operators

import graft.QuerySpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the near-duplicate graph — the centrality tier
  * of the dedup family. q50/q86 collapse duplicate clusters by
  * connected components and pick the min-id canonical; PageRank ranks
  * nodes WITHIN the graph by how central they are among their
  * near-duplicates, the principled way to choose a cluster
  * representative (the most-linked variant, not an arbitrary id) and to
  * find template/boilerplate hubs (public algorithm: Page et al. 1999).
  *
  * Everything is fixed-point integer arithmetic so the DuckDB oracle is
  * bit-exact: ranks are scaled by [[Graph.Scale]], the damping step is
  * `Base + (85 * in) div 100`, and per-neighbor shares use integer
  * `div`. All quantities stay non-negative, so Spark's `div` (truncate)
  * and DuckDB's `//` (floor) agree.
  */
object Graph {

  /** Fixed-point scale of rank 1.0 (declared before any oracle SQL that
    * interpolates it — the object-init-order rule).
    */
  private val Scale = 1000000L

  /** (1 − d) · Scale for damping d = 0.85. */
  private val Base = 150000L

  /** Power-iteration count: fixed (not to-convergence) so the oracle is
    * a finite unrolled CTE chain, the q26b discipline.
    */
  private val Iterations = 4

  /** The symmetrized verified-pair edge list, flushed to scratch parquet
    * so the expensive subtree (MinHash → LSH bands → verified pairs)
    * executes ONCE and every iteration/consumer reads the tiny edge
    * table instead of re-running the candidate pipeline (the
    * per-reference re-execution trap: a lazy plan re-runs a shared
    * subtree once per reference). At cluster scale the flush is a table
    * bucketed by `u`, making the join side of every iteration
    * exchange-free.
    */
  private def flushedEdges(s: SparkSession, dir: String,
      tag: String): DataFrame = {
    val raw = Dedup.qLshPairs.build(s, dir)
      .select(col("doc_id_1"), col("doc_id_2")).persist()
    try Scratch.flush(s, tag,
      raw.union(raw.select(col("doc_id_2"), col("doc_id_1")))
        .toDF("u", "v"))
    finally raw.unpersist(blocking = false)
  }

  /** The damped power iteration as ONE lazy Catalyst plan over a
    * materialized edge table: each iteration is two shuffles on node id
    * (share join, contribution aggregate with map-side combine), and
    * the generation chain is linear (each referenced exactly once), so
    * no persisted generations are needed. Returns (u, deg, r).
    */
  private def rankPlan(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    var ranks = deg.select(col("u"), lit(Scale).as("r"))
    for (_ <- 1 to Iterations) {
      val share = ranks.join(deg, Seq("u"))
        .select(col("u"), expr("r div deg").as("sh"))
      val contrib = edges.join(share, Seq("u"))
        .groupBy(col("v")).agg(sum(col("sh")).as("m"))
      ranks = deg.select(col("u"))
        .join(contrib.withColumnRenamed("v", "u"), Seq("u"), "left")
        .select(col("u"), expr(
          s"$Base + (85 * coalesce(m, CAST(0 AS BIGINT))) div 100").as("r"))
    }
    deg.join(ranks, Seq("u"))
  }

  /** The unrolled power-iteration CTE chain over CTEs `edges` (u, v) —
    * shared by q102 and q106 so an oracle fix lands everywhere at once.
    * Every CTE referenced twice per step is MATERIALIZED (the q26b
    * rule), SUMs are cast back from HUGEINT (the q56 rule). Defines
    * `deg` and `r$Iterations`.
    */
  private def prSqlCtes: String = {
    val steps = (1 to Iterations).map { i =>
      s"""s$i AS (SELECT e.v AS u, CAST(SUM(r.r // d.deg) AS BIGINT) AS m
         |  FROM edges e JOIN r${i - 1} r ON e.u = r.u
         |  JOIN deg d ON e.u = d.u GROUP BY e.v),
         | r$i AS MATERIALIZED (SELECT deg.u,
         |  CAST($Base + (85 * COALESCE(s$i.m, 0)) // 100 AS BIGINT) AS r
         |  FROM deg LEFT JOIN s$i ON deg.u = s$i.u)""".stripMargin
    }.mkString(",")
    s"""deg AS MATERIALIZED (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg
       |   FROM edges GROUP BY u),
       | r0 AS MATERIALIZED (SELECT u, CAST($Scale AS BIGINT) AS r FROM deg),
       | $steps""".stripMargin
  }

  /** q102 — PageRank over the verified near-dup graph (q23's pairs,
    * symmetrized). Output: one row per graph node with its degree and
    * fixed-point rank after [[Iterations]] damped power iterations.
    */
  val qPageRank: QuerySpec = QuerySpec(
    "q102_pagerank",
    (s, dir) =>
      rankPlan(flushedEdges(s, dir, "q102-edges"))
        .select(col("u").as("doc_id"), col("deg"), col("r").as("pr")),
    Some(s"""WITH pairs AS MATERIALIZED (${Dedup.qLshPairs.oracle.get}),
            | edges AS MATERIALIZED (
            |   SELECT doc_id_1 AS u, doc_id_2 AS v FROM pairs
            |   UNION ALL SELECT doc_id_2, doc_id_1 FROM pairs),
            | $prSqlCtes
            | SELECT d.u AS doc_id, d.deg AS deg, r$Iterations.r AS pr
            | FROM deg d JOIN r$Iterations ON d.u = r$Iterations.u""".stripMargin
      .replaceAll("\n", "")))

  /** q106 — centrality-canonical selection: for every near-dup cluster
    * (q50's connected components) the member with the highest PageRank
    * is the cluster representative — the most-linked variant, not the
    * arbitrary min-id that q86's collapse uses. Shares ONE flushed edge
    * list between the ranking iteration and the CC labeling, so the
    * candidate pipeline runs once.
    *
    * Scale shape: the canonical argmax is a map-side-combinable
    * `max_by` over a UNIQUE ordering key (r, −u) — no window over the
    * label set — and everything downstream of the flushed edges is
    * node-count-sized, not corpus-sized.
    */
  val qCentralCanonical: QuerySpec = QuerySpec(
    "q106_central_canonical",
    (s, dir) => {
      val edges = flushedEdges(s, dir, "q106-edges")
      val ranks = rankPlan(edges).select(col("u"), col("r"))
      val (labels, _) =
        Dedup.connectedComponents(s, edges, scratchTag = "q106")
      labels.join(ranks, Seq("u"))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_docs"),
          max_by(struct(col("u").as("doc_id"), col("r").as("pr")),
            struct(col("r"), col("u") * -1)).as("c"))
        .select(col("cluster_id"), col("c.doc_id").as("canonical_doc"),
          col("c.pr").as("pr"), col("n_docs"))
    },
    Some(s"""WITH RECURSIVE ${Dedup.ccSqlCtes},
            | $prSqlCtes,
            | labels AS (SELECT u AS doc_id, MIN(r) AS cluster_id
            |  FROM reach GROUP BY u),
            | j AS (SELECT l.cluster_id, l.doc_id, r$Iterations.r AS pr
            |  FROM labels l JOIN r$Iterations ON l.doc_id = r$Iterations.u)
            | SELECT cluster_id, doc_id AS canonical_doc, pr, n_docs FROM (
            |  SELECT cluster_id, doc_id, pr,
            |   CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
            |     AS n_docs,
            |   ROW_NUMBER() OVER (PARTITION BY cluster_id
            |     ORDER BY pr DESC, doc_id) AS rk
            |  FROM j) WHERE rk = 1""".stripMargin.replaceAll("\n", "")))

  val specs: Seq[QuerySpec] = Seq(qPageRank, qCentralCanonical)
}
