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
  * `div`. All quantities stay non-negative, where Spark's `div` and
  * DuckDB's integer `//` (both truncating) trivially agree.
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
      rankPlan(DupGraph.edges(s, dir))
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
    * arbitrary min-id that q86's collapse uses. The edge table and the CC
    * labels both come from the shared [[DupGraph]] store, so the
    * candidate pipeline and the propagation run once per corpus.
    *
    * Scale shape: the canonical argmax is a map-side-combinable
    * `max_by` over a UNIQUE ordering key (r, −u) — no window over the
    * label set — and everything downstream of the flushed edges is
    * node-count-sized, not corpus-sized.
    */
  val qCentralCanonical: QuerySpec = QuerySpec(
    "q106_central_canonical",
    (s, dir) => {
      val edges = DupGraph.edges(s, dir)
      val ranks = rankPlan(edges).select(col("u"), col("r"))
      val labels = DupGraph.labels(s, dir)
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

  /** q107 — per-node triangle count + fixed-point local clustering
    * coefficient over the near-dup graph: how CLIQUE-LIKE each node's
    * neighborhood is. Near-dup clusters that are true duplicate sets are
    * near-cliques (coef → 1); template hubs whose neighbors differ from
    * each other are stars (coef → 0) — the structural signal that
    * separates "one document, many copies" from "one boilerplate shell,
    * many distinct bodies", which q102/q106 rank but cannot distinguish.
    *
    * Scale shape: the classic degree-ordered orientation (each
    * undirected edge directed from the lower (deg, id) endpoint to the
    * higher) bounds the wedge join by the graph arboricity instead of
    * Σ deg² — the hub that would contribute C(deg, 2) wedges contributes
    * none, because hubs sort LAST in the total order and so have no
    * out-edges through them. Every triangle then materializes exactly
    * once (at its lowest-ordered vertex), as two out-edges closed by a
    * third. Candidates come ONLY from equi-joins; the oriented edge
    * list is flushed to scratch so its three consumers (two wedge
    * sides, one closure side) are parquet scans, not three re-runs of
    * the orientation subtree.
    *
    * All quantities are non-negative integers; coef is scaled by
    * [[Scale]] with integer `div`, so `div` ≡ `//` and the oracle is
    * bit-exact.
    */
  val qTriangles: QuerySpec = QuerySpec(
    "q107_triangles",
    (s, dir) => {
      val edges = DupGraph.edges(s, dir)
      val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      // r19: flush → repartition(u) (the sharedSigs form): the degree
      // joins run once below the shared exchange, whose u partitioning
      // both wedge-join sides reuse directly. The explicit no-op
      // isNotNulls and the closing branch's dv >= 0 reference (degrees
      // are counts ≥ 1) keep all three consumer subtrees canonically
      // equal under pushdown/pruning so reuse actually dedupes them
      // (the denseDayGrid discipline)
      val oriented = edges
        .filter(col("u").isNotNull && col("v").isNotNull)
        .join(deg.toDF("u", "du"), Seq("u"))
        .join(deg.toDF("v", "dv"), Seq("v"))
        .filter(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")))
        .select(col("u"), col("v"), col("dv"))
        .repartition(col("u"))
      // every consumer filters its copy of dv with the same no-op
      // predicate (degrees are counts ≥ 1): pushdown lands the SAME
      // filter below each branch's repartition and pruning keeps the
      // SAME column set, so the three subtrees stay canonically equal
      // and the exchange is reused, not re-executed. The join-back
      // additionally matches on dc = dv — a no-op (dv = deg(v) is
      // functionally determined by v, so (b,c,dc)=(u,v,dv) ≡
      // (b,c)=(u,v)) that makes the closing branch CONSUME dv above
      // its exchange exactly like the wedge sides do; without it,
      // column pruning drops dv from that branch's exchange and the
      // subtree signature diverges (2 store-subtree executions)
      val wedges = oriented.toDF("u", "b", "db")
        .filter(col("db") >= 0)
        .join(oriented.toDF("u", "c", "dc").filter(col("dc") >= 0),
          Seq("u"))
        .filter(col("db") < col("dc") ||
          (col("db") === col("dc") && col("b") < col("c")))
        .select(col("u").as("a"), col("b"), col("c"), col("dc"))
      val tri = wedges
        .join(oriented.filter(col("dv") >= 0)
            .select(col("u").as("b"), col("v").as("c"),
              col("dv").as("dc")),
          Seq("b", "c", "dc"))
      val perNode = tri
        .select(explode(array(col("a"), col("b"), col("c"))).as("u"))
        .groupBy(col("u")).agg(count(lit(1)).as("tri"))
      deg.join(perNode, Seq("u"), "left")
        .select(col("u").as("doc_id"), col("deg"),
          coalesce(col("tri"), lit(0L)).as("tri"))
        .withColumn("coef",
          when(col("deg") >= 2,
            expr(s"(2 * tri * $Scale) div (deg * (deg - 1))"))
            .otherwise(lit(0L)))
    },
    Some(s"""WITH pairs AS MATERIALIZED (${Dedup.qLshPairs.oracle.get}),
            | edges AS MATERIALIZED (
            |   SELECT doc_id_1 AS u, doc_id_2 AS v FROM pairs
            |   UNION ALL SELECT doc_id_2, doc_id_1 FROM pairs),
            | deg AS MATERIALIZED (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg
            |   FROM edges GROUP BY u),
            | o AS MATERIALIZED (SELECT e.u, e.v, dv.deg AS dv
            |   FROM edges e JOIN deg du ON e.u = du.u
            |   JOIN deg dv ON e.v = dv.u
            |   WHERE du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)),
            | tri AS MATERIALIZED (SELECT e1.u AS a, e1.v AS b, e2.v AS c
            |   FROM o e1 JOIN o e2 ON e1.u = e2.u
            |    AND (e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v))
            |   JOIN o e3 ON e3.u = e1.v AND e3.v = e2.v),
            | pern AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS tri FROM
            |   (SELECT UNNEST([a, b, c]) AS n FROM tri) GROUP BY n)
            | SELECT d.u AS doc_id, d.deg,
            |  CAST(COALESCE(p.tri, 0) AS BIGINT) AS tri,
            |  CAST(CASE WHEN d.deg >= 2
            |   THEN (2 * COALESCE(p.tri, 0) * $Scale) // (d.deg * (d.deg - 1))
            |   ELSE 0 END AS BIGINT) AS coef
            | FROM deg d LEFT JOIN pern p ON d.u = p.n""".stripMargin
      .replaceAll("\n", "")))

  /** Peeling-generation cap for q114 (declared before the oracle SQL
    * that unrolls it — the object-init-order rule). The Spark side
    * exits at the FIXPOINT and `require`s it within the cap; the oracle
    * always unrolls the full cap, which is equivalent because peeling a
    * converged core is a no-op — extra oracle rounds reproduce the same
    * node set bit-for-bit (the q51 TrainIters discipline). Near-dup
    * graphs peel in a handful of rounds (clusters are clique-ish);
    * chain-shaped components peel from the ends at 2 nodes per round,
    * which is what the cap headroom is for.
    */
  private[graft] val PeelIters = 25

  /** q114 — the 2-core of the near-dup graph: iteratively peel every
    * node with degree < 2 until none remains; survivors are the nodes
    * on CYCLES of near-duplication. This is the structural complement
    * of q107's triangles from the other side: a boilerplate star hub
    * has zero triangles but sits in the 1-core, while ANY tree-shaped
    * periphery (hubs, chains' ends, one-off pairs) peels away entirely
    * — what survives is mutually-corroborated duplication mass, the
    * part of the graph where transitive collapse (q86) is load-bearing
    * rather than incidental. Output: each 2-core member with its
    * within-core degree.
    *
    * Scale shape: every iteration is two equi-joins of the edge table
    * against the SHRINKING survivor set plus one hash agg — node-set
    * sized, nothing corpus-sized after the [[DupGraph]] read. Each
    * generation materializes through an explicit persisted handle and
    * the superseded one unpersists immediately (the r5 discipline);
    * the converged set flushes to scratch so the returned plan reads
    * parquet, pinning nothing. Fixpoint detection is count equality —
    * the survivor set only ever shrinks, so equal counts mean equal
    * sets.
    */
  val qKcore: QuerySpec = QuerySpec(
    "q114_kcore",
    (s, dir) => {
      import s.implicits._
      val edges = DupGraph.edges(s, dir)
      var curRdd = edges.groupBy(col("u")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= 2).select(col("u"))
        .as[Long].rdd.persist()
      var n = curRdd.count()
      var cur = curRdd.toDF("u")
      var iter = 1
      var done = false
      while (!done && iter < PeelIters) {
        val nextRdd = edges
          .join(cur, Seq("u"))
          .join(cur.withColumnRenamed("u", "v"), Seq("v"))
          .groupBy(col("u")).agg(count(lit(1)).as("d"))
          .filter(col("d") >= 2).select(col("u"))
          .as[Long].rdd.persist()
        val m = nextRdd.count()
        curRdd.unpersist(blocking = false)
        curRdd = nextRdd
        cur = nextRdd.toDF("u")
        done = m == n
        n = m
        iter += 1
      }
      require(done, s"2-core peeling did not converge in $iter rounds")
      val core = Scratch.flush(s, "q114-core", cur)
      curRdd.unpersist(blocking = false)
      edges.join(core, Seq("u"))
        .join(core.withColumnRenamed("u", "v"), Seq("v"))
        .groupBy(col("u")).agg(count(lit(1)).as("core_deg"))
        .select(col("u").as("doc_id"), col("core_deg"))
    },
    Some {
      val steps = (1 to PeelIters - 1).map { i =>
        s"""e$i AS MATERIALIZED (SELECT e.u, e.v FROM edges e
           |  JOIN n${i - 1} a ON e.u = a.u JOIN n${i - 1} b ON e.v = b.u),
           | n$i AS MATERIALIZED (SELECT u FROM (
           |  SELECT u, COUNT(*) AS c FROM e$i GROUP BY u) WHERE c >= 2)"""
          .stripMargin
      }.mkString(",")
      s"""WITH pairs AS MATERIALIZED (${Dedup.qLshPairs.oracle.get}),
         | edges AS MATERIALIZED (
         |   SELECT doc_id_1 AS u, doc_id_2 AS v FROM pairs
         |   UNION ALL SELECT doc_id_2, doc_id_1 FROM pairs),
         | n0 AS MATERIALIZED (SELECT u FROM (
         |   SELECT u, COUNT(*) AS c FROM edges GROUP BY u) WHERE c >= 2),
         | $steps
         | SELECT e.u AS doc_id, CAST(COUNT(*) AS BIGINT) AS core_deg
         | FROM edges e
         |  JOIN n${PeelIters - 1} a ON e.u = a.u
         |  JOIN n${PeelIters - 1} b ON e.v = b.u
         | GROUP BY e.u""".stripMargin.replaceAll("\n", "")
    })

  /** q193 — bridge-edge fragility audit per near-dup cluster: an edge
    * in NO triangle is uncorroborated — a single LSH verification is
    * the only evidence holding its two sides together, so a cluster
    * whose spanning structure is mostly such edges is a chain merge
    * that one false positive would have caused (the q86 over-merge
    * audit from the edge side; q114's k-core finds the corroborated
    * CORE, this scores what hangs off it). Per cluster: member count,
    * edge count, triangle-free edge count, and fragility
    * `bridges·10⁶ div edges` in exact e6 fixed point.
    *
    * Scale shape: triangle support reuses q107's degree-oriented wedge
    * machinery verbatim (arboricity-bounded, oriented list flushed once
    * — it is referenced three times); triangle edges explode 3-per-
    * triangle and distinct-collapse; the bridge flag is one left join
    * of the oriented edge list against that set; cluster labels come
    * from the shared memoized [[DupGraph]] store, so the rollup is
    * node/edge-sized throughout.
    */
  val qBridgeEdges: QuerySpec = QuerySpec(
    "q193_bridge_edges",
    (s, dir) => {
      val edges = DupGraph.edges(s, dir)
      val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      val oriented = Scratch.flush(s, "q193-oriented", edges
        .join(deg.toDF("u", "du"), Seq("u"))
        .join(deg.toDF("v", "dv"), Seq("v"))
        .filter(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")))
        .select(col("u"), col("v"), col("dv")))
      val wedges = oriented.toDF("u", "b", "db")
        .join(oriented.toDF("u", "c", "dc"), Seq("u"))
        .filter(col("db") < col("dc") ||
          (col("db") === col("dc") && col("b") < col("c")))
        .select(col("u").as("a"), col("b"), col("c"))
      val triEdges = wedges
        .join(oriented.select(col("u").as("b"), col("v").as("c")),
          Seq("b", "c"))
        .select(explode(array(
          struct(col("a").as("x"), col("b").as("y")),
          struct(col("a").as("x"), col("c").as("y")),
          struct(col("b").as("x"), col("c").as("y")))).as("e"))
        .select(least(col("e.x"), col("e.y")).as("u"),
          greatest(col("e.x"), col("e.y")).as("v"))
        .distinct()
      val lab = DupGraph.labels(s, dir)
      val members = lab.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"))
      edges.filter(col("u") < col("v"))
        .join(triEdges.withColumn("in_tri", lit(1L)), Seq("u", "v"), "left")
        .join(lab, Seq("u"))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_edges"),
          sum(when(col("in_tri").isNull, 1L).otherwise(0L)).as("n_bridges"))
        .join(members, Seq("cluster_id"))
        .select(col("cluster_id"), col("n_members"), col("n_edges"),
          col("n_bridges"),
          expr("(n_bridges * 1000000) div n_edges").as("frag_e6"))
    },
    Some(s"""WITH RECURSIVE ${Dedup.ccSqlCtes},
            | labels AS MATERIALIZED (SELECT u, MIN(r) AS cluster_id
            |  FROM reach GROUP BY u),
            | deg AS MATERIALIZED (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg
            |  FROM edges GROUP BY u),
            | o AS MATERIALIZED (SELECT e.u, e.v, dv.deg AS dv
            |  FROM edges e JOIN deg du ON e.u = du.u
            |  JOIN deg dv ON e.v = dv.u
            |  WHERE du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)),
            | tri AS MATERIALIZED (SELECT e1.u AS a, e1.v AS b, e2.v AS c
            |  FROM o e1 JOIN o e2 ON e1.u = e2.u
            |   AND (e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v))
            |  JOIN o e3 ON e3.u = e1.v AND e3.v = e2.v),
            | te AS MATERIALIZED (SELECT DISTINCT LEAST(x, y) AS u,
            |   GREATEST(x, y) AS v
            |  FROM (SELECT a AS x, b AS y FROM tri
            |   UNION ALL SELECT a, c FROM tri
            |   UNION ALL SELECT b, c FROM tri) z),
            | fl AS (SELECT e.u, e.v, l.cluster_id,
            |   CASE WHEN te.u IS NULL THEN 1 ELSE 0 END AS is_bridge
            |  FROM edges e
            |  LEFT JOIN te ON te.u = e.u AND te.v = e.v
            |  JOIN labels l ON l.u = e.u
            |  WHERE e.u < e.v),
            | mem AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT)
            |   AS n_members FROM labels GROUP BY cluster_id),
            | agg AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_edges,
            |   CAST(SUM(is_bridge) AS BIGINT) AS n_bridges
            |  FROM fl GROUP BY cluster_id)
            | SELECT a.cluster_id AS cluster_id, m.n_members AS n_members,
            |  a.n_edges AS n_edges, a.n_bridges AS n_bridges,
            |  CAST((a.n_bridges * 1000000) // a.n_edges AS BIGINT) AS frag_e6
            | FROM agg a JOIN mem m
            |  ON a.cluster_id = m.cluster_id""".stripMargin
      .replaceAll("\n", "")))

  val specs: Seq[QuerySpec] =
    Seq(qPageRank, qCentralCanonical, qTriangles, qKcore, qBridgeEdges)
}
