package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions.{BpeDocTokens, PolyHash, WordShingleHashes, WordShingles}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-level training-data operators: benchmark decontamination,
  * deterministic stratified sampling, repetition/boilerplate scoring,
  * and vocabulary (n-gram frequency) construction.
  *
  * Scale stance (same rules as [[Dedup]]):
  *  - decontamination candidates come ONLY from an equi-join on shingle
  *    hashes, with the (small) benchmark side broadcast — never a
  *    text-vs-text comparison;
  *  - sampling is a stateless map-side predicate on a deterministic
  *    hash, so it needs no shuffle, no RNG state, and re-runs
  *    reproducibly on any cluster layout;
  *  - repetition ratios are per-row codegen'd kernels;
  *  - vocabulary counting is the canonical explode → partial-agg →
  *    shuffle-on-gram → TakeOrdered shape.
  */
object Corpus {

  /** DuckDB CTEs `dt` (tokens) and `ds` (doc_id, distinct k-shingle
    * hashes) — the k-parameterized twin of [[Dedup]]'s 3-gram CTE.
    */
  private[operators] def shingleCtes(k: Int): String = {
    val concat = (0 until k).map(j => s"tk[i + $j]").mkString(" || ' ' || ")
    s"""dt AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       | ds AS (SELECT doc_id, list_distinct(list_transform(
       |   list_transform(range(1, greatest(len(tk) - ${k - 1}, 0) + 1),
       |     i -> $concat),
       |   s -> ${PolyHash.oracleSql("s")})) AS H FROM dt)""".stripMargin
      .replaceAll("\n", "")
  }

  /** q46 — benchmark decontamination: flag every training document that
    * shares at least one word-5-gram with the held-out evaluation set
    * (`doc_id % 10 == 0` plays the benchmark), with the count of
    * overlapping distinct shingles. The eval side is tiny relative to a
    * 100 TB corpus, so it is broadcast; the train side never shuffles —
    * the plan is scan → explode → broadcast-hash-join → partial agg →
    * one shuffle on doc_id.
    */
  val qDecontaminate: QuerySpec = QuerySpec(
    "q46_decontaminate",
    (s, dir) => {
      val sh = Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(WordShingleHashes(col("text"), 5)).as("h"))
      val bench = sh.filter(col("doc_id") % 10 === 0).select(col("h")).distinct()
      val train = sh.filter(col("doc_id") % 10 =!= 0)
      train.join(broadcast(bench), "h")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hits"))
    },
    Some(s"""WITH ${shingleCtes(5)},
            | bench AS (SELECT DISTINCT unnest(H) AS h FROM ds WHERE doc_id % 10 = 0),
            | train AS (SELECT doc_id, unnest(H) AS h FROM ds WHERE doc_id % 10 <> 0)
            | SELECT t.doc_id, COUNT(*) AS n_hits
            | FROM train t JOIN bench b ON t.h = b.h
            | GROUP BY t.doc_id""".stripMargin.replaceAll("\n", "")))

  /** q47 — deterministic stratified sampling: keep a per-source fraction
    * of documents decided by a salted [[PolyHash]] of the doc_id (rates
    * 5/10/15/20 % derived from the source index). Hash-mod sampling is
    * the production form at 100 TB: a pure map-side predicate —
    * reproducible across runs and cluster layouts, no RNG state, no
    * shuffle, and the same row set regardless of partitioning.
    */
  val qSampleStratified: QuerySpec = QuerySpec(
    "q47_sample_stratified",
    (s, dir) => {
      val rate = lit(5) + lit(5) *
        (substring(col("source"), 4, 10).cast("int") % 4)
      val h = PolyHash(concat(lit("sample|"), col("doc_id").cast("string")))
      Tables.load(s, dir, "documents")
        .filter(h % 100 < rate)
        .select(col("doc_id"), col("source"), col("lang"))
    },
    Some(s"""SELECT doc_id, source, lang FROM documents
            | WHERE ${PolyHash.oracleSql("'sample|' || CAST(doc_id AS VARCHAR)")} % 100
            |  < 5 + 5 * (CAST(substr(source, 4, 10) AS INT) % 4)""".stripMargin
      .replaceAll("\n", "")))

  /** q48 — repetition/boilerplate scoring (the Gopher-style quality
    * signal): per document, the fraction of duplicate words and
    * duplicate word-bigrams. Distinctness is counted over [[PolyHash]]
    * values on BOTH engines, so the comparison is bit-exact; ratios are
    * single IEEE divisions of exact integers. Pure map-side codegen —
    * no shuffle.
    */
  val qRepetition: QuerySpec = QuerySpec(
    "q48_repetition",
    (s, dir) => {
      val toks = size(split(col("text"), " "))
      val uniqW = size(WordShingleHashes(col("text"), 1))
      val uniqB = size(WordShingleHashes(col("text"), 2))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          toks.cast("long").as("n_tokens"),
          ((toks - uniqW).cast("double") / toks.cast("double"))
            .as("dup_word_ratio"),
          when(toks > 1,
            (toks - 1 - uniqB).cast("double") / (toks - 1).cast("double"))
            .as("dup_bigram_ratio"))
    },
    Some {
      // two-stage transform (materialize gram strings with `i`, hash with
      // `s`) — inlining the hash inside the `i` lambda would let the
      // hash's own `i` range variable SHADOW the outer one in `tk[i]`
      s"""WITH dt AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
         | SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
         |  CAST(len(tk) - len(list_distinct(list_transform(tk,
         |    s -> ${PolyHash.oracleSql("s")}))) AS DOUBLE)
         |   / CAST(len(tk) AS DOUBLE) AS dup_word_ratio,
         |  CASE WHEN len(tk) > 1 THEN
         |   CAST((len(tk) - 1) - len(list_distinct(list_transform(
         |     list_transform(range(1, greatest(len(tk) - 1, 0) + 1),
         |       i -> tk[i] || ' ' || tk[i + 1]),
         |     s -> ${PolyHash.oracleSql("s")}))) AS DOUBLE)
         |    / CAST(len(tk) - 1 AS DOUBLE) END AS dup_bigram_ratio
         | FROM dt""".stripMargin.replaceAll("\n", "")
    })

  /** q206 — INTRA-document repetition TRIM (q48's rewrite twin, the Rae
    * et al. 2021 repetition-removal step; q130 splices CROSS-doc shared
    * passages, this trims WITHIN-doc repeats): every word position
    * covered by a repeated trigram occurrence — a trigram position p
    * whose gram already occurred at a lower position in the SAME doc —
    * is removed, keeping each repeated run's first occurrence; the doc
    * is re-emitted with removed-token accounting. The rule is a closed
    * form (no greedy left-to-right state): removed positions =
    * ⋃ {p..p+2 : gram(p) = gram(p') for some p' < p}, which both
    * engines compute identically from a (doc, gram, position) frame.
    * Trigram strings join tokens with single spaces — injective, since
    * whitespace-split tokens never contain spaces.
    *
    * Scale shape: one gram explosion (3 rows/word), a (doc_id, gram)
    * first-occurrence aggregate whose join back reuses the SAME
    * partitioning, an extent explode bounded by 3× the repeat count
    * collapsed map-side via distinct, and the one-pass q130 splice
    * ([[Dedup.spliceTokens]] — the per-doc token filter is the shared
    * rewrite-pass HOF exception). Per-doc windows never appear; nothing
    * is corpus-quadratic — candidates are (doc, gram)-keyed, intra-doc
    * only.
    */
  val qRepetitionTrim: QuerySpec = QuerySpec(
    "q206_repetition_trim",
    (s, dir) => {
      // r18: the removal cover is INTRA-document, so the whole pipeline
      // (gram posexplode → (doc, gram) first-occurrence aggregate →
      // join-back → extent explode → distinct → collect_list → splice
      // join) collapses into two composed row kernels — the query is
      // now a single map-side pass with zero exchanges (guide §2.4).
      // DocKernelsSpec pins kernel ≡ legacy; the oracle is unchanged.
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.SpliceByPositions(col("text"),
            graft.functions.RepeatedGramCover(col("text"), 3)).as("r"))
        .select(col("doc_id"),
          col("r.n_tokens_before").as("n_tokens_before"),
          col("r.n_removed").as("n_removed"),
          col("r.clean_text").as("trimmed_text"))
    },
    // DuckDB positions are 1-based end-to-end (range(1,…) grams,
    // list_filter's 1-based index) where Spark is 0-based end-to-end
    // (posexplode, filter's 0-based index) — each side self-consistent,
    // and no position column reaches the output (the q130 convention)
    Some("""WITH dt AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
           | g AS (SELECT doc_id,
           |   unnest(list_transform(range(1, greatest(len(tk) - 2, 0) + 1),
           |     i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS gram,
           |   CAST(unnest(range(1, greatest(len(tk) - 2, 0) + 1))
           |     AS BIGINT) AS p
           |  FROM dt),
           | f AS (SELECT doc_id, gram, MIN(p) AS fp
           |  FROM g GROUP BY doc_id, gram),
           | rem AS (SELECT DISTINCT doc_id, wp FROM (
           |   SELECT g.doc_id, CAST(unnest(range(g.p, g.p + 3)) AS BIGINT)
           |     AS wp
           |   FROM g JOIN f ON g.doc_id = f.doc_id AND g.gram = f.gram
           |   WHERE g.p > f.fp)),
           | rp AS (SELECT doc_id, list(wp) AS rpos FROM rem GROUP BY doc_id),
           | dt2 AS (SELECT d.doc_id, string_split(d.text, ' ') AS tk, rp.rpos
           |  FROM documents d LEFT JOIN rp ON d.doc_id = rp.doc_id)
           | SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens_before,
           |  CAST(COALESCE(len(rpos), 0) AS BIGINT) AS n_removed,
           |  COALESCE(array_to_string(list_filter(tk, (x, xi) ->
           |    rpos IS NULL OR NOT list_contains(rpos, xi)), ' '), '')
           |   AS trimmed_text
           | FROM dt2""".stripMargin.replaceAll("\n", "")))

  /** q49 — corpus vocabulary: the 20 most frequent word bigrams with a
    * unique tiebreak on the gram itself. [[WordShingles]] keeps
    * duplicate occurrences (unlike the dedup kernels) — frequency is the
    * point. Map-side partial aggregation absorbs the explosion before
    * the single shuffle on the gram; TakeOrdered keeps only k per
    * partition.
    */
  val qVocabBigrams: QuerySpec = QuerySpec(
    "q49_vocab_bigrams",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(explode(WordShingles(col("text"), 2)).as("gram"))
        .groupBy(col("gram"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("gram").asc)
        .limit(20),
    Some(s"""WITH dt AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
            | g AS (SELECT unnest(list_transform(
            |   range(1, greatest(len(tk) - 1, 0) + 1),
            |   i -> tk[i] || ' ' || tk[i + 1])) AS gram FROM dt)
            | SELECT gram, COUNT(*) AS cnt FROM g GROUP BY gram
            | ORDER BY cnt DESC, gram ASC LIMIT 20""".stripMargin
      .replaceAll("\n", "")))

  /** q55 — per-group top-k: the 2 longest documents per source (unique
    * tiebreak on doc_id). The per-entity top-k shape — rank within a
    * window partition, filter rank ≤ k — distinct from global top-k
    * (q15, TakeOrdered) and full ranking (q13): one shuffle on the
    * group key, and the rank filter truncates each group before
    * anything downstream sees it.
    */
  val qGroupedTopK: QuerySpec = QuerySpec(
    "q55_grouped_topk",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      Tables.load(s, dir, "documents")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2)
        .select(col("source"), col("rk").cast("long").as("rk"),
          col("doc_id"), col("n_chars"))
    },
    Some("""SELECT source, rk, doc_id, n_chars FROM (
           |  SELECT source, doc_id, n_chars, CAST(ROW_NUMBER() OVER (
           |    PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS rk
           |  FROM documents)
           | WHERE rk <= 2""".stripMargin.replaceAll("\n", "")))

  /** q56 — sequence packing (concat-and-chunk): lay documents out
    * end-to-end in a deterministic order and cut fixed token-budget
    * training sequences, letting documents straddle a cut — the layout
    * step between tokenization and training. Each doc gets its global
    * start offset within its shard's token stream, the sequence id it
    * starts in, and the offset inside that sequence.
    *
    * Packing is per SOURCE stream, but the prefix sum is computed
    * TWO-LEVEL: source cardinality is tiny (4 here), so a
    * `Window.partitionBy(source)` cumsum would serialize each source's
    * entire stream through ONE task — a 25 TB sequential scan per
    * source at target scale. Instead:
    *
    *  1. docs are sharded into fixed (source, block) ranges
    *     (`block = doc_id div 1024`) and the within-block exclusive
    *     cumsum runs as a window over (source, block) — thousands of
    *     parallel partitions, and the follow-up per-block total
    *     aggregation reuses the SAME partitioning (no extra shuffle;
    *     AQE reuses the one exchange for both branches);
    *  2. block totals (N/1024 rows) get their own per-source exclusive
    *     cumsum — a window over the tiny summary table — and the block
    *     offset is broadcast-joined back and added.
    *
    * The composition is EXACTLY the per-source prefix sum (blocks are
    * doc_id-ordered), which is why the oracle stays the direct
    * one-window-per-source SQL: the gate proves the two-level
    * decomposition equivalent. At even larger scale the summary-level
    * window recurses the same way. Token counts are whitespace tokens
    * (the q29 ws_tokens definition).
    */
  /** The q56 two-level packing over an arbitrary (source, doc_id, text)
    * frame — shared by the gated query and [[graft.CurationRun]]'s
    * shard-layout stage.
    */
  private[graft] def sequencePack(docs: DataFrame, budget: Long = 4096L): DataFrame =
    packOffsets(docs.select(col("source"), col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tok")), budget)

  /** The q56 two-level offset assignment over a precomputed
    * (source, doc_id, n_tok) frame — the packing machinery with the
    * token-count definition factored out, so q203's SUBWORD counts pack
    * through the identical plan the whitespace counts do.
    */
  private[graft] def packOffsets(counts: DataFrame, budget: Long): DataFrame = {
      val wIn = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"), col("block"))
        .orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val wBlk = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("block"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val inBlock = counts
        .select(col("source"), col("doc_id"), col("n_tok"),
          expr("doc_id div 1024").as("block"))
        .withColumn("in_off", coalesce(sum(col("n_tok")).over(wIn), lit(0L)))
      // last doc's exclusive offset + its tokens = the block total; the
      // groupBy keys equal the window partition keys, so no new shuffle
      val blockOff = inBlock
        .groupBy(col("source"), col("block"))
        .agg(max(col("in_off") + col("n_tok")).as("blk_tok"))
        .withColumn("blk_off", coalesce(sum(col("blk_tok")).over(wBlk), lit(0L)))
        .select(col("source"), col("block"), col("blk_off"))
      inBlock.join(broadcast(blockOff), Seq("source", "block"))
        .withColumn("start_tok", col("blk_off") + col("in_off"))
        .select(col("source"), col("doc_id"), col("n_tok"),
          col("start_tok"),
          (col("start_tok") / budget).cast("long").as("seq_id"),
          (col("start_tok") % budget).as("seq_off"))
  }

  val qSequencePack: QuerySpec = QuerySpec(
    "q56_sequence_pack",
    (s, dir) => sequencePack(Tables.load(s, dir, "documents")),
    Some("""WITH t AS (SELECT source, doc_id,
           |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           |  FROM documents),
           | c AS (SELECT *, CAST(COALESCE(SUM(n_tok) OVER (
           |   PARTITION BY source ORDER BY doc_id
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           |   AS start_tok
           |  FROM t)
           | SELECT source, doc_id, n_tok, start_tok,
           |  start_tok // 4096 AS seq_id, start_tok % 4096 AS seq_off
           | FROM c""".stripMargin.replaceAll("\n", "")))

  /** q61 — mixture sampling to a token budget: the data-mixing step of a
    * pretraining pipeline. Each source gets a target share of a global
    * token budget (weights derived deterministically from the source
    * name), the per-source sampling rate is `min(1, desired/available)`,
    * and documents are admitted by hash-mod against the rate — fully
    * deterministic, layout-independent, reproducible.
    *
    * Scale shape: one pass computes per-source token mass (partial-agg,
    * 20 groups), the one-row global total cross-joins back (both sides
    * tiny), and the admission predicate is pure map-side over the corpus
    * with the 20-row rate table broadcast. No shuffle touches the
    * corpus except the final per-source count aggregation.
    *
    * Determinism of the rate: weights are INTEGERS (their sum is exact),
    * and the double arithmetic is a fixed parenthesization of IEEE
    * mul/div on exactly-converted integers — no libm, no double SUM —
    * then floored to an integer threshold out of 10^6.
    */
  val qMixtureSample: QuerySpec = QuerySpec(
    "q61_mixture_sample",
    (s, dir) => {
      val toks = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      val perSrc = toks.groupBy(col("source"))
        .agg(sum(col("n_tok")).as("src_tok"))
        .withColumn("wraw",
          (lit(1) + substring(col("source"), 4, 10).cast("int") % 4).cast("long"))
      val tot = perSrc.agg(sum(col("src_tok")).as("tot_tok"),
        sum(col("wraw")).as("wsum"))
      val rates = perSrc.crossJoin(tot)
        .withColumn("rate",
          least(lit(1.0d),
            col("tot_tok").cast("double") * 0.5d * col("wraw").cast("double")
              / col("wsum").cast("double") / col("src_tok").cast("double")))
        .withColumn("thr", floor(col("rate") * 1000000.0d).cast("long"))
        .select(col("source"), col("thr"))
      toks.join(broadcast(rates), Seq("source"))
        .filter(PolyHash(concat(lit("mix|"), col("doc_id").cast("string")))
          % 1000000L < col("thr"))
        .groupBy(col("source"), col("thr"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tok_sampled"))
    },
    Some(s"""WITH t AS (SELECT doc_id, source,
            |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
            |  FROM documents),
            | ps AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS src_tok,
            |   CAST(1 + CAST(substr(source, 4, 10) AS INT) % 4 AS BIGINT) AS wraw
            |  FROM t GROUP BY source),
            | tot AS (SELECT CAST(SUM(src_tok) AS BIGINT) AS tot_tok,
            |   CAST(SUM(wraw) AS BIGINT) AS wsum FROM ps),
            | rates AS (SELECT source,
            |   CAST(floor(least(1.0,
            |     CAST(tot_tok AS DOUBLE) * 0.5 * CAST(wraw AS DOUBLE)
            |       / CAST(wsum AS DOUBLE) / CAST(src_tok AS DOUBLE))
            |     * 1000000.0) AS BIGINT) AS thr
            |  FROM ps, tot)
            | SELECT t.source, r.thr, COUNT(*) AS n_docs,
            |  CAST(SUM(t.n_tok) AS BIGINT) AS n_tok_sampled
            | FROM t JOIN rates r ON t.source = r.source
            | WHERE ${PolyHash.oracleSql("'mix|' || CAST(doc_id AS VARCHAR)")}
            |   % 1000000 < r.thr
            | GROUP BY 1, 2""".stripMargin.replaceAll("\n", "")))

  /** q132 — temperature-weighted mixture PLANNER (τ = 1/2): q61 samples
    * under externally fixed weights; this derives the weights from the
    * data the way multilingual/multi-source training mixtures are
    * actually set (public technique: sampling probability ∝ n^τ — the
    * flattening exponent of the multilingual-BERT / XLM-R exposure
    * correction). Per source: natural token share, temperature share
    * ∝ √src_tok, the token target under a budget of half the corpus,
    * and the epochs factor (target/size — how many times a low-resource
    * source repeats; the over/under-sampling number a mixture review
    * reads). τ = 1/2 is the one temperature expressible without the
    * banned `pow` (IEEE `sqrt` is exact in both engines); the √ is
    * quantized to fixed-point 1/1000ths BEFORE summation so the weight
    * normalizer is an integer sum (order-insensitive — a raw double Σ
    * would diverge between engines), and every division is a single
    * IEEE double op or integer `div`.
    *
    * Scale shape: one map-side token-count agg to ≤|sources| rows; the
    * single-row totals frame broadcast-joins back. Integer headroom:
    * (tot_tok div 2) · wq needs tot_tok · √tot_tok · 10³ < 2⁶³ —
    * fine to ~10¹³ tokens; past that the products graduate to
    * DECIMAL(38) (the q63 rule).
    */
  /** The q132 planner over an arbitrary (source, text) frame — shared
    * by the gated query and [[graft.CurationRun]]'s mixture stage.
    */
  private[graft] def mixturePlan(docs: DataFrame): DataFrame = {
      val perSrc = docs
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .groupBy(col("source")).agg(sum(col("n_tok")).as("src_tok"))
        .withColumn("wq",
          floor(sqrt(col("src_tok").cast("double")) * lit(1000.0d)).cast("long"))
      val tot = perSrc.agg(sum(col("src_tok")).as("tot_tok"),
        sum(col("wq")).as("wq_sum"))
      perSrc.crossJoin(tot) // tot is one row — broadcast by construction
        .withColumn("natural_share",
          col("src_tok").cast("double") / col("tot_tok").cast("double"))
        .withColumn("temp_share",
          col("wq").cast("double") / col("wq_sum").cast("double"))
        .withColumn("target_tok", expr("((tot_tok div 2) * wq) div wq_sum"))
        .withColumn("epochs",
          col("target_tok").cast("double") / col("src_tok").cast("double"))
        .select(col("source"), col("src_tok"), col("natural_share"),
          col("temp_share"), col("target_tok"), col("epochs"))
  }

  val qMixturePlanner: QuerySpec = QuerySpec(
    "q132_mixture_planner",
    (s, dir) => mixturePlan(Tables.load(s, dir, "documents")),
    Some(s"""WITH t AS (SELECT source,
            |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
            |  FROM documents),
            | ps AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS src_tok
            |  FROM t GROUP BY source),
            | w AS (SELECT source, src_tok,
            |   CAST(floor(sqrt(CAST(src_tok AS DOUBLE)) * 1000.0) AS BIGINT)
            |    AS wq FROM ps),
            | tot AS (SELECT CAST(SUM(src_tok) AS BIGINT) AS tot_tok,
            |   CAST(SUM(wq) AS BIGINT) AS wq_sum FROM w)
            | SELECT source, src_tok,
            |  CAST(src_tok AS DOUBLE) / CAST(tot_tok AS DOUBLE) AS natural_share,
            |  CAST(wq AS DOUBLE) / CAST(wq_sum AS DOUBLE) AS temp_share,
            |  CAST(((tot_tok // 2) * wq) // wq_sum AS BIGINT) AS target_tok,
            |  CAST(((tot_tok // 2) * wq) // wq_sum AS DOUBLE)
            |   / CAST(src_tok AS DOUBLE) AS epochs
            | FROM w, tot""".stripMargin.replaceAll("\n", "")))

  /** q62 — deterministic training shuffle: give every document a
    * reproducible pseudo-random position in one of 4096 shards — the
    * global-shuffle layout step between curation and sequence packing
    * (training wants decorrelated document order; a seeded hash gives
    * the same permutation on any cluster, any layout, any retry).
    *
    * Scale shape: shard = hash % 4096 is map-side; the within-shard
    * position is a window over the shard key — 4096 parallel partitions
    * sized to stay small even at 10^9 documents (~250k rows per shard)
    * (and the shard count scales with the cluster, unlike a single
    * global ORDER BY, which would funnel the corpus through one task).
    * The (hash, doc_id) ordering key is collision-proof: doc_id breaks
    * ties deterministically.
    */
  val qShardShuffle: QuerySpec = QuerySpec(
    "q62_shard_shuffle",
    (s, dir) => {
      val h = PolyHash(concat(lit("shuffle|"), col("doc_id").cast("string")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), h.as("h"))
        .withColumn("shard", pmod(col("h"), lit(4096L)))
        .withColumn("pos", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("shard"), col("pos"))
    },
    Some(s"""WITH t AS (SELECT doc_id,
            |   ${PolyHash.oracleSql("'shuffle|' || CAST(doc_id AS VARCHAR)")} AS h
            |  FROM documents)
            | SELECT doc_id, h % 4096 AS shard,
            |  CAST(ROW_NUMBER() OVER (PARTITION BY h % 4096 ORDER BY h, doc_id)
            |    AS BIGINT) AS pos
            | FROM t""".stripMargin.replaceAll("\n", "")))

  /** q164 — shard checksum manifest: per q62 training shard, the doc
    * count, token total, and an order-insensitive content checksum
    * (Σ PolyHash(text) mod P) — the reproducibility artifact a training
    * job records next to its data ("same manifest ⇒ bit-identical shard
    * inputs on any cluster, any layout, any retry"), and the fast diff
    * when two runs disagree (mismatched shards localize the
    * discrepancy without re-reading content). The modular sum is
    * associative and commutative, so the checksum is independent of
    * row order and partitioning by construction.
    *
    * Scale shape: pure map (two codegen'd hashes per row) + one
    * 4096-group aggregate with map-side combine. Per-shard Σ h before
    * the mod stays under 2^63 up to ~4×10^9 docs PER SHARD (h < 2^31)
    * — at larger shards, fold the mod into a two-level agg.
    */
  /** q164/q170's manifest pass over an arbitrary documents frame: one
    * map (two codegen'd hashes per row) + one 4096-group map-side-
    * combined aggregate.
    */
  private[graft] def shardManifest(docs: DataFrame): DataFrame = {
    val shard = pmod(
      PolyHash(concat(lit("shuffle|"), col("doc_id").cast("string"))),
      lit(4096L))
    docs
      .select(shard.as("shard"), PolyHash(col("text")).as("h"),
        graft.TextMetrics.wordCount(col("text")).cast("long").as("w"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("n_tok"),
        (sum(col("h")) % PolyHash.P).as("checksum"))
  }

  val qShardChecksums: QuerySpec = QuerySpec(
    "q164_shard_checksums",
    (s, dir) => shardManifest(Tables.load(s, dir, "documents")),
    Some(s"""WITH t AS (SELECT
            |   ${PolyHash.oracleSql("'shuffle|' || CAST(doc_id AS VARCHAR)")}
            |     % 4096 AS shard,
            |   ${PolyHash.oracleSql("text")} AS h,
            |   CAST(${graft.TextMetrics.wordCountSql("text")} AS BIGINT) AS w
            |  FROM documents)
            | SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
            |  CAST(SUM(w) AS BIGINT) AS n_tok,
            |  CAST(SUM(h) % ${PolyHash.P} AS BIGINT) AS checksum
            | FROM t GROUP BY shard""".stripMargin.replaceAll("\n", "")))

  /** The q164 manifest as a DuckDB subquery over `src` (any relation
    * with doc_id, text).
    */
  private def manifestSql(src: String): String =
    s"""(SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(w) AS BIGINT) AS n_tok,
       |  CAST(SUM(h) % ${PolyHash.P} AS BIGINT) AS checksum
       | FROM (SELECT
       |   ${PolyHash.oracleSql("'shuffle|' || CAST(doc_id AS VARCHAR)")}
       |     % 4096 AS shard,
       |   ${PolyHash.oracleSql("text")} AS h,
       |   CAST(${graft.TextMetrics.wordCountSql("text")} AS BIGINT) AS w
       |  FROM $src) GROUP BY shard)""".stripMargin.replaceAll("\n", "")

  /** q170 — manifest diff: given two q164 shard manifests (run A = the
    * corpus as shipped; run B = a deterministically drifted twin — one
    * doc in ~101 rewritten, one in ~103 dropped, standing in for the
    * second pipeline run being audited), the shards where ANY manifest
    * field disagrees, labeled `changed` / `only_a` / `only_b`. This is
    * the localization step the q164 scaladoc promises: two 100 TB runs
    * that disagree are diffed over two 4096-row manifests — no content
    * is re-read; only the named shards are then re-examined.
    *
    * Scale shape: in production both inputs are PERSISTED manifests, so
    * the diff is a full-outer join of two ≤4096-row frames; here both
    * sides are built in-query (two q164 passes) to keep the gate
    * self-contained. The difference predicate uses null-safe equality,
    * so a shard present on one side only surfaces instead of vanishing.
    */
  val qManifestDiff: QuerySpec = QuerySpec(
    "q170_manifest_diff",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val drifted = docs
        .filter(pmod(col("doc_id"), lit(103L)) =!= 5L)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(101L)) === 7L,
            concat(col("text"), lit(" graft drift"))).otherwise(col("text")))
      val a = shardManifest(docs)
        .toDF("shard", "n_docs_a", "n_tok_a", "checksum_a")
      val b = shardManifest(drifted)
        .toDF("shard", "n_docs_b", "n_tok_b", "checksum_b")
      a.join(b, Seq("shard"), "full_outer")
        .filter(not(col("checksum_a") <=> col("checksum_b")) ||
          not(col("n_docs_a") <=> col("n_docs_b")) ||
          not(col("n_tok_a") <=> col("n_tok_b")))
        .select(col("shard"),
          col("n_docs_a"), col("n_docs_b"), col("n_tok_a"), col("n_tok_b"),
          col("checksum_a"), col("checksum_b"),
          when(col("checksum_a").isNull, lit("only_b"))
            .when(col("checksum_b").isNull, lit("only_a"))
            .otherwise(lit("changed")).as("status"))
    },
    Some(s"""WITH a AS ${manifestSql("documents")},
            | b AS ${manifestSql(
               "(SELECT doc_id, CASE WHEN doc_id % 101 = 7" +
                 " THEN text || ' graft drift' ELSE text END AS text" +
                 " FROM documents WHERE doc_id % 103 <> 5)")}
            | SELECT shard, a.n_docs AS n_docs_a, b.n_docs AS n_docs_b,
            |  a.n_tok AS n_tok_a, b.n_tok AS n_tok_b,
            |  a.checksum AS checksum_a, b.checksum AS checksum_b,
            |  CASE WHEN a.checksum IS NULL THEN 'only_b'
            |   WHEN b.checksum IS NULL THEN 'only_a'
            |   ELSE 'changed' END AS status
            | FROM a FULL JOIN b USING (shard)
            | WHERE a.checksum IS DISTINCT FROM b.checksum
            |  OR a.n_docs IS DISTINCT FROM b.n_docs
            |  OR a.n_tok IS DISTINCT FROM b.n_tok""".stripMargin
      .replaceAll("\n", "")))

  /** q73 — shard-balance audit for the training shuffle: the used-shard
    * count, size range, mean, and imbalance ratio (max/mean) of q62's
    * deterministic 4096-way sharding. THE straggler check before a
    * training run: one hot shard = one task pinning the whole epoch, so
    * the layout step ships with its own balance report. Integer-exact
    * until two final IEEE divisions (mean = Σn/used; imbalance expressed
    * as max·used/Σn — one integer product, one division — so both
    * engines agree bitwise).
    *
    * Scale shape: shard assignment is the same map-side hash-mod as q62;
    * per-shard counts collapse through map-side combine on the 4096-key
    * groupBy; the report is one single-row aggregate over ≤ 4096 rows.
    */
  val qShardBalance: QuerySpec = QuerySpec(
    "q73_shard_balance",
    (s, dir) => {
      val h = PolyHash(concat(lit("shuffle|"), col("doc_id").cast("string")))
      Tables.load(s, dir, "documents")
        .select(pmod(h, lit(4096L)).as("shard"))
        .groupBy(col("shard")).agg(count(lit(1)).as("n"))
        .agg(
          count(lit(1)).as("n_shards_used"),
          min(col("n")).as("min_size"),
          max(col("n")).as("max_size"),
          (sum(col("n")).cast("double") / count(lit(1)).cast("double"))
            .as("avg_size"),
          ((max(col("n")) * count(lit(1))).cast("double") /
            sum(col("n")).cast("double")).as("imbalance"))
    },
    Some(s"""WITH t AS (SELECT
            |   ${PolyHash.oracleSql("'shuffle|' || CAST(doc_id AS VARCHAR)")}
            |     % 4096 AS shard FROM documents),
            | g AS (SELECT shard, COUNT(*) AS n FROM t GROUP BY shard)
            | SELECT COUNT(*) AS n_shards_used, MIN(n) AS min_size,
            |  MAX(n) AS max_size,
            |  CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_size,
            |  CAST(MAX(n) * COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
            |    AS imbalance
            | FROM g""".stripMargin.replaceAll("\n", "")))

  /** q68 — cross-language vocabulary overlap: per language pair, the two
    * vocabulary sizes, the shared-word count, and the vocabulary Jaccard
    * — the corpus-analytics signal for mislabeled language tags and
    * cross-lingual leakage (two "different languages" sharing 90% of
    * their vocabulary are one language, or one corpus bug). Pairs with
    * zero shared words are absent (inner-join semantics) — the
    * interesting signal is high overlap, not zero.
    *
    * Scale shape: the (lang, word) DISTINCT is one shuffle with map-side
    * dedup; the intersection is an equi-join ON WORD (vocabulary-sized,
    * both sides shrunk to distinct terms before the join — never a
    * doc-level join); the per-language sizes ride in on a broadcast of a
    * |langs|-row aggregate. Output is C(|langs|, 2) rows. The Jaccard is
    * one integer-to-integer IEEE division, exact on both engines.
    */
  val qLangVocabOverlap: QuerySpec = QuerySpec(
    "q68_lang_vocab_overlap",
    (s, dir) => {
      val v = Tables.load(s, dir, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .distinct()
      val sizes = v.groupBy(col("lang")).agg(count(lit(1)).as("vsize"))
      v.alias("a")
        .join(v.alias("b"),
          col("a.w") === col("b.w") && col("a.lang") < col("b.lang"))
        .groupBy(col("a.lang").as("lang_1"), col("b.lang").as("lang_2"))
        .agg(count(lit(1)).as("n_common"))
        .join(broadcast(sizes.select(col("lang").as("lang_1"), col("vsize").as("v1"))),
          "lang_1")
        .join(broadcast(sizes.select(col("lang").as("lang_2"), col("vsize").as("v2"))),
          "lang_2")
        .select(col("lang_1"), col("lang_2"), col("v1"), col("v2"), col("n_common"),
          (col("n_common").cast("double") /
            (col("v1") + col("v2") - col("n_common")).cast("double")).as("jaccard"))
    },
    Some("""WITH vf AS (SELECT DISTINCT lang, w FROM (
           |   SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
           |  WHERE len(w) > 0),
           | sizes AS (SELECT lang, COUNT(*) AS vsize FROM vf GROUP BY lang),
           | common AS (SELECT a.lang AS lang_1, b.lang AS lang_2,
           |   COUNT(*) AS n_common
           |  FROM vf a JOIN vf b ON a.w = b.w AND a.lang < b.lang
           |  GROUP BY 1, 2)
           | SELECT lang_1, lang_2, s1.vsize AS v1, s2.vsize AS v2, n_common,
           |  CAST(n_common AS DOUBLE) /
           |  CAST(s1.vsize + s2.vsize - n_common AS DOUBLE) AS jaccard
           | FROM common JOIN sizes s1 ON common.lang_1 = s1.lang
           |  JOIN sizes s2 ON common.lang_2 = s2.lang""".stripMargin
      .replaceAll("\n", "")))

  // ---- BPE merge training -------------------------------------------------

  /** Merge steps learned by q75 — small enough for an unrolled oracle,
    * large enough that later merges build on earlier merged tokens.
    */
  private[graft] val BpeMergeSteps = 8

  /** q75 — BPE vocabulary training: learn the first [[BpeMergeSteps]]
    * byte-pair merges over the corpus word vocabulary — the tokenizer-
    * training step of a training-data pipeline. Each step counts
    * adjacent symbol pairs (weighted by word frequency), takes the most
    * frequent pair (ties → lexicographic smallest), and merges every
    * occurrence.
    *
    * Representation is the trick that keeps both engines bit-identical:
    * a word's symbol sequence is a STRING with every symbol bracketed
    * (`low` → `[l][o][w]`), so applying merge (l, r) is a literal string
    * replace of `[l][r]` with `[lr]` — Spark's `replace` and DuckDB's
    * scan left-to-right non-overlapping, which is exactly BPE's greedy
    * leftmost application, and adjacent occurrences never share a
    * delimiter (unlike space-joined tokens) so `[a][b][a][b]` merges
    * BOTH pairs. Tokens are guarded to `^[a-z]+$` (identical under Java
    * regex and RE2) so the brackets can never collide with content.
    *
    * Scale shape: the iteration state is the VOCABULARY (distinct words
    * × frequency — the corpus-size-independent summary every BPE
    * trainer uses), persisted once; each step is one distributed
    * pair-count aggregation (explode adjacent pairs → partial agg →
    * shuffle on the pair) and a driver collect of exactly ONE row (the
    * argmax — the same tiny-scalar collect as the k-means codebooks).
    * The per-element `transform` lambda runs interpreted, but over
    * vocab-sized data (thousands of rows at 100 TB), never the corpus.
    * The oracle unrolls the same steps as MATERIALIZED CTEs (the
    * iterative-oracle rule).
    */
  /** Run the BPE training loop: (learned merges, final merged vocab as
    * (ws, freq)). The final vocab's lineage is the chained replaces over
    * the initial aggregation — recomputation is vocab-scale, so the
    * returned frame needs no pinning. Used by q75 (the merge table) and
    * q75b (the apply/compression report).
    */
  private def bpeTrain(s: SparkSession, dir: String)
      : (Seq[(Long, String, String, Long)], org.apache.spark.sql.DataFrame) = {
    import s.implicits._
    val vocab0 = Tables.load(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, f) => (w.flatMap(c => s"[$c]"), f) }
      .toDF("ws", "freq")
      // the vocabulary is corpus-size-independent (bounded by distinct
      // lowercase words); a handful of partitions keeps each step's
      // pair-count job at a handful of tasks instead of a full
      // shuffle-partition fan-out — scale-safe because the frame is
      // vocab-sized at ANY corpus scale
      .coalesce(8)
      .persist()
    try {
      var cur = vocab0
      val merges = Seq.newBuilder[(Long, String, String, Long)]
      for (step <- 1 to BpeMergeSteps) {
        // r19: one NARROW job per step — per-partition adjacent-pair
        // counting into a hash map, merged by reduce, argmax +
        // tie-break (cnt desc, lhs asc, rhs asc — [a-z]-only symbols,
        // so Scala string order ≡ Spark UTF8 binary order) on the
        // driver over the bounded merged pair map. Replaces the
        // explode → groupBy exchange → TakeOrdered job per step, whose
        // per-step scheduling overhead dominated the vocab-sized data
        // (guide §1.2; the 8-step dependency chain itself is the
        // algorithm and stays sequential).
        import scala.collection.mutable
        val merged = cur.select(col("ws"), col("freq")).as[(String, Long)]
          .rdd.mapPartitions { it =>
            val m = mutable.HashMap.empty[(String, String), Long]
            it.foreach { case (ws, f) =>
              val tk = ws.substring(1, ws.length - 1).split("\\]\\[", -1)
              var i = 0
              while (i + 1 < tk.length) {
                val k = (tk(i), tk(i + 1))
                m.update(k, m.getOrElse(k, 0L) + f)
                i += 1
              }
            }
            Iterator.single(m)
          }
          .reduce { (a, b) =>
            b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
            a
          }
        val ((l, r), cnt) = merged.minBy { case ((lh, rh), c) => (-c, lh, rh) }
        merges += ((step.toLong, l, r, cnt))
        cur = cur.withColumn("ws",
          expr(s"replace(ws, '[$l][$r]', '[$l$r]')"))
      }
      (merges.result(), cur)
    } finally vocab0.unpersist()
  }

  private val bpeMerges = scala.collection.concurrent.TrieMap
    .empty[String, Seq[(Long, String, String, Long)]]

  /** The trained merge table for `dir`'s corpus (trained on first use;
    * Bench pre-trains in its untimed warmup — a trained tokenizer is a
    * LAYOUT, like the k-means codebooks). q75 itself always re-trains:
    * training IS that operator, so its timing must include it.
    */
  def ensureBpeMerges(s: SparkSession, dir: String): Seq[(Long, String, String, Long)] =
    bpeMerges.getOrElseUpdate(dir, bpeTrain(s, dir)._1)

  val qBpeMerges: QuerySpec = QuerySpec(
    "q75_bpe_merges",
    (s, dir) => {
      import s.implicits._
      val merges = bpeTrain(s, dir)._1
      bpeMerges.put(dir, merges) // training just ran: refresh the layout cache
      merges.toDF("step", "lhs", "rhs", "pair_count")
    },
    Some {
      val out = (1 to BpeMergeSteps).map { k =>
        s"SELECT CAST($k AS BIGINT) AS step, lhs, rhs, cnt AS pair_count FROM m$k"
      }.mkString(" UNION ALL ")
      s"WITH $bpeSqlCtes $out"
    })

  /** The shared oracle chain: `v0` (per-char bracketed vocab) and the
    * `BpeMergeSteps` unrolled (m$k top-pair, v$k merged-vocab) pairs —
    * every CTE MATERIALIZED per the iterative-oracle rule.
    */
  private def bpeSqlCtes: String = {
    val steps = (1 to BpeMergeSteps).map { k =>
      val prev = s"v${k - 1}"
      s""" m$k AS MATERIALIZED (SELECT pr[1] AS lhs, pr[2] AS rhs,
         |   CAST(SUM(freq) AS BIGINT) AS cnt
         |  FROM (SELECT freq, unnest(list_transform(
         |     range(1, greatest(len(tk) - 1, 0) + 1),
         |     i -> [tk[i], tk[i + 1]])) AS pr
         |   FROM (SELECT freq, string_split(ws[2:length(ws) - 1], '][') AS tk
         |    FROM $prev))
         |  GROUP BY pr[1], pr[2] ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         | v$k AS MATERIALIZED (SELECT
         |   replace(ws, '[' || lhs || '][' || rhs || ']',
         |     '[' || lhs || rhs || ']') AS ws, freq
         |  FROM $prev, m$k)""".stripMargin
    }.mkString(",")
    s"""v0 AS MATERIALIZED (SELECT
       |   list_reduce(list_transform(range(1, length(w) + 1),
       |     i -> '[' || w[i] || ']'), (x, y) -> x || y) AS ws, freq
       |  FROM (SELECT w, COUNT(*) AS freq
       |   FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |   WHERE regexp_matches(w, '^[a-z]+$$') GROUP BY w)),
       |$steps""".stripMargin.replaceAll("\n", "")
  }

  /** q75b — the APPLY half of BPE: tokenize the corpus with the TRAINED
    * merges ([[ensureBpeMerges]] — training is a layout, like the
    * k-means codebooks; re-training inside apply would be q75's job
    * timed twice) and report the compression (corpus symbol count after
    * the merges vs the character baseline) — the acceptance metric a
    * tokenizer-training run is judged by. Applying is ONE distributed
    * pass with no driver loop: the vocabulary aggregation, the 8 merges
    * as chained literal `replace` column expressions, and the totals
    * aggregation all live in a single Catalyst plan. A word's symbol
    * count is its token count in the bracketed string, and its character
    * count falls out of the same string (`length − 2·tokens`), so
    * before/after need no second pipeline. Integer sums; the one
    * division is a final IEEE divide of two exact BIGINTs.
    */
  val qBpeApply: QuerySpec = QuerySpec(
    "q75b_bpe_apply",
    (s, dir) => {
      import s.implicits._
      val merges = ensureBpeMerges(s, dir)
      val vocab0 = Tables.load(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w").rlike("^[a-z]+$"))
        .groupBy(col("w")).agg(count(lit(1)).as("freq"))
        .as[(String, Long)]
        .map { case (w, f) => (w.flatMap(c => s"[$c]"), f) }
        .toDF("ws", "freq")
      val finalVocab = merges.foldLeft(vocab0) { case (v, (_, l, r, _)) =>
        v.withColumn("ws", expr(s"replace(ws, '[$l][$r]', '[$l$r]')"))
      }
      finalVocab
        .select(col("freq"),
          size(split(expr("substring(ws, 2, length(ws) - 2)"), "\\]\\["))
            .cast("long").as("ntok"),
          length(col("ws")).cast("long").as("wslen"))
        .agg(
          sum(col("freq") * (col("wslen") - lit(2L) * col("ntok")))
            .as("symbols_before"),
          sum(col("freq") * col("ntok")).as("symbols_after"))
        .select(lit(BpeMergeSteps.toLong).as("n_merges"),
          col("symbols_before"), col("symbols_after"),
          (col("symbols_after").cast("double") /
            col("symbols_before").cast("double")).as("compression"))
    },
    Some {
      val ntok = "len(string_split(ws[2:length(ws) - 1], ']['))"
      s"""WITH $bpeSqlCtes,
         | t AS (SELECT
         |   CAST(SUM(freq * (length(ws) - 2 * $ntok)) AS BIGINT) AS symbols_before,
         |   CAST(SUM(freq * $ntok) AS BIGINT) AS symbols_after
         |  FROM v$BpeMergeSteps)
         | SELECT CAST($BpeMergeSteps AS BIGINT) AS n_merges, symbols_before,
         |  symbols_after,
         |  CAST(symbols_after AS DOUBLE) / CAST(symbols_before AS DOUBLE)
         |    AS compression
         | FROM t""".stripMargin.replaceAll("\n", "")
    })

  /** Sequence budget for q203's token shards — smaller than q56's 4096
    * production budget so the GATE corpus cuts a genuinely multi-sequence
    * shard layout (the layout math is budget-parametric; q56/q140 gate
    * the 4096 form). Declared before the query so the oracle
    * interpolation sees it (object-init-order rule).
    */
  private[graft] val TokenShardBudget = 512L

  /** Subword tokens for one word column under the trained merge table:
    * guarded words (`^[a-z]+$`, q75's vocabulary domain) ride the
    * bracketed form through the merge chain as literal `replace`s
    * (greedy leftmost non-overlapping on both engines) and split into
    * their subword tokens; anything else becomes the single `<unk>`
    * token — so every whitespace token emits ≥ 1 subword and the stream
    * covers the corpus exactly. The merges are driver-side literals (a
    * trained LAYOUT, like the k-means codebooks), so the whole chain is
    * codegen'd string ops — no per-row lambda.
    */
  private def bpeTokenArr(
      merges: Seq[(Long, String, String, Long)], w: Column): Column = {
    val merged = merges.foldLeft(regexp_replace(w, "([a-z])", "[$1]")) {
      case (c, (_, l, r, _)) => replace(c, lit(s"[$l][$r]"), lit(s"[$l$r]"))
    }
    when(w.rlike("^[a-z]+$"),
      split(merged.substr(lit(2), length(merged) - 2), "\\]\\["))
      .otherwise(array(lit("<unk>")))
  }

  /** The per-doc subword token stream (source, doc_id, tok, tok_idx)
    * for an arbitrary (source, doc_id, text) frame under a trained merge
    * table — the EXPENSIVE half of q203 (word explode → codegen'd merge
    * chain → per-doc position), factored out so the incremental
    * [[graft.streaming.TokenStream]] store runs it exactly once per
    * arriving batch while the gated query runs it once per corpus.
    */
  private[graft] def tokenize(docs: DataFrame,
      merges: Seq[(Long, String, String, Long)]): DataFrame =
    docs.select(col("source"), col("doc_id"),
        posexplode(bpeDocTokArr(merges, col("text")))
          .as(Seq("tok_idx", "tok")))
      .select(col("source"), col("doc_id"), col("tok"),
        col("tok_idx").cast("long").as("tok_idx"))

  /** The whole-document subword array under a trained merge table — the
    * [[graft.functions.BpeDocTokens]] kernel (r18: replaces the word
    * posexplode → per-word merge chain → subword posexplode →
    * corpus-wide `row_number` window pipeline with ONE map-side pass
    * whose array position is `tok_idx`; DocKernelsSpec pins
    * bit-equality against the legacy formulation, and the q203/q211
    * oracles are unchanged).
    */
  private[graft] def bpeDocTokArr(
      merges: Seq[(Long, String, String, Long)], text: Column): Column =
    BpeDocTokens(text, merges.map(m => (m._2, m._3)))

  /** Shard addressing over a MATERIALIZED token stream — the cheap,
    * arrival-order-insensitive half of q203: two-level pack offsets from
    * the per-doc counts, lexicographic vocabulary ids, and the (seq_id,
    * pos_in_seq) address per token. Reading an incrementally-built
    * [[graft.streaming.TokenStream]] store through this IS the batch
    * q203 result (TokenStreamSpec pins the bit-equality).
    */
  private[graft] def addressToks(toks: DataFrame, budget: Long): DataFrame = {
    val offs = packOffsets(
      toks.groupBy(col("source"), col("doc_id"))
        .agg(count(lit(1)).as("n_tok")), budget)
      .select(col("source"), col("doc_id"), col("start_tok"))
    // vocab-sized (≪ corpus; ~100k rows at 100 TB): the single-task
    // global window is the codebook-scale exception, like q75's argmax
    val vocab = toks.select(col("tok")).distinct()
      .withColumn("token_id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("tok")))
        .cast("long") - 1L)
    toks.join(offs, Seq("source", "doc_id"))
      .join(broadcast(vocab), Seq("tok"))
      .select(col("source"),
        expr(s"(start_tok + tok_idx) div ${budget}L").as("seq_id"),
        ((col("start_tok") + col("tok_idx")) % budget).as("pos_in_seq"),
        col("doc_id"), col("token_id"))
  }

  /** The q203 pipeline over an arbitrary (source, doc_id, text) frame —
    * shared by the gated query and [[graft.CurationRun]]'s token-shard
    * stage. `tag` must discriminate the input corpus (the Scratch-tag
    * rule): the token stream is materialized ONCE and its three
    * consumers (shard rows, per-doc counts, vocabulary) read the
    * parquet, not three re-executions of the explode pipeline.
    */
  private[graft] def tokenShards(s: SparkSession, docs: DataFrame,
      merges: Seq[(Long, String, String, Long)], budget: Long,
      tag: String): DataFrame = {
    // r18: materialize the PER-DOC TOKEN ARRAY (one row per document)
    // instead of the exploded token stream — the kernel-built array
    // carries `tok_idx` as its position, so the offsets join runs at
    // DOC granularity (N_docs rows, not N_tokens) and only then
    // explodes; the flush itself shrinks from one row per token to one
    // array per doc. Guide §2.3 "shuffle keys and metadata instead of
    // payloads": the only token-granularity exchange left is the final
    // vocabulary broadcast-join input. addressToks (below) keeps the
    // exploded-input form for the TokenStream STORE read path;
    // TokenStreamSpec pins the two forms equal.
    val arr = Scratch.flush(s, tag,
      docs.select(col("source"), col("doc_id"),
        bpeDocTokArr(merges, col("text")).as("toks")))
    val offs = packOffsets(
      arr.select(col("source"), col("doc_id"),
        size(col("toks")).cast("long").as("n_tok")), budget)
      .select(col("source"), col("doc_id"), col("start_tok"))
    val vocab = arr.select(explode(col("toks")).as("tok")).distinct()
      .withColumn("token_id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("tok")))
        .cast("long") - 1L)
    arr.join(offs, Seq("source", "doc_id"))
      .select(col("source"), col("doc_id"), col("start_tok"),
        posexplode(col("toks")).as(Seq("tok_idx", "tok")))
      .join(broadcast(vocab), Seq("tok"))
      .select(col("source"),
        expr(s"(start_tok + tok_idx) div ${budget}L").as("seq_id"),
        ((col("start_tok") + col("tok_idx")) % budget).as("pos_in_seq"),
        col("doc_id"), col("token_id"))
  }

  /** q203 — token-id shard MATERIALIZATION: the end artifact a training
    * loader actually consumes, which q75/q75b/q56/q140 stop short of —
    * apply the TRAINED merge table ([[ensureBpeMerges]]) to every
    * document, assign each distinct subword its vocabulary id
    * (lexicographic rank — deterministic on both engines' binary
    * collations), and lay the id stream into the q56 two-level packed
    * layout: one row per token with its (source, seq_id, pos_in_seq)
    * shard address. `GROUP BY source, seq_id` tiles every non-final
    * sequence to exactly [[TokenShardBudget]]; the row set IS the
    * tensor-ready shard content.
    *
    * Scale shape: the token stream (explode → codegen'd merge chain →
    * per-doc row_number, partitioned by doc — parallel across docs) is
    * scratch-materialized once and read by its three consumers; the
    * per-doc counts ride the q56 two-level prefix sum ([[packOffsets]] —
    * no per-source serialization); the vocabulary is catalog-sized and
    * broadcast; the only corpus-scale shuffles are the doc-keyed count
    * agg and the (source, doc_id) offset join.
    */
  val qTokenShards: QuerySpec = QuerySpec(
    "q203_token_shards",
    (s, dir) => {
      val merges = ensureBpeMerges(s, dir)
      tokenShards(s, Tables.load(s, dir, "documents"), merges,
        TokenShardBudget,
        s"q203-toks-${java.lang.Long.toHexString(PolyHash.hash(dir))}")
    },
    Some {
      val gsteps = (1 to BpeMergeSteps).map { k =>
        s""" g$k AS MATERIALIZED (SELECT source, doc_id, wpos, w,
           |   replace(ws, '[' || lhs || '][' || rhs || ']',
           |     '[' || lhs || rhs || ']') AS ws
           |  FROM g${k - 1}, m$k)""".stripMargin
      }.mkString(",")
      s"""WITH $bpeSqlCtes,
         | wrd AS MATERIALIZED (SELECT source, doc_id,
         |   unnest(string_split(text, ' ')) AS w,
         |   CAST(unnest(range(1, len(string_split(text, ' ')) + 1))
         |     AS BIGINT) - 1 AS wpos
         |  FROM documents),
         | g0 AS MATERIALIZED (SELECT source, doc_id, wpos, w,
         |   CASE WHEN regexp_matches(w, '^[a-z]+$$')
         |    THEN regexp_replace(w, '([a-z])', '[\\1]', 'g') END AS ws
         |  FROM wrd),
         |$gsteps,
         | tk AS MATERIALIZED (SELECT source, doc_id, wpos,
         |   unnest(tks) AS tok,
         |   CAST(unnest(range(1, len(tks) + 1)) AS BIGINT) - 1 AS spos
         |  FROM (SELECT source, doc_id, wpos,
         |    CASE WHEN ws IS NULL THEN ['<unk>']
         |     ELSE string_split(ws[2:length(ws) - 1], '][') END AS tks
         |   FROM g$BpeMergeSteps)),
         | ix AS MATERIALIZED (SELECT source, doc_id, tok,
         |   CAST(ROW_NUMBER() OVER (PARTITION BY source, doc_id
         |     ORDER BY wpos, spos) AS BIGINT) - 1 AS tok_idx
         |  FROM tk),
         | cnt AS (SELECT source, doc_id, COUNT(*) AS n_tok
         |  FROM ix GROUP BY source, doc_id),
         | off AS (SELECT source, doc_id, CAST(COALESCE(SUM(n_tok) OVER (
         |   PARTITION BY source ORDER BY doc_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |   AS start_tok FROM cnt),
         | vc AS (SELECT tok,
         |   CAST(ROW_NUMBER() OVER (ORDER BY tok) AS BIGINT) - 1 AS token_id
         |  FROM (SELECT DISTINCT tok FROM ix))
         | SELECT i.source AS source,
         |  (o.start_tok + i.tok_idx) // $TokenShardBudget AS seq_id,
         |  (o.start_tok + i.tok_idx) % $TokenShardBudget AS pos_in_seq,
         |  i.doc_id AS doc_id, v.token_id AS token_id
         | FROM ix i JOIN off o ON i.source = o.source AND i.doc_id = o.doc_id
         |  JOIN vc v ON i.tok = v.tok""".stripMargin.replaceAll("\n", "")
    })

  /** q209 — tokenizer COVERAGE per source: how well the trained BPE
    * vocabulary fits each feed — subword volume, `<unk>` fallback volume
    * (per-mil), and how much of the subword inventory the feed actually
    * exercises. The per-feed acceptance readout for a trained tokenizer:
    * q118's fertility says how many subwords a word costs, q75b's
    * compression scores the corpus as a whole; this is the number that
    * flags ONE source (a new scrape, a different language mix) blowing
    * out the unk rate while the corpus average still looks fine — read
    * next to q115's drift before reweighting or retraining.
    *
    * Exactness: integer counts; the one division is `div` ≡ `//` on
    * non-negatives. Every whitespace token emits ≥ 1 subword (non-guard
    * words become `<unk>`), so n_subwords > 0 for every source.
    *
    * Scale shape: the merge chain runs over DISTINCT (source, word)
    * pairs — the (source, word) count agg collapses the Zipf head
    * map-side BEFORE the 8 chained literal replaces, so the codegen'd
    * chain touches each distinct word once per source, not once per
    * occurrence (the same vocabulary-collapse q75b applies); the final
    * agg is source-keyed over the weighted token rows. `vocab_used`
    * rides the same agg as a distinct count over the
    * vocabulary-sized token space.
    */
  val qTokenizerCoverage: QuerySpec = QuerySpec(
    "q209_tokenizer_coverage",
    (s, dir) => {
      val merges = ensureBpeMerges(s, dir)
      Tables.load(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("source"), col("w"))
        .agg(count(lit(1)).as("c"))
        .select(col("source"), col("c"),
          explode(bpeTokenArr(merges, col("w"))).as("tok"))
        .groupBy(col("source"))
        .agg(sum(col("c")).as("n_subwords"),
          sum(when(col("tok") === "<unk>", col("c")).otherwise(0L))
            .as("n_unk"),
          countDistinct(when(col("tok") =!= "<unk>", col("tok")))
            .as("vocab_used"))
        .select(col("source"), col("n_subwords"), col("n_unk"),
          col("vocab_used"),
          expr("(1000000 * n_unk) div n_subwords").as("unk_per_mil"))
    },
    Some {
      val gsteps = (1 to BpeMergeSteps).map { k =>
        s""" g$k AS MATERIALIZED (SELECT source, w, c,
           |   replace(ws, '[' || lhs || '][' || rhs || ']',
           |     '[' || lhs || rhs || ']') AS ws
           |  FROM g${k - 1}, m$k)""".stripMargin
      }.mkString(",")
      s"""WITH $bpeSqlCtes,
         | wc AS MATERIALIZED (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
         |   FROM documents)
         |  GROUP BY source, w),
         | g0 AS MATERIALIZED (SELECT source, w, c,
         |   CASE WHEN regexp_matches(w, '^[a-z]+$$')
         |    THEN regexp_replace(w, '([a-z])', '[\\1]', 'g') END AS ws
         |  FROM wc),
         |$gsteps,
         | tkc AS (SELECT source, c,
         |   unnest(CASE WHEN ws IS NULL THEN ['<unk>']
         |    ELSE string_split(ws[2:length(ws) - 1], '][') END) AS tok
         |  FROM g$BpeMergeSteps),
         | ag AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_subwords,
         |   CAST(SUM(CASE WHEN tok = '<unk>' THEN c ELSE 0 END) AS BIGINT)
         |     AS n_unk,
         |   CAST(COUNT(DISTINCT CASE WHEN tok <> '<unk>' THEN tok END)
         |     AS BIGINT) AS vocab_used
         |  FROM tkc GROUP BY source)
         | SELECT source, n_subwords, n_unk, vocab_used,
         |  CAST((1000000 * n_unk) // n_subwords AS BIGINT) AS unk_per_mil
         | FROM ag""".stripMargin.replaceAll("\n", "")
    })

  /** q211 — tokenizer-induced COLLISION audit: documents whose SUBWORD
    * STREAMS are identical vs documents whose raw text is identical.
    * Tokenization is lossy (every non-guard word collapses to `<unk>`),
    * so distinct texts can emit the same token sequence — and the
    * training loader then sees duplicates the text-level dedup (q21)
    * could never find. `collision_docs = token_dup_docs −
    * text_dup_docs` is the mass tokenization CREATED: every text-dup
    * group tokenizes identically (text-dup ⊆ token-dup — the collapse
    * only merges groups, never splits), so the delta is ≥ 0 and is
    * exactly the unk-collapse artifact. Read next to q209's unk rate:
    * a high unk feed with high collisions is one the loader
    * over-counts.
    *
    * Scale shape: the per-doc signature (subword stream joined in token
    * order) is one tokenize pass + a doc-keyed agg, scratch-flushed;
    * both group-by-signature and group-by-text are hash aggs whose
    * map-side combine absorbs the corpus; the two single-row summaries
    * meet in a broadcast cross (the q83/q139 single-row exception,
    * PlanLint-pinned).
    */
  val qTokenCollisions: QuerySpec = QuerySpec(
    "q211_token_collisions",
    (s, dir) => {
      val merges = ensureBpeMerges(s, dir)
      val docs = Tables.load(s, dir, "documents")
      // r18: the per-doc signature is the kernel token array joined
      // map-side — the tokenize explode, the doc-keyed collect_list
      // shuffle, the sort_array and the interpreted `transform` are all
      // gone, and with the signature computed in the scan projection the
      // scratch flush (whose only point was sharing the exploded stream)
      // is unnecessary: `sigs` feeds exactly one aggregate.
      val sigs = docs.select(col("doc_id"),
        array_join(bpeDocTokArr(merges, col("text")), " ").as("sig"))
      val tokAgg = sigs.groupBy(col("sig")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("docs_total"),
          count(when(col("c") > 1, 1)).as("token_dup_groups"),
          coalesce(sum(when(col("c") > 1, col("c"))), lit(0L))
            .as("token_dup_docs"))
      val txtAgg = docs.groupBy(col("text")).agg(count(lit(1)).as("c"))
        .agg(count(when(col("c") > 1, 1)).as("text_dup_groups"),
          coalesce(sum(when(col("c") > 1, col("c"))), lit(0L))
            .as("text_dup_docs"))
      tokAgg.crossJoin(broadcast(txtAgg)) // single-row × single-row
        .select(col("docs_total"), col("text_dup_groups"),
          col("text_dup_docs"), col("token_dup_groups"),
          col("token_dup_docs"),
          (col("token_dup_docs") - col("text_dup_docs"))
            .as("collision_docs"))
    },
    Some {
      val gsteps = (1 to BpeMergeSteps).map { k =>
        s""" g$k AS MATERIALIZED (SELECT doc_id, wpos, w,
           |   replace(ws, '[' || lhs || '][' || rhs || ']',
           |     '[' || lhs || rhs || ']') AS ws
           |  FROM g${k - 1}, m$k)""".stripMargin
      }.mkString(",")
      s"""WITH $bpeSqlCtes,
         | wrd AS MATERIALIZED (SELECT doc_id,
         |   unnest(string_split(text, ' ')) AS w,
         |   CAST(unnest(range(1, len(string_split(text, ' ')) + 1))
         |     AS BIGINT) - 1 AS wpos
         |  FROM documents),
         | g0 AS MATERIALIZED (SELECT doc_id, wpos, w,
         |   CASE WHEN regexp_matches(w, '^[a-z]+$$')
         |    THEN regexp_replace(w, '([a-z])', '[\\1]', 'g') END AS ws
         |  FROM wrd),
         |$gsteps,
         | tk AS (SELECT doc_id, wpos,
         |   unnest(tks) AS tok,
         |   CAST(unnest(range(1, len(tks) + 1)) AS BIGINT) - 1 AS spos
         |  FROM (SELECT doc_id, wpos,
         |    CASE WHEN ws IS NULL THEN ['<unk>']
         |     ELSE string_split(ws[2:length(ws) - 1], '][') END AS tks
         |   FROM g$BpeMergeSteps)),
         | sg AS MATERIALIZED (SELECT doc_id,
         |   string_agg(tok, ' ' ORDER BY wpos, spos) AS sig
         |  FROM tk GROUP BY doc_id),
         | tg AS (SELECT sig, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM sg GROUP BY sig),
         | xg AS (SELECT text, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM documents GROUP BY text),
         | ta AS (SELECT CAST(SUM(c) AS BIGINT) AS docs_total,
         |   CAST(COUNT(CASE WHEN c > 1 THEN 1 END) AS BIGINT)
         |     AS token_dup_groups,
         |   CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0) AS BIGINT)
         |     AS token_dup_docs
         |  FROM tg),
         | xa AS (SELECT
         |   CAST(COUNT(CASE WHEN c > 1 THEN 1 END) AS BIGINT)
         |     AS text_dup_groups,
         |   CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0) AS BIGINT)
         |     AS text_dup_docs
         |  FROM xg)
         | SELECT docs_total, text_dup_groups, text_dup_docs,
         |  token_dup_groups, token_dup_docs,
         |  token_dup_docs - text_dup_docs AS collision_docs
         | FROM ta, xa""".stripMargin.replaceAll("\n", "")
    })

  /** q83 — collocation mining: the 20 most associated word bigrams by
    * LIFT (observed bigram count over the count expected under
    * independence: `c_ab·N / (c_a·c_b)`), minimum bigram count 5 — the
    * statistical step that separates "interesting phrase" from "merely
    * frequent" (q49 ranks by raw frequency; a stopword pair tops that
    * list, never this one). PMI is the `log` of this quantity — `log` is
    * banned in gated queries (libm divergence) and monotone, so ranking
    * by lift IS ranking by PMI.
    *
    * Exactness: integer counts throughout; each double product is exact
    * below 2^53 (holds through ~10^8-bigram corpora — far past every
    * gate SF) and the single IEEE division is bit-identical on both
    * engines.
    *
    * Scale shape: two frequency aggregations (bigram, unigram) with
    * map-side combine; the min-count filter shrinks the bigram side
    * BEFORE its two word-keyed joins against the vocabulary-sized (≪
    * corpus) unigram counts; the corpus total N rides a single-row
    * broadcast. TakeOrdered keeps k per partition — no global sort.
    */
  val qCollocations: QuerySpec = QuerySpec(
    "q83_collocations",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val uni = docs.select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val bg = docs.select(explode(WordShingles(col("text"), 2)).as("gram"))
      val n = bg.agg(count(lit(1)).as("n_total"))
      val bc = bg.groupBy(col("gram")).agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 5)
        .select(element_at(split(col("gram"), " "), 1).as("w1"),
          element_at(split(col("gram"), " "), 2).as("w2"), col("c_ab"))
      val lift = (col("c_ab").cast("double") * col("n_total").cast("double")) /
        (col("c_a").cast("double") * col("c_b").cast("double"))
      bc.join(uni.toDF("w1", "c_a"), Seq("w1"))
        .join(uni.toDF("w2", "c_b"), Seq("w2"))
        .crossJoin(broadcast(n)) // single-row corpus total
        .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
          lift.as("lift"))
        .orderBy(col("lift").desc, col("w1").asc, col("w2").asc)
        .limit(20)
    },
    Some("""WITH dt AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
           | uc AS (SELECT w, COUNT(*) AS c
           |  FROM (SELECT unnest(tk) AS w FROM dt) GROUP BY w),
           | bg AS (SELECT unnest(list_transform(
           |   range(1, greatest(len(tk) - 1, 0) + 1),
           |   i -> tk[i] || ' ' || tk[i + 1])) AS gram FROM dt),
           | n AS (SELECT COUNT(*) AS n_total FROM bg),
           | bc AS (SELECT split_part(gram, ' ', 1) AS w1,
           |   split_part(gram, ' ', 2) AS w2, COUNT(*) AS c_ab
           |  FROM bg GROUP BY gram HAVING COUNT(*) >= 5)
           | SELECT w1, w2, c_ab, a.c AS c_a, b.c AS c_b,
           |  (CAST(c_ab AS DOUBLE) * CAST(n_total AS DOUBLE)) /
           |  (CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE)) AS lift
           | FROM bc JOIN uc a ON bc.w1 = a.w JOIN uc b ON bc.w2 = b.w, n
           | ORDER BY lift DESC, w1 ASC, w2 ASC LIMIT 20""".stripMargin
      .replaceAll("\n", "")))

  /** q84 — count-min sketch accuracy report: build a 4×64 CMS over the
    * corpus term frequencies (row hashes = the [[graft.functions.MinHash]]
    * permutation family applied to each term's [[PolyHash]]), point-query
    * the 10 most frequent terms, and report estimate vs truth. The CMS is
    * the mergeable heavy-hitter sketch for shards/streams: counts sum per
    * (row, bucket), so map-side partial aggregation merges per-partition
    * sketches for free, and the estimate (min over rows) only ever
    * OVERcounts — `overcount ≥ 0` is pinned per probed term.
    *
    * Scale shape: one vocabulary aggregation (map-side combine absorbs
    * the token explosion), then the 4-row explosion runs over the
    * VOCABULARY (≪ corpus) and collapses to ≤ 256 sketch rows; the
    * top-10 probe joins the sketch broadcast. All integer arithmetic.
    */
  private[graft] val CmsRows = 4
  private[graft] val CmsWidth = 64

  val qCountMin: QuerySpec = QuerySpec(
    "q84_countmin",
    (s, dir) => {
      import org.apache.spark.sql.Column
      import graft.functions.MinHash
      val pA = array((0 until CmsRows).map(j => lit(MinHash.permA(j))): _*)
      val pB = array((0 until CmsRows).map(j => lit(MinHash.permB(j))): _*)
      def bucket(r: Column): Column =
        pmod(element_at(pA, r + 1) * col("h") + element_at(pB, r + 1),
          lit(PolyHash.P)) % CmsWidth
      val tc = Tables.load(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
        .withColumn("h", PolyHash(col("term")))
      val cms = tc
        .select(col("cnt"), col("h"),
          explode(sequence(lit(0), lit(CmsRows - 1))).as("r"))
        .select(col("r"), bucket(col("r")).as("bucket"), col("cnt"))
        .groupBy(col("r"), col("bucket")).agg(sum(col("cnt")).as("c"))
      // top-10 probe collected to a local relation (the q60b literal
      // pattern). TOTAL work is unchanged — the collect job aggregates
      // the vocabulary once and the returned cms plan aggregates it
      // again (persisting tc across the two uses has no clean unpersist
      // hook in a stateless QuerySpec) — but the in-plan form duplicated
      // the aggregate as two branches of ONE plan that neither static
      // nor AQE exchange reuse collapsed [measured: 2 scans], leaving
      // the probe's correctness hostage to join planning around the
      // duplicate; as a literal it cannot be perturbed
      val probeRows = tc.orderBy(col("cnt").desc, col("term").asc).limit(10)
        .select(col("term"), col("cnt"), col("h")).collect().toSeq
        .flatMap { r =>
          val h = r.getLong(2)
          (0 until CmsRows).map { j =>
            val b = ((MinHash.permA(j) * h + MinHash.permB(j)) % PolyHash.P) %
              CmsWidth
            (r.getString(0), r.getLong(1), j, b)
          }
        }
      s.createDataFrame(probeRows).toDF("term", "cnt", "r", "bucket")
        .join(broadcast(cms), Seq("r", "bucket"))
        .groupBy(col("term"))
        .agg(max(col("cnt")).as("true_cnt"), min(col("c")).as("est_cnt"))
        .withColumn("overcount", col("est_cnt") - col("true_cnt"))
    },
    Some {
      val pA = (0 until CmsRows).map(j => graft.functions.MinHash.permA(j))
        .mkString("[", ", ", "]")
      val pB = (0 until CmsRows).map(j => graft.functions.MinHash.permB(j))
        .mkString("[", ", ", "]")
      val bucket = (h: String, r: String) =>
        s"(($pA[CAST($r AS INT) + 1] * $h + $pB[CAST($r AS INT) + 1])" +
          s" % ${PolyHash.P}) % $CmsWidth"
      s"""WITH tc AS (SELECT term, COUNT(*) AS cnt
         |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
         |  GROUP BY term),
         | hh AS (SELECT term, cnt, ${PolyHash.oracleSql("term")} AS h FROM tc),
         | ex AS (SELECT cnt, h, unnest(range(0, $CmsRows)) AS r FROM hh),
         | cms AS (SELECT r, ${bucket("h", "r")} AS bucket,
         |   CAST(SUM(cnt) AS BIGINT) AS c FROM ex GROUP BY 1, 2),
         | top AS (SELECT term, cnt, h FROM hh
         |  ORDER BY cnt DESC, term ASC LIMIT 10),
         | tb AS (SELECT term, cnt, h, unnest(range(0, $CmsRows)) AS r FROM top)
         | SELECT tb.term, MAX(tb.cnt) AS true_cnt,
         |  CAST(MIN(cms.c) AS BIGINT) AS est_cnt,
         |  CAST(MIN(cms.c) - MAX(tb.cnt) AS BIGINT) AS overcount
         | FROM tb JOIN cms ON tb.r = cms.r
         |  AND ${bucket("tb.h", "tb.r")} = cms.bucket
         | GROUP BY tb.term""".stripMargin.replaceAll("\n", "")
    })

  /** Misra-Gries summary of a token stream: at most `k` surviving
    * (term, lower-bound-count) entries plus the stream length. The
    * classic bounded-state frequent-items kernel (Misra & Gries 1982):
    * a hit increments, a miss with a full table decrements EVERY entry
    * (amortized O(1): each decrement event cancels k+1 arrivals, so
    * total decrement work is ≤ n). Guarantees: survivors ≤ k; every
    * item with count > n/k survives; each stored count c satisfies
    * true − n/k ≤ c ≤ true. Pinned by `MgSummarySpec`.
    */
  private[graft] def mgSummary(
      it: Iterator[String], k: Int): (Map[String, Long], Long) = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    var n = 0L
    while (it.hasNext) {
      val t = it.next(); n += 1
      m.get(t) match {
        case Some(c) => m.update(t, c + 1)
        case None if m.size < k => m.update(t, 1L)
        case None =>
          m.mapValuesInPlace((_, c) => c - 1)
          m.filterInPlace((_, c) => c > 0)
      }
    }
    (m.toMap, n)
  }

  /** q158's summary size — declared above the spec (the q82 rule). */
  private[graft] val MgK = 64

  /** q158 — Misra-Gries heavy hitters: every token with frequency
    * > n/[[MgK]] and its EXACT count, found without a vocabulary-sized
    * shuffle. Pass 1 runs the bounded-state [[mgSummary]] kernel per
    * partition (genuine `mapPartitions` territory — an imperative
    * decrement loop with k-bounded output per task) and collects the
    * per-partition survivor union; by pigeonhole an item with global
    * count > n/k exceeds its partition's n_p/k somewhere, so the union
    * is a SUPERSET of the true heavy hitters at ANY partitioning —
    * which is what makes the final output deterministic (and
    * parallelism-invariance pinnable): pass 2 exact-counts ONLY the
    * candidates and the threshold filter discards every false
    * candidate. Complements the sketch family (CMS q84 point
    * frequency, Bloom q85 membership, HLL q96 cardinality, t-digest
    * q39 quantiles) with the "find the frequent items" direction.
    *
    * Scale shape: the driver collect is ≤ partitions × (k+1) tiny rows
    * (65k rows at 1000 tasks — bounded, never data-scale); pass 2's
    * aggregate is candidate-sized after a pushed-down isin filter. The
    * one-pass exact alternative (q49's shape) shuffles the vocabulary;
    * at a 100 TB vocabulary this plan shuffles ≤ P·k rows instead.
    */
  val qHeavyHitters: QuerySpec = QuerySpec(
    "q158_heavy_hitters",
    (s, dir) => {
      import s.implicits._
      def toks = Tables.load(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
      // ("" , n_p) sentinel rides alongside the survivors (the empty
      // term cannot collide: zero-length tokens are filtered above)
      val partials = toks.as[String]
        .mapPartitions { it =>
          val (m, np) = mgSummary(it, MgK)
          m.iterator ++ Iterator(("", np))
        }
        .collect()
      val n = partials.collect { case ("", c) => c }.sum
      val cands = partials.collect { case (t, _) if t.nonEmpty => t }
        .distinct.toSeq
      toks.filter(col("term").isin(cands: _*))
        .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * MgK > n)
        .select(col("term"), col("cnt"),
          expr(s"(10000 * cnt) div $n").as("share_e4"))
    },
    Some(
      s"""WITH tk AS (SELECT unnest(string_split(text, ' ')) AS term
         |  FROM documents),
         | tk2 AS (SELECT term FROM tk WHERE length(term) > 0),
         | n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tk2),
         | c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM tk2
         |  GROUP BY term)
         | SELECT term, cnt, CAST((10000 * cnt) // n AS BIGINT) AS share_e4
         | FROM c, n WHERE cnt * $MgK > n""".stripMargin.replaceAll("\n", "")))

  /** q85 — Bloom-filter decontamination accuracy: the constant-size
    * alternative to q46's broadcast gram join. The eval set's 5-gram
    * hashes fold into a 64 Kbit / k=3 Bloom filter (positions from the
    * [[graft.functions.MinHash]] permutation family), and the training
    * corpus is probed MAP-SIDE against the 8 KB bitmask riding the plan
    * as a 1024-long literal — at 100 TB this replaces a broadcast of
    * every eval gram with a fixed-size mask and a pure map (no join on
    * the production probe path at all). Bloom filters have NO false
    * negatives, so a zero-hit doc is definitively clean; the report
    * quantifies the false-positive cost per document (`fp_grams =
    * bloom_hits − exact_hits ≥ 0`, the q66-style calibration twin — the
    * exact-join column exists ONLY to measure that error).
    *
    * The driver-side fold that builds the mask collects the eval gram
    * hashes — the side that is small by definition (benchmarks vs a
    * 100 TB corpus), the q79 broadcast argument.
    */
  private[graft] val BloomBits = 65536
  private[graft] val BloomK = 3

  val qBloomDecontaminate: QuerySpec = QuerySpec(
    "q85_bloom_decontaminate",
    (s, dir) => {
      import org.apache.spark.sql.Column
      import org.apache.spark.sql.GraftShims
      import org.apache.spark.sql.catalyst.expressions.{ShiftLeft, ShiftRightUnsigned}
      import graft.functions.MinHash
      val sh = Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(WordShingleHashes(col("text"), 5)).as("h"))
      // ONE eval-side scan, DISTRIBUTED filter build: the distinct eval
      // gram hashes flush to scratch once per execution (read twice:
      // bit aggregation + exact join), the K bit positions per hash
      // explode map-side, and bit_or collapses them to BloomBits/64
      // filter words — the driver receives the FIXED-SIZE filter, never
      // the gram set, so the build survives an eval side of any size
      // (the round-11 watch item on driver-collected gram hashes)
      // tag carries the corpus-dir + parallelism discriminator (the
      // DupGraph/SpanStore lesson): a second corpus in the same JVM must
      // not delete this flush out from under a still-unexecuted plan
      val evalTag = "q85-eval-d" +
        java.lang.Long.toHexString(PolyHash.hash(dir)) +
        s"-p${s.conf.get("spark.sql.shuffle.partitions")}"
      val evalDistinct = Scratch.flush(s, evalTag,
        sh.filter(col("doc_id") % 10 === 0).select(col("h")).distinct())
      def sll(x: Column, n: Column): Column = GraftShims.column(
        ShiftLeft(GraftShims.expression(x), GraftShims.expression(n)))
      val posCols = array((0 until BloomK).map { j =>
        pmod(lit(MinHash.permA(j)) * col("h") + lit(MinHash.permB(j)),
          lit(PolyHash.P)) % BloomBits
      }: _*)
      val bitWords = evalDistinct
        .select(explode(posCols).as("p")).distinct()
        .select(shiftright(col("p"), 6).cast("int").as("w"),
          sll(lit(1L), col("p").bitwiseAND(lit(63L)).cast("int")).as("b"))
        .groupBy(col("w")).agg(expr("bit_or(b)").as("bits"))
        .collect()
      val bits = new Array[Long](BloomBits / 64)
      bitWords.foreach(r => bits(r.getInt(0)) = r.getLong(1))
      val bitsLit = typedlit(bits.toSeq)
      // functions.shiftrightunsigned only accepts a literal shift; the
      // Catalyst node takes a column
      def srl(x: Column, n: Column): Column = GraftShims.column(
        ShiftRightUnsigned(GraftShims.expression(x), GraftShims.expression(n)))
      def member(h: Column): Column = (0 until BloomK).map { j =>
        val p = pmod(lit(MinHash.permA(j)) * h + lit(MinHash.permB(j)),
          lit(PolyHash.P)) % BloomBits
        srl(element_at(bitsLit, shiftright(p, 6).cast("int") + 1),
          p.bitwiseAND(lit(63L)).cast("int"))
          .bitwiseAND(lit(1L)) === lit(1L)
      }.reduce(_ && _)
      // exact-hit side: the SAME flushed eval frame (benchmark-sized by
      // definition — the broadcast stays appropriate; the scale hazard
      // was the driver collect, which is gone)
      val evalDf = evalDistinct.withColumn("ev", lit(1L))
      sh.filter(col("doc_id") % 10 =!= 0)
        .join(broadcast(evalDf), Seq("h"), "left")
        .select(col("doc_id"),
          when(member(col("h")), 1L).otherwise(0L).as("bm"),
          coalesce(col("ev"), lit(0L)).as("exv"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"), sum(col("bm")).as("bloom_hits"),
          sum(col("exv")).as("exact_hits"))
        .withColumn("fp_grams", col("bloom_hits") - col("exact_hits"))
    },
    Some {
      val pa = (0 until BloomK).map(j => graft.functions.MinHash.permA(j))
        .mkString("[", ", ", "]")
      val pb = (0 until BloomK).map(j => graft.functions.MinHash.permB(j))
        .mkString("[", ", ", "]")
      val posOf = (h: String, j: String) =>
        s"(($pa[CAST($j AS INT) + 1] * $h + $pb[CAST($j AS INT) + 1])" +
          s" % ${PolyHash.P}) % $BloomBits"
      s"""WITH ${shingleCtes(5)},
         | ev AS (SELECT DISTINCT unnest(H) AS h FROM ds WHERE doc_id % 10 = 0),
         | bits AS (SELECT DISTINCT ${posOf("h", "j")} AS p
         |  FROM ev, range(0, $BloomK) t(j)),
         | tr AS (SELECT doc_id, unnest(H) AS h FROM ds WHERE doc_id % 10 <> 0),
         | trp AS (SELECT doc_id, h, ${posOf("h", "j")} AS p
         |  FROM tr, range(0, $BloomK) t(j)),
         | memb AS (SELECT doc_id, h,
         |   CASE WHEN COUNT(b.p) = $BloomK THEN 1 ELSE 0 END AS m
         |  FROM trp LEFT JOIN bits b ON trp.p = b.p GROUP BY doc_id, h)
         | SELECT memb.doc_id, COUNT(*) AS n_grams,
         |  CAST(SUM(memb.m) AS BIGINT) AS bloom_hits,
         |  COUNT(e.h) AS exact_hits,
         |  CAST(SUM(memb.m) - COUNT(e.h) AS BIGINT) AS fp_grams
         | FROM memb LEFT JOIN ev e ON memb.h = e.h
         | GROUP BY memb.doc_id""".stripMargin.replaceAll("\n", "")
    })

  /** q88 — crawl snapshot diff: the delta report between two corpus
    * snapshots (old crawl A = doc_id % 7 ≠ 0, new crawl B = doc_id % 5
    * ≠ 0, with every doc_id % 3 = 0 doc "re-edited" in B — closed-form
    * synthetic snapshots, the q76/q78 pattern), classifying every key as
    * added / removed / changed / unchanged and rolling counts up per
    * source. This is the incremental-ingest planning step: `changed ∪
    * added` is exactly the re-process set the streaming front doors
    * (SignatureStore / EmbeddingStream / PqStream upserts) consume.
    *
    * Scale shape: content equality via 8-byte [[PolyHash]] fingerprints
    * computed map-side — the full-outer join on the key column never
    * carries text; one shuffle for the join, one for the ~80-group
    * rollup.
    */
  val qSnapshotDiff: QuerySpec = QuerySpec(
    "q88_snapshot_diff",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val a = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), col("source").as("src_a"),
          PolyHash(col("text")).as("fp_a"))
      val b = docs.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"), col("source").as("src_b"),
          when(col("doc_id") % 3 === 0,
            PolyHash(concat(col("text"), lit(" updated"))))
            .otherwise(PolyHash(col("text"))).as("fp_b"))
      a.join(b, Seq("doc_id"), "full_outer")
        .select(coalesce(col("src_a"), col("src_b")).as("source"),
          when(col("fp_a").isNull, "added")
            .when(col("fp_b").isNull, "removed")
            .when(col("fp_a") === col("fp_b"), "unchanged")
            .otherwise("changed").as("status"))
        .groupBy(col("source"), col("status"))
        .agg(count(lit(1)).as("n_docs"))
    },
    Some(s"""WITH a AS (SELECT doc_id, source,
            |   ${PolyHash.oracleSql("text")} AS fp FROM documents
            |  WHERE doc_id % 7 <> 0),
            | b AS (SELECT doc_id, source,
            |   CASE WHEN doc_id % 3 = 0
            |    THEN ${PolyHash.oracleSql("text || ' updated'")}
            |    ELSE ${PolyHash.oracleSql("text")} END AS fp FROM documents
            |  WHERE doc_id % 5 <> 0),
            | j AS (SELECT COALESCE(a.source, b.source) AS source,
            |   CASE WHEN a.fp IS NULL THEN 'added'
            |    WHEN b.fp IS NULL THEN 'removed'
            |    WHEN a.fp = b.fp THEN 'unchanged'
            |    ELSE 'changed' END AS status
            |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
            | SELECT source, status, COUNT(*) AS n_docs
            | FROM j GROUP BY source, status""".stripMargin
      .replaceAll("\n", "")))

  /** q89 — inverted-index posting lists: per term, the document
    * frequency and the first 10 postings (doc_ids ascending) — the
    * search/retrieval layout next to the ANN one (sparse lexical lookup
    * vs dense embedding probe). Postings explode to scalar rows (the
    * q22 array rule) and the head cap bounds every group's output
    * regardless of how common the term is.
    *
    * Scale shape: per-doc DISTINCT terms map-side, ONE shuffle on the
    * term feeding both window functions (ordered row_number for the
    * head, unordered count for df). The rank filter truncates BEFORE
    * anything aggregates, so a stopword's group streams through the
    * sort and emits 10 rows without ever buffering its corpus-sized
    * posting list (a `collect_list`-then-slice formulation would hold
    * the whole list in one aggregation buffer — the skewed-group OOM at
    * scale). At 100 TB posting lists page by a (term, block) key, which
    * is this same plan re-keyed.
    */
  val qPostingLists: QuerySpec = QuerySpec(
    "q89_posting_lists",
    (s, dir) => {
      val byTerm = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(array_distinct(split(col("text"), " ")))
          .as("term"))
        .filter(length(col("term")) > 0)
        .select(col("term"), col("doc_id"),
          row_number().over(byTerm.orderBy(col("doc_id").asc)).as("rk"),
          count(lit(1)).over(byTerm).as("df"))
        .filter(col("rk") <= 10)
        .select(col("term"), col("df"), (col("rk") - 1).cast("long").as("rank"),
          col("doc_id"))
    },
    Some("""WITH tok AS (SELECT DISTINCT doc_id,
           |   unnest(string_split(text, ' ')) AS term FROM documents),
           | pl AS (SELECT term, COUNT(*) AS df,
           |   (list(doc_id ORDER BY doc_id))[1:10] AS head
           |  FROM tok WHERE len(term) > 0 GROUP BY term)
           | SELECT term, df, CAST(j - 1 AS BIGINT) AS rank,
           |  head[CAST(j AS INT)] AS doc_id
           | FROM (SELECT term, df, head,
           |   unnest(range(1, len(head) + 1)) AS j FROM pl)""".stripMargin
      .replaceAll("\n", "")))

  /** Query terms for q93 — literals, like a served retrieval request.
    * Declared before the spec (the q82 object-init-order rule: the
    * oracle string interpolates them eagerly).
    */
  private[operators] val Bm25Terms = Seq("hash", "join", "vector", "scan")

  /** q93 — lexical top-k retrieval: rank documents against a literal
    * term query by saturated-TF × rational-IDF — BM25's shape with the
    * `log` replaced by its rational Robertson–Spärck Jones core
    * (`(2N − 2df + 1) / (2df + 1)`, the +0.5 smoothing cleared of
    * fractions) so both engines agree bitwise (the q83 lift rule: no
    * `log` in gated queries). Length normalization is exact too:
    * `dl/avgdl` rides as `dl·N/D` with the corpus token total `D`
    * multiplied through — every numerator and denominator is a 64-bit
    * integer, one IEEE divide per term, and the 4-term sum is a fixed-
    * order row-level expression (not an aggregation), so it is
    * deterministic on both engines. This is the query-serving
    * complement of q89's posting-list layout: q89 builds the index,
    * q93 scores a request against the corpus statistics.
    *
    * Per-term TF and the token count dl come from the BRACKETED string
    * form (`a b` → `[a][b]`, the q75 BPE encoding): a literal
    * `replace('[t]', '')` length delta counts exact whole-token
    * occurrences with identical greedy semantics in Spark and DuckDB,
    * and brackets make adjacent matches non-overlapping by
    * construction — no explode, no regex, all codegen'd string kernels.
    *
    * Scale shape: ONE map-side pass over the corpus computes (dl,
    * tf₁..tf₄) per doc; the corpus statistics (N, D, df per term)
    * reduce to a SINGLE row, broadcast back; scoring is map-side; the
    * result is a TakeOrdered(10). The corpus never shuffles — total
    * exchange volume is one scalar row regardless of corpus size. At
    * 100 TB the same plan serves any literal query; a term outside the
    * corpus contributes tf = df = 0 rows without a plan change.
    */
  val qBm25TopK: QuerySpec = QuerySpec(
    "q93_bm25_topk",
    (s, dir) => {
      val perDocCols = col("doc_id") +:
        (((length(col("br")) - length(expr("replace(br, '][', '')"))) / 2) + 1)
          .cast("long").as("dl") +:
        Bm25Terms.zipWithIndex.map { case (t, i) =>
          ((length(col("br")) - length(expr(s"replace(br, '[$t]', '')"))) /
            (t.length + 2)).cast("long").as(s"tf$i")
        }
      val perDoc = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          concat(lit("["), expr("replace(text, ' ', '][')"), lit("]"))
            .as("br"))
        .select(perDocCols: _*)
      val stats = perDoc.agg(
        count(lit(1)).as("n"),
        sum(col("dl")).as("d") +:
          Bm25Terms.indices.map(i =>
            count_if(col(s"tf$i") > 0).as(s"df$i")): _*)
      val score = Bm25Terms.indices.map { i =>
        (col(s"tf$i") * (lit(2) * col("n") - lit(2) * col(s"df$i") + 1) *
          col("d")).cast("double") /
          ((col(s"tf$i") * col("d") + col("dl") * col("n")) *
            (lit(2) * col(s"df$i") + 1)).cast("double")
      }.reduce(_ + _)
      perDoc.crossJoin(broadcast(stats))
        .filter(Bm25Terms.indices.map(i => col(s"tf$i")).reduce(_ + _) > 0)
        .select(col("doc_id"), score.as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
    },
    Some(s"""WITH $bm25SqlCtes
            | SELECT doc_id, $bm25ScoreSql AS score
            | FROM pd, st WHERE $bm25AnyTfSql > 0
            | ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
      .replaceAll("\n", "")))

  /** q93's oracle CTEs (`b`/`pd`/`st`: bracketed text, per-doc tf/dl,
    * one-row corpus stats) — shared with the q133 hybrid-fusion oracle.
    */
  private[graft] def bm25SqlCtes: String = {
    val tfCols = Bm25Terms.zipWithIndex.map { case (t, i) =>
      s"CAST((length(br) - length(replace(br, '[$t]', ''))) / ${t.length + 2} AS BIGINT) AS tf$i"
    }.mkString(", ")
    val dfCols = Bm25Terms.indices.map(i =>
      s"COUNT(*) FILTER (WHERE tf$i > 0) AS df$i").mkString(", ")
    s"""b AS (SELECT doc_id,
       |   '[' || replace(text, ' ', '][') || ']' AS br FROM documents),
       | pd AS (SELECT doc_id,
       |   CAST((length(br) - length(replace(br, '][', ''))) / 2 + 1 AS BIGINT) AS dl,
       |   $tfCols FROM b),
       | st AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS d,
       |   $dfCols FROM pd)""".stripMargin.replaceAll("\n", "")
  }

  /** The rational BM25 score sum over `pd, st` columns (q93's oracle). */
  private[graft] def bm25ScoreSql: String = Bm25Terms.indices.map(i =>
    s"(CAST(tf$i * (2*n - 2*df$i + 1) * d AS DOUBLE) / " +
      s"CAST((tf$i * d + dl * n) * (2*df$i + 1) AS DOUBLE))").mkString(" + ")

  /** Any-term-matched filter expression (q93's oracle). */
  private[graft] def bm25AnyTfSql: String =
    Bm25Terms.indices.map(i => s"tf$i").mkString(" + ")

  /** q118 — per-language tokenizer fertility: tokens-per-word and
    * chars-per-token under the TRAINED BPE merges ([[ensureBpeMerges]]),
    * by document language. THE tokenizer-equity metric a multilingual
    * corpus is audited with — a tokenizer trained on the majority
    * language fragments minority-language words into more, shorter
    * tokens (higher fertility), which silently taxes their effective
    * context length and training compute share; this report is what
    * that decision is made from. q75b reports corpus-global
    * compression; fertility localizes it to the lang dimension where
    * the inequity lives.
    *
    * Mechanics: the merged vocabulary maps each word `w` to its
    * bracketed token spelling `ws`; stripping the brackets recovers
    * `w` exactly (the merge chain only ever fuses bracket boundaries),
    * so the trained segmentation joins back onto per-(lang, word)
    * counts without threading `w` through the merge fold. Means are
    * fixed-point integer `div` (truncating in both engines).
    *
    * Scale shape: the corpus collapses to (lang, word) counts in ONE
    * map-side-combined agg; the vocabulary (≪ corpus) applies the 8
    * merges as chained literal `replace` expressions in the same
    * distributed pass as q75b; the join key is the word and the final
    * rollup is |langs| rows.
    */
  val qFertility: QuerySpec = QuerySpec(
    "q118_fertility",
    (s, dir) => {
      import s.implicits._
      val merges = ensureBpeMerges(s, dir)
      val docs = Tables.load(s, dir, "documents")
      // flushed: both the vocabulary derivation and the segmentation
      // join read it — unmaterialized, the corpus explosion would run
      // once per reference
      val lw = graft.operators.Scratch.flush(s, "q118-lw", docs
        .select(col("lang"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w").rlike("^[a-z]+$"))
        .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c")))
      val vocab0 = lw.groupBy(col("w")).agg(sum(col("c")).as("freq"))
        .as[(String, Long)]
        .map { case (w, f) => (w.flatMap(c => s"[$c]"), f) }
        .toDF("ws", "freq")
      val finalVocab = merges.foldLeft(vocab0) { case (v, (_, l, r, _)) =>
        v.withColumn("ws", expr(s"replace(ws, '[$l][$r]', '[$l$r]')"))
      }
      val seg = finalVocab.select(
        expr("replace(replace(ws, '[', ''), ']', '')").as("w"),
        size(split(expr("substring(ws, 2, length(ws) - 2)"), "\\]\\["))
          .cast("long").as("ntok"))
      lw.join(seg, Seq("w"))
        .groupBy(col("lang"))
        .agg(sum(col("c")).as("n_words"),
          sum(col("c") * col("ntok")).as("n_tokens"),
          sum(col("c") * length(col("w")).cast("long")).as("n_chars"))
        .select(col("lang"), col("n_words"), col("n_tokens"),
          expr("(10000 * n_tokens) div n_words").as("tok_per_word_e4"),
          expr("(10000 * n_chars) div n_tokens").as("chars_per_tok_e4"))
    },
    Some {
      val ntok = "len(string_split(ws[2:length(ws) - 1], ']['))"
      s"""WITH $bpeSqlCtes,
         | lw AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
         |   FROM documents)
         |  WHERE regexp_matches(w, '^[a-z]+$$') GROUP BY lang, w),
         | seg AS (SELECT replace(replace(ws, '[', ''), ']', '') AS w,
         |   CAST($ntok AS BIGINT) AS ntok FROM v$BpeMergeSteps),
         | r AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_words,
         |   CAST(SUM(c * ntok) AS BIGINT) AS n_tokens,
         |   CAST(SUM(c * length(w)) AS BIGINT) AS n_chars
         |  FROM lw JOIN seg USING (w) GROUP BY lang)
         | SELECT lang, n_words, n_tokens,
         |  CAST((10000 * n_tokens) // n_words AS BIGINT) AS tok_per_word_e4,
         |  CAST((10000 * n_chars) // n_tokens AS BIGINT) AS chars_per_tok_e4
         | FROM r""".stripMargin.replaceAll("\n", "")
    })

  /** q122 — n-gram novelty: per document, the fraction of its distinct
    * 5-word-gram hashes NOT already present in any lower-doc_id document
    * — the memorization/novelty profile a pretraining-data team reads to
    * find documents that add nothing beyond what the corpus (in its
    * canonical ingestion order) already contains. novelty = 1.0 means
    * every gram is first seen here; near 0.0 flags recombined/derived
    * text that exact and MinHash dedup both miss.
    *
    * Scale shape: one gram explosion (codegen'd [[WordShingleHashes]],
    * distinct within doc), a map-side-combinable min(doc_id) aggregation
    * per gram hash, and a join back on the SAME `h` partitioning (the
    * exchange is reused — the q59 df/join pattern), then a per-doc
    * aggregation. Novelty is (n_grams − n_seen)/n_grams: one integer
    * subtract + one IEEE division, identical on both engines.
    */
  private val NoveltyGram = 5
  val qNgramNovelty: QuerySpec = QuerySpec(
    "q122_ngram_novelty",
    (s, dir) => {
      // r18: the scan + 5-gram hash kernel + explode subtree fed both
      // the first-seen aggregate and the join probe — two executions
      // (the q101 pattern); flush the per-doc distinct-hash arrays once
      // and explode from the compact parquet on both reads.
      val base = Scratch.flush(s,
        s"q122-grams-${java.lang.Long.toHexString(PolyHash.hash(dir))}",
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            WordShingleHashes(col("text"), NoveltyGram).as("H")))
      val g = base.select(col("doc_id"), explode(col("H")).as("h"))
      val first = g.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
      g.join(first, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          count(when(col("first_doc") < col("doc_id"), 1)).as("n_seen"))
        .select(col("doc_id"), col("n_grams"), col("n_seen"),
          ((col("n_grams") - col("n_seen")).cast("double") /
            col("n_grams").cast("double")).as("novelty"))
    },
    Some(s"""WITH dt AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
            | sg AS (SELECT doc_id, list_distinct(list_transform(
            |   list_transform(range(1, greatest(len(tk) - ${NoveltyGram - 1}, 0) + 1),
            |     i -> ${(0 until NoveltyGram).map(o => s"tk[i + $o]").mkString(" || ' ' || ")}),
            |   s -> ${PolyHash.oracleSql("s")})) AS H FROM dt),
            | g AS (SELECT doc_id, unnest(H) AS h FROM sg),
            | f AS (SELECT h, MIN(doc_id) AS first_doc FROM g GROUP BY h)
            | SELECT g.doc_id, COUNT(*) AS n_grams,
            |  COUNT(CASE WHEN f.first_doc < g.doc_id THEN 1 END) AS n_seen,
            |  CAST(COUNT(*) - COUNT(CASE WHEN f.first_doc < g.doc_id THEN 1 END)
            |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty
            | FROM g JOIN f ON g.h = f.h
            | GROUP BY g.doc_id""".stripMargin.replaceAll("\n", "")))

  /** q151's model size — declared BEFORE the query val (the q82
    * object-init-order trap: the oracle string interpolates it eagerly).
    */
  private[operators] val LmTopK = 500

  /** q151 — n-gram LM hit-rate scoring: build a reference "model" — the
    * top-[[LmTopK]] word-bigram hashes of the TRAINING split by document
    * frequency (`doc_id % 10 ≠ 0`, the q46 split convention) — and score
    * every HELD-OUT document by the fraction of its distinct bigrams the
    * model contains. The log-free stand-in for the n-gram-LM perplexity
    * filter every public curation stack runs (CCNet/fastText-era
    * pipelines): high hit-rate ≈ in-distribution text, low ≈ outlier /
    * noise. Differs from q80 (hash-derived weights, no trained
    * artifact), q122 (ingestion-order novelty, no model), and q46
    * (shared-gram FLAGGING, not rate scoring): here a bounded trained
    * artifact scores unseen text — swap in a real LM's top-K table and
    * the plumbing is unchanged. Docs with < 2 words have no bigrams and
    * drop out (no unnest rows — identical on both engines).
    *
    * Scale shape: one shingle explosion feeding both splits; the model
    * is a distributed partial-agg → TakeOrdered(K) (the q15 discipline —
    * full (c DESC, h) tiebreak, never a global window over the type
    * space) and rides as a K-row broadcast; the eval side is explode →
    * broadcast-hash-join → per-doc agg — scan-shaped at 100 TB. The
    * hit rate is one IEEE division of exact counts.
    */
  /** Per-doc distinct-bigram hash rows — the frame both the model build
    * and the scoring side consume (shared with q152's agreement report).
    */
  private[operators] def bigramRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(WordShingleHashes(col("text"), 2)).as("h"))

  /** The q151 reference model: top-[[LmTopK]] training-split bigram
    * hashes by document frequency, fully tie-broken (c DESC, h) — a
    * K-row frame meant to ride as a broadcast.
    */
  private[operators] def lmModel(sh2: DataFrame): DataFrame =
    sh2.filter(col("doc_id") % 10 =!= 0)
      .groupBy(col("h")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("h")).limit(LmTopK)
      .select(col("h"), lit(1L).as("hit"))

  /** DuckDB CTEs `sh` (per-doc distinct bigram hash rows) and `model`
    * (the q151 top-K table) — requires [[shingleCtes]](2) upstream.
    */
  private[operators] def lmModelCtes: String =
    s"""sh AS (SELECT doc_id, unnest(H) AS h FROM ds),
       | model AS (SELECT h FROM (SELECT h, CAST(COUNT(*) AS BIGINT) AS c
       |    FROM sh WHERE doc_id % 10 <> 0 GROUP BY h)
       |   ORDER BY c DESC, h LIMIT $LmTopK)""".stripMargin
      .replaceAll("\n", "")

  val qLmHitrate: QuerySpec = QuerySpec(
    "q151_lm_hitrate",
    (s, dir) => {
      val sh2 = bigramRows(Tables.load(s, dir, "documents"))
      val model = lmModel(sh2)
      sh2.filter(col("doc_id") % 10 === 0)
        .join(broadcast(model), Seq("h"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          coalesce(sum(col("hit")), lit(0L)).as("n_hits"))
        .select(col("doc_id"), col("n_bigrams"), col("n_hits"),
          (col("n_hits").cast("double") / col("n_bigrams").cast("double"))
            .as("hit_rate"))
    },
    Some(s"""WITH ${shingleCtes(2)},
            | $lmModelCtes,
            | ev AS (SELECT s.doc_id, CASE WHEN m.h IS NULL THEN 0 ELSE 1 END
            |    AS hit
            |   FROM sh s LEFT JOIN model m ON s.h = m.h WHERE s.doc_id % 10 = 0)
            | SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
            |  CAST(SUM(hit) AS BIGINT) AS n_hits,
            |  CAST(SUM(hit) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS hit_rate
            | FROM ev GROUP BY doc_id""".stripMargin.replaceAll("\n", "")))

  /** q127 — sequence-length histogram: documents and tokens per
    * power-of-two token-count bucket, with cumulative coverage
    * fractions — THE report read before fixing a packing length
    * (q56's `max_seq_len`): "2^10 covers 97% of docs but only 81% of
    * tokens" is the difference between truncating rare long documents
    * and truncating the corpus's token mass.
    *
    * Scale shape: token count and bucket are one map-side pass (the
    * bucket is the binary-representation LENGTH of the whitespace token
    * count — integer floor(log2)+1 with no libm), the histogram is a
    * map-side-combinable ≤64-group aggregation, and the cumulative
    * fractions ride two windows over that bounded summary (the q123
    * discipline). Fractions are single IEEE divisions of exact integers.
    */
  val qSeqlenHistogram: QuerySpec = QuerySpec(
    "q127_seqlen_histogram",
    (s, dir) => {
      import org.apache.spark.sql.Column
      import org.apache.spark.sql.GraftShims
      import org.apache.spark.sql.expressions.Window
      // functions.shiftleft only takes a LITERAL shift amount (the q85
      // rule) — the per-row bucket shift needs the Catalyst node
      def sll(x: Column, n: Column): Column = GraftShims.column(
        org.apache.spark.sql.catalyst.expressions.ShiftLeft(
          GraftShims.expression(x), GraftShims.expression(n)))
      val hist = Tables.load(s, dir, "documents")
        .select(size(split(col("text"), " ")).cast("long").as("t"))
        .select(length(conv(col("t"), 10, 2)).cast("long").as("bucket"),
          col("t"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("n_tokens"))
      val upTo = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val whole = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      hist
        .withColumn("cd", sum(col("n_docs")).over(upTo))
        .withColumn("ct", sum(col("n_tokens")).over(upTo))
        .withColumn("td", sum(col("n_docs")).over(whole))
        .withColumn("tt", sum(col("n_tokens")).over(whole))
        .select(col("bucket"),
          sll(lit(1L), (col("bucket") - 1).cast("int")).as("min_len"),
          (sll(lit(1L), col("bucket").cast("int")) - 1).as("max_len"),
          col("n_docs"), col("n_tokens"),
          (col("cd").cast("double") / col("td").cast("double"))
            .as("doc_coverage"),
          (col("ct").cast("double") / col("tt").cast("double"))
            .as("token_coverage"))
    },
    Some("""WITH t AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS t
           |  FROM documents),
           | h AS (SELECT CAST(length(bin(t)) AS BIGINT) AS bucket,
           |   COUNT(*) AS n_docs, CAST(SUM(t) AS BIGINT) AS n_tokens
           |  FROM t GROUP BY 1),
           | c AS (SELECT bucket, n_docs, n_tokens,
           |   CAST(SUM(n_docs) OVER (ORDER BY bucket
           |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cd,
           |   CAST(SUM(n_tokens) OVER (ORDER BY bucket
           |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ct,
           |   CAST(SUM(n_docs) OVER () AS BIGINT) AS td,
           |   CAST(SUM(n_tokens) OVER () AS BIGINT) AS tt FROM h)
           | SELECT bucket,
           |  (CAST(1 AS BIGINT) << CAST(bucket - 1 AS INT)) AS min_len,
           |  (CAST(1 AS BIGINT) << CAST(bucket AS INT)) - 1 AS max_len,
           |  n_docs, n_tokens,
           |  CAST(cd AS DOUBLE) / CAST(td AS DOUBLE) AS doc_coverage,
           |  CAST(ct AS DOUBLE) / CAST(tt AS DOUBLE) AS token_coverage
           | FROM c""".stripMargin.replaceAll("\n", "")))

  /** q140 — pack manifest: the MATERIALIZATION step after q56's offset
    * assignment — for every packed training sequence, which document
    * slices compose it. A document straddling a cut appears in every
    * sequence it overlaps, with its in-sequence offset and slice
    * length; `GROUP BY seq_id` of `len_in_seq` tiles each non-final
    * sequence to exactly the 4096 budget. This is the manifest a
    * training loader actually reads (doc provenance per sequence — the
    * piece q56 leaves implicit in arithmetic).
    *
    * Scale shape: q56's two-level plan plus one bounded explode — a
    * document emits ⌈n_tok/budget⌉+1 rows at most, so manifest volume
    * is ≤ corpus tokens / budget + docs, linear; every offset is exact
    * integer arithmetic on both engines (nonneg `div`, `greatest/least`
    * clamps — no floor/truncate divergence).
    */
  val qPackManifest: QuerySpec = QuerySpec(
    "q140_pack_manifest",
    (s, dir) => {
      val budget = 4096L
      sequencePack(Tables.load(s, dir, "documents"), budget)
        .filter(col("n_tok") > 0)
        .withColumn("last_seq",
          expr(s"(start_tok + n_tok - 1) div ${budget}L"))
        .select(col("source"), col("doc_id"), col("start_tok"), col("n_tok"),
          explode(sequence(col("seq_id"), col("last_seq"))).as("sq"))
        .select(col("source"), col("sq").as("seq_id"), col("doc_id"),
          greatest(col("start_tok") - col("sq") * budget, lit(0L))
            .as("off_in_seq"),
          (least((col("sq") + 1) * budget, col("start_tok") + col("n_tok"))
            - greatest(col("sq") * budget, col("start_tok"))).as("len_in_seq"))
    },
    Some("""WITH t AS (SELECT source, doc_id,
           |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           |  FROM documents),
           | c AS (SELECT *, CAST(COALESCE(SUM(n_tok) OVER (
           |   PARTITION BY source ORDER BY doc_id
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           |   AS start_tok
           |  FROM t WHERE n_tok > 0),
           | x AS (SELECT source, doc_id, start_tok, n_tok,
           |   CAST(UNNEST(range(start_tok // 4096,
           |     (start_tok + n_tok - 1) // 4096 + 1)) AS BIGINT) AS sq
           |  FROM c)
           | SELECT source, sq AS seq_id, doc_id,
           |  GREATEST(start_tok - sq * 4096, 0) AS off_in_seq,
           |  LEAST((sq + 1) * 4096, start_tok + n_tok)
           |   - GREATEST(sq * 4096, start_tok) AS len_in_seq
           | FROM x""".stripMargin.replaceAll("\n", "")))

  /** Candidate sequence budgets for q136 — declared before the query so
    * the oracle interpolation sees them (object-init-order rule).
    */
  private[operators] val PackBudgets = Seq(512L, 1024L, 2048L, 4096L, 8192L)

  /** q136 — packing-efficiency curve: for each candidate sequence
    * budget, the sequence count, tail-waste tokens, and fill efficiency
    * q56's concat-and-chunk layout would produce — the budget-tuning
    * report a training team reads before fixing seq_len (q72's
    * yield-curve discipline applied to the packing knob). Under
    * concat-and-chunk the ONLY waste is each source stream's final
    * partial sequence: `waste(B) = Σ_src (B − src_tok mod B) mod B`,
    * so the whole curve derives from per-source token totals — exact
    * integer arithmetic, one IEEE division for the efficiency ratio.
    *
    * Scale shape: one map-side token-count agg to ≤|sources| rows, then
    * a ≤|sources|·|budgets| exploded summary agg — nothing after the
    * first aggregation is corpus-sized, same shape as q132.
    */
  val qPackingEfficiency: QuerySpec = QuerySpec(
    "q136_packing_efficiency",
    (s, dir) => {
      val perSrc = Tables.load(s, dir, "documents")
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .groupBy(col("source")).agg(sum(col("n_tok")).as("src_tok"))
      perSrc
        .select(col("src_tok"),
          explode(typedlit(PackBudgets)).as("budget"))
        .groupBy(col("budget"))
        .agg(sum(expr("(src_tok + budget - 1) div budget")).as("n_seqs"),
          sum(expr("(budget - (src_tok % budget)) % budget")).as("waste_tok"),
          sum(col("src_tok")).as("total_tok"))
        .select(col("budget"), col("n_seqs"), col("waste_tok"),
          (col("total_tok").cast("double") /
            (col("n_seqs") * col("budget")).cast("double")).as("efficiency"))
    },
    Some(s"""WITH t AS (SELECT source,
            |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
            |  FROM documents),
            | ps AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS src_tok
            |  FROM t GROUP BY source),
            | x AS (SELECT src_tok, CAST(b.budget AS BIGINT) AS budget
            |  FROM ps, (VALUES (${PackBudgets.mkString("), (")})) b(budget))
            | SELECT budget,
            |  CAST(SUM((src_tok + budget - 1) // budget) AS BIGINT) AS n_seqs,
            |  CAST(SUM((budget - (src_tok % budget)) % budget) AS BIGINT)
            |   AS waste_tok,
            |  CAST(SUM(src_tok) AS DOUBLE) /
            |   CAST(SUM((src_tok + budget - 1) // budget) * budget AS DOUBLE)
            |   AS efficiency
            | FROM x GROUP BY budget""".stripMargin.replaceAll("\n", "")))

  /** q141 parameters — declared before the query so the oracle
    * interpolation sees them (object-init-order rule). `AllocCapPct`
    * is the repeat cap in 1/100ths of an epoch: a source may
    * contribute at most `src_tok·51/100` tokens to the mixture (0.51
    * epochs — chosen so the cap genuinely binds against q132's
    * τ=1/2 targets on near-uniform sources and forces a
    * redistribution cascade). `AllocRounds` unrolls the waterfall:
    * measured fixpoint is ≤4 rounds at sf0.001/0.01/0.1, so 6 is
    * slack — extra rounds are no-ops (no new source caps ⇒ identical
    * remainder and weights), the k-means iteration-cap discipline.
    */
  private[operators] val AllocCapPct = 51L
  private[operators] val AllocRounds = 6

  /** One waterfall round of q141's oracle: a source joins the capped
    * set when its proportional share of the REMAINING budget (after
    * subtracting already-capped sources' caps, weighted by the
    * still-uncapped wq mass) exceeds its own cap. Each round reads the
    * previous round three times (two scalar aggregates + the row
    * stream) — MATERIALIZED per the unrolled-fixpoint CTE rule.
    */
  private def allocRoundSql(k: Int): String = {
    val p = s"ar${k - 1}"
    s""", ar$k AS MATERIALIZED (SELECT source, src_tok, wq, cap_tok,
       |  capped OR ((
       |    (SELECT (SELECT budget FROM ab)
       |      - COALESCE(CAST(SUM(cap_tok) FILTER (WHERE capped) AS BIGINT), 0)
       |     FROM $p) * wq)
       |   // (SELECT CAST(SUM(wq) FILTER (WHERE NOT capped) AS BIGINT) FROM $p)
       |   > cap_tok) AS capped
       | FROM $p)""".stripMargin
  }

  /** q141 — data-constrained epoch ALLOCATOR (public technique:
    * Muennighoff et al. 2023, "Scaling Data-Constrained Language
    * Models" — repeat small sources only up to a bounded epoch count).
    * q132 sets temperature targets with no repeat bound, so a
    * low-resource source can be asked for many epochs of itself; this
    * operator adds the cap and re-distributes the displaced budget by
    * waterfall: fix every source whose proportional share of the
    * remaining budget exceeds its cap AT its cap, re-divide the
    * remainder over the still-uncapped sources by the same √-token
    * weights, repeat to fixpoint. Output per source: size, cap,
    * allocated target, whether the cap bound, and the resulting epoch
    * count. All integer arithmetic (q132's quantized √ weights,
    * truncating `div` ≡ DuckDB BIGINT `//`); the one IEEE step is the
    * final epochs division.
    *
    * Scale shape: ONE map-side token-count aggregation to ≤|sources|
    * rows; the waterfall then runs driver-side over that
    * catalog-sized frame (the q75 argmax / q120 moment-matrix
    * discipline — |sources| is a vocabulary, not a data scale) and
    * returns as a literal frame. Invariant: the uncapped weight mass
    * never empties (Σ caps of capped sources stays < budget because a
    * source caps only when offered MORE than its cap), so the integer
    * divisions are total. Headroom: rem·wq ~ tot_tok^1.5·10³ — the
    * q132/q63 bound; past ~10¹² tokens the products graduate to
    * DECIMAL(38).
    */
  val qEpochAlloc: QuerySpec = QuerySpec(
    "q141_epoch_alloc",
    (s, dir) => {
      val perSrc = Tables.load(s, dir, "documents")
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .groupBy(col("source")).agg(sum(col("n_tok")).as("src_tok"))
        .withColumn("wq",
          floor(sqrt(col("src_tok").cast("double")) * lit(1000.0d)).cast("long"))
        .withColumn("cap_tok", expr(s"(src_tok * $AllocCapPct) div 100"))
      val rows = perSrc.select("source", "src_tok", "wq", "cap_tok")
        .collect() // ≤ |sources| rows — catalog-sized, never data-sized
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      val budget = rows.map(_._2).sum / 2
      var capped = Set.empty[String]
      def rem = budget - rows.filter(r => capped(r._1)).map(_._4).sum
      def wqr = rows.filterNot(r => capped(r._1)).map(_._3).sum
      for (_ <- 1 to AllocRounds) {
        val (rm, wr) = (rem, wqr)
        capped ++= rows.filterNot(r => capped(r._1))
          .filter(r => rm * r._3 / wr > r._4).map(_._1)
      }
      val (rmF, wrF) = (rem, wqr)
      val out = rows.map { case (src, tok, wq, cap) =>
        val tgt = if (capped(src)) cap else rmF * wq / wrF
        (src, tok, cap, tgt, if (capped(src)) 1L else 0L,
          tgt.toDouble / tok.toDouble)
      }
      s.createDataFrame(s.sparkContext.parallelize(out.toSeq, 1))
        .toDF("source", "src_tok", "cap_tok", "target_tok", "capped", "epochs")
    },
    Some((s"""WITH t AS (SELECT source,
             |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             | ps AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS src_tok
             |  FROM t GROUP BY source),
             | ar0 AS MATERIALIZED (SELECT source, src_tok,
             |   CAST(floor(sqrt(CAST(src_tok AS DOUBLE)) * 1000.0) AS BIGINT)
             |    AS wq,
             |   (src_tok * $AllocCapPct) // 100 AS cap_tok, FALSE AS capped
             |  FROM ps),
             | ab AS MATERIALIZED (SELECT CAST(SUM(src_tok) AS BIGINT) // 2
             |   AS budget FROM ar0)""" +
      (1 to AllocRounds).map(allocRoundSql).mkString +
      s""", fin AS (SELECT source, src_tok, cap_tok,
         |  CASE WHEN capped THEN cap_tok ELSE ((
         |    (SELECT (SELECT budget FROM ab)
         |      - COALESCE(CAST(SUM(cap_tok) FILTER (WHERE capped) AS BIGINT), 0)
         |     FROM ar$AllocRounds) * wq)
         |   // (SELECT CAST(SUM(wq) FILTER (WHERE NOT capped) AS BIGINT)
         |       FROM ar$AllocRounds)) END AS target_tok,
         |  CAST(CASE WHEN capped THEN 1 ELSE 0 END AS BIGINT) AS capped
         | FROM ar$AllocRounds)
         | SELECT source, src_tok, cap_tok, target_tok, capped,
         |  CAST(target_tok AS DOUBLE) / CAST(src_tok AS DOUBLE) AS epochs
         | FROM fin""").stripMargin.replaceAll("\n", "")))

  /** Batch size (sequences per batch) for q142 — declared before the
    * query (object-init-order rule).
    */
  private[operators] val PadBatch = 32L

  /** q142 — length-bucketed BATCHING plan: the padding-waste report for
    * the non-packed (one document = one padded sequence) training
    * regimes — SFT / reward-model batches — where q56's concat-packing
    * is off the table and the standard mitigation is bucketing by
    * length so each batch pads only to its bucket's max. Per
    * power-of-two length bucket (q127's libm-free binary-length
    * bucket): doc count, batch count at `PadBatch` sequences/batch,
    * the bucket's observed max length (the pad target, an upper bound
    * on per-batch max), pad tokens under bucketed padding, tokens
    * SAVED vs the naive pad-everything-to-global-max baseline, and the
    * pad fraction. Integer-exact except the one IEEE pad_frac
    * division.
    *
    * Scale shape: token count and bucket are one map-side pass; the
    * plan aggregates to ≤64 bucket rows with map-side combine; the
    * global max rides one window over that bounded summary (the q127
    * discipline). Nothing after the first aggregation is corpus-sized.
    */
  val qPadPlan: QuerySpec = QuerySpec(
    "q142_pad_plan",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hist = Tables.load(s, dir, "documents")
        .select(size(split(col("text"), " ")).cast("long").as("t"))
        .select(length(conv(col("t"), 10, 2)).cast("long").as("bucket"),
          col("t"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("sum_tok"),
          max(col("t")).as("bucket_max"))
      val whole = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      hist
        .withColumn("gmax", max(col("bucket_max")).over(whole))
        .select(col("bucket"), col("n_docs"),
          expr(s"(n_docs + ${PadBatch - 1}) div $PadBatch").as("n_batches"),
          col("bucket_max"),
          (col("n_docs") * col("bucket_max") - col("sum_tok")).as("pad_tok"),
          (col("n_docs") * (col("gmax") - col("bucket_max"))).as("saved_tok"),
          ((col("n_docs") * col("bucket_max") - col("sum_tok")).cast("double") /
            (col("n_docs") * col("bucket_max")).cast("double")).as("pad_frac"))
    },
    Some(s"""WITH t AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS t
            |  FROM documents),
            | h AS (SELECT CAST(length(bin(t)) AS BIGINT) AS bucket,
            |   COUNT(*) AS n_docs, CAST(SUM(t) AS BIGINT) AS sum_tok,
            |   MAX(t) AS bucket_max
            |  FROM t GROUP BY 1),
            | c AS (SELECT h.*, MAX(bucket_max) OVER () AS gmax FROM h)
            | SELECT bucket, n_docs,
            |  (n_docs + ${PadBatch - 1}) // $PadBatch AS n_batches, bucket_max,
            |  n_docs * bucket_max - sum_tok AS pad_tok,
            |  n_docs * (gmax - bucket_max) AS saved_tok,
            |  CAST(n_docs * bucket_max - sum_tok AS DOUBLE) /
            |   CAST(n_docs * bucket_max AS DOUBLE) AS pad_frac
            | FROM c""".stripMargin.replaceAll("\n", "")))

  /** q177 — exact sorted-batch padding manifest: the per-batch
    * refinement of q142's bucket-level plan. q142 upper-bounds waste by
    * padding every batch to its power-of-two BUCKET max; the batcher a
    * serving/SFT stack actually runs sorts by length and pads each
    * `PadBatch`-sequence batch only to its OWN max. This query emits
    * that batcher's exact manifest — per batch: sequence count, max
    * length (the pad target), useful tokens, padded tokens, and the
    * 1e-6 fixed-point waste fraction — under the deterministic
    * (length asc, doc_id asc) admission order.
    *
    * The corpus is NEVER globally sorted. Same-length documents are
    * interchangeable for padding purposes, so the batch-composition
    * multiset is fully determined by the LENGTH HISTOGRAM: each length's
    * docs occupy the contiguous global-rank range
    * [cum_before, cum_before + count), which overlaps batch b on
    * [b·B, (b+1)·B) by a closed-form integer amount. So: one map-side
    * token-count pass → length histogram (map-side combine, ≤ distinct
    * lengths rows), ONE cumulative window over that bounded histogram
    * (the q39/q127 bounded-summary discipline), a `sequence()` explode
    * of each length onto the ≤ count/B + 1 batches it spans (total
    * explode rows ≈ N/B + distinct lengths), and a per-batch aggregate.
    * Integer-exact throughout; output is the batch manifest
    * (corpus/B rows — the artifact a batch scheduler consumes, the q56
    * per-doc-output precedent).
    */
  val qPaddingWaste: QuerySpec = QuerySpec(
    "q177_padding_waste",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val b = PadBatch
      val hist = Tables.load(s, dir, "documents")
        .select(size(split(col("text"), " ")).cast("long").as("len"))
        .groupBy(col("len")).agg(count(lit(1)).as("c"))
      val wCum = Window.orderBy(col("len"))
        .rowsBetween(Window.unboundedPreceding, -1)
      hist
        .withColumn("s", coalesce(sum(col("c")).over(wCum), lit(0L)))
        .select(col("len"), col("c"), col("s"),
          explode(sequence(expr(s"s div $b"), expr(s"(s + c - 1) div $b")))
            .as("batch_id"))
        .select(col("batch_id"), col("len"),
          (least((col("batch_id") + 1) * b, col("s") + col("c"))
            - greatest(col("batch_id") * b, col("s"))).as("ov"))
        .groupBy(col("batch_id"))
        .agg(sum(col("ov")).as("n_seqs"), max(col("len")).as("max_len"),
          sum(col("len") * col("ov")).as("sum_tok"))
        .select(col("batch_id"), col("n_seqs"), col("max_len"),
          col("sum_tok"), (col("n_seqs") * col("max_len")).as("padded"),
          expr("(1000000 * (n_seqs * max_len - sum_tok))"
            + " div (n_seqs * max_len)").as("waste_e6"))
    },
    Some(s"""WITH t AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT)
            |   AS len FROM documents),
            | h AS (SELECT len, COUNT(*) AS c FROM t GROUP BY 1),
            | w AS (SELECT len, c, CAST(COALESCE(SUM(c) OVER (ORDER BY len
            |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            |    AS BIGINT) AS s FROM h),
            | e AS (SELECT len, c, s,
            |   CAST(unnest(range(s // $PadBatch,
            |    (s + c - 1) // $PadBatch + 1)) AS BIGINT) AS batch_id
            |  FROM w),
            | o AS (SELECT batch_id, len,
            |   LEAST((batch_id + 1) * $PadBatch, s + c)
            |    - GREATEST(batch_id * $PadBatch, s) AS ov FROM e),
            | a AS (SELECT batch_id, CAST(SUM(ov) AS BIGINT) AS n_seqs,
            |   CAST(MAX(len) AS BIGINT) AS max_len,
            |   CAST(SUM(len * ov) AS BIGINT) AS sum_tok
            |  FROM o GROUP BY 1)
            | SELECT batch_id, n_seqs, max_len, sum_tok,
            |  n_seqs * max_len AS padded,
            |  (1000000 * (n_seqs * max_len - sum_tok))
            |   // (n_seqs * max_len) AS waste_e6
            | FROM a""".stripMargin.replaceAll("\n", "")))

  /** q182 — term burstiness (Church & Gale 1995, public literature):
    * per term, the variance-to-mean ratio of its per-document frequency
    * — the dispersion statistic that separates CONTENT terms (bursty:
    * absent from most docs, repeated where present, VMR ≫ 1) from
    * FUNCTION words (Poisson-like, VMR ≈ 1). The signal behind
    * data-driven stopword lists and keyword weighting that df alone
    * can't provide (two terms with equal df can differ 100× in
    * burstiness). All-integer closed form over zeros-included moments:
    * VMR = Var/Mean = (N·Σtf² − cf²) / (N·cf) with tf ≡ 0 on docs
    * lacking the term contributing nothing to either sum — so the agg
    * runs only over PRESENT (doc, term) pairs. Reported in 1e-6 fixed
    * point as the DIFFERENCE of two truncating fixed-point divisions
    * (`e6(Σtf²/cf) − e6(cf/N)` rather than the single-fraction form,
    * whose `1e6·N·Σtf²` numerator would overflow 64 bits near 10⁸
    * corpus tokens; the split form holds to ~10¹² tokens per term and
    * is defined identically on both engines — within 2e-6 of the exact
    * rational). df ≥ 5 keeps the report to recurring terms.
    *
    * Scale shape: one corpus token explode → (doc, term) map-side-
    * combined tf agg → term-keyed moment agg (map-side combine) → one
    * single-row N broadcast. BIGINT moments hold to ~3·10⁹ tokens per
    * term (the q113 bound); past that the moments graduate to
    * DECIMAL(38) per the q63 rule.
    */
  val qBurstiness: QuerySpec = QuerySpec(
    "q182_burstiness",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val tf = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      tf.groupBy(col("term"))
        .agg(sum(col("tf")).as("cf"), count(lit(1)).as("df"),
          sum(col("tf") * col("tf")).as("tf2"))
        .filter(col("df") >= 5)
        .crossJoin(broadcast(n))
        .select(col("term"), col("cf"), col("df"),
          (expr("(1000000 * tf2) div cf") - expr("(1000000 * cf) div n_docs"))
            .as("vmr_e6"))
    },
    Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' '))
           |   AS term FROM documents),
           | tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
           |  WHERE len(term) > 0 GROUP BY 1, 2),
           | m AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cf,
           |   COUNT(*) AS df, CAST(SUM(tf * tf) AS BIGINT) AS tf2
           |  FROM tf GROUP BY term),
           | n AS (SELECT COUNT(*) AS n_docs FROM documents)
           | SELECT term, cf, CAST(df AS BIGINT) AS df,
           |  CAST((1000000 * tf2) // cf - (1000000 * cf) // n_docs
           |   AS BIGINT) AS vmr_e6
           | FROM m CROSS JOIN n WHERE df >= 5""".stripMargin
      .replaceAll("\n", "")))

  /** Continuation-byte thresholds for LEB128 varint sizing — byte count
    * of value x ≥ 0 is `1 + Σ [x ≥ 2^(7k)]`, a branch-free sum of
    * comparisons identical on both engines (no log).
    */
  private val VarintThresholds: Seq[Long] = (1 to 8).map(k => 1L << (7 * k))

  /** q183 — posting-list storage sizing under delta + LEB128-varint
    * encoding (the standard inverted-index compression layout —
    * Zobel & Moffat 2006, public literature): doc-id gaps per term in
    * posting order, each gap priced at its varint byte count, rolled up
    * as a byte-class histogram (how many gaps encode in 1 byte, 2
    * bytes, …) plus each class's raw-8-byte cost — the sizing estimate
    * that says what the q154 persisted index will cost at rest and
    * what delta-varint saves vs fixed-width ids BEFORE building it at
    * 100 TB. First posting delta-encodes from 0; gaps are strictly
    * positive afterwards (distinct sorted ids).
    *
    * Scale shape: token explode → distinct (doc, term) → the q89
    * per-term posting window (lag) — the same shuffle the posting build
    * itself pays — then a ≤9-row byte-class rollup with map-side
    * combine. At 100 TB the gaps come FROM the maintained q154 store
    * instead of a re-scan (the q172 swap note).
    */
  val qPostingSizing: QuerySpec = QuerySpec(
    "q183_posting_sizing",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byTerm = Window.partitionBy(col("term")).orderBy(col("doc_id").asc)
      val gaps = Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(array_distinct(split(col("text"), " ")))
          .as("term"))
        .filter(length(col("term")) > 0)
        .select(col("term"),
          (col("doc_id") - coalesce(lag(col("doc_id"), 1).over(byTerm),
            lit(0L))).as("gap"))
      val bytesCol = VarintThresholds
        .map(t => when(col("gap") >= t, 1L).otherwise(0L))
        .foldLeft(lit(1L): Column)(_ + _)
      gaps.select(bytesCol.as("gap_bytes"))
        .groupBy(col("gap_bytes"))
        .agg(count(lit(1)).as("n_gaps"))
        .select(col("gap_bytes"), col("n_gaps"),
          (col("gap_bytes") * col("n_gaps")).as("varint_bytes"),
          (col("n_gaps") * 8L).as("raw_bytes"))
    },
    Some {
      val bytesSql = "1 + " + VarintThresholds
        .map(t => s"(CASE WHEN gap >= $t THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH tok AS (SELECT DISTINCT doc_id,
         |   unnest(string_split(text, ' ')) AS term FROM documents),
         | g AS (SELECT term, doc_id - COALESCE(LAG(doc_id) OVER (
         |   PARTITION BY term ORDER BY doc_id ASC), 0) AS gap
         |  FROM tok WHERE len(term) > 0),
         | b AS (SELECT CAST(($bytesSql) AS BIGINT) AS gap_bytes FROM g)
         | SELECT gap_bytes, COUNT(*) AS n_gaps,
         |  CAST(gap_bytes * COUNT(*) AS BIGINT) AS varint_bytes,
         |  CAST(COUNT(*) * 8 AS BIGINT) AS raw_bytes
         | FROM b GROUP BY gap_bytes""".stripMargin.replaceAll("\n", "")
    })

  val specs: Seq[QuerySpec] = Seq(
    qDecontaminate, qSampleStratified, qRepetition, qVocabBigrams,
    qGroupedTopK, qSequencePack, qMixtureSample, qMixturePlanner, qShardShuffle,
    qShardBalance, qLangVocabOverlap, qBpeMerges, qBpeApply,
    qCollocations, qCountMin, qBloomDecontaminate, qSnapshotDiff,
    qPostingLists, qBm25TopK, qFertility, qNgramNovelty, qLmHitrate,
    qSeqlenHistogram, qPackingEfficiency, qPackManifest, qEpochAlloc, qPadPlan,
    qHeavyHitters, qShardChecksums, qManifestDiff, qPaddingWaste,
    qBurstiness, qPostingSizing, qTokenShards, qRepetitionTrim,
    qTokenizerCoverage, qTokenCollisions)
}
