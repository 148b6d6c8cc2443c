package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the repo's central determinism claim directly: gated results are
  * BITWISE identical at any parallelism. The oracle gate proves
  * engine-vs-DuckDB equality at one partitioning; this spec proves
  * engine-vs-engine equality across partitionings — the property that
  * makes the same query safe on local[32] and a 1000-executor cluster:
  * decimal-exact double sums (q9), fixed-point vector math (q25),
  * distributive exact percentiles (q39).
  */
class ParallelismInvarianceSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def collectAt(partitions: Int, q: graft.QuerySpec): Seq[String] = {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    spark.conf.set(key, partitions.toString)
    try q.build(spark, dir).collect().map(_.toString).sorted.toSeq
    finally spark.conf.set(key, old)
  }

  for (q <- Seq(Relational.q9Agg, Similarity.qEmbedNearDup,
      Relational.q39Percentiles,
      // round-8 additions: davg buckets (q66), window-derived df ranking
      // (q67), vocab-join Jaccard (q68), broadcast dup rollup (q69),
      // one-pass norm stats (q70)
      Dedup.qMinhashCalibration, TextAnalysis.qTfidf,
      Corpus.qLangVocabOverlap, Dedup.qDupRate,
      Profiling.qEmbeddingQuality, Curation.qQualityYield,
      Corpus.qShardBalance,
      // round-9 additions: real-codec multimodal decode (q32, map-only
      // but pins the per-partition generation+decode), integer PQ
      // training/ADC + recall joins (q74), iterative merge training
      // with per-step argmax collects (q75), suffix-list domain
      // reduction + anti-join (q76)
      Multimodal.qMultimodal, ProductQuant.qPqRecall,
      Corpus.qBpeMerges, Curation.qDomainBlocklist,
      Similarity.qEmbedDecontaminate,
      // map-only hashed-feature scoring (q80), df heavy-hitter join +
      // doc rollup (q81), map-only CDC chunking (q82)
      TextAnalysis.qQualityClassifier, Dedup.qBoilerplate,
      TextAnalysis.qCdcChunking,
      // lift-ranked top-20 with double division (q83), CMS bucket
      // aggregation + broadcast probe join (q84), bitmask-literal bloom
      // probe + left join (q85)
      Corpus.qCollocations, Corpus.qCountMin,
      Corpus.qBloomDecontaminate,
      // CC labels + corpus rewrite join (q86), multi-signal source
      // rollup with decimal-exact ratio means (q87), fingerprint
      // full-outer diff (q88), sorted posting-list heads (q89)
      Dedup.qDedupCollapse, Curation.qSourceScorecard,
      Corpus.qSnapshotDiff, Corpus.qPostingLists,
      // per-chunk langid majority vote (q90), band-occupancy skew
      // report (q91), one-scan threshold curve (q92)
      TextAnalysis.qMixedLanguage, Dedup.qLshOccupancy,
      Dedup.qDedupThresholdCurve,
      // round-10 additions: df-ranked prefix equi-join + exact set
      // verify (q101), integer power iteration over the scratch-flushed
      // edge list (q102)
      Dedup.qPrefixJoin, Graph.qPageRank,
      // two-level salted top-k over literal-anchor cosines (q103),
      // histogram cumsum + single-bucket residual-rank select (q104)
      Similarity.qHardNegatives, Profiling.qQuantileSketch,
      // shared-edge CC labels + rank argmax canonical (q106)
      Graph.qCentralCanonical,
      // degree-oriented wedge join + closure (q107), literal-carried
      // greedy MMR selection (q108), windowed lead + ppm rollup (q109)
      Graph.qTriangles, Similarity.qMmrSelect, Temporal.qTransitions,
      // integer OLS moments with signed floor-div (q110), LCG-hash
      // Poisson resampling fan-out (q111), broadcast cluster-split
      // rollup (q112), token-moment diversity (q113)
      Profiling.qTrend, Profiling.qBootstrap, Dedup.qClusterSplit,
      TextAnalysis.qDiversity,
      // round-10 additions: iterative 2-core peel with count-equality
      // fixpoint (q114; the DupGraph memo is parallelism-keyed, so the
      // full pipeline re-executes per partitioning), token-total join +
      // closed-form absent-mass TVD (q115), rank-trimmed robust means
      // (q116)
      Graph.qKcore, TextAnalysis.qSourceDrift, Profiling.qTrimmedMean,
      // diagonal gaps-and-islands extents (q117), trained-merge fold +
      // word-keyed segmentation join (q118), offset-exploded distinct
      // coverage (q119)
      Dedup.qSpanExtents, Corpus.qFertility, Dedup.qDupMass,
      // all-integer moment matrix + driver-side max-abs power iteration
      // (q120)
      Similarity.qPrincipalComponent,
      // round-14 additions: driver-side integer waterfall over the
      // collected per-source frame (q141), multi-query pruned probe +
      // per-query rank windows (q143), union-min sketch + (j, mh)
      // agreement equi-join (q144), first-seen-bucket vocabulary
      // histogram + cumulative windows (q145)
      Corpus.qEpochAlloc, Retrieval.qAnnServe,
      Dedup.qSourceSketch, Profiling.qVocabGrowth,
      // bounded-grid CDF carry + common-denominator |cumdiff| sums
      // (q149), min-over-strata allocation + salted-rank stratum
      // selection (q150)
      TextAnalysis.qWassersteinDrift, Curation.qLengthMatchedSample,
      // tie-broken distributed TakeOrdered model + broadcast hit join
      // (q151), four-scorer flag join + flushed single-row pair aggs
      // (q152)
      Corpus.qLmHitrate, Curation.qFilterAgreement,
      // memoized-label + flushed-flag taint rollup (q153; the DupGraph
      // memo is parallelism-keyed, so the full pipeline re-executes per
      // partitioning), bucket-pruned postings probe + per-doc pivot +
      // tie-broken TakeOrdered over the persisted index (q154)
      Dedup.qTaintPropagation, Retrieval.qBm25FromIndex,
      // ragged-batch dsum scoring + per-query rank windows over the
      // pruned postings probe (q155)
      Retrieval.qBm25ServeBatch,
      // broadcast bucket-ratio weights + dsum affinity + tie-broken
      // TakeOrdered selection (q156), hash-group exact flags + DupGraph
      // membership + map-side rule battery first-fail label (q157; the
      // DupGraph memo is parallelism-keyed, so the pair pipeline
      // re-executes per partitioning)
      Curation.qImportanceWeights, Curation.qRejectionReasons,
      // per-partition MG candidate union (a superset of the true heavy
      // hitters at ANY partitioning — the pigeonhole guarantee) + exact
      // candidate-count threshold filter (q158)
      Corpus.qHeavyHitters,
      // histogram-bucket percentile windows + broadcast join-back
      // (q159), bounded bucket cumsum + single-boundary-bucket residual
      // prefix (q160)
      Curation.qScoreCalibration, Curation.qBudgetSelection,
      // per-source bucket cumsum + plan-quota residual prefixes (q161)
      Curation.qMixtureSelection,
      // map-side centroid argmax + broadcast own-centroid cosine +
      // davg rollup (q162), per-user lag + histogram rank stats (q163)
      Similarity.qClusterQuality, Temporal.qEventCadence,
      // modular-sum shard checksums (q164), 3-slice bucket-share TVD
      // over the broadcast-joined q160 cut (q165)
      Corpus.qShardChecksums, Curation.qSelectionShift,
      // label-pushed pruned probe (q166), filtered recall sweep whose
      // exact side is a collected 10-id literal (q167)
      Retrieval.qAnnFiltered, Retrieval.qFilteredRecall,
      // anchors-as-literals exact-NN top-1 joined to the served ranks
      // (q168), deletion-variant equi-join + distinct + exact verify
      // (q169)
      Retrieval.qServeMrr, Entity.qFuzzyJoin,
      // modular-checksum manifests full-outer diffed (q170), bounded
      // quasi-identifier groups × literal k grid (q171), DupGraph-joined
      // cluster tf × windowed df lift ranking (q172; the DupGraph memo
      // is parallelism-keyed, so CC re-executes per partitioning)
      Corpus.qManifestDiff, Curation.qKAnonymity, Dedup.qClusterLabels,
      // full-outer RRF fusion of two batched top-k plans (q173), exact
      // distinct over low-cardinality bands (q174)
      Retrieval.qHybridServeBatch, Curation.qLDiversity,
      // fixed-point EMD over dense literal band grids (q175), bit-math
      // geometric noise on a bounded group frame (q176), histogram-derived
      // exact batch manifest with sequence explode (q177)
      Curation.qTCloseness, Curation.qDpRelease, Corpus.qPaddingWaste,
      // prefix-cosine TakeOrdered sweep vs a 10-id literal (q178),
      // literal-probe-key bucketed index join + rank windows (q179)
      Similarity.qMatryoshkaRecall, Similarity.qMultiprobeLsh,
      // ADC shortlist TakeOrdered sweep + broadcast re-rank (q180),
      // dsum'd S-curve expectations over the candidate join (q181)
      ProductQuant.qRerankDepth, Dedup.qLshPlanner,
      // split fixed-point moment divisions + N broadcast (q182),
      // per-term lag window + comparison-sum varint pricing (q183)
      Corpus.qBurstiness, Corpus.qPostingSizing,
      // request-sized serving-plan joins + literal pair grid (q184),
      // double-pass user agg + unpivoted quartile histogram (q185)
      Retrieval.qRankAgreement, Temporal.qRfmSegments,
      // ids-only full-outer parity rollups over the three layouts (q186)
      Similarity.qLayoutParity,
      // two-level sweep-line prefix decomposition (q187), scratch-flushed
      // co-order edges + hub-capped wedge join (q188)
      Temporal.qConcurrency, Relational.qLinkPrediction,
      // basket self-join pair supports + broadcast basket total (q189),
      // bounded quality-grid running-min frontier (q190), one-histogram
      // double-median fence counts (q191)
      Relational.qMarketBasket, Curation.qParetoFrontier,
      Profiling.qMadOutliers,
      // bounded-grid stacked CUSUM windows (q192), flushed oriented
      // triangle-edge anti-join + memoized labels (q193; the DupGraph
      // memo is parallelism-keyed, so the pipeline re-executes per
      // partitioning), register max-merge + dense-grid estimator (q194)
      Temporal.qCusumChangepoint, Graph.qBridgeEdges,
      Profiling.qHllCube,
      // single-pass multi-FK left joins unpivoted (q195), histogram-rank
      // Gini moments (q196), flushed register cube + range-windowed
      // max-merge (q197)
      Profiling.qReferentialAudit, Profiling.qTokenGini,
      Profiling.qRollingDistinct,
      // dual-weighted histogram percentiles (q198), conditional-min path
      // pivot + tie-broken top-10 (q199), two min-aggs + bounded lag
      // histogram (q200)
      Profiling.qWeightedPercentiles, Temporal.qSessionPaths,
      Temporal.qConversionLag,
      // flushed day-grid lag joins with signed truncating div (q201),
      // bounded dow-grid share windows (q202)
      Temporal.qDailyAutocorr, Temporal.qDowProfile,
      // round-15 additions: merge-chain token ids exploded to scalar
      // rows (q203), set-difference agreement rollup (q204), closed-form
      // redaction rewrite (q205), first-occurrence repetition trim
      // (q206), sharded averaged-perceptron fold (q207), grid-window
      // AUC/F1 sweep (q208), distinct-(source, word) merge chain (q209)
      Corpus.qTokenShards, Retrieval.qSemDedupAgreement,
      Curation.qPiiRedact, Corpus.qRepetitionTrim,
      TextAnalysis.qPerceptronTrain, TextAnalysis.qClassifierEval,
      Corpus.qTokenizerCoverage,
      // zero-filled grid lag scoring (q210), flushed token-signature
      // dup-mass meet (q211), integer χ² + broadcast totals (q212)
      Temporal.qForecastEval, Corpus.qTokenCollisions,
      TextAnalysis.qSourceBias,
      // packed-key window min + capped fp equi-join (q213), per-type
      // integer EWMA fold over the day grid (q214), fixed-round
      // min-label LPA with lexicographic argmax (q215)
      Dedup.qWinnowPairs, Temporal.qEwmaAnomaly,
      Relational.qLpaCommunities,
      // all-integer degree-moment rational (q216), shared-label
      // modularity rollup with one signed end division (q217)
      Relational.qDegreeAssortativity, Relational.qLpaModularity,
      // full-outer pair-set meet of two bounded candidate joins (q218),
      // driver-side fixed-point power iteration over the collected
      // types² matrix (q219)
      Dedup.qDedupMethodAgreement, Temporal.qMarkovStationary,
      // per-(type, weekday) e6-truncated variance terms summed as
      // integers (q220)
      Temporal.qSeasonalStrength,
      // position-carrying capped fp join with extent min/max (q221),
      // degree-oriented exact triangle count collected to one literal
      // row (q222)
      Dedup.qWinnowExtents, Relational.qClusteringCoefficient,
      // one-lag-pass multi-threshold conditional counts (q224; q223 is
      // the dir-keyed store read, the q33b convention — not listed),
      // unordered source-cell rollup of the capped pair join (q225)
      Temporal.qSessionSensitivity, Dedup.qWinnowSourceMatrix,
      // flushed distinct (session, type) rows + bounded pair self-join
      // with a collected session-total literal (q226)
      Temporal.qSessionColift,
      // round-16 additions: multi-assignment (acid, sub) equi-join with
      // min-exemplar reduction (q227), its one-row boundary report
      // (q228), map-side literal-codebook margin histogram (q229)
      Retrieval.qSemDedupMulti, Retrieval.qSemDedupBoundary,
      Retrieval.qCentroidMargin,
      // bounded-pair max-cosine per vector exploded over the τ grid (q230)
      Retrieval.qSemDedupYield,
      // round-17 additions: pointer-jumping CC over the deduped q227
      // pair surface (q231) + its flushed-once agreement report (q232)
      Retrieval.qSemDedupCc, Retrieval.qSemDedupCcAgreement)) {
    test(s"${q.name} is bitwise identical at 3, 7, and 32 shuffle partitions") {
      val results = Seq(3, 7, 32).map(collectAt(_, q))
      assert(results(0).nonEmpty)
      assert(results(0) == results(1) && results(1) == results(2),
        s"${q.name} diverged across partitionings")
    }
  }
}
