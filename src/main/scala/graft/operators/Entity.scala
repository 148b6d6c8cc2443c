package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions.EditWithin
import org.apache.spark.sql.functions._

/** Entity-resolution joins: string-similarity matching over catalog
  * tables (names, titles, addresses) where near-matches are EDITS, not
  * shared shingles — the complement of the set-overlap family (PPJoin
  * q101 / LSH q23 operate on token sets; an edit-distance join catches
  * `Customer#000000123` vs `Customer#000000124`, which share every
  * 5-gram shingle except one and no useful rare token).
  */
object Entity {

  /** q169 — edit-distance-1 fuzzy join (FastSS deletion-neighborhood
    * blocking, Bocek et al. 2007, public literature): all customer-name
    * pairs within Levenshtein distance 1, with candidates ONLY from an
    * equi-join on deletion variants. Every string emits itself plus its
    * `L` single-character deletions; two strings within edit distance 1
    * ALWAYS share a variant (substitution at `i`: delete `i` from both;
    * insertion: the shorter string IS a deletion variant of the longer
    * and of itself), so the equi-join is a complete candidate generator
    * — the theorem `FuzzyJoinSpec` re-proves against brute force. The
    * exact bounded verify ([[graft.functions.EditWithin]]) then
    * discards false candidates (two strings can share a variant at
    * distance 2: `xa`/`ax` both delete to `a`).
    *
    * Scale shape: the variant explosion is ×(L+1) map-side (all
    * codegen'd substring/concat builtins — no higher-order functions);
    * candidates come only from the variant equi-join, never an
    * all-pairs product; `distinct` collapses multi-variant agreement
    * BEFORE the verify so each candidate pair is verified once — and
    * the verify is the O(L) prefix/suffix walk of `EditWithin(…, 1)`,
    * not the O(L²) full-matrix `levenshtein` (which cost 10 of this
    * query's 12 s at sf0.1). Generalizes to distance d by deleting up
    * to d characters (variant fanout ×(L choose d) — the standard
    * FastSS trade) with the banded `EditWithin(…, d)` verify.
    */
  val qFuzzyJoin: QuerySpec = QuerySpec(
    "q169_fuzzy_join",
    (s, dir) => {
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("name"))
      val vars = c
        .select(col("id"), col("name"),
          explode(sequence(lit(0), length(col("name")))).as("i"))
        .select(col("id"), col("name"),
          when(col("i") === 0, col("name")).otherwise(
            concat(col("name").substr(lit(1), col("i") - 1),
              col("name").substr(col("i") + 1, length(col("name")))))
            .as("var"))
      vars.as("a").join(vars.as("b"),
          col("a.var") === col("b.var") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.name").as("na"), col("b.name").as("nb"))
        .distinct()
        .withColumn("d", EditWithin(col("na"), col("nb"), 1))
        .filter(col("d") >= 0)
        .select(col("id_a"), col("id_b"), col("d").cast("long").as("dist"))
    },
    Some("""WITH v AS (
           |  SELECT c_custkey AS id, c_name AS name,
           |    unnest(list_prepend(c_name,
           |      list_transform(range(1, length(c_name) + 1),
           |        i -> substr(c_name, 1, i - 1) || substr(c_name, i + 1))))
           |    AS var
           |  FROM customer),
           | cand AS (
           |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           |    a.name AS na, b.name AS nb
           |  FROM v a JOIN v b ON a.var = b.var AND a.id < b.id)
           | SELECT id_a, id_b, CAST(levenshtein(na, nb) AS BIGINT) AS dist
           | FROM cand WHERE levenshtein(na, nb) <= 1""".stripMargin
      .replaceAll("\n", "")))

  val specs: Seq[QuerySpec] = Seq(qFuzzyJoin)
}
