package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The end-to-end curation run must compose EXACTLY the gated
  * operators: each stage's parquet is cross-checked against the query
  * that certifies it, plus the layout invariants a training job
  * depends on.
  */
class CurationRunSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private lazy val out = {
    val d = java.nio.file.Files.createTempDirectory("graft-curation-").toString
    (d, CurationRun.run(spark, dir, d))
  }

  test("the clean stage is bit-identical to the gated q130 rewrite") {
    val (o, _) = out
    val fromRun = spark.read.parquet(s"$o/clean")
      .orderBy("doc_id").collect().toSeq
    val gated = Dedup.qSubstringRemove.build(spark, dir)
      .orderBy("doc_id").collect().toSeq
    assert(fromRun == gated)
  }

  test("the collapse stage honors the q131 keeper discipline over the cleaned corpus") {
    val (o, sm) = out
    val collapse = spark.read.parquet(s"$o/collapse")
    // every cleaned document appears exactly once
    assert(collapse.count() == sm.nDocs)
    assert(collapse.select("doc_id").distinct().count() == sm.nDocs)
    // the canonical doc of every group is kept, and is the group's
    // (score desc, doc_id asc) argmax — the q131 total order
    val viol = collapse.groupBy(col("canonical_id"))
      .agg(sum(when(col("doc_id") === col("canonical_id"), 1L).otherwise(0L))
          .as("self_kept"),
        max_by(col("doc_id"),
          struct(col("score"), (-col("doc_id")).as("nid"))).as("argmax"))
      .filter(col("self_kept") =!= 1L || col("argmax") =!= col("canonical_id"))
    assert(viol.count() == 0)
    assert(collapse.filter(col("kept") === 1L).count() == sm.nKept)
    assert(sm.nKept < sm.nDocs, "sf0.001 contains near-dup clusters to collapse")
  }

  test("mixture plan and scorecard cover exactly the surviving sources") {
    val (o, sm) = out
    val kept = spark.read.parquet(s"$o/collapse").filter(col("kept") === 1L)
    val docs = Tables.load(spark, dir, "documents")
    val srcs = docs.join(kept.select("doc_id"), Seq("doc_id"))
      .select("source").distinct().count()
    assert(spark.read.parquet(s"$o/mixture").count() == srcs)
    assert(sm.nSources == srcs)
    // the scorecard's doc counts roll up to the shipped corpus
    val scN = spark.read.parquet(s"$o/scorecard")
      .agg(sum("n_docs")).first().getLong(0)
    assert(scN == sm.nKept)
    // shares are a distribution over the shipped corpus
    val natural = spark.read.parquet(s"$o/mixture")
      .agg(sum("natural_share")).first().getDouble(0)
    assert(math.abs(natural - 1.0) < 1e-9)
  }

  test("the shard layout packs every survivor with exact per-source prefix sums") {
    val (o, sm) = out
    val shards = spark.read.parquet(s"$o/shards")
    assert(shards.count() == sm.nKept)
    // q56 invariant: offsets tile the per-source token stream exactly
    val bad = shards.groupBy(col("source"))
      .agg(max(col("start_tok") + col("n_tok")).as("end"),
        sum(col("n_tok")).as("tot"))
      .filter(col("end") =!= col("tot"))
    assert(bad.count() == 0)
    assert(shards.filter(col("seq_off") >= 4096L || col("seq_off") < 0L)
      .count() == 0)
  }
}
