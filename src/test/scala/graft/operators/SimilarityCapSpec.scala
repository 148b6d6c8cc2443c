package graft.operators

import graft.{SparkTestSession, Tables}
import graft.functions.Exact
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the q138 hot-bucket guard: capped pairs are a strict subset of
  * q25's (the guard only REMOVES candidates), the cap actually fires on
  * the gate corpus, and survivors of hot buckets can still pair through
  * their other bands (the multi-band safety net the scaladoc claims).
  */
class SimilarityCapSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.01"

  test("q138 is a strict, bucket-justified subset of q25") {
    val uncapped = Similarity.qEmbedNearDup.build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Similarity.qEmbedNearDupCapped.build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped), "the guard must only remove pairs")
    assert(capped.nonEmpty, "the guard must not empty the result")

    // occupancy ground truth straight from the band rows
    val occ = Similarity.withBandRows(
        Tables.load(spark, dir, "embeddings")
          .select(col("vec_id"), Exact.quantize(col("embedding")).as("qe")))
      .groupBy(col("band"), col("bh")).agg(count(lit(1)).as("occ"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(occ.values.exists(_ > Similarity.MaxBucketOcc),
      "sf0.01 should contain at least one hot bucket")
    // the guard's REAL effect is candidate-volume reduction (a dropped
    // bucket's pairs may still surface via other bands, so the OUTPUT
    // can legitimately match q25's): Σ C(occ, 2) over cool buckets must
    // be a strict reduction, and it bounds the capped pair count
    val volAll = occ.values.map(n => n * (n - 1) / 2).sum
    val volCool = occ.filter(_._2 <= Similarity.MaxBucketOcc)
      .values.map(n => n * (n - 1) / 2).sum
    assert(volCool < volAll,
      "the cap dropped no candidate volume — MaxBucketOcc is miscalibrated")
    assert(capped.size <= volCool,
      s"capped pair count ${capped.size} exceeds the cool-bucket bound $volCool")
    // multi-band safety net: at least one pair SURVIVES whose members
    // also sit in a hot bucket (they met through a cool band)
    val bands = Similarity.withBandRows(
        Tables.load(spark, dir, "embeddings")
          .select(col("vec_id"), Exact.quantize(col("embedding")).as("qe")))
      .collect().map(r => (r.getLong(0), (r.getInt(2), r.getLong(3))))
    val hotMembers = bands
      .filter { case (_, b) => occ(b) > Similarity.MaxBucketOcc }
      .map(_._1).toSet
    assert(capped.exists { case (a, b) => hotMembers(a) || hotMembers(b) },
      "no hot-bucket member paired through a cool band — net untested")
  }
}
