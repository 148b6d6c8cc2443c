package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins that q207's IPM-trained weights are a REAL quality filter, not
  * plumbing: scoring the corpus with the averaged weight vector must
  * beat both the majority class and q80's untrained hash-weight
  * baseline on teacher agreement (measured at round 15: trained 0.692
  * vs baseline 0.530 vs majority 0.518 at sf0.01).
  */
class PerceptronSpec extends AnyFunSuite with SparkTestSession {
  private val dir = "/root/testdata/sf0.01"

  test("trained averaged weights beat majority class and the q80 baseline") {
    assume(new java.io.File(dir).exists(), s"$dir not present")
    val wt = TextAnalysis.qPerceptronTrain.build(spark, dir).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(2)).toMap // bucket -> w_sum
    val wlit = array((0 to TextAnalysis.PerceptronDim).map(b => lit(wt(b))): _*)
    val docs = TextAnalysis.perceptronDocs(spark, dir)
      .select(col("doc_id"), col("y"),
        expr("arrays_zip(bs, cs)").as("f"))
      .select(col("doc_id"), col("y"),
        aggregate(col("f"), lit(0L),
          (acc, x) => acc +
            element_at(wlit, (x.getField("bs") + 1).cast("int"))
              * x.getField("cs")).as("s"))
    val n = docs.count()
    val accTrained = docs
      .filter((col("s") > 0L) === (col("y") === 1L)).count().toDouble / n
    val posRate = docs.filter(col("y") === 1L).count().toDouble / n
    val majority = math.max(posRate, 1.0 - posRate)
    // q80's untrained hash weights, scored against the same teacher
    val q80 = TextAnalysis.qQualityClassifier.build(spark, dir)
      .select(col("doc_id"), when(col("score") >= 0, 1L).otherwise(-1L).as("p"))
    val accBase = docs.join(q80, Seq("doc_id"))
      .filter(col("p") === col("y")).count().toDouble / n
    assert(accTrained > majority + 0.05,
      s"trained $accTrained vs majority $majority")
    assert(accTrained > accBase + 0.05,
      s"trained $accTrained vs untrained baseline $accBase")
    assert(accTrained >= 0.65, s"trained accuracy regressed: $accTrained")
  }

  test("training is deterministic: two runs produce identical weights") {
    assume(new java.io.File(dir).exists(), s"$dir not present")
    val a = TextAnalysis.qPerceptronTrain.build(spark, dir)
      .orderBy("bucket").collect().toSeq
    val b = TextAnalysis.qPerceptronTrain.build(spark, dir)
      .orderBy("bucket").collect().toSeq
    assert(a == b)
  }
}
