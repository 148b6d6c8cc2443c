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

  test("q208's distributed AUC equals an independent driver computation; trained weights rank better") {
    assume(new java.io.File(dir).exists(), s"$dir not present")
    // exact integer AUC (grouped-midrank form, the q208 formula) computed
    // INDEPENDENTLY: a driver-side sort + tie-group walk, no windows
    def aucE6(pairs: Seq[(Long, Long)]): Long = { // (score, y ∈ {1,-1})
      val arr = pairs.sortBy(_._1).toArray
      val pos = arr.count(_._2 == 1L).toLong
      val neg = arr.length - pos
      var i = 0
      var sumR2 = 0L // Σ over positives of 2×midrank
      while (i < arr.length) {
        var j = i
        while (j < arr.length && arr(j)._1 == arr(i)._1) j += 1
        val mid2 = (i + 1).toLong + j // 2×midrank of ranks i+1..j
        var k = i
        while (k < j) { if (arr(k)._2 == 1L) sumR2 += mid2; k += 1 }
        i = j
      }
      (1000000L * (sumR2 - pos * (pos + 1))) / (2 * pos * neg)
    }
    val basePairs = graft.Tables.load(spark, dir, "documents")
      .select(element_at(graft.functions.HashedLinearScore(col("text"),
          TextAnalysis.ClassifierModulus), 1).as("score"),
        graft.TextMetrics.wordCount(col("text")).as("nw"),
        graft.TextMetrics.stopCount(col("text")).as("ns"))
      .filter(col("nw") > 0)
      .select(col("score"),
        when(col("ns") * 50 >= col("nw") * 3, 1L).otherwise(-1L).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val star = TextAnalysis.qClassifierEval.build(spark, dir)
      .filter(col("source") === "*").collect().head
    assert(star.getAs[Long]("auc_e6") == aucE6(basePairs),
      "q208's windowed AUC diverged from the driver-side midrank walk")

    // the trained q207 scorer must RANK better than the untrained
    // baseline, not just agree more often (accuracy is threshold-bound;
    // AUC is the threshold-free claim)
    val wt = TextAnalysis.qPerceptronTrain.build(spark, dir).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(2)).toMap
    val wlit = array((0 to TextAnalysis.PerceptronDim).map(b => lit(wt(b))): _*)
    val trainedPairs = TextAnalysis.perceptronDocs(spark, dir)
      .select(col("y"), expr("arrays_zip(bs, cs)").as("f"))
      .select(col("y"),
        aggregate(col("f"), lit(0L),
          (acc, x) => acc +
            element_at(wlit, (x.getField("bs") + 1).cast("int"))
              * x.getField("cs")).as("s"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSeq
    val (aucTrained, aucBase) = (aucE6(trainedPairs), aucE6(basePairs))
    assert(aucTrained > aucBase + 50000L, // ≥ 0.05 AUC margin
      s"trained auc_e6 $aucTrained vs untrained $aucBase")
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
