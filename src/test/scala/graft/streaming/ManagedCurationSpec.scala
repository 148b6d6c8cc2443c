package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkTestSession
import graft.sources.SignatureStore
import graft.streaming.broker.BrokerTopic
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** The part-4 management surface driving the REAL pipeline, composed:
  * [[WorkloadManager]] reconciles a curation workload whose consumer is
  * a broker topic feeding [[CurationStream.startIncremental]]'s
  * SignatureStore probe/upsert. The reference's discovery example
  * manages consumers doing real message processing
  * (part4/WorkloadDiscoveryExample.scala:96-205) — this is that
  * composition over our pipeline, asserting the property the seams must
  * preserve TOGETHER: a workload the manager stops (graceful drain) and
  * later restarts resumes from its checkpoint — messages published while
  * unmanaged are processed exactly once on resume, no verdict is
  * re-issued, and the persisted store gains no duplicate rows.
  */
class ManagedCurationSpec extends AnyFunSuite with SparkTestSession {

  private def await(what: String)(cond: => Boolean): Unit = {
    val end = System.currentTimeMillis + 30000
    while (!cond && System.currentTimeMillis < end) Thread.sleep(100)
    assert(cond, s"timed out waiting for $what")
  }

  test("managed curation workload: reconcile-stop, resume from checkpoint, no replayed verdicts or store rows") {
    import spark.implicits._
    def text(p: String) = (0 until 40).map(w => s"$p$w").mkString(" ")
    def t(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    val tag = System.nanoTime()

    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType), StructField("n_chars", LongType)))
    val topic = BrokerTopic.create(spark, s"mcur-$tag", docSchema,
      numPartitions = 2)
    val store = SignatureStore.build(spark,
      Seq((1L, text("seed"))).toDF("doc_id", "text"), s"mcur$tag")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mcur-").toString

    val curated = new ConcurrentLinkedQueue[Long]()
    val flagged = new ConcurrentLinkedQueue[(Long, Long)]()
    val builder = (_: Workload) =>
      CurationStream.startIncremental(
        spark,
        topic.readStream(admitPerTrigger = 64)
          .select(col("doc_id"), col("ts"), col("text"), col("n_chars")),
        store, ckpt,
        onBatch = b => b.select("doc_id").as[Long](Encoders.scalaLong)
          .collect().foreach(curated.add),
        onFlagged = f => f.select("doc_id", "dup_of").collect()
          .foreach(r => flagged.add((r.getLong(0), r.getLong(1)))))
    val wl = Workload(s"mcur-wl-$tag", topic.name, 1)
    val mgr = new WorkloadManager(spark, builder)
    try {
      def publish(rows: Seq[(Long, Timestamp, String)]): Unit =
        topic.publish(rows.toDF("doc_id", "ts", "text")
          .select(col("doc_id"), col("ts"), col("text"),
            org.apache.spark.sql.functions.length(col("text"))
              .cast("long").as("n_chars")))

      // ---- phase 1: manager starts the workload; pipeline processes --
      mgr.reconcile(Set(wl))
      assert(mgr.existing() == Set(wl.workloadName))
      publish(Seq(
        (100L, t(0), text("seed") + " tail"), // near-dup of the day-0 doc
        (101L, t(1), text("bravo")))) // fresh
      await("phase-1 verdicts")(
        flagged.asScala.toSet == Set((100L, 1L)) &&
          curated.asScala.toSet == Set(101L))

      // ---- phase 2: reconcile away -> graceful drain-stop ------------
      mgr.reconcile(Set.empty[Workload])
      assert(mgr.existing().isEmpty)
      // published while UNMANAGED: must wait in the broker, not be lost
      publish(Seq(
        (200L, t(2), text("bravo") + " tail"), // twin of a STREAMED doc
        (201L, t(3), text("charlie")))) // fresh

      // ---- phase 3: re-reconcile -> resume from the same checkpoint --
      mgr.reconcile(Set(wl))
      await("phase-3 verdicts")(
        flagged.asScala.toSet == Set((100L, 1L), (200L, 101L)) &&
          curated.asScala.toSet == Set(101L, 201L))

      // exactly-once effects across the managed stop/resume: no verdict
      // re-issued (sets above), and the store holds ONE row per doc
      val sig = spark.table(store.sig).select("doc_id")
        .as[Long](Encoders.scalaLong).collect().toSeq
      assert(sig.sorted == Seq(1L, 101L, 201L),
        s"store must hold exactly the seed + curated docs once: $sig")
    } finally mgr.shutdown()
  }
}
