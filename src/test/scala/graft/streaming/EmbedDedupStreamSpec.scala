package graft.streaming

import graft.{SparkTestSession, Tables}
import graft.operators.{Retrieval, Similarity}
import graft.sources.EmbedStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the semantic-dedup ingest front door:
  *
  *  - index-build mode: after multi-batch checkpointed ingest (with
  *    in-stream compaction), the store's q227 recompute is bit-equal
  *    to the gated batch query over the same corpus — the
  *    WinnowStreamSpec discipline for the embedding family;
  *  - dedup mode: a near-dup arrival is flagged with its stored source
  *    and withheld, novel vectors and firsts are stored;
  *  - store contracts: replayed appends fold nothing twice, and a
  *    probe of a fully-stored batch sees no external dup (the replay
  *    exclusion rule).
  */
class EmbedDedupStreamSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def freshCkpt(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def emptyVecs = {
    import spark.implicits._
    Seq.empty[(Long, Seq[Long])].toDF("vec_id", "qe")
  }

  test("index-build mode: streamed store verdicts ≡ gated q227") {
    import spark.implicits._
    val cents = Similarity.ensureTrained(spark, dir)
    val vecs = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
    val store = EmbedStore.build(spark, emptyVecs, cents,
      s"edsidx${System.nanoTime()}")
    val src = Sources.queue[(Long, Seq[Float])](spark)
    val q = EmbedDedupStream.startIncremental(spark,
      src.toDS().toDF("vec_id", "embedding"), cents, store,
      freshCkpt("graft-eds-"), onBatch = _ => (), withhold = false,
      compactEvery = 2)
    try {
      vecs.grouped(17).foreach { g =>
        src.addData(g)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = EmbedStore.verdicts(spark, store, cents)
      .collect().map(_.toString).sorted.toSeq
    val batch = Retrieval.qSemDedupMulti.build(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    graft.sources.Bucketed.dropStale(spark, store.a2)
    graft.sources.Bucketed.dropStale(spark, store.vecs)
    assert(streamed.nonEmpty, "streamed verdicts empty — vacuous")
    assert(streamed == batch,
      "store verdicts after streamed ingest must be bit-equal to batch q227")
  }

  test("dedup mode: near-dup arrival flagged + withheld, firsts and novel stored") {
    import spark.implicits._
    // 3 axis centroids at the e6 quantize scale
    val cents: Seq[Seq[Long]] = Seq(
      Seq(1000000L, 0L, 0L), Seq(0L, 1000000L, 0L), Seq(0L, 0L, 1000000L))
    val store = EmbedStore.build(spark, emptyVecs, cents,
      s"edsdd${System.nanoTime()}")
    val src = Sources.queue[(Long, Seq[Float])](spark)
    var flagged = Vector.empty[(Long, Long)]
    var kept = Vector.empty[Long]
    val q = EmbedDedupStream.startIncremental(spark,
      src.toDS().toDF("vec_id", "embedding"), cents, store,
      freshCkpt("graft-eds-dd-"),
      onBatch = b => kept ++= b.collect().map(_.getLong(0)),
      onFlagged = f =>
        flagged ++= f.collect().map(r => (r.getLong(0), r.getLong(1))))
    try {
      src.addData(Seq(
        (1L, Seq(0.99f, 0.05f, 0.0f)),
        (2L, Seq(0.0f, 0.02f, 0.99f))))
      q.processAllAvailable()
      src.addData(Seq(
        (11L, Seq(0.98f, 0.07f, 0.0f)), // near-dup of stored 1
        (13L, Seq(0.0f, 0.99f, 0.05f)))) // novel cell-1 vector
      q.processAllAvailable()
    } finally q.stop()
    val stored = spark.table(store.vecs).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    graft.sources.Bucketed.dropStale(spark, store.a2)
    graft.sources.Bucketed.dropStale(spark, store.vecs)
    assert(flagged.map(_._1).toSet == Set(11L),
      s"exactly the near-dup arrival must be flagged, got $flagged")
    assert(flagged.toMap.apply(11L) == 1L, "dup_of must name the stored source")
    assert(stored == Set(1L, 2L, 13L), s"store drifted: $stored")
    assert(kept.toSet == Set(1L, 2L, 13L), s"survivor callbacks drifted: $kept")
  }

  test("restart from the checkpoint resumes without reprocessing (T2)") {
    import spark.implicits._
    val cents: Seq[Seq[Long]] = Seq(
      Seq(1000000L, 0L, 0L), Seq(0L, 1000000L, 0L), Seq(0L, 0L, 1000000L))
    val store = EmbedStore.build(spark, emptyVecs, cents,
      s"edsrs${System.nanoTime()}")
    val ckpt = freshCkpt("graft-eds-rs-")
    var flagged = Vector.empty[Long]
    def start(src: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]) =
      EmbedDedupStream.startIncremental(spark,
        src.toDS().toDF("vec_id", "embedding"), cents, store, ckpt,
        onBatch = _ => (),
        onFlagged = f => flagged ++= f.collect().map(_.getLong(0)))

    // phase 1: two vectors land and the query STOPS (graceful — the
    // checkpoint holds the committed offset). The SAME MemoryStream
    // instance carries both phases (its buffer is the durable log
    // stand-in; a fresh instance could not serve the checkpointed
    // offsets).
    val src = Sources.queue[(Long, Seq[Float])](spark)
    val q1 = start(src)
    try {
      src.addData(Seq(
        (1L, Seq(0.99f, 0.05f, 0.0f)), (2L, Seq(0.0f, 0.02f, 0.99f))))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.table(store.vecs).count() == 2L)

    // phase 2: new traffic lands while the pipeline is DOWN; restart
    // from the same checkpoint must process only the new vector — a
    // replay of phase 1 would re-probe vectors 1/2 against a store
    // already containing them (the anti-join keeps appends idempotent,
    // but a reprocessed near-dup would spuriously re-flag)
    src.addData(Seq((11L, Seq(0.98f, 0.07f, 0.0f))))
    val q2 = start(src)
    try q2.processAllAvailable() finally q2.stop()
    val stored = spark.table(store.vecs).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    graft.sources.Bucketed.dropStale(spark, store.a2)
    graft.sources.Bucketed.dropStale(spark, store.vecs)
    assert(stored == Set(1L, 2L), s"store drifted across restart: $stored")
    assert(flagged == Vector(11L),
      s"restart must process ONLY the new vector (flagged: $flagged)")
  }

  test("append folds nothing twice; probe of a fully-stored batch sees no dup") {
    val cents = Similarity.ensureTrained(spark, dir)
    val batch = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        graft.functions.Exact.quantize(col("embedding")).as("qe"))
      .filter(col("vec_id") < 20)
    val store = EmbedStore.build(spark, emptyVecs, cents,
      s"edsrep${System.nanoTime()}")
    EmbedStore.append(spark, store, cents, batch)
    val n1 = spark.table(store.vecs).count()
    val a1 = spark.table(store.a2).count()
    assert(n1 > 0L && a1 == 2L * n1)
    EmbedStore.append(spark, store, cents, batch) // replay
    assert(spark.table(store.vecs).count() == n1, "replay appended manifest rows")
    assert(spark.table(store.a2).count() == a1, "replay appended assignment rows")
    // replay exclusion: the store contains exactly this batch, so the
    // probe must see no EXTERNAL duplicate (no self-pairs)
    val v = EmbedStore.probe(spark, store, cents, batch)
    val n = v.count()
    graft.sources.Bucketed.dropStale(spark, store.a2)
    graft.sources.Bucketed.dropStale(spark, store.vecs)
    assert(n == 0L, s"probe self-paired a stored batch ($n verdicts)")
  }
}
