package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle scenario mirroring the reference's discovery example
  * (part4/WorkloadDiscoveryExample.scala:164-205: start a set, remove
  * one, add two) against `StreamingQueryManager`.
  */
class WorkloadManagerSpec extends AnyFunSuite with SparkTestSession {

  private def w(n: String) = Workload(n, s"topic-$n", 2)

  private def mkManager(): (WorkloadManager, Gauges) = {
    val gauges = new Gauges
    spark.streams.addListener(gauges)
    val builder = (wl: Workload) =>
      spark.readStream.format("rate").option("rowsPerSecond", 5).load()
        .writeStream.format("noop").queryName(wl.workloadName).start()
    (new WorkloadManager(spark, builder), gauges)
  }

  test("start set, remove one, add two; idempotent; graceful shutdown") {
    val (mgr, gauges) = mkManager()
    try {
      // start 3
      val r1 = mgr.reconcile(Set(w("wl-a"), w("wl-b"), w("wl-c")))
      assert(r1.workloadsToStart.map(_.workloadName) == Set("wl-a", "wl-b", "wl-c"))
      assert(mgr.existing() == Set("wl-a", "wl-b", "wl-c"))
      val activeNames = spark.streams.active.map(_.name).toSet
      assert(Set("wl-a", "wl-b", "wl-c").subsetOf(activeNames))

      // idempotent: reconciling the same set changes nothing
      val sameIds = spark.streams.active.filter(_.name.startsWith("wl-"))
        .map(q => q.name -> q.id).toMap
      val r2 = mgr.reconcile(Set(w("wl-a"), w("wl-b"), w("wl-c")))
      assert(r2.workloadsToStart.isEmpty && r2.workloadsToDelete.isEmpty)
      val sameIds2 = spark.streams.active.filter(_.name.startsWith("wl-"))
        .map(q => q.name -> q.id).toMap
      assert(sameIds == sameIds2, "queries must not be restarted")

      // remove one, add two (the reference's scripted scenario)
      val r3 = mgr.reconcile(Set(w("wl-a"), w("wl-b"), w("wl-d"), w("wl-e")))
      assert(r3.workloadsToDelete == Set("wl-c"))
      assert(r3.workloadsToStart.map(_.workloadName) == Set("wl-d", "wl-e"))
      assert(mgr.existing() == Set("wl-a", "wl-b", "wl-d", "wl-e"))
      assert(!spark.streams.active.map(_.name).contains("wl-c"))

      // gauges observed the lifecycle (C7/C4 observability)
      assert(gauges.all.keySet.intersect(Set("wl-a", "wl-b", "wl-c")).nonEmpty)
    } finally {
      mgr.shutdown()
      assert(spark.streams.active.count(_.name.startsWith("wl-")) == 0)
    }
  }

  test("shutdown drains the in-flight batch before stop returns (C1 grace)") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val started = new java.util.concurrent.atomic.AtomicInteger(0)
    val completed = new java.util.concurrent.atomic.AtomicInteger(0)
    val builder = (wl: Workload) =>
      input.toDS().writeStream.queryName(wl.workloadName)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[String], _: Long) =>
          if (!batch.isEmpty) {
            started.incrementAndGet()
            Thread.sleep(500) // a slow in-flight batch
            completed.incrementAndGet()
          }
          ()
        }
        .start()
    val mgr = new WorkloadManager(spark, builder, drainGraceMs = 10000)
    val stopTimeoutBefore = spark.conf.get("spark.sql.streaming.stopTimeout")
    mgr.reconcile(Set(w("drain-a")))
    input.addData("x")
    // wait until the slow batch is genuinely in flight
    eventually(5000)(started.get() == 1 && completed.get() == 0)
    mgr.shutdown() // must NOT interrupt the batch mid-flight
    assert(completed.get() == 1,
      "the in-flight batch must complete before shutdown returns")
    assert(spark.streams.active.count(_.name == "drain-a") == 0)
    // the grace conf is SCOPED to each stop call and restored after: the
    // session is shared, streams this manager doesn't own keep theirs
    assert(spark.conf.get("spark.sql.streaming.stopTimeout") == stopTimeoutBefore)
  }

  test("discovery polling picks up desired-state changes within a tick") {
    val (mgr, _) = mkManager()
    val discovery = new WorkloadDiscovery
    try {
      discovery.set(Set(w("poll-a")))
      mgr.startPolling(discovery, intervalMs = 100)
      eventually(5000)(mgr.existing() == Set("poll-a"))
      discovery.set(Set(w("poll-b")))
      eventually(5000)(mgr.existing() == Set("poll-b"))
    } finally mgr.shutdown()
  }

  private def eventually(timeoutMs: Long)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(cond)
  }
}
