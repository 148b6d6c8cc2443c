package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSinksPoolsSpec extends AnyFunSuite with SparkTestSession {

  test("S4 collection source + K3 fold sink") {
    import spark.implicits._
    val ds = Sources.collection(spark, Seq(1, 2, 3, 4))
    assert(Sinks.fold(ds)(_ + _) == 10)
  }

  test("S2 queue source: offered elements come out as micro-batches") {
    import spark.implicits._
    val q = Sources.queue[Int](spark)
    val name = s"queue_${System.nanoTime()}"
    val query = q.toDS().writeStream.format("memory").queryName(name).start()
    try {
      q.addData(1, 2, 3)
      query.processAllAvailable()
      assert(spark.table(name).as[Int].collect().toSet == Set(1, 2, 3))
    } finally query.stop()
  }

  test("F5 producer routing: partitioned write fans rows out by topic") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-route-").toString
    val df = Seq(
      ("a", 1, "t1-partition-0"), ("b", 2, "t2"), ("c", 3, "t1"))
      .toDF("name", "numPublishes", "topic")
    Sinks.partitionedByTopic(df, base)
    val t1 = spark.read.parquet(s"$base/topic=t1")
    assert(t1.count() == 2, "t1-partition-0 normalizes into t1's route")
    assert(spark.read.parquet(s"$base/topic=t2").count() == 1)
  }

  test("P1 pools: allocation XML renders and withPool restores the local property") {
    val xml = Pools.allocationXml(Seq(Pools.Pool("wl-a", 2, 1), Pools.Pool("wl-b", 0, 3)))
    assert(xml.contains("<pool name=\"wl-a\">") && xml.contains("<minShare>2</minShare>")
      && xml.contains("<weight>3</weight>"))
    val tmp = java.nio.file.Files.createTempFile("fair", ".xml").toString
    val conf = Pools.writeAllocationFile(Seq(Pools.Pool("p", 1, 1)), tmp)
    assert(conf("spark.scheduler.mode") == "FAIR")
    assert(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(tmp)))
      .contains("<allocations>"))
    Pools.withPool(spark, "wl-a") {
      assert(spark.sparkContext.getLocalProperty("spark.scheduler.pool") == "wl-a")
    }
    assert(spark.sparkContext.getLocalProperty("spark.scheduler.pool") == null)
  }
}
