package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PayloadsSpec extends AnyFunSuite with SparkTestSession {

  test("JSON round-trip is the identity on payloads (seeded samples)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val payloads = (1 to 100).map(_ =>
      Payloads.Payload(rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString,
        rnd.nextInt(1000)))
    val back = payloads.toDS().toDF()
      .select(Payloads.encodeJson(col("name"), col("numPublishes")).as("json"))
      .select(Payloads.decodeJson(col("json")).as("p"))
      .select(col("p.name"), col("p.numPublishes"))
      .as[Payloads.Payload].collect().toSeq
    assert(back == payloads)
  }

  test("republish increments numPublishes by exactly one per hop (F3)") {
    import spark.implicits._
    val hops = Seq(0, 1, 41).toDF("numPublishes")
      .select(Payloads.republishHop(col("numPublishes")).as("n"))
      .as[Int].collect().toSeq
    assert(hops == Seq(1, 2, 42))
  }

  test("topic normalization strips exactly the -partition-0 suffix (F4)") {
    import spark.implicits._
    val got = Seq("t-partition-0", "t", "t-partition-01", "x-partition-0-partition-0")
      .toDF("t").select(Payloads.normalizeTopic(col("t")).as("n"))
      .as[String].collect().toSeq
    assert(got == Seq("t", "t", "t-partition-01", "x-partition-0"))
  }
}
