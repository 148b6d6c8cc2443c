package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The union+window as-of join and the lag/cumsum sessionization are the
  * subtle plan shapes in Temporal — pin them to brute-force reference
  * implementations over the real sf0.001 tables.
  */
class TemporalSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("as-of join matches the brute-force point-in-time lookup") {
    val got = Temporal.qAsofJoin.build(spark, dir).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap

    val events = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("tus"),
        col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)

    assert(events.nonEmpty && got.size == events.length)
    events.foreach { case (eid, uid, tus) =>
      val cands = orders.getOrElse(uid, Array.empty).filter(_._2 <= tus)
      val expected =
        if (cands.isEmpty) None
        else {
          val tMax = cands.map(_._2).max
          Some(cands.filter(_._2 == tMax).map(_._3).max)
        }
      assert(got(eid) == expected, s"event $eid user $uid")
    }
  }

  test("sessionization matches the brute-force gap splitter") {
    val got = Temporal.qSessionize.build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

    val gapUs = 30L * 60 * 1000000
    val byUser = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)

    val expected = byUser.flatMap { case (uid, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      var seq = 0L
      var prev = Long.MinValue
      val sessions = scala.collection.mutable.Map[Long, List[(Long, Long)]]()
      sorted.foreach { case (_, eid, tus) =>
        if (prev == Long.MinValue || tus - prev > gapUs) seq += 1
        prev = tus
        sessions(seq) = (eid, tus) :: sessions.getOrElse(seq, Nil)
      }
      sessions.map { case (s, es) =>
        (uid, s) -> (es.size.toLong, es.map(_._1).min, es.map(_._2).min)
      }
    }
    assert(got == expected)
  }
}
