package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins that q98's CDC apply is non-vacuous on the gate corpus: every
  * outcome class occurs (kept / updated / inserted), latest-op deletes
  * actually remove base keys, and a delete of an absent key is a no-op
  * (absent keys never surface). The oracle hash-gates the VALUES; this
  * pins the semantics stay exercised if the corpus shifts.
  */
class CdcApplySpec extends AnyFunSuite with SparkTestSession {
  private val dir = "/root/testdata/sf0.01"

  test("all merge outcome classes are exercised; deletes remove keys") {
    assume(new java.io.File(dir).exists(), s"$dir not present")
    val out = Temporal.qCdcApply.build(spark, dir).collect()
    val bySrc = out.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(bySrc.keySet == Set("kept", "updated", "inserted"),
      s"missing outcome class: $bySrc")
    assert(bySrc.values.forall(_ > 0))
    // latest-op 'error' on an in-base key ⇒ that key is absent downstream
    import org.apache.spark.sql.functions._
    val deleted = graft.Tables.load(spark, dir, "events")
      .select(col("user_id").as("k"),
        (col("event_type") === "error").as("d"),
        unix_micros(col("ts")).as("tus"), col("event_id"))
      .groupBy(col("k"))
      .agg(max_by(col("d"), struct(col("tus"), col("event_id"))).as("del"))
      .filter(col("del") && col("k") % 3 =!= 0)
      .collect().map(_.getLong(0)).toSet
    assert(deleted.nonEmpty, "gate corpus lost its delete coverage")
    val outKeys = out.map(_.getLong(0)).toSet
    assert(deleted.forall(k => !outKeys.contains(k)),
      "a deleted key survived the merge")
  }

}
