package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the round driver's smoke checks on the SparkEntry contract. */
class EntrySpec extends AnyFunSuite with SparkTestSession {

  test("entry returns rows on sf0.001 (driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key is a registered query; names are unique") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os.diff(qs)}")
    assert(Queries.all.map(_.name).distinct.size == Queries.all.size)
    // every gated query currently has a full-strength oracle
    assert(os == qs, s"rows-only-checked queries: ${qs.diff(os)}")
  }
}
