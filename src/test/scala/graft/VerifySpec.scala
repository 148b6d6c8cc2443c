package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Verify failure discipline: a query that throws must leave a
  * loud trail (errors.json entry + empty marker dir), never a silently
  * missing output row — the round-11 coverage-shrink trap.
  */
class VerifySpec extends AnyFunSuite with SparkTestSession {

  test("a failing query yields an errors.json entry and an empty marker dir") {
    val out = TmpDirs.fresh("verify-spec")
    val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
      "ok_query" -> ((s, _) => s.range(3).toDF("id")),
      "boom_query" -> ((_, _) => throw new RuntimeException("injected failure")))
    val errors = Verify.runQueries(spark, queries, "/unused", out)

    assert(errors.keySet == Set("boom_query"))
    assert(errors("boom_query").contains("injected failure"))

    val markerDir = new java.io.File(s"$out/boom_query")
    assert(markerDir.isDirectory, "failed query must leave a marker dir")
    assert(!markerDir.list().exists(_.endsWith(".parquet")),
      "marker dir must carry no parquet (compare reads it as missing)")

    val okFiles = new java.io.File(s"$out/ok_query").list()
    assert(okFiles.exists(_.endsWith(".parquet")))

    val errJson = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/errors.json"))
    assert(errJson.contains("\"boom_query\""))
    assert(errJson.contains("injected failure"))
    assert(!errJson.contains("ok_query"))
  }

  test("README registry count matches Queries.all (the r15 drift rule)") {
    // Counting by hand drifted twice in r15; the README's "(N queries)"
    // line is now pinned to the registry so a drifted doc fails the suite.
    val readme = java.nio.file.Files.readString(
      java.nio.file.Paths.get("README.md"))
    val m = """registry of all gated QuerySpecs \((\d+) queries\)""".r
      .findFirstMatchIn(readme)
    assert(m.isDefined, "README lost its registry-count line")
    assert(m.get.group(1).toInt == Queries.all.size,
      s"README says ${m.get.group(1)} queries; registry has ${Queries.all.size}")
    // and the registry itself must be duplicate-free
    val dup = Queries.all.groupBy(_.name).filter(_._2.size > 1).keys
    assert(dup.isEmpty, s"duplicate query names: $dup")
  }

  test("SURVEY.md §8 names every gated query (the r16 drift rule)") {
    // The §8 heading label drifted two rounds running; make the doc's
    // CONTENT mechanical instead: every registered query name must
    // appear literally somewhere in SURVEY.md, so adding a gated query
    // without its implementation-map row fails the suite.
    val survey = java.nio.file.Files.readString(
      java.nio.file.Paths.get("SURVEY.md"))
    val missing = Queries.all.map(_.name).filterNot(survey.contains)
    assert(missing.isEmpty,
      s"gated queries absent from SURVEY.md: ${missing.mkString(", ")}")
  }

  test("an all-green run writes an empty errors.json") {
    val out = TmpDirs.fresh("verify-spec-green")
    val errors = Verify.runQueries(
      spark, Map("only" -> ((s: SparkSession, _: String) => s.range(1).toDF("id"))),
      "/unused", out)
    assert(errors.isEmpty)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/errors.json")) == "{}")
  }
}

private object TmpDirs {
  def fresh(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
