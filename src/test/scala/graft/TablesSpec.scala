package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the post-`Tables.load` dtype of every testdata table.
  *
  * The driver regenerates `/root/testdata` between rounds and has already
  * shipped `events.ts` under two different parquet encodings
  * (TIMESTAMP(NANOS) read as LongType, and TIMESTAMP_NTZ(MICROS)).
  * `Tables.load` normalizes either to a single `ts: TIMESTAMP` contract;
  * this spec makes the NEXT encoding shift fail in seconds instead of
  * silently breaking a slice of the gated query surface mid-round.
  */
class TablesSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def loaded(table: String): Seq[(String, String)] =
    Tables.load(spark, dir, table).schema.fields.toSeq
      .map(f => f.name -> f.dataType.simpleString)

  val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq(
      "n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"),
    "customer" -> Seq(
      "c_custkey" -> "bigint", "c_name" -> "string", "c_nationkey" -> "int",
      "c_acctbal" -> "double", "c_mktsegment" -> "string"),
    "supplier" -> Seq(
      "s_suppkey" -> "bigint", "s_name" -> "string", "s_nationkey" -> "int",
      "s_acctbal" -> "double"),
    "part" -> Seq(
      "p_partkey" -> "bigint", "p_name" -> "string", "p_brand" -> "string",
      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double"),
    "orders" -> Seq(
      "o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq(
      "l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    // ts MUST come out as plain TIMESTAMP whatever the file encodes —
    // that is the whole point of the loader's normalization branches.
    "events" -> Seq(
      "event_id" -> "bigint", "ts" -> "timestamp", "user_id" -> "bigint",
      "event_type" -> "string", "value" -> "double", "props" -> "string"),
    "documents" -> Seq(
      "doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq(
      "vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int"))

  test("Tables.names covers exactly the pinned tables") {
    assert(Tables.names.toSet == expected.keySet)
  }

  for (table <- Tables.names)
    test(s"$table loads with the pinned schema") {
      assert(loaded(table) == expected(table))
    }
}
