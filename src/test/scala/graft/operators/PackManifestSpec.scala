package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q140's manifest invariants at a scale where documents actually
  * straddle sequence cuts (sf0.1: ~14k tokens per source stream → 4+
  * sequences each; sf0.01's streams all fit in one sequence, so the
  * oracle gate alone would leave the straddle path untested).
  */
class PackManifestSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.1"

  test("manifest tiles every non-final sequence to exactly the budget") {
    val m = Corpus.qPackManifest.build(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // at least one document must straddle a cut (appear in 2+ sequences)
    val perDoc = m.groupBy(r => (r._1, r._3)).values.map(_.length)
    assert(perDoc.exists(_ > 1), "no straddling doc — the explode is untested")
    // every slice is positive and inside the budget window
    m.foreach { case (_, _, id, off, len) =>
      assert(len > 0L && len <= 4096L, s"doc $id slice length $len")
      assert(off >= 0L && off < 4096L, s"doc $id offset $off")
    }
    // per (source, seq): slices tile [0, 4096) exactly for non-final
    // sequences, and a prefix [0, k) for the final one
    m.groupBy(r => (r._1, r._2)).foreach { case ((src, seq), rows) =>
      val lastSeq = m.filter(_._1 == src).map(_._2).max
      val tot = rows.map(_._5).sum
      if (seq < lastSeq)
        assert(tot == 4096L, s"($src, $seq) tiles $tot of 4096")
      else assert(tot <= 4096L, s"($src, $seq) final overflow $tot")
      // slices are disjoint and contiguous from offset 0
      val sorted = rows.sortBy(_._4)
      assert(sorted.head._4 == 0L, s"($src, $seq) does not start at 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 + a._5 == b._4, s"($src, $seq) gap after doc ${a._3}")
        case _ => ()
      }
    }
    // slice lengths per doc reassemble the doc's token count
    val docTok = graft.Tables.load(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    m.groupBy(r => (r._1, r._3)).foreach { case ((src, id), rows) =>
      assert(rows.map(_._5).sum == docTok((src, id)),
        s"doc $id slices do not reassemble its tokens")
    }
  }
}
