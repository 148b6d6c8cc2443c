package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck laws for the pure (no-Spark) kernels: randomized inputs
  * beyond the seeded corpora in the ScalaTest specs. The naive models
  * here are built ON PolyHash.hash (itself pinned against a naive fold in
  * PolyHashSpec), so these check the windowing/distinct logic of the
  * array expressions, not the hash again.
  */
object PureLawsProps extends Properties("graft.pure") {

  private val textGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.const(' '))).map(_.mkString)

  property("polyhash stays in [0, P)") = Prop.forAll { (s: String) =>
    val h = PolyHash.hash(s)
    h >= 0 && h < PolyHash.P
  }

  property("charNgramHashes = distinct hashes of sliding code-point windows") =
    Prop.forAll(textGen, Gen.choose(1, 5)) { (s, n) =>
      val cps = s.codePoints().toArray
      val expected = (0 to cps.length - n)
        .map(i => PolyHash.hash(new String(cps, i, n))).distinct
      TextHashes.charNgramHashes(s, n).toLongArray().toSeq == expected
    }

  property("wordShingleHashes = distinct hashes of k-word windows") =
    Prop.forAll(textGen, Gen.choose(1, 4)) { (s, k) =>
      val toks = s.split(" ", -1)
      val expected = toks.sliding(k).filter(_.length == k)
        .map(w => PolyHash.hash(w.mkString(" "))).toSeq.distinct
      TextHashes.wordShingleHashes(s, k).toLongArray().toSeq == expected
    }

  property("wordShingles = ALL k-word windows in order, duplicates kept") =
    Prop.forAll(textGen, Gen.choose(1, 4)) { (s, k) =>
      val toks = s.split(" ", -1)
      val expected = toks.sliding(k).filter(_.length == k)
        .map(_.mkString(" ")).toSeq
      TextHashes.wordShingles(s, k).toArray[AnyRef](
        org.apache.spark.sql.types.StringType).toSeq.map(_.toString) == expected
    }

  property("quantizeValue round-trips integers exactly") =
    Prop.forAll(Gen.choose(-1000000L, 1000000L)) { micros =>
      VectorOps.quantizeValue(micros.toDouble / 1000000.0) == micros
    }

  property("resizeFit: fits the box, never upscales, idempotent") =
    Prop.forAll(Gen.choose(0L, 4000L), Gen.choose(0L, 4000L)) { (w, h) =>
      import graft.operators.Multimodal.resizeFit
      val (ow, oh) = resizeFit(w, h, 320L, 240L)
      ow <= 320 && oh <= 240 &&
        ow <= w && oh <= h &&
        resizeFit(ow, oh, 320L, 240L) == ((ow, oh))
    }

  property("PPM encode->parse round-trips every frame and pixel byte") =
    Prop.forAll(
      Gen.choose(1, 8), Gen.choose(1, 8),
      Gen.choose(1, 3), Gen.long) { (w, h, nFrames, seed) =>
      import graft.operators.Ppm
      val rnd = new scala.util.Random(seed)
      val frames = Seq.fill(nFrames)(
        Array.fill(w * h * 3)(rnd.nextInt(256).toByte))
      val payload = Array.concat(frames.map(Ppm.encodeFrame(w, h, _)): _*)
      val parsed = Ppm.frames(payload)
      parsed.length == nFrames &&
        parsed.forall(f => f.width == w && f.height == h) &&
        parsed.zip(frames).forall { case (f, rgb) =>
          payload.slice(f.offset, f.offset + f.length).sameElements(rgb)
        }
    }

  property("workload diff laws hold for arbitrary sets") =
    Prop.forAll(Gen.listOf(Gen.choose(0, 30)), Gen.listOf(Gen.choose(0, 30))) {
      (req, ex) =>
        import graft.streaming.{Workload, WorkloadReport}
        val requested = req.map(n => Workload(s"w$n", s"t$n", 1)).toSet
        val existing = ex.map(n => s"w$n").toSet
        val rep = WorkloadReport(requested, existing)
        val starts = rep.workloadsToStart.map(_.workloadName)
        val stops = rep.workloadsToDelete
        starts.intersect(existing).isEmpty &&
          stops.intersect(requested.map(_.workloadName)).isEmpty &&
          existing.diff(stops).subsetOf(requested.map(_.workloadName))
    }
}
