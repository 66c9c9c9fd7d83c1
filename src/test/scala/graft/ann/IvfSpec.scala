package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures._
import graft.types.Algorithm

class IvfSpec extends AnyFunSuite {
  import spark.implicits._

  private val Dim = 16
  private lazy val (ids, vecs, gen) = siftLikeDataset(seed = 99L, n = 2000, dim = Dim)
  private lazy val df = ids.zip(vecs).toSeq
    .map { case (i, v) => (i, v) }.toDF("id", "key").cache()

  test("nProbe = nCells is exactly the linear scan") {
    val ivf = IvfIndex.build(df, nCells = 8, iters = 2)
    for (qi <- 0 until 10) {
      val q = gen((2000 + qi).toLong)
      val got = ivf.search(q, 10, nProbe = 8)
        .select("id").collect().map(_.getLong(0)).toSeq
      val exp = bruteTopK(Algorithm.EuclideanDistance, ids, vecs, q, 10).map(_._1)
      assert(got == exp, s"query $qi")
    }
    ivf.unpersist()
  }

  test("small nProbe keeps high recall on clustered data, scans fewer rows") {
    val ivf = IvfIndex.build(df, nCells = 16, iters = 3)
    var hits = 0; var total = 0
    for (qi <- 0 until 25) {
      val q = gen((3000 + qi).toLong)
      val got = ivf.search(q, 10, nProbe = 4).select("id")
        .collect().map(_.getLong(0)).toSet
      val exp = bruteTopK(Algorithm.EuclideanDistance, ids, vecs, q, 10).map(_._1)
      hits += exp.count(got.contains); total += exp.size
    }
    val recall = hits.toDouble / total
    assert(recall >= 0.8, s"recall@10 with nProbe=4/16 = $recall")
    // probed fraction actually prunes: 4 of 16 cells
    val q0 = gen(3000L)
    val probed = ivf.probeCells(q0, 4)
    assert(probed.size == 4 && probed.distinct.size == 4)
    ivf.unpersist()
  }

  test("topKJoin: nProbe = nCells matches brute force; pruned probes keep recall") {
    val ivf = IvfIndex.build(df, nCells = 16, iters = 3)
    val queries = (0 until 25).map(qi => ((5000 + qi).toLong, gen((5000 + qi).toLong)))
    val qDf = queries.toDF("qid", "qv")
    // exact arm
    val exact = ivf.topKJoin(qDf, "qid", "qv", k = 10, nProbe = 16)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq }
    queries.foreach { case (qid, qv) =>
      val exp = bruteTopK(Algorithm.EuclideanDistance, ids, vecs, qv, 10).map(_._1)
      assert(exact(qid) == exp, s"exact join mismatch for query $qid")
    }
    // pruned arm: recall over the batch
    val pruned = ivf.topKJoin(qDf, "qid", "qv", k = 10, nProbe = 4)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    var hits = 0; var total = 0
    queries.foreach { case (qid, qv) =>
      val exp = bruteTopK(Algorithm.EuclideanDistance, ids, vecs, qv, 10).map(_._1)
      hits += exp.count(pruned.getOrElse(qid, Set.empty).contains); total += exp.size
    }
    val recall = hits.toDouble / total
    assert(recall >= 0.8, s"join recall@10 with nProbe=4/16 = $recall")
    ivf.unpersist()
  }

  test("build is deterministic (same data → same centroids → same results)") {
    val a = IvfIndex.build(df, nCells = 8, iters = 2)
    val b = IvfIndex.build(df, nCells = 8, iters = 2)
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq)
    val q = gen(5000L)
    assert(a.search(q, 5, 2).select("id").collect().toSeq ==
      b.search(q, 5, 2).select("id").collect().toSeq)
    a.unpersist(); b.unpersist()
  }

  test("calibrate: measured nProbe curve with LCB floor selection; curve rides the manifest") {
    val ivf = IvfIndex.build(df, nCells = 16, iters = 3)
    val cal = ivf.calibrate(nQueries = 32, k = 10, seed = 9L)
    val curve = cal.recallCurve.toSeq
    assert(curve.nonEmpty && curve.map(_._1) == curve.map(_._1).sorted)
    // IVF exhaustive is EXACT by construction — the top point is 1.0 ± 0
    assert(curve.last._1 == 16 && curve.last._2 == 1.0 && curve.last._3 == 0.0)
    curve.sliding(2).foreach {
      case Seq((pa, a, _), (pb, b, _)) =>
        assert(b >= a - 0.05, f"recall fell $a%.4f -> $b%.4f at $pa -> $pb")
      case _ => ()
    }
    // floor semantics: conservative never picks fewer probes than raw
    val raw = cal.nProbeFor(0.9, conservative = false)
    assert(cal.nProbeFor(0.9) >= raw)
    assert(curve.find(_._2 >= 0.9).map(_._1).contains(raw))
    // certification target and the uncalibrated fallback are exhaustive
    assert(cal.nProbeFor(1.0) == 16)
    assert(ivf.nProbeFor(0.5) == 16)
    // the curve knows its k (reuse provenance — Pipeline checks it)
    assert(cal.recallK == 10 && ivf.recallK == 0)
    // external-sample mode measures the supplied workload
    val wdf = (0 until 16).map(i => ((9000 + i).toLong, gen((9000 + i).toLong)))
      .toDF("wid", "wv")
    val calW = ivf.calibrate(nQueries = 16, k = 10, seed = 9L,
      queries = Some(wdf), qVecCol = "wv")
    assert(calW.recallCurve.nonEmpty && calW.recallCurve.last._2 == 1.0)
    // quantized-arm calibration measures THROUGH the SQ8 shortlist, so
    // quantization + shortlist error is PRICED IN: on this euclidean
    // corpus the exhaustive point reads ~0.62 where the exact arm reads
    // 1.0 — exactly the gap that made exact-arm curves over-promise for
    // QUANTIZED statements (the bug this mode fixes). Assert the
    // structural facts, not a corpus-specific bar: the quantized curve
    // never exceeds the exact curve at any shared point, and the error
    // it surfaces is real (strictly below 1.0 here)
    val calQ = ivf.calibrate(nQueries = 16, k = 10, seed = 9L,
      quantizedShortlist = Some(200))
    assert(calQ.recallCurve.nonEmpty)
    val exactByP = curve.map(c => c._1 -> c._2).toMap
    calQ.recallCurve.foreach { case (p, r, _) =>
      exactByP.get(p).foreach(er => assert(r <= er + 1e-9,
        f"quantized-arm recall $r%.4f exceeds exact-arm $er%.4f at nProbe=$p"))
    }
    assert(calQ.recallCurve.last._2 < 1.0,
      "the SQ8 arm's error must show in its curve (exact arm reads 1.0)")
    // curve persists: manifest-only save, loaded index carries it + its k
    val dir = java.nio.file.Files.createTempDirectory("ivf-cal").toString
    IvfIndex.save(cal, dir, "cal-stamp")
    val loaded = IvfIndex.load(spark, dir, cal.metric, "cal-stamp")
    assert(loaded.exists(_.recallCurve.toSeq == curve),
      "curve must round-trip bit-exactly through the IVF manifest")
    assert(loaded.exists(_.recallK == 10), "recallK must round-trip")
    loaded.foreach(_.unpersist())
    ivf.unpersist()
  }
}
