package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures._
import graft.types.{Algorithm, NonLinearConfig}

/**
 * The recallTarget SERVING rule ([[AnnSearch.effectiveProbes]] — the
 * round-13 advice fix, pinned directly): a calibrated curve answers only
 * on its measured operating point (unfiltered, n ≤ recallK); off it the
 * floor guarantee widens to exhaustive probes instead of silently
 * under-delivering.
 */
class AnnSearchSpec extends AnyFunSuite {

  private val Dim = 16
  private val Shards = 4
  private lazy val (ids, vecs, _) = siftLikeDataset(seed = 31L, n = 600, dim = Dim)

  private val hnsw = NonLinearConfig.HNSWConfig(efSearch = 64,
    metric = Algorithm.CosineSimilarity)

  private lazy val calibrated: RoutedAnnIndex = {
    val s = spark
    import s.implicits._
    val df = ids.indices.map(i => (ids(i), vecs(i).toSeq)).toDF("id", "key")
    RoutedAnnIndex.build(df, Dim, hnsw, numShards = Shards, iters = 2)
      .calibrate(nQueries = 16, k = 5, ladderIn = Seq(1, 2))
  }

  test("effectiveProbes: raw probes without a target; curve on the operating point; widen off it") {
    val raw = NonLinearConfig.RoutedHNSWConfig(hnsw = hnsw,
      numShards = Shards, probes = 2)
    // no recallTarget: the raw knob, filtered or not
    assert(AnnSearch.effectiveProbes(raw, calibrated, 3, filtered = false) == 2)
    assert(AnnSearch.effectiveProbes(raw, calibrated, 3, filtered = true) == 2)
    val targeted = raw.copy(recallTarget = Some(0.5))
    assert(calibrated.recallK == 5)
    // ON the operating point (unfiltered, n <= recallK): curve-selected
    val fromCurve = calibrated.probesFor(0.5)
    assert(AnnSearch.effectiveProbes(targeted, calibrated, 5, filtered = false)
      == fromCurve)
    // n > recallK: recall@n < recall@recallK at fixed probes — widen
    assert(AnnSearch.effectiveProbes(targeted, calibrated, 6, filtered = false)
      == calibrated.numShards)
    // any predicate filter: the curve was measured unfiltered — widen
    assert(AnnSearch.effectiveProbes(targeted, calibrated, 3, filtered = true)
      == calibrated.numShards)
  }

  test("effectiveProbes: uncalibrated index or a 1.0 target serve exhaustively (probesFor's floor rule)") {
    val s = spark
    import s.implicits._
    val df = ids.indices.take(200).map(i => (ids(i), vecs(i).toSeq)).toDF("id", "key")
    val uncal = RoutedAnnIndex.build(df, Dim, hnsw, numShards = Shards, iters = 2)
    try {
      val targeted = NonLinearConfig.RoutedHNSWConfig(hnsw = hnsw,
        numShards = Shards, probes = 1, recallTarget = Some(0.5))
      assert(AnnSearch.effectiveProbes(targeted, uncal, 3, filtered = false)
        == uncal.numShards, "uncalibrated must fall back to exhaustive")
      val certify = targeted.copy(recallTarget = Some(1.0))
      assert(AnnSearch.effectiveProbes(certify, calibrated, 3, filtered = false)
        == calibrated.numShards, "a 1.0 target is always exhaustive")
    } finally uncal.unpersist()
  }
}
