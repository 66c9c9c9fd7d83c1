package graft.ann

import org.scalatest.funsuite.AnyFunSuite

/** The pure statistics both calibrators share ([[Calibration]]): mean /
  * stderr, LCB selection semantics, and ladder construction — unit-level
  * pins for the edge cases the integration specs exercise only
  * implicitly. */
class CalibrationSpec extends AnyFunSuite {

  test("meanSe: mean and standard error of the mean; degenerate cases") {
    val (m, se) = Calibration.meanSe(Seq(0.8, 1.0, 0.9, 0.9))
    assert(math.abs(m - 0.9) < 1e-12)
    // sd = sqrt(sum((x-0.9)^2)/3) = sqrt(0.02/3); se = sd/2
    assert(math.abs(se - math.sqrt(0.02 / 3) / 2) < 1e-12)
    // a single sample has undefined spread — se must come out 0, not NaN
    val (m1, se1) = Calibration.meanSe(Seq(0.7))
    assert(m1 == 0.7 && se1 == 0.0)
    // identical samples: zero spread
    assert(Calibration.meanSe(Seq(1.0, 1.0, 1.0))._2 == 0.0)
  }

  test("workload fingerprint is CONTENT-addressed: partitioning/lineage never changes the sample or the stamp (round-16 advice)") {
    val s = graft.TestFixtures.spark
    import s.implicits._
    val base = (0 until 500).map(i =>
      Tuple1(Array.tabulate(8)(d => (i * 31 + d).toFloat / 7f).toSeq))
    val df = base.toDF("qv")
    val a = RoutedAnnIndex.workloadFingerprintOf(df, "qv")
    // the same logical content through ANY layout: repartitioned,
    // single-partition, shuffled row order — identical stamp (the old
    // takeSample draw made each a spurious mismatch; under
    // strictCalibrationReuse that forced a recalibration per statement)
    assert(a == RoutedAnnIndex.workloadFingerprintOf(df.repartition(13), "qv"))
    assert(a == RoutedAnnIndex.workloadFingerprintOf(df.coalesce(1), "qv"))
    assert(a == RoutedAnnIndex.workloadFingerprintOf(
      scala.util.Random.shuffle(base).toDF("qv"), "qv"))
    // content changes DO change it
    val bumped = base.map(t => Tuple1(t._1.map(_ + 1f)))
    assert(a != RoutedAnnIndex.workloadFingerprintOf(bumped.toDF("qv"), "qv"))
    // the fold itself is order-insensitive (belt and braces: two sites
    // enumerating one sample differently still agree)
    val vs = Array(Array(1f, 2f), Array(3f, 4f), Array(5f, 6f))
    assert(RoutedAnnIndex.sampleFingerprint(vs) ==
      RoutedAnnIndex.sampleFingerprint(vs.reverse))
    // ...but a different SET still changes the fold
    assert(RoutedAnnIndex.sampleFingerprint(vs) !=
      RoutedAnnIndex.sampleFingerprint(vs.take(2)))
  }

  test("selfSample is content-addressed too: same rows in any partitioning draw the same sample") {
    val s = graft.TestFixtures.spark
    val rows = (0L until 300L).map(id =>
      (id * 7919L, Array.tabulate(4)(d => (id + d).toFloat)))
    val a = Calibration.selfSample(s.sparkContext.parallelize(rows, 3), 16, 7L)
    val b = Calibration.selfSample(
      s.sparkContext.parallelize(scala.util.Random.shuffle(rows), 11), 16, 7L)
    assert(a.map(_._1).toSeq == b.map(_._1).toSeq,
      "the drawn ids must not depend on partitioning")
    // a different seed draws a different sample (the seed still means something)
    val c = Calibration.selfSample(s.sparkContext.parallelize(rows, 3), 16, 8L)
    assert(a.map(_._1).toSeq != c.map(_._1).toSeq)
  }

  test("select: LCB vs raw-mean floors, exhaustive fallbacks, 1.0 certification") {
    val curve = Seq((1, 0.50, 0.02), (4, 0.90, 0.01), (16, 0.99, 0.001))
    // raw mean: smallest point meeting the target
    assert(Calibration.select(curve, 0.90, conservative = false, 64) == 4)
    // LCB: 0.90 - 1.645*0.01 = 0.88355 < 0.90 -> the 4-point no longer
    // qualifies; 0.99 - 1.645*0.001 ~= 0.9884 >= 0.90 -> 16
    assert(Calibration.select(curve, 0.90, conservative = true, 64) == 16)
    // a target above every point falls back to exhaustive (floor, not budget)
    assert(Calibration.select(curve, 0.995, conservative = false, 64) == 64)
    // uncalibrated = exhaustive
    assert(Calibration.select(Nil, 0.5, conservative = true, 8) == 8)
    // 1.0 is certification: ALWAYS exhaustive, even with a measured 1.0±0
    val perfect = Seq((2, 1.0, 0.0), (8, 1.0, 0.0))
    assert(Calibration.select(perfect, 1.0, conservative = true, 8) == 8)
    assert(Calibration.select(perfect, 1.0, conservative = false, 8) == 8)
    // but 0.999... selects off the curve normally
    assert(Calibration.select(perfect, 0.999, conservative = true, 8) == 2)
    // out-of-range targets are caller errors
    intercept[IllegalArgumentException] {
      Calibration.select(curve, 0.0, conservative = true, 64) }
    intercept[IllegalArgumentException] {
      Calibration.select(curve, 1.5, conservative = true, 64) }
    // an unsorted curve is still searched in ascending-probes order
    assert(Calibration.select(curve.reverse, 0.90, conservative = false, 64) == 4)
  }

  test("ladder: powers of two topped with max; explicit points filtered, never clamped") {
    assert(Calibration.ladder(Nil, 64) == Seq(1, 2, 4, 8, 16, 32, 64))
    assert(Calibration.ladder(Nil, 1) == Seq(1))
    // max is always measured exactly once, even when explicit includes it
    assert(Calibration.ladder(Seq(4, 16, 64), 64) == Seq(4, 16, 64))
    // out-of-range explicit points are DROPPED (documented; not clamped)
    assert(Calibration.ladder(Seq(0, 128, 7), 16) == Seq(7, 16))
    // duplicates collapse, order normalizes
    assert(Calibration.ladder(Seq(8, 2, 8), 16) == Seq(2, 8, 16))
  }
}
