package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** Pins the data-driven A/B carry panel (round-17, VERDICT r16 #1): the
  * carry list lives in the committed BENCH_CARRY.json artifact, not in
  * source, so each round's driver-flagged movers are carried by editing
  * data — and a missing/malformed artifact degrades loudly to an empty
  * panel instead of aborting the A/B run. */
class BenchCarrySpec extends AnyFunSuite {

  private def tmpJson(content: String): Path = {
    val p = Files.createTempFile("bench-carry", ".json")
    Files.writeString(p, content)
    p.toFile.deleteOnExit()
    p
  }

  test("reads the carry array from a well-formed artifact") {
    val p = tmpJson(
      """{"round": 17, "source": "spec", "carry": ["a_q", " b_q ", ""]}""")
    assert(Bench.carryFromArtifact(p.toString) === Seq("a_q", "b_q"))
  }

  test("missing file degrades to an empty panel, never throws") {
    assert(Bench.carryFromArtifact("/nonexistent/BENCH_CARRY.json") === Seq.empty)
  }

  test("malformed json / wrong shape degrade to an empty panel") {
    assert(Bench.carryFromArtifact(tmpJson("{not json").toString) === Seq.empty)
    assert(Bench.carryFromArtifact(
      tmpJson("""{"carry": "not-an-array"}""").toString) === Seq.empty)
    assert(Bench.carryFromArtifact(
      tmpJson("""{"carry": [1, 2]}""").toString) === Seq.empty)
  }

  test("the committed repo artifact parses and carries the flagged movers") {
    // run from the repo root under sbt — the same resolution Bench uses.
    // The carry CONTENTS rotate each round (the verdict's flagged movers
    // replace the previous round's — r18 carries r17's routed_scan /
    // kdtree_filtered_large / set_counts); this pin asserts the artifact
    // stays parseable and canary-bearing, not any one round's list.
    val carried = Bench.carryFromArtifact("BENCH_CARRY.json")
    assert(carried.nonEmpty, "BENCH_CARRY.json must exist at the repo root")
    // every carried name must be a real registered query, else the panel
    // filter silently drops it and the canary never runs
    val known = SparkEntry.queries.keySet
    assert(carried.toSet.subsetOf(known),
      s"unknown queries in BENCH_CARRY.json: ${carried.filterNot(known)}")
  }
}
