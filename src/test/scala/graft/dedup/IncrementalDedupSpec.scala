package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures.spark

/** The persisted-index incremental dedup contract: batch-vs-index results
  * must agree with the in-process MinHash join run over the union, the
  * index must survive save/load/append, and config mismatches must refuse
  * to load. */
class IncrementalDedupSpec extends AnyFunSuite {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("mh-index").toString

  private lazy val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "completely different content about spark catalyst optimizer rules"),
    (2L, "large language models need deduplicated training corpora to work"),
    (3L, "partition pruning keeps the scan cost proportional to the probes"))
    .toDF("doc_id", "text").cache()

  private lazy val batch = Seq(
    (100L, "the quick brown fox jumps over the lazy dog again and again today"),
    (101L, "large language models need deduplicated training corpora to work well"),
    (102L, "entirely novel text that matches nothing in the historical index"))
    .toDF("doc_id", "text").cache()

  test("dedupAgainst agrees with the in-process join over the union") {
    val dir = tmp()
    val idx = IncrementalDedup.buildIndex(corpus, "doc_id", "text", dir, "v1")
    val got = IncrementalDedup.dedupAgainst(idx, batch, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // reference: the in-process join over corpus ∪ batch, cross pairs only
    val ref = Dedup.minHashLshJoin(corpus.union(batch), "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => (a >= 100) != (b >= 100) }
      .map { case (a, b, j) => if (a >= 100) (a, b, j) else (b, a, j) }.toSet
    assert(got == ref)
    assert(got.map { case (a, b, _) => (a, b) } == Set((100L, 0L), (101L, 2L)))
  }

  test("append folds a batch in; the next batch dedups against history + it") {
    val dir = tmp()
    val idx0 = IncrementalDedup.buildIndex(corpus, "doc_id", "text", dir, "v1")
    val idx1 = IncrementalDedup.append(idx0, batch, "doc_id", "text", "batch-1")
    assert(idx1.sourceStamps == Seq("v1", "batch-1"))
    // a second batch near-dups doc 102 (which only exists in batch 1) and
    // doc 3 (corpus) — both must surface from the SAME index
    val batch2 = Seq(
      (200L, "entirely novel text that matches nothing in the historical index at all"),
      (201L, "partition pruning keeps the scan cost proportional to the probes here"))
      .toDF("doc_id", "text")
    val got = IncrementalDedup.dedupAgainst(idx1, batch2, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((200L, 102L), (201L, 3L)))
    // reloading from disk sees both stamps and the same answer
    val reloaded = IncrementalDedup.load(spark, dir).get
    assert(reloaded.sourceStamps == Seq("v1", "batch-1"))
    val again = IncrementalDedup.dedupAgainst(reloaded, batch2, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == got)
  }

  test("load refuses config mismatches and missing manifests") {
    val dir = tmp()
    IncrementalDedup.buildIndex(corpus, "doc_id", "text", dir, "v1",
      n = 3, numHashes = 16)
    assert(IncrementalDedup.load(spark, dir, n = 3, numHashes = 16).isDefined)
    assert(IncrementalDedup.load(spark, dir, n = 4, numHashes = 16).isEmpty)
    assert(IncrementalDedup.load(spark, dir, n = 3, numHashes = 8).isEmpty)
    assert(IncrementalDedup.load(spark, tmp()).isEmpty)
    // buildOrLoad with matching config must NOT rebuild (same stamp list)
    val idx = IncrementalDedup.buildOrLoad(corpus, "doc_id", "text", dir, "v2")
    assert(idx.sourceStamps == Seq("v1"))
  }

  test("load refuses a torn write (on-disk rows mismatch the manifest counts)") {
    val dir = tmp()
    IncrementalDedup.buildIndex(corpus, "doc_id", "text", dir, "v1")
    assert(IncrementalDedup.load(spark, dir).isDefined)
    // simulate a crash between the bands append and the sets append: some
    // sets rows are missing relative to what the manifest recorded —
    // probing such an index would silently drop candidates at the sets
    // equi-join, so load must refuse (None-means-rebuild)
    val setsDir = java.nio.file.Paths.get(dir, "sets")
    val part = java.nio.file.Files.list(setsDir)
      .filter(p => p.getFileName.toString.startsWith("part-"))
      .findFirst.get
    java.nio.file.Files.delete(part)
    assert(IncrementalDedup.load(spark, dir).isEmpty)
  }

  test("band values in the persisted index match the streaming signature") {
    // the per-row minHashSignature is the streaming twin — index bands must
    // carry exactly those values so a streaming prefilter can probe them
    val dir = tmp()
    val idx = IncrementalDedup.buildIndex(corpus, "doc_id", "text", dir, "v1")
    val fromIndex = idx.bands.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val sigs = corpus.select(col("doc_id"),
        Dedup.minHashSignature(col("text"), 3).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    sigs.foreach { case (id, sig) =>
      sig.zipWithIndex.foreach { case (v, band) =>
        assert(fromIndex((id, band)) == v, s"doc $id band $band")
      }
    }
  }
}
