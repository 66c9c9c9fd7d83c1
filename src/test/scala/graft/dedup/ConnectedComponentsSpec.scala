package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures.spark

/** Connected components: cross-checked against a driver-side union-find on
  * randomized graphs (including deep chains, which exercise the pointer-
  * jumping rounds — plain neighbor propagation alone would need O(chain)
  * rounds and trip the iteration bound). */
class ConnectedComponentsSpec extends AnyFunSuite {

  /** Reference union-find with path compression. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(x => x -> find(x)).toMap
  }

  /** cutover = -1 forces the DISTRIBUTED pointer-jumping arm; the default
    * takes the driver union-find arm on these small graphs. Both are
    * asserted — the adaptive dispatch must never change the labeling. */
  private def ccOf(edges: Seq[(Long, Long)],
      cutover: Long = ConnectedComponents.DriverUnionFindCutover): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.label(edges.toDF("a", "b"), "a", "b",
      driverCutover = cutover)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("labels chains, cliques, and singleton pairs with the component min") {
    // two chained pairs (0~1, 1~2), one isolated pair, one self-contained
    // triangle with non-contiguous ids
    val edges = Seq((0L, 1L), (1L, 2L), (10L, 11L), (7L, 20L), (20L, 9L), (9L, 7L))
    assert(ccOf(edges) == unionFind(21, edges))
    assert(ccOf(edges, cutover = -1) == unionFind(21, edges)) // distributed arm
    assert(ccOf(edges)(2L) == 0L) // transitivity across the chain
  }

  test("deep chain converges via pointer jumping") {
    // a 64-node path: diameter 63, so neighbor-min alone would need ~63
    // rounds; with jumping it must finish inside the default bound of 50
    val edges = (0L until 63L).map(i => (i, i + 1))
    val got = ccOf(edges, cutover = -1) // the distributed arm is under test
    assert(got.size == 64 && got.values.forall(_ == 0L))
  }

  test("randomized graphs match union-find") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val n = 30 + rnd.nextInt(40)
      val edges = (1 to n).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val expected = unionFind(n, edges)
        assert(ccOf(edges) == expected)
        assert(ccOf(edges, cutover = -1) == expected) // arms agree
      }
    }
  }

  test("dropNearDuplicates keeps representatives and singletons") {
    import spark.implicits._
    val corpus = (0L to 9L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // components {0,1,2} and {5,7}; 3,4,6,8,9 untouched
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 7L)).toDF("a", "b")
    val kept = ConnectedComponents
      .dropNearDuplicates(corpus, "doc_id", pairs, "a", "b")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 3L, 4L, 5L, 6L, 8L, 9L))
  }

  test("impactReport: per-slice removal accounting agrees with keep-one") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "a", "one two three"),   // comp {0,1}: 1 removed from a
      (1L, "a", "one two three"),
      (2L, "a", "unique alpha"),
      (3L, "b", "x y"),             // comp {3,4,5}: 4,5 removed from b
      (4L, "b", "x y"),
      (5L, "b", "x y z"),
      (6L, "b", ""),                // empty text → 0 tokens, survives
      (7L, "c", "lonely"))          // untouched slice
      .toDF("doc_id", "source", "text")
    val pairs = Seq((0L, 1L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val got = ConnectedComponents.impactReport(
        corpus, "doc_id", "source", "text", pairs, "a", "b")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    // a: 3 docs, 1 removed (id 1: 3 tokens, 13 chars), 8 tokens total;
    // loss = 3·10⁴ div 8 = 3750 bp exactly
    assert(got("a") == ((3L, 1L, 8L, 3L, 13L, 3750L)))
    // b: 4 docs, 2 removed (ids 4, 5: 2+3 tokens, 3+5 chars), 7 tokens;
    // loss = 5·10⁴ div 7 = 7142 bp (truncated — integral division)
    assert(got("b") == ((4L, 2L, 7L, 5L, 8L, 7142L)))
    // c: untouched — zero removals, zero loss
    assert(got("c") == ((1L, 0L, 1L, 0L, 0L, 0L)))
    // accounting identity: n_docs − n_removed == keep-one survivor count
    val survivors = ConnectedComponents
      .dropNearDuplicates(corpus, "doc_id", pairs, "a", "b").count()
    assert(got.values.map(v => v._1 - v._2).sum == survivors)
  }

  test("dropNearDuplicatesKeepBest keeps the highest-ranked member per component") {
    import spark.implicits._
    // ranks: component {0,1,2} → 2 wins (rank 9); {5,7} → tie at 4, lowest
    // id (5) wins; singletons untouched
    val corpus = Seq(
      (0L, 3L), (1L, 7L), (2L, 9L), (3L, 1L), (4L, 2L),
      (5L, 4L), (6L, 8L), (7L, 4L), (8L, 0L), (9L, 5L))
      .toDF("doc_id", "quality")
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 7L)).toDF("a", "b")
    val kept = ConnectedComponents
      .dropNearDuplicatesKeepBest(corpus, "doc_id", "quality", pairs, "a", "b")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L, 5L, 6L, 8L, 9L))
    // with a constant rank the policy degrades to min-id keep-one exactly
    val flat = corpus.withColumn("quality", org.apache.spark.sql.functions.lit(1L))
    val keptFlat = ConnectedComponents
      .dropNearDuplicatesKeepBest(flat, "doc_id", "quality", pairs, "a", "b")
      .select("doc_id").as[Long].collect().toSet
    val keptMinId = ConnectedComponents
      .dropNearDuplicates(corpus, "doc_id", pairs, "a", "b")
      .select("doc_id").as[Long].collect().toSet
    assert(keptFlat == keptMinId)
  }
}
