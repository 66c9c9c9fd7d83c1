package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures.spark

/** Dedup operators: candidate generation must be complete (vs the exact
  * all-shingle join) and verification exact. */
class DedupSpec extends AnyFunSuite {

  private lazy val docs = {
    import spark.implicits._
    // tiny corpus with known structure: 0/1 near-dup, 2 exact dup of 0,
    // 3 unrelated, 4/5 near-dup
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content about spark catalyst optimizer rules"),
      (4L, "large language models need deduplicated training corpora to work"),
      (5L, "large language models need deduplicated training corpora to work well"))
      .toDF("doc_id", "text").cache()
  }

  test("decontaminate flags docs sharing an n-gram with the benchmark") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val out = Dedup.decontaminate(docs, "doc_id", "text",
      bench, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 0/1/2 contain the benchmark's 5-grams; 3/4/5 share none
    assert(out.keySet == Set(0L, 1L, 2L))
    // doc 0 holds all five 5-grams of the 9-token benchmark doc
    assert(out(0L) == 5L && out(2L) == 5L)
    // empty benchmark → nothing flagged
    assert(Dedup.decontaminate(docs, "doc_id", "text",
      bench.where(lit(false)), "doc_id", "text", 5).count() == 0)
  }

  test("exactClusters finds content-identical groups with min-id keeper") {
    val out = Dedup.exactClusters(docs, "doc_id", "text").collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 0L && out.head.getLong(1) == 2L)
    assert(Dedup.dropExactDuplicates(docs, "doc_id", "text").count() == 5)
  }

  test("jaccardJoin finds near-dup pairs; all three algorithms agree") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Dedup.jaccardJoin(docs, "doc_id", "text", 3, 0.5))
    assert(exact.contains((0L, 1L)) && exact.contains((4L, 5L)))
    assert(exact.contains((0L, 2L))) // exact dup is jaccard 1.0
    assert(!exact.exists(p => p._1 == 3L || p._2 == 3L))
    val lsh = pairs(Dedup.minHashLshJoin(docs, "doc_id", "text", 3, 0.5))
    val sim = pairs(Dedup.simHashJoin(docs, "doc_id", "text", 3, 0.5))
    assert(lsh == exact, s"minhash $lsh != exact $exact")
    assert(sim == exact, s"simhash $sim != exact $exact")
  }

  test("capped and uncapped jaccardJoin agree (pairs AND values); simhash DF pruning keeps the pair set") {
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // a corpus-hot shingle skew: every doc shares the "again and again"
    // template tail, plus the known near-dup pairs
    import spark.implicits._
    val skewed = docs.union(Seq(
      (6L, "totally new words here yet again and again and again"),
      (7L, "totally new words here yet again and again and again friend"))
      .toDF("doc_id", "text")).cache()
    val uncapped = rows(Dedup.jaccardJoin(skewed, "doc_id", "text", 3, 0.5))
    // cap=3: shingles in >3 of the 8 docs can't generate candidates, but
    // verification over the FULL sets keeps values exact
    val capped = rows(Dedup.jaccardJoin(skewed, "doc_id", "text", 3, 0.5,
      maxShingleDf = Some(3)))
    assert(capped == uncapped, s"capped $capped != uncapped $uncapped")
    // token doc-frequency pruning of SimHash votes: same pair set, exact
    // values — the prefilter changes, the verification contract doesn't.
    // A template corpus where pruning bites: every doc shares a 30-token
    // template (df = 10 > cap → pruned), near-dup pairs share 24 of 25
    // RARE tokens (kept) — enough kept tokens for stable signatures, which
    // the toy 10-token docs above are too short for.
    val template = (0 until 30).map(i => s"common$i").mkString(" ")
    val tmplDocs = (0 until 5).flatMap { k =>
      val uniq = (0 until 25).map(i => s"tok${k}_$i")
      Seq((2L * k, s"$template ${uniq.mkString(" ")}"),
        (2L * k + 1, s"$template ${uniq.updated(3, s"alt${k}_3").mkString(" ")}"))
    }.toDF("doc_id", "text").cache()
    val exactTmpl = rows(Dedup.jaccardJoin(tmplDocs, "doc_id", "text", 3, 0.5))
    assert(exactTmpl.map(t => (t._1, t._2)) ==
      (0 until 5).map(k => (2L * k, 2L * k + 1)).toSet) // sanity: the 5 pairs
    val pruned = rows(Dedup.simHashJoin(tmplDocs, "doc_id", "text", 3, 0.5,
      maxTokenDf = Some(5)))
    assert(pruned == exactTmpl, s"DF-pruned simhash $pruned != exact $exactTmpl")
    // candidate-scoped verify arm (the sparse-corpus scale path) produces
    // the identical pair set with identical exact values
    val scoped = rows(Dedup.simHashJoin(tmplDocs, "doc_id", "text", 3, 0.5,
      maxTokenDf = Some(5), verifyCandidatesOnly = true))
    assert(scoped == pruned, s"candidate-scoped simhash $scoped != $pruned")
    // the block-pair arm (the >100k-doc capacity geometry — auto-chosen
    // at scale, forced here via bandBits=16) finds the identical verified
    // pair set: C(8,2) combination tables catch a pair whenever any TWO
    // signature blocks are clean, so the capacity upgrade costs no recall
    // on template-shaped corpora (a single aligned 16-bit window did —
    // it lost a true pair on this very fixture)
    val wide = rows(Dedup.simHashJoin(tmplDocs, "doc_id", "text", 3, 0.5,
      maxTokenDf = Some(5), bandBits = 16))
    assert(wide == pruned, s"block-pair simhash $wide != $pruned")
  }

  test("simhash auto-routes template-shaped corpora to MinHash with the identical pair set") {
    import spark.implicits._
    // 30 content-identical docs: every signature is identical, so each of
    // the 8 single-block band tables holds ONE bucket of 30 — the
    // band-bucket histogram estimates 8·C(30,2) = 3480 emitted rows,
    // above the 50·nDocs = 1500 route line once the absolute budget is
    // lowered (the default 1e7 floor exists so only genuinely large
    // corpora ever route; this spec shrinks it to make the route
    // observable at unit scale)
    val clones = (0L until 30L)
      .map(i => (i, "the same template text repeated in every document"))
      .toDF("doc_id", "text").cache()
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val routed = rows(Dedup.simHashJoin(clones, "doc_id", "text", 3, 0.8,
      autoRoutePairBudget = 0.0))
    val forced = rows(Dedup.simHashJoin(clones, "doc_id", "text", 3, 0.8,
      bandBits = 8)) // bandBits forced ⇒ never routes
    assert(routed.size == 30 * 29 / 2) // all pairs, jaccard 1.0
    assert(routed == forced, s"routed $routed != forced-simhash $forced")
    // default budget does NOT route small corpora: est 3480 < 1e7 floor
    val unrouted = rows(Dedup.simHashJoin(clones, "doc_id", "text", 3, 0.8))
    assert(unrouted == forced)
    // the SAMPLED early-detector (the large-corpus path, size threshold
    // lowered to unit scale — nDocs < 20k ⇒ fraction clamps to 1.0, so
    // the sample is the corpus and the scaled estimate is exact): routes
    // to the identical pair set without ever building the full band table
    val sampled = rows(Dedup.simHashJoin(clones, "doc_id", "text", 3, 0.8,
      autoRoutePairBudget = 0.0, sampleDetectAbove = 10L))
    assert(sampled == forced)
    clones.unpersist()
  }

  test("jaccard values are exact (not estimated) in every algorithm") {
    def jacs(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = jacs(Dedup.jaccardJoin(docs, "doc_id", "text", 3, 0.5))
    val lsh = jacs(Dedup.minHashLshJoin(docs, "doc_id", "text", 3, 0.5))
    assert(exact == lsh)
    assert(exact((0L, 2L)) == 1.0)
  }

  test("topKJoin matches a driver-side brute force") {
    import spark.implicits._
    val vecs = (0 until 30).map(i =>
      (i.toLong, Array.tabulate(8)(j => ((i * 7 + j * 3) % 11).toFloat))).toDF("id", "vec")
    val out = Dedup.topKJoin(vecs.where(col("id") < 3), vecs, "id", "vec", "id", "vec", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    // brute force
    val all = (0 until 30).map(i => (i.toLong, Array.tabulate(8)(j => ((i * 7 + j * 3) % 11).toDouble)))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = (0 until 3).flatMap { q =>
      all.map { case (id, v) => (id, cos(all(q)._2, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(4).zipWithIndex
        .map { case ((id, _), r) => (q.toLong, id, (r + 1).toLong) }
    }.toSet
    assert(out == expected)
  }

  test("cosineNearDupJoin finds rescaled duplicates exactly, no false positives") {
    import spark.implicits._
    val base = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(16)(j => graft.TestFixtures.vec(5L, i.toLong, 16)(j))))
    // positive rescale: every byte changes, cosine ≈ 1, sign bits identical
    val variants = (0 until 5).map(i => (1000L + i, base(i)._2.map(x => x * 1.02f)))
    val corpus = (base ++ variants).toDF("id", "vec")
    val out = Dedup.cosineNearDupJoin(corpus, "id", "vec", 0.95)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out.keySet == (0 until 5).map(i => (i.toLong, 1000L + i)).toSet)
    assert(out.values.forall(_ >= 0.9999))
  }

  test("cosineNearDupJoin with more planes catches perturbed (not just rescaled) pairs") {
    import spark.implicits._
    val base = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(16)(j => graft.TestFixtures.vec(5L, i.toLong, 16)(j))))
    val variants = (0 until 5).map(i =>
      (1000L + i, { val v = base(i)._2.clone(); val t = v(0); v(0) = v(1); v(1) = t; v }))
    val corpus = (base ++ variants).toDF("id", "vec")
    // swapped coords flip up to 2 sign bits; 128 planes / 8-bit bands gives
    // 16 bands — missing all is ~0 for these cosines
    val out = Dedup.cosineNearDupJoin(corpus, "id", "vec", 0.85, planes = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def cosOf(a: Array[Float], b: Array[Float]): Double = {
      val va = a.map(_.toDouble); val vb = b.map(_.toDouble)
      va.zip(vb).map { case (x, y) => x * y }.sum /
        (math.sqrt(va.map(x => x * x).sum) * math.sqrt(vb.map(x => x * x).sum))
    }
    val eligible = (0 until 5).map(i => (i.toLong, 1000L + i))
      .filter { case (a, b) => cosOf(base(a.toInt)._2, variants((b - 1000).toInt)._2) >= 0.85 }
      .toSet
    assert(out == eligible, s"got $out expected $eligible")
  }

  test("decontaminateByEmbedding: max cosine vs the benchmark set, projection only") {
    import spark.implicits._
    val vecs = (0 until 20).map(i =>
      (i.toLong, Array.tabulate(8)(j => graft.TestFixtures.vec(3L, i.toLong, 8)(j))))
    val corpus = vecs.toDF("id", "vec")
    val bench = Seq(vecs(0)._2.toSeq, vecs(1)._2.map(x => x * 2f).toSeq)
    val out = Dedup.decontaminateByEmbedding(corpus, "id", "vec", bench)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // id 0 matches bench(0) exactly, id 1 matches its rescale: cosine 1.0
    assert(out(0L) == 1.0 && out(1L) == 1.0)
    // every row scored, max over the whole set
    assert(out.size == 20 && out.values.forall(c => c <= 1.0 && c >= -1.0))
    // driver-checkable: max over explicit pairwise cosines
    def cos(a: Array[Float], b: Seq[Float]): Double = {
      val va = a.map(_.toDouble); val vb = b.map(_.toDouble).toArray
      va.zip(vb).map { case (x, y) => x * y }.sum /
        (math.sqrt(va.map(x => x * x).sum) * math.sqrt(vb.map(x => x * x).sum))
    }
    vecs.foreach { case (id, v) =>
      val want = BigDecimal(bench.map(b => cos(v, b)).max)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(out(id) - want) < 1e-9, s"id $id: ${out(id)} vs $want")
    }
    intercept[IllegalArgumentException](
      Dedup.decontaminateByEmbedding(corpus, "id", "vec", Seq.empty))
  }

  test("decontaminateByEmbedding: null vector scores NULL, not a sentinel") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Some(Seq(1f, 0f, 0f, 0f))),
      (1L, Option.empty[Seq[Float]])).toDF("id", "vec")
    val out = Dedup.decontaminateByEmbedding(
        corpus, "id", "vec", Seq(Seq(1f, 0f, 0f, 0f)))
      .collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out(0L).contains(1.0))
    // MAX over all-NULL cosines is NULL (SQL semantics) — a threshold
    // filter must not see Double.MinValue here and silently keep the row
    assert(out(1L).isEmpty, s"null vector must score NULL, got ${out(1L)}")
  }

  test("removeRepeatedSpans cuts non-first occurrences of duplicated n-token runs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "p q r s t"),          // holds the FIRST "p q r" → untouched
      (2L, "m n p q r z"),        // "p q r" at pos 3 → tokens 3-5 cut
      (3L, "p q r"),              // entire doc is a later occurrence → vanishes
      (4L, "u v w u v w"),        // within-doc repeat: second "u v w" cut
      (5L, "a b"),                // shorter than n → passes through whole
      (6L, "c c c c c")           // self-overlapping periodic repeat:
                                  // keeper span {1,2,3} protected, rest cut
    ).toDF("id", "text")
    val out = Dedup.removeRepeatedSpans(docs, "id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == Map(
      1L -> "p q r s t",
      2L -> "m n z",
      4L -> "u v w",
      5L -> "a b",
      6L -> "c c c"), s"got $out")
    // doc 3 lost every token → absent (documented contract)
    assert(!out.contains(3L))
    intercept[IllegalArgumentException](
      Dedup.removeRepeatedSpans(docs, "id", "text", n = 1))
    intercept[IllegalArgumentException](
      Dedup.removeRepeatedSpans(docs, "id", "text", n = 3, minOcc = 1))
  }

  test("semanticKeepOne keeps one representative per semantic cluster") {
    import spark.implicits._
    val base = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(16)(j => graft.TestFixtures.vec(5L, i.toLong, 16)(j))))
    // two independent rescales of base(i): cosine ≈ 1 to the base AND to
    // each other, so {i, 1000+i, 2000+i} chains into one cluster and the
    // min id — the natural corpus row — must be the survivor
    val v1 = (0 until 5).map(i => (1000L + i, base(i)._2.map(x => x * 1.02f)))
    val v2 = (0 until 5).map(i => (2000L + i, base(i)._2.map(x => x * 1.04f)))
    val corpus = (base ++ v1 ++ v2).toDF("id", "vec")
    val kept = Dedup.semanticKeepOne(corpus, "id", "vec", 0.95)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == base.map(_._1).toSet)
    // composition agreement: the convenience wrapper == manual pipeline
    val manual = graft.dedup.ConnectedComponents.dropNearDuplicates(
      corpus, "id",
      Dedup.cosineNearDupJoin(corpus, "id", "vec", 0.95), "a", "b")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == manual)
  }

  test("native intersect-count kernel equals size(array_intersect) on set inputs") {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, LongSetIntersectCount}
    import graft.TestFixtures.spark.implicits._
    val rnd = new scala.util.Random(11)
    // random DISTINCT-element long arrays of skewed sizes, incl. empties and
    // disjoint pairs — the kernel's contract domain (per-doc shingle sets)
    val rows = (0 until 300).map { i =>
      val na = rnd.nextInt(40)
      val nb = rnd.nextInt(400)
      (rnd.shuffle((0L until 500L).toList).take(na),
        rnd.shuffle((200L until 900L).toList).take(nb))
    } :+ ((List.empty[Long], List(1L, 2L))) :+ ((List(5L), List.empty[Long]))
    val df = rows.toDF("ha", "hb")
    def kernel(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ColumnBridge.column(LongSetIntersectCount(
        ColumnBridge.expression(a), ColumnBridge.expression(b)))
    val bad = df.select(
      kernel(col("ha"), col("hb")).as("k"),
      size(array_intersect(col("ha"), col("hb"))).cast("long").as("s"))
      .where(col("k") =!= col("s")).count()
    assert(bad == 0, s"$bad rows disagree with array_intersect")
  }

  test("MinHashSig kernel is value-pinned to the HOF signature formulation") {
    import spark.implicits._
    val docs = spark.range(0, 200).selectExpr("id",
      """concat_ws(' ', transform(sequence(1, cast(id % 12 as int)),
         i -> concat('w', cast((id * 7 + i) % 31 as string)))) as text""")
      .union(Seq((900L, ""), (901L, "one two"),
        (902L, null.asInstanceOf[String])).toDF("id", "text"))
    val both = docs.select(col("id"), col("text").isNull.as("tn"),
        Dedup.minHashSignature(col("text"), 3).as("k"),
        Dedup.minHashSignatureHof(col("text"), 3).as("h")).collect()
    both.foreach { r =>
      if (r.getBoolean(1)) {
        // null text: the kernel yields clean NULL where the HOF's
        // when/size null semantics accidentally produced an array of
        // null elements — equivalent downstream (null band values never
        // equi-match; verify rejects), and the kernel form never emits
        // junk band rows
        assert(r.isNullAt(2), s"kernel not null on null text ${r.getLong(0)}")
      } else {
        assert(r.isNullAt(2) == r.isNullAt(3),
          s"nullability diverged on ${r.getLong(0)}")
        if (!r.isNullAt(2))
          assert(r.getSeq[Long](2) == r.getSeq[Long](3),
            s"signature diverged on ${r.getLong(0)}")
      }
    }
    // short docs (< n tokens) are NULL in both
    assert(both.find(_.getLong(0) == 901L).get.isNullAt(2))
  }

  test("MinHashSig declares itself nullable even over a non-nullable child (the r11 codegen bug)") {
    // the expression returns NULL for an EMPTY shingle array regardless of
    // child nullability. Without the nullable=true override, (a) the
    // planner may fold IsNotNull guards on signatures that CAN be null,
    // and (b) nullSafeCodeGen swaps ev.isNull for a constant while the
    // codegen template still assigns the variable — janino rejects the
    // undeclared name and whole-stage codegen silently falls back to
    // interpreted on every Generate-over-signature stage (the r10 sf0.1
    // dedup_simhash regression).
    import org.apache.spark.sql.graftbridge.MinHashSig
    import org.apache.spark.sql.catalyst.expressions.Literal
    val nonNullableChild = Literal.create(Seq(1L, 2L),
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, containsNull = false))
    assert(!nonNullableChild.nullable)
    assert(MinHashSig(nonNullableChild, Array(3L), Array(5L), 97L).nullable,
      "MinHashSig must stay nullable: empty arrays yield NULL")
    // and the exact shape that failed janino — posexplode of the kernel
    // over a NON-NULLABLE aggregation output — executes with results
    // (collect_set output is non-nullable; this is minHashLshJoin's
    // bands projection)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sets = Dedup.docShingleSets(
      Seq((1L, "a b c d e"), (2L, "a b c d e f")).toDF("id", "text"),
      "id", "text", 3)
    val bands = sets.select(col("id"),
      posexplode(Dedup.minHashKernel(col("hs"), 4)).as(Seq("band", "value")))
    assert(bands.count() == 8, "2 docs x 4 bands")
  }

  test("NgramHash kernel is bit-pinned to the xxhash64(array_join) formulation") {
    import spark.implicits._
    val docs = spark.range(0, 150).selectExpr("id",
      """concat_ws(' ', transform(sequence(1, cast(id % 9 as int)),
         i -> concat('w', cast((id * 5 + i) % 13 as string)))) as text""")
      .union(Seq((900L, ""), (901L, "a b"), (902L, "a b\tc\t"),
        (903L, "w\u00f6rd \ud83d\ude00 x y")).toDF("id", "text"))
    val kern = docs.select(col("id"),
        graft.dedup.Dedup.ngramHashes(col("text"), 3).as("k")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1)))
      .toMap
    val ref = docs.select(col("id"), graft.text.TextOps.ngrams(col("text"), 3)
        .as("g"))
      .select(col("id"), transform(col("g"), g => xxhash64(g)).as("h")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1)))
      .toMap
    assert(kern == ref)
    // the trailing-empty-token split artifact flows through identically
    assert(kern(902L).size == 2) // tokens [a, b, c, ""] -> 2 trigrams
  }

  test("SignBands kernel is band-pinned to the HOF hyperplane formulation") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.{ColumnBridge, SignBands}
    val dim = 8
    val vecs = (0 until 60).map(i =>
      (i.toLong, Array.tabulate(dim)(j => graft.TestFixtures.vec(3L, i.toLong, dim)(j))))
      .toDF("id", "vec")
    // the same hash-derived hyperplane matrix cosineNearDupJoin evaluates
    def planeComponent(p: Int, j: org.apache.spark.sql.Column) = {
      val h = xxhash64(lit(p), j, lit("graft-hyperplane"))
      h.cast("double") / lit(Long.MaxValue.toDouble)
    }
    val planes = 16; val bandBits = 8
    val flat = ColumnBridge.evalConstants(spark,
      (0 until planes).flatMap(p => (0 until dim).map(j =>
        planeComponent(p, lit(j)))))
      .map(_.asInstanceOf[Double])
    val mat = (0 until planes).map(p => (0 until dim).map(j => flat(p * dim + j)))
    val kern = ColumnBridge.column(SignBands(
      ColumnBridge.expression(col("vec")), flat.toArray, planes, bandBits))
    val rows = vecs.select(col("id"), kern.as("k"),
      graft.dedup.Dedup.signBandValuesHof(col("vec"), mat, bandBits).as("h"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](1) == r.getSeq[Long](2),
      s"bands diverged on id ${r.getLong(0)}"))
  }
}
