package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextOps

/**
 * Corpus-scale deduplication operators for LLM training-data pipelines.
 * Every algorithm here is banded/bucketed — candidate pairs come from joins
 * on discrete keys (shingles, minhash bands, simhash bands, LSH bit-bands),
 * NEVER from an all-pairs product — and approximate candidate generation is
 * always followed by an EXACT verification of the similarity predicate, so
 * false positives cannot reach the output. At 100 TB the shuffle keys are
 * the band values, partition counts follow the corpus, and the exact-verify
 * join touches only candidate pairs.
 *
 * (Extensions beyond the reference per the north-star brief; the in-store
 * exact dedup-by-content is the DB layer's Set — GraftEngine.set.)
 */
object Dedup {

  // ------------------------------------------------------------ exact dedup

  /** Exact duplicate clusters by full-content hash (md5 — reproducible
    * across engines): one row per duplicated content, keeper = min id.
    * A pure hash-groupBy: one shuffle on the content hash. */
  def exactClusters(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("cnt"))
      .where(col("cnt") > 1)
      .select("keeper", "cnt")

  /** Keep-one projection: drops every exact duplicate except the min-id row.
    * Window over the content hash — one shuffle, no join. */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
  }

  // ----------------------------------------------------- shingle foundation

  /** Distinct (id, shingle) pairs — the inverted-index rows every near-dup
    * algorithm below builds on. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(TextOps.ngrams(col(textCol), n)).as("shingle"))
      .distinct()

  /** Exact n-gram Jaccard verification over candidate pairs (a, b):
    * |A∩B| via the shingle join restricted to candidates, sizes via
    * a broadcast of per-doc counts. */
  private def verifyJaccard(sh: DataFrame, candidates: DataFrame,
      threshold: Double): DataFrame = {
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = sh.as("x")
      .join(sh.as("y"), col("x.shingle") === col("y.shingle") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .join(candidates, Seq("a", "b"), "left_semi")
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("n", "na"), "a")
      .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("n", "nb"), "b")
      .withColumn("jac",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .where(col("jac") >= threshold)
      .select(col("a"), col("b"), round(col("jac"), 4).as("jac"))
  }

  /** EXACT n-gram Jaccard similarity join via the shingle inverted index:
    * candidates = pairs sharing ≥1 shingle (complete for any threshold > 0,
    * since J ≥ t > 0 implies a shared shingle — no false negatives), then
    * exact Jaccard filter. `maxShingleDf` drops shingles present in more
    * than that many docs (stop-shingle cap — the standard skew guard for
    * the inverted-index join; None = exact completeness). */
  def jaccardJoin(df: DataFrame, idCol: String, textCol: String, n: Int,
      threshold: Double, maxShingleDf: Option[Int] = None): DataFrame = {
    val shAll = shingles(df, idCol, textCol, n)
    val sh = maxShingleDf.fold(shAll) { cap =>
      val hot = shAll.groupBy("shingle").agg(count(lit(1)).as("df"))
        .where(col("df") > cap).select("shingle")
      shAll.join(broadcast(hot), Seq("shingle"), "left_anti")
    }
    val cached = sh.persist()
    try {
      val candidates = cached.as("x")
        .join(cached.as("y"), col("x.shingle") === col("y.shingle") &&
          col("x.id") < col("y.id"))
        .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
      verifyJaccard(cached, candidates, threshold)
    } finally cached.unpersist(blocking = false)
  }

  // ------------------------------------------------------------ MinHash LSH

  /** Deterministic hash permutations: h_i(x) = (a_i·x + b_i) mod p over the
    * 31-bit reduction of the base shingle hash (xxhash64) — classic
    * universal hashing with p = 2^31−1, so a·h + b stays well inside a
    * 64-bit long under ANSI arithmetic. Fixed constants → stable signatures. */
  private val MinHashP = 2147483647L // 2^31 − 1

  /** MinHash + LSH near-dup join: signature of `numHashes` min-values,
    * banded one hash per band (most permissive banding — candidate if ANY
    * minhash agrees; P(miss | J≥0.6, 16 hashes) ≈ 4e-7), candidates joined
    * on (band, value), then EXACT Jaccard verification. Output contract ==
    * [[jaccardJoin]]; the LSH path replaces the shared-shingle candidate
    * join with a constant-width signature join — the 100 TB path. */
  def minHashLshJoin(df: DataFrame, idCol: String, textCol: String, n: Int,
      threshold: Double, numHashes: Int = 16): DataFrame = {
    val sh = shingles(df, idCol, textCol, n).persist()
    try {
      val base = sh.withColumn("h", pmod(xxhash64(col("shingle")), lit(MinHashP)))
      val sigCols = (0 until numHashes).map { i =>
        val a = 1L + 104729L * i // < p for any sane numHashes
        val b = (0x9e3779bL * (i + 1)) % MinHashP
        min(pmod(col("h") * a + b, lit(MinHashP))).as(s"mh$i")
      }
      val sigs = base.groupBy("id").agg(sigCols.head, sigCols.tail: _*)
      val bands = sigs.select(col("id"),
        explode(array((0 until numHashes).map(i =>
          struct(lit(i).as("band"), col(s"mh$i").as("value"))): _*)).as("bv"))
        .select(col("id"), col("bv.band"), col("bv.value"))
      val candidates = bands.as("x")
        .join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.value") === col("y.value") &&
          col("x.id") < col("y.id"))
        .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
      verifyJaccard(sh, candidates, threshold)
    } finally sh.unpersist(blocking = false)
  }

  // --------------------------------------------------------------- SimHash

  /** 64-bit SimHash over word-level xxhash64: per bit, sum ±1 weighted by
    * token occurrences; bit = sign. Computed relationally (explode tokens →
    * per-bit majority) — no UDF. */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(TextOps.tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitVotes = toks.select(col("id"),
        explode(sequence(lit(0), lit(63))).as("bit"),
        col("h"))
      .withColumn("vote",
        when(expr("shiftright(h, bit)").bitwiseAND(1) === 1, 1).otherwise(-1))
      .groupBy("id", "bit").agg(sum(col("vote")).as("v"))
    bitVotes
      .withColumn("bitval",
        when(col("v") > 0, expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(0L))
      .groupBy("id").agg(sum(col("bitval")).as("simhash"))
  }

  /** SimHash banded near-dup join: 8 bands × 8 bits; candidates share a
    * band (Hamming ≤ 7 guarantees a shared band by pigeonhole; near-dups at
    * J ≥ ~0.8 cluster well under it), then EXACT Jaccard verification —
    * same output contract as [[jaccardJoin]] at high thresholds. */
  def simHashJoin(df: DataFrame, idCol: String, textCol: String, n: Int,
      threshold: Double): DataFrame = {
    val sh = shingles(df, idCol, textCol, n).persist()
    try {
      val hashes = simHash(df, idCol, textCol)
      val bands = hashes.select(col("id"),
        explode(array((0 until 8).map(bnd =>
          struct(lit(bnd).as("band"),
            shiftright(col("simhash"), bnd * 8).bitwiseAND(0xffL).as("value"))): _*))
          .as("bv"))
        .select(col("id"), col("bv.band"), col("bv.value"))
      val candidates = bands.as("x")
        .join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.value") === col("y.value") &&
          col("x.id") < col("y.id"))
        .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
      verifyJaccard(sh, candidates, threshold)
    } finally sh.unpersist(blocking = false)
  }

  // ------------------------------------------------- embedding near-dup/join

  /** Cosine between two float-array columns (double math, left fold). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.Similarity.cosineSimilarity(a, b)

  /** Random-hyperplane sign-LSH near-dup join over an embedding column:
    * 8 bands × 2 sign-bits (P(miss | cos ≥ 0.95) ≈ 8e-8), hyperplanes drawn
    * deterministically per (plane, dim) from a hash — no stored model.
    * Candidates join on (band, bits), then EXACT cosine verification.
    * The brute-force baseline is [[topKJoin]] / an explicit threshold join;
    * this is the banded scale path. */
  def cosineNearDupJoin(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 16): DataFrame = {
    // plane p component j = hash-derived uniform in [-1, 1): deterministic
    def planeComponent(p: Int, j: Column): Column = {
      val h = xxhash64(lit(p), j, lit("graft-hyperplane"))
      (h.cast("double") / lit(Long.MaxValue.toDouble))
    }
    val dotCols = (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(col(vecCol), sequence(lit(0), size(col(vecCol)) - 1),
          (x, j) => x.cast("double") * planeComponent(p, j)),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, 1L).otherwise(0L).as(s"bit$p")
    }
    val withBits = df.select(Seq(col(idCol).as("id"), col(vecCol).as("vec")) ++ dotCols: _*)
    val bandWidth = 2
    val bands = withBits.select(col("id"), col("vec"),
      explode(array((0 until planes / bandWidth).map { bnd =>
        val v = (0 until bandWidth).map(k =>
          col(s"bit${bnd * bandWidth + k}") * (1L << k)).reduce(_ + _)
        struct(lit(bnd).as("band"), v.as("value"))
      }: _*)).as("bv"))
      .select(col("id"), col("vec"), col("bv.band"), col("bv.value"))
    bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.value") === col("y.value") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.vec").as("va"), col("y.vec").as("vb"))
      .distinct()
      .withColumn("cos", cosine(col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select(col("a"), col("b"), round(col("cos"), 4).as("cos"))
  }

  /** Brute-force top-k similarity JOIN: every query row × corpus, scored,
    * per-query bounded top-k via window rank. Broadcast the (small) query
    * side; the corpus streams — the baseline batch k-NN join
    * (N queries × M corpus; the reference has only single-query GetSimN). */
  def topKJoin(queries: DataFrame, corpus: DataFrame, qId: String, qVec: String,
      cId: String, cVec: String, k: Int): DataFrame = {
    val scored = broadcast(queries.select(col(qId).as("qid"), col(qVec).as("qv")))
      .crossJoin(corpus.select(col(cId).as("cid"), col(cVec).as("cv")))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("_rn", row_number().over(w)).where(col("_rn") <= k)
      .select(col("qid"), col("cid"), round(col("cos"), 4).as("cos"), col("_rn").as("rank"))
  }
}
