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

  /** Distinct (id, shingle-hash) pairs — the flat inverted-index form
    * (used where only distinct hash VALUES matter, e.g. [[decontaminate]]'s
    * benchmark side; the near-dup joins build [[docShingleSets]] instead —
    * same rows, one row per doc). Shingles are reduced to their 64-bit
    * `xxhash64` AT THE SOURCE: everything downstream shuffles 8-byte longs
    * instead of multi-word n-gram strings (at 100 TB the shingle table IS
    * the dominant shuffle — its row width is the bill). The collision
    * tradeoff is the one [[verifyJaccard]] already accepts: P(any two
    * distinct shingles of a candidate pair colliding) ≈ shingles²/2⁶⁴ —
    * far below corpus noise. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(ngramHashes(col(textCol), n)).as("h"))
      .distinct()

  /** Word n-gram xxhash64 array straight off the text — the
    * [[org.apache.spark.sql.graftbridge.NgramHash]] kernel over the
    * token split: one compiled pass, no n-gram strings materialized, and
    * the explodes downstream carry 8-byte longs (bit-pinned against the
    * `xxhash64(array_join(...))` Column formulation in DedupSpec). */
  private[graft] def ngramHashes(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, NgramHash}
    ColumnBridge.column(NgramHash(
      ColumnBridge.expression(TextOps.tokens(text)), n))
  }

  /** Per-doc distinct shingle-hash SETS — the near-dup joins' shared
    * foundation, built with ONE corpus shuffle: raw exploded (id, hash)
    * rows go straight into `groupBy(id).collect_set` (the set dedups per
    * doc — no separate `distinct` pass, which would shuffle the whole
    * inverted index a second time). Everything else derives WITHOUT
    * another corpus-wide shuffle: the flat inverted index is
    * `explode(hs)` off this cache, MinHash signatures are per-row
    * `array_min` projections, sizes are `size(hs)`. Docs with no shingles
    * (shorter than n tokens) are absent. */
  def docShingleSets(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(ngramHashes(col(textCol), n)).as("h"))
      .groupBy("id").agg(collect_set(col("h")).as("hs"))

  /** Jaccard from per-pair intersection counts that already CARRY the two
    * per-doc sizes (`na`, `nb` — threaded through the candidate join off
    * the caller-cached sets table, so no size re-join shuffles the pair
    * stream; round-17, guide §2.4). Eager like [[verifyJaccard]]:
    * materialized while the caller's cache lives. */
  private def jaccardFromSizedInter(inter: DataFrame,
      threshold: Double): DataFrame =
    inter
      .withColumn("jac",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .where(col("jac") >= threshold)
      .select(col("a"), col("b"), round(col("jac"), 4).as("jac"))
      .localCheckpoint()

  /** Exact n-gram Jaccard verification DRIVEN BY the candidate pairs,
    * shaped for candidate VOLUME: `sets` is the caller-cached per-doc
    * shingle-hash-array table (ONE row per doc — shingles-per-doc× fewer
    * rows than the inverted index), the candidates join it twice, and the
    * intersection CARDINALITY is computed per candidate row by the native
    * [[org.apache.spark.sql.graftbridge.LongSetIntersectCount]] kernel —
    * no candidate×shingle row explosion, no giant re-join against the
    * inverted index, no intersection array materialized. (Measured at sf0.1: simhash end-to-end 23 s → 13 s on
    * its ~155k banded candidates, capped-Jaccard 13 s → 8 s; pair sets
    * identical.) 64-bit hashing cannot meaningfully collide within a pair
    * (P ≈ shingles²/2⁶⁴); the arrays are exact per-doc sets by
    * construction (collect_set). Returns an EAGER localCheckpoint (see
    * [[jaccardJoin]]'s lifecycle note) materialized while the caller's
    * sets cache is live. */
  private def verifyJaccard(sets: DataFrame, candidates: DataFrame,
      threshold: Double, prePruned: Boolean = false): DataFrame = {
    // size-ratio prefilter: J ≥ t ⇒ min(|A|,|B|)/max(|A|,|B|) ≥ J ≥ t, so
    // a candidate failing the ratio can NEVER verify — drop it over narrow
    // int columns BEFORE shipping the per-doc hash arrays into the verify
    // join (measured at sf0.1: 951k → 360k simhash candidates, output
    // identical by construction; sizes project off the cached sets, in
    // the same hashed domain the verification divides in).
    // `prePruned` callers (minHashLshJoin, jaccardJoin's capped arm) thread
    // the sizes through their candidate join and apply the ratio there —
    // the candidate stream then never pays these two size-join shuffles
    // (round-17, guide §2.4).
    val sizes = sets.select(col("id"), size(col("hs")).cast("long").as("n"))
    val t = lit(threshold)
    val pruned = if (prePruned) candidates.select("a", "b") else candidates
      .join(sizes.select(col("id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("id").as("b"), col("n").as("nb")), "b")
      .where(col("na") * t <= col("nb") && col("nb") * t <= col("na"))
      .select("a", "b")
    // |ha ∩ hb| via the native count kernel: the arrays are per-doc SETS
    // (collect_set), so the count is exactly size(array_intersect(·)) —
    // without allocating the intersection array per candidate (DedupSpec
    // pins the equality against the array_intersect formulation)
    def interCount(a: Column, b: Column): Column = {
      import org.apache.spark.sql.graftbridge.{ColumnBridge, LongSetIntersectCount}
      ColumnBridge.column(LongSetIntersectCount(
        ColumnBridge.expression(a), ColumnBridge.expression(b)))
    }
    // Round-17 note — a counted candidate-broadcast arm (persist + count
    // the candidates, broadcast them through both set fetches so the
    // cached sets table is scanned instead of shuffled — the shape that
    // WON in IncrementalDedup.dedupAgainst against its parquet-persisted
    // history) was tried here and MEASURED OUT: the in-process sets table
    // is a co-located cache, and the persist+count materialization
    // barrier cost more than the avoided cache shuffles at both measured
    // scales (interleaved A/B: sf0.1 minhash 1.32, sf1 minhash 0.888 vs
    // 0.868 without the arm — no gain where it was supposed to win).
    // Round-18 note — the PRE-ZIPPED single-join arm (VERDICT r17 item 6:
    // explode each candidate to two (pairId, role, id) rows, join the
    // sets cache ONCE on id, re-zip with a pairId groupBy) was built and
    // MEASURED OUT at the 500k-doc scale dir, decisively: interleaved A/B
    // (3 alternating fresh-JVM rounds) read minhash_lsh 9.63, impact
    // 4.56, jaccard_capped 2.33 — the re-zip groupBy ships BOTH fetched
    // shingle arrays a second time and replaces two cheap broadcast-ish
    // hash joins with a corpus-candidate-wide wide-row shuffle. The item
    // is closed: two joins against the co-located sets cache stay.
    pruned
      .join(sets.select(col("id").as("a"), col("hs").as("ha")), "a")
      .join(sets.select(col("id").as("b"), col("hs").as("hb")), "b")
      .withColumn("inter", interCount(col("ha"), col("hb")))
      .withColumn("jac", col("inter").cast("double") /
        (size(col("ha")).cast("long") + size(col("hb")).cast("long") - col("inter")))
      .where(col("jac") >= threshold)
      .select(col("a"), col("b"), round(col("jac"), 4).as("jac"))
      .localCheckpoint()
  }

  /** EXACT n-gram Jaccard similarity join via the shingle inverted index:
    * candidates = pairs sharing ≥1 shingle (complete for any threshold > 0,
    * since J ≥ t > 0 implies a shared shingle — no false negatives), then
    * exact Jaccard filter over the FULL shingle sets (values never change).
    *
    * `maxShingleDf` caps CANDIDATE GENERATION only: shingles present in
    * more than that many docs are skipped when pairing — the standard
    * skew guard, since one shingle shared by d docs alone contributes
    * C(d,2) candidate pairs. High-threshold pairs share many rare shingles,
    * so completeness holds in practice (a qualifying pair whose every
    * shared shingle is corpus-hot is the only theoretical miss);
    * None = unconditional completeness.
    *
    * Crossover guidance: the cap is a SKEW GUARD, not an optimization — it
    * pays for itself only when some shingle's document frequency d makes
    * C(d,2) dominate (measured at sf0.1 / ~5k docs the capped arm is
    * SLOWER, 12.9 s vs 6.2 s: the hot-shingle anti-join + candidate
    * distinct + array-intersect verify cost more than the skew they remove
    * at that corpus size). Rule of thumb: uncapped while max(df)² ≪ corpus
    * row budget; capped when any shingle's df reaches ~√corpus; prefer
    * [[minHashLshJoin]] outright at web scale — its candidate width is
    * constant per doc regardless of shingle skew. Both arms produce the
    * IDENTICAL pair set on corpora whose qualifying pairs share ≥1 rare
    * shingle (DedupSpec pins the agreement). */
  /** Why every near-dup join returns an EAGER localCheckpoint: the shingle
    * and band caches these functions build are only live inside the call
    * (the finally blocks release them) — a lazily returned plan would
    * recompute the corpus-wide aggregations once per join branch (the
    * verify plan alone references the shingle table 4-5 times) AFTER the
    * caches are gone. Materializing the pair output here runs every branch
    * against live caches; what survives is the (bounded — pairs, not
    * corpus) result in node-local blocks, reclaimed when the frame is
    * garbage-collected. */
  def jaccardJoin(df: DataFrame, idCol: String, textCol: String, n: Int,
      threshold: Double, maxShingleDf: Option[Int] = None): DataFrame = {
    val sets = docShingleSets(df, idCol, textCol, n).persist()
    // the flat inverted index: a cache-read explode, NOT a second shuffle.
    // Each row CARRIES its doc's set size (one int off the cached sets) so
    // the pair stream downstream never re-joins a sizes table (round-17)
    val sh = sets.select(col("id"), size(col("hs")).cast("long").as("n"),
      explode(col("hs")).as("h"))
    val t = lit(threshold)
    try {
      maxShingleDf match {
        case None =>
          // uncapped: the self-join's grouped row count per (a,b) IS the
          // exact intersection — one pass, no candidate expansion; the two
          // sizes ride the grouping keys (functionally dependent on a/b —
          // same groups, two ints wider, two join shuffles fewer)
          val inter = sh.as("x")
            .join(sh.as("y"), col("x.h") === col("y.h") &&
              col("x.id") < col("y.id"))
            .groupBy(col("x.id").as("a"), col("y.id").as("b"),
              col("x.n").as("na"), col("y.n").as("nb"))
            .agg(count(lit(1)).as("inter"))
          jaccardFromSizedInter(inter, threshold) // already eager
        case Some(cap) =>
          // capped pairing (skew guard): candidates from rare shingles only,
          // then exact verification over the FULL shingle sets. The size-
          // ratio prune runs INSIDE the band join (sizes ride the rows), so
          // ratio-failed pairs die before the distinct and the verify never
          // re-joins sizes
          val hot = sh.groupBy("h").agg(count(lit(1)).as("df"))
            .where(col("df") > cap).select("h")
          val pairing = sh.join(broadcast(hot), Seq("h"), "left_anti")
          val candidates = pairing.as("x")
            .join(pairing.as("y"), col("x.h") === col("y.h") &&
              col("x.id") < col("y.id") &&
              col("x.n") * t <= col("y.n") && col("y.n") * t <= col("x.n"))
            .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
          verifyJaccard(sets, candidates, threshold, prePruned = true)
      }
    } finally sets.unpersist(blocking = false)
  }

  /** Benchmark decontamination: training docs sharing ≥ 1 word n-gram with
    * a held-out benchmark/eval corpus (the standard contamination test —
    * n-gram overlap against the test sets — applied before training).
    * Returns (id, hits) where hits = the number of DISTINCT contaminated
    * n-grams in that doc; uncontaminated docs are absent (anti-join this
    * result to get the clean corpus).
    *
    * Scale shape: the benchmark side is tiny relative to training data, so
    * its distinct n-gram hashes BROADCAST; the training corpus streams
    * through scan → explode → hash → broadcast-filter WITHOUT any shuffle
    * or distinct of its own (the [[shingles]] helper would distinct the
    * full inverted index first — a corpus-wide shuffle the join then mostly
    * discards); only the matching rows reach the count-distinct
    * aggregation, whose size is bounded by contaminated-doc × benchmark
    * n-grams — the 100 TB corpus is never shuffled on content. */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int): DataFrame = {
    val raw = docs.select(col(idCol).as("id"),
        explode(TextOps.ngrams(col(textCol), n)).as("shingle"))
      .select(col("id"), xxhash64(col("shingle")).as("h"))
    val benchSh = shingles(benchmark, benchIdCol, benchTextCol, n)
      .select("h").distinct()
    raw.join(broadcast(benchSh), Seq("h"))
      .groupBy("id").agg(count_distinct(col("h")).as("hits"))
  }

  /** Embedding-level benchmark decontamination: per corpus row, the MAX
    * cosine against ANY benchmark embedding — the semantic analog of
    * [[decontaminate]] for paraphrased leakage that shares no n-gram.
    * Returns (id, max_cos); callers drop rows with max_cos ≥ threshold.
    *
    * Scale shape: the benchmark rides the plan as an array-of-structs
    * literal and the max-cosine is a codegen'd per-row HOF fold — the
    * corpus streams through a PROJECTION: no join, no shuffle, no
    * broadcast exchange even. Sized for real eval suites (thousands of
    * vectors × the embedding dim must fit a plan literal — tens of MB);
    * a million-vector benchmark wants [[topKJoin]] instead. */
  def decontaminateByEmbedding(docs: DataFrame, idCol: String,
      vecCol: String, benchmark: Seq[Seq[Float]]): DataFrame = {
    require(benchmark.nonEmpty, "benchmark embedding set is empty")
    val bench = typedlit(benchmark)
    // array_max skips null elements and folds an all-null array to NULL, so
    // a row with a null vector reports max_cos = NULL (SQL MAX-over-NULLs
    // semantics) rather than a sentinel a threshold filter would mistake
    // for a real score.
    val maxCos = array_max(
      transform(bench, b =>
        graft.functions.Similarity.cosineSimilarity(col(vecCol), b)))
    docs.select(col(idCol), round(maxCos, 4).as("max_cos"))
  }

  // ------------------------------------------------------------ MinHash LSH

  /** Deterministic hash permutations: h_i(x) = (a_i·x + b_i) mod p over the
    * 31-bit reduction of the base shingle hash (xxhash64) — classic
    * universal hashing with p = 2^31−1, so a·h + b stays well inside a
    * 64-bit long under ANSI arithmetic. Fixed constants → stable signatures. */
  private[dedup] val MinHashP = 2147483647L // 2^31 − 1

  /** Permutation i's (a, b) — shared by the batch aggregation, the per-row
    * streaming signature, AND [[IncrementalDedup]]'s persisted band tables,
    * so none of the three can drift. */
  private[dedup] def permParams(i: Int): (Long, Long) =
    (1L + 104729L * i, (0x9e3779bL * (i + 1)) % MinHashP)

  /** Per-ROW MinHash signature of a text column (ARRAY<LONG> of length
    * `numHashes`) — the SAME values [[minHashLshJoin]] derives from its
    * per-doc shingle sets (same permutations over the same distinct
    * hashes; duplicates in this row-local form can't move a min), computed
    * directly from the text with no shuffle at all: the streaming-friendly
    * form (a stateful operator can't sit behind a corpus-wide
    * aggregation). NULL when the text has fewer than n tokens (such docs
    * have no shingles and are absent from the batch sets table too).
    * Served by the native [[org.apache.spark.sql.graftbridge.MinHashSig]]
    * kernel — one pass updating all `numHashes` minima (the HOF
    * formulation, numHashes interpreted array_min(transform) passes, is
    * kept as [[minHashSignatureHof]] and value-pinned in DedupSpec). */
  def minHashSignature(text: Column, n: Int, numHashes: Int = 16): Column =
    minHashKernel(ngramHashes(text, n), numHashes)

  /** The all-HOF formulation of [[minHashSignature]] — the
    * engine-portable reference the kernel is pinned against. */
  private[dedup] def minHashSignatureHof(text: Column, n: Int,
      numHashes: Int = 16): Column =
    graft.functions.GraftFunctions.bind(
      transform(TextOps.ngrams(text, n), g => pmod(xxhash64(g), lit(MinHashP)))) { hs =>
      when(size(hs) <= 0, lit(null).cast("array<bigint>"))
        .otherwise(array((0 until numHashes).map { i =>
          val (a, b) = permParams(i)
          array_min(transform(hs, h => pmod(h * a + b, lit(MinHashP))))
        }: _*))
    }

  /** [[MinHashSig]] over a raw (or pre-reduced — pmod is idempotent)
    * shingle-hash array Column, permutation table baked from
    * [[permParams]]. Shared by the per-row signature, the batch LSH
    * join, and the persisted-index band tables. */
  private[dedup] def minHashKernel(hashes: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, MinHashSig}
    val ab = (0 until numHashes).map(permParams)
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashes),
      ab.map(_._1).toArray, ab.map(_._2).toArray, MinHashP))
  }

  /** MinHash + LSH near-dup join: signature of `numHashes` min-values,
    * banded one hash per band (most permissive banding — candidate if ANY
    * minhash agrees; P(miss | J≥0.6, 16 hashes) ≈ 4e-7), candidates joined
    * on (band, value), then EXACT Jaccard verification. Output contract ==
    * [[jaccardJoin]]; the LSH path replaces the shared-shingle candidate
    * join with a constant-width signature join — the 100 TB path. */
  def minHashLshJoin(df: DataFrame, idCol: String, textCol: String, n: Int,
      threshold: Double, numHashes: Int = 16): DataFrame = {
    val sets = docShingleSets(df, idCol, textCol, n).persist()
    try {
      // signatures are PER-ROW projections off the cached sets — the
      // min-aggregate formulation would shuffle the whole inverted index a
      // second time; the MinHashSig kernel folds all numHashes minima in
      // one pass over the per-doc hash array and produces the SAME values
      // minHashSignature computes per streaming row (sets never empty
      // here: shingle-less docs are absent from docShingleSets)
      // band rows CARRY the doc's set size (4 bytes) so the size-ratio
      // prune runs inside the band join itself — ratio-failed collisions
      // die before the distinct, and verifyJaccard skips its two size-join
      // shuffles of the candidate stream (round-17, guide §2.4)
      val bands = sets
        .select(col("id"), size(col("hs")).cast("long").as("n"),
          posexplode(minHashKernel(col("hs"), numHashes))
          .as(Seq("band", "value")))
        .persist() // self-joined: don't recompute the signatures per side
      try {
        val t = lit(threshold)
        val candidates = bands.as("x")
          .join(bands.as("y"),
            col("x.band") === col("y.band") && col("x.value") === col("y.value") &&
            col("x.id") < col("y.id") &&
            col("x.n") * t <= col("y.n") && col("y.n") * t <= col("x.n"))
          .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
        verifyJaccard(sets, candidates, threshold, prePruned = true)
      } finally bands.unpersist(blocking = false)
    } finally sets.unpersist(blocking = false)
  }

  /** Exact-verify an EXTERNALLY generated candidate pair list (cols `a`,
    * `b`) against the corpus — the downstream half of the streaming
    * candidate contract ([[graft.streaming.StreamingIngest
    * .streamingNearDupCandidates]] emits unverified band collisions; a
    * dedup decision needs this batch join). Output contract ==
    * [[jaccardJoin]]: (a, b, jac), exact Jaccard over full shingle sets,
    * jac ≥ threshold. Same size-ratio-pruned verify the in-process
    * candidate generators use; candidate volume drives the cost. */
  def verifyJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, candidates: DataFrame): DataFrame = {
    val sets = docShingleSets(df, idCol, textCol, n).persist()
    try verifyJaccard(sets, candidates.select("a", "b"), threshold)
    finally sets.unpersist(blocking = false)
  }

  // --------------------------------------------------------------- SimHash

  /** 64-bit SimHash over word-level xxhash64: explode tokens once (narrow
    * (id, hash) rows), then ONE hash-aggregate with 64 sum columns — each
    * sum counts the ±1 vote of one bit. One shuffle of token rows; the
    * 64-way bit test is a flat codegen'd projection. (A 64-slot
    * array-fold HOF formulation blows past codegen method limits and falls
    * back to interpretation — measured 3× slower.) Returns
    * (id, votes ARRAY<LONG>[64]).
    *
    * `maxTokenDf` excludes tokens present in more than that many DOCS from
    * the votes: on template-correlated corpora the ubiquitous tokens pull
    * every signature toward the same bits, so accidental band collisions —
    * not true near-dups — dominate the candidate set. Rare tokens carry the
    * discriminating signal, and a J≥0.8 pair shares its rare tokens too, so
    * true-pair Hamming distance only shrinks under pruning. Costs one extra
    * tokenize+distinct pass (the DF count); a doc consisting ONLY of
    * corpus-hot tokens loses its signature entirely (same completeness
    * caveat as [[jaccardJoin]]'s maxShingleDf).
    *
    * WARNING — measure recall before enabling: on corpora whose near-dup
    * signal itself lives in corpus-common vocabulary (the driver's template
    * corpus is one) pruning guts the pair set — measured 256 → 13 pairs at
    * cap = 10% of 5k docs. Use only where docs carry enough rare tokens
    * (DedupSpec's template corpus shows the working shape). */
  def simHashVotes(df: DataFrame, idCol: String, textCol: String,
      maxTokenDf: Option[Int] = None): DataFrame = {
    val raw = df.select(col(idCol).as("id"),
      explode(TextOps.tokens(col(textCol))).as("tok"))
      .select(col("id"), xxhash64(col("tok")).as("h"))
    val toks = maxTokenDf match {
      case None => raw
      case Some(cap) =>
        val hot = raw.select("id", "h").distinct()
          .groupBy("h").agg(count(lit(1)).as("df"))
          .where(col("df") > cap).select("h")
        raw.join(broadcast(hot), Seq("h"), "left_anti")
    }
    val voteCols = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
        .as(s"v$b"))
    toks.groupBy("id").agg(voteCols.head, voteCols.tail: _*)
      .select(col("id"), array((0 until 64).map(b => col(s"v$b")): _*).as("votes"))
  }

  /** SimHash banded near-dup join: candidates share a band key, then
    * EXACT Jaccard verification — same output contract as
    * [[jaccardJoin]] at high thresholds.
    *
    * Band KEY WIDTH is the capacity knob (the sf1 stress run's lesson):
    * an 8-bit band has 256 possible values, so at n docs every band
    * bucket holds ~n/256 RANDOM colliders and the band self-join emits
    * O(bands · n²/256) candidate rows — fine at 5k docs, an executor OOM
    * at 500k, quadratic death at 100 TB. But a WIDER ALIGNED band (16
    * bits, 4 windows) guts recall: template-corpus near-dups scatter
    * ~10 vote-margin bit flips across the signature, and four fixed
    * windows rarely include a clean one (measured: a true fixture pair
    * lost). The scale geometry is the Manku et al. 2007 (WWW, "Detecting
    * near-duplicates for web crawling") block-combination scheme: split
    * the signature into 8 blocks of 8 bits and key one table per PAIR of
    * blocks — C(8,2) = 28 tables × 16-bit keys. Capacity matches the
    * 16-bit band (65536 values/table: random buckets stay single-digit
    * into the tens of millions of docs) while a pair is caught whenever
    * ANY TWO of its 8 blocks are clean (pigeonhole-guaranteed through
    * Hamming 6, high-probability far beyond — vs "any one of 4 windows").
    * `bandBits = 0` (default) picks the geometry from a pruned-column
    * corpus count: single blocks under 100k docs, block pairs above.
    * `bandBits = 8` / `16` force the two arms; DedupSpec pins that the
    * pair arm returns the identical verified pair set.
    *
    * Corpus note: on template-correlated corpora (many docs sharing token
    * vocabulary) sub-threshold pairs also land at low Hamming distance, so
    * the prefilter passes more candidates than on organic text — measured
    * true-pair Hamming reaches `hammingCutoff` exactly at J = 0.8 on the
    * driver corpus, so don't tighten it; prefer [[minHashLshJoin]] when the
    * threshold is loose (its banding probability tracks Jaccard directly).
    *
    * AUTO-ROUTE: in auto geometry (`bandBits = 0`) the band-bucket
    * histogram is aggregated BEFORE the candidate join; when the exact
    * band-join emission count Σ C(bucket, 2) exceeds
    * max(50 · nDocs, `autoRoutePairBudget`) the corpus is template-shaped
    * (signature clustering ⇒ giant buckets ⇒ candidate cost decoupled
    * from true-pair volume) and the call returns
    * [[minHashLshJoin]](df, n, threshold) instead — measured at sf1:
    * the identical verified pair set in 113 s vs 917 s. Forcing
    * `bandBits` disables routing (the spec/A-B instrument). */
  def simHashJoin(df: DataFrame, idCol: String, textCol: String, n: Int,
      threshold: Double, hammingCutoff: Int = 12,
      maxTokenDf: Option[Int] = None,
      verifyCandidatesOnly: Boolean = false,
      bandBits: Int = 0,
      autoRoutePairBudget: Double = 1e7,
      sampleDetectAbove: Long = 200000L): DataFrame = {
    require(bandBits == 0 || bandBits == 8 || bandBits == 16,
      s"bandBits must be 0 (auto), 8 (single blocks) or 16 (block pairs), got $bandBits")
    // auto geometry: one pruned-column count against the corpus — noise
    // next to the votes aggregation, and it keeps the candidate-join
    // capacity sane without the caller having to know the rule. The count
    // doubles as the auto-route budget below (None ⇔ forced arm: specs and
    // A/B harnesses that pass bandBits explicitly always get simhash).
    val nDocsAuto: Option[Long] =
      if (bandBits > 0) None else Some(df.select(idCol).count())
    val pairArm = nDocsAuto.fold(bandBits == 16)(_ >= 100000L)
    // full signature as two 32-bit halves (bit 63 can't ride a single
    // long under ANSI arithmetic) for the popcount Hamming prefilter
    def half(lo: Int): org.apache.spark.sql.Column =
      (lo until lo + 32).map(b =>
        when(element_at(col("votes"), b + 1) > 0, 1L << (b - lo))
          .otherwise(0L)).reduce(_ + _)
    // 8-bit block values of the signature
    def blockVal(bnd: Int): org.apache.spark.sql.Column =
      (0 until 8).map(k =>
        when(element_at(col("votes"), bnd * 8 + k + 1) > 0, 1L << k)
          .otherwise(0L)).reduce(_ + _)
    // band tables: single blocks (8 tables × 8-bit keys), or every pair
    // of blocks (28 tables × 16-bit keys) for the large-corpus arm
    val tables: Seq[(Int, org.apache.spark.sql.Column)] =
      if (!pairArm) (0 until 8).map(b => b -> blockVal(b))
      else (for { i <- 0 until 8; j <- i + 1 until 8 } yield
        (i * 8 + j) -> (shiftleft(blockVal(i), 8) + blockVal(j)))
    def bandTableOf(src: DataFrame): DataFrame =
      simHashVotes(src, idCol, textCol, maxTokenDf)
        .select(col("id"),
          half(0).as("sig_lo"), half(32).as("sig_hi"), col("votes"))
        .select(col("id"), col("sig_lo"), col("sig_hi"),
          explode(array(tables.map { case (bnd, value) =>
            struct(lit(bnd).as("band"), value.as("value"))
          }: _*)).as("bv"))
        .select(col("id"), col("sig_lo"), col("sig_hi"),
          col("bv.band"), col("bv.value"))
    // exact band-join emission count Σ_buckets C(c, 2) of a band table —
    // one map-side-combined aggregation, never the join itself
    def estPairsOf(b: DataFrame): Double = b.groupBy("band", "value")
      .agg(count(lit(1)).as("c"))
      .agg(coalesce(sum((col("c") * (col("c") - 1) / 2).cast("double")),
        lit(0.0)))
      .head.getDouble(0)
    // SAMPLED early route (auto geometry, large corpora): the exact
    // detector below needs the full band table, i.e. the full-corpus
    // token shuffle — ~90 s of the 208 s routed sf1 time was signature
    // work whose only outcome was "don't run simhash". Above
    // `sampleDetectAbove` docs, a deterministic ~20k-doc sample is
    // signed/banded instead and its emission count scales by
    // (nDocs/nSample)² — template buckets hold a constant FRACTION of
    // the corpus, so bucket sizes scale ~linearly and pair counts
    // quadratically; organic corpora sample to near-zero and fall
    // through. The full-table check below stays as the exact backstop
    // (a sample miss costs the old price, never a wrong answer —
    // routing is a performance decision, the pair-set contract is
    // verification's either way).
    for (nDocs <- nDocsAuto if nDocs >= sampleDetectAbove) {
      val f = math.min(1.0, math.max(0.01, 20000.0 / nDocs))
      val sample = graft.pipeline.Corpus.deterministicSample(df, idCol, f)
      val nS = sample.select(idCol).count()
      if (nS >= 2) {
        val scale = (nDocs.toDouble / nS) * (nDocs.toDouble / nS)
        if (estPairsOf(bandTableOf(sample)) * scale >
            math.max(50.0 * nDocs, autoRoutePairBudget))
          return minHashLshJoin(df, idCol, textCol, n, threshold)
      }
    }
    val bands = bandTableOf(df)
      .persist() // self-joined: don't recompute the votes agg per side
    try {
      // AUTO-ROUTE (auto geometry only; sf1 stress finding made code, not
      // comment — VERDICT r9 #2): template-shaped corpora collapse many
      // docs onto identical block values, so band buckets are giant and
      // the band self-join emits Σ_buckets C(c,2) rows REGARDLESS of the
      // Hamming prefilter (the filter runs per emitted row — the emission
      // IS the 917 s). One map-side-combined aggregation over the band
      // table computes that emission count EXACTLY before paying it; when
      // it dwarfs the corpus (> max(50·nDocs, 10M) — organic text with
      // near-singleton buckets sits far below, the sf1 template corpus
      // orders of magnitude above), the corpus is template-shaped and
      // MinHash-LSH is the right instrument: its banding probability
      // tracks Jaccard itself, so candidate volume follows TRUE pair
      // volume, not signature clustering (sf1: identical verified pair
      // set, 113 s vs 917 s). DedupSpec pins the pair-set identity on the
      // routed shape.
      val routeToMinHash = nDocsAuto.exists(nDocs =>
        estPairsOf(bands) > math.max(50.0 * nDocs, autoRoutePairBudget))
      if (routeToMinHash)
        return minHashLshJoin(df, idCol, textCol, n, threshold)
      // band collision → cheap Hamming prefilter on the full signature
      // (random pairs have expected Hamming ≈ 32; near-dups ≲ 8 — the
      // filter removes virtually every accidental band collision before
      // the exact-verification join sees it)
      val candidates = bands.as("x")
        .join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.value") === col("y.value") &&
          col("x.id") < col("y.id"))
        .where(
          (bit_count(col("x.sig_lo").bitwiseXOR(col("y.sig_lo"))) +
           bit_count(col("x.sig_hi").bitwiseXOR(col("y.sig_hi")))) <= hammingCutoff)
        .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
      // cached only on the pruned arm, where it's consumed twice (candidate
      // -doc pruning + the verify join); the dense arm reads it once
      if (verifyCandidatesOnly) candidates.persist()
      try {
        // unlike MinHash (whose signatures ARE shingle-derived), simhash
        // signatures come from tokens — shingle sets exist only to VERIFY.
        // `verifyCandidatesOnly` builds them for candidate docs alone: on an
        // organic corpus whose candidate population is a sliver of the
        // whole, that skips shingling everything else — the right arm at
        // scale. On candidate-dense corpora the pruning is pure overhead
        // (the materialization barrier + semi-join bought nothing), so the
        // dense arm — one fused job over full-corpus sets — stays the
        // default. Measured A/B on the template corpus at sf0.1, 3
        // interleaved runs per arm in one process (round 7: dense 3.3 s vs
        // scoped 5.1 s; re-measured round 8: dense 2.2/2.8/2.9 s vs scoped
        // 4.9/5.3/5.7 s — the dense default wins ~2× and the residual is
        // candidate density itself, not arm choice). Crossover discipline
        // mirrors the Jaccard cap: route `verifyCandidatesOnly` when the
        // candidate-doc population is a small fraction of the corpus —
        // organic (non-template) text at tight thresholds. Both arms
        // produce identical pairs (DedupSpec pins the agreement).
        val scope =
          if (verifyCandidatesOnly) {
            candidates.count() // materialize before both consumers fork
            val candIds = candidates.select(col("a").as(idCol))
              .union(candidates.select(col("b").as(idCol))).distinct()
            df.join(candIds, Seq(idCol), "left_semi")
          } else df
        val sets = docShingleSets(scope, idCol, textCol, n).persist()
        try verifyJaccard(sets, candidates, threshold) // eager — see jaccardJoin
        finally sets.unpersist(blocking = false)
      } finally {
        if (verifyCandidatesOnly) candidates.unpersist(blocking = false)
      }
    } finally bands.unpersist(blocking = false)
  }

  // ------------------------------------------------- embedding near-dup/join

  /** Cosine between two float-array columns (double math, left fold). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.Similarity.cosineSimilarity(a, b)

  /** Random-hyperplane sign-LSH near-dup join over an embedding column:
    * hyperplanes drawn deterministically per (plane, dim) from a hash (no
    * stored model), sign bits grouped into `planes / bandBits` bands;
    * candidate pairs join on (band, value) carrying IDS ONLY (vectors are
    * re-attached afterwards — shipping vectors through the candidate join
    * is the shuffle that kills this at scale), then EXACT cosine
    * verification so band collisions can't pollute the output.
    *
    * The hyperplane matrix is MATERIALIZED ONCE as plan literals (one tiny
    * driver-side evaluation of the same xxhash64 derivation — values
    * unchanged): evaluated inline it re-hashes planes × dim times PER ROW,
    * which was the dominant cost of the whole join (measured 1.9 s →
    * sub-second at sf0.1). Assumes the fixed per-corpus dimension every
    * embedding store has (the reference enforces it per store too).
    *
    * Banding/recall tradeoff (standard sign-LSH math, agreement per bit
    * p = 1 − θ/π): the defaults (16 planes, 8-bit bands → 2 bands) target
    * near-DUPLICATE detection (cos ≳ 0.98, where perturbations barely move
    * signs); for looser thresholds pass more planes with the same band
    * width (e.g. planes=64 → 8 bands: P(miss | cos=0.9) ≈ 0.71^8 ≈ 6%,
    * planes=128 → 0.4%). */
  /** The Column formulation of the sign-band projection — `planes`
    * aggregate/zip_with dot folds + the per-band bit assembly, all
    * interpreted — kept as the reference [[org.apache.spark.sql
    * .graftbridge.SignBands]] is band-pinned against (DedupSpec). */
  private[dedup] def signBandValuesHof(vec: Column, mat: Seq[Seq[Double]],
      bandBits: Int): Column = {
    val planes = mat.size
    val bits = (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(vec, typedlit(mat(p)), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, 1L).otherwise(0L)
    }
    array((0 until planes / bandBits).map { bnd =>
      (0 until bandBits).map(k =>
        bits(bnd * bandBits + k) * (1L << k)).reduce(_ + _)
    }: _*)
  }

  def cosineNearDupJoin(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 16, bandBits: Int = 8,
      dim: Option[Int] = None): DataFrame = {
    require(planes % bandBits == 0, "planes must be a multiple of bandBits")
    // plane p component j = hash-derived uniform in [-1, 1): deterministic
    def planeComponent(p: Int, j: Column): Column = {
      val h = xxhash64(lit(p), j, lit("graft-hyperplane"))
      (h.cast("double") / lit(Long.MaxValue.toDouble))
    }
    // corpus dimension: pass `dim` to keep plan construction fully lazy
    // (stream-safe, no job at build time); otherwise take the MODE of a
    // bounded sample (one tiny job) — a first-row probe would let a single
    // aberrant-length vector at scan head define the dimension and the
    // size filter below would then silently drop the whole corpus. An
    // empty/all-null corpus short-circuits through dim 1 — such rows are
    // excluded from banding below and produce zero pairs regardless.
    val corpusDim = dim.getOrElse {
      val sample = df.where(col(vecCol).isNotNull)
        .select(size(col(vecCol)).as("d")).limit(1024).collect()
      if (sample.isEmpty) 1
      else sample.groupBy(_.getInt(0)).view.mapValues(_.size)
        .toSeq.maxBy { case (d, cnt) => (cnt, -d) }._1
    }
    // the matrix entries are constant expressions — evaluate them
    // interpretively on the driver (one analyzer pass, zero Spark jobs):
    // the planes×dim-column projection JOB this replaces spent ~0.6-0.8 s
    // per call analyzing/optimizing/codegen'ing 1024 expressions to compute
    // 1024 constants (measured at sf0.1 — it dominated the whole join and
    // was the round-6 embed_near_dup bench regression)
    val mat: Seq[Seq[Double]] = {
      val flat = org.apache.spark.sql.graftbridge.ColumnBridge.evalConstants(
        df.sparkSession,
        (0 until planes).flatMap(p => (0 until corpusDim).map(j =>
          planeComponent(p, lit(j)))))
      (0 until planes).map(p => (0 until corpusDim).map(j =>
        flat(p * corpusDim + j).asInstanceOf[Double]))
    }
    // null or wrong-dimension vectors can't be scored (null dot would
    // silently band as all-zero bits and only waste verify work — the
    // exact-cosine filter rejects them anyway); exclude them up front
    val banded = df.where(col(vecCol).isNotNull &&
      size(col(vecCol)) === corpusDim)
    // all `planes` hyperplane dots + band assembly in ONE kernel pass per
    // row (the HOF formulation — `planes` interpreted aggregate/zip_with
    // folds — survives as signBandValuesHof, band-pinned in DedupSpec);
    // cached: the self-join's two sides would otherwise each recompute it
    val sig = {
      import org.apache.spark.sql.graftbridge.{ColumnBridge, SignBands}
      ColumnBridge.column(SignBands(ColumnBridge.expression(col(vecCol)),
        mat.flatten.toArray, planes, bandBits))
    }
    val bands = banded
      .select(col(idCol).as("id"), posexplode(sig).as(Seq("band", "value")))
      .persist()
    try {
      val candidates = bands.as("x")
        .join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.value") === col("y.value") &&
          col("x.id") < col("y.id"))
        .select(col("x.id").as("a"), col("y.id").as("b"))
      val vecs = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      // Candidate volume grows ~quadratically inside each (band, value)
      // bucket — at 200k vectors the default 8-bit bands emit ~10⁸
      // candidate rows, and shuffling THAT stream (a distinct + two
      // repartition joins) is the whole cost of the operator. When the
      // vector table itself fits an executor broadcast (≤ ~256 MB of
      // packed floats — corpus-DIMENSION aware, one cheap count probe),
      // verification goes map-side instead: the candidate stream never
      // shuffles at all — band-join output flows straight through two
      // broadcast lookups + the codegen'd cosine filter, and the pair
      // dedup (a pair can collide in several bands) runs AFTER the
      // threshold cut, on the duplicate-bounded survivor set (sf1: 191 s
      // → the band join itself). Corpora past the broadcast bound keep
      // the shuffled shape: distinct FIRST (so each pair verifies once),
      // then repartition joins — the arm that scales out along the
      // candidate stream; docs route genuinely huge corpora to the IVF
      // path instead.
      // streaming frames can't count (and can't broadcast a moving side):
      // they keep the shuffled arm, preserving this builder's stream-safety
      val nVecs = if (df.isStreaming) Long.MaxValue else banded.count()
      val bcastOk = nVecs.toDouble * corpusDim * 4 <= 256e6
      // eager: see jaccardJoin — materialize against the live cache
      (if (bcastOk)
        candidates
          .join(broadcast(vecs.select(col("id").as("a"), col("vec").as("va"))), "a")
          .join(broadcast(vecs.select(col("id").as("b"), col("vec").as("vb"))), "b")
          .withColumn("cos", cosine(col("va"), col("vb")))
          .where(col("cos") >= threshold)
          .select(col("a"), col("b"), round(col("cos"), 4).as("cos"))
          .distinct()
      else
        candidates.distinct()
          .join(vecs.select(col("id").as("a"), col("vec").as("va")), "a")
          .join(vecs.select(col("id").as("b"), col("vec").as("vb")), "b")
          .withColumn("cos", cosine(col("va"), col("vb")))
          .where(col("cos") >= threshold)
          .select(col("a"), col("b"), round(col("cos"), 4).as("cos")))
        .localCheckpoint()
    } finally bands.unpersist(blocking = false)
  }

  /** SemDeDup-style semantic corpus dedup (Abbas et al. 2023,
    * arXiv:2303.09540): embedding-cosine near-dup pairs chained into
    * clusters, then the corpus keeps ONE representative — the min id — per
    * semantic cluster (singletons survive by absence from the pair graph).
    * Where the paper prunes within k-means cells of a trained clustering,
    * this uses [[cosineNearDupJoin]]'s sign-LSH bands for the same
    * candidate-pruning role — deterministic, no trained model, no
    * cross-bucket comparisons — so the 100 TB shape is the sum of already
    * audited parts: banded candidate generation (never all-pairs), ids-only
    * candidate joins, exact-cosine verification of candidates only, and a
    * connected-components pass bounded by the pair graph, not the corpus.
    * Tune `planes`/`bandBits` for looser thresholds per the recall math on
    * [[cosineNearDupJoin]]. */
  def semanticKeepOne(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 16, bandBits: Int = 8,
      dim: Option[Int] = None): DataFrame = {
    val pairs = cosineNearDupJoin(df, idCol, vecCol, threshold, planes,
      bandBits, dim)
    ConnectedComponents.dropNearDuplicates(df, idCol, pairs, "a", "b")
  }

  // -------------------------------------------------- line-level dedup

  /** Line-level boilerplate removal (the CCNet/RefinedWeb preprocessing
    * step): drop every line whose document frequency exceeds `maxDf` —
    * navigation chrome, cookie banners, copyright footers repeat across
    * thousands of pages while real content doesn't — then reassemble each
    * document from its surviving lines IN ORIGINAL ORDER. Documents whose
    * every line is boilerplate disappear from the output (callers wanting
    * empty-string survivors can left-join the ids back).
    *
    * Scale shape: one explode pass produces narrow (id, pos, line-hash)
    * rows; the hot-line set is a hash-groupBy with a count-DISTINCT-ids
    * aggregate, its size bounded by total-lines / maxDf (each hot line
    * needs > maxDf supporting docs); the corpus then anti-joins it, and
    * the only unavoidable corpus-wide shuffle is the final reassembly
    * groupBy on id. Line identity is the 64-bit xxhash64 — lines never
    * ride a join.
    *
    * `broadcastHot` picks the anti-join shape. The broadcast arm (default)
    * keeps the corpus unshuffled before reassembly, but the lines/maxDf
    * bound is only small when maxDf scales with the corpus: at a fixed
    * tiny maxDf over ~10^12 lines the hot set is ~3e10 hashes (~240 GB) —
    * past any broadcast/driver budget. Envelope: broadcast while
    * (distinct lines with df > maxDf) × 8 B fits the broadcast limit
    * (≲ a few hundred MB, i.e. ≲ ~10^7-10^8 hot lines); beyond that pass
    * `broadcastHot = false` for a plain shuffled anti-join on the 8-byte
    * hash (one extra narrow shuffle — never a failure). */
  def removeBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
      maxDf: Int, sep: String = "\n", broadcastHot: Boolean = true): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val lines = df.select(col(idCol).as("id"),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(sep))).as(Seq("pos", "line")))
      .withColumn("lh", xxhash64(col("line")))
    val hot = lines.groupBy("lh")
      .agg(count_distinct(col("id")).as("df"))
      .where(col("df") > maxDf).select("lh")
    lines.join(if (broadcastHot) broadcast(hot) else hot, Seq("lh"), "left_anti")
      .groupBy("id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line")), sep).as("cleaned"))
      .select(col("id").as(idCol), col("cleaned"))
  }

  // ------------------------------------------------ substring-level dedup

  /** Exact substring (span-level) dedup — the Lee et al. 2022
    * ("Deduplicating Training Data Makes Language Models Better")
    * preprocessing step, re-expressed relationally: any run of `n`
    * consecutive whitespace tokens occurring at least `minOcc` times
    * ACROSS THE CORPUS (within-document repeats count) is a duplicated
    * span; the first occurrence in (id, position) order survives — its
    * `n` positions are protected even when a later occurrence's span
    * overlaps them (periodic text like "a a a a") — every other
    * occurrence's unprotected tokens are cut, and each document is
    * reassembled from its surviving tokens in original order. Catches
    * copy-paste passages document-level dedup misses (the rest of the doc
    * differs) and [[removeBoilerplateLines]] misses (no line structure).
    * Documents whose every token is cut disappear from the output (same
    * contract as the line op); documents shorter than `n` tokens pass
    * through whole.
    *
    * Scale shape: the position table is one narrow (id, pos, 8-byte gram
    * hash) row per token — the same O(corpus tokens) class as the Jaccard
    * shingle table; the occurrence census is a hash-groupBy to (count,
    * first-occurrence) per gram whose map-side partial aggregation
    * absorbs boilerplate skew (no per-gram window, so a million-occurrence
    * gram never pins a partition); occurrences that survive the census
    * join with a different (id, pos) than the minimum form the marked
    * set, bounded by the duplicate population, never the corpus. The
    * span → token explosion multiplies only marked rows by `n`, and the
    * final anti-join + reassembly groupBy on id is the one corpus-wide
    * shuffle. Gram identity is the 64-bit xxhash64: at trillion-gram
    * scale birthday collisions cut a false span per ~billions of tokens —
    * acceptable for a lossy cleaning op (a keeper occurrence always
    * survives; nothing is lost corpus-wide). */
  def removeRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minOcc: Int = 2): DataFrame = {
    require(n >= 2, s"span length must be >= 2 tokens, got $n")
    require(minOcc >= 2, s"minOcc must be >= 2, got $minOcc")
    val toks = docs.select(col(idCol).as("id"),
      TextOps.tokens(col(textCol)).as("tk"))
    // 1-based start positions; a gram is the space-join of tokens
    // [i, i+n) — tokens carry no whitespace, so the join is injective
    val grams = toks.where(size(col("tk")) >= n)
      .select(col("id"), posexplode(transform(
        sequence(lit(1), size(col("tk")) - (n - 1)),
        i => xxhash64(concat_ws(" ", slice(col("tk"), i, lit(n))))))
        .as(Seq("p0", "h")))
      .select(col("id"), (col("p0") + 1).as("pos"), col("h"))
    // census: occurrence count + lexicographic-min (id, pos) per gram.
    // Round-17 note — measured and kept as-is: min(struct) plans as
    // SortAggregate (struct buffers aren't hash-aggregable; two sorts of
    // the gram table). Packing (id, pos) into one decimal(38,0)
    // (id·2³¹+pos) DOES turn the census into a map-side-combining
    // HashAggregate, but the per-row Decimal128 multiply-add on the
    // corpus-scale gram table costs MORE than the sorts it removes:
    // interleaved A/B at 500k docs read 1.16/1.30 (decimal arm slower,
    // 3 alternating fresh-JVM rounds); sf0.1 was flat (0.95). The sorts
    // run on narrow (8B-key) rows — Spark's radix path — and are cheap.
    // Round-18, closing the packing idea PERMANENTLY: the remaining arm —
    // a single-LONG pack (id·2³¹ + pos) — is only admissible when every
    // id is provably < 2³², which this operator cannot assume: `idCol` is
    // caller-supplied and dedup pipelines routinely feed xxhash64-derived
    // content ids spanning the full signed-64 range (and min() over the
    // pack would then disagree with lexicographic min(struct) wherever
    // ids collide modulo the shift or go negative). A runtime id-range
    // check would cost a pass over the gram table — the very work the
    // pack was meant to save. min(struct) + radix sorts stays.
    val dup = grams.groupBy("h").agg(
        count(lit(1)).as("cnt"),
        min(struct(col("id"), col("pos"))).as("first"))
      .where(col("cnt") >= minOcc)
      .select("h", "first")
    // keeper spans are PROTECTED: with self-overlapping repeats
    // ("a a a a", n=2) the non-first occurrences' spans cover part of the
    // first occurrence too — a position is cut iff SOME duplicated-gram
    // occurrence covers it and NO first occurrence does, which is one
    // groupBy over the exploded spans (max(isFirst) per position) instead
    // of a two-sided anti-join. The exploded table is bounded by
    // (duplicate occurrences + one keeper per dup gram) × n, never the
    // corpus; this is what makes "exactly one copy survives" hold instead
    // of erasing every copy of a periodic repeat.
    val isFirst =
      col("id") === col("first.id") && col("pos") === col("first.pos")
    val cut = grams.join(dup, "h")
      .select(col("id"), isFirst.as("f"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("j"))
      .groupBy("id", "j").agg(max(col("f")).as("anyFirst"))
      .where(!col("anyFirst")).select("id", "j")
    val tokRows = toks
      .select(col("id"), posexplode(col("tk")).as(Seq("p0", "tok")))
      .select(col("id"), (col("p0") + 1).as("j"), col("tok"))
    tokRows.join(cut, Seq("id", "j"), "left_anti")
      .groupBy("id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("j"), col("tok")))),
          s => s.getField("tok")), " ").as("cleaned"))
      .select(col("id").as(idCol), col("cleaned"))
  }

  /** Brute-force top-k similarity JOIN: every query row × corpus, scored,
    * per-query bounded top-k via window rank. Broadcast the (small) query
    * side; the corpus streams — the baseline batch k-NN join
    * (N queries × M corpus; the reference has only single-query GetSimN). */
  def topKJoin(queries: DataFrame, corpus: DataFrame, qId: String, qVec: String,
      cId: String, cVec: String, k: Int): DataFrame = {
    val scored = broadcast(queries.select(col(qId).as("qid"), col(qVec).as("qv")))
      .crossJoin(corpus.select(col(cId).as("cid"), col(cVec).as("cv")))
      .select(col("qid"), col("cid"), cosine(col("qv"), col("cv")).as("cos"))
    // bounded per-task fold, never a window sort of the |q|·|corpus|
    // product: the window formulation SPILLED A 65 GB DISK at 10k × 200k
    // (graft.ScaleJoin, round 13) — sorting 2B rows to keep 500k
    graft.ann.BoundedTopK.topK(scored, "qid", "cid", "cos", k)
      .select(col("qid"), col("cid"), round(col("score"), 4).as("cos"),
        col("rank"))
  }
}
