package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextOps

/**
 * Corpus-management utilities for training-data pipelines (north-star
 * extensions beyond the reference surface — SURVEY.md §2.7 family):
 * deterministic split assignment for train/val/test carving at corpus scale.
 */
object Corpus {

  /** Stable 0–99 bucket from the row id: the first 8 hex chars of
    * `md5(id)` as an integer, mod 100. md5 — not an engine-specific hash —
    * so the assignment is reproducible in ANY engine, and keyed on the id
    * so a document's split NEVER changes as the corpus grows (the property
    * random sampling lacks: adding data must not migrate eval docs into
    * train). Pure per-row projection — shuffle-free at any scale. */
  def splitBucket(id: Column): Column = idBucket(id, 100)

  /** Deterministic train/val/test assignment: buckets [0,trainPct) →
    * "train", [trainPct, trainPct+valPct) → "val", rest → "test". */
  def assignSplit(df: DataFrame, idCol: String,
      trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val b = splitBucket(col(idCol))
    df.withColumn("split",
      when(b < trainPct, lit("train"))
        .when(b < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** LEAKAGE-SAFE train/val/test split: like [[assignSplit]], but every
    * near-dup CLUSTER lands on one side — the eval-contamination guard a
    * per-document split cannot give (a J ≥ 0.8 twin of a test document
    * sitting in train is exactly the leakage decontamination pipelines
    * exist to prevent; splitting per-doc puts ~2·p·(1−p) of every dup
    * pair across the boundary). `pairs` is any verified near-dup pair
    * frame ([[graft.dedup.Dedup.jaccardJoin]] / `minHashLshJoin` /
    * `simHashJoin` output); rows are bucketed by their component
    * REPRESENTATIVE (min id — [[graft.dedup.ConnectedComponents.label]]),
    * singletons by their own id, so (a) a cluster moves as a unit, (b)
    * singleton assignment is IDENTICAL to [[assignSplit]]'s, and (c) the
    * assignment stays growth-stable: new corpus batches can join a
    * cluster, but an existing cluster's side never changes unless a new
    * pair MERGES components (the same rebuild-on-merge semantics as the
    * clusters themselves).
    *
    * Scale shape: the label table is bounded by the duplicate population;
    * the corpus pays ONE id equi-join against it plus the shuffle-free
    * md5 bucket projection — never a content comparison. */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String, trainPct: Int = 90,
      valPct: Int = 5): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val rep = graft.dedup.ConnectedComponents.label(pairs, aCol, bCol)
      .select(col("id").as(idCol), col("component").as("_rep"))
    val b = splitBucket(coalesce(col("_rep"), col(idCol).cast("long")))
    df.join(rep, Seq(idCol), "left")
      .withColumn("split",
        when(b < trainPct, lit("train"))
          .when(b < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
      .drop("_rep")
  }

  /** Deterministic ~fraction sample by the same id bucketing (keep rows
    * whose bucket < fraction·100, 1% granularity): reproducible across
    * engines and runs, no RNG state, and composable with [[assignSplit]]
    * (both read the same bucket, so a 10% sample of "train" is exactly the
    * sampled ids' train rows). The workhorse for corpus down-mixing:
    * per-source weights = a join supplying `fraction` per group. */
  def deterministicSample(df: DataFrame, idCol: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"invalid fraction $fraction")
    df.where(splitBucket(col(idCol)) < math.round(fraction * 100.0))
  }

  /** Token-budget corpus selection — keep the HIGHEST-scoring documents
    * until a token budget is exhausted (the standard curation shape:
    * "train on the best B tokens"). Selection order is (score DESC,
    * id ASC); a document is kept iff the running token total up to and
    * including it is ≤ `budget`. Output carries `cum_toks`, the global
    * running total, so the cut is auditable.
    *
    * Scale shape — why there is NO global sort: a corpus-wide
    * `orderBy(score)` + running-sum window plans a SINGLE-partition
    * window (the 100 TB anti-pattern). Instead: (1) one hash-groupBy on
    * the score value (bounded: scores are ROUNDED values — quality
    * scores carry 4 decimals, so ≤ ~10k distinct groups; a limit-probe
    * fails loudly past `maxDistinctScores` telling the caller to round
    * coarser), (2) an exclusive prefix-sum over the collected per-score
    * token totals on the driver, (3) a broadcast offsets join + ONE
    * per-score-group window (partitionBy(score), orderBy(id)) to place
    * each document at offset + within-group running sum, (4) a plain
    * filter. Two score-keyed shuffles, zero global sorts; the only skew
    * surface is a single score value owning a huge tie group — the same
    * bounded-tie caveat as [[graft.text.LangModel.pplBuckets]]'s cutoff
    * sample, documented rather than hidden. NULL scores are refused
    * loudly (a NULL would sort nowhere deterministically). */
  def selectByTokenBudget(df: DataFrame, idCol: String, scoreCol: String,
      tokCol: String, budget: Long,
      maxDistinctScores: Int = 100001): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val badScores = df.where(col(scoreCol).isNull ||
      isnan(col(scoreCol).cast("double"))).limit(1).count()
    require(badScores == 0,
      s"selectByTokenBudget: NULL/NaN values in $scoreCol — score every row first")
    val perScore = df.groupBy(col(scoreCol).cast("double").as("_s"))
      .agg(sum(col(tokCol)).cast("long").as("_st"))
      .limit(maxDistinctScores + 1).collect()
    require(perScore.length <= maxDistinctScores,
      s"selectByTokenBudget: more than $maxDistinctScores distinct $scoreCol " +
        "values — round the score so the per-score table stays bounded")
    // exclusive prefix sums in (score DESC) order, on the driver
    var acc = 0L
    val offsets = perScore.map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy(-_._1)
      .map { case (s, t) => val o = acc; acc += t; (s, o) }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF("_s", "_off")
    val w = Window.partitionBy(col(scoreCol)).orderBy(col(idCol).asc)
    df.join(broadcast(offDf), col(scoreCol) === col("_s"))
      .withColumn("cum_toks", col("_off") + sum(col(tokCol)).over(w))
      .where(col("cum_toks") <= budget)
      .drop("_s", "_off")
  }

  /** Per-group deterministic sampling — corpus DOWN-MIXING: each group
    * (source, language, quality band, …) keeps its own fraction, from the
    * SAME id bucketing as [[deterministicSample]]/[[assignSplit]], so the
    * mix composes with splits (a group's sample is exactly the sampled ids'
    * rows) and never migrates documents as the corpus grows. Groups absent
    * from `fractions` keep `defaultFraction`. Implemented as a literal
    * CASE over the group column — shuffle-free, no join, no RNG; the
    * fraction table rides the plan itself (sized for dozens-to-hundreds of
    * groups; a million-group mix would want a broadcast-join variant). */
  def weightedSample(df: DataFrame, idCol: String, groupCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0): DataFrame = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"invalid fraction $f"))
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit(math.round(defaultFraction * 100.0))) {
        case (acc, (g, f)) =>
          when(col(groupCol) === g, lit(math.round(f * 100.0))).otherwise(acc)
      }
    df.where(splitBucket(col(idCol)) < threshold)
  }

  /** Temperature-flattened mixture sampling (the GPT-3 §2.2 / multilingual
    * α-sampling recipe): group g's keep probability is ∝ n_g^(α−1), so the
    * KEPT corpus's group shares go as n_g^α — α = 1 preserves natural
    * proportions, α → 0 equalizes groups, α = 0.5 (the common setting, and
    * the default) is the square-root flatten. `targetFraction` fixes the
    * expected kept size at that fraction of the corpus; a tiny group whose
    * implied probability exceeds 1 is capped there (a filter cannot
    * oversample — the kept corpus then lands slightly under target, the
    * standard behavior; repeat-epoch oversampling is [[epochShuffle]]'s
    * job).
    *
    * Determinism discipline: group counts collect to the driver (bounded
    * by group cardinality), weights fold in GROUP-NAME ORDER with
    * left-associated double arithmetic, α = 0.5 routes through `sqrt`
    * (correctly rounded in IEEE — `pow` is not), and probabilities round
    * to 4 decimals before the 1%-granular md5 bucketing of
    * [[weightedSample]] — every step an oracle can replay bit-for-bit.
    * Same id bucketing as every sampler here: composes with splits, never
    * migrates documents as the corpus grows. */
  def temperatureMix(df: DataFrame, idCol: String, groupCol: String,
      targetFraction: Double, alpha: Double = 0.5): DataFrame = {
    require(targetFraction >= 0.0 && targetFraction <= 1.0,
      s"invalid targetFraction $targetFraction")
    require(alpha >= 0.0 && alpha <= 1.0, s"invalid alpha $alpha")
    val rawCounts = df.groupBy(col(groupCol).cast("string").as("g"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)))
    // fail loudly on null groups: the name-ordered fold would NPE and the
    // bucketing CASE could never match them — silent row loss either way
    rawCounts.collectFirst { case (None, n) => n }.foreach(n =>
      throw new IllegalArgumentException(
        s"temperatureMix: $n rows have a NULL $groupCol — assign them a " +
          "real group (or filter them) before mixing"))
    val counts = rawCounts.map { case (g, n) => g.get -> n }.sortBy(_._1)
    require(counts.nonEmpty, "temperatureMix: empty corpus")
    val w = counts.map { case (g, n) =>
      g -> (if (alpha == 0.5) math.sqrt(n.toDouble)
            else math.pow(n.toDouble, alpha))
    }
    val s = w.foldLeft(0.0)((acc, gw) => acc + gw._2)
    val nTotal = counts.foldLeft(0L)((acc, gn) => acc + gn._2).toDouble
    val fractions = counts.zip(w).map { case ((g, n), (_, wg)) =>
      val p = math.min(1.0, targetFraction * nTotal * wg / (s * n.toDouble))
      g -> math.round(p * 10000.0) / 10000.0
    }.toMap
    weightedSample(df, idCol, groupCol, fractions)
  }

  /** Corpus vocabulary: (token, tf, df) — total occurrences and document
    * frequency per whitespace token. The classic wordcount shape: explode
    * to narrow (id, token) rows, ONE shuffle on token with map-side
    * partial aggregation; distinct-doc counting rides the same exchange
    * (two-phase count-distinct). Downstream of every frequency-based
    * filter (stopword lists, [[graft.dedup.Dedup.simHashVotes]]'s
    * maxTokenDf, boilerplate caps). */
  def vocabulary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        explode(TextOps.tokens(col(textCol))).as("token"))
      // blank/whitespace-only docs tokenize to [''] (split-of-trim
      // semantics); the empty string is not a vocabulary token
      .where(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), count_distinct(col("id")).as("df"))

  /** First-8-hex-of-md5 → base-10 bigint: THE cross-engine reproducibility
    * primitive every deterministic op in this file derives from. The exact
    * derivation (`conv(substring(md5(x),1,8),16,10)::bigint`) is pinned by
    * every oracle SQL — change it here or nowhere. */
  private def md5Prefix(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("bigint")

  /** Stable id → [0, buckets) assignment from the same md5 prefix as
    * [[splitBucket]] (which is `idBucket(id, 100)`): engine-reproducible,
    * shuffle-free, and independent of corpus contents. */
  def idBucket(id: Column, buckets: Int): Column =
    pmod(md5Prefix(id.cast("string")), lit(buckets.toLong))

  /** Per-group document cap — the C4/RefinedWeb "max pages per domain"
    * balancing rule: keep at most `maxPerGroup` docs per group (source,
    * domain, language…), chosen DETERMINISTICALLY by the md5 hash order of
    * ids (ties by id) rather than arrival order, so the kept set is stable
    * across runs and engines and never migrates as the corpus grows —
    * a doc is evicted only when its group gains higher-ranked members.
    *
    * Scale shape: one shuffle on the group column, then a bounded
    * per-group window; group skew (one giant domain) is exactly the skew
    * AQE's skew-join handling and the window's rank short-circuit absorb —
    * output per group is capped, so downstream stages see balanced data. */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String,
      maxPerGroup: Int): DataFrame = {
    require(maxPerGroup >= 1, s"invalid maxPerGroup $maxPerGroup")
    val h = md5Prefix(col(idCol).cast("string"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(h, col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= maxPerGroup).drop("_rk")
  }

  /** Deterministic epoch shuffle — the training-run ordering op: each epoch
    * re-orders the corpus into `shards` hash-bucketed shards with a
    * per-shard position, all derived from (id, epoch) alone via the same
    * md5-prefix derivation as [[idBucket]] with the epoch salted into the
    * hash input. Reproducible across engines and runs (no RNG state, no
    * partition-layout dependence), and every epoch yields an independent
    * order. Output: (idCol, shard, pos), pos 1-based within shard.
    *
    * Scale shape: one shuffle on shard, then the order is a per-shard
    * window — shards ≈ cluster cores at 100 TB, exactly the
    * [[packSequences]] discipline (a single global sort would range-
    * partition fine, but per-shard files are what a training loader
    * consumes anyway). Hash ties break by id, so the order is total. */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
      shards: Int, carry: Seq[String] = Nil): DataFrame = {
    require(epoch >= 0, s"invalid epoch $epoch")
    require(shards >= 1, s"invalid shards $shards")
    val h = md5Prefix(concat(col(idCol).cast("string"), lit(s":$epoch")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("_h"), col(idCol))
    df.select(col(idCol) +: pmod(h, lit(shards.toLong)).as("shard") +:
        h.as("_h") +: carry.map(col): _*)
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_h")
      // pos right after shard, carried payload last — the carry keeps the
      // (id, shard, pos) contract prefix stable for existing callers
      .select(col(idCol) +: col("shard") +: col("pos") +: carry.map(col): _*)
  }

  /** Materialized training-shard sink — the layout a pretraining data
    * loader consumes: [[epochShuffle]]'s deterministic per-epoch order
    * written as `shard=N/` parquet dirs, ONE file per shard, rows stored
    * in shard order (`pos` ascending). Returns a per-shard manifest READ
    * BACK FROM THE WRITTEN FILES — (shard, n_docs, max_pos, n_chars) —
    * so a green manifest proves the write round-trips, not merely that
    * the plan computed.
    *
    * Scale shape: one shuffle (repartition on shard = the
    * [[epochShuffle]] window's own partitioning) + sortWithinPartitions
    * — no global sort; each task streams exactly one shard to exactly
    * one file. Size `shards` for ~100-500 MB files at the target scale
    * (the JSONL interchange twin is
    * [[graft.sources.CorpusSource.writeJsonl]]). */
  def writeShards(df: DataFrame, idCol: String, textCol: String,
      outDir: String, epoch: Int, shards: Int): DataFrame = {
    val a = epochShuffle(df, idCol, epoch, shards, carry = Seq(textCol))
    a.repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    val spark = df.sparkSession
    spark.read.parquet(outDir)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"), max(col("pos")).as("max_pos"),
        sum(length(col(textCol))).cast("long").as("n_chars"))
  }

  /** Hive-partitioned corpus sink — the lake layout (`lang=en/`,
    * `source=cc/`, `split=train/`) every downstream reader prunes with a
    * plain WHERE: one slice predicate touches one directory, not the
    * corpus. Returns a per-slice manifest READ BACK FROM THE WRITTEN
    * FILES — (partCol, n_docs, n_chars, n_files) — same round-trip
    * discipline as [[writeShards]].
    *
    * Scale shape: the write is preceded by ONE shuffle on (slice, salt).
    * Unshuffled `partitionBy` is the classic small-files explosion —
    * every input task opens a writer for every slice it sees, tasks ×
    * slices files; shuffled, a slice's rows land on `filesPerSlice`
    * tasks (md5-salted on the id so skewed slices still spread), so the
    * file count is bounded by slices × filesPerSlice regardless of input
    * partitioning. NULL slice values fail loudly BEFORE any write: hive
    * layouts bury NULLs in a `__HIVE_DEFAULT_PARTITION__` directory that
    * silently vanishes from equality predicates — refuse, don't bury. */
  def writePartitioned(df: DataFrame, idCol: String, textCol: String,
      partCol: String, outDir: String, filesPerSlice: Int = 1): DataFrame = {
    require(filesPerSlice > 0, s"filesPerSlice must be > 0, got $filesPerSlice")
    val nNull = df.where(col(partCol).isNull).limit(1).count()
    require(nNull == 0,
      s"NULL $partCol rows present — a hive layout would bury them in " +
        "__HIVE_DEFAULT_PARTITION__; filter or impute them explicitly first")
    df.repartition(col(partCol),
        pmod(md5Prefix(col(idCol).cast("string")), lit(filesPerSlice.toLong)))
      .write.mode("overwrite").partitionBy(partCol).parquet(outDir)
    df.sparkSession.read.parquet(outDir)
      .groupBy(col(partCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col(textCol))).cast("long").as("n_chars"),
        count_distinct(col("_metadata.file_path")).as("n_files"))
  }

  /** Concat-then-chunk sequence assignment — the GPT-style pretraining
    * packing: documents are laid end-to-end in id order and the stream is
    * cut every `budget` tokens; each doc is assigned the training sequence
    * its FIRST token lands in, plus its offset inside that sequence (a doc
    * may spill into the following sequences — exactly how concat-packing
    * trains; `n_tok` lets the materializer slice the spill).
    *
    * Output: (idCol, shard, seq, off, n_tok). Deterministic: the order is
    * the id order, never an RNG or a partition layout.
    *
    * Scale shape: a running token sum is a WINDOW over the doc order —
    * inherently sequential — so the corpus is first carved into `shards`
    * independent md5-bucketed streams ([[idBucket]]) and the window runs
    * per shard: one shuffle on shard, each shard's sum sequential within
    * its partition, shards in parallel. At 100 TB pick shards ≈ cluster
    * cores; sequences are then globally identified by (shard, seq).
    * shards=1 = one global stream (only for small corpora: a single
    * window partition serializes onto one task). */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budget: Int, shards: Int = 1,
      bpe: Option[graft.text.Bpe.Model] = None): DataFrame = {
    require(budget > 0, s"budget must be > 0, got $budget")
    require(shards > 0, s"shards must be > 0, got $shards")
    // `bpe` routes the budget over REAL subword token counts (one extra
    // codegen'd projection, merge table broadcast in the plan — the scale
    // shape is unchanged) instead of whitespace tokens
    val nTok = bpe.fold(TextOps.tokenCount(col(textCol)))(m =>
      graft.text.Bpe.tokenCount(col(textCol), m))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), idBucket(col(idCol), shards).as("shard"),
        nTok.cast("long").as("n_tok"))
      .withColumn("start_tok", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .select(col(idCol), col("shard"),
        floor(col("start_tok") / budget).as("seq"),
        (col("start_tok") % budget).as("off"), col("n_tok"))
  }

  /** Sliding-window chunking for embedding/RAG prep: split each document
    * into `chunkSize`-token windows advancing by `chunkSize − overlap`
    * tokens, so consecutive chunks share `overlap` tokens of context. The
    * final window is short when the doc doesn't divide evenly; every doc
    * yields at least one chunk; a window that would hold ONLY the previous
    * chunk's overlap tokens is redundant and not emitted (starts stop
    * before `numTok − overlap`). Output: (idCol, chunk_ix, chunk,
    * chunk_tok).
    *
    * Pure per-row projection — tokenize once (let-bound), generate the
    * start offsets, slice and rejoin. No shuffle, no state: runs at scan
    * speed and parallelizes with the input partitioning at any corpus
    * size. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int,
      bpe: Option[graft.text.Bpe.Model] = None): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be > 0, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val step = chunkSize - overlap
    // `bpe` chunks over REAL subword tokens: the window slides over the
    // encoded sequence and chunk text is the concatenation of its
    // subwords (each carries its own leading space, so joining by ''
    // reconstructs readable text; a boundary may fall inside a word —
    // that is what token-level chunking means). Whitespace arm drops the
    // [''] artifact of blank docs (split-of-trim semantics): a blank doc
    // still yields its one chunk, but as ('', chunk_tok=0) — not a
    // phantom 1-token chunk.
    val toks = bpe.fold(filter(TextOps.tokens(col(textCol)), t => t =!= ""))(
      m => graft.text.Bpe.encode(col(textCol), m))
    val sep = if (bpe.isDefined) "" else " "
    df.select(col(idCol), toks.as("t"))
      .select(col(idCol), col("t"),
        posexplode(sequence(lit(0),
          greatest(size(col("t")) - overlap - 1, lit(0)),
          lit(step))).as(Seq("chunk_ix", "s")))
      .select(col(idCol), col("chunk_ix").cast("long").as("chunk_ix"),
        array_join(slice(col("t"), col("s") + 1, lit(chunkSize)), sep).as("chunk"),
        least(size(col("t")) - col("s"), lit(chunkSize)).cast("long").as("chunk_tok"))
  }
}
