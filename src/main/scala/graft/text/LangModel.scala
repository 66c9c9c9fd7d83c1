package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the CCNet/Gopher
  * perplexity-filter step of an LLM data pipeline: train bigram statistics
  * over a REFERENCE corpus (CCNet uses Wikipedia), score any corpus by the
  * average negative log-likelihood of its bigrams, and let callers drop
  * the high-perplexity tail (gibberish, OCR noise, boilerplate soup,
  * out-of-domain text). The reference engine has no text operators; this
  * is a SURVEY §2.7 extension built from public technique (add-k-smoothed
  * conditional MLE).
  */
object LangModel {

  /** A trained bigram model: three unmaterialized plans (bigram counts
    * keyed by 64-bit hash, context counts, one-row vocabulary size) plus
    * the smoothing constant. Plans, not collections — training composes
    * lazily into every scoring query, and Spark caches/reuses the
    * aggregation across scores if the caller persists them. */
  final case class BigramModel(bigramCounts: DataFrame,
      contextCounts: DataFrame, vocab: DataFrame, k: Double) {
    /** Cache the three count plans — REQUIRED before scoring repeatedly
      * (a streaming query scores every micro-batch: without this each
      * batch re-runs the full training aggregation over the reference
      * corpus). Lazy like any persist: materialized by the first score. */
    def persist(): this.type = {
      bigramCounts.persist(); contextCounts.persist(); vocab.persist(); this
    }
    def unpersist(): Unit = {
      bigramCounts.unpersist(false); contextCounts.unpersist(false)
      vocab.unpersist(false); ()
    }
    /** Memoized collect-arm decision + broadcast tables ([[score]]):
      * Some(bc) once collected, None once judged too big — either way the
      * probe never re-runs for this model instance (a streaming sink
      * scores every micro-batch through the same model). */
    @transient private[text] var kernelArm:
      Option[Option[org.apache.spark.broadcast.Broadcast[
        org.apache.spark.sql.graftbridge.BigramTables]]] = None
  }

  /** (id, context-hash, bigram-hash) per adjacent token pair; xxhash64
    * over two columns chains per-value seeds, so ("ab","c") and ("a","bc")
    * stay distinct. */
  private def bigramsOf(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col("id"), explode(transform(
        sequence(lit(1), size(col("tk")) - 1),
        i => struct(
          element_at(col("tk"), i).as("w1"),
          element_at(col("tk"), i + 1).as("w2")))).as("p"))
      .select(col("id"),
        xxhash64(col("p.w1")).as("hu"),
        xxhash64(col("p.w1"), col("p.w2")).as("hb"))

  /** Train add-k-smoothed bigram statistics on `corpus`:
    *
    *   P(w2|w1) = (c(w1,w2) + k) / (c(w1·) + k·V)
    *
    * with `c(w1·)` the bigram-context count (so probabilities sum to 1
    * over the vocabulary) and `V` the corpus' distinct-token count.
    *
    * Scale shape: both count tables are hash-groupBys whose map-side
    * partial aggregation absorbs stopword-pair skew, bounded by DISTINCT
    * bigrams/tokens, not corpus size; all keys are 64-bit xxhash64 —
    * token strings never ride a shuffle (a hash collision merges two
    * bigrams' counts: statistical noise for a scoring op, absent at
    * oracle scales). The vocabulary size is a broadcast one-row
    * aggregate, not a driver-side collect, so construction stays lazy. */
  def train(corpus: DataFrame, idCol: String, textCol: String,
      k: Double = 1.0): BigramModel = {
    require(k > 0, s"smoothing k must be > 0, got $k")
    val bg = bigramsOf(corpus, idCol, textCol)
    BigramModel(
      bg.groupBy("hb").agg(count(lit(1)).as("c2")),
      bg.groupBy("hu").agg(count(lit(1)).as("c1")),
      corpus.select(explode(TextOps.tokens(col(textCol))).as("tok"))
        .agg(count_distinct(xxhash64(col("tok"))).as("V")),
      k)
  }

  /** Score `docs` under a trained model: (idCol, ppl) where
    * ppl = exp(mean −ln P) rounded to 4 places. Bigrams and contexts the
    * model never saw coalesce to count 0 — add-k smoothing prices them at
    * k/(c(w1·)+k·V), so out-of-domain text scores HIGH rather than
    * failing. Documents with fewer than two tokens have no bigrams and
    * are absent from the output.
    *
    * Scale shape — ADAPTIVE on model size (corpus size never matters):
    * the count tables are bounded by DISTINCT bigrams; a limit-collect
    * probe (bounded driver memory by construction) collects models up to
    * `maxCollectBigrams` rows, ships them as one ordinary Spark
    * broadcast, and scores each doc inside the native
    * [[org.apache.spark.sql.graftbridge.BigramPpl]] kernel — a pure
    * narrow map, no explode/join/shuffle, stream-safe. Models past the
    * bound take [[scoreViaJoin]]: one narrow (id, 8-byte, 8-byte) row
    * per scored bigram through two hash left-joins (AQE absorbs hot-
    * bigram skew) and one per-doc aggregation. The decision memoizes on
    * the model instance, so per-micro-batch scoring probes once. */
  def score(model: BigramModel, docs: DataFrame, idCol: String,
      textCol: String, maxCollectBigrams: Int = 4000000): DataFrame = {
    val arm = model.kernelArm.getOrElse {
      val probe = model.bigramCounts.limit(maxCollectBigrams + 1).collect()
      val a = if (probe.length > maxCollectBigrams) None
      else {
        val bg = probe.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        // contexts are distinct w1 values — never more than distinct
        // bigrams, so this collect is covered by the probe's bound
        val cx = model.contextCounts.collect()
          .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        val v = model.vocab.collect()(0).getLong(0)
        Some(docs.sparkSession.sparkContext.broadcast(
          new org.apache.spark.sql.graftbridge.BigramTables(
            bg.map(_._1), bg.map(_._2), cx.map(_._1), cx.map(_._2),
            v, model.k)))
      }
      model.kernelArm = Some(a)
      a
    }
    arm match {
      case Some(bc) =>
        import org.apache.spark.sql.graftbridge.{BigramPpl, ColumnBridge}
        val nll = ColumnBridge.column(BigramPpl(
          ColumnBridge.expression(TextOps.tokens(col(textCol))), bc))
        // filter on a CHEAP token-count split, not on the kernel output —
        // a kernel-referencing Filter under the Project would evaluate
        // the kernel twice per row (Filter copy + Project copy; the
        // alias-in-own-Project below survives CollapseProject because
        // a non-cheap alias referenced twice never inlines)
        docs.where(col(textCol).isNotNull &&
            size(TextOps.tokens(col(textCol))) >= 2)
          .select(col(idCol).as("id"), nll.as("s"))
          .select(col("id").as(idCol),
            round(exp(element_at(col("s"), 1) / element_at(col("s"), 2)), 4)
              .as("ppl"))
      case None => scoreViaJoin(model, docs, idCol, textCol)
    }
  }

  /** The join formulation of [[score]] — the arm for models past the
    * collect bound, and the independent reference the kernel arm is
    * pinned against (LangModelSpec). */
  private[text] def scoreViaJoin(model: BigramModel, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val k = model.k
    bigramsOf(docs, idCol, textCol)
      .join(model.bigramCounts, Seq("hb"), "left")
      .join(model.contextCounts, Seq("hu"), "left")
      .crossJoin(broadcast(model.vocab))
      .select(col("id"),
        (-log((coalesce(col("c2"), lit(0L)) + lit(k)) /
          (coalesce(col("c1"), lit(0L)) + lit(k) * col("V")))).as("nll"))
      .groupBy("id")
      .agg(round(exp(avg(col("nll"))), 4).as("ppl"))
      .select(col("id").as(idCol), col("ppl"))
  }

  /** Self-scoring convenience: train on `docs` and score `docs` — every
    * scored bigram exists in the model, so the left joins behave as inner
    * and the result matches the one-corpus formulation exactly. */
  def bigramPerplexity(docs: DataFrame, idCol: String, textCol: String,
      k: Double = 1.0): DataFrame =
    score(train(docs, idCol, textCol, k), docs, idCol, textCol)

  /** CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020 §4.3:
    * each language's corpus splits into equal thirds by LM perplexity;
    * training recipes then keep the head, or reweight by bucket). Input is
    * a SCORED frame ([[score]]'s (id, ppl) shape); output adds a `bucket`
    * column ∈ head | middle | tail.
    *
    * Scale shape — why thresholds come from a sample: exact corpus-wide
    * tertiles need a global sort, which is the one shape this library
    * refuses on a 100 TB corpus. CCNet itself computes cutoffs on a
    * held-out slice and applies them as constants; here the slice is the
    * deterministic md5 sample ([[graft.pipeline.Corpus
    * .deterministicSample]] — growth-stable, no RNG), the slice alone is
    * NTILE(3)-ranked (ordered by (ppl, id) so ties can't float between
    * engines; the global window sorts ONLY the bounded sample), and the
    * two resulting cutoffs broadcast into a per-row CASE — the corpus
    * itself is never sorted or shuffled. Sample rows at a cutoff may land
    * one bucket away from their own tile rank (boundary ties go low);
    * that is CCNet's behavior too — the cutoffs are the contract, not the
    * tile assignment. Fewer than 3 sample rows degenerate deterministically
    * (missing upper tiles reuse the last cutoff; middle empties out). */
  def pplBuckets(scored: DataFrame, idCol: String, pplCol: String,
      sampleFraction: Double = 0.2,
      maxSampleRows: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fractionSample = graft.pipeline.Corpus
      .deterministicSample(scored, idCol, sampleFraction)
    // the fraction alone scales LINEARLY with the corpus — at 100 TB a 20%
    // slice through a single-partition ntile window is billions of rows in
    // one task. Cap the slice ABSOLUTELY (the Faiss/PQ-training
    // discipline: cutoff quality saturates long before 1M points): when
    // the fraction sample exceeds `maxSampleRows`, thin it again with a
    // finer-grained deterministic hash threshold (ppm, not the sampler's
    // 1% buckets — 1% of 100 TB is still too big). Deterministic given the
    // data; ~maxSampleRows survivors (binomial spread is irrelevant to
    // cutoff quality). Test/sf corpora sit far below the cap, so cutoffs
    // there are byte-identical to the uncapped formulation.
    val n = fractionSample.count()
    val sample =
      if (n <= maxSampleRows) fractionSample
      else {
        val ppm = math.round(maxSampleRows.toDouble / n * 1e6)
        fractionSample.where(
          pmod(xxhash64(col(idCol)), lit(1000000L)) < ppm)
      }
    val w = Window.orderBy(col(pplCol), col(idCol))
    val cuts = sample.withColumn("_tile", ntile(3).over(w))
      .groupBy("_tile").agg(max(col(pplCol)).as("cut"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    require(cuts.nonEmpty,
      s"pplBuckets: the $sampleFraction sample of the scored corpus is " +
        "empty — score a non-empty corpus or raise the fraction")
    val t1 = cuts(1) // tile 1 always exists on a non-empty sample
    val t2 = cuts.getOrElse(2, t1)
    scored.withColumn("bucket",
      when(col(pplCol) <= t1, lit("head"))
        .when(col(pplCol) <= t2, lit("middle"))
        .otherwise(lit("tail")))
  }
}
