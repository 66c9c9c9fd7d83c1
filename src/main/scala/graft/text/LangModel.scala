package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the CCNet/Gopher
  * perplexity-filter step of an LLM data pipeline: train bigram statistics
  * over the corpus, score every document by the average negative
  * log-likelihood of its bigrams, and let callers drop the high-perplexity
  * tail (gibberish, OCR noise, boilerplate soup). The reference engine has
  * no text operators; this is a SURVEY §2.7 extension built from public
  * technique (add-k-smoothed conditional MLE).
  */
object LangModel {

  /** Per-document bigram perplexity under an add-k-smoothed conditional
    * model trained on THIS corpus:
    *
    *   P(w2|w1) = (c(w1,w2) + k) / (c(w1·) + k·V)
    *
    * with `c(w1·)` the bigram-context count (so probabilities sum to 1
    * over the vocabulary) and `V` the distinct-token count. Output:
    * (idCol, ppl) where ppl = exp(mean −ln P) rounded to 4 places.
    * Documents with fewer than two tokens have no bigrams and are absent
    * from the output.
    *
    * Scale shape: bigram and context counts are hash-groupBys whose
    * map-side partial aggregation absorbs stopword-pair skew; both count
    * tables are bounded by DISTINCT bigrams/tokens, not corpus size. All
    * grouping and scoring joins key on 64-bit xxhash64 of the tokens —
    * token strings never ride a shuffle (a hash collision merges two
    * bigrams' counts: statistical noise for a scoring op, and absent at
    * oracle scales). The vocabulary size joins the plan as a broadcast
    * one-row aggregate, not a driver-side collect, so construction stays
    * lazy. The scoring join shuffles one narrow (id, 8-byte, 8-byte) row
    * per corpus bigram — the one corpus-wide move — and skewed hot
    * bigrams are exactly what AQE's skew-join splitting handles. */
  def bigramPerplexity(docs: DataFrame, idCol: String, textCol: String,
      k: Double = 1.0): DataFrame = {
    require(k > 0, s"smoothing k must be > 0, got $k")
    val toks = docs.select(col(idCol).as("id"),
      TextOps.tokens(col(textCol)).as("tk"))
    // (id, context-hash, bigram-hash) per adjacent token pair; xxhash64
    // over two columns chains per-value seeds, so ("ab","c") and
    // ("a","bc") stay distinct
    val bg = toks.where(size(col("tk")) >= 2)
      .select(col("id"), explode(transform(
        sequence(lit(1), size(col("tk")) - 1),
        i => struct(
          element_at(col("tk"), i).as("w1"),
          element_at(col("tk"), i + 1).as("w2")))).as("p"))
      .select(col("id"),
        xxhash64(col("p.w1")).as("hu"),
        xxhash64(col("p.w1"), col("p.w2")).as("hb"))
    val bigramCounts = bg.groupBy("hb").agg(count(lit(1)).as("c2"))
    val contextCounts = bg.groupBy("hu").agg(count(lit(1)).as("c1"))
    val vocab = toks.select(explode(col("tk")).as("tok"))
      .agg(count_distinct(xxhash64(col("tok"))).as("V"))
    bg.join(bigramCounts, Seq("hb"))
      .join(contextCounts, Seq("hu"))
      .crossJoin(broadcast(vocab))
      .select(col("id"),
        (-log((col("c2") + lit(k)) / (col("c1") + lit(k) * col("V")))).as("nll"))
      .groupBy("id")
      .agg(round(exp(avg(col("nll"))), 4).as("ppl"))
      .select(col("id").as(idCol), col("ppl"))
  }
}
