package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge, NbModelTable, NbScore}

/**
 * Classifier-based document filtering — the supervised quality/domain
 * classifier step of the published LLM-data pipelines (GPT-3 trained a
 * logistic classifier against WebText, Brown et al. 2020 §A; CCNet and
 * fastText-style filters use hashed bag-of-n-gram linear models, Joulin
 * et al. 2017). The engine's variant is multinomial Naive Bayes over the
 * SAME hashed unigram+bigram bucket space as [[Dsir]] — exact count
 * arithmetic, so training is two bounded groupBys and the model is
 * reproducible in any engine (the md5-prefix bucket derivation is the
 * house-wide pinned one, `Corpus.idBucket`). The reference engine has no
 * classifier; SURVEY §2.7 extension from the published technique.
 *
 * Scale shape:
 *  - TRAIN touches the labeled corpus once: explode features → one
 *    hash-groupBy with map-side combine onto (label, bucket), a table
 *    bounded by classes × buckets (C·B ≤ a few hundred k rows), never by
 *    corpus size. Doc/label priors are one more bounded groupBy.
 *  - PREDICT collects the model-bounded tables once and scores each doc
 *    inside one native kernel ([[org.apache.spark.sql.graftbridge
 *    .NbScore]]) carrying the flat ln-count table as a single array
 *    reference: a pure narrow map over the corpus — no explode, no
 *    join, no shuffle. Nothing corpus-sized ever moves to meet the
 *    model; nothing moves at all.
 *
 * Determinism discipline: scores are doubles (sums of ln terms whose
 * partial-aggregation order Spark does not fix), so the argmax ranks on
 * the 6-place-ROUNDED score with the class label as tie-break — the same
 * pinned-rounding idiom as the hybrid RRF fusion — and reported scores
 * round at 4 places like every score surface in the engine.
 */
object Classify {

  /** Naive Bayes model: per-(label, bucket) feature counts plus
    * per-label totals and document counts, all vocabulary/class-bounded.
    *   schema: (label, b, c)  and  (label, nf, ndoc) via [[Model]]. */
  final case class Model(bucketCounts: DataFrame, classTotals: DataFrame,
      buckets: Int, k: Double)

  /** Hashed unigram+bigram feature occurrences — [[Dsir]]'s exact
    * derivation, shared so the two operators read one feature space. */
  private def features(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    docs.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("tk"))
      .select(col("id"), explode(concat(col("tk"),
        when(size(col("tk")) >= 2,
          transform(sequence(lit(1), size(col("tk")) - 1),
            i => concat_ws(" ",
              element_at(col("tk"), i), element_at(col("tk"), i + 1))))
          .otherwise(array().cast("array<string>")))).as("f"))
      .select(col("id"),
        graft.pipeline.Corpus.idBucket(col("f"), buckets).as("b"))

  /** Train on a labeled corpus: (idCol, textCol, labelCol) → [[Model]].
    * Two bounded groupBys; the corpus is read once per table (Catalyst
    * shares the scan when both frames materialize in one action). */
  def trainNaiveBayes(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, buckets: Int = 10007, k: Double = 1.0): Model = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(k > 0, s"smoothing k must be > 0, got $k")
    // features with the label carried through the projection — re-joining
    // the corpus to itself on the doc id would be a gratuitous shuffle
    val feat = docs
      .select(col(idCol).as("id"), col(labelCol).cast("string").as("label"),
        TextOps.tokens(col(textCol)).as("tk"))
      .select(col("id"), col("label"), explode(concat(col("tk"),
        when(size(col("tk")) >= 2,
          transform(sequence(lit(1), size(col("tk")) - 1),
            i => concat_ws(" ",
              element_at(col("tk"), i), element_at(col("tk"), i + 1))))
          .otherwise(array().cast("array<string>")))).as("f"))
      .select(col("id"), col("label"),
        graft.pipeline.Corpus.idBucket(col("f"), buckets).as("b"))
    val bucketCounts = feat.groupBy("label", "b")
      .agg(count(lit(1)).as("c"))
    val classTotals = feat.groupBy("label")
      .agg(count(lit(1)).as("nf"), count_distinct(col("id")).as("ndoc"))
    Model(bucketCounts, classTotals, buckets, k)
  }

  /** Per-document class posteriors (log scale, add-k smoothed):
    *
    *   score(d, c) = ln p̂(c) + Σ_{f ∈ d} ln (cnt(c, b_f) + k)
    *               − |d| · ln (nf_c + k·B)
    *
    * Output: (idCol, pred, score, margin) — argmax label, its 4-place
    * log-posterior, and the 4-place gap to the runner-up (the filter
    * confidence knob; margin is NULL for single-class models).
    *
    * Shape: the model is COLLECTED — class totals are C rows, bucket
    * counts ≤ B·C rows, both model-bounded, never corpus-bounded — and
    * baked into ONE native kernel ([[org.apache.spark.sql.graftbridge
    * .NbScore]]) whose flat ln(cnt+k) table rides the expression as a
    * single array reference. Corpus scoring is then a pure NARROW MAP:
    * tokenize, fold every hashed unigram+bigram's C table entries into
    * per-class sums inside the kernel, argmax over C slots — no explode,
    * no join, NO SHUFFLE at any corpus size. Lineage of this shape: the
    * first cut exploded features × C classes (95 s at 500k docs), the
    * second kept the explode but pivoted the model to C broadcast
    * columns and shuffled one row per doc (10-32 s); the kernel removes
    * the remaining explode + shuffle entirely (the per-doc work IS the
    * arithmetic). The shuffle formulation survives as
    * [[predictViaShuffle]], pinned equal in ClassifySpec. */
  def predict(model: Model, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val bkts = model.buckets
    val k = model.k
    val (labels, totals, ntot) = collectTotals(model)
    val c = labels.length
    // flat [bucket][class] ln(cnt+k) with the ln(k) smoothing floor for
    // unseen pairs — same double math as log(coalesce(cnt,0)+k)
    val lnTable = Array.fill(bkts * c)(math.log(k))
    val labelIdx = labels.zipWithIndex.toMap
    model.bucketCounts.collect().foreach { r =>
      lnTable(r.getLong(1).toInt * c + labelIdx(r.getString(0))) =
        math.log(r.getLong(2).toDouble + k)
    }
    val tbl = new NbModelTable(lnTable, bkts, c)
    val nb = ColumnBridge.column(NbScore(
      ColumnBridge.expression(TextOps.tokens(col(textCol))), tbl))
    // null text produced no feature rows under explode (doc absent from
    // the output); the kernel path drops those docs explicitly
    val sums = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), nb.as("nb"))
      .select(col("id") +:
        (labels.indices.map(i => element_at(col("nb"), i + 1).as(s"t$i")) :+
          element_at(col("nb"), c + 1).as("dlen")): _*)
    scoreSums(sums, labels, totals, ntot, bkts, k, idCol)
  }

  /** The pre-kernel predict shape — explode features, broadcast-join the
    * model pivoted to C dense columns, fold one map-side-combined
    * groupBy(id) — kept as the independent Spark-native formulation the
    * kernel is differentially pinned against (ClassifySpec). */
  private[text] def predictViaShuffle(model: Model, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val bkts = model.buckets
    val k = model.k
    val (labels, totals, ntot) = collectTotals(model)
    // bucket table → C dense columns (null = zero count), positional
    // names so label strings never have to survive column-name quoting
    val pivoted = model.bucketCounts.groupBy("b")
      .pivot("label", labels).agg(first(col("c")))
      .toDF("b" +: labels.indices.map(i => s"c$i"): _*)
    val rawF = features(docs, idCol, textCol, bkts)
    val joined = rawF.join(broadcast(pivoted), Seq("b"), "left")
    // Σ ln(cnt+k) per class plus the doc's feature count, in one hash
    // aggregate — zero-count buckets land on the ln(k) smoothing floor
    // via coalesce, absent buckets via the left join's nulls
    val aggs = labels.indices.map(i =>
      sum(log(coalesce(col(s"c$i"), lit(0L)).cast("double") + lit(k)))
        .as(s"t$i")) :+ count(lit(1)).as("dlen")
    val sums = joined.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    scoreSums(sums, labels, totals, ntot, bkts, k, idCol)
  }

  /** Model-bounded collects shared by both predict paths: sorted class
    * list with (nf, ndoc) totals, and the prior denominator. */
  private def collectTotals(model: Model)
      : (Seq[String], Array[(String, Long, Long)], Double) = {
    val totals = model.classTotals.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(totals.nonEmpty, "Classify: model has no classes")
    (totals.map(_._1).toSeq, totals, totals.map(_._3).sum.toDouble)
  }

  /** (id, t0..tC-1, dlen) → (idCol, pred, score, margin): the score
    * assembly + 6-place-rounded argmax shared by both predict paths. */
  private def scoreSums(sums: DataFrame, labels: Seq[String],
      totals: Array[(String, Long, Long)], ntot: Double, bkts: Int,
      k: Double, idCol: String): DataFrame = {
    val scoreCols = labels.indices.map { i =>
      val (_, nf, ndoc) = totals(i)
      (lit(math.log(ndoc / ntot)) + col(s"t$i") -
        col("dlen") * lit(math.log(nf + k * bkts))).as(s"s$i")
    }
    // argmax on the 6-place-rounded score (ties by label) — FP sum order
    // must not decide the winner. array_sort on (-rounded, label) is the
    // window-free equivalent of rank-then-filter over C entries.
    val scored = sums.select(col("id") +: scoreCols: _*)
    val sorted = array_sort(array(labels.indices.map(i =>
      struct((-round(col(s"s$i"), 6)).as("nr"), lit(labels(i)).as("label"),
        col(s"s$i").as("s"))): _*))
    val top = element_at(sorted, 1)
    val margin = if (labels.length >= 2)
      round(top.getField("s") - element_at(sorted, 2).getField("s"), 4)
    else lit(null).cast("double")
    scored.select(col("id").as(idCol), top.getField("label").as("pred"),
      round(top.getField("s"), 4).as("score"), margin.as("margin"))
  }
}
