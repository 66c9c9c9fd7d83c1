package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Cross-slice n-gram overlap matrix — the "how much do these sources
 * share" report run BEFORE mixing corpora: two crawl dumps covering the
 * same sites, a vendor reselling a scrape, a benchmark leaking into a
 * source. For every unordered source pair: distinct-n-gram intersection,
 * Jaccard, and per-side containment (containment is the asymmetric signal
 * — a small source fully contained in a big one has tiny Jaccard but
 * containment ≈ 1). An extension beyond the reference's surface (it has
 * no corpus analytics); the dataset-overlap shape of Lee et al. 2022 §5 /
 * Dodge et al. 2021 (C4 contamination audit).
 *
 * Scale shape: a source's distinct-gram set is vocabulary-sized, so the
 * matrix is computed on 8-byte xxhash64 gram hashes — ONE native
 * [[org.apache.spark.sql.graftbridge.NgramHash]] pass per row (no gram
 * string is ever allocated), then distinct (source, hash) rows are the
 * only corpus-sized shuffle (8 bytes + a dictionary-coded source). The
 * pair expansion groups by hash first: a hash's source set is bounded by
 * G (= #sources, dozens), single-source hashes — the overwhelming
 * majority — are dropped BEFORE any pair is formed, and the expansion
 * emits ≤ G(G-1)/2 rows per surviving hash into a map-side-combined
 * count. Output is the full G(G-1)/2 matrix (zero-overlap pairs included,
 * via a cross of the G-row size table — G is dozens, the cross is free).
 * Collision tradeoff: same ~2^-64-per-pair xxhash64 acceptance the
 * datacard and heavy-hitters ops document.
 */
object Overlap {

  /** Token-distribution drift between slices — the "did this dump shift
    * under me" monitor run between corpus versions / crawl dumps: for
    * every slice pair, unigram-distribution L1 distance (= 2× total
    * variation; 0 identical, 2 disjoint) plus vocabulary sizes and
    * vocabulary Jaccard. L1 over division-only arithmetic is chosen over
    * KL/JS deliberately: +,−,×,÷ are exact-rounded IEEE, so both engines
    * compute bit-identical per-term doubles and the oracle can replay the
    * sum — log implementations differ in the last ulp across engines and
    * would make the gate flaky by construction.
    *
    * Scale + exactness shape: token counts shuffle once as (slice, 8-byte
    * hash, count); the pair expansion touches SHARED tokens only (the
    * one-sided mass folds in algebraically: Σ_only-a c/N = 1 − shared_a/N_a,
    * so tokens unique to one slice never pair). Per-term |p−q| values are
    * rounded to 12 dp and summed as DECIMAL — parallel aggregation order
    * cannot flip the reported 4 dp rounding. Same xxhash64 collision
    * acceptance as [[overlapMatrix]]. */
  def tokenDrift(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, NgramHashCounts}
    // whitespace-only docs tokenize to [''] (split-of-trim semantics) —
    // the empty string is not a token; a slice with NO tokens at all has
    // no distribution and is excluded (L1 against nothing is undefined)
    // counts feeds BOTH totals and the pair expansion; left lazy ON
    // PURPOSE — the two consumers share one plan, so ReuseExchange serves
    // both from a single shuffle (an eager localCheckpoint here was
    // measured SLOWER at 500k docs: 27.8 → 33.9 s — it broke the exchange
    // reuse and paid a materialization for nothing).
    // The explode emits PER-DOC (hash, count) pairs (NgramHashCounts —
    // the per-doc aggregation folded into the kernel), not raw
    // occurrences: the row stream into the partial aggregation shrinks by
    // the per-document token duplication factor; Σc per (g, h) is
    // value-identical to counting occurrence rows.
    val counts = df.where(col(groupCol).isNotNull &&
        trim(col(textCol)) =!= "")
      .select(col(groupCol).as("g"),
        explode(ColumnBridge.column(NgramHashCounts(
          ColumnBridge.expression(graft.text.TextOps.tokens(col(textCol))),
          1))).as("p"))
      .groupBy(col("g"), col("p.h").as("h")).agg(sum(col("p.c")).as("c"))
    val totals = counts.groupBy("g")
      .agg(sum(col("c")).as("n"), count(lit(1)).as("v")) // token mass, vocab
    // shared-token pair rows: per hash, ordered pairs of the (g, c) set
    val sets = counts.groupBy("h")
      .agg(array_sort(collect_list(struct(col("g"), col("c")))).as("gc"))
      .where(size(col("gc")) > 1)
    val pairs = sets
      .select(explode(flatten(transform(col("gc"), (x, i) =>
        transform(slice(col("gc"), i + lit(2), size(col("gc"))),
          y => struct(x.getField("g").as("a"), y.getField("g").as("b"),
            x.getField("c").as("ca"), y.getField("c").as("cb")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"),
        col("p.ca").as("ca"), col("p.cb").as("cb"))
    val ta = broadcast(totals.select(col("g").as("a"),
      col("n").as("na"), col("v").as("va")))
    val tb = broadcast(totals.select(col("g").as("b"),
      col("n").as("nb"), col("v").as("vb")))
    val shared = pairs.join(ta, "a").join(tb, "b")
      .withColumn("_t",
        round(abs(col("ca").cast("double") / col("na") -
          col("cb").cast("double") / col("nb")), 12).cast("decimal(24,12)"))
      .groupBy("a", "b")
      .agg(sum(col("_t")).as("_l1s"), sum(col("ca")).as("_sa"),
        sum(col("cb")).as("_sb"), count(lit(1)).as("shared_vocab"))
    // full matrix incl. disjoint pairs (shared sums 0, l1 = 2)
    ta.crossJoin(tb).where(col("a") < col("b"))
      .join(shared, Seq("a", "b"), "left")
      .select(col("a"), col("b"), col("va").as("vocab_a"), col("vb").as("vocab_b"),
        coalesce(col("shared_vocab"), lit(0L)).as("shared_vocab"),
        round(coalesce(col("shared_vocab"), lit(0L)).cast("double") /
          (col("va") + col("vb") - coalesce(col("shared_vocab"), lit(0L))), 4)
          .as("vocab_jaccard"),
        round(coalesce(col("_l1s").cast("double"), lit(0.0)) +
          (lit(1.0) - coalesce(col("_sa"), lit(0L)).cast("double") / col("na")) +
          (lit(1.0) - coalesce(col("_sb"), lit(0L)).cast("double") / col("nb")), 4)
          .as("l1_dist"))
  }

  /** Row-level corpus version diff — the "what exactly changed between
    * dumps" companion to [[tokenDrift]]'s distribution view: one output
    * row per added / removed / content-changed document id, unchanged
    * docs omitted (at 100 TB the diff IS the small output; emitting
    * unchanged rows would make the diff corpus-sized). Content equality
    * is the datacard fingerprint pair (xxhash64 + length — two
    * independent 8-byte channels), so document bodies never cross the
    * shuffle: ONE co-partitioned full-outer join on the id carries 24
    * bytes per side. Duplicate ids within a version are caller error and
    * fail loudly — a diff over an ambiguous id space has no meaning. */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def fp(df: DataFrame, side: String) =
      df.select(col(idCol).as("id"),
          struct(xxhash64(col(textCol)), length(col(textCol))).as(s"_h$side"))
        .groupBy("id")
        .agg(count(lit(1)).as(s"_c$side"), first(col(s"_h$side")).as(s"_h$side"))
    // the duplicate-id guard rides the SAME pass as a raise_error branch —
    // a separate count-based require would add two corpus scans for a
    // condition that is almost always false
    val dup = col("_co") > 1 || col("_cn") > 1 // null-safe: outer-join nulls fall through
    fp(oldDf, "o").join(fp(newDf, "n"), Seq("id"), "full_outer")
      .select(col("id"),
        when(dup, raise_error(concat(
            lit(s"duplicate $idCol in corpus diff input: "),
            col("id").cast("string"))).cast("string"))
          .when(col("_ho").isNull, lit("added"))
          .when(col("_hn").isNull, lit("removed"))
          .when(col("_ho") =!= col("_hn"), lit("changed"))
          .as("status"))
      .where(col("status").isNotNull)
  }

  /** Pairwise overlap of distinct word n-grams between values of
    * `groupCol`: (a, b, n_a, n_b, inter_grams, jaccard, containment_a,
    * containment_b) for every pair a < b of group values. `n_x` is the
    * side's distinct-gram count; `containment_x` = inter / n_x; ratios are
    * 0.0 (never NULL/NaN) when a side has no grams. Rows with a NULL
    * group are excluded — NULL is not a source. */
  def overlapMatrix(df: DataFrame, groupCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    import org.apache.spark.sql.graftbridge.{ColumnBridge, NgramHashCounts}
    // per-doc-DISTINCT hashes from the RLE kernel (counts dropped): the
    // explode feeding the corpus-sized (source, 8-byte hash) distinct
    // shrinks by the per-document gram duplication factor — the same
    // rework as tokenDrift's counts, pinned by the same differential
    val gh = df.where(col(groupCol).isNotNull)
      .select(col(groupCol).as("g"),
        explode(ColumnBridge.column(NgramHashCounts(
          ColumnBridge.expression(graft.text.TextOps.tokens(col(textCol))),
          n))).as("p"))
      .select(col("g"), col("p.h").as("h"))
      .distinct() // the one corpus-sized shuffle: (source, 8-byte hash)
    // G rows; seeded from the INPUT's distinct groups, not gh — a group
    // whose every doc is shorter than n contributes no gram row at all,
    // but the matrix must still report its pairs (as zeros), not drop it
    val sizes = df.where(col(groupCol).isNotNull)
      .select(col(groupCol).as("g")).distinct()
      .join(gh.groupBy("g").agg(count(lit(1)).as("cnt")), Seq("g"), "left")
      .select(col("g"), coalesce(col("cnt"), lit(0L)).as("sz"))
    // per-hash source sets (≤ G each); single-source hashes — the
    // overwhelming majority — are dropped before any pair exists
    val sets = gh.groupBy("h").agg(collect_set(col("g")).as("gs"))
      .where(size(col("gs")) > 1)
      .select(array_sort(col("gs")).as("gs"))
    // ordered-pair expansion inside the row (x before y in the sorted
    // set), then a map-side-combined count per (a, b)
    val inter = sets
      .select(explode(flatten(transform(col("gs"), (x, i) =>
        transform(slice(col("gs"), i + lit(2), size(col("gs"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("inter"))
    // full matrix: cross the G-row size table with itself, attach inter
    val left = sizes.select(col("g").as("a"), col("sz").as("n_a"))
    val right = sizes.select(col("g").as("b"), col("sz").as("n_b"))
    val ratio = (num: org.apache.spark.sql.Column,
        den: org.apache.spark.sql.Column) =>
      round(when(den > 0, num.cast("double") / den).otherwise(0.0), 4)
    left.crossJoin(right).where(col("a") < col("b"))
      .join(inter, Seq("a", "b"), "left")
      .withColumn("inter_grams", coalesce(col("inter"), lit(0L)))
      .select(col("a"), col("b"), col("n_a"), col("n_b"), col("inter_grams"),
        ratio(col("inter_grams"),
          col("n_a") + col("n_b") - col("inter_grams")).as("jaccard"),
        ratio(col("inter_grams"), col("n_a")).as("containment_a"),
        ratio(col("inter_grams"), col("n_b")).as("containment_b"))
  }
}
