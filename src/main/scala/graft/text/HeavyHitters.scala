package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-wide n-gram heavy hitters — the "what are the k most frequent
 * n-grams" profiling op every web-corpus curation run wants (boilerplate
 * detection, contamination fingerprints, blocklist candidates). An
 * extension beyond the reference's surface per the north-star brief.
 *
 * Scale shape (the point): counting STRINGS corpus-wide shuffles the full
 * distinct-gram tail — at web scale that is a vocabulary² long-tail of
 * multi-byte keys. [[ngramTopK]] instead counts 8-byte xxhash64 gram
 * hashes first (ONE native pass per row — [[org.apache.spark.sql.graftbridge.NgramHash]]
 * — then a long-explode and a map-side partial count; only distinct
 * hashes per partition cross the shuffle), collects just the ≥ kth-count
 * hash set (k + ties rows), then resolves strings in a second scan whose
 * membership test runs inside the sibling kernel
 * ([[org.apache.spark.sql.graftbridge.NgramResolve]] — the gram byte
 * image is shared, so the passes can never disagree) BEFORE any string
 * allocation or shuffle — the string pass shuffles ~k rows total. Two
 * scans + two tiny shuffles beats one scan + a full-tail string shuffle
 * for any corpus that doesn't fit in memory.
 *
 * Exactness: identical to the direct string count ([[ngramTopKExact]],
 * bit-pinned in TextOpsSpec) unless two distinct grams collide in 64-bit
 * xxhash64 space — the same accepted ~2^-64-per-pair tradeoff the dedup
 * and datacard ops already document. Ties at the kth count are kept
 * through the hash pass (threshold is the kth COUNT, not the kth row) so
 * the final (count DESC, ngram ASC) rank is decided on strings, never on
 * hash order.
 */
object HeavyHitters {

  /** Top-k n-gram heavy hitters of `textCol`: (ngram, n, rank), rank 1..k
    * by count descending, gram ascending on ties. Hash-count-first; see
    * the object scaladoc for the scale shape. `maxCandidates` bounds the
    * tie set the driver will collect (a corpus where >maxCandidates grams
    * share the kth count is a degenerate input — fail loudly rather than
    * ship an unbounded membership array into the resolve kernel). */
  def ngramTopK(df: DataFrame, textCol: String, n: Int, k: Int,
      maxCandidates: Int = 65536): DataFrame = {
    require(n > 0 && k > 0, s"n and k must be positive, got n=$n k=$k")
    import org.apache.spark.sql.graftbridge.{ColumnBridge, NgramHash, NgramResolve}
    val toks = TextOps.tokens(col(textCol))
    // pass 1: 8-byte hash counts straight off the token array — ONE
    // native pass per row (NgramHash), no gram string ever allocated;
    // the explode carries longs
    val hashCounts = df
      .select(explode(ColumnBridge.column(
        NgramHash(ColumnBridge.expression(toks), n))).as("_h"))
      .groupBy("_h").agg(count(lit(1)).as("_hn"))
    val topCounts = hashCounts
      .orderBy(desc("_hn"), asc("_h")).limit(k)
      .select("_hn").collect().map(_.getLong(0))
    if (topCounts.isEmpty)
      return df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("ngram",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("rank",
            org.apache.spark.sql.types.LongType))))
    val kthCount = topCounts.last // kth largest (or smallest of < k)
    val cands = hashCounts.where(col("_hn") >= kthCount)
      .select("_h").limit(maxCandidates + 1).collect().map(_.getLong(0))
    require(cands.length <= maxCandidates,
      s"more than $maxCandidates grams tie at the kth count ($kthCount) — " +
        "degenerate corpus for a top-k; raise maxCandidates or k")
    // pass 2: resolve candidate strings — the membership test runs
    // INSIDE the kernel (same gram byte image + hash as pass 1), so gram
    // strings materialize only for candidate occurrences and only
    // distinct grams per partition reach the shuffle
    val resolved = df
      .select(explode(ColumnBridge.column(
        NgramResolve(ColumnBridge.expression(toks), n, cands))).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("n"))
    // final rank over k+ties rows — a global window over a bounded set
    resolved
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("n"), asc("ngram"))).cast("long"))
      .where(col("rank") <= k)
  }

  /** The direct string-count formulation — the independent reference
    * implementation (mirrors the DuckDB oracle verbatim) the hash-first
    * arm is pinned against in TextOpsSpec. Shuffles the full distinct-gram
    * tail; prefer [[ngramTopK]] beyond toy corpora. */
  def ngramTopKExact(df: DataFrame, textCol: String, n: Int,
      k: Int): DataFrame =
    df.select(explode(TextOps.ngrams(col(textCol), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("n"))
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("n"), asc("ngram"))).cast("long"))
      .where(col("rank") <= k)
}
