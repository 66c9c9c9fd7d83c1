package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Corpus ingestion sources — the file-format boundary of the pipeline.
 * The reference engine has no file sources at all (ingestion is its RPC
 * surface); an LLM-data pipeline's raw inputs are overwhelmingly JSONL
 * (one document object per line — the CommonCrawl/HF convention) and CSV,
 * and at 100 TB two disciplines are non-negotiable, so this module makes
 * them the default rather than an option:
 *
 *  - **Explicit schema, never inference.** `spark.read.json` without a
 *    schema runs a FULL SCAN of the input just to guess types — at corpus
 *    scale that silently doubles the read bill. Every reader here takes a
 *    schema (defaulting to the canonical documents shape) and hands it to
 *    the scan, so the first pass over the bytes is the only pass.
 *  - **Corrupt rows are data, not exceptions.** A crawl shard with one
 *    truncated line must not kill a 1000-executor job, and silently
 *    dropping bad lines (DROPMALFORMED) hides corpus rot. Readers run
 *    PERMISSIVE with a retained corrupt-record column: parsed rows carry
 *    null there, bad lines survive verbatim for audit. [[CorpusRead]]
 *    splits the two; `corrupt` is the frame a data card pipeline counts
 *    and samples before anyone trains on the shard.
 */
object CorpusSource {

  /** The canonical documents schema (TESTDATA.md). */
  val DocumentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val CorruptCol = "_corrupt_record"

  /** A schema'd read split into parsed rows and corrupt lines.
    *
    * The two frames are INDEPENDENT reads of the same files, not filters
    * over one scan — deliberately. Spark refuses any query whose
    * references into a raw file scan prune down to the corrupt column
    * alone (SPARK-21610), and that includes the innocent-looking
    * `good.count()` (the corrupt-is-null filter is the only referenced
    * column once count prunes the output). So `good` reads with
    * DROPMALFORMED — no corrupt column in its schema at all, every query
    * shape works — and `corrupt` reads PERMISSIVE keeping the whole row:
    * the schema'd fields (null or partially parsed) next to the verbatim
    * line as `raw`. Each frame is one pass over the bytes; pipelines
    * normally consume `good` and hand `corrupt` to an audit job, so the
    * second scan only runs when someone actually looks at the rot.
    * Residual caveat on `corrupt` only: a bare `corrupt.count()` prunes
    * to the corrupt column and still trips the refusal — collect rows,
    * project fields alongside `raw`, or persist first. */
  final case class CorpusRead(good: DataFrame, corrupt: DataFrame)

  /** JSONL (one JSON object per line). Unknown keys are ignored; missing
    * keys parse as null (schema'd semantics); unparseable lines land in
    * `corrupt` verbatim. */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType = DocumentsSchema): CorpusRead = CorpusRead(
    good = spark.read
      .schema(schema)
      .option("mode", "DROPMALFORMED")
      .json(path),
    corrupt = spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .where(col(CorruptCol).isNotNull)
      .withColumnRenamed(CorruptCol, "raw"))

  /** Headered CSV with RFC-4180 quoting (embedded newlines supported via
    * multiLine). Same corrupt-capture contract as [[readJsonl]]. */
  def readCsv(spark: SparkSession, path: String,
      schema: StructType = DocumentsSchema,
      multiLine: Boolean = false): CorpusRead = {
    def base(s: StructType) = spark.read
      .schema(s)
      .option("header", "true")
      .option("multiLine", multiLine.toString)
      .option("escape", "\"")
    CorpusRead(
      good = base(schema).option("mode", "DROPMALFORMED").csv(path),
      corrupt = base(schema.add(CorruptCol, StringType))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CorruptCol)
        .csv(path)
        .where(col(CorruptCol).isNotNull)
        .withColumnRenamed(CorruptCol, "raw"))
  }

  /** Write a corpus as JSONL shards (the interchange twin of
    * [[readJsonl]]; `partitions` controls shard count — size for
    * ~100-500 MB per shard at scale, not the cluster's task count). */
  def writeJsonl(df: DataFrame, path: String, partitions: Int = 0): Unit = {
    val out = if (partitions > 0) df.repartition(partitions) else df
    out.write.mode("overwrite").json(path)
  }
}
