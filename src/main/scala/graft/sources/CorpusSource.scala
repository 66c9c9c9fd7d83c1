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

  /** A schema'd read split into parsed rows and corrupt lines. `good`
    * drops the corrupt column; `corrupt` keeps the whole row — the
    * schema'd fields (all null or partially parsed) plus the verbatim
    * line as `raw`. Keeping the full projection is deliberate twice over:
    * an audit frame WANTS the partial parse next to the raw line, and
    * Spark refuses a query whose only reference into a raw file scan is
    * the corrupt column itself (SPARK-21610) — both frames are plain
    * filters over the one scan. Caveat that restriction leaves: an
    * aggregation over `corrupt` that PRUNES to the corrupt column alone
    * (a bare `count()`) still trips it — collect full rows, project
    * schema'd fields alongside `raw`, or persist the frame first. */
  final case class CorpusRead(good: DataFrame, corrupt: DataFrame)

  private def split(raw: DataFrame): CorpusRead = CorpusRead(
    good = raw.where(col(CorruptCol).isNull).drop(CorruptCol),
    corrupt = raw.where(col(CorruptCol).isNotNull)
      .withColumnRenamed(CorruptCol, "raw"))

  /** JSONL (one JSON object per line). Unknown keys are ignored; missing
    * keys parse as null (schema'd PERMISSIVE semantics); unparseable lines
    * land in `corrupt` verbatim. */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType = DocumentsSchema): CorpusRead =
    split(spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path))

  /** Headered CSV with RFC-4180 quoting (embedded newlines supported via
    * multiLine). Same corrupt-capture contract as [[readJsonl]]. */
  def readCsv(spark: SparkSession, path: String,
      schema: StructType = DocumentsSchema,
      multiLine: Boolean = false): CorpusRead =
    split(spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("multiLine", multiLine.toString)
      .option("escape", "\"")
      .csv(path))

  /** Write a corpus as JSONL shards (the interchange twin of
    * [[readJsonl]]; `partitions` controls shard count — size for
    * ~100-500 MB per shard at scale, not the cluster's task count). */
  def writeJsonl(df: DataFrame, path: String, partitions: Int = 0): Unit = {
    val out = if (partitions > 0) df.repartition(partitions) else df
    out.write.mode("overwrite").json(path)
  }
}
