package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures.spark

class CorpusSourceSpec extends AnyFunSuite {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("corpus-src").toString

  private val docs = Seq(
    (0L, "plain text", "en", "web", 10L),
    (1L, "quotes \" and, commas", "en", "web", 20L),
    (2L, "unicode é中文 text", "de", "books", 17L))

  test("JSONL round-trip is lossless; corrupt lines are captured, not fatal") {
    val dir = tmp()
    CorpusSource.writeJsonl(
      docs.toDF("doc_id", "text", "lang", "source", "n_chars"), dir)
    // inject two corrupt lines into their own shard file
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-corrupt.json"),
      "{\"doc_id\": 99, \"text\": \"truncat\n not json at all\n")
    val r = CorpusSource.readJsonl(spark, dir)
    val good = r.good.collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2),
        x.getString(3), x.getLong(4))).toSet
    assert(good == docs.toSet, "parsed rows must round-trip byte-for-byte")
    val bad = r.corrupt.collect().map(_.getAs[String]("raw")).toSet
    assert(bad.size == 2 && bad.forall(_.nonEmpty),
      s"both corrupt lines must surface verbatim: $bad")
  }

  test("CSV round-trip with quoting; malformed rows are captured") {
    val dir = tmp()
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").option("header", "true").option("escape", "\"")
      .csv(dir)
    // header line first — with header=true the reader skips each file's
    // first line, so the malformed row must come second
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-corrupt.csv"),
      "doc_id,text,lang,source,n_chars\nnot_a_long,oops\n")
    val r = CorpusSource.readCsv(spark, dir)
    val good = r.good.where($"doc_id".isNotNull).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2),
        x.getString(3), x.getLong(4))).toSet
    assert(good == docs.toSet)
    // full-row collect, not count(): column pruning on a bare count would
    // leave only the corrupt column referenced — the SPARK-21610 refusal
    assert(r.corrupt.collect().length >= 1)
  }

  test("schema'd read plans no inference scan and prunes columns") {
    val dir = tmp()
    CorpusSource.writeJsonl(
      docs.toDF("doc_id", "text", "lang", "source", "n_chars"), dir)
    // the reader's scan must carry the supplied schema: a projection of
    // one field reads one field (ReadSchema pruning), no inference pass
    val p = CorpusSource.readJsonl(spark, dir).good.select("doc_id")
      .queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema") && !p.toLowerCase.contains("samplingratio"),
      s"schema'd scan expected; plan:\n$p")
  }
}
