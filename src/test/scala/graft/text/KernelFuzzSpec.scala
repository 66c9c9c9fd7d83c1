package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic fuzz differentials: every text kernel against its
  * retained builtin/HOF formulation over adversarial generated strings —
  * supplementary-plane codepoints (4-byte UTF-8: the surrogate-pair
  * handling both Java regex and UTF8String must agree on), every Java
  * `\s` whitespace variant, '#'/'...'/stopword fragments embedded inside
  * and between words, underscores and digits (ASCII `\b` edges), and
  * empty/whitespace-only strings. Fixed seed — reproducible, no
  * flakiness; 400 samples per run. */
class KernelFuzzSpec extends AnyFunSuite {
  private val spark = graft.TestFixtures.spark
  import spark.implicits._

  private def fuzzCorpus(seed: Long, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val atoms = Array(
      "the", "The", "THE", "and", "of", "is", "not", "x_the", "the2",
      "wörd", "naïve", "日本語", "テスト", "😀", "😀the",
      "öthe", "theö", "é2", "日the", "𝐀the", "the𝟡",
      "#", "#tag", "...", "dots...", "a#b", "1234", "_", "__", "a_b",
      "for", "was", "it", "in", "to", "be", "with", "have", "that",
      "ref", "refx", "x", "Q", "", "é")
    val seps = Array(" ", "  ", "\t", "\n", "\u000B", "\f", "\r", " \t ")
    (0L until n.toLong).map { i =>
      val parts = (0 until rnd.nextInt(30)).map(_ => atoms(rnd.nextInt(atoms.length)))
      val sb = new StringBuilder
      if (rnd.nextBoolean()) sb.append(seps(rnd.nextInt(seps.length)))
      parts.zipWithIndex.foreach { case (p, j) =>
        sb.append(p)
        if (j < parts.size - 1) sb.append(seps(rnd.nextInt(seps.length)))
      }
      if (rnd.nextBoolean()) sb.append(seps(rnd.nextInt(seps.length)))
      (i, sb.toString)
    }
  }

  test("TextStats / GopherFlags / quality kernels survive 400 adversarial strings") {
    val docs = fuzzCorpus(0xD5EEDL, 400).toDF("id", "text")
    val q = docs.select(col("id"),
        TextOps.qualityScore(col("text")).as("a"),
        TextOps.qualityScoreRegex(col("text")).as("b")).collect()
    q.foreach(r => assert(r.getDouble(1) == r.getDouble(2),
      s"quality diverged on id ${r.getLong(0)}"))
    val g = docs.select(col("id"),
        TextOps.gopherFlags(col("text")).as("a"),
        TextOps.gopherFlagsHof(col("text")).as("b")).collect()
    g.foreach(r => assert(r.getStruct(1) == r.getStruct(2),
      s"gopher diverged on id ${r.getLong(0)}"))
    val bp = docs.select(col("id"),
        TextOps.bpeTokenCount(col("text")).as("a"),
        TextOps.bpeTokenCountRegex(col("text")).cast("long").as("b")).collect()
    bp.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"bpe count diverged on id ${r.getLong(0)}"))
  }

  test("NbScore-backed classify and dsir survive the fuzz corpus") {
    val docs = fuzzCorpus(0xBEEFL, 300).toDF("id", "text")
      .where(length(trim(col("text"))) > 0)
    val labeled = docs.withColumn("lab",
      (pmod(col("id"), lit(3))).cast("string"))
    val model = Classify.trainNaiveBayes(labeled, "id", "text", "lab",
      buckets = 211)
    val a = Classify.predict(model, docs, "id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    val b = Classify.predictViaShuffle(model, docs, "id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    val t = fuzzCorpus(0xCAFEL, 60).toDF("id", "text")
      .where(length(trim(col("text"))) > 0)
    val da = Dsir.importanceWeights(docs, t, "id", "text", buckets = 211)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val db = Dsir.importanceWeightsViaShuffle(docs, t, "id", "text",
      buckets = 211)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(da.toSeq == db.toSeq)
  }

  test("LangMarkerCounts / PII kernels survive a PII-flavored fuzz corpus") {
    // same generator, atoms skewed to the matchers' failure surface:
    // partial emails, over-long octets, digit runs that flank real IPs,
    // dots/hyphens/@ in every separator role, marker stopwords, Han chars
    val rnd = new scala.util.Random(0x9117L)
    val atoms = Array(
      "a@b.co", "u3@ex4.org", "x@y@z.com", "a@b..cd", "a@b.c", "a@b.comm5",
      "a@", "@b.cd", "@", "a.b@c.d.ef", "ex.org", "%+-", "._%",
      "1.2.3.4", "10.0.0.1", "1234.5.6.7", "1.2.3.4567", "1.2", "255",
      "555-042-0199", "555 042 0199", "555.042.0199", "5555", "0199",
      "der", "the", "les", "el", "日本語", "漢字", "wörd", "😀", "é",
      ".", "-", "..", "x_", "_9", "tel", "ip", "")
    val seps = Array(" ", "", ".", "-", "@", "\t", "\n", " . ")
    val docs = (0L until 400L).map { i =>
      val parts = (0 until rnd.nextInt(24)).map(_ => atoms(rnd.nextInt(atoms.length)))
      val sb = new StringBuilder
      parts.zipWithIndex.foreach { case (p, j) =>
        sb.append(p)
        if (j < parts.size - 1) sb.append(seps(rnd.nextInt(seps.length)))
      }
      (i, sb.toString)
    }.toDF("id", "text")
    val li = docs.select(col("id"), TextOps.langId(col("text")).as("a"),
      TextOps.langIdRegex(col("text")).as("b")).collect()
    li.foreach(r => assert(r.getString(1) == r.getString(2),
      s"langId diverged on id ${r.getLong(0)}"))
    val (e, i, p) = Pii.piiCounts(col("text"))
    val pi = docs.select(col("id"),
        Pii.redactAll(col("text")).as("ra"), Pii.redactAllRegex(col("text")).as("rb"),
        Pii.piiCountsArray(col("text")).as("ca"),
        array(e.cast("long"), i.cast("long"), p.cast("long")).as("cb")).collect()
    pi.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"redact diverged on id ${r.getLong(0)}: [${r.getString(1)}] vs [${r.getString(2)}]")
      assert(r.getSeq[Long](3) == r.getSeq[Long](4),
        s"counts diverged on id ${r.getLong(0)}: ${r.getSeq[Long](3)} vs ${r.getSeq[Long](4)}")
    }
  }

  test("BigramPpl arm equals the join arm on the fuzz corpus") {
    val ref = fuzzCorpus(0xF00DL, 200).toDF("id", "text")
    val docs = fuzzCorpus(0xFACEL, 200).toDF("id", "text")
    val m = LangModel.train(ref, "id", "text")
    val a = LangModel.score(m, docs, "id", "text").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(m.kernelArm.exists(_.isDefined))
    val b = LangModel.scoreViaJoin(m, docs, "id", "text").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("HtmlExtract kernel equals the 14-pass builtin chain on markup fuzz") {
    // markup-flavored atom set: tag/comment/entity FRAGMENTS so random
    // joins produce broken nesting, split entities, unicode \b flanks,
    // case soup and unterminated everything — the shapes where a
    // hand-rolled scan and a regex chain would disagree if they could
    val rnd = new scala.util.Random(0x47AF7L)
    val atoms = Array(
      "<script>", "</script>", "<SCRIPT src=\"a>b\">", "</ScRiPt  >",
      "<scriptö>", "<scripts>", "<script", "script>",
      "<style>", "</style>", "<STYLE x>", "<noscript>", "</noscript>",
      "<template>", "</template  \t>",
      "<!--", "-->", "<!-- c -->", "<p>", "</p>", "<p", "p>", "<>", "<",
      ">", "<div class='x'>", "< p>",
      "&lt;", "&gt;", "&amp;", "&amp;lt;", "&quot;", "&#39;", "&apos;",
      "&nbsp;", "&", "&lt", "&#3", ";", "&&lt;",
      "word", "Wörd", "日本語", "😀", "𝐀", "_", "x2",
      " ", "\t", "\n", "\u000B", "\f", "\r", " ", "  ")
    val docs = (0L until 400L).map { i =>
      val sb = new StringBuilder
      (0 until rnd.nextInt(40)).foreach(_ => sb.append(atoms(rnd.nextInt(atoms.length))))
      (i, sb.toString)
    }.toDF("id", "html")
    val rows = docs.select(col("id"),
      Html.extractText(col("html")).as("k"),
      Html.extractTextBuiltins(col("html")).as("b")).collect()
    rows.foreach(r => assert(r.getString(1) == r.getString(2),
      s"html diverged on id ${r.getLong(0)}: [${r.getString(1)}] vs [${r.getString(2)}]"))
  }

  test("NgramHash / NgramResolve agree with the HOF formulation on fuzz text") {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, NgramHash, NgramResolve}
    val docs = fuzzCorpus(0x96A4L, 400).toDF("id", "text")
    for (n <- Seq(1, 2, 3)) {
      val toks = TextOps.tokens(col("text"))
      val grams = TextOps.ngrams(col("text"), n)
      // hash kernel == xxhash64 over the joined gram strings
      val h = docs.select(col("id"),
        ColumnBridge.column(NgramHash(ColumnBridge.expression(toks), n)).as("k"),
        transform(grams, g => xxhash64(g)).as("b")).collect()
      h.foreach(r => assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"ngram hash diverged on id ${r.getLong(0)} n=$n"))
      // resolve kernel == filter-by-hash over the string formulation,
      // with a candidate set drawn from the corpus itself (+ a miss)
      val some = docs.select(explode(grams).as("g"))
        .select(xxhash64(col("g")).as("h")).distinct()
        .orderBy("h").limit(7).as[Long].collect() :+ 0x12345L
      val res = docs.select(col("id"),
        ColumnBridge.column(NgramResolve(
          ColumnBridge.expression(toks), n, some)).as("k"),
        filter(grams, g => xxhash64(g).isin(some.toSeq: _*)).as("b")).collect()
      res.foreach(r => assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"ngram resolve diverged on id ${r.getLong(0)} n=$n"))
    }
  }
}
