package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures.spark

class TextOpsSpec extends AnyFunSuite {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).head.getAs[T]("r")

  test("token counting: whitespace + BPE-ish") {
    assert(one[Int](TextOps.tokenCount(col("t")), "  a b   c  ") == 3)
    assert(one[Int](TextOps.tokenCount(col("t")), "one") == 1)
    // "don't stop" -> [don][']|[t]... pattern: ' ?[A-Za-z]+' etc.
    assert(one[Long](TextOps.bpeTokenCount(col("t")), "hello world42!") == 4L)
  }

  test("ngrams produce n consecutive tokens, empty below n") {
    def grams(text: String): Seq[String] =
      Seq(text).toDF("t").select(TextOps.ngrams(col("t"), 3).as("r"))
        .head.getSeq[String](0).toSeq
    assert(grams("a b c d") == Seq("a b c", "b c d"))
    assert(grams("a b") == Seq.empty)
  }

  test("language id picks the marker-richest language") {
    assert(one[String](TextOps.langId(col("t")),
      "the cat and the dog of the house is here") == "en")
    assert(one[String](TextOps.langId(col("t")),
      "der hund und die katze ist nicht da") == "de")
    assert(one[String](TextOps.langId(col("t")), "xyz qwerty") == "und")
    assert(one[String](TextOps.langId(col("t")), "你好世界") == "zh")
  }

  test("fingerprint is the documented rolling hash") {
    // independently computed: fold 7*31+c mod 1e9+7 over "hello world"
    var acc = 7L
    "hello world".foreach(c => acc = (acc * 31 + c.toLong) % 1000000007L)
    assert(one[Long](TextOps.fingerprint(col("t")), "hello world") == acc)
    assert(acc == 234728892L) // cross-checked against the DuckDB oracle fold
  }

  test("native fingerprint kernel is bit-pinned to the HOF formulation") {
    // codepoint iteration (CJK chars, an astral-plane emoji as ONE step)
    // and the empty-string quirk (split('') -> [''] with ascii 0 -> 217)
    val cases = Seq("hello world", "", " ", "你好世界", "a你b", "😀emoji",
      "mixed 你 and 🌉 bridge", "tab\tchar", "ünïcödé", "line\nbreak")
    cases.foreach { s =>
      assert(one[Long](TextOps.fingerprint(col("t")), s) ==
        one[Long](TextOps.fingerprintHof(col("t")), s), s"diverged on [$s]")
    }
    assert(one[Long](TextOps.fingerprint(col("t")), "") == 217L)
    // SQL surface
    graft.functions.GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_poly_hash('hello world') AS fp")
      .head.getLong(0) == 234728892L)
  }

  test("repetition ratio: duplicated n-grams raise it, short docs score 0") {
    // "a b c a b c a b c": 7 trigrams, 3 distinct -> 1 - 3/7
    val rep = one[Double](TextOps.repetitionRatio(col("t"), 3), "a b c a b c a b c")
    assert(math.abs(rep - (1.0 - 3.0 / 7.0)) < 5e-5)
    assert(one[Double](TextOps.repetitionRatio(col("t"), 3), "a b c d e") == 0.0)
    assert(one[Double](TextOps.repetitionRatio(col("t"), 3), "a b") == 0.0)
  }

  test("deterministic split: stable, id-keyed, valid percentages") {
    import graft.pipeline.Corpus
    val df = spark.range(0, 1000).toDF("id")
    val out = Corpus.assignSplit(df, "id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // buckets are md5-uniform-ish: train ~900, val ~50, test ~50
    assert(out("train") > 800 && out("val") > 10 && out("test") > 10)
    assert(out.values.sum == 1000)
    // stability: a doc's split does not depend on the rest of the corpus
    val solo = Corpus.assignSplit(spark.range(42, 43).toDF("id"), "id")
      .select("split").head.getString(0)
    val inFull = Corpus.assignSplit(df, "id").where(col("id") === 42)
      .select("split").head.getString(0)
    assert(solo == inFull)
    intercept[IllegalArgumentException](Corpus.assignSplit(df, "id", 99, 5))
    // deterministic sample: ~10%, repeatable, and a subset of the 20% sample
    val s10 = Corpus.deterministicSample(df, "id", 0.10).collect().map(_.getLong(0)).toSet
    val s20 = Corpus.deterministicSample(df, "id", 0.20).collect().map(_.getLong(0)).toSet
    assert(s10.size > 50 && s10.size < 200 && s20.size > s10.size)
    assert(s10.subsetOf(s20))
    assert(Corpus.deterministicSample(df, "id", 0.10)
      .collect().map(_.getLong(0)).toSet == s10)
  }

  test("quality score is bounded and rewards normal prose") {
    val prose = one[Double](TextOps.qualityScore(col("t")),
      "the quick brown fox jumps over the lazy dog and runs to the hills in the morning")
    val junk = one[Double](TextOps.qualityScore(col("t")), "!!! ### $$$ %%% @@@")
    assert(prose > junk)
    assert(prose >= 0.0 && prose <= 1.0 && junk >= 0.0)
  }

  test("gopher rule flags: each rule trips on its own violation") {
    def flags(text: String): Map[String, Boolean] = {
      val r = Seq(text).toDF("t")
        .select(TextOps.gopherFlags(col("t")).as("g")).select("g.*").head
      r.schema.fieldNames.zipWithIndex.map { case (f, i) => f -> r.getBoolean(i) }.toMap
    }
    // 60 normal words incl. two stopwords → every rule passes
    val good = ("the word " + Seq.tabulate(57)(i => s"word$i").mkString(" ")) + " of"
    assert(flags(good)("pass"), s"good doc failed: ${flags(good)}")
    // too short
    assert(!flags("the word of list")("ok_words"))
    // symbol-heavy: >10% of words carry # or ...
    val symbolic = good + " " + Seq.fill(10)("#").mkString(" ")
    assert(!flags(symbolic)("ok_symbol"))
    // numeric soup: <80% of words contain a letter
    val numeric = ("the of " + Seq.fill(58)("12345").mkString(" "))
    assert(!flags(numeric)("ok_alpha"))
    // only one distinct stopword
    val oneStop = "the word " + Seq.tabulate(58)(i => s"word$i").mkString(" ")
    assert(!flags(oneStop)("ok_stop"))
    // 1-char words pull mean length under 3
    val short = "the of " + Seq.fill(58)("a b").mkString(" ")
    assert(!flags(short)("ok_mean_len"))
  }

  test("canonicalize: NFC converges encodings; case/whitespace collapse; idempotent") {
    import graft.TestFixtures.spark.implicits._
    def canon(s: String): String =
      Seq(s).toDF("t").select(TextOps.canonicalize($"t")).head.getString(0)
    // composed vs decomposed accents canonicalize to identical bytes
    val composed = "Café NAÏVE"
    val decomposed = "Café NAÏVE"
    assert(canon(composed) == canon(decomposed))
    assert(canon(composed) == "café naïve")
    // whitespace runs collapse, edges trim, case folds
    assert(canon("  The   QUICK\t\tFox\n ") == "the quick fox")
    // idempotence: canonical text is its own canonical form
    val once = canon("  MiXeD   Café ")
    assert(canon(once) == once)
    // exact dedup converges cross-encoding variants after canonicalization
    val docs = Seq((1L, composed), (2L, decomposed)).toDF("doc_id", "text")
      .select($"doc_id", TextOps.canonicalize($"text").as("text"))
    assert(graft.dedup.Dedup.dropExactDuplicates(docs, "doc_id", "text").count() == 1)
  }

  test("native line-signals kernel is value-pinned to the regex formulation") {
    // adversarial line shapes: bullets with/without leading spaces (and a
    // TAB, which Spark trim does NOT strip), -/*/• markers, "..."/"…"
    // (and a 4-dot run), terminal [.!?"] with trailing spaces, CRLF lines
    // (the $-before-final-\r Java regex edge), DOUBLE \r (where $ must
    // NOT match), U+0085/U+2028/U+2029 terminators, empty lines, a
    // trailing newline, empty and whitespace-only docs
    val docs = (Seq(
      "plain line\n- bullet\n  * spaced bullet\n\t- tab bullet stays unmatched",
      "• dot bullet\n•\n -leading space dash",
      "ends with dots...\nends with ellipsis…\nfour dots....\ndots... not at end",
      "terminal.\nbang!   \nquestion?\nquote\"\nnone",
      "crlf terminal.\r\ncrlf dots...\r\ncrlf none\r\nend",
      "double cr.\r\r\nsingle cr.\r",
      "nel terminal.\nls dots... \nps bang! ",
      "", "   ", "\n", "a\n\nb\n",
      "...", "…", ".", "-", "*", "•", " - x. ") ++
      (0 until 120).map { i =>
        (0 to i % 5).map { j =>
          val k = (i * 7 + j * 3) % 9
          Seq("- item", "* item", "• item", "text.", "text...", "text…",
            "plain", "  - pad. ", "x\r")(k)
        }.mkString("\n")
      }).zipWithIndex.map(_.swap).toDF("id", "text")
    def rows(c: org.apache.spark.sql.Column) =
      docs.select(col("id"), c.as("s")).select(col("id"), col("s.*"))
        .collect().map(r => r.getInt(0) -> r.toSeq.drop(1)).sortBy(_._1)
    val kern = rows(TextOps.lineSignals(col("text")))
    val ref = rows(TextOps.lineSignalsRegex(col("text")))
    assert(kern.length == 138)
    kern.zip(ref).foreach { case ((ki, kv), (ri, rv)) =>
      assert(ki == ri && kv == rv, s"id $ki: kernel $kv vs regex $rv")
    }
    // the sweep must actually exercise every counter
    val nonzero = kern.map(_._2.toSeq).toSeq.transpose.map(_.count(v =>
      v != 0L && v != 0.0))
    assert(nonzero.forall(_ > 0), s"a counter never fired: $nonzero")
  }

  test("native gopher kernel is flag-pinned to the HOF formulation") {
    // generated corpus sweeping every rule boundary: word counts straddling
    // 50, symbol/alpha ratios around their cutoffs, mixed-case stopwords,
    // unicode tokens, empty and whitespace-only text
    val docs = spark.range(0, 300).selectExpr("id",
      """concat(
         concat_ws(' ', transform(sequence(1, 40 + cast(id % 20 as int)),
           i -> case
             when (id + i) % 13 = 0 then '#tag'
             when (id + i) % 17 = 0 then 'dots...'
             when (id + i) % 7 = 0 then '1234'
             when (id + i) % 5 = 0 then elt(1 + cast(i % 8 as int),
               'The', 'BE', 'to', 'OF', 'and', 'THAT', 'have', 'with')
             else concat('wörd', cast(i % 11 as string)) end)),
         case when id % 10 = 0 then '' else ' trailer' end) as text""")
      .union(Seq((9001L, ""), (9002L, "   "), (9003L, "solo")).toDF("id", "text"))
    val kern = docs.select(col("id"),
        TextOps.gopherFlags(col("text")).as("g")).select(col("id"), col("g.*"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).sortBy(_._1)
    val hof = docs.select(col("id"),
        TextOps.gopherFlagsHof(col("text")).as("g")).select(col("id"), col("g.*"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).sortBy(_._1)
    assert(kern.length == 303 && kern.toSeq == hof.toSeq)
    // both ok_words regimes must actually occur in the sweep
    assert(kern.map(_._2.head).distinct.length == 2)
  }

  test("native text-stats kernel is value-pinned to the regex formulation") {
    // counts AND composed score, over edge text: tabs/newline heads (the
    // leading-empty-token split artifact), unicode words and punctuation,
    // stopwords at string edges and inside underscore/digit runs (no \\b),
    // empty and whitespace-only strings
    val docs = spark.range(0, 200).selectExpr("id",
      """concat_ws(' ', transform(sequence(1, 5 + cast(id % 40 as int)),
         i -> case
           when (id + i) % 11 = 0 then 'the'
           when (id + i) % 13 = 0 then 'x_the'
           when (id + i) % 7 = 0 then 'wörd,'
           when (id + i) % 5 = 0 then elt(1 + cast(i % 5 as int),
             'and', 'of', 'IS', 'that2', 'it')
           else concat('tok', cast(i as string), '!') end)) as text""")
      .union(Seq((901L, ""), (902L, "   "), (903L, "\tthe cat"),
        (904L, "the"), (905L, "for...for_for for"), (906L, "é the é"))
        .toDF("id", "text"))
    val kern = docs.select(col("id"),
        TextOps.qualityScore(col("text")).as("q")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1)
    val ref = docs.select(col("id"),
        TextOps.qualityScoreRegex(col("text")).as("q")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1)
    assert(kern.length == 206 && kern.toSeq == ref.toSeq)
    // and the raw counts equal their builtin derivations
    import org.apache.spark.sql.graftbridge.{ColumnBridge, TextStats}
    val st = ColumnBridge.column(TextStats(ColumnBridge.expression(col("text"))))
    val both = docs.select(col("id"), st.as("st"),
        TextOps.tokenCount(col("text")).cast("long").as("t"),
        size(regexp_extract_all(col("text"),
          lit("[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("p"),
        regexp_count(lower(col("text")),
          lit("\\b(the|and|of|is|to|in|that|it|was|for)\\b")).cast("long").as("sw"),
        length(col("text")).cast("long").as("c")).collect()
    both.foreach { r =>
      val a = r.getSeq[Long](1)
      assert(a == Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)),
        s"id ${r.getLong(0)}: kernel $a vs builtins ${r.toSeq.drop(2)}")
    }
  }

  test("native lang-marker kernel is count-pinned to the regex formulation") {
    // marker words at \b edges (underscore/digit flanks kill the boundary),
    // non-ASCII adjacency (ö/emoji are non-\w, so they ARE boundaries),
    // Han chars in and out of the U+4E00..9FFF block, cross-language
    // homographs (fr "des" / es "es"), case folding, empty strings
    val docs = Seq("the der le el 日本語 漢字測試", "öthe the5 x_the _the the_ THE",
      "der die das und ist nicht ein eine mit von", "le la les et est une des",
      "el los las es una para con por del se", "", " \t ", "😀the der😀die",
      "ｔｈｅ the.the,the", "y el de la es 2026", "des es est in it 中文",
      "㐀 ䷿ 一 龯 龰").zipWithIndex.map(_.swap).toDF("id", "text")
    val ids = docs.select(col("id"), TextOps.langId(col("text")).as("a"),
      TextOps.langIdRegex(col("text")).as("b")).collect()
    ids.foreach(r => assert(r.getString(1) == r.getString(2),
      s"id ${r.getInt(0)}: kernel ${r.getString(1)} vs regex ${r.getString(2)}"))
    import org.apache.spark.sql.graftbridge.{ColumnBridge, LangMarkerCounts}
    val k = ColumnBridge.column(LangMarkerCounts(
      ColumnBridge.expression(col("text")), TextOps.LangWordSets.map(_._2)))
    val counts = docs.select(col("id"), k.as("k"),
      array(TextOps.LangMarkers.map { case (_, m) =>
        regexp_count(lower(col("text")), lit(m)).cast("long") }: _*).as("r"))
      .collect()
    counts.foreach(r => assert(r.getSeq[Long](1) == r.getSeq[Long](2),
      s"id ${r.getInt(0)}: kernel ${r.getSeq[Long](1)} vs regex ${r.getSeq[Long](2)}"))
  }

  test("native PII kernels are span- and count-pinned to the regex formulations") {
    // the adversarial shapes the hand-rolled matchers were derived for:
    // multiple @s (backtracking picks the second), dot runs in domains,
    // sub-2-letter TLDs, digit tails after the TLD letters, over-long
    // octets (no \d{1,3} backtracking can save them), boundary-killing
    // letter/underscore flanks, '.'-separated IP chains (two adjacent
    // matches), phones inside email local parts (counted, not redacted),
    // non-ASCII flanks (non-\w, so boundaries hold), empty strings
    val docs = Seq(
      "a@b.co x@y@z.com %^a@b.co a@b..cd a@b.c a@b.comm5x a.b@c.d.ef",
      "plain text no pii at all", "a@ @b.cd a@-.xy u3@ex4.org done",
      "1.2.3.4 1234.5.6.7 1.2.3.4.5.6.7.8 5.1.2.3.4 1.2.3.4a a1.2.3.4",
      "10.0.0.1@example.com 1.2.3.4. 1..2.3.4 1.2.3.4567 ö1.2.3.4ö",
      "555-042-0199 5555-042-0199 555 042 0199 555.042.0199 555-042-01999",
      "x555-042-0199 555-042-0199@x.com 日555-123-4567本 tel 555-1-0199",
      "", " ", "@", "...", "---", "mixed: u0@ex1.org ip 10.7.0.1 tel 555-007-0199")
      .zipWithIndex.map(_.swap).toDF("id", "text")
    val (e, i, p) = Pii.piiCounts(col("text"))
    val rows = docs.select(col("id"),
        Pii.redactAll(col("text")).as("rk"),
        Pii.redactAllRegex(col("text")).as("rr"),
        Pii.piiCountsArray(col("text")).as("ck"),
        array(e.cast("long"), i.cast("long"), p.cast("long")).as("cr"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"id ${r.getInt(0)}: kernel [${r.getString(1)}] vs regex [${r.getString(2)}]")
      assert(r.getSeq[Long](3) == r.getSeq[Long](4),
        s"id ${r.getInt(0)}: kernel counts ${r.getSeq[Long](3)} vs regex ${r.getSeq[Long](4)}")
    }
  }

  test("blocklistHits kernel is count-pinned to the regex formulation") {
    val bl = Seq("casino", "Lottery", "x_2")
    // \b edges (underscore/digit flanks), case soup on both sides,
    // non-ASCII adjacency, the word as a run substring (no hit)
    val docs = Seq("casino CASINO Casino!", "lottery5 x_lottery lottery_x",
      "LOTTERY\tcasino.lottery", "öcasino casinoö 😀casino😀", "x_2 x_2_ _x_2 y x_2",
      "supercasino casinos", "", "   ").zipWithIndex.map(_.swap).toDF("id", "t")
    val rows = docs.select(col("id"),
      TextOps.blocklistHits(col("t"), bl).as("k"),
      TextOps.blocklistHitsRegex(col("t"), bl).as("r")).collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"id ${r.getInt(0)}: kernel ${r.getLong(1)} vs regex ${r.getLong(2)}"))
    // spot meanings: bounded hits only
    assert(rows.find(_.getInt(0) == 0).get.getLong(1) == 3L)
    assert(rows.find(_.getInt(0) == 1).get.getLong(1) == 0L)
    assert(rows.find(_.getInt(0) == 5).get.getLong(1) == 0L)
    // non-word input is rejected loudly
    intercept[IllegalArgumentException] {
      TextOps.blocklistHits(col("t"), Seq("two words"))
    }
  }

  test("lineSignals: bullet / ellipsis / terminal fractions per document") {
    val docs = Seq(
      (0L, "- first bullet\n* second bullet\nplain line"),
      (1L, "ends properly.\nalso ends!\ntrails off...\nunicode trail…"),
      (2L, "no newline here"),
      (3L, "  - indented bullet\nShe said \"quote\"")).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextOps.lineSignals(col("text")).as("s"))
      .select(col("doc_id"), col("s.n_lines"), col("s.frac_bullet"),
        col("s.frac_ellipsis_end"), col("s.frac_terminal"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(0L) == ((3L, 0.6667, 0.0, 0.0)))
    // '...' and '…' both count as ellipsis; '.', '!', and '...' end in
    // terminal punctuation ('…' does not)
    assert(got(1L) == ((4L, 0.0, 0.5, 0.75)))
    assert(got(2L) == ((1L, 0.0, 0.0, 0.0)))
    // leading whitespace is trimmed before the bullet test; a closing
    // double-quote is terminal (the C4 keep rule)
    assert(got(3L) == ((2L, 0.5, 0.0, 0.5)))
  }
}
