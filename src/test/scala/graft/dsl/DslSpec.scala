package graft.dsl

import org.scalatest.funsuite.AnyFunSuite

import graft.types._
import graft.types.MetadataValue.RawString
import graft.types.PredicateCondition._
import Command.{Set => SetCmd, _}

/** DSL parser tests transliterated from the reference corpus
  * (/root/reference/ahnlich/dsl/src/tests/db.rs, 693 LoC). */
class DslSpec extends AnyFunSuite {

  private def one(input: String): Command = {
    val cmds = DslParser.parseDb(input)
    assert(cmds.size == 1, s"expected 1 command, got $cmds")
    cmds.head
  }

  test("single query parse: case-insensitivity + surrounding whitespace") {
    assert(one("LISTCLIENTS") == ListClients)
    assert(one("listclients") == ListClients)
    assert(one("  Ping  ") == Ping)
  }

  test("multi query parse with trailing semicolon") {
    assert(DslParser.parseDb(" INFOSERVER ; listSTORES;") ==
      Seq(InfoServer, ListStores(None)))
  }

  test("schema clauses parse on every store command") {
    assert(one("LISTSTORES SCHEMA tenant_1") == ListStores(Some("tenant_1")))
    assert(one("GETSTORE school SCHEMA academics") ==
      GetStore("school", Some("academics")))
    assert(one("DROPSTORE school IF EXISTS SCHEMA academics") ==
      DropStore("school", errorIfNotExists = false, Some("academics")))
    assert(one("DROPSCHEMA academics") == DropSchema("academics"))
    one("SET (([1, 2], {department: math})) in school SCHEMA academics") match {
      case SetCmd("school", es, Some("academics")) =>
        assert(es.map(e => (e._1.toSeq, e._2)) ==
          Seq((Seq(1f, 2f), Map("department" -> RawString("math")))))
      case other => fail(s"unexpected $other")
    }
    one("GETSIMN 1 with [1, 2] using cosinesimilarity in school SCHEMA academics where (department = math)") match {
      case GetSimN("school", q, 1, Algorithm.CosineSimilarity,
          Some(Equals("department", RawString("math"))), Some("academics")) =>
        assert(q.toSeq == Seq(1f, 2f))
      case other => fail(s"unexpected $other")
    }
    assert(one("CREATEPREDINDEX (department) in school SCHEMA academics") ==
      CreatePredIndex("school", Seq("department"), Some("academics")))
    assert(one("DROPNONLINEARALGORITHMINDEX (kdtree) in school SCHEMA academics") ==
      DropNonLinearAlgorithmIndex("school", Seq("kdtree"),
        errorIfNotExists = true, Some("academics")))
  }

  test("invalid statements carry the reference's spans") {
    val e1 = intercept[DslParseError](DslParser.parseDb(" random ; listSTORES;"))
    assert((e1.start, e1.end) == (0, 8))
    val e2 = intercept[DslParseError](DslParser.parseDb(" INfoSERVER ; random; ping"))
    assert((e2.start, e2.end) == (13, 20))
  }

  test("error-span corpus transliterated from the reference DSL suites (db.rs/ai.rs)") {
    // each (input, expected span) is the reference's own assertion
    def dbSpan(input: String, start: Int, end: Int): Unit = {
      val e = intercept[DslParseError](DslParser.parseDb(input))
      assert((e.start, e.end) == (start, end), s"db span for <$input>")
    }
    def aiSpan(input: String, start: Int, end: Int): Unit = {
      val e = intercept[DslParseError](DslParser.parseAi(input))
      assert((e.start, e.end) == (start, end), s"ai span for <$input>")
    }
    // dsl/src/tests/db.rs:293-298 — IF NOT EXISTS is invalid for dropstore
    dbSpan("dropstore yeezy IF NOT exists", 15, 29)
    // db.rs:339-344 — unknown non-linear algorithm
    dbSpan("createnonlinearalgorithmindex (fake) in store2", 0, 46)
    // db.rs:374-380 — GETSIMN with zero n fails at parse time
    dbSpan("GETSIMN 0 with [0.1, 0.2] using kdtree in store1 where ( author = hi )", 0, 70)
    // db.rs:438-443 — unknown algorithm in drop
    dbSpan("DROPNONLINEARALGORITHMINDEX (fake) in 1234", 0, 42)
    // db.rs:484-488 — non-numeric key arrays
    dbSpan("getkey ([a, b, c], [3.0, 4.0]) in 1234", 0, 38)
    // db.rs:509-513 — SET requires (([..], {..})) entries
    dbSpan("set 2134 in store", 0, 17)
    // db.rs:562-566
    dbSpan("DELKEY ([a, b, c], [3.0, 4.0]) in 1234", 0, 38)
    // db.rs:587-591 — GETPRED requires a predicate, not key arrays
    dbSpan("GETPRED ([a, b, c], [3.0, 4.0]) in 1234", 0, 39)
    // ai.rs:199-208 — the AI grammar reports the same invalid-statement spans
    aiSpan(" random ; listSTORES;", 0, 8)
    aiSpan(" INfoSERVER ; random; ping", 13, 20)
    // ai.rs:251-256
    aiSpan("dropstore yeezy IF NOT exists", 15, 29)
    // ai.rs:361-365
    aiSpan("createnonlinearalgorithmindex (fake) in store2", 0, 46)
    // ai.rs:396-401 — zero n in AI GETSIMN
    aiSpan("GETSIMN 0 with [random] using kdtree in store1 where ( author = hi )", 0, 68)
    // hnsw is NOT a linear algorithm (dsl/src/algorithm.rs:30-38)
    dbSpan("GETSIMN 5 with [1.0] using hnsw in store1", 0, 41)
  }

  test("positive corpus: numeric store names, multi-key getkey/delkey, IF EXISTS drops (db.rs:444-505)") {
    assert(one("DROPNONLINEARALGORITHMINDEX (kdtree) in 1234") ==
      DropNonLinearAlgorithmIndex("1234", Seq("kdtree"),
        errorIfNotExists = true, None))
    assert(one("DROPNONLINEARALGORITHMINDEX IF EXISTS (kdtree) in 12345") ==
      DropNonLinearAlgorithmIndex("12345", Seq("kdtree"),
        errorIfNotExists = false, None))
    one("getkey ([1, 2, 3], [3.0, 4.0]) in 1234") match {
      case GetKey("1234", keys, None) =>
        assert(keys.map(_.toSeq) == Seq(Seq(1f, 2f, 3f), Seq(3f, 4f)))
      case other => fail(s"unexpected $other")
    }
    one("SET (([1,2,3], {state: Munich, country: Germany}), ([3.2, 4.5, 9.4], {country: USA})) in geo") match {
      case SetCmd("geo", es, None) =>
        assert(es.map(e => (e._1.toSeq, e._2)) == Seq(
          (Seq(1f, 2f, 3f), Map("state" -> RawString("Munich"),
            "country" -> RawString("Germany"))),
          (Seq(3.2f, 4.5f, 9.4f), Map("country" -> RawString("USA")))))
      case other => fail(s"unexpected $other")
    }
  }

  test("create store variants (test_create_store_parse)") {
    assert(one("CREATEstore storename DIMENSION 23") ==
      CreateStore("storename", 23, Nil, Nil, errorIfExists = true, None))
    assert(one("CREATEstore IF NOT EXISTS testing DIMENSION 43") ==
      CreateStore("testing", 43, Nil, Nil, errorIfExists = false, None))
    assert(one("CREATEstore IF NOT EXISTS school DIMENSION 39 PREDICATES (department, faculty)") ==
      CreateStore("school", 39, Seq("department", "faculty"), Nil,
        errorIfExists = false, None))
    assert(one("CREATEstore school DIMENSION 77 PREDICATES(name, surname) NONLINEARALGORITHMINDEX (kdtree)") ==
      CreateStore("school", 77, Seq("name", "surname"),
        Seq(NonLinearConfig.KDTreeConfig()), errorIfExists = true, None))
    assert(one("CREATESTORE IF NOT EXISTS school DIMENSION 39 PREDICATES (department, faculty) SCHEMA academics") ==
      CreateStore("school", 39, Seq("department", "faculty"), Nil,
        errorIfExists = false, Some("academics")))
  }

  test("drop store variants; IF NOT EXISTS is invalid for dropstore") {
    assert(one("DROPSTORE random") ==
      DropStore("random", errorIfNotExists = true, None))
    assert(one("dropstore yeezy_store IF exists") ==
      DropStore("yeezy_store", errorIfNotExists = false, None))
    val e = intercept[DslParseError](DslParser.parseDb("dropstore yeezy IF NOT exists"))
    assert((e.start, e.end) == (15, 29))
  }

  test("pred index statements (create/drop, if exists)") {
    assert(one("CREATEPREDINDEX (one, two, 3) in tapHstore1") ==
      CreatePredIndex("tapHstore1", Seq("one", "two", "3"), None))
    assert(one("DROPPREDINDEX (here, th2) in store2") ==
      DropPredIndex("store2", Seq("here", "th2"), errorIfNotExists = true, None))
    assert(one("DROPPREDINDEX IF EXISTS (off) in storememe") ==
      DropPredIndex("storememe", Seq("off"), errorIfNotExists = false, None))
  }

  test("non-linear index statements; unknown algorithm errors with span") {
    val e = intercept[DslParseError](
      DslParser.parseDb("createnonlinearalgorithmindex (fake) in store2"))
    assert((e.start, e.end) == (0, 46))
    assert(one("createnonlinearalgorithmindex (kdtree) in store2") ==
      CreateNonLinearAlgorithmIndex("store2", Seq(NonLinearConfig.KDTreeConfig()), None))
    one("createnonlinearalgorithmindex (hnsw) in store2") match {
      case CreateNonLinearAlgorithmIndex("store2",
          Seq(_: NonLinearConfig.HNSWConfig), None) => ()
      case other => fail(s"unexpected $other")
    }
  }

  test("getkey / delkey parse f32 arrays") {
    one("GETKEY ([1, 2], [3.0, 4.0]) in school") match {
      case GetKey("school", ks, None) =>
        assert(ks.map(_.toSeq) == Seq(Seq(1f, 2f), Seq(3f, 4f)))
      case other => fail(s"unexpected $other")
    }
    one("DELKEY ([1.2, 3.0], [5.6, 7.8]) in my_store") match {
      case DelKey("my_store", ks, None) =>
        assert(ks.map(_.toSeq) == Seq(Seq(1.2f, 3.0f), Seq(5.6f, 7.8f)))
      case other => fail(s"unexpected $other")
    }
  }

  test("getpred compound predicates (and/or nesting, in/not in)") {
    assert(one("GETPRED ((author = dickens) or (country != Nigeria)) in my_store") ==
      GetPred("my_store", Or(
        Equals("author", RawString("dickens")),
        NotEquals("country", RawString("Nigeria"))), None))
    assert(one("GETPRED ((author in (dickens, rowling)) and (country not in (Nigeria))) in my_store") ==
      GetPred("my_store", And(
        In("author", Set(RawString("dickens"), RawString("rowling"))),
        NotIn("country", Set(RawString("Nigeria")))), None))
  }

  test("getsimn: zero n errors; algorithms map; where clause optional") {
    val e = intercept[DslParseError](
      DslParser.parseDb("GETSIMN 0 with [0.1, 0.2] using kdtree in store1 where ( author = hi )"))
    assert((e.start, e.end) == (0, 70))
    one("GETSIMN 5 with [34.1, 72.2] using cosinesimilarity in random") match {
      case GetSimN("random", q, 5, Algorithm.CosineSimilarity, None, None) =>
        assert(q.toSeq == Seq(34.1f, 72.2f))
      case other => fail(s"unexpected $other")
    }
    one("GETSIMN 8 with [3.7, 9.6] using euclideandistance in other where ((year != 2012) AND (month not in (december, october)))") match {
      case GetSimN("other", q, 8, Algorithm.EuclideanDistance, Some(cond), None) =>
        assert(q.toSeq == Seq(3.7f, 9.6f))
        assert(cond == And(
          NotEquals("year", RawString("2012")),
          NotIn("month", Set(RawString("december"), RawString("october")))))
      case other => fail(s"unexpected $other")
    }
  }

  test("set parses multiple entries with multi-key metadata") {
    one("SET (([1.0, 2.1, 3.2], {name: Haks, category: dev}), ([3.1, 4.8, 5.0], {name: Deven, category: dev})) in store") match {
      case SetCmd("store", es, None) =>
        assert(es.size == 2)
        assert(es.head._1.toSeq == Seq(1.0f, 2.1f, 3.2f))
        assert(es.head._2 == Map("name" -> RawString("Haks"),
          "category" -> RawString("dev")))
        assert(es(1)._2("name") == RawString("Deven"))
      case other => fail(s"unexpected $other")
    }
  }

  test("upsert variants: key+value / none+value / key+none, merge clause") {
    one("UPSERT ([4.0, 5.0, 6.0], {id: 456}) where (id = 123) in store merge") match {
      case Upsert("store", Some(k), Some(v), Equals("id", RawString("123")), true, None) =>
        assert(k.toSeq == Seq(4f, 5f, 6f))
        assert(v == Map("id" -> RawString("456")))
      case other => fail(s"unexpected $other")
    }
    one("UPSERT (none, {id: 456}) where (id = 123) in store") match {
      case Upsert("store", None, Some(_), _, false, None) => ()
      case other => fail(s"unexpected $other")
    }
    one("UPSERT ([1.0], none) where (id = 123) in store SCHEMA t1") match {
      case Upsert("store", Some(_), None, _, false, Some("t1")) => ()
      case other => fail(s"unexpected $other")
    }
  }

  test("image/audio hex literals decode to bytes (/xHEX, /aHEX)") {
    one("GETPRED (pic = /x0A0B) in s") match {
      case GetPred("s", Equals("pic", MetadataValue.Image(b)), None) =>
        assert(b.toSeq == Seq(0x0A.toByte, 0x0B.toByte))
      case other => fail(s"unexpected $other")
    }
    one("GETPRED (clip = /aFF00) in s") match {
      case GetPred("s", Equals("clip", MetadataValue.Audio(b)), None) =>
        assert(b.toSeq == Seq(0xFF.toByte, 0x00.toByte))
      case other => fail(s"unexpected $other")
    }
  }

  test("image/audio literals inside GETSIMN WHERE and IN-lists (both grammars)") {
    // db.rs/ai.rs cover binary literals in GETPRED; the reference grammar
    // accepts them in ANY predicate position — pin GETSIMN WHERE + IN lists
    one("GETSIMN 2 WITH [1.0] USING kdtree IN s WHERE ((tag = /x0A) or (wave != /aFF))") match {
      case GetSimN("s", _, 2, Algorithm.KDTree, Some(cond), None) =>
        assert(cond == Or(
          Equals("tag", MetadataValue.Image(Array(0x0A.toByte))),
          NotEquals("wave", MetadataValue.Audio(Array(0xFF.toByte)))))
      case other => fail(s"unexpected $other")
    }
    one("GETPRED (pic in (/x01, /x02, plain)) in s") match {
      case GetPred("s", In("pic", vs), None) =>
        assert(vs == Set[MetadataValue](
          MetadataValue.Image(Array(0x01.toByte)),
          MetadataValue.Image(Array(0x02.toByte)),
          RawString("plain")))
      case other => fail(s"unexpected $other")
    }
    // AI: an AUDIO literal as the GETSIMN query input, audio in WHERE
    DslParser.parseAi("GETSIMN 1 with [/aCAFE] using cosinesimilarity in s where (wave not in (/a00, /a0102))") match {
      case Seq(AiGetSimN("s", MetadataValue.Audio(q), 1,
          Algorithm.CosineSimilarity, Some(NotIn("wave", vs)), None)) =>
        assert(q.toSeq == Seq(0xCA.toByte, 0xFE.toByte))
        assert(vs == Set[MetadataValue](
          MetadataValue.Audio(Array(0x00.toByte)),
          MetadataValue.Audio(Array(0x01.toByte, 0x02.toByte))))
      case other => fail(s"unexpected $other")
    }
    // AI SET with an image input and audio-valued metadata
    DslParser.parseAi("SET (([/x0B0C], {wave: /aD0E0})) in s PREPROCESSACTION nopreprocessing") match {
      case Seq(AiSet("s", Seq((MetadataValue.Image(in), v)), "nopreprocessing", None, None)) =>
        assert(in.toSeq == Seq(0x0B.toByte, 0x0C.toByte))
        assert(v("wave") match {
          case MetadataValue.Audio(b) => b.toSeq == Seq(0xD0.toByte, 0xE0.toByte)
          case _ => false })
      case other => fail(s"unexpected $other")
    }
  }

  test("odd-length hex literals are committed span errors, not raw-string fallbacks (metadata.rs:32-47)") {
    val e1 = intercept[DslParseError](DslParser.parseDb("GETPRED (pic = /x0A0) in s"))
    assert((e1.start, e1.end) == (0, 26))
    val e2 = intercept[DslParseError](DslParser.parseAi("GETKEY ([/aF]) in s"))
    assert((e2.start, e2.end) == (0, 19))
  }

  test("nested compound predicates: 3-deep nesting, mixed and/or, left-assoc chains") {
    one("GETPRED ((a = 1) and ((b = 2) or ((c != 3) and (d in (x, y))))) in s") match {
      case GetPred("s", cond, None) =>
        assert(cond == And(
          Equals("a", RawString("1")),
          Or(Equals("b", RawString("2")),
            And(NotEquals("c", RawString("3")),
              In("d", Set(RawString("x"), RawString("y")))))))
      case other => fail(s"unexpected $other")
    }
    // unparenthesized chain: the RHS of an operator is a full
    // predicate_expression, which greedily consumes the remaining chain —
    // pest's compound_expression (syntax.pest:171-175) has the SAME shape,
    // so `(a) and (b) or (c)` nests RIGHT on both engines: And(a, Or(b, c))
    one("GETPRED ((a = 1) and (b = 2) or (c = 3)) in s") match {
      case GetPred("s", cond, None) =>
        assert(cond == And(
          Equals("a", RawString("1")),
          Or(Equals("b", RawString("2")), Equals("c", RawString("3")))))
      case other => fail(s"unexpected $other")
    }
  }

  test("SCHEMA variants on every AI statement") {
    DslParser.parseAi("CREATESTORE s QUERYMODEL clap-text INDEXMODEL clap-audio SCHEMA t9") match {
      case Seq(AiCreateStore("s", "clap-text", "clap-audio", Nil, Nil, true, false, Some("t9"))) => ()
      case other => fail(s"unexpected $other")
    }
    DslParser.parseAi("SET (([x], {t: v})) in s SCHEMA t9 PREPROCESSACTION modelpreprocessing EXECUTIONPROVIDER coreml") match {
      case Seq(AiSet("s", _, "modelpreprocessing", Some("coreml"), Some("t9"))) => ()
      case other => fail(s"unexpected $other")
    }
    DslParser.parseAi("GETSIMN 1 with [q] using cosinesimilarity in s SCHEMA t9 where (a = b)") match {
      case Seq(AiGetSimN("s", RawString("q"), 1, _, Some(_), Some("t9"))) => ()
      case other => fail(s"unexpected $other")
    }
    DslParser.parseAi("GETKEY ([k1], [/x0A]) in s SCHEMA t9") match {
      case Seq(AiGetKey("s", Seq(RawString("k1"), MetadataValue.Image(_)), Some("t9"))) => ()
      case other => fail(s"unexpected $other")
    }
    DslParser.parseAi("DELKEY ([k1]) in s SCHEMA t9") match {
      case Seq(AiDelKey("s", Seq(RawString("k1")), Some("t9"))) => ()
      case other => fail(s"unexpected $other")
    }
    DslParser.parseAi("UPSERT ([new input], {t: v}) where (a = b) in s PREPROCESSACTION nopreprocessing SCHEMA t9") match {
      case Seq(AiUpsert("s", Some(RawString("new input")), Some(_), Equals("a", RawString("b")),
          "nopreprocessing", None, Some("t9"))) => ()
      case other => fail(s"unexpected $other")
    }
    DslParser.parseAi("GETPRED (a = b) in s SCHEMA t9") match {
      case Seq(AiGetPred("s", _, Some("t9"))) => ()
      case other => fail(s"unexpected $other")
    }
    DslParser.parseAi("DROPPREDINDEX (k) in s SCHEMA t9") match {
      case Seq(AiDropPredIndex("s", Seq("k"), true, Some("t9"))) => ()
      case other => fail(s"unexpected $other")
    }
  }

  test("AI statement failure spans: missing PREPROCESSACTION, bad model, none-none upsert") {
    def aiSpan(input: String, start: Int, end: Int): Unit = {
      val e = intercept[DslParseError](DslParser.parseAi(input))
      assert((e.start, e.end) == (start, end), s"ai span for <$input>")
    }
    // AI SET requires PREPROCESSACTION (protos/ai/query.proto Set)
    aiSpan("SET (([x], {t: v})) in s", 0, 24)
    // unknown model name fails the model production
    aiSpan("CREATESTORE s QUERYMODEL not-a-model INDEXMODEL clap-text", 0, 57)
    // UPSERT with neither input nor value has no grammar production
    aiSpan("UPSERT ((none, none)) where (a = b) in s PREPROCESSACTION nopreprocessing", 0, 73)
  }

  test("ai statements parse (create store with models, set, getsimn)") {
    DslParser.parseAi("CREATESTORE s QUERYMODEL all-minilm-l6-v2 INDEXMODEL all-minilm-l6-v2 PREDICATES (tag) STOREORIGINAL") match {
      case Seq(AiCreateStore("s", "all-minilm-l6-v2", "all-minilm-l6-v2",
          Seq("tag"), Nil, true, true, None)) => ()
      case other => fail(s"unexpected $other")
    }
    DslParser.parseAi("SET (([hello world], {tag: greeting})) in s PREPROCESSACTION nopreprocessing") match {
      case Seq(AiSet("s", es, "nopreprocessing", None, None)) =>
        assert(es == Seq((RawString("hello world"),
          Map("tag" -> RawString("greeting")))))
      case other => fail(s"unexpected $other")
    }
    DslParser.parseAi("SET (([x], {t: v})) in s PREPROCESSACTION modelpreprocessing EXECUTIONPROVIDER tensorrt") match {
      case Seq(AiSet("s", _, "modelpreprocessing", Some("tensorrt"), None)) => ()
      case other => fail(s"unexpected $other")
    }
    DslParser.parseAi("GETSIMN 3 with [hello] using cosinesimilarity in s where (tag = greeting)") match {
      case Seq(AiGetSimN("s", RawString("hello"), 3, Algorithm.CosineSimilarity,
          Some(Equals("tag", RawString("greeting"))), None)) => ()
      case other => fail(s"unexpected $other")
    }
  }

  test("ai GETPRED / DROPPREDINDEX route through the AI engine, not the DB grammar") {
    // the AI grammar must produce Ai* commands so Pipeline dispatches to
    // AiEngine (reserved-key strip / reserved-index guard,
    // ai/src/engine/operations.rs:276-278)
    DslParser.parseAi("GETPRED (tag = x) IN s") match {
      case Seq(AiGetPred("s", Equals("tag", RawString("x")), None)) => ()
      case other => fail(s"unexpected $other")
    }
    DslParser.parseAi("DROPPREDINDEX IF EXISTS (tag, _ahnlich_input_key) IN s SCHEMA t") match {
      case Seq(AiDropPredIndex("s", Seq("tag", "_ahnlich_input_key"), false, Some("t"))) => ()
      case other => fail(s"unexpected $other")
    }
    // the DB grammar keeps producing DB commands
    DslParser.parseDb("GETPRED (tag = x) IN s") match {
      case Seq(GetPred("s", Equals("tag", RawString("x")), None)) => ()
      case other => fail(s"unexpected $other")
    }
  }

  test("pipeline executes end-to-end with per-statement error capture") {
    val spark = graft.TestFixtures.spark
    val e = new graft.engine.GraftEngine(spark)
    val script =
      """CREATESTORE my_store DIMENSION 3 PREDICATES (page);
        |SET (([0.2, 0.1, 0.0], {page: home}), ([0.9, 0.8, 0.7], {page: hidden})) IN my_store;
        |GETPRED (page = nowhere) IN missing_store;
        |GETSIMN 1 WITH [0.2, 0.1, 0.1] USING cosinesimilarity IN my_store WHERE (page != hidden)""".stripMargin
    val results = Pipeline.runDb(e, script)
    assert(results.size == 4)
    assert(results(0) == Right(Response.Ok))
    assert(results(1) == Right(Response.SetResult(2, 0)))
    assert(results(2).isLeft) // missing store error captured, pipeline continues
    results(3) match {
      case Right(Response.SimEntries(df)) =>
        val rows = df.collect()
        assert(rows.length == 1)
        val m = rows.head.getMap[String, org.apache.spark.sql.Row](1)
        assert(m("page").getString(1) == "home")
      case other => fail(s"unexpected $other")
    }
  }

  // ------------------------------------------ extension statements (§2.7)

  test("extension grammar parses the pipeline-operator family") {
    assert(DslParser.parseExt("SCAN '/tmp/x y.parquet' AS docs") ==
      Seq(ExtScan("/tmp/x y.parquet", "docs")))
    assert(DslParser.parseExt(
      "dedup near FROM docs ID doc_id TEXT body USING minhash NGRAM 3 THRESHOLD 0.8") ==
      Seq(ExtDedupNear("docs", "doc_id", "body", "minhash", 3, 0.8)))
    assert(DslParser.parseExt(
      "DEDUP KEEPONE FROM docs ID doc_id TEXT text USING jaccard NGRAM 2 THRESHOLD 0.5;" +
      "DEDUP EXACT FROM docs ID doc_id TEXT text") ==
      Seq(ExtDedupKeepOne("docs", "doc_id", "text", "jaccard", 2, 0.5),
        ExtDedupExact("docs", "doc_id", "text")))
    assert(DslParser.parseExt("SPLIT FROM docs ID doc_id TRAIN 80 VAL 10") ==
      Seq(ExtSplit("docs", "doc_id", 80, 10)))
    assert(DslParser.parseExt("SPLIT FROM docs ID doc_id") ==
      Seq(ExtSplit("docs", "doc_id", 90, 5))) // reference-style defaults
    assert(DslParser.parseExt("SPLIT SAFE FROM docs ID doc_id TEXT text " +
      "USING minhash NGRAM 3 THRESHOLD 0.8 TRAIN 80 VAL 10") ==
      Seq(ExtSplitSafe("docs", "doc_id", "text", "minhash", 3, 0.8, 80, 10)))
    assert(DslParser.parseExt("SPLIT SAFE FROM docs ID doc_id TEXT text " +
      "USING jaccard NGRAM 2 THRESHOLD 0.5") ==
      Seq(ExtSplitSafe("docs", "doc_id", "text", "jaccard", 2, 0.5, 90, 5)))
    assert(DslParser.parseExt("SAMPLE FROM docs ID doc_id FRACTION 0.2") ==
      Seq(ExtSample("docs", "doc_id", 0.2)))
    assert(DslParser.parseExt(
      "BUDGET SELECT FROM docs ID doc_id TEXT text TOKENS 10000") ==
      Seq(ExtBudgetSelect("docs", "doc_id", "text", 10000L)))
    assert(DslParser.parseExt("CLUSTER ASSIGN FROM emb ID vec_id VEC embedding K 8") ==
      Seq(ExtClusterAssign("emb", "vec_id", "embedding", 8)))
    assert(DslParser.parseExt(
      "CLUSTER SAMPLE FROM emb ID vec_id VEC embedding K 8 PER 5") ==
      Seq(ExtClusterSample("emb", "vec_id", "embedding", 8, 5)))
    assert(DslParser.parseExt(
      "CLUSTER KMEANS FROM emb ID vec_id VEC embedding K 4 ITERS 2") ==
      Seq(ExtClusterKmeans("emb", "vec_id", "embedding", 4, 2)))
    assert(DslParser.parseExt(
      "CLUSTER OUTLIERS FROM emb ID vec_id VEC embedding K 8") ==
      Seq(ExtClusterOutliers("emb", "vec_id", "embedding", 8, 4)))
    assert(DslParser.parseExt(
      "CLUSTER OUTLIERS FROM emb ID vec_id VEC embedding K 8 FACTOR 3") ==
      Seq(ExtClusterOutliers("emb", "vec_id", "embedding", 8, 3)))
    assert(DslParser.parseExt("NGRAM TOPK 20 SIZE 2 FROM docs TEXT text") ==
      Seq(ExtNgramTopK("docs", "text", 2, 20)))
    assert(DslParser.parseExt("NEGATIVES 5 FROM q ID qid VEC emb LABEL lab " +
      "IN corpus ID cid VEC emb LABEL lab") ==
      Seq(ExtNegatives(5, "q", "qid", "emb", "lab", "corpus", "cid", "emb", "lab")))
    assert(DslParser.parseExt("NEGATIVES 5 FROM q ID qid VEC emb LABEL lab " +
      "IN corpus ID cid VEC emb LABEL lab IVF CELLS 8 PROBE 2") ==
      Seq(ExtNegatives(5, "q", "qid", "emb", "lab", "corpus", "cid", "emb", "lab",
        Some((8, 2)))))
    assert(DslParser.parseExt("OVERLAP FROM docs GROUPBY source TEXT text NGRAM 2") ==
      Seq(ExtOverlap("docs", "source", "text", 2)))
    assert(DslParser.parseExt("EMBEDCARD FROM emb VEC embedding GROUPBY label") ==
      Seq(ExtEmbedCard("emb", "embedding", Seq("label"))))
    assert(DslParser.parseExt("DRIFT FROM docs GROUPBY source TEXT text") ==
      Seq(ExtDrift("docs", "source", "text")))
    assert(DslParser.parseExt("DIFF FROM oldv IN newv ID doc_id TEXT text") ==
      Seq(ExtDiff("oldv", "newv", "doc_id", "text")))
    assert(DslParser.parseExt(
      "PACK FROM docs ID doc_id TEXT text BUDGET 2048 SHARDS 8;" +
      "CHUNK FROM docs ID doc_id TEXT text SIZE 32 OVERLAP 8") ==
      Seq(ExtPack("docs", "doc_id", "text", 2048, 8),
        ExtChunk("docs", "doc_id", "text", 32, 8)))
    assert(DslParser.parseExt("VOCAB FROM docs ID doc_id TEXT text;" +
      "TEXTSTATS FROM docs ID doc_id TEXT text;" +
      "LINESIGNALS FROM docs ID doc_id TEXT text") ==
      Seq(ExtVocab("docs", "doc_id", "text"),
        ExtTextStats("docs", "doc_id", "text"),
        ExtLineSignals("docs", "doc_id", "text")))
    assert(DslParser.parseExt(
      "TOPK 5 FROM queries ID qid VEC emb IN corpus ID cid VEC emb") ==
      Seq(ExtTopK(5, "queries", "qid", "emb", "corpus", "cid", "emb")))
    // acceleration arms + fusion + AS piping
    assert(DslParser.parseExt(
      "TOPK 5 FROM q ID qid VEC emb IN c ID cid VEC emb QUANTIZED SHORTLIST 40") ==
      Seq(ExtTopK(5, "q", "qid", "emb", "c", "cid", "emb",
        Command.TopKMode.Quantized(40))))
    assert(DslParser.parseExt(
      "TOPK 5 FROM q ID qid VEC emb IN c ID cid VEC emb IVF CELLS 8 PROBE 2") ==
      Seq(ExtTopK(5, "q", "qid", "emb", "c", "cid", "emb",
        Command.TopKMode.Ivf(8, Some(2), None, None))))
    assert(DslParser.parseExt(
      "TOPK 5 FROM q ID qid VEC emb IN c ID cid VEC emb IVF CELLS 8 PROBE 2 QUANTIZED SHORTLIST 40") ==
      Seq(ExtTopK(5, "q", "qid", "emb", "c", "cid", "emb",
        Command.TopKMode.Ivf(8, Some(2), None, Some(40)))))
    assert(DslParser.parseExt("FUSE 5 FROM lex ID did IN vec ID cid") ==
      Seq(ExtFuse(5, "lex", "did", "vec", "cid", 60)))
    assert(DslParser.parseExt("FUSE 5 FROM lex ID did IN vec ID cid C 10") ==
      Seq(ExtFuse(5, "lex", "did", "vec", "cid", 10)))
    assert(DslParser.parseExt(
      "BM25 3 FROM q ID qid TEXT qt IN docs ID did TEXT text AS lex") ==
      Seq(ExtAs(ExtBm25(3, "q", "qid", "qt", "docs", "did", "text"), "lex")))
    assert(DslParser.parseExt(
      "DEDUP SEMANTIC FROM vecs ID vec_id VEC emb THRESHOLD 0.9") ==
      Seq(ExtDedupSemantic("vecs", "vec_id", "emb", 0.9)))
    assert(DslParser.parseExt("SHUFFLE FROM docs ID doc_id EPOCH 0 SHARDS 8") ==
      Seq(ExtShuffle("docs", "doc_id", 0, 8)))
    assert(DslParser.parseExt("CAP FROM docs ID doc_id GROUPBY source MAX 10") ==
      Seq(ExtCap("docs", "doc_id", "source", 10)))
    assert(DslParser.parseExt("LINES FROM docs ID doc_id TEXT text MAXDF 3") ==
      Seq(ExtLines("docs", "doc_id", "text", 3)))
    assert(DslParser.parseExt(
      "DECON FROM docs ID doc_id TEXT text BENCH evals ID eid TEXT etext NGRAM 8") ==
      Seq(ExtDecon("docs", "doc_id", "text", "evals", "eid", "etext", 8)))
    // bad statements carry spans, like the parity grammars
    val err = intercept[DslParseError](
      DslParser.parseExt("DEDUP NEAR FROM docs NO SUCH CLAUSE"))
    assert(err.start == 0)
    // extension keywords are NOT valid reference statements
    intercept[DslParseError](DslParser.parseDb("SCAN /tmp/x AS docs"))
  }

  test("over-Int int literals are span-carrying parse errors, not raw NumberFormatException") {
    // EPOCH takes a non-negative int; 11 digits overflows Int and must fail
    // INSIDE the grammar's error contract (DslParseError), never escape the
    // semantic action as java.lang.NumberFormatException
    val e = intercept[DslParseError](DslParser.parseExt(
      "SHUFFLE FROM docs ID doc_id EPOCH 99999999999 SHARDS 8"))
    assert(e.message.contains("out of range"), e.message)
    val e2 = intercept[DslParseError](DslParser.parseExt(
      "CHUNK FROM docs ID doc_id TEXT text SIZE 4294967296 OVERLAP 0"))
    assert(e2.message.contains("out of range"), e2.message)
    // SPANS' semantic lower bound is a grammar error too, not a runtime
    // require() turning into a spanless step error
    val e3 = intercept[DslParseError](DslParser.parseExt(
      "SPANS FROM docs ID doc_id TEXT text NGRAM 1"))
    assert(e3.message.contains("NGRAM must be >= 2"), e3.message)
  }

  test("extension pipeline executes against registered views (API parity)") {
    val spark = graft.TestFixtures.spark
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content about spark catalyst optimizer rules"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("ext_docs")
    val results = Pipeline.runExt(spark,
      """DEDUP EXACT FROM ext_docs ID doc_id TEXT text;
        |DEDUP KEEPONE FROM ext_docs ID doc_id TEXT text USING minhash NGRAM 3 THRESHOLD 0.5;
        |SPLIT FROM ext_docs ID doc_id;
        |VOCAB FROM missing_view ID doc_id TEXT text;
        |CHUNK FROM ext_docs ID doc_id TEXT text SIZE 4 OVERLAP 1;
        |SPLIT SAFE FROM ext_docs ID doc_id TEXT text USING jaccard NGRAM 3 THRESHOLD 0.5""".stripMargin)
    assert(results.size == 6)
    def df(i: Int) = results(i) match {
      case Right(Response.Entries(d)) => d
      case other => fail(s"step $i: $other")
    }
    // exact: docs 0 and 2 share content — one cluster, keeper 0
    assert(df(0).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 2L)))
    // keep-one over the near-dup graph drops 1 and 2 (component rep = 0)
    assert(df(1).select("doc_id").as[Long].collect().sorted.toSeq == Seq(0L, 3L))
    assert(df(2).columns.contains("split") && df(2).count() == 4)
    assert(results(3).isLeft, "missing view must be a captured error")
    assert(df(4).count() ==
      graft.pipeline.Corpus.chunkByTokens(docs, "doc_id", "text", 4, 1).count())
    // SPLIT SAFE: the 0/1/2 near-dup cluster lands on one side as a unit
    val safe = df(5).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(safe.size == 4)
    assert(safe(0L) == safe(1L) && safe(1L) == safe(2L),
      "near-dup cluster split across the boundary")
    // BUDGET SELECT: matches the library call exactly
    val bsel = Pipeline.runExt(spark,
      "BUDGET SELECT FROM ext_docs ID doc_id TEXT text TOKENS 30")
    val bdf = bsel.head match {
      case Right(Response.Entries(d)) => d
      case other => fail(s"budget select: $other")
    }
    import org.apache.spark.sql.functions.col
    val scored = docs.select(col("doc_id"),
      graft.text.TextOps.qualityScore(col("text")).as("quality"),
      graft.text.TextOps.tokenCount(col("text")).cast("long").as("toks"))
    val ref = graft.pipeline.Corpus
      .selectByTokenBudget(scored, "doc_id", "quality", "toks", 30L)
      .select("doc_id", "cum_toks").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(ref.nonEmpty && ref.map(_._2).max <= 30L)
    assert(bdf.select("doc_id", "cum_toks").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq == ref)
    // NGRAM TOPK: matches the library call exactly
    val nt = Pipeline.runExt(spark,
      "NGRAM TOPK 3 SIZE 2 FROM ext_docs TEXT text")
    val ntDf = nt.head match {
      case Right(Response.Entries(d)) => d
      case other => fail(s"ngram topk: $other")
    }
    assert(ntDf.orderBy("rank").collect().map(_.getString(0)).toSeq ==
      graft.text.HeavyHitters.ngramTopK(docs, "text", 2, 3)
        .orderBy("rank").collect().map(_.getString(0)).toSeq)
    // CLUSTER ASSIGN / SAMPLE: seeded assignment over a vec view
    val emb = Seq(
      (0L, Array(0f, 0f)), (1L, Array(1f, 1f)),
      (2L, Array(10f, 10f)), (3L, Array(11f, 11f)))
      .toDF("vec_id", "embedding")
    emb.createOrReplaceTempView("ext_emb")
    val ca = Pipeline.runExt(spark,
      """CLUSTER ASSIGN FROM ext_emb ID vec_id VEC embedding K 2;
        |CLUSTER SAMPLE FROM ext_emb ID vec_id VEC embedding K 2 PER 1""".stripMargin)
    val caDf = ca(0) match {
      case Right(Response.Entries(d)) => d
      case other => fail(s"cluster assign: $other")
    }
    val assignGot = caDf.select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // seeds are vectors of ids 0 and 1: far points join seed 1's cluster
    assert(assignGot == Map(0L -> 0, 1L -> 1, 2L -> 1, 3L -> 1))
    val csDf = ca(1) match {
      case Right(Response.Entries(d)) => d
      case other => fail(s"cluster sample: $other")
    }
    assert(csDf.count() == 2) // one row per non-empty cluster
    // CLUSTER KMEANS: matches the library call exactly
    val ck = Pipeline.runExt(spark,
      "CLUSTER KMEANS FROM ext_emb ID vec_id VEC embedding K 2 ITERS 2")
    val ckDf = ck.head match {
      case Right(Response.Entries(d)) => d
      case other => fail(s"cluster kmeans: $other")
    }
    val ckRef = graft.pipeline.Cluster
      .kmeans(emb, "vec_id", "embedding", 2, 2)._2
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ckDf.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap == ckRef)
    // CLUSTER OUTLIERS: same library call through the grammar
    val co = Pipeline.runExt(spark,
      "CLUSTER OUTLIERS FROM ext_emb ID vec_id VEC embedding K 2 FACTOR 3")
    val coDf = co.head match {
      case Right(Response.Entries(d)) => d
      case other => fail(s"cluster outliers: $other")
    }
    val coRef = graft.pipeline.Cluster.embeddingOutliers(emb, "vec_id",
        "embedding", graft.pipeline.Cluster
          .seedCentroids(emb, "vec_id", "embedding", 2), factorNum = 3L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4))).toMap
    assert(coDf.collect().map(r =>
      r.getLong(0) -> (r.getLong(2), r.getBoolean(4))).toMap == coRef)
    // NEGATIVES: matches the library call exactly
    val lemb = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(0f, 1f), 1), (3L, Array(0.1f, 0.9f), 1))
      .toDF("vec_id", "embedding", "label")
    lemb.createOrReplaceTempView("ext_lemb")
    val ng = Pipeline.runExt(spark,
      "NEGATIVES 2 FROM ext_lemb ID vec_id VEC embedding LABEL label " +
        "IN ext_lemb ID vec_id VEC embedding LABEL label")
    val ngDf = ng.head match {
      case Right(Response.Entries(d)) => d
      case other => fail(s"negatives: $other")
    }
    val ngRef = graft.ann.Negatives.hardNegatives(lemb, lemb,
        "vec_id", "embedding", "label", "vec_id", "embedding", "label", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(ngDf.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(4))).toSet == ngRef)
    // IVF arm at nProbe = nCells: identical to the broadcast arm
    val ngIvf = Pipeline.runExt(spark,
      "NEGATIVES 2 FROM ext_lemb ID vec_id VEC embedding LABEL label " +
        "IN ext_lemb ID vec_id VEC embedding LABEL label IVF CELLS 2 PROBE 2")
    val ngIvfDf = ngIvf.head match {
      case Right(Response.Entries(d)) => d
      case other => fail(s"negatives ivf: $other")
    }
    assert(ngIvfDf.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(4))).toSet == ngRef)
  }

  test("extension pipeline: EMBEDCARD executes (API parity)") {
    val spark = graft.TestFixtures.spark
    import spark.implicits._
    Seq((0L, Array(3f, 4f), 0), (1L, Array(0f, 0f), 0), (2L, Array(1f, 0f), 1))
      .toDF("vec_id", "embedding", "label").createOrReplaceTempView("ec_emb")
    val out = Pipeline.runExt(spark,
      "EMBEDCARD FROM ec_emb VEC embedding GROUPBY label")
    val df = out.head match {
      case Right(Response.Entries(d)) => d
      case other => fail(s"embedcard: $other")
    }
    val got = df.collect().map(r => r.getInt(0) ->
      (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_zero"),
        r.getAs[Long]("norm_max_e6"))).toMap
    assert(got == Map(0 -> ((2L, 1L, 5000000L)), 1 -> ((1L, 0L, 1000000L))))
  }

  test("extension pipeline: OVERLAP executes (API parity)") {
    val spark = graft.TestFixtures.spark
    import spark.implicits._
    Seq((0L, "a", "x y z w"), (1L, "b", "x y z q"), (2L, "c", "p q r s"))
      .toDF("doc_id", "source", "text").createOrReplaceTempView("ov_docs")
    val out = Pipeline.runExt(spark,
      "OVERLAP FROM ov_docs GROUPBY source TEXT text NGRAM 2")
    val df = out.head match {
      case Right(Response.Entries(d)) => d
      case other => fail(s"overlap: $other")
    }
    val got = df.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    // a∩b = {"x y","y z"}; the rest share nothing
    assert(got == Map(("a", "b") -> 2L, ("a", "c") -> 0L, ("b", "c") -> 0L))
    // DRIFT: same library call through the grammar
    val dr = Pipeline.runExt(spark,
      "DRIFT FROM ov_docs GROUPBY source TEXT text")
    val drDf = dr.head match {
      case Right(Response.Entries(d)) => d
      case other => fail(s"drift: $other")
    }
    val drRef = graft.pipeline.Overlap.tokenDrift(
        spark.table("ov_docs"), "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(6))).toSet
    assert(drDf.collect().map(r =>
      (r.getString(0), r.getString(1), r.getDouble(6))).toSet == drRef)
    // LINESIGNALS: same library call through the grammar
    val lsOut = Pipeline.runExt(spark,
      "LINESIGNALS FROM ov_docs ID doc_id TEXT text")
    val lsDf = lsOut.head match {
      case Right(Response.Entries(d)) => d
      case other => fail(s"linesignals: $other")
    }
    import org.apache.spark.sql.functions.{col => c}
    val lsRef = spark.table("ov_docs").select(c("doc_id"),
        graft.text.TextOps.lineSignals(c("text")).as("s"))
      .select(c("doc_id"), c("s.n_lines")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lsDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == lsRef)
    // DIFF: version diff through the grammar
    Seq((0L, "x y z w"), (1L, "p q r s")).toDF("doc_id", "text")
      .createOrReplaceTempView("ov_docs_v2")
    val di = Pipeline.runExt(spark,
      "DIFF FROM ov_docs IN ov_docs_v2 ID doc_id TEXT text")
    val diDf = di.head match {
      case Right(Response.Entries(d)) => d
      case other => fail(s"diff: $other")
    }
    // ov_docs has ids 0,1,2; v2 keeps 0 identical, changes 1, drops 2
    assert(diDf.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(1L -> "changed", 2L -> "removed"))
  }

  test("extension pipeline: SHUFFLE/CAP/LINES/DECON execute (API parity)") {
    val spark = graft.TestFixtures.spark
    import spark.implicits._
    val docs = (0L until 30L).map(i =>
      (i, s"header line\nbody unique to doc $i\nfooter line"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("lx_docs")
    val grouped = (0L until 30L).map(i => (i, s"g${i % 2}")).toDF("doc_id", "src")
    grouped.createOrReplaceTempView("lx_grouped")
    // exactly one trigram, and it occurs only in doc 7's body
    Seq((0L, "to doc 7")).toDF("eid", "etext")
      .createOrReplaceTempView("lx_bench")
    val results = Pipeline.runExt(spark,
      """SHUFFLE FROM lx_docs ID doc_id EPOCH 1 SHARDS 4;
        |CAP FROM lx_grouped ID doc_id GROUPBY src MAX 3;
        |LINES FROM lx_docs ID doc_id TEXT text MAXDF 5;
        |DECON FROM lx_docs ID doc_id TEXT text BENCH lx_bench ID eid TEXT etext NGRAM 3""".stripMargin)
    def df(i: Int) = results(i) match {
      case Right(Response.Entries(d)) => d
      case other => fail(s"step $i: $other")
    }
    assert(df(0).count() == 30 &&
      df(0).columns.toSet == Set("doc_id", "shard", "pos"))
    assert(df(1).count() == 6) // 3 per group x 2 groups
    // header/footer repeat in all 30 docs (df > 5) — stripped everywhere
    val lines = df(2).collect().map(_.getString(1))
    assert(lines.length == 30 && lines.forall(t =>
      !t.contains("header") && !t.contains("footer") && t.contains("body")))
    // only doc 7 shares a 3-gram with the benchmark line
    val hits = df(3).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hits.keySet == Set(7L) && hits(7L) > 0)
  }

  test("extension pipeline: hybrid retrieval composes via AS piping; TOPK arms agree") {
    val spark = graft.TestFixtures.spark
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta epsilon"),
      (2L, "gamma delta zeta"),
      (3L, "completely unrelated words here")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("hy_docs")
    docs.where($"doc_id" === 0L)
      .select($"doc_id".as("qid"), $"text".as("qtext"))
      .createOrReplaceTempView("hy_q")
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.2f, 0.1f)),
      (1L, Seq(0.9f, 0.1f, 0.2f, 0.1f)),
      (2L, Seq(0.1f, 1.0f, 0.0f, 0.3f)),
      (3L, Seq(0.0f, 0.1f, 1.0f, 0.9f)),
      (4L, Seq(0.2f, 0.9f, 0.1f, 0.2f)),
      (5L, Seq(0.8f, 0.2f, 0.3f, 0.0f))).toDF("vid", "emb")
    vecs.createOrReplaceTempView("hy_vecs")
    vecs.where($"vid" === 0L).select($"vid".as("qid"), $"emb")
      .createOrReplaceTempView("hy_qvecs")

    val results = Pipeline.runExt(spark,
      """BM25 3 FROM hy_q ID qid TEXT qtext IN hy_docs ID doc_id TEXT text AS hy_lex;
        |TOPK 3 FROM hy_qvecs ID qid VEC emb IN hy_vecs ID vid VEC emb AS hy_vec;
        |FUSE 3 FROM hy_lex ID did IN hy_vec ID cid;
        |TOPK 3 FROM hy_qvecs ID qid VEC emb IN hy_vecs ID vid VEC emb QUANTIZED SHORTLIST 6;
        |TOPK 3 FROM hy_qvecs ID qid VEC emb IN hy_vecs ID vid VEC emb IVF CELLS 2 PROBE 2;
        |TOPK 3 FROM hy_qvecs ID qid VEC emb IN hy_vecs ID vid VEC emb IVF CELLS 2 PROBE 2 QUANTIZED SHORTLIST 6""".stripMargin)
    assert(results.size == 6, results)
    def df(i: Int) = results(i) match {
      case Right(Response.Entries(d)) => d
      case other => fail(s"step $i: $other")
    }
    // rank is int on the scan arms and long on fused output — normalize
    def ranked(i: Int) = df(i).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"),
        r.getAs[Number]("rank").longValue())).sortBy(t => (t._1, t._3)).toSeq

    // FUSE equals a direct rrfFuse of the two piped stages
    val want = graft.text.Hybrid.rrfFuse(
      spark.table("hy_lex").select($"qid", $"did", $"rank"),
      spark.table("hy_vec").select($"qid", $"cid".as("did"), $"rank"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(df(2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet == want)
    // exhaustive settings (shortlist >= corpus, probe = cells) make every
    // acceleration arm EXACT: identical (qid, cid, rank) to the exact arm
    assert(ranked(3) == ranked(1), "SQ8 arm diverged at exhaustive settings")
    assert(ranked(4) == ranked(1), "IVF arm diverged at exhaustive probes")
    assert(ranked(5) == ranked(1), "SQ8-in-IVF arm diverged at exhaustive settings")
    // AS on a non-frame statement (SCAN's own AS is part of its grammar;
    // the trailing AS w wraps the Ok response) is a captured error, not
    // an abort
    val bad = Pipeline.runExt(spark, "SCAN '/tmp/nope.parquet' AS v AS w")
    assert(bad.size == 1 && bad(0).isLeft)
  }

  test("extension grammar parses PQ / DATACARD / persisted-index dedup forms") {
    assert(DslParser.parseExt(
      "TOPK 5 FROM q ID qid VEC emb IN c ID cid VEC emb PQ M 8 KSUB 16 SHORTLIST 100") ==
      Seq(ExtTopK(5, "q", "qid", "emb", "c", "cid", "emb",
        Command.TopKMode.Pq(8, 16, 100))))
    assert(DslParser.parseExt(
      "TOPK 5 FROM q ID qid VEC emb IN c ID cid VEC emb IVF CELLS 8 PROBE 2 PQ M 8 KSUB 16 SHORTLIST 100") ==
      Seq(ExtTopK(5, "q", "qid", "emb", "c", "cid", "emb",
        Command.TopKMode.IvfPq(8, 2, 8, 16, 100))))
    // ROUTED OPQ storage forms (round 16): bare and parameterized — and
    // OPQ must not be swallowed by the PQ alternative
    assert(DslParser.parseExt(
      "TOPK 5 FROM q ID qid VEC emb IN c ID cid VEC emb ROUTED SHARDS 4 PROBE 2 OPQ") ==
      Seq(ExtTopK(5, "q", "qid", "emb", "c", "cid", "emb",
        Command.TopKMode.Routed(4, Some(2), None, "opq", None))))
    assert(DslParser.parseExt(
      "TOPK 5 FROM q ID qid VEC emb IN c ID cid VEC emb ROUTED SHARDS 4 PROBE 2 OPQ M 2 KSUB 16") ==
      Seq(ExtTopK(5, "q", "qid", "emb", "c", "cid", "emb",
        Command.TopKMode.Routed(4, Some(2), None, "opq(m=2,ksub=16)", None))))
    assert(DslParser.parseExt("DATACARD FROM docs TEXT text GROUPBY source,lang") ==
      Seq(ExtDatacard("docs", "text", Seq("source", "lang"))))
    assert(DslParser.parseExt(
      "DEDUP KEEPBEST FROM docs ID doc_id TEXT text RANK quality USING minhash NGRAM 3 THRESHOLD 0.8") ==
      Seq(ExtDedupKeepBest("docs", "doc_id", "text", "quality", "minhash", 3, 0.8)))
    assert(DslParser.parseExt("SCAN '/tmp/x' FORMAT jsonl AS docs") ==
      Seq(ExtScan("/tmp/x", "docs", "jsonl")))
    assert(DslParser.parseExt("MIX FROM docs ID doc_id GROUPBY source TARGET 0.4") ==
      Seq(ExtMix("docs", "doc_id", "source", 0.4, 0.5)))
    assert(DslParser.parseExt(
      "ASOF FROM purchases TS ts_us IN views TS ts_us KEY user_id CARRY event_id,price TOLERANCE 60000000") ==
      Seq(ExtAsof("purchases", "ts_us", "views", "ts_us", "user_id",
        Seq("event_id", "price"), Some(60000000L))))
    assert(DslParser.parseExt(
      "ASOF FROM purchases TS ts_us IN views TS ts_us KEY user_id CARRY event_id") ==
      Seq(ExtAsof("purchases", "ts_us", "views", "ts_us", "user_id",
        Seq("event_id"), None)))
    assert(DslParser.parseExt(
      "INTERVAL FROM p TS ts_us IN v TS ts_us KEY user_id CARRY event_id LOWER -3600000000 UPPER 0") ==
      Seq(ExtInterval("p", "ts_us", "v", "ts_us", "user_id",
        Seq("event_id"), -3600000000L, 0L)))
    assert(DslParser.parseExt(
      "MIX FROM docs ID doc_id GROUPBY source TARGET 0.4 ALPHA 0.7") ==
      Seq(ExtMix("docs", "doc_id", "source", 0.4, 0.7)))
    assert(DslParser.parseExt("SCAN '/tmp/x' AS docs") ==
      Seq(ExtScan("/tmp/x", "docs", "parquet")))
    assert(DslParser.parseExt(
      "DEDUP INDEX '/tmp/idx dir' FROM docs ID doc_id TEXT text NGRAM 3;" +
      "DEDUP APPEND '/tmp/idx dir' FROM batch ID doc_id TEXT text;" +
      "DEDUP INCREMENTAL '/tmp/idx dir' FROM batch ID doc_id TEXT text THRESHOLD 0.8") ==
      Seq(ExtDedupIndex("/tmp/idx dir", "docs", "doc_id", "text", 3),
        ExtDedupAppend("/tmp/idx dir", "batch", "doc_id", "text"),
        ExtDedupIncremental("/tmp/idx dir", "batch", "doc_id", "text", 0.8)))
  }

  test("extension pipeline: PQ arm, DATACARD, and incremental dedup execute (API parity)") {
    val spark = graft.TestFixtures.spark
    import spark.implicits._
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.2f, 0.1f)),
      (1L, Seq(0.9f, 0.1f, 0.2f, 0.1f)),
      (2L, Seq(0.1f, 1.0f, 0.0f, 0.3f)),
      (3L, Seq(0.0f, 0.1f, 1.0f, 0.9f)),
      (4L, Seq(0.2f, 0.9f, 0.1f, 0.2f)),
      (5L, Seq(0.8f, 0.2f, 0.3f, 0.0f))).toDF("vid", "emb")
    vecs.createOrReplaceTempView("pq_vecs")
    vecs.where($"vid" === 0L).select($"vid".as("qid"), $"emb")
      .createOrReplaceTempView("pq_q")
    val results = Pipeline.runExt(spark,
      """TOPK 3 FROM pq_q ID qid VEC emb IN pq_vecs ID vid VEC emb;
        |TOPK 3 FROM pq_q ID qid VEC emb IN pq_vecs ID vid VEC emb PQ M 2 KSUB 4 SHORTLIST 6;
        |TOPK 3 FROM pq_q ID qid VEC emb IN pq_vecs ID vid VEC emb IVF CELLS 2 PROBE 2 PQ M 2 KSUB 4 SHORTLIST 6""".stripMargin)
    assert(results.size == 3 && results.forall(_.isRight), results)
    def ranked(i: Int) = results(i) match {
      case Right(Response.Entries(d)) => d.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._3).toSeq
      case other => fail(s"step $i: $other")
    }
    // shortlist = corpus ⇒ the PQ arms rescan everything exactly
    assert(ranked(1) == ranked(0), "PQ arm diverged at exhaustive shortlist")
    assert(ranked(2) == ranked(0), "IVF-PQ arm diverged at exhaustive settings")

    // ROUTED arm: probe = shards (exhaustive all-shard merge) + a beam
    // wider than this corpus ⇒ exact, so it must match the exact arm
    val routedRes = Pipeline.runExt(spark,
      "TOPK 3 FROM pq_q ID qid VEC emb IN pq_vecs ID vid VEC emb ROUTED SHARDS 2 PROBE 2")
    assert(routedRes.forall(_.isRight), routedRes)
    val routedRanked = routedRes.head match {
      case Right(Response.Entries(d)) => d.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._3).toSeq
      case other => fail(s"routed arm: $other")
    }
    assert(routedRanked == ranked(0), "ROUTED arm diverged at exhaustive probes")

    // SQ8 arm: quantized graphs + exact rescore — at exhaustive probes
    // with the slack window covering this corpus, identical to the exact
    // arm; RECALL 1.0 through it is refused (approximate shortlist)
    val sq8Res = Pipeline.runExt(spark,
      """TOPK 3 FROM pq_q ID qid VEC emb IN pq_vecs ID vid VEC emb ROUTED SHARDS 2 PROBE 2 SQ8;
        |TOPK 3 FROM pq_q ID qid VEC emb IN pq_vecs ID vid VEC emb ROUTED SHARDS 2 RECALL 1.0 SQ8""".stripMargin)
    val sq8Ranked = sq8Res.head match {
      case Right(Response.Entries(d)) => d.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._3).toSeq
      case other => fail(s"sq8 routed arm: $other")
    }
    assert(sq8Ranked == ranked(0), "SQ8 ROUTED arm diverged at exhaustive probes")
    sq8Res(1) match {
      case Left(msg) => assert(msg.contains("RECALL 1.0"), msg)
      case other => fail(s"RECALL 1.0 SQ8 must be refused, got $other")
    }

    // PQ ROUTED arm (round 15): product-quantized graphs + exact rescore
    // at the wider PQ slack — at exhaustive probes with the slack window
    // covering this corpus, identical to the exact arm. Explicit M/KSUB
    // and the bare PQ form (split resolved from the corpus dimension)
    // both parse; RECALL 1.0 through PQ is refused like SQ8
    val pqRoutedRes = Pipeline.runExt(spark,
      """TOPK 3 FROM pq_q ID qid VEC emb IN pq_vecs ID vid VEC emb ROUTED SHARDS 2 PROBE 2 PQ M 2 KSUB 4;
        |TOPK 3 FROM pq_q ID qid VEC emb IN pq_vecs ID vid VEC emb ROUTED SHARDS 2 PROBE 2 PQ;
        |TOPK 3 FROM pq_q ID qid VEC emb IN pq_vecs ID vid VEC emb ROUTED SHARDS 2 RECALL 1.0 PQ""".stripMargin)
    Seq(0, 1).foreach { i =>
      val pqRanked = pqRoutedRes(i) match {
        case Right(Response.Entries(d)) => d.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._3).toSeq
        case other => fail(s"pq routed arm $i: $other")
      }
      assert(pqRanked == ranked(0), s"PQ ROUTED arm $i diverged at exhaustive probes")
    }
    pqRoutedRes(2) match {
      case Left(msg) => assert(msg.contains("RECALL 1.0"), msg)
      case other => fail(s"RECALL 1.0 PQ must be refused, got $other")
    }

    // OPQ ROUTED arm (round 16): the learned rotation in front of the
    // same codes — orthogonal invariance means exhaustive probes +
    // rescore is still exactly the exact arm; RECALL 1.0 refused like
    // every quantized storage
    val opqRoutedRes = Pipeline.runExt(spark,
      """TOPK 3 FROM pq_q ID qid VEC emb IN pq_vecs ID vid VEC emb ROUTED SHARDS 2 PROBE 2 OPQ M 2 KSUB 4;
        |TOPK 3 FROM pq_q ID qid VEC emb IN pq_vecs ID vid VEC emb ROUTED SHARDS 2 RECALL 1.0 OPQ""".stripMargin)
    opqRoutedRes(0) match {
      case Right(Response.Entries(d)) =>
        assert(d.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._3).toSeq
          == ranked(0), "OPQ ROUTED arm diverged at exhaustive probes")
      case other => fail(s"opq routed arm: $other")
    }
    opqRoutedRes(1) match {
      case Left(msg) => assert(msg.contains("RECALL 1.0"), msg)
      case other => fail(s"RECALL 1.0 OPQ must be refused, got $other")
    }

    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again", "web", "en"),
      (1L, "the quick brown fox jumps over the lazy dog again", "web", "en"),
      (2L, "unrelated words entirely", "books", "de")).toDF(
      "doc_id", "text", "source", "lang")
    docs.createOrReplaceTempView("dc_docs")
    val card = Pipeline.runExt(spark,
      "DATACARD FROM dc_docs TEXT text GROUPBY source,lang") match {
      case Seq(Right(Response.Entries(d))) => d.collect()
      case other => fail(s"$other")
    }
    assert(card.length == 2)
    val web = card.find(_.getString(0) == "web").get
    assert(web.getAs[Long]("n_docs") == 2 && web.getAs[Long]("n_exact_dups") == 1)

    // index build → probe → append → re-probe, all through statements
    val dir = java.nio.file.Files.createTempDirectory("dsl-mh").toString
    docs.where($"doc_id" < 2).createOrReplaceTempView("mh_hist")
    Seq((100L, "the quick brown fox jumps over the lazy dog again today"))
      .toDF("doc_id", "text").createOrReplaceTempView("mh_batch")
    val steps = Pipeline.runExt(spark,
      s"""DEDUP INDEX '$dir' FROM mh_hist ID doc_id TEXT text NGRAM 3;
         |DEDUP INCREMENTAL '$dir' FROM mh_batch ID doc_id TEXT text THRESHOLD 0.5;
         |DEDUP APPEND '$dir' FROM mh_batch ID doc_id TEXT text""".stripMargin)
    assert(steps.size == 3 && steps.forall(_.isRight), steps)
    val pairs = steps(1) match {
      case Right(Response.Entries(d)) => d.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      case other => fail(s"$other")
    }
    assert(pairs == Set((100L, 0L), (100L, 1L)))
    // the appended batch is now part of history for the next generation
    Seq((200L, "the quick brown fox jumps over the lazy dog again today indeed"))
      .toDF("doc_id", "text").createOrReplaceTempView("mh_batch2")
    val probe2 = Pipeline.runExt(spark,
      s"DEDUP INCREMENTAL '$dir' FROM mh_batch2 ID doc_id TEXT text THRESHOLD 0.5")
    val pairs2 = probe2.head match {
      case Right(Response.Entries(d)) => d.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      case other => fail(s"$other")
    }
    assert(pairs2.contains((200L, 100L)), pairs2)
    // probing a dir with no index is a captured step error, not an abort
    val missing = Pipeline.runExt(spark,
      "DEDUP INCREMENTAL '/tmp/definitely-no-index' FROM mh_batch ID doc_id TEXT text THRESHOLD 0.5")
    assert(missing.size == 1 && missing.head.isLeft)

    // SCAN FORMAT jsonl registers both the parsed view and its corrupt
    // audit twin
    val srcDir = java.nio.file.Files.createTempDirectory("dsl-jsonl").toString
    graft.sources.CorpusSource.writeJsonl(
      Seq((1L, "alpha", "en", "web", 5L), (2L, "beta", "en", "web", 4L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"), srcDir)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(srcDir, "part-bad.json"), "not json\n")
    val scanned = Pipeline.runExt(spark, s"SCAN '$srcDir' FORMAT jsonl AS dj")
    assert(scanned == Seq(Right(Response.Ok)), scanned)
    assert(spark.table("dj").count() == 2)
    assert(spark.table("dj_corrupt").collect()
      .map(_.getAs[String]("raw")).toSeq == Seq("not json"))
  }

  test("extension pipeline: TRACE controls the span recorder") {
    val spark = graft.TestFixtures.spark
    assert(DslParser.parseExt("TRACE ON; TRACE SHOW; TRACE RESET; TRACE OFF") ==
      Seq(ExtTrace("on"), ExtTrace("show"), ExtTrace("reset"), ExtTrace("off")))
    val prev = graft.obs.Trace.enabled
    try {
      import spark.implicits._
      Seq(("a", "en", "x y z")).toDF("source", "lang", "text")
        .createOrReplaceTempView("tr_docs")
      val results = Pipeline.runExt(spark,
        "TRACE ON; DATACARD FROM tr_docs TEXT text GROUPBY source; " +
        "TRACE SHOW; TRACE OFF")
      assert(results.size == 4 && results.forall(_.isRight))
      val frame = results(2) match {
        case Right(Response.Entries(df)) => df
        case other => fail(s"TRACE SHOW: $other")
      }
      // span schema is the queryable surface — pin the load-bearing columns
      val cols = frame.columns.toSet
      assert(Set("seq", "parent", "op", "store", "durNs", "ok", "jobs",
        "taskTimeMs").subsetOf(cols), cols)
      // extension statements land in the same frame as engine ops,
      // named ext.<statement> on their first operand
      val spans = frame.select("op", "store").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(spans.contains(("ext.datacard", "tr_docs")), spans.toSeq)
      assert(!graft.obs.Trace.enabled)
    } finally graft.obs.Trace.enabled = prev
  }

  test("extension pipeline: SPANS and PPL parse and execute (API parity)") {
    val spark = graft.TestFixtures.spark
    import spark.implicits._
    assert(DslParser.parseExt("SPANS FROM docs ID doc_id TEXT text NGRAM 8") ==
      Seq(ExtSpans("docs", "doc_id", "text", 8)))
    assert(DslParser.parseExt("PPL FROM docs ID doc_id TEXT text") ==
      Seq(ExtPpl("docs", "doc_id", "text")))
    assert(DslParser.parseExt("GOPHER FROM docs ID doc_id TEXT text") ==
      Seq(ExtGopher("docs", "doc_id", "text")))
    assert(DslParser.parseExt(
      "BM25 5 FROM qs ID qid TEXT qtext IN docs ID doc_id TEXT text") ==
      Seq(ExtBm25(5, "qs", "qid", "qtext", "docs", "doc_id", "text")))
    assert(DslParser.parseExt(
      "DSIR FROM docs ID doc_id TEXT text TARGET wiki ID wid TEXT wtext") ==
      Seq(ExtDsir("docs", "doc_id", "text", "wiki", "wid", "wtext")))
    assert(DslParser.parseExt(
      "CLASSIFY FROM docs ID doc_id TEXT text TRAIN labeled ID lid TEXT ltext LABEL lang") ==
      Seq(ExtClassify("docs", "doc_id", "text", "labeled", "lid", "ltext", "lang")))
    Seq((1L, "p q r s t"), (2L, "m n p q r z"))
      .toDF("doc_id", "text").createOrReplaceTempView("sp_docs")
    val results = Pipeline.runExt(spark,
      """SPANS FROM sp_docs ID doc_id TEXT text NGRAM 3;
        |PPL FROM sp_docs ID doc_id TEXT text""".stripMargin)
    val out = results(0) match {
      case Right(Response.Entries(d)) =>
        d.collect().map(r => (r.getLong(0), r.getString(1))).toMap
      case other => fail(s"$other")
    }
    // doc 1 holds the first "p q r"; doc 2's occurrence is cut
    assert(out == Map(1L -> "p q r s t", 2L -> "m n z"), s"got $out")
    val ppl = results(1) match {
      case Right(Response.Entries(d)) =>
        d.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      case other => fail(s"$other")
    }
    assert(ppl.keySet == Set(1L, 2L) && ppl.values.forall(_ > 0))
    val gopher = Pipeline.runExt(spark,
      "GOPHER FROM sp_docs ID doc_id TEXT text").head match {
      case Right(Response.Entries(d)) => d
      case other => fail(s"$other")
    }
    assert(gopher.columns.toSeq == Seq("doc_id", "ok_words", "ok_mean_len",
      "ok_symbol", "ok_alpha", "ok_stop", "pass"))
    assert(gopher.count() == 2)
    Seq((7L, "p q")).toDF("qid", "qtext").createOrReplaceTempView("sp_qs")
    val bm = Pipeline.runExt(spark,
      "BM25 2 FROM sp_qs ID qid TEXT qtext IN sp_docs ID doc_id TEXT text")
      .head match {
      case Right(Response.Entries(d)) =>
        d.collect().map(r => (r.getLong(3), r.getLong(1))).toMap
      case other => fail(s"$other")
    }
    // both docs match "p q"; the shorter doc (1) outranks the longer (2)
    assert(bm == Map(1L -> 1L, 2L -> 2L), s"got $bm")
    Seq((50L, "p q r s t")).toDF("tid", "ttext")
      .createOrReplaceTempView("sp_target")
    val dsir = Pipeline.runExt(spark,
      "DSIR FROM sp_docs ID doc_id TEXT text TARGET sp_target ID tid TEXT ttext")
      .head match {
      case Right(Response.Entries(d)) =>
        d.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      case other => fail(s"$other")
    }
    // doc 1 IS the target text; doc 2 only overlaps partially
    assert(dsir.keySet == Set(1L, 2L) && dsir(1L) > dsir(2L), s"got $dsir")
    Seq((1L, "p q r s t", "keep"), (2L, "zz yy xx ww", "drop"))
      .toDF("tid", "ttext", "cls").createOrReplaceTempView("sp_train")
    val cls = Pipeline.runExt(spark,
      "CLASSIFY FROM sp_docs ID doc_id TEXT text " +
        "TRAIN sp_train ID tid TEXT ttext LABEL cls")
      .head match {
      case Right(Response.Entries(d)) =>
        d.collect().map(r => (r.getLong(0), r.getString(1))).toMap
      case other => fail(s"$other")
    }
    // doc 1 is the "keep" training text verbatim; doc 2 overlaps it too
    // (shares p q r) far more than the disjoint "drop" class
    assert(cls == Map(1L -> "keep", 2L -> "keep"), s"got $cls")
  }

  test("extension pipeline: DEDUP SEMANTIC executes (API parity)") {
    val spark = graft.TestFixtures.spark
    import spark.implicits._
    val base = (0 until 20).map(i =>
      (i.toLong, Array.tabulate(16)(j => graft.TestFixtures.vec(9L, i.toLong, 16)(j)).toSeq))
    // rescaled duplicates of ids 0 and 1: cosine ≈ 1, must collapse to base
    val dups = (0 until 2).map(i => (100L + i, base(i)._2.map(x => x * 1.03f)))
    (base ++ dups).toDF("vec_id", "emb").createOrReplaceTempView("sem_vecs")
    val results = Pipeline.runExt(spark,
      "DEDUP SEMANTIC FROM sem_vecs ID vec_id VEC emb THRESHOLD 0.95")
    val kept = results.head match {
      case Right(Response.Entries(d)) =>
        d.select("vec_id").as[Long].collect().toSet
      case other => fail(s"$other")
    }
    assert(kept == base.map(_._1).toSet)
    assert(kept == graft.dedup.Dedup.semanticKeepOne(
      spark.table("sem_vecs"), "vec_id", "emb", 0.95)
      .select("vec_id").as[Long].collect().toSet)
  }

  test("extension pipeline: SCAN/SAMPLE/PACK/VOCAB/TEXTSTATS/TOPK execute (API parity)") {
    val spark = graft.TestFixtures.spark
    import spark.implicits._
    val docs = (0L until 20L).map(i => (i, s"alpha beta gamma delta token$i"))
      .toDF("doc_id", "text")
    val parquetDir = java.nio.file.Files.createTempDirectory("graft-ext-scan").toString
    docs.write.mode("overwrite").parquet(s"$parquetDir/docs.parquet")
    val vecs = (0L until 10L).map(i => (i, Seq(i.toFloat, 1f, 2f)))
      .toDF("vec_id", "emb")
    vecs.createOrReplaceTempView("ext_vecs")
    val results = Pipeline.runExt(spark,
      s"""SCAN '$parquetDir/docs.parquet' AS scanned;
         |SAMPLE FROM scanned ID doc_id FRACTION 0.5;
         |PACK FROM scanned ID doc_id TEXT text BUDGET 8 SHARDS 2;
         |VOCAB FROM scanned ID doc_id TEXT text;
         |TEXTSTATS FROM scanned ID doc_id TEXT text;
         |TOPK 3 FROM ext_vecs ID vec_id VEC emb IN ext_vecs ID vec_id VEC emb""".stripMargin)
    assert(results.size == 6)
    assert(results(0) == Right(Response.Ok))
    def df(i: Int) = results(i) match {
      case Right(Response.Entries(d)) => d
      case other => fail(s"step $i: $other")
    }
    assert(df(1).count() ==
      graft.pipeline.Corpus.deterministicSample(docs, "doc_id", 0.5).count())
    assert(df(2).columns.toSet == Set("doc_id", "shard", "seq", "off", "n_tok"))
    assert(df(2).count() == 20)
    // 4 shared tokens + 20 unique token<i> words
    assert(df(3).count() == 24)
    assert(df(4).columns.toSet ==
      Set("doc_id", "lang", "n_tok", "quality", "fingerprint"))
    // every query's rank-1 neighbor under cosine is itself
    val top1 = df(5).where(org.apache.spark.sql.functions.col("rank") === 1)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top1.length == 10 && top1.forall { case (q, c) => q == c })
    graft.engine.Persistence.deleteDir(parquetDir)
  }

  test("URL CANON: grammar parses and execution matches the UrlOps API") {
    val spark = graft.TestFixtures.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    assert(DslParser.parseExt("URL CANON FROM pages COL u") ==
      Seq(ExtUrlCanon("pages", "u")))
    val pages = Seq(
      (0L, "HTTP://WWW.Example.COM:80/A?utm_source=x&id=9#f"),
      (1L, "https://cdn.a.site.NET:443"),
      (2L, "plain junk")).toDF("pid", "u")
    pages.createOrReplaceTempView("url_pages")
    val got = Pipeline.runExt(spark, "URL CANON FROM url_pages COL u") match {
      case Seq(Right(Response.Entries(d))) =>
        d.collect().map(r => (r.getLong(0), r.getString(2), r.getString(3),
          r.getString(4))).sortBy(_._1).toSeq
      case other => fail(s"$other")
    }
    assert(got == Seq(
      (0L, "http://www.example.com/A?id=9", "www.example.com", "example.com"),
      (1L, "https://cdn.a.site.net/", "cdn.a.site.net", "site.net"),
      (2L, "plain junk", "", "")))
    val api = pages.select(col("pid"),
      graft.text.UrlOps.canonicalizeUrl(col("u")).as("c"),
      graft.text.UrlOps.urlHost(col("u")).as("h"),
      graft.text.UrlOps.registrableDomain(col("u")).as("d"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).sortBy(_._1).toSeq
    assert(got == api)
  }

  test("REPETITION: grammar parses and execution matches the TextOps API") {
    val spark = graft.TestFixtures.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    assert(DslParser.parseExt("REPETITION FROM d ID doc_id TEXT text") ==
      Seq(ExtRepetition("d", "doc_id", "text")))
    val docs = Seq(
      (0L, "a b\na b\nc"),
      (1L, "spam spam spam spam spam spam")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("rep_docs")
    val got = Pipeline.runExt(spark,
      "REPETITION FROM rep_docs ID doc_id TEXT text") match {
      case Seq(Right(Response.Entries(d))) =>
        assert(d.columns.length == 14 && d.columns.head == "doc_id")
        d.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(8)))
          .sortBy(_._1).toSeq
      case other => fail(s"$other")
    }
    // doc 0: one of three lines duplicated; doc 1: full 5-gram coverage
    assert(got == Seq((0L, 1.0 / 3.0, 0.0), (1L, 0.0, 1.0)))
  }

  test("WRITE SHARDS: grammar parses, writes, and returns the manifest") {
    val spark = graft.TestFixtures.spark
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("dsl-shards").toString
    assert(DslParser.parseExt(
      s"WRITE SHARDS '$out' FROM d ID id TEXT text EPOCH 2 SHARDS 3") ==
      Seq(ExtWriteShards(out, "d", "id", "text", 2, 3)))
    (0L until 30L).map(i => (i, s"d$i")).toDF("id", "text")
      .createOrReplaceTempView("ws_docs")
    val got = Pipeline.runExt(spark,
      s"WRITE SHARDS '$out' FROM ws_docs ID id TEXT text EPOCH 2 SHARDS 3") match {
      case Seq(Right(Response.Entries(d))) =>
        d.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      case other => fail(s"$other")
    }
    assert(got.map(_._2).sum == 30L && got.map(_._1).toSet.subsetOf(Set(0L, 1L, 2L)))
    graft.engine.Persistence.deleteDir(out)
  }

  test("BLOCKLIST: grammar parses and execution matches the TextOps API") {
    val spark = graft.TestFixtures.spark
    import spark.implicits._
    assert(DslParser.parseExt(
      "BLOCKLIST FROM d ID doc_id TEXT text WORDS casino,lottery") ==
      Seq(ExtBlocklist("d", "doc_id", "text", Seq("casino", "lottery"))))
    Seq((0L, "all clean here"), (1L, "visit CASINO and lottery now"))
      .toDF("doc_id", "text").createOrReplaceTempView("bl_docs")
    val got = Pipeline.runExt(spark,
      "BLOCKLIST FROM bl_docs ID doc_id TEXT text WORDS casino,lottery") match {
      case Seq(Right(Response.Entries(d))) =>
        d.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
          .sortBy(_._1).toSeq
      case other => fail(s"$other")
    }
    assert(got == Seq((0L, 0L, false), (1L, 2L, true)))
  }

  test("HTML EXTRACT: grammar parses and execution matches the Html API") {
    val spark = graft.TestFixtures.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    assert(DslParser.parseExt("HTML EXTRACT FROM pages COL h") ==
      Seq(ExtHtmlExtract("pages", "h")))
    val pages = Seq(
      (0L, "<html><body><p>a</p><script>x=1</script><p>b&amp;c</p></body>"),
      (1L, "no markup at all")).toDF("pid", "h")
    pages.createOrReplaceTempView("html_pages")
    val got = Pipeline.runExt(spark, "HTML EXTRACT FROM html_pages COL h") match {
      case Seq(Right(Response.Entries(d))) =>
        d.collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._1).toSeq
      case other => fail(s"$other")
    }
    assert(got == Seq((0L, "a b&c"), (1L, "no markup at all")))
    val api = pages.select(col("pid"),
      graft.text.Html.extractText(col("h")).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == api)
  }

  test("TOPK ... USING INDEX: second invocation LOADS the pinned artifacts (zero rebuilds); empty corpus short-circuits") {
    val spark = graft.TestFixtures.spark
    import spark.implicits._
    // grammar: both arms accept the clause
    assert(DslParser.parseExt(
      "TOPK 5 FROM q ID qid VEC emb IN c ID cid VEC emb ROUTED SHARDS 2 PROBE 2 USING INDEX '/tmp/x'") ==
      Seq(ExtTopK(5, "q", "qid", "emb", "c", "cid", "emb",
        Command.TopKMode.Routed(2, Some(2), None, storage = "f32", Some("/tmp/x")))))
    assert(DslParser.parseExt(
      "TOPK 5 FROM q ID qid VEC emb IN c ID cid VEC emb IVF CELLS 8 PROBE 2 USING INDEX '/tmp/y'") ==
      Seq(ExtTopK(5, "q", "qid", "emb", "c", "cid", "emb",
        Command.TopKMode.Ivf(8, Some(2), None, None, Some("/tmp/y")))))
    val rnd = new scala.util.Random(11L)
    val vecs = (0 until 64)
      .map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vid", "emb")
    vecs.createOrReplaceTempView("ui_vecs")
    vecs.where($"vid" < 4).select($"vid".as("qid"), $"emb")
      .createOrReplaceTempView("ui_q")
    val rDir = java.nio.file.Files.createTempDirectory("dsl-routed-ui").toString
    val iDir = java.nio.file.Files.createTempDirectory("dsl-ivf-ui").toString
    val script =
      s"""TOPK 3 FROM ui_q ID qid VEC emb IN ui_vecs ID vid VEC emb ROUTED SHARDS 2 PROBE 2 USING INDEX '$rDir';
         |TOPK 3 FROM ui_q ID qid VEC emb IN ui_vecs ID vid VEC emb IVF CELLS 2 PROBE 2 USING INDEX '$iDir'""".stripMargin
    def run(): Seq[Seq[(Long, Long, Long)]] = Pipeline.runExt(spark, script).map {
      case Right(Response.Entries(d)) => d.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
        .sortBy(x => (x._1, x._3)).toSeq
      case other => fail(s"USING INDEX arm failed: $other")
    }
    val first = run()
    // a rebuild would SAVE over the artifacts — unchanged mtimes prove the
    // second invocation deserialized (zero Lloyd rounds, zero graph builds)
    def mtimes(dir: String): Map[String, Long] =
      new java.io.File(dir).listFiles().map(f => f.getName -> f.lastModified).toMap
    val (rM, iM) = (mtimes(rDir), mtimes(iDir))
    assert(rM.nonEmpty && iM.nonEmpty, "first invocation must build AND save")
    val second = run()
    assert(second == first, "pinned-artifact arms must answer identically")
    assert(mtimes(rDir) == rM,
      "second ROUTED invocation rewrote artifacts — it rebuilt instead of loading")
    assert(mtimes(iDir) == iM,
      "second IVF invocation rewrote artifacts — it rebuilt instead of loading")
    // a SHAPE change is a different index: artifacts rewrite (stale by identity)
    val reshaped = Pipeline.runExt(spark,
      s"TOPK 3 FROM ui_q ID qid VEC emb IN ui_vecs ID vid VEC emb ROUTED SHARDS 4 PROBE 4 USING INDEX '$rDir'")
    assert(reshaped.forall(_.isRight), reshaped)
    assert(mtimes(rDir) != rM, "a shard-count change must rebuild the pinned artifact")
    // empty corpus: the routed arm short-circuits to an empty result
    // instead of failing to derive a dimension / train centroids
    vecs.where($"vid" < 0).createOrReplaceTempView("ui_empty")
    Pipeline.runExt(spark,
      "TOPK 3 FROM ui_q ID qid VEC emb IN ui_empty ID vid VEC emb ROUTED SHARDS 2 PROBE 2") match {
      case Seq(Right(Response.Entries(d))) =>
        assert(d.count() == 0)
        assert(d.columns.toSeq == Seq("qid", "cid", "sim", "rank"))
      case other => fail(s"empty-corpus routed arm: $other")
    }
  }

  test("TOPK ... ROUTED ... RECALL r: calibrates once, persists the curve, picks probes by measured recall") {
    val spark = graft.TestFixtures.spark
    import spark.implicits._
    assert(DslParser.parseExt(
      "TOPK 5 FROM q ID qid VEC emb IN c ID cid VEC emb ROUTED SHARDS 2 RECALL 0.9 USING INDEX '/tmp/x'") ==
      Seq(ExtTopK(5, "q", "qid", "emb", "c", "cid", "emb",
        Command.TopKMode.Routed(2, None, Some(0.9), storage = "f32", Some("/tmp/x")))))
    assert(DslParser.parseExt(
      "TOPK 5 FROM q ID qid VEC emb IN c ID cid VEC emb ROUTED SHARDS 4 RECALL 1.0") ==
      Seq(ExtTopK(5, "q", "qid", "emb", "c", "cid", "emb",
        Command.TopKMode.Routed(4, None, Some(1.0), storage = "f32", None))))
    // the IVF arm takes the same contract
    assert(DslParser.parseExt(
      "TOPK 5 FROM q ID qid VEC emb IN c ID cid VEC emb IVF CELLS 8 RECALL 0.9") ==
      Seq(ExtTopK(5, "q", "qid", "emb", "c", "cid", "emb",
        Command.TopKMode.Ivf(8, None, Some(0.9), None, None))))
    // round-15 storage forms: SQ8, bare PQ, PQ M/KSUB — StorageSpec keys
    assert(DslParser.parseExt(
      "TOPK 5 FROM q ID qid VEC emb IN c ID cid VEC emb ROUTED SHARDS 4 PROBE 2 SQ8 USING INDEX '/tmp/x'") ==
      Seq(ExtTopK(5, "q", "qid", "emb", "c", "cid", "emb",
        Command.TopKMode.Routed(4, Some(2), None, storage = "sq8", Some("/tmp/x")))))
    assert(DslParser.parseExt(
      "TOPK 5 FROM q ID qid VEC emb IN c ID cid VEC emb ROUTED SHARDS 4 RECALL 0.9 PQ") ==
      Seq(ExtTopK(5, "q", "qid", "emb", "c", "cid", "emb",
        Command.TopKMode.Routed(4, None, Some(0.9), storage = "pq", None))))
    assert(DslParser.parseExt(
      "TOPK 5 FROM q ID qid VEC emb IN c ID cid VEC emb ROUTED SHARDS 4 PROBE 2 PQ M 8 KSUB 64 USING INDEX '/tmp/x'") ==
      Seq(ExtTopK(5, "q", "qid", "emb", "c", "cid", "emb",
        Command.TopKMode.Routed(4, Some(2), None,
          storage = "pq(m=8,ksub=64)", Some("/tmp/x")))))
    val rnd = new scala.util.Random(23L)
    val vecs = (0 until 128)
      .map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vid", "emb")
    vecs.createOrReplaceTempView("rc_vecs")
    vecs.where($"vid" < 4).select($"vid".as("qid"), $"emb")
      .createOrReplaceTempView("rc_q")
    val dir = java.nio.file.Files.createTempDirectory("dsl-routed-recall").toString
    val stmt = s"TOPK 3 FROM rc_q ID qid VEC emb IN rc_vecs ID vid VEC emb " +
      s"ROUTED SHARDS 4 RECALL 0.95 USING INDEX '$dir'"
    def run(): Seq[(Long, Long, Long)] = Pipeline.runExt(spark, stmt) match {
      case Seq(Right(Response.Entries(d))) => d.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
        .sortBy(x => (x._1, x._3)).toSeq
      case other => fail(s"RECALL arm failed: $other")
    }
    val first = run()
    assert(first.nonEmpty && first.map(_._1).distinct.size == 4)
    // the calibration curve landed in the persisted manifest
    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "routed_manifest.json"))
    assert(manifest.contains("recallCurve") && manifest.contains("["),
      "RECALL statement must persist its measured curve")
    val loaded = graft.ann.RoutedAnnIndex.load(spark, dir,
      graft.types.NonLinearConfig.HNSWConfig(efConstruction = 100,
        maximumConnections = 40, maximumConnectionsZero = 80, efSearch = 128,
        metric = graft.types.Algorithm.CosineSimilarity),
      Pipeline.TopKIndexStamp)
    assert(loaded.exists(_.recallCurve.nonEmpty),
      "persisted artifact must carry the curve")
    loaded.foreach(_.unpersist())
    // second invocation: loads curve and all — zero rebuilds, zero
    // re-calibration (unchanged artifact mtimes), identical answers
    def mtimes: Map[String, Long] = new java.io.File(dir).listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    val m1 = mtimes
    val second = run()
    assert(second == first, "RECALL arm must be deterministic across invocations")
    assert(mtimes == m1,
      "second RECALL invocation must load the persisted curve, not re-calibrate")
    // a recall target of 0.0 is rejected AT PARSE time, in both grammars
    // — accepted, it would only throw at query time after a full build +
    // calibration
    intercept[DslParseError](DslParser.parseExt(
      "TOPK 3 FROM rc_q ID qid VEC emb IN rc_vecs ID vid VEC emb ROUTED SHARDS 4 RECALL 0.0"))
    intercept[DslParseError](DslParser.parseDb(
      "CREATENONLINEARALGORITHMINDEX (hnsw_routed(8, recall=0.0)) IN s"))
    // a DIFFERENT k must NOT reuse the persisted k=3 curve — recall@k is
    // k-dependent, so the k=5 statement recalibrates (manifest rewrites)
    val stmtK5 = s"TOPK 5 FROM rc_q ID qid VEC emb IN rc_vecs ID vid VEC emb " +
      s"ROUTED SHARDS 4 RECALL 0.95 USING INDEX '$dir'"
    val mBefore = mtimes
    Pipeline.runExt(spark, stmtK5) match {
      case Seq(Right(_)) => ()
      case other => fail(s"k=5 RECALL arm failed: $other")
    }
    assert(mtimes != mBefore,
      "a k-changed RECALL statement must re-calibrate, not reuse the k=3 curve")
    val reLoaded = graft.ann.RoutedAnnIndex.load(spark, dir,
      graft.types.NonLinearConfig.HNSWConfig(efConstruction = 100,
        maximumConnections = 40, maximumConnectionsZero = 80, efSearch = 128,
        metric = graft.types.Algorithm.CosineSimilarity),
      Pipeline.TopKIndexStamp)
    // recalibration measures the UNION of carried ks and the new k (all
    // against this statement's workload), so the k=3 coverage SURVIVES
    // the k=5 statement — alternating-k statements against one pinned
    // dir stop destroying each other's curves
    assert(reLoaded.exists(_.recallCurves.map(_._1).toSeq == Seq(3, 5)),
      s"the re-measured manifest must cover both ks, got " +
        s"${reLoaded.map(_.recallCurves.map(_._1).toSeq)}")
    // ...and its workload fingerprint (round 15 — the reuse guard's key)
    assert(reLoaded.exists(_.workloadFp.startsWith("ext:")),
      "a statement-calibrated curve must persist an ext: fingerprint")
    // a FOLLOW-UP k=3 statement now reuses the covering k=3 curve (no
    // third recalibration — the manifest is stable across alternating ks)
    val mAfterK5 = mtimes
    Pipeline.runExt(spark, stmt) match {
      case Seq(Right(_)) => ()
      case other => fail(s"follow-up k=3 RECALL arm failed: $other")
    }
    assert(mtimes == mAfterK5,
      "a k=3 statement after the union recalibration must reuse, not " +
        "recalibrate (covering-curve rule)")
    reLoaded.foreach(_.unpersist())

    // IVF twin: RECALL 1.0 is certification (always exhaustive), so the
    // answers equal the exact arm; the curve persists in the manifest
    val iDir = java.nio.file.Files.createTempDirectory("dsl-ivf-recall").toString
    val ivfStmt = s"TOPK 3 FROM rc_q ID qid VEC emb IN rc_vecs ID vid VEC emb " +
      s"IVF CELLS 4 RECALL 1.0 USING INDEX '$iDir'"
    val ivfGot = Pipeline.runExt(spark, ivfStmt) match {
      case Seq(Right(Response.Entries(d))) => d.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
        .sortBy(x => (x._1, x._3)).toSeq
      case other => fail(s"IVF RECALL arm failed: $other")
    }
    val exact = Pipeline.runExt(spark,
      "TOPK 3 FROM rc_q ID qid VEC emb IN rc_vecs ID vid VEC emb") match {
      case Seq(Right(Response.Entries(d))) => d.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
        .sortBy(x => (x._1, x._3)).toSeq
      case other => fail(s"exact arm failed: $other")
    }
    assert(ivfGot == exact,
      "IVF RECALL 1.0 must equal the exact arm (certification = exhaustive)")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(iDir, "ivf_manifest.json")).contains("recallCurve"),
      "IVF RECALL statement must persist its measured curve")
    // QUANTIZED × RECALL: the curve is measured THROUGH the SQ8 arm (so
    // shortlist error is priced in); a 1.0 target there is impossible to
    // certify and fails loudly
    Pipeline.runExt(spark,
      "TOPK 3 FROM rc_q ID qid VEC emb IN rc_vecs ID vid VEC emb " +
        "IVF CELLS 4 RECALL 0.8 QUANTIZED SHORTLIST 10") match {
      case Seq(Right(Response.Entries(d))) =>
        assert(d.select("qid").distinct().count() == 4)
      case other => fail(s"quantized RECALL arm failed: $other")
    }
    Pipeline.runExt(spark,
      "TOPK 3 FROM rc_q ID qid VEC emb IN rc_vecs ID vid VEC emb " +
        "IVF CELLS 4 RECALL 1.0 QUANTIZED SHORTLIST 10") match {
      case Seq(Left(err)) =>
        assert(err.toString.contains("cannot be certified"), err.toString)
      case other => fail(s"RECALL 1.0 + QUANTIZED must fail loudly: $other")
    }
  }

  test("RECALL curve reuse is workload-fingerprinted: a different query view warns-and-serves by default, recalibrates under the strict flag") {
    val spark = graft.TestFixtures.spark
    import spark.implicits._
    val rnd = new scala.util.Random(29L)
    val vecs = (0 until 128)
      .map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vid", "emb")
    vecs.createOrReplaceTempView("fp_vecs")
    vecs.where($"vid" < 4).select($"vid".as("qid"), $"emb")
      .createOrReplaceTempView("fp_qa")
    // a DIFFERENT workload: disjoint query rows from the same corpus
    vecs.where($"vid" >= 4 && $"vid" < 8).select($"vid".as("qid"), $"emb")
      .createOrReplaceTempView("fp_qb")
    val dir = java.nio.file.Files.createTempDirectory("dsl-fp").toString
    def stmt(qv: String) = s"TOPK 3 FROM $qv ID qid VEC emb IN fp_vecs " +
      s"ID vid VEC emb ROUTED SHARDS 4 RECALL 0.9 USING INDEX '$dir'"
    def manifestMtime: Long = java.nio.file.Paths
      .get(dir, "routed_manifest.json").toFile.lastModified
    assert(Pipeline.runExt(spark, stmt("fp_qa")).forall(_.isRight))
    val m1 = manifestMtime
    // same view → fingerprint matches → reuse, no recalibration
    assert(Pipeline.runExt(spark, stmt("fp_qa")).forall(_.isRight))
    assert(manifestMtime == m1,
      "a fingerprint-matching statement must reuse, not recalibrate")
    // different view, DEFAULT mode: warn-and-serve — the curve is still
    // reused (no rewrite), the mismatch lands in the log
    assert(Pipeline.runExt(spark, stmt("fp_qb")).forall(_.isRight))
    assert(manifestMtime == m1,
      "default mode must warn and serve the existing curve")
    // different view, STRICT mode: recalibrate against THIS view and
    // persist (manifest rewrites, fingerprint now fp_qb's)
    spark.conf.set("spark.graft.strictCalibrationReuse", "true")
    try {
      // lastModified has 1s granularity on some filesystems — ensure a
      // rewrite is observable
      Thread.sleep(1100)
      assert(Pipeline.runExt(spark, stmt("fp_qb")).forall(_.isRight))
      assert(manifestMtime != m1,
        "strict mode must recalibrate against the statement's own view")
    } finally spark.conf.unset("spark.graft.strictCalibrationReuse")
  }
}
