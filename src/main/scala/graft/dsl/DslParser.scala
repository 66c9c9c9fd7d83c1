package graft.dsl

import scala.util.parsing.combinator.RegexParsers

import graft.types.{Algorithm, MetadataValue, NonLinearConfig, PredicateCondition}
import graft.types.PredicateCondition._

/**
 * The DSL front-end: a parser-combinator grammar mirroring the reference's
 * pest grammar rule-for-rule (/root/reference/ahnlich/dsl/src/syntax/
 * syntax.pest; entry points dsl/src/db.rs:49-56, dsl/src/ai.rs).
 *
 * Statements are `;`-separated, keywords case-insensitive. A statement that
 * doesn't parse produces a [[DslParseError]] carrying its span — the analog
 * of the grammar's `invalid_statement` catch-all → UnexpectedSpan error.
 *
 * Faithful quirks kept on purpose:
 *  - raw strings are unquoted and exclude `, [ ( ) ] }` (syntax.pest
 *    raw_string) — so they may contain spaces; surrounding whitespace is
 *    trimmed, as every reference test expects;
 *  - floats are unsigned (`f32 = ASCII_DIGIT+ ("." ASCII_DIGIT+)?`);
 *  - image literals are `/xHEX`, audio `/aHEX` (hex-decoded to bytes);
 *  - GETSIMN's count must be non-zero at parse time (`non_zero` rule);
 *  - `USING hnsw` is NOT a valid linear algorithm in the grammar (only
 *    kdtree / euclideandistance / cosinesimilarity / dotproductsimilarity —
 *    dsl/src/algorithm.rs:30-38).
 */
object DslParser extends RegexParsers {

  override val skipWhitespace = true
  override val whiteSpace = "[ \t\r\n]+".r

  // keyword: case-insensitive, not followed by an alphanumeric
  private def kw(s: String): Parser[String] = ("(?i)" + s + "(?![A-Za-z0-9])").r

  private val name: Parser[String] = "[A-Za-z0-9_-]+".r
  // Int literals reject out-of-range values as a span-carrying DslParseError
  // like any bad statement, never a raw NumberFormatException escaping the
  // semantic action. `err` (not failure) so the message survives alternation
  // instead of backtracking into the generic unexpected-statement fallback.
  private def boundedInt(re: String): Parser[Int] = re.r >> { s =>
    if (BigInt(s).isValidInt) success(s.toInt)
    else err(s"integer literal out of range: $s") }
  private val nonZero: Parser[Int] = boundedInt("[1-9][0-9]*")
  private val nonNegInt: Parser[Int] = boundedInt("[0-9]+")
  private val f32: Parser[Float] = """[0-9]+(\.[0-9]+)?""".r ^^ (_.toFloat)

  private val f32Array: Parser[Array[Float]] =
    "[" ~> rep1sep(f32, ",") <~ "]" ^^ (_.toArray)
  private val f32Arrays: Parser[Seq[Array[Float]]] = rep1sep(f32Array, ",")

  // metadata values: image | audio | raw string (order matters — /x.. also
  // matches the raw-string charset). An odd-length hex literal is a
  // COMMITTED error (parser `err`, not a backtrackable failure): the
  // reference raises DslError::UnexpectedHex there (dsl/src/metadata.rs:
  // 32-47) — falling back to raw_string would silently change the value's
  // type, and escaping the decoder's exception would lose the span.
  private def hexLit(prefix: Char): Parser[Array[Byte]] =
    s"/$prefix[0-9A-Fa-f]+".r.flatMap { s =>
      if (s.length % 2 == 0) success(hexDecode(s.drop(2)))
      else err(s"Could not parse hex string $s")
    }
  private val image: Parser[MetadataValue] = hexLit('x') ^^ (MetadataValue.Image(_))
  private val audio: Parser[MetadataValue] = hexLit('a') ^^ (MetadataValue.Audio(_))
  private val rawString: Parser[MetadataValue] =
    """[^,\[\](){}]+""".r ^^ (s => MetadataValue.RawString(s.trim))
  private val metadataValue: Parser[MetadataValue] = image | audio | rawString

  private def hexDecode(s: String): Array[Byte] = {
    require(s.length % 2 == 0, s"Could not parse hex string $s")
    s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
  }

  // ---------------------------------------------------------------- values
  private val storeValueSingle: Parser[(String, MetadataValue)] =
    name ~ (":" ~> metadataValue) ^^ { case k ~ v => k -> v }
  private val storeValue: Parser[Map[String, MetadataValue]] =
    "{" ~> rep1sep(storeValueSingle, ",") <~ "}" ^^ (_.toMap)

  private val storeKeyToValue: Parser[(Array[Float], Map[String, MetadataValue])] =
    "(" ~> (f32Array <~ ",") ~ storeValue <~ ")" ^^ { case k ~ v => (k, v) }
  private val storeKeysToValue: Parser[Seq[(Array[Float], Map[String, MetadataValue])]] =
    "(" ~> rep1sep(storeKeyToValue, ",") <~ ")"

  private val storeInput: Parser[MetadataValue] = "[" ~> metadataValue <~ "]"
  private val storeInputToValue: Parser[(MetadataValue, Map[String, MetadataValue])] =
    "(" ~> (storeInput <~ ",") ~ storeValue <~ ")" ^^ { case k ~ v => (k, v) }
  private val storeInputsToValue: Parser[Seq[(MetadataValue, Map[String, MetadataValue])]] =
    "(" ~> rep1sep(storeInputToValue, ",") <~ ")"
  private val storeInputs: Parser[Seq[MetadataValue]] = rep1sep(storeInput, ",")

  // ------------------------------------------------------------ predicates
  private val metadataValues: Parser[Seq[MetadataValue]] =
    "(" ~> rep1sep(metadataValue, ",") <~ ")"

  // simple_expression: key (IN|NOT IN) (v,..) | key (=|!=) v
  private val simpleExpression: Parser[PredicateCondition] =
    (name ~ (kw("not") ~> kw("in")) ~ metadataValues ^^ {
      case k ~ _ ~ vs => NotIn(k, vs.toSet) }) |
    (name ~ kw("in") ~ metadataValues ^^ { case k ~ _ ~ vs => In(k, vs.toSet) }) |
    (name ~ "!=" ~ metadataValue ^^ { case k ~ _ ~ v => NotEquals(k, v) }) |
    (name ~ "=" ~ metadataValue ^^ { case k ~ _ ~ v => Equals(k, v) })

  // compound_expression: "(" expr ")" ((AND|OR) expr)* — left-assoc fold,
  // exactly the reference's parse_predicate_expression (dsl/src/predicate.rs)
  private def compoundExpression: Parser[PredicateCondition] =
    ("(" ~> predicateExpression <~ ")") ~
      rep((kw("and") | kw("or")) ~ predicateExpression) ^^ {
        case first ~ rest =>
          rest.foldLeft(first) { case (acc, op ~ next) =>
            if (op.equalsIgnoreCase("and")) And(acc, next) else Or(acc, next)
          }
      }

  private def predicateExpression: Parser[PredicateCondition] =
    simpleExpression | compoundExpression

  private val predicateCondition: Parser[PredicateCondition] =
    "(" ~> predicateExpression <~ ")"

  // -------------------------------------------------------------- clauses
  private val schemaClause: Parser[String] = kw("schema") ~> name
  private val ifExists: Parser[Boolean] = opt(kw("if") ~ kw("exists")) ^^ (_.isDefined)
  private val ifNotExists: Parser[Boolean] =
    opt(kw("if") ~ kw("not") ~ kw("exists")) ^^ (_.isDefined)

  // a recall target in (0, 1]: 0.0 is rejected AT PARSE TIME — accepted,
  // it would only fail at query time, after a full index build and
  // calibration (Calibration.select's own require)
  private val recallTargetLit: Parser[Double] =
    """(?:0?\.[0-9]{1,6}|1(?:\.0{1,6})?)""".r ^? (
      { case s if s.toDouble > 0.0 => s.toDouble },
      s => s"recall target must be in (0, 1], got $s")

  // node-storage selector for routed graphs (StorageSpec keys): SQ8 (int8
  // codes), PQ [(m=..,ksub=..)] (product-quantized codes — bare PQ
  // resolves its split from the store dimension at build) or
  // OPQ [(m=..,ksub=..)] (PQ behind a learned rotation, Ge et al. 2013 —
  // the low-dim escape hatch the engine's pq guard points at).
  // OPQ before PQ: longest-match ("pq" is its suffix, not prefix, but
  // keyword parsing is word-bounded either way — order kept explicit)
  private def pqishStorage(kind: String): Parser[String] =
    kw(kind) ~> opt("(" ~> (kw("m") ~> "=" ~> nonZero) ~
      ("," ~> kw("ksub") ~> "=" ~> nonZero) <~ ")") ^^ {
        case Some(m ~ ks) => s"$kind(m=$m,ksub=$ks)"
        case None => kind
      }
  private val storageKindLit: Parser[String] =
    (kw("sq8") ^^^ "sq8") | pqishStorage("opq") | pqishStorage("pq")

  private val nonLinearAlgorithm: Parser[NonLinearConfig] =
    (kw("kdtree") ^^^ NonLinearConfig.KDTreeConfig()) |
    // EXTENSION kind (longest-match first: "hnsw" is its prefix) — the
    // coarse-routed sharded HNSW: (shards, probes) sizing, or
    // (shards, recall=r) to have the engine calibrate at build and pick
    // probes by measured recall (RoutedHNSWConfig.recallTarget)
    // an optional trailing ", sq8" / ", pq[(m=..,ksub=..)]" selects
    // quantized node storage in the shard graphs
    // (RoutedHNSWConfig.storage — the memory-lever extension)
    (kw("hnsw_routed") ~> opt("(" ~> (nonZero <~ ",") ~
      ((kw("recall") ~> "=" ~> recallTargetLit
          ^^ (r => Right(r): Either[Int, Double])) |
        (nonZero ^^ (p => Left(p): Either[Int, Double]))) ~
      opt("," ~> storageKindLit) <~ ")") ^^ {
      case Some(sh ~ Left(pr) ~ q) => NonLinearConfig.RoutedHNSWConfig(
        numShards = sh, probes = pr, storage = q.getOrElse("f32"))
      case Some(sh ~ Right(r) ~ q) => NonLinearConfig.RoutedHNSWConfig(
        numShards = sh, recallTarget = Some(r), storage = q.getOrElse("f32"))
      case None => NonLinearConfig.RoutedHNSWConfig()
    }) |
    (kw("hnsw") ^^^ NonLinearConfig.HNSWConfig())
  private val nonLinearAlgorithms: Parser[Seq[NonLinearConfig]] =
    rep1sep(nonLinearAlgorithm, ",")
  private val nonLinearKinds: Parser[Seq[String]] =
    rep1sep((kw("kdtree") ^^^ "kdtree") |
      (kw("hnsw_routed") ^^^ "hnsw_routed") | (kw("hnsw") ^^^ "hnsw"), ",")

  private val algorithm: Parser[Algorithm] =
    (kw("kdtree") ^^^ (Algorithm.KDTree: Algorithm)) |
    (kw("euclideandistance") ^^^ (Algorithm.EuclideanDistance: Algorithm)) |
    (kw("cosinesimilarity") ^^^ (Algorithm.CosineSimilarity: Algorithm)) |
    (kw("dotproductsimilarity") ^^^ (Algorithm.DotProductSimilarity: Algorithm))

  private val aiModel: Parser[String] =
    ("(?i)(all-minilm-l6-v2|all-minilm-l12-v2|bge-base-en-v1\\.5|bge-large-en-v1\\.5|" +
      "resnet-50|clip-vit-b32-image|clip-vit-b32-text|clap-audio|clap-text|" +
      "jina-embeddings-v2-base-code)(?![A-Za-z0-9])").r ^^ (_.toLowerCase)

  private val preprocessAction: Parser[String] =
    (kw("nopreprocessing") ^^^ "nopreprocessing") |
    (kw("modelpreprocessing") ^^^ "modelpreprocessing")
  private val executionProvider: Parser[String] =
    (kw("coreml") | kw("tensorrt") | kw("directml") | kw("cuda")) ^^ (_.toLowerCase)

  private val inKw = kw("in")

  // ------------------------------------------------------- DB statements
  import Command._

  private val ping: Parser[Command] = kw("ping") ^^^ Ping
  private val infoServerP: Parser[Command] = kw("infoserver") ^^^ InfoServer
  private val listClients: Parser[Command] = kw("listclients") ^^^ ListClients
  private val listStores: Parser[Command] =
    kw("liststores") ~> opt(schemaClause) ^^ (ListStores(_))
  private val purgeStores: Parser[Command] = kw("purgestores") ^^^ PurgeStores
  private val getStore: Parser[Command] =
    kw("getstore") ~> name ~ opt(schemaClause) ^^ { case n ~ s => GetStore(n, s) }
  private val dropStore: Parser[Command] =
    kw("dropstore") ~> name ~ ifExists ~ opt(schemaClause) ^^ {
      case n ~ ife ~ s => DropStore(n, errorIfNotExists = !ife, s) }
  private val dropSchema: Parser[Command] =
    kw("dropschema") ~> name ^^ (DropSchema(_))
  private val createPredIndex: Parser[Command] =
    kw("createpredindex") ~> ("(" ~> rep1sep(name, ",") <~ ")") ~
      (inKw ~> name) ~ opt(schemaClause) ^^ {
        case ks ~ n ~ s => CreatePredIndex(n, ks, s) }
  private val dropPredIndex: Parser[Command] =
    kw("droppredindex") ~> ifExists ~ ("(" ~> rep1sep(name, ",") <~ ")") ~
      (inKw ~> name) ~ opt(schemaClause) ^^ {
        case ife ~ ks ~ n ~ s => DropPredIndex(n, ks, errorIfNotExists = !ife, s) }
  private val createNonLinearIndex: Parser[Command] =
    kw("createnonlinearalgorithmindex") ~> ("(" ~> nonLinearAlgorithms <~ ")") ~
      (inKw ~> name) ~ opt(schemaClause) ^^ {
        case as ~ n ~ s => CreateNonLinearAlgorithmIndex(n, as, s) }
  private val dropNonLinearIndex: Parser[Command] =
    kw("dropnonlinearalgorithmindex") ~> ifExists ~ ("(" ~> nonLinearKinds <~ ")") ~
      (inKw ~> name) ~ opt(schemaClause) ^^ {
        case ife ~ ks ~ n ~ s => DropNonLinearAlgorithmIndex(n, ks, errorIfNotExists = !ife, s) }
  private val getKey: Parser[Command] =
    kw("getkey") ~> ("(" ~> f32Arrays <~ ")") ~ (inKw ~> name) ~ opt(schemaClause) ^^ {
      case ks ~ n ~ s => GetKey(n, ks, s) }
  private val delKey: Parser[Command] =
    kw("delkey") ~> ("(" ~> f32Arrays <~ ")") ~ (inKw ~> name) ~ opt(schemaClause) ^^ {
      case ks ~ n ~ s => DelKey(n, ks, s) }
  private val getPred: Parser[Command] =
    kw("getpred") ~> predicateCondition ~ (inKw ~> name) ~ opt(schemaClause) ^^ {
      case c ~ n ~ s => GetPred(n, c, s) }
  private val getSimN: Parser[Command] =
    kw("getsimn") ~> nonZero ~ (kw("with") ~> f32Array) ~
      (kw("using") ~> algorithm) ~ (inKw ~> name) ~ opt(schemaClause) ~
      opt(kw("where") ~> predicateCondition) ^^ {
        case k ~ q ~ a ~ n ~ s ~ c => GetSimN(n, q, k, a, c, s) }
  private val createStore: Parser[Command] =
    kw("createstore") ~> ifNotExists ~ name ~ (kw("dimension") ~> nonZero) ~
      opt(kw("predicates") ~> "(" ~> rep1sep(name, ",") <~ ")") ~
      opt(kw("nonlinearalgorithmindex") ~> "(" ~> nonLinearAlgorithms <~ ")") ~
      opt(schemaClause) ^^ {
        case ine ~ n ~ d ~ ps ~ nl ~ s =>
          CreateStore(n, d, ps.getOrElse(Nil), nl.getOrElse(Nil),
            errorIfExists = !ine, s) }
  private val setInStore: Parser[Command] =
    kw("set") ~> storeKeysToValue ~ (inKw ~> name) ~ opt(schemaClause) ^^ {
      case es ~ n ~ s => Set(n, es, s) }
  // UPSERT (key_or_none, value_or_none) WHERE (cond) IN store [MERGE] [SCHEMA s]
  private val upsertKeyValue: Parser[(Option[Array[Float]], Option[Map[String, MetadataValue]])] =
    ((f32Array <~ ",") ~ storeValue ^^ { case k ~ v => (Some(k), Some(v)) }) |
    ((kw("none") ~ ",") ~> storeValue ^^ (v => (None, Some(v)))) |
    ((f32Array <~ ",") <~ kw("none") ^^ (k => (Some(k), None)))
  private val upsert: Parser[Command] =
    kw("upsert") ~> ("(" ~> upsertKeyValue <~ ")") ~
      (kw("where") ~> predicateCondition) ~ (inKw ~> name) ~
      opt(kw("merge") ^^^ true) ~ opt(schemaClause) ^^ {
        case (k, v) ~ c ~ n ~ m ~ s => Upsert(n, k, v, c, m.getOrElse(false), s) }

  private val dbStatement: Parser[Command] =
    ping | infoServerP | listStores | listClients | dropSchema | getStore |
    dropStore | createPredIndex | dropPredIndex | createNonLinearIndex |
    dropNonLinearIndex | getKey | delKey | getPred | getSimN | createStore |
    setInStore | upsert

  // ------------------------------------------------------- AI statements
  private val aiCreateStore: Parser[Command] =
    kw("createstore") ~> ifNotExists ~ name ~ (kw("querymodel") ~> aiModel) ~
      (kw("indexmodel") ~> aiModel) ~
      opt(kw("predicates") ~> "(" ~> rep1sep(name, ",") <~ ")") ~
      opt(kw("nonlinearalgorithmindex") ~> "(" ~> nonLinearAlgorithms <~ ")") ~
      opt(kw("storeoriginal") ^^^ true) ~ opt(schemaClause) ^^ {
        case ine ~ n ~ qm ~ im ~ ps ~ nl ~ so ~ s =>
          AiCreateStore(n, qm, im, ps.getOrElse(Nil), nl.getOrElse(Nil),
            errorIfExists = !ine, storeOriginal = so.getOrElse(false), s) }
  private val aiSet: Parser[Command] =
    kw("set") ~> storeInputsToValue ~ (inKw ~> name) ~ opt(schemaClause) ~
      (kw("preprocessaction") ~> preprocessAction) ~
      opt(kw("executionprovider") ~> executionProvider) ^^ {
        case es ~ n ~ s ~ pa ~ ep => AiSet(n, es, pa, ep, s) }
  private val aiGetSimN: Parser[Command] =
    kw("getsimn") ~> nonZero ~ (kw("with") ~> storeInput) ~
      (kw("using") ~> algorithm) ~
      opt(kw("preprocessaction") ~> preprocessAction) ~
      opt(kw("executionprovider") ~> executionProvider) ~
      (inKw ~> name) ~ opt(schemaClause) ~
      opt(kw("where") ~> predicateCondition) ^^ {
        case k ~ q ~ a ~ _ ~ _ ~ n ~ s ~ c => AiGetSimN(n, q, k, a, c, s) }
  private val aiGetKey: Parser[Command] =
    kw("getkey") ~> ("(" ~> storeInputs <~ ")") ~ (inKw ~> name) ~ opt(schemaClause) ^^ {
      case ks ~ n ~ s => AiGetKey(n, ks, s) }
  private val aiDelKey: Parser[Command] =
    kw("delkey") ~> ("(" ~> storeInputs <~ ")") ~ (inKw ~> name) ~ opt(schemaClause) ^^ {
      case ks ~ n ~ s => AiDelKey(n, ks, s) }
  private val aiUpsertInputValue: Parser[(Option[MetadataValue], Option[Map[String, MetadataValue]])] =
    ((storeInput <~ ",") ~ storeValue ^^ { case k ~ v => (Some(k), Some(v)) }) |
    ((kw("none") ~ ",") ~> storeValue ^^ (v => (None, Some(v)))) |
    ((storeInput <~ ",") <~ kw("none") ^^ (k => (Some(k), None)))
  private val aiUpsert: Parser[Command] =
    kw("upsert") ~> ("(" ~> aiUpsertInputValue <~ ")") ~
      (kw("where") ~> predicateCondition) ~ (inKw ~> name) ~
      (kw("preprocessaction") ~> preprocessAction) ~
      opt(kw("executionprovider") ~> executionProvider) ~ opt(schemaClause) ^^ {
        case (k, v) ~ c ~ n ~ pa ~ ep ~ s => AiUpsert(n, k, v, c, pa, ep, s) }

  // same surface syntax as the DB forms, but routed through the AI engine
  // (reserved-key strip / reserved-index guard — operations.rs:276-278)
  private val aiGetPred: Parser[Command] =
    kw("getpred") ~> predicateCondition ~ (inKw ~> name) ~ opt(schemaClause) ^^ {
      case c ~ n ~ s => AiGetPred(n, c, s) }
  private val aiDropPredIndex: Parser[Command] =
    kw("droppredindex") ~> ifExists ~ ("(" ~> rep1sep(name, ",") <~ ")") ~
      (inKw ~> name) ~ opt(schemaClause) ^^ {
        case ife ~ ks ~ n ~ s => AiDropPredIndex(n, ks, errorIfNotExists = !ife, s) }

  private val aiStatement: Parser[Command] =
    ping | infoServerP | listStores | purgeStores | dropSchema | aiGetPred |
    getStore | dropStore | aiDropPredIndex | createNonLinearIndex |
    createPredIndex | dropNonLinearIndex | aiCreateStore | aiGetKey |
    aiDelKey | aiSet | aiGetSimN | aiUpsert

  // ---------------------------------------------- extension statements
  // (graft-only surface — SURVEY §2.7 pipeline operators; same `;`-loop
  // and span-carrying errors as the parity grammars, but a THIRD entry
  // point so reference scripts can never collide with extension keywords)

  private val pathLit: Parser[String] =
    ("'" ~> "[^']+".r <~ "'") | """[^\s;]+""".r
  private val fromView: Parser[String] = kw("from") ~> name
  private val idCol: Parser[String] = kw("id") ~> name
  private val textCol: Parser[String] = kw("text") ~> name
  private val dedupMethod: Parser[String] =
    (kw("minhash") ^^^ "minhash") | (kw("simhash") ^^^ "simhash") |
    (kw("jaccard") ^^^ "jaccard")
  private val f64: Parser[Double] = """[0-9]+(\.[0-9]+)?""".r ^^ (_.toDouble)

  private val scanFormat: Parser[String] =
    (kw("jsonl") ^^^ "jsonl") | (kw("csv") ^^^ "csv") |
    (kw("parquet") ^^^ "parquet")
  private val extScan: Parser[Command] =
    kw("scan") ~> pathLit ~ opt(kw("format") ~> scanFormat) ~
      (kw("as") ~> name) ^^ {
        case p ~ f ~ v => ExtScan(p, v, f.getOrElse("parquet")) }
  private val dedupParams =
    fromView ~ idCol ~ textCol ~ (kw("using") ~> dedupMethod) ~
      (kw("ngram") ~> nonZero) ~ (kw("threshold") ~> f64)
  private val extDedupNear: Parser[Command] =
    kw("dedup") ~> kw("near") ~> dedupParams ^^ {
      case v ~ i ~ t ~ m ~ n ~ th => ExtDedupNear(v, i, t, m, n, th) }
  private val extDedupKeepOne: Parser[Command] =
    kw("dedup") ~> kw("keepone") ~> dedupParams ^^ {
      case v ~ i ~ t ~ m ~ n ~ th => ExtDedupKeepOne(v, i, t, m, n, th) }
  private val extDedupKeepBest: Parser[Command] =
    kw("dedup") ~> kw("keepbest") ~> fromView ~ idCol ~ textCol ~
      (kw("rank") ~> name) ~ (kw("using") ~> dedupMethod) ~
      (kw("ngram") ~> nonZero) ~ (kw("threshold") ~> f64) ^^ {
        case v ~ i ~ t ~ r ~ m ~ n ~ th =>
          ExtDedupKeepBest(v, i, t, r, m, n, th) }
  private val extDedupExact: Parser[Command] =
    kw("dedup") ~> kw("exact") ~> fromView ~ idCol ~ textCol ^^ {
      case v ~ i ~ t => ExtDedupExact(v, i, t) }
  private val extDedupSemantic: Parser[Command] =
    kw("dedup") ~> kw("semantic") ~> fromView ~ idCol ~ (kw("vec") ~> name) ~
      (kw("threshold") ~> f64) ^^ {
        case v ~ i ~ vc ~ th => ExtDedupSemantic(v, i, vc, th) }
  // SAFE must parse before the plain form: `split from …` would otherwise
  // consume the prefix and fail on the SAFE tail
  private val extSplitSafe: Parser[Command] =
    kw("split") ~> kw("safe") ~> dedupParams ~
      opt(kw("train") ~> nonZero) ~ opt(kw("val") ~> nonZero) ^^ {
        case (v ~ i ~ t ~ m ~ n ~ th) ~ tr ~ va =>
          ExtSplitSafe(v, i, t, m, n, th, tr.getOrElse(90), va.getOrElse(5)) }
  private val extSplit: Parser[Command] =
    kw("split") ~> fromView ~ idCol ~ opt(kw("train") ~> nonZero) ~
      opt(kw("val") ~> nonZero) ^^ { case v ~ i ~ tr ~ va =>
        ExtSplit(v, i, tr.getOrElse(90), va.getOrElse(5)) }
  private val extSample: Parser[Command] =
    kw("sample") ~> fromView ~ idCol ~ (kw("fraction") ~> f64) ^^ {
      case v ~ i ~ f => ExtSample(v, i, f) }
  // BUDGET SELECT FROM docs ID doc_id TEXT text TOKENS 10000 — quality-
  // ranked token-budget selection (Corpus.selectByTokenBudget)
  private val extBudgetSelect: Parser[Command] =
    kw("budget") ~> kw("select") ~> fromView ~ idCol ~ textCol ~
      (kw("tokens") ~> "[1-9][0-9]*".r ^^ (_.toLong)) ^^ {
        case v ~ i ~ t ~ b => ExtBudgetSelect(v, i, t, b) }
  // CLUSTER ASSIGN FROM v ID i VEC e K 8 — seeded k-means assignment;
  // CLUSTER SAMPLE ... PER 5 — the balanced per-cluster selection on top
  private val extClusterAssign: Parser[Command] =
    kw("cluster") ~> kw("assign") ~> fromView ~ idCol ~ (kw("vec") ~> name) ~
      (kw("k") ~> nonZero) ^^ {
        case v ~ i ~ e ~ k => ExtClusterAssign(v, i, e, k) }
  private val extClusterSample: Parser[Command] =
    kw("cluster") ~> kw("sample") ~> fromView ~ idCol ~ (kw("vec") ~> name) ~
      (kw("k") ~> nonZero) ~ (kw("per") ~> nonZero) ^^ {
        case v ~ i ~ e ~ k ~ p => ExtClusterSample(v, i, e, k, p) }
  // CLUSTER KMEANS FROM v ID i VEC e K 4 ITERS 2 — the full Lloyd loop
  private val extClusterKmeans: Parser[Command] =
    kw("cluster") ~> kw("kmeans") ~> fromView ~ idCol ~ (kw("vec") ~> name) ~
      (kw("k") ~> nonZero) ~ (kw("iters") ~> nonZero) ^^ {
        case v ~ i ~ e ~ k ~ it => ExtClusterKmeans(v, i, e, k, it) }
  // CLUSTER OUTLIERS FROM v ID i VEC e K 8 [FACTOR 4] — the per-vector
  // dist²-vs-cluster-mean hygiene report (default factor 4)
  private val extClusterOutliers: Parser[Command] =
    kw("cluster") ~> kw("outliers") ~> fromView ~ idCol ~ (kw("vec") ~> name) ~
      (kw("k") ~> nonZero) ~ opt(kw("factor") ~> nonZero) ^^ {
        case v ~ i ~ e ~ k ~ f => ExtClusterOutliers(v, i, e, k, f.getOrElse(4)) }
  // NGRAM TOPK 20 SIZE 2 FROM docs TEXT text — corpus heavy hitters
  private val extNgramTopK: Parser[Command] =
    kw("ngram") ~> kw("topk") ~> nonZero ~ (kw("size") ~> nonZero) ~
      fromView ~ textCol ^^ {
        case k ~ n ~ v ~ t => ExtNgramTopK(v, t, n, k) }
  private val extPack: Parser[Command] =
    kw("pack") ~> fromView ~ idCol ~ textCol ~ (kw("budget") ~> nonZero) ~
      opt(kw("shards") ~> nonZero) ^^ { case v ~ i ~ t ~ b ~ sh =>
        ExtPack(v, i, t, b, sh.getOrElse(1)) }
  private val extShuffle: Parser[Command] =
    kw("shuffle") ~> fromView ~ idCol ~ (kw("epoch") ~> nonNegInt) ~
      (kw("shards") ~> nonZero) ^^ { case v ~ i ~ ep ~ sh =>
        ExtShuffle(v, i, ep, sh) }
  // shard sink: WRITE SHARDS 'dir' FROM v ID i TEXT t EPOCH e SHARDS n —
  // writes the epoch order as one parquet file per shard, returns the
  // read-back manifest
  private val extWriteShards: Parser[Command] =
    kw("write") ~> kw("shards") ~> pathLit ~ fromView ~ idCol ~ textCol ~
      (kw("epoch") ~> nonNegInt) ~ (kw("shards") ~> nonZero) ^^ {
        case d ~ v ~ i ~ t ~ ep ~ sh => ExtWriteShards(d, v, i, t, ep, sh) }
  private val extCap: Parser[Command] =
    kw("cap") ~> fromView ~ idCol ~ (kw("groupby") ~> name) ~
      (kw("max") ~> nonZero) ^^ { case v ~ i ~ g ~ m => ExtCap(v, i, g, m) }
  private val extMix: Parser[Command] =
    kw("mix") ~> fromView ~ idCol ~ (kw("groupby") ~> name) ~
      (kw("target") ~> f64) ~ opt(kw("alpha") ~> f64) ^^ {
        case v ~ i ~ g ~ t ~ a => ExtMix(v, i, g, t, a.getOrElse(0.5)) }
  private val extLines: Parser[Command] =
    kw("lines") ~> fromView ~ idCol ~ textCol ~ (kw("maxdf") ~> nonZero) ^^ {
      case v ~ i ~ t ~ m => ExtLines(v, i, t, m) }
  // SPANS' NGRAM must be >= 2 (a 1-token "span" is exact token dedup) —
  // enforced in the grammar so the violation is a span-carrying parse
  // error, not a runtime require() escaping the statement loop
  private val extSpans: Parser[Command] =
    kw("spans") ~> fromView ~ idCol ~ textCol ~ (kw("ngram") ~> (nonZero >>
      (n => if (n >= 2) success(n) else err(s"NGRAM must be >= 2, got $n")))) ^^ {
      case v ~ i ~ t ~ n => ExtSpans(v, i, t, n) }
  private val extPpl: Parser[Command] =
    kw("ppl") ~> fromView ~ idCol ~ textCol ^^ {
      case v ~ i ~ t => ExtPpl(v, i, t) }
  private val extGopher: Parser[Command] =
    kw("gopher") ~> fromView ~ idCol ~ textCol ^^ {
      case v ~ i ~ t => ExtGopher(v, i, t) }
  // Gopher's repetition half: REPETITION FROM view ID i TEXT t —
  // id + the 13 repetition signals
  private val extRepetition: Parser[Command] =
    kw("repetition") ~> fromView ~ idCol ~ textCol ^^ {
      case v ~ i ~ t => ExtRepetition(v, i, t) }
  // C4 blocklist: BLOCKLIST FROM v ID i TEXT t WORDS w1,w2 —
  // id + hits + blocked
  private val extBlocklist: Parser[Command] =
    kw("blocklist") ~> fromView ~ idCol ~ textCol ~
      (kw("words") ~> rep1sep(name, ",")) ^^ {
        case v ~ i ~ t ~ ws => ExtBlocklist(v, i, t, ws) }
  // NEGATIVES 5 FROM q ID i VEC v LABEL l IN corpus ID i VEC v LABEL l —
  // hard-negative mining (queries side first, corpus after IN, like BM25)
  private val extNegatives: Parser[Command] =
    kw("negatives") ~> nonZero ~ fromView ~ idCol ~ (kw("vec") ~> name) ~
      (kw("label") ~> name) ~ (inKw ~> name) ~ idCol ~
      (kw("vec") ~> name) ~ (kw("label") ~> name) ~
      opt(kw("ivf") ~> (kw("cells") ~> nonZero) ~ (kw("probe") ~> nonZero)) ^^ {
        case k ~ qv ~ qi ~ qe ~ ql ~ cv ~ ci ~ ce ~ cl ~ m =>
          ExtNegatives(k, qv, qi, qe, ql, cv, ci, ce, cl,
            m.map { case c ~ p => (c, p) }) }
  // OVERLAP FROM docs GROUPBY source TEXT text NGRAM 2 — cross-source
  // distinct-n-gram overlap matrix
  // DIFF FROM old IN new ID doc_id TEXT text — corpus version diff
  private val extDiff: Parser[Command] =
    kw("diff") ~> fromView ~ (inKw ~> name) ~ idCol ~ textCol ^^ {
      case o ~ n ~ i ~ t => ExtDiff(o, n, i, t) }
  // DRIFT FROM docs GROUPBY source TEXT text — unigram L1 drift matrix
  private val extDrift: Parser[Command] =
    kw("drift") ~> fromView ~ (kw("groupby") ~> name) ~ textCol ^^ {
      case v ~ g ~ t => ExtDrift(v, g, t) }
  private val extOverlap: Parser[Command] =
    kw("overlap") ~> fromView ~ (kw("groupby") ~> name) ~ textCol ~
      (kw("ngram") ~> nonZero) ^^ {
        case v ~ g ~ t ~ n => ExtOverlap(v, g, t, n) }
  private val extBm25: Parser[Command] =
    kw("bm25") ~> nonZero ~ fromView ~ idCol ~ textCol ~
      (inKw ~> name) ~ idCol ~ textCol ^^ {
        case k ~ qv ~ qi ~ qt ~ cv ~ ci ~ ct =>
          ExtBm25(k, qv, qi, qt, cv, ci, ct) }
  private val extDsir: Parser[Command] =
    kw("dsir") ~> fromView ~ idCol ~ textCol ~ (kw("target") ~> name) ~
      idCol ~ textCol ^^ { case v ~ i ~ t ~ tv ~ ti ~ tt =>
        ExtDsir(v, i, t, tv, ti, tt) }
  private val extClassify: Parser[Command] =
    kw("classify") ~> fromView ~ idCol ~ textCol ~ (kw("train") ~> name) ~
      idCol ~ textCol ~ (kw("label") ~> name) ^^ {
        case v ~ i ~ t ~ tv ~ ti ~ tt ~ lab =>
          ExtClassify(v, i, t, tv, ti, tt, lab) }
  private val extDecon: Parser[Command] =
    kw("decon") ~> fromView ~ idCol ~ textCol ~ (kw("bench") ~> name) ~
      idCol ~ textCol ~ (kw("ngram") ~> nonZero) ^^ {
        case v ~ i ~ t ~ bv ~ bi ~ bt ~ n => ExtDecon(v, i, t, bv, bi, bt, n) }
  private val extChunk: Parser[Command] =
    kw("chunk") ~> fromView ~ idCol ~ textCol ~ (kw("size") ~> nonZero) ~
      (kw("overlap") ~> nonNegInt) ^^ { case v ~ i ~ t ~ sz ~ ov =>
        ExtChunk(v, i, t, sz, ov) }
  private val extVocab: Parser[Command] =
    kw("vocab") ~> fromView ~ idCol ~ textCol ^^ {
      case v ~ i ~ t => ExtVocab(v, i, t) }
  private val extTextStats: Parser[Command] =
    kw("textstats") ~> fromView ~ idCol ~ textCol ^^ {
      case v ~ i ~ t => ExtTextStats(v, i, t) }
  // LINESIGNALS FROM v ID i TEXT t — the Gopher/C4 line-shape bundle
  private val extLineSignals: Parser[Command] =
    kw("linesignals") ~> fromView ~ idCol ~ textCol ^^ {
      case v ~ i ~ t => ExtLineSignals(v, i, t) }
  // TOPK acceleration arms: QUANTIZED SHORTLIST n (SQ8 two-phase),
  // IVF CELLS c PROBE p (partition pruning), and their composition
  // IVF ... QUANTIZED SHORTLIST n (int8 coarse pass over probed cells
  // only). SHORTLIST >= k is enforced by the operators' require at run
  // time (it depends on k, which the grammar has already consumed).
  private val topKQuant: Parser[Int] =
    kw("quantized") ~> kw("shortlist") ~> nonZero
  // USING INDEX <path> — pin the arm to a stamped artifact directory:
  // the statement loads a compatible index from the path (zero training)
  // or builds once and saves there; the caller owns the dir's freshness
  private val usingIndex: Parser[String] =
    kw("using") ~> kw("index") ~> pathLit
  private val topKMode: Parser[Command.TopKMode] = {
    // PROBE p | RECALL r — r picked off the statement-calibrated curve
    val probeOrRecall: Parser[Either[Int, Double]] =
      (kw("probe") ~> nonZero ^^ (p => Left(p): Either[Int, Double])) |
        (kw("recall") ~> recallTargetLit ^^ (r => Right(r): Either[Int, Double]))
    val ivf = kw("ivf") ~> (kw("cells") ~> nonZero) ~
      probeOrRecall ~ opt(topKQuant) ~ opt(usingIndex) ^^ {
        case c ~ Left(p) ~ q ~ d => Command.TopKMode.Ivf(c, Some(p), None, q, d)
        case c ~ Right(r) ~ q ~ d => Command.TopKMode.Ivf(c, None, Some(r), q, d) }
    val quant = topKQuant ^^ { s => Command.TopKMode.Quantized(s) }
    // PQ M m KSUB k SHORTLIST s — the product-quantized ADC arm
    val pqParams = (kw("m") ~> nonZero) ~ (kw("ksub") ~> nonZero) ~
      (kw("shortlist") ~> nonZero)
    val pq = kw("pq") ~> pqParams ^^ {
      case m ~ ks ~ sl => Command.TopKMode.Pq(m, ks, sl) }
    // IVF ... PQ ... — the stacked composition; must try BEFORE plain ivf
    // (whose opt(QUANTIZED) would succeed consuming nothing and strand
    // the PQ clause as a statement-level error)
    val ivfPq = kw("ivf") ~> (kw("cells") ~> nonZero) ~
      (kw("probe") ~> nonZero) ~ (kw("pq") ~> pqParams) ^^ {
        case c ~ p ~ (m ~ ks ~ sl) => Command.TopKMode.IvfPq(c, p, m, ks, sl) }
    // ROUTED SHARDS s (PROBE p | RECALL r) [SQ8 | PQ [M m KSUB k]]
    // [USING INDEX <dir>] — the graph-speed batch-join arm, optionally
    // pinned to persisted artifacts. RECALL names the probe knob by what
    // it buys: the statement calibrates once (or loads a persisted
    // curve) and picks the cheapest probes whose MEASURED recall@k meets
    // r. SQ8 / PQ select quantized node storage in the shard graphs, the
    // exact-rescored serving path (RoutedHNSWConfig storage analog; PQ's
    // M/KSUB spelled like the standalone PQ arm, bare PQ resolves from
    // the corpus dimension)
    val routedStorage: Parser[String] =
      (kw("sq8") ^^^ "sq8") |
      (kw("opq") ~> opt((kw("m") ~> nonZero) ~ (kw("ksub") ~> nonZero)) ^^ {
        case Some(m ~ ks) => s"opq(m=$m,ksub=$ks)"
        case None => "opq"
      }) |
      (kw("pq") ~> opt((kw("m") ~> nonZero) ~ (kw("ksub") ~> nonZero)) ^^ {
        case Some(m ~ ks) => s"pq(m=$m,ksub=$ks)"
        case None => "pq"
      })
    val routed = kw("routed") ~> (kw("shards") ~> nonZero) ~
      probeOrRecall ~ opt(routedStorage) ~ opt(usingIndex) ^^ {
        case s ~ Left(p) ~ q ~ d =>
          Command.TopKMode.Routed(s, Some(p), None, q.getOrElse("f32"), d)
        case s ~ Right(r) ~ q ~ d =>
          Command.TopKMode.Routed(s, None, Some(r), q.getOrElse("f32"), d) }
    ivfPq | ivf | pq | quant | routed
  }
  private val extTopK: Parser[Command] =
    kw("topk") ~> nonZero ~ fromView ~ idCol ~ (kw("vec") ~> name) ~
      (inKw ~> name) ~ idCol ~ (kw("vec") ~> name) ~ opt(topKMode) ^^ {
        case k ~ qv ~ qi ~ qc ~ cv ~ ci ~ cc ~ m =>
          ExtTopK(k, qv, qi, qc, cv, ci, cc,
            m.getOrElse(Command.TopKMode.Exact)) }
  private val extTrace: Parser[Command] =
    kw("trace") ~> (kw("on") | kw("off") | kw("show") | kw("reset")) ^^ {
      a => ExtTrace(a.toLowerCase(java.util.Locale.ROOT)) }
  private val extFuse: Parser[Command] =
    kw("fuse") ~> nonZero ~ fromView ~ idCol ~ (inKw ~> name) ~ idCol ~
      opt(kw("c") ~> nonZero) ^^ { case k ~ va ~ ai ~ vb ~ bi ~ c =>
        ExtFuse(k, va, ai, vb, bi, c.getOrElse(60)) }
  private val extAsof: Parser[Command] =
    kw("asof") ~> fromView ~ (kw("ts") ~> name) ~ (inKw ~> name) ~
      (kw("ts") ~> name) ~ (kw("key") ~> name) ~
      (kw("carry") ~> rep1sep(name, ",")) ~
      opt(kw("tolerance") ~> ("""[0-9]{1,18}""".r ^^ (_.toLong))) ^^ {
        case lv ~ lt ~ rv ~ rt ~ k ~ cs ~ tol =>
          ExtAsof(lv, lt, rv, rt, k, cs, tol) }
  private val signedLong: Parser[Long] =
    """-?[0-9]{1,18}""".r ^^ (_.toLong)
  private val extInterval: Parser[Command] =
    kw("interval") ~> fromView ~ (kw("ts") ~> name) ~ (inKw ~> name) ~
      (kw("ts") ~> name) ~ (kw("key") ~> name) ~
      (kw("carry") ~> rep1sep(name, ",")) ~
      (kw("lower") ~> signedLong) ~ (kw("upper") ~> signedLong) ^^ {
        case lv ~ lt ~ rv ~ rt ~ k ~ cs ~ lo ~ up =>
          ExtInterval(lv, lt, rv, rt, k, cs, lo, up) }
  // URL hygiene (text.UrlOps): URL CANON FROM view COL urlcol —
  // appends url_canon / host / rdomain to the view
  private val extUrlCanon: Parser[Command] =
    kw("url") ~> kw("canon") ~> fromView ~ (kw("col") ~> name) ^^ {
      case v ~ u => ExtUrlCanon(v, u) }
  // HTML → text (text.Html): HTML EXTRACT FROM view COL htmlcol —
  // appends clean_text to the view
  private val extHtmlExtract: Parser[Command] =
    kw("html") ~> kw("extract") ~> fromView ~ (kw("col") ~> name) ^^ {
      case v ~ h => ExtHtmlExtract(v, h) }
  // EMBEDCARD FROM v VEC e GROUPBY label — the embedding-side profile
  private val extEmbedCard: Parser[Command] =
    kw("embedcard") ~> fromView ~ (kw("vec") ~> name) ~
      (kw("groupby") ~> rep1sep(name, ",")) ^^ {
        case v ~ e ~ gs => ExtEmbedCard(v, e, gs) }
  private val extDatacard: Parser[Command] =
    kw("datacard") ~> fromView ~ textCol ~
      (kw("groupby") ~> rep1sep(name, ",")) ^^ {
        case v ~ t ~ gs => ExtDatacard(v, t, gs) }
  // persisted-MinHash-index family (dedup.IncrementalDedup): INDEX builds,
  // APPEND folds a batch in, INCREMENTAL probes a batch against history
  private val extDedupIndex: Parser[Command] =
    kw("dedup") ~> kw("index") ~> pathLit ~ fromView ~ idCol ~ textCol ~
      (kw("ngram") ~> nonZero) ^^ {
        case d ~ v ~ i ~ t ~ n => ExtDedupIndex(d, v, i, t, n) }
  private val extDedupAppend: Parser[Command] =
    kw("dedup") ~> kw("append") ~> pathLit ~ fromView ~ idCol ~ textCol ^^ {
      case d ~ v ~ i ~ t => ExtDedupAppend(d, v, i, t) }
  private val extDedupIncremental: Parser[Command] =
    kw("dedup") ~> kw("incremental") ~> pathLit ~ fromView ~ idCol ~
      textCol ~ (kw("threshold") ~> f64) ^^ {
        case d ~ v ~ i ~ t ~ th => ExtDedupIncremental(d, v, i, t, th) }

  private val extInner: Parser[Command] =
    extScan | extDedupNear | extDedupKeepOne | extDedupKeepBest |
    extDedupSemantic |
    extDedupExact | extDedupIndex | extDedupAppend | extDedupIncremental |
    extSplitSafe | extSplit |
    extSample | extBudgetSelect | extClusterAssign | extClusterSample |
    extClusterKmeans | extClusterOutliers | extNgramTopK | extPack |
    extWriteShards | extShuffle |
    extCap | extMix |
    extLines | extSpans |
    extDecon | extChunk | extVocab | extTextStats | extLineSignals |
    extPpl | extGopher |
    extRepetition | extBlocklist |
    extBm25 | extDsir | extClassify | extNegatives | extOverlap | extDrift | extDiff |
    extFuse | extTopK | extDatacard | extEmbedCard |
    extAsof | extInterval | extUrlCanon | extHtmlExtract | extTrace

  // any ext statement's result can be registered as a view with a
  // trailing `AS name` — the piping form that composes retrieval stages
  // (BM25 ... AS lex; TOPK ... AS vec; FUSE ... FROM lex ... IN vec)
  private val extStatement: Parser[Command] =
    extInner ~ opt(kw("as") ~> name) ^^ {
      case c ~ Some(v) => ExtAs(c, v)
      case c ~ None => c }

  // ------------------------------------------------------------ entry points

  /** parse_db_query analog (dsl/src/db.rs:49-56). */
  def parseDb(input: String): Seq[Command] = parseStatements(dbStatement, input)

  /** parse_ai_query analog (dsl/src/ai.rs). */
  def parseAi(input: String): Seq[Command] = parseStatements(aiStatement, input)

  /** Extension-pipeline scripts (graft-only — no reference analog). */
  def parseExt(input: String): Seq[Command] = parseStatements(extStatement, input)

  /** `;`-separated statement loop; a statement that fails to parse raises
    * [[DslParseError]] with its span (invalid_statement analog). */
  private def parseStatements(stmt: Parser[Command], input: String): Seq[Command] = {
    val out = scala.collection.mutable.ArrayBuffer[Command]()
    var pos = 0
    // span = statement start (incl. its leading whitespace, as
    // invalid_statement's whitespace* prefix does) .. next ';' or EOI
    def fail(from: Int): Nothing = {
      val semi = input.indexOf(';', from)
      val end = if (semi < 0) input.length else semi
      throw DslParseError(
        s"Unexpected statement found '${input.substring(from, end).trim}'", from, end)
    }
    while (pos < input.length && input.substring(pos).exists(c => " \t\r\n".indexOf(c) < 0)) {
      parse(stmt, input.substring(pos)) match {
        case Success(cmd, next) =>
          out += cmd
          pos += next.offset
          val tail = pos // span of trailing garbage starts at its whitespace
          while (pos < input.length && " \t\r\n".indexOf(input.charAt(pos)) >= 0) pos += 1
          if (pos < input.length) {
            if (input.charAt(pos) == ';') pos += 1
            else fail(tail) // statement followed by trailing garbage
          }
        // a committed Error (err(...), e.g. an out-of-range int literal)
        // carries a diagnostic better than the generic fallback — surface
        // it with the same statement span
        case Error(msg, _) =>
          val semi = input.indexOf(';', pos)
          val end = if (semi < 0) input.length else semi
          throw DslParseError(msg, pos, end)
        case _ => fail(pos)
      }
    }
    out.toSeq
  }
}
