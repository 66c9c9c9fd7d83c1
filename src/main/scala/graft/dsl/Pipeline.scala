package graft.dsl

import org.apache.spark.sql.DataFrame

import graft.engine.{GraftEngine, StoreInfo}

/**
 * Typed responses, mirroring the reference's server reply protos
 * (/root/reference/protos/db/server.proto, protos/db/pipeline.proto:16-66).
 */
sealed trait Response extends Serializable
object Response {
  case object Pong extends Response
  final case class Info(fields: Map[String, String]) extends Response
  final case class Clients(clients: Seq[Map[String, String]]) extends Response
  final case class StoreList(stores: Seq[StoreInfo]) extends Response
  final case class StoreGet(info: StoreInfo) extends Response
  /** CreateStore/DropStore/DropSchema/index ops/Del — counts and acks. */
  final case class Count(n: Long) extends Response
  case object Ok extends Response
  final case class SetResult(inserted: Long, updated: Long) extends Response
  /** GetKey / GetPred results: (key, value) rows. */
  final case class Entries(df: DataFrame) extends Response
  /** GetSimN results: (key, value, similarity) rows. */
  final case class SimEntries(df: DataFrame) extends Response
}

/**
 * Pipeline — ordered multi-statement execution with PER-STATEMENT error
 * capture, the analog of the reference's pipeline handler loop
 * (/root/reference/ahnlich/db/src/server/handler.rs:526-895,
 * protos/db/pipeline.proto:41-66): one failing statement doesn't abort the
 * batch; its error is recorded in-position and execution continues.
 */
object Pipeline {

  type StepResult = Either[String, Response]

  /** Parse a `;`-separated DSL script and run it. A parse error fails the
    * whole script (parity: the reference parses the full pipeline before
    * executing any of it). */
  def runDb(engine: GraftEngine, script: String): Seq[StepResult] =
    execute(engine, DslParser.parseDb(script))

  /** AI pipeline: same loop against the AI grammar + AI engine
    * (ai/src/server/handler.rs pipeline arm). */
  def runAi(ai: graft.ai.AiEngine, script: String): Seq[StepResult] =
    execute(ai.db, DslParser.parseAi(script), Some(ai))

  /** Extension pipeline (graft-only): SCAN/DEDUP/SPLIT/SAMPLE/PACK/CHUNK/
    * VOCAB/TEXTSTATS/PPL/GOPHER/BM25/DSIR/TOPK/SHUFFLE/CAP/LINES/SPANS/
    * DECON over registered tables — the SURVEY §2.7 operators scriptable
    * without Scala. Same per-statement error capture. */
  def runExt(spark: org.apache.spark.sql.SparkSession,
      script: String): Seq[StepResult] =
    DslParser.parseExt(script).map { cmd =>
      try Right(executeExt(spark, cmd))
      catch { case e: Exception => Left(Option(e.getMessage).getOrElse(e.toString)) }
    }

  /** Every extension statement runs inside a [[graft.obs.Trace]] span
    * (`ext.<statement>` on its first view/path operand) — the same
    * observability unit the engine ops carry. Same LAZY boundary as the
    * engine's read ops (see Trace's scaladoc): statements whose work is
    * driver-eager (DEDUP INDEX/APPEND, PQ/IVF training, anything ending
    * in a collect) attribute their cluster jobs to this span; statements
    * returning a lazy frame attribute only their planning here, and the
    * jobs run at the caller's materialization under whatever span is
    * open then. TRACE control statements themselves are exempt (SHOW
    * must not pollute the frame it reads). */
  def executeExt(spark: org.apache.spark.sql.SparkSession,
      cmd: Command): Response = cmd match {
    case Command.ExtTrace(_) => executeExtImpl(spark, cmd)
    case _ =>
      // every Command is a case class/object, hence a Product; the trait
      // itself doesn't extend it (parity with the reference's proto ADT)
      val p = cmd.asInstanceOf[Product]
      val op = "ext." + p.productPrefix.stripPrefix("Ext")
        .toLowerCase(java.util.Locale.ROOT)
      val target = p.productIterator
        .collectFirst { case s: String => s }.getOrElse("")
      graft.obs.Trace.span(spark, op, target)(executeExtImpl(spark, cmd))
  }

  /** Artifact stamp for USING INDEX arms: the DSL has no store-version
    * bookkeeping, so the stamp is a constant and the CALLER owns the
    * pinned directory's freshness — point a statement at a dir, and it
    * loads whatever shape-compatible index lives there (building and
    * saving on first use). Rebuild = delete the dir (or change the arm's
    * shape parameters, which are part of artifact identity). */
  private[dsl] val TopKIndexStamp = "dsl:user-managed"

  /** Strict-reuse flag shared by both RECALL arms; a malformed value
    * fails naming the conf key (the routedDeleteCap discipline). Both
    * arms evaluate it UNCONDITIONALLY at statement entry so a typo'd
    * value fails on the first RECALL statement, not mid-production on
    * the first fingerprint mismatch. */
  private def strictCalibrationReuse(
      spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.conf.get("spark.graft.strictCalibrationReuse", "false") match {
      case "true" => true
      case "false" => false
      case other => throw graft.types.GraftException(
        s"spark.graft.strictCalibrationReuse must be true or false, got '$other'")
    }

  /** The fingerprint match/strict/warn ladder shared by both RECALL
    * arms: true = the carried curve may serve this statement. */
  private def fpAllowsReuse(arm: String, carriedFp: String, stmtFp: String,
      strict: Boolean): Boolean = {
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    if (carriedFp.isEmpty || carriedFp == stmtFp) true
    else if (strict) {
      log.info(s"$arm calibration curve workload fingerprint mismatch " +
        s"($carriedFp != $stmtFp) — recalibrating against this " +
        "statement's query view (strictCalibrationReuse)")
      false
    } else {
      log.warn(s"reusing a $arm calibration curve measured on a DIFFERENT " +
        s"query workload ($carriedFp != $stmtFp) — its recall floor may " +
        "not hold here; set spark.graft.strictCalibrationReuse=true to " +
        "recalibrate, or point this statement at its own USING INDEX dir. " +
        "Note: an artifact calibrated before the round-16 " +
        "content-addressed fingerprint format reads as a mismatch exactly " +
        "once even on the identical workload (format upgrade, not drift) — " +
        "one recalibration clears it")
      true
    }
  }

  /** The IVF arm's calibrate-or-reuse — the [[routedRecallProbes]]
    * contract on the single-k IVF curve. A carried curve is reused only
    * when it answers THIS statement's question: same k (recall@k is
    * k-dependent — at fixed probes recall@100 < recall@3, so a k=3
    * curve silently over-promises a k=100 floor), the same ARM (a
    * quantized statement never reads an exact-arm curve, and vice
    * versa), and a matching WORKLOAD fingerprint (mismatch warns and
    * serves — or recalibrates under `spark.graft.strictCalibrationReuse`).
    *
    * One honesty caveat a RECALL-arm user must hold (round-13 advice):
    * the curve is calibrated on a sample of THIS statement's query view
    * and then serves those same queries, so the measured floor is
    * IN-SAMPLE (LCB selection absorbs sampling noise, not distribution
    * optimism — an external holdout read ~1.5pt under the self-measured
    * point at the steep part, SCALE.md). */
  private def ivfRecallProbes(spark: org.apache.spark.sql.SparkSession,
      ivf: graft.ann.IvfIndex, target: Double, k: Int,
      qframe: DataFrame, quantized: Option[Int],
      indexDir: Option[String]): Int = {
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    def calibrateAndPersist(): graft.ann.IvfIndex = {
      val c = ivf.calibrate(k = k, queries = Some(qframe),
        quantizedShortlist = quantized)
      // a quantized statement never persists: persisted curves are
      // exact-arm, shortlist-free
      if (quantized.isEmpty) indexDir.foreach { dir =>
        try graft.ann.IvfIndex.saveManifest(c, dir, TopKIndexStamp)
        catch { case scala.util.control.NonFatal(e) =>
          log.warn(s"persisting IVF calibration curve to $dir failed", e) }
      }
      c
    }
    val strict = strictCalibrationReuse(spark) // fail-fast on a typo'd value
    val cal =
      if (ivf.recallCurve.isEmpty || ivf.recallK != k || quantized.nonEmpty)
        calibrateAndPersist()
      else if (fpAllowsReuse("IVF", ivf.workloadFp,
          graft.ann.RoutedAnnIndex.workloadFingerprintOf(qframe, "qv"),
          strict)) ivf
      else calibrateAndPersist()
    cal.nProbeFor(target)
  }

  /** The ROUTED arm's calibrate-or-reuse, with the WORKLOAD-FINGERPRINT
    * guard (round-14 advice #4, made structural): a persisted curve
    * carries the fingerprint of the query sample it was measured on
    * ([[graft.ann.RoutedAnnIndex.workloadFp]]); before reusing a curve
    * at matching k, this statement draws ITS candidate sample (same
    * nQueries/seed the calibration would use — deterministic, so an
    * unchanged query view reproduces the fingerprint exactly) and
    * compares. Mismatch WARNS and serves — or, under
    * `spark.graft.strictCalibrationReuse=true`, RECALIBRATES against
    * this statement's own view (and persists, replacing the stale
    * curve) — instead of silently serving a floor measured on someone
    * else's workload. The in-sample honesty caveat in
    * [[ivfRecallProbes]]'s scaladoc applies to the measured floor
    * itself. */
  private def routedRecallProbes(spark: org.apache.spark.sql.SparkSession,
      idx: graft.ann.RoutedAnnIndex, target: Double, k: Int,
      qframe: DataFrame, exact: Option[DataFrame],
      indexDir: Option[String]): Int = {
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    // recalibration measures the UNION of the carried ks and this k, all
    // against THIS statement's workload: replacing the curve set with
    // {k} alone would make alternating-k statements against one pinned
    // dir destroy each other's coverage and recalibrate on every
    // statement (review round 15); re-measuring the carried ks keeps the
    // persisted fingerprint honest (one sample measured every curve)
    def calibrateAndPersist(): graft.ann.RoutedAnnIndex = {
      val ks = (idx.recallCurves.map(_._1) :+ k).distinct.sorted.toSeq
      val c = idx.calibrateKs(nQueries = 64, ks = ks,
        queries = Some(qframe), exact = exact)
      indexDir.foreach { dir =>
        try graft.ann.RoutedAnnIndex.save(c, dir, TopKIndexStamp,
          touchedOnly = Some(scala.collection.immutable.Set.empty[Int]))
        catch { case scala.util.control.NonFatal(e) =>
          log.warn(s"persisting calibration curve to $dir failed", e) }
      }
      c
    }
    val strict = strictCalibrationReuse(spark) // fail-fast on a typo'd value
    // a COVERING curve (any calibrated k' >= k) can serve this statement
    // — probesForN's conservative rule; requiring exact k would
    // recalibrate even when a tighter floor is already measured
    val cal =
      if (!idx.recallCurves.exists(_._1 >= k)) calibrateAndPersist()
      else if (fpAllowsReuse("routed", idx.workloadFp,
          graft.ann.RoutedAnnIndex.workloadFingerprintOf(qframe, "qv"),
          strict)) idx
      else calibrateAndPersist()
    cal.probesForN(target, k)
  }

  /** The (qid, cid, sim, rank) frame every TOPK arm returns, empty — the
    * short-circuit for an empty corpus view (no index can be trained
    * over zero rows, and the join result is empty either way). */
  private def emptyTopK(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("qid", LongType), StructField("cid", LongType),
        StructField("sim", DoubleType), StructField("rank", LongType))))
  }

  private def executeExtImpl(spark: org.apache.spark.sql.SparkSession,
      cmd: Command): Response = {
    import Command._
    import org.apache.spark.sql.functions.{col, size}
    def t(view: String): DataFrame = spark.table(view)
    def nearPairs(v: String, id: String, text: String, method: String,
        n: Int, th: Double): DataFrame = method match {
      case "minhash" => graft.dedup.Dedup.minHashLshJoin(t(v), id, text, n, th)
      case "simhash" => graft.dedup.Dedup.simHashJoin(t(v), id, text, n, th)
      case _         => graft.dedup.Dedup.jaccardJoin(t(v), id, text, n, th)
    }
    cmd match {
      case ExtScan(path, view, format) =>
        // non-parquet formats read with the canonical documents schema
        // (SCAN has no schema clause; a custom-shaped corpus goes through
        // the CorpusSource API). The corrupt-line audit frame registers
        // alongside as <view>_corrupt — silently discarding it would hide
        // exactly the corpus rot the PERMISSIVE reader exists to surface.
        format match {
          case "jsonl" | "csv" =>
            val r = if (format == "jsonl")
              graft.sources.CorpusSource.readJsonl(spark, path)
            else graft.sources.CorpusSource.readCsv(spark, path)
            r.good.createOrReplaceTempView(view)
            r.corrupt.createOrReplaceTempView(s"${view}_corrupt")
          case _ =>
            spark.read.parquet(path).createOrReplaceTempView(view)
        }
        Response.Ok
      case ExtDedupExact(v, id, text) =>
        Response.Entries(graft.dedup.Dedup.exactClusters(t(v), id, text))
      case ExtDedupNear(v, id, text, m, n, th) =>
        Response.Entries(nearPairs(v, id, text, m, n, th))
      case ExtDedupKeepOne(v, id, text, m, n, th) =>
        Response.Entries(graft.dedup.ConnectedComponents.dropNearDuplicates(
          t(v), id, nearPairs(v, id, text, m, n, th), "a", "b"))
      case ExtDedupKeepBest(v, id, text, r, m, n, th) =>
        Response.Entries(graft.dedup.ConnectedComponents
          .dropNearDuplicatesKeepBest(
            t(v), id, r, nearPairs(v, id, text, m, n, th), "a", "b"))
      case ExtDedupSemantic(v, id, vec, th) =>
        Response.Entries(graft.dedup.Dedup.semanticKeepOne(t(v), id, vec, th))
      case ExtSplit(v, id, tr, va) =>
        Response.Entries(graft.pipeline.Corpus.assignSplit(t(v), id, tr, va))
      case ExtSplitSafe(v, id, text, m, n, th, tr, va) =>
        Response.Entries(graft.pipeline.Corpus.leakageSafeSplit(
          t(v), id, nearPairs(v, id, text, m, n, th), "a", "b", tr, va))
      case ExtSample(v, id, f) =>
        Response.Entries(graft.pipeline.Corpus.deterministicSample(t(v), id, f))
      case ExtBudgetSelect(v, id, text, budget) =>
        Response.Entries(graft.pipeline.Corpus.selectByTokenBudget(
          t(v).select(col(id),
            graft.text.TextOps.qualityScore(col(text)).as("quality"),
            graft.text.TextOps.tokenCount(col(text)).cast("long").as("toks")),
          id, "quality", "toks", budget))
      case ExtClusterAssign(v, id, vec, k) =>
        val cents = graft.pipeline.Cluster.seedCentroids(t(v), id, vec, k)
        Response.Entries(graft.pipeline.Cluster.assign(t(v), vec, cents))
      case ExtClusterSample(v, id, vec, k, per) =>
        val cents = graft.pipeline.Cluster.seedCentroids(t(v), id, vec, k)
        Response.Entries(graft.pipeline.Cluster.balancedSample(
          graft.pipeline.Cluster.assign(t(v), vec, cents), "cluster", id, per))
      case ExtClusterKmeans(v, id, vec, k, iters) =>
        Response.Entries(
          graft.pipeline.Cluster.kmeans(t(v), id, vec, k, iters)._2)
      case ExtClusterOutliers(v, id, vec, k, factor) =>
        val cents = graft.pipeline.Cluster.seedCentroids(t(v), id, vec, k)
        Response.Entries(graft.pipeline.Cluster.embeddingOutliers(
          t(v), id, vec, cents, factorNum = factor.toLong))
      case ExtNgramTopK(v, text, n, k) =>
        Response.Entries(graft.text.HeavyHitters.ngramTopK(t(v), text, n, k))
      case ExtNegatives(k, qv, qi, qe, ql, cv, ci, ce, cl, ivfMode) =>
        ivfMode match {
          case None =>
            Response.Entries(graft.ann.Negatives.hardNegatives(
              t(qv), t(cv), qi, qe, ql, ci, ce, cl, k))
          case Some((cells, probe)) =>
            // per-statement labeled build, like TOPK IVF; long-lived
            // deployments use a stamped IvfIndex.buildOrLoad artifact
            val corpus = t(cv).select(col(ci).cast("long").as("id"),
              col(ce).cast("array<float>").as("key"), col(cl))
            val ivf = graft.ann.IvfIndex.build(corpus, nCells = cells,
              metric = graft.types.Algorithm.CosineSimilarity)
            Response.Entries(ivf.hardNegatives(t(qv), qi, qe, ql, cl, k, probe))
        }
      case ExtOverlap(v, g, text, n) =>
        Response.Entries(graft.pipeline.Overlap.overlapMatrix(t(v), g, text, n))
      case ExtDrift(v, g, text) =>
        Response.Entries(graft.pipeline.Overlap.tokenDrift(t(v), g, text))
      case ExtDiff(ov, nv, id, text) =>
        Response.Entries(graft.pipeline.Overlap.corpusDiff(t(ov), t(nv), id, text))
      case ExtPack(v, id, text, budget, shards) =>
        Response.Entries(graft.pipeline.Corpus.packSequences(
          t(v), id, text, budget, shards))
      case ExtShuffle(v, id, ep, sh) =>
        Response.Entries(graft.pipeline.Corpus.epochShuffle(t(v), id, ep, sh))
      case ExtWriteShards(d, v, id, text, ep, sh) =>
        Response.Entries(
          graft.pipeline.Corpus.writeShards(t(v), id, text, d, ep, sh))
      case ExtCap(v, id, g, m) =>
        Response.Entries(graft.pipeline.Corpus.capPerGroup(t(v), id, g, m))
      case ExtMix(v, id, g, target, alpha) =>
        Response.Entries(graft.pipeline.Corpus.temperatureMix(
          t(v), id, g, target, alpha))
      case ExtLines(v, id, text, maxDf) =>
        Response.Entries(graft.dedup.Dedup.removeBoilerplateLines(
          t(v), id, text, maxDf))
      case ExtDecon(v, id, text, bv, bi, bt, n) =>
        Response.Entries(graft.dedup.Dedup.decontaminate(
          t(v), id, text, t(bv), bi, bt, n))
      case ExtSpans(v, id, text, n) =>
        Response.Entries(graft.dedup.Dedup.removeRepeatedSpans(
          t(v), id, text, n))
      case ExtPpl(v, id, text) =>
        Response.Entries(graft.text.LangModel.bigramPerplexity(t(v), id, text))
      case ExtBm25(k, qv, qi, qt2, cv, ci, ct) =>
        Response.Entries(graft.text.Bm25.bm25TopK(
          t(cv), ci, ct, t(qv), qi, qt2, k))
      case ExtDsir(v, id, text, tv, ti, tt) =>
        // project+alias (not withColumnRenamed): robust when the target
        // view also carries columns named like the raw view's id/text
        Response.Entries(graft.text.Dsir.importanceWeights(
          t(v), t(tv).select(col(ti).as(id), col(tt).as(text)), id, text))
      case ExtClassify(v, id, text, tv, ti, tt, lab) =>
        Response.Entries(graft.text.Classify.predict(
          graft.text.Classify.trainNaiveBayes(t(tv), ti, tt, lab),
          t(v), id, text))
      case ExtRepetition(v, id, text) =>
        Response.Entries(t(v).select(col(id),
          graft.text.TextOps.repetitionSignals(col(text)).as("r"))
          .select(col(id), col("r.*")))
      case ExtBlocklist(v, id, text, words) =>
        Response.Entries(t(v).select(col(id),
          graft.text.TextOps.blocklistHits(col(text), words).as("hits"))
          .withColumn("blocked", col("hits") > 0))
      case ExtGopher(v, id, text) =>
        // g.* expansion: the flag list lives only in TextOps.gopherFlags
        Response.Entries(t(v).select(col(id),
          graft.text.TextOps.gopherFlags(col(text)).as("g"))
          .select(col(id), col("g.*")))
      case ExtChunk(v, id, text, size, overlap) =>
        Response.Entries(graft.pipeline.Corpus.chunkByTokens(
          t(v), id, text, size, overlap))
      case ExtVocab(v, id, text) =>
        Response.Entries(graft.pipeline.Corpus.vocabulary(t(v), id, text))
      case ExtLineSignals(v, id, text) =>
        Response.Entries(t(v).select(col(id),
            graft.text.TextOps.lineSignals(col(text)).as("s"))
          .select(col(id), col("s.n_lines"), col("s.frac_bullet"),
            col("s.frac_ellipsis_end"), col("s.frac_terminal")))
      case ExtTextStats(v, id, text) =>
        val tc = col(text)
        Response.Entries(t(v).select(col(id),
          graft.text.TextOps.langId(tc).as("lang"),
          graft.text.TextOps.tokenCount(tc).as("n_tok"),
          graft.text.TextOps.qualityScore(tc).as("quality"),
          graft.text.TextOps.fingerprint(tc).as("fingerprint")))
      case ExtTopK(k, qv, qi, qc, cv, ci, cc, mode) => mode match {
        case Command.TopKMode.Exact =>
          Response.Entries(graft.dedup.Dedup.topKJoin(
            t(qv), t(cv), qi, qc, ci, cc, k))
        case Command.TopKMode.Quantized(shortlist) =>
          Response.Entries(graft.functions.Quantize.quantizedTopKJoin(
            t(qv), t(cv), qi, qc, ci, cc, k, shortlist))
        case Command.TopKMode.Pq(m, ksub, shortlist) =>
          // per-statement training, like the IVF arm's per-statement
          // build; long-lived deployments use PqCodebook.trainOrLoad
          val corpus = t(cv).select(
            col(ci).cast("long").as("id"),
            col(cc).cast("array<float>").as("key"))
          val cb = graft.ann.PqCodebook.train(corpus, m, ksub)
          Response.Entries(cb.topKJoin(
            t(qv), t(cv), qi, qc, ci, cc, k, shortlist))
        case Command.TopKMode.IvfPq(cells, probe, m, ksub, shortlist) =>
          val corpus = t(cv).select(
            col(ci).cast("long").as("id"),
            col(cc).cast("array<float>").as("key"))
          val cb = graft.ann.PqCodebook.train(corpus, m, ksub)
          val ivf = graft.ann.IvfIndex.build(corpus, nCells = cells,
            metric = graft.types.Algorithm.CosineSimilarity)
          Response.Entries(ivf.pqTopKJoin(t(qv), qi, qc, k, probe,
            shortlist, cb))
        case Command.TopKMode.Routed(shards, probe, recall, storageKey, indexDir) =>
          // without USING INDEX: per-statement build like the IVF arm
          // (reference cosine build params). With it: load-or-build-and-
          // save against the pinned artifact dir — a scripted pipeline
          // pays the Lloyd + graph builds once across invocations; the
          // caller owns the dir's freshness (Pipeline.TopKIndexStamp).
          // probe >= shards is the exhaustive all-shard merge. SQ8/PQ
          // build the quantized index (storage is artifact identity — a
          // pinned dir never crosses storages) and serve through the
          // exact-rescored join; RECALL then calibrates through that
          // same path against the exact corpus — and a 1.0 target is
          // refused, exactly like the IVF QUANTIZED arm (the rescore
          // shortlist is approximate at every probe count).
          val quantizedArm = storageKey != "f32"
          if (quantizedArm && recall.exists(_ >= 1.0))
            throw graft.types.GraftException(
              s"RECALL 1.0 cannot be certified through the $storageKey " +
                "arm (the rescore shortlist is approximate at every " +
                "probe count) — use PROBE, or drop the storage keyword")
          val corpus = t(cv).select(
            col(ci).cast("long").as("id"),
            col(cc).cast("array<float>").as("key"))
          val first = corpus.select(size(col("key"))).limit(1).collect()
          if (first.isEmpty) Response.Entries(emptyTopK(t(cv).sparkSession))
          else {
            val dim = first.head.getInt(0)
            val spec =
              try graft.ann.StorageSpec.resolve(storageKey, dim)
              catch { case e: IllegalArgumentException =>
                throw graft.types.GraftException(e.getMessage) }
            val cfg = graft.types.NonLinearConfig.HNSWConfig(
              efConstruction = 100, maximumConnections = 40,
              maximumConnectionsZero = 80, efSearch = 128,
              metric = graft.types.Algorithm.CosineSimilarity)
            val idx = indexDir match {
              case Some(dir) => graft.ann.RoutedAnnIndex.buildOrLoad(
                corpus, dim, cfg, shards, dir, TopKIndexStamp,
                storage = spec)
              case None =>
                graft.ann.RoutedAnnIndex.build(corpus, dim, cfg, shards,
                  storage = spec)
            }
            val probes = (probe, recall) match {
              case (Some(p), _) => p
              case (None, Some(r)) =>
                routedRecallProbes(spark, idx, r, k,
                  qframe = t(qv).select(col(qc).as("qv")),
                  exact = if (quantizedArm) Some(corpus) else None,
                  indexDir = indexDir)
              case (None, None) => shards // unreachable by grammar: exhaustive
            }
            Response.Entries(
              if (quantizedArm)
                idx.topKJoinRescored(t(qv), qi, qc, k, probes, corpus)
              else idx.topKJoin(t(qv), qi, qc, k, probes))
          }
        case Command.TopKMode.Ivf(cells, probe, recall, quantized, indexDir) =>
          // cosine metric to match the exact arm's ranking contract; the
          // built index's cached cells stay pinned for the session (the
          // returned frame reads through them). USING INDEX pins the arm
          // to a stamped artifact dir (IvfIndex.buildOrLoad) — the
          // train-once production split, same contract as the routed arm
          val corpus = t(cv).select(
            col(ci).cast("long").as("id"),
            col(cc).cast("array<float>").as("key"))
          val ivf = indexDir match {
            case Some(dir) => graft.ann.IvfIndex.buildOrLoad(corpus, cells,
              dir, TopKIndexStamp,
              metric = graft.types.Algorithm.CosineSimilarity)
            case None => graft.ann.IvfIndex.build(corpus, nCells = cells,
              metric = graft.types.Algorithm.CosineSimilarity)
          }
          val nProbe = (probe, recall) match {
            case (Some(p), _) => p
            case (None, Some(r)) => // the Routed RECALL contract, IVF twin
              // a RECALL target on the QUANTIZED composition calibrates
              // THROUGH the quantized arm, so the curve carries SQ8 +
              // shortlist error exactly as the served path does — and a
              // 1.0 target is impossible to certify there (the shortlist
              // is approximate at EVERY nProbe, including exhaustive)
              if (r >= 1.0 && quantized.isDefined)
                throw graft.types.GraftException(
                  "RECALL 1.0 cannot be certified through the QUANTIZED " +
                    "arm (the SQ8 shortlist is approximate at every " +
                    "probe count) — use PROBE, or drop QUANTIZED")
              ivfRecallProbes(spark, ivf, r, k,
                qframe = t(qv).select(col(qc).as("qv")),
                quantized = quantized, indexDir = indexDir)
            case (None, None) => cells // unreachable by grammar: exhaustive
          }
          Response.Entries(quantized match {
            case Some(shortlist) =>
              ivf.quantizedTopKJoin(t(qv), qi, qc, k, nProbe, shortlist)
            case None => ivf.topKJoin(t(qv), qi, qc, k, nProbe)
          })
      }
      case ExtFuse(k, va, aDid, vb, bDid, c) =>
        Response.Entries(graft.text.Hybrid.rrfFuse(
          t(va).select(col("qid"), col(aDid).as("did"), col("rank")),
          t(vb).select(col("qid"), col(bDid).as("did"), col("rank")), k, c))
      case ExtAsof(lv, lt, rv, rt, k, carry, tol) =>
        Response.Entries(graft.events.EventOps.asofJoin(
          t(lv), lt, t(rv), rt, k, carry, tol))
      case ExtInterval(lv, lt, rv, rt, k, carry, lo, up) =>
        Response.Entries(graft.events.EventOps.intervalJoin(
          t(lv), lt, t(rv), rt, k, carry, lo, up))
      case ExtUrlCanon(v, u) =>
        Response.Entries(t(v)
          .withColumn("url_canon", graft.text.UrlOps.canonicalizeUrl(col(u)))
          .withColumn("host", graft.text.UrlOps.urlHost(col(u)))
          .withColumn("rdomain", graft.text.UrlOps.registrableDomain(col(u))))
      case ExtHtmlExtract(v, h) =>
        Response.Entries(t(v)
          .withColumn("clean_text", graft.text.Html.extractText(col(h))))
      case ExtDatacard(v, text, groups) =>
        Response.Entries(graft.pipeline.Profile.dataCard(t(v), text, groups))
      case ExtEmbedCard(v, vec, groups) =>
        Response.Entries(graft.pipeline.Profile.embeddingCard(t(v), vec, groups))
      case ExtDedupIndex(dir, v, id, text, n) =>
        graft.dedup.IncrementalDedup.buildIndex(t(v), id, text, dir,
          sourceStamp = v, n = n)
        Response.Ok
      case ExtDedupAppend(dir, v, id, text) =>
        val idx = graft.dedup.IncrementalDedup.loadAny(spark, dir)
          .getOrElse(throw graft.types.GraftException(
            s"no MinHash index at $dir — DEDUP INDEX it first"))
        graft.dedup.IncrementalDedup.append(idx, t(v), id, text,
          sourceStamp = v)
        Response.Ok
      case ExtDedupIncremental(dir, v, id, text, th) =>
        val idx = graft.dedup.IncrementalDedup.loadAny(spark, dir)
          .getOrElse(throw graft.types.GraftException(
            s"no MinHash index at $dir — DEDUP INDEX it first"))
        Response.Entries(graft.dedup.IncrementalDedup.dedupAgainst(
          idx, t(v), id, text, th))
      case ExtTrace(action) => action match {
        case "on"    => graft.obs.Trace.enabled = true; Response.Ok
        case "off"   => graft.obs.Trace.enabled = false; Response.Ok
        case "reset" => graft.obs.Trace.reset(); Response.Ok
        case "show"  => Response.Entries(graft.obs.Trace.frame(spark))
      }
      case ExtAs(inner, view) =>
        executeExt(spark, inner) match {
          case r @ Response.Entries(df) =>
            df.createOrReplaceTempView(view); r
          case other => throw graft.types.GraftException(
            s"AS $view needs a frame-producing statement, got $other")
        }
      case other =>
        throw graft.types.GraftException(
          s"$other is not an extension statement — use runDb/runAi")
    }
  }

  /** Execute pre-parsed commands sequentially, capturing per-statement
    * errors (handler.rs:526-895 loop). */
  def execute(engine: GraftEngine, commands: Seq[Command],
      ai: Option[graft.ai.AiEngine] = None): Seq[StepResult] =
    commands.map { cmd =>
      try Right(executeOne(engine, cmd, ai))
      catch { case e: Exception => Left(Option(e.getMessage).getOrElse(e.toString)) }
    }

  def executeOne(engine: GraftEngine, cmd: Command,
      ai: Option[graft.ai.AiEngine] = None): Response = {
    import Command._
    val d = engine.DefaultSchema
    cmd match {
      case Ping        => Response.Pong
      case InfoServer  => Response.Info(engine.infoServer())
      case ListClients => Response.Clients(engine.listClients())
      case ListStores(s)   => Response.StoreList(engine.listStores(s.getOrElse(d)))
      case GetStore(n, s)  => Response.StoreGet(engine.getStore(n, s.getOrElse(d)))
      case DropStore(n, e, s) =>
        Response.Count(engine.dropStore(n, s.getOrElse(d), e))
      case DropSchema(s)   => Response.Count(engine.dropSchema(s))
      case CreatePredIndex(n, ks, s) =>
        Response.Count(engine.createPredIndex(n, ks.toSet, s.getOrElse(d)))
      case DropPredIndex(n, ks, e, s) =>
        Response.Count(engine.dropPredIndex(n, ks.toSet, e, s.getOrElse(d)))
      case CreateNonLinearAlgorithmIndex(n, idx, s) =>
        Response.Count(engine.createNonLinearIndex(n, idx, s.getOrElse(d)))
      case DropNonLinearAlgorithmIndex(n, ks, e, s) =>
        Response.Count(engine.dropNonLinearIndex(n, ks.toSet, e, s.getOrElse(d)))
      case GetKey(n, ks, s) => Response.Entries(engine.getKey(n, ks, s.getOrElse(d)))
      case DelKey(n, ks, s) => Response.Count(engine.delKey(n, ks, s.getOrElse(d)))
      case GetPred(n, c, s) => Response.Entries(engine.getPred(n, c, s.getOrElse(d)))
      case GetSimN(n, q, k, a, c, s) =>
        Response.SimEntries(engine.getSimN(n, q, k, a, c, s.getOrElse(d)))
      case CreateStore(n, dim, ps, nl, e, s) =>
        engine.createStore(n, dim, ps.toSet, nl, e, s.getOrElse(d))
        Response.Ok
      case Set(n, es, s) =>
        val (i, u) = engine.set(n, es, s.getOrElse(d))
        Response.SetResult(i, u)
      case Upsert(n, k, v, c, m, s) =>
        // the reference answers Upsert with its Set-shaped response carrying
        // UpsertResult (db/src/server/handler.rs:483-512)
        val (i, u) = engine.upsert(n, c, k, v, m, s.getOrElse(d))
        Response.SetResult(i, u)
      case PurgeStores => Response.Count(engine.purgeStores().toLong)
      case aiCmd =>
        val aiEngine = ai.getOrElse(throw graft.types.GraftException(
          "AI statements must run through the AI engine (graft.ai)"))
        aiCmd match {
          case AiCreateStore(n, qm, im, ps, nl, e, so, s) =>
            aiEngine.createStore(n, qm, im, ps.toSet, nl, e, so, s.getOrElse(d))
            Response.Ok
          case AiSet(n, es, pa, ep, s) =>
            val (i, u) = aiEngine.set(n, es, s.getOrElse(d), pa, ep)
            Response.SetResult(i, u)
          case AiGetSimN(n, q, k, a, c, s) =>
            Response.SimEntries(aiEngine.getSimN(n, q, k, a, c, s.getOrElse(d)))
          case AiGetKey(n, ks, s) =>
            Response.Entries(aiEngine.getKey(n, ks, s.getOrElse(d)))
          case AiDelKey(n, ks, s) =>
            Response.Count(aiEngine.delKey(n, ks, s.getOrElse(d)))
          case AiUpsert(n, k, v, c, pa, ep, s) =>
            val (i, u) = aiEngine.upsert(n, c, k, v, s.getOrElse(d), pa, ep)
            Response.SetResult(i, u)
          case AiGetPred(n, c, s) =>
            Response.Entries(aiEngine.getPred(n, c, s.getOrElse(d)))
          case AiDropPredIndex(n, ks, e, s) =>
            Response.Count(aiEngine.dropPredIndex(n, ks.toSet, e, s.getOrElse(d)))
          case other =>
            throw graft.types.GraftException(s"Unsupported command $other")
        }
    }
  }
}
