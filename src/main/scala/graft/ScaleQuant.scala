package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * SQ8 node storage inside the routed shard graphs (VERDICT r13 #1): shard
 * graphs used to hold full float32 vectors per node — at 100 TB the
 * vector payload, not the graph overhead the reference budgets
 * (~60-450 B/element, docs/specs/hnsw.md:117-127), is the memory wall.
 * `RoutedAnnIndex(storage = graft.ann.StorageSpec.Sq8)` stores per-vector min/max int8
 * codes (~1/4 the vector bytes), builds and traverses the graphs on the
 * codes, and restores exact final ranking by rescoring an over-fetched
 * candidate beam against exact floats (engine hydration /
 * topKJoinRescored).
 *
 * Round 15 adds the THIRD storage tier: PQ codes
 * (`StorageSpec.Pq(m, ksub)` — m bytes/node, Jégou et al. 2011) behind
 * the same VecStore seam, measured beside f32 and SQ8 on every axis,
 * plus the RESCORE-SLACK SENSITIVITY table: SQ8's range-bounded error
 * hid inside slack=32, PQ's codebook-bounded error needs the wider
 * default (NodeStorage.Pq.rescoreSlack) — the table is the measurement
 * those constants cite.
 *
 * This main measures, at the 200k × 64-shard scale point every routed
 * harness shares:
 *  - build wall f32 vs sq8 vs pq (pq includes codebook training);
 *  - serialized ARTIFACT bytes per row, all storages (the measurable
 *    twin of resident bytes: the shard .bins are java-serialized shard
 *    objects, so their size IS codes-vs-floats plus a shared graph term);
 *  - external-query Recall@50 at a probes ladder: f32, sq8/pq RAW
 *    (quantized ranking, no rescore — the dishonest number a naive
 *    integration would report), sq8/pq + exact rescore (the served path);
 *  - rescored Recall@50 vs the slack width, sq8 and pq (p=16);
 *  - single-query search wall at probes=8, all storages;
 *  - calibrate THROUGH the quantized path (exact ground truth from the
 *    true corpus) vs the f32 curve — what the curve must price in.
 *
 * Prints markdown tables; numbers land in SCALE.md.
 * Usage: runMain graft.ScaleQuant [nCorpus] (default 200000)
 */
object ScaleQuant {

  private val K = 50
  private val NQueries = 100

  /** The per-shard serialized PQ codebook copy (shard .bins are
    * standalone, so each carries the book) — a FIXED per-shard term
    * that dominates a tiny fixture's B/row and amortizes to noise at
    * real shard sizes; printed separately so the artifact table reads
    * scale-honestly. */
  private def printBookTerm(idx: graft.ann.RoutedAnnIndex, shards: Int,
      n: Long): Unit = idx.storage match {
    case p: graft.ann.NodeStorage.Pq =>
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(p.book); oos.close()
      val b = bos.size().toLong
      println(f"  pq codebook term: ${b / 1e3}%.0f KB per shard copy x " +
        f"$shards shards = ${b * shards / 1e6}%.1f MB of the artifact " +
        f"(${b.toDouble * shards / n}%.1f B/row at THIS fixture; fixed " +
        f"per shard — e.g. 0.2 B/row at 5M rows/shard). In memory the " +
        f"copies intern to ONE book per JVM (PqCodebook.canonical).")
    case _ => ()
  }

  /** RESIDENT bytes of a live routed index's shard structures — JVM heap
    * footprint via Spark's SizeEstimator, one tiny job (the serialized
    * artifact bytes in the main table are the durable twin; this is the
    * executor-memory number the 100 TB sizing actually uses). Per-shard
    * estimates each traverse the SHARED interned PQ codebook
    * (PqCodebook.canonical — one instance per JVM), so the duplicated
    * counts are subtracted back: resident = Σ estimates − (live shards
    * − 1) × book. */
  private def residentBytes(idx: graft.ann.RoutedAnnIndex): Long = {
    val raw = idx.shards
      .map(s => org.apache.spark.util.SizeEstimator.estimate(s))
      .sum().toLong
    idx.storage match {
      case p: graft.ann.NodeStorage.Pq =>
        val live = idx.shards.count()
        val book = org.apache.spark.util.SizeEstimator.estimate(p.book)
        raw - math.max(0L, live - 1) * book
      case o: graft.ann.NodeStorage.Opq =>
        // book AND rotation both intern to one instance per JVM
        val live = idx.shards.count()
        val per = org.apache.spark.util.SizeEstimator.estimate(o.book) +
          org.apache.spark.util.SizeEstimator.estimate(o.rot)
        raw - math.max(0L, live - 1) * per
      case _ => raw
    }
  }

  def main(args: Array[String]): Unit = {
    // [nCorpus] [dim] [shards] — the (200000, 64, 64) default is the
    // SCALE.md round-15 operating point (reproducible as-is); an explicit
    // dim names a DESIGN-POINT run (round-16 ask #3: the 500k × 768-d PQ
    // rehearsal; the low-dim threshold ladder behind the engine's PQ
    // guard) and skips the fixed 30k × 768 high-dim appendix arm.
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val Dim = args.lift(1).map(_.toInt).getOrElse(64)
    val Shards = args.lift(2).map(_.toInt).getOrElse(64)
    val pqM = math.max(1, Dim / 8) // the classic 8-dims-per-subspace split
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val gen = new ScaleRecall.SiftGen(seed = 4242L, dim = Dim, intrinsic = 12)
    val corpus = spark.range(n).map(i => (i, gen(i).toSeq)).toDF("id", "key")
      .select(col("id"), col("key").cast("array<float>").as("key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"corpus ${corpus.count()} x $Dim (organic SIFT-shaped)")

    def timed[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $label: $s%.1f s")
      (r, s)
    }

    val cfg = graft.types.NonLinearConfig.HNSWConfig(efConstruction = 100,
      maximumConnections = 40, maximumConnectionsZero = 80, efSearch = 128,
      metric = graft.types.Algorithm.CosineSimilarity)

    val (f32, f32Build) = timed(s"f32 build ($Shards shards)") {
      graft.ann.RoutedAnnIndex.build(corpus, Dim, cfg, Shards, iters = 3)
    }
    val (sq8, sq8Build) = timed(s"sq8 build ($Shards shards)") {
      graft.ann.RoutedAnnIndex.build(corpus, Dim, cfg, Shards, iters = 3,
        storage = graft.ann.StorageSpec.Sq8)
    }
    // PQ arm (round 15): m=8 bytes/node at dim 64 — the byte-budget end;
    // build includes the codebook training (deterministic Lloyd per
    // subspace over the corpus)
    val (pqi, pqBuild) = timed(s"pq(m=$pqM,ksub=256) build ($Shards shards)") {
      graft.ann.RoutedAnnIndex.build(corpus, Dim, cfg, Shards, iters = 3,
        storage = graft.ann.StorageSpec.Pq(pqM, 256))
    }
    // OPQ arm (round 16): same bytes/node as pq, a learned rotation in
    // front — the graph-SERVED twin of the ScaleOpq quantizer-level
    // measurement (build includes the driver-side OPQ-NP alternation)
    val (opqi, opqBuild) = timed(s"opq(m=$pqM,ksub=256) build ($Shards shards)") {
      graft.ann.RoutedAnnIndex.build(corpus, Dim, cfg, Shards, iters = 3,
        storage = graft.ann.StorageSpec.Opq(pqM, 256))
    }

    // serialized artifact bytes: sum of the shard .bins (graph + node
    // payloads), manifest excluded — the apples-to-apples storage term
    def artifactBytes(idx: graft.ann.RoutedAnnIndex, tag: String): Long = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-quant-$tag")
      graft.ann.RoutedAnnIndex.save(idx, dir.toString, sourceStamp = "bench")
      val bytes = java.nio.file.Files.list(dir).toArray.map(_.toString)
        .filter(_.endsWith(".bin"))
        .map(p => java.nio.file.Files.size(java.nio.file.Paths.get(p))).sum
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      bytes
    }
    val bf = artifactBytes(f32, "f32")
    val bq = artifactBytes(sq8, "sq8")
    val bp = artifactBytes(pqi, "pq")
    val bo = artifactBytes(opqi, "opq")
    val rf = residentBytes(f32)
    val rq = residentBytes(sq8)
    val rp = residentBytes(pqi)
    val ro = residentBytes(opqi)
    println(f"resident bytes (SizeEstimator): f32 ${rf / 1e6}%.1f MB " +
      f"(${rf.toDouble / n}%.1f B/row) vs sq8 ${rq / 1e6}%.1f MB " +
      f"(${rq.toDouble / n}%.1f B/row, ${rf.toDouble / rq}%.2fx) vs pq " +
      f"${rp / 1e6}%.1f MB (${rp.toDouble / n}%.1f B/row, " +
      f"${rf.toDouble / rp}%.2fx) vs opq ${ro / 1e6}%.1f MB " +
      f"(${ro.toDouble / n}%.1f B/row, ${rf.toDouble / ro}%.2fx)")
    println(f"opq artifact: ${bo / 1e6}%.1f MB (${bo.toDouble / n}%.1f B/row, " +
      f"${bf.toDouble / bo}%.2fx vs f32; includes the d^2-float rotation " +
      "per shard .bin on disk — interned to ONE per JVM in memory)")
    println(f"artifact bytes: f32 ${bf / 1e6}%.1f MB (${bf.toDouble / n}%.1f B/row) " +
      f"vs sq8 ${bq / 1e6}%.1f MB (${bq.toDouble / n}%.1f B/row, " +
      f"${bf.toDouble / bq}%.2fx) vs pq ${bp / 1e6}%.1f MB " +
      f"(${bp.toDouble / n}%.1f B/row, ${bf.toDouble / bp}%.2fx); " +
      f"raw vector payload alone: ${Dim * 4}%d B/row f32 vs ${Dim + 8}%d " +
      f"sq8 vs ${8}%d pq (at 768 dims: ${768 * 4}%d vs ${768 + 8}%d vs 96)")
    printBookTerm(pqi, Shards, n)

    // external queries + exact ground truth (independent code path)
    val queries = (0 until NQueries).map(i => gen(10000000L + i))
    val qdf = queries.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("qid", "qv")
      .select(col("qid"), col("qv").cast("array<float>").as("qv"))
    val gt = graft.dedup.Dedup.topKJoin(qdf, corpus, "qid", "qv", "id", "key", K)
      .select("qid", "cid").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

    def recallOf(got: Map[Int, Seq[Long]]): Double = {
      val per = (0 until NQueries).map { i =>
        (gt(i.toLong) & got(i).take(K).toSet).size.toDouble / gt(i.toLong).size
      }
      per.sum / per.length
    }
    // slackN < 0 = RAW stored-form ranking (no rescore); slackN >= 0 =
    // exact rescore of a (K + slackN)-deep over-fetch — the engine
    // hydration emulation
    def arm(idx: graft.ann.RoutedAnnIndex, probes: Int,
        slackN: Int): Double = recallOf(
      queries.zipWithIndex.map { case (v, i) =>
        val raw = idx.search(v, K + math.max(0, slackN), probes)
        val ids =
          if (slackN < 0) raw.map(_._1)
          else raw.map { case (id, _) =>
            (id, graft.functions.Similarity.jvm.cosine(v, gen(id)))
          }.sortBy { case (id, c) => (-c, id) }.map(_._1)
        i -> ids
      }.toMap)
    val sq8Slack = sq8.storage.rescoreSlack
    val pqSlack = pqi.storage.rescoreSlack

    println()
    println("| probes | f32 Recall@50 | sq8 RAW | sq8 + rescore | pq RAW | pq + rescore | pq rescored delta vs f32 | opq + rescore | opq delta vs f32 |")
    println("|---|---|---|---|---|---|---|---|---|")
    for (p <- Seq(4, 8, 16, Shards)) {
      val rf = arm(f32, p, -1)
      val rq = arm(sq8, p, -1)
      val rr = arm(sq8, p, sq8Slack)
      val rpRaw = arm(pqi, p, -1)
      val rpRes = arm(pqi, p, pqSlack)
      val roRes = arm(opqi, p, opqi.storage.rescoreSlack)
      println(f"| $p%d / $Shards%d | $rf%.4f | $rq%.4f | $rr%.4f | " +
        f"$rpRaw%.4f | $rpRes%.4f | ${rpRes - rf}%+.4f | " +
        f"$roRes%.4f | ${roRes - rf}%+.4f |")
    }

    // RESCORE-SLACK SENSITIVITY (round-15 ask): SQ8's per-vector range
    // error hid inside slack=32 — PQ's codebook-bounded error is larger,
    // so the slack that was enough for SQ8 may not be for PQ. Measured
    // at the serving-typical pruned point
    println()
    println("| rescore slack | sq8 Recall@50 (p=16) | pq Recall@50 (p=16) |")
    println("|---|---|---|")
    for (sl <- Seq(0, 8, 32, 128, 256)) {
      println(f"| $sl%d | ${arm(sq8, 16, sl)}%.4f | ${arm(pqi, 16, sl)}%.4f |")
    }
    println(s"(defaults: sq8 = $sq8Slack, pq = $pqSlack)")

    // single-query wall at the operating probes (mean over the sample,
    // measured after one warmup pass)
    def searchWall(idx: graft.ann.RoutedAnnIndex): Double = {
      queries.take(10).foreach(idx.search(_, K, 8))
      val t0 = System.nanoTime()
      queries.foreach(idx.search(_, K, 8))
      (System.nanoTime() - t0) / 1e9 / NQueries
    }
    val wf = searchWall(f32)
    val wq = searchWall(sq8)
    val wp = searchWall(pqi)
    println(f"search wall probes=8: f32 ${wf * 1000}%.1f ms/query vs " +
      f"sq8 ${wq * 1000}%.1f ms/query (${wq / wf}%.2fx) vs " +
      f"pq ${wp * 1000}%.1f ms/query (${wp / wf}%.2fx)")

    // calibration: the f32 curve vs the curve measured THROUGH the
    // quantized rescored path (exact ground truth from the true corpus)
    val (calF, calFWall) = timed("f32 calibrate (self-sample)") {
      f32.calibrate(nQueries = NQueries, k = K, seed = 99L)
    }
    val (calQ, calQWall) = timed("sq8 calibrate (exact corpus, rescored path)") {
      sq8.calibrate(nQueries = NQueries, k = K, seed = 99L,
        exact = Some(corpus))
    }
    val (calP, calPWall) = timed("pq calibrate (exact corpus, rescored path)") {
      pqi.calibrate(nQueries = NQueries, k = K, seed = 99L,
        exact = Some(corpus))
    }
    println(f"calibrate wall: f32 $calFWall%.1f s vs sq8 $calQWall%.1f s " +
      f"vs pq $calPWall%.1f s")
    println("| probes | f32 curve | sq8 curve (served path) | pq curve (served path) |")
    println("|---|---|---|---|")
    val fByP = calF.recallCurve.map(c => c._1 -> c._2).toMap
    val pByP = calP.recallCurve.map(c => c._1 -> c._2).toMap
    calQ.recallCurve.foreach { case (p, qr, _) =>
      for (fr <- fByP.get(p); pr <- pByP.get(p))
        println(f"| $p%d / $Shards%d | $fr%.4f | $qr%.4f | $pr%.4f |")
    }

    f32.unpersist(); sq8.unpersist(); pqi.unpersist(); opqi.unpersist()

    // high-dim arm: 64 dims understates the lever (the graph term is
    // comparable to a 256 B payload); at 768 dims — the BGE/MiniLM-class
    // reality — the payload dominates and SQ8 pays off in full. Skipped
    // when the caller named an explicit design point (dim arg).
    if (args.length > 1) { spark.stop(); return }
    val n2 = 30000L
    val dim2 = 768
    val gen2 = new ScaleRecall.SiftGen(seed = 515L, dim = dim2, intrinsic = 16)
    val corpus2 = spark.range(n2).map(i => (i, gen2(i).toSeq)).toDF("id", "key")
      .select(col("id"), col("key").cast("array<float>").as("key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"\nhigh-dim arm: ${corpus2.count()} x $dim2, 16 shards")
    val (f2, f2Build) = timed("f32 build (768-d)") {
      graft.ann.RoutedAnnIndex.build(corpus2, dim2, cfg, 16, iters = 2)
    }
    val (q2, q2Build) = timed("sq8 build (768-d)") {
      graft.ann.RoutedAnnIndex.build(corpus2, dim2, cfg, 16, iters = 2,
        storage = graft.ann.StorageSpec.Sq8)
    }
    // the PQ payoff point: 96 B/row of codes vs 3072 B of floats (32x on
    // the payload term; bare "pq" resolves to m=96, ksub=256 at 768-d)
    val (p2, p2Build) = timed("pq(m=96,ksub=256) build (768-d)") {
      graft.ann.RoutedAnnIndex.build(corpus2, dim2, cfg, 16, iters = 2,
        storage = graft.ann.StorageSpec.Pq(96, 256))
    }
    val b2f = artifactBytes(f2, "f32d768")
    val b2q = artifactBytes(q2, "sq8d768")
    val b2p = artifactBytes(p2, "pqd768")
    println(f"768-d artifact bytes: f32 ${b2f / 1e6}%.1f MB " +
      f"(${b2f.toDouble / n2}%.1f B/row) vs sq8 ${b2q / 1e6}%.1f MB " +
      f"(${b2q.toDouble / n2}%.1f B/row, ${b2f.toDouble / b2q}%.2fx) vs " +
      f"pq ${b2p / 1e6}%.1f MB (${b2p.toDouble / n2}%.1f B/row, " +
      f"${b2f.toDouble / b2p}%.2fx)")
    printBookTerm(p2, 16, n2)
    val r2f = residentBytes(f2)
    val r2q = residentBytes(q2)
    val r2p = residentBytes(p2)
    println(f"768-d resident bytes (SizeEstimator): f32 ${r2f.toDouble / n2}%.1f " +
      f"B/row vs sq8 ${r2q.toDouble / n2}%.1f B/row (${r2f.toDouble / r2q}%.2fx) " +
      f"vs pq ${r2p.toDouble / n2}%.1f B/row (${r2f.toDouble / r2p}%.2fx)")
    val qs2 = (0 until 30).map(i => gen2(20000000L + i))
    val qdf2 = qs2.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("qid", "qv")
      .select(col("qid"), col("qv").cast("array<float>").as("qv"))
    val gt2 = graft.dedup.Dedup.topKJoin(qdf2, corpus2, "qid", "qv", "id", "key", K)
      .select("qid", "cid").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    def rec768(idx: graft.ann.RoutedAnnIndex, probes: Int,
        slackN: Int): Double = {
      val per = qs2.zipWithIndex.map { case (v, i) =>
        val raw = idx.search(v, K + math.max(0, slackN), probes)
        val ids =
          if (slackN < 0) raw.map(_._1)
          else raw.map { case (id, _) =>
            (id, graft.functions.Similarity.jvm.cosine(v, gen2(id)))
          }.sortBy { case (id, c) => (-c, id) }.map(_._1)
        (gt2(i.toLong) & ids.take(K).toSet).size.toDouble / gt2(i.toLong).size
      }
      per.sum / per.length
    }
    for (p <- Seq(4, 16))
      println(f"768-d probes=$p%d Recall@50: f32 ${rec768(f2, p, -1)}%.4f " +
        f"vs sq8+rescore ${rec768(q2, p, sq8Slack)}%.4f " +
        f"vs pq+rescore ${rec768(p2, p, pqSlack)}%.4f")
    f2.unpersist(); q2.unpersist(); p2.unpersist()
    spark.stop()
  }
}
