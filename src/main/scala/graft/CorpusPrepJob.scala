package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Corpus
import graft.sinks.ShardSink

/** The corpus-prep job that LANDS ARTIFACTS — where [[CorpusPipeline]]
  * demos the clean-dedup-mix-pack chain and prints a funnel line,
  * this job runs the FULL modern funnel
  * ([[graft.operators.Corpus.prepFunnel]] — bench holdout → lang-id →
  * quality → blocklist → PII → exact dedup → near-dup → Bloom
  * decontamination; the `corpus_prep_e2e` composition the driver gate
  * verifies) and writes the THREE artifacts a production prep
  * publishes per run:
  *
  *   1. `<out>/shards/` — the clean corpus as balanced pos-ordered
  *      training shards ([[graft.sinks.ShardSink]]);
  *   2. `<out>/manifest/` — the F7 packed-sequence assignment
  *      (doc → seq_id/seq_offset per stratum at the token budget),
  *      the map a sequence-building data-loader consumes;
  *   3. `<out>/ledger/` — the per-stage survivor-count ledger
  *      (the F14b audit artifact + regression tripwire);
  *   4. (`buildIndex`) `<out>/index/` — the serve index over the
  *      clean corpus (r10);
  *   5. (`auditFrac`) `<out>/audit/` — the dedup-quality self-audit
  *      over a deterministic sample (r12, see [[run]]);
  *   6. (`evalQueries`) `<out>/eval/` — the retrieval-quality
  *      self-audit over the landed index (r13, the F30 dual of the
  *      dedup audit, see [[run]]);
  *   7. (`profile`) `<out>/profile/` — the D16 duplication profile
  *      of the corpus entering near-dedup (r14, see [[run]]).
  *
  * Everything here is composition of catalog operators (each oracled
  * or spec'd on its own); this object only sequences them, times the
  * phases, and prints ONE machine-readable JSON line — the
  * [[Pipeline]] posture. One funnel pass feeds ledger AND clean frame
  * (the funnel's stage caches make the count branches share the
  * expensive subtrees).
  *
  *   sbt "runMain graft.CorpusPrepJob [docsDir] [outDir] [nShards]"
  */
object CorpusPrepJob {

  final case class PrepResult(
      docsIn: Long, cleanDocs: Long, shards: ShardSink.ShardReport,
      manifestRows: Long, ledger: Seq[(String, Long)],
      funnelSec: Double, shardSec: Double, manifestSec: Double,
      indexSec: Double = 0.0,
      audit: Option[(Long, Long, Long, Double, Double, Double)] = None,
      auditSec: Double = 0.0,
      serveEval: Option[(Long, Double)] = None,
      evalSec: Double = 0.0,
      profile: Option[(Long, Double)] = None,
      profileSec: Double = 0.0,
      graph: Option[(Long, Long)] = None)

  /** Run the prep against `docsDir`'s documents table, artifacts under
    * `outDir`. Gate parameters mirror the `corpus_prep_e2e` catalog
    * entry so the funnel exercised here is the exact composition the
    * driver gate verifies. */
  /** `buildIndex = true` adds the fourth artifact (r10): the serve
    * index over the CLEAN corpus — frozen BM25 stats
    * (`<out>/index/bm25*`, catalog table `prep_bm25`) + the written
    * IVF index over the SURVIVORS' embeddings (`<out>/index/ivf`) —
    * so [[graft.operators.Retrieval.serve]] can answer queries
    * against exactly the corpus the shards hold (indexing pre-funnel
    * docs would serve junk the trainer never sees). */
  /** `graphIndex = true` (requires `buildIndex`) adds the EIGHTH
    * artifact (r15, VERDICT r14 #6): `<out>/index/graph` — the E14b
    * graph-ANN serve index over the SURVIVORS' embeddings
    * ([[graft.operators.Similarity.writeGraphIndex]]), so the
    * graph-serve family (serve / append / compact / paged) answers
    * from a prep run's artifacts alone. */
  /** `auditFrac > 0` adds the FIFTH artifact (r12): `<out>/audit/` —
    * the dedup-quality self-audit. Exact-Jaccard truth over 100 TB is
    * unaffordable, but over a deterministic md5-coin sample it is
    * exactly [[graft.operators.Dedup.evalPairs]]: the LSH shortlist's
    * precision/recall/F1 against exact truth on the sample, landed as
    * one row next to the ledger — the band/threshold drift tripwire a
    * prep run should publish about itself (truth τ = 0.05, below the
    * dedup cut, so recall reports the collision-curve misses). */
  /** `evalQueries > 0` (requires `buildIndex`) adds the SIXTH
    * artifact (r13, VERDICT r12 #6): `<out>/eval/` — the
    * retrieval-quality self-audit, the F30 dual of the dedup audit.
    * A deterministic panel of the lowest-id nonzero survivor vectors
    * queries the LANDED index at serve configuration (`evalNprobe`
    * probes), judged by [[graft.operators.Retrieval.evalTopKGrouped]]
    * against exhaustive cosine truth over the clean embeddings — one
    * metrics row per query (recall@k / MRR / nDCG of the probed serve
    * vs exact). This is the "how much recall does my nprobe give up"
    * number a prep run should publish about its own index; at 100 TB
    * the panel stays a bounded sample (q·n work by declaration, the
    * auditFrac posture).
    *
    * `curriculumStages > 0` (r13) lands the shards in the F31
    * CURRICULUM order instead of the F17 hash shuffle — the training
    * schedule becomes a property of artifact 1 itself (easy→hard by
    * quality band, balance and round-robin reconstruction untouched —
    * see [[graft.sinks.ShardSink.writeShards]]). */
  def run(spark: SparkSession, docsDir: String, outDir: String,
          nShards: Int = 8, blocklist: Seq[String] = Seq("spam"),
          keepLang: String = "en", minQuality: Double = 0.45,
          budgetTokens: Int = 2048, buildIndex: Boolean = false,
          auditFrac: Double = 0.0, evalQueries: Int = 0,
          evalK: Int = 10, evalNprobe: Int = 4,
          curriculumStages: Int = 0, profile: Boolean = false,
          graphIndex: Boolean = false, graphK: Int = 5): PrepResult = {
    require(evalQueries <= 0 || buildIndex,
      "evalQueries needs buildIndex — the retrieval audit judges the landed index")
    require(!graphIndex || buildIndex,
      "graphIndex extends the index stage — it needs buildIndex")
    val docs = Tables.documents(spark, docsDir)
    val isBench = col("doc_id") % 97 === 0
    // the near-dup stage's ONE parameterization — shared with the
    // profile artifact below, so the published histogram describes
    // exactly the duplication the funnel's dedup will collapse
    val (dedupTau, dedupMaxDf) = (0.5, 10000L)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val ((ledger, clean, nearIn), funnelSec) = timed {
      val stages = Corpus.funnelStages(docs, isBench, blocklist,
        keepLang, minQuality, "lang", budgetTokens, tau = dedupTau,
        maxDf = dedupMaxDf, minShared = 3)
      // ledger over the doc-count stages (pack is phase 3's artifact)
      val led = stages.init.zipWithIndex.map { case ((name, df), i) =>
        df.agg(count(lit(1)).as("n_docs"))
          .select(lit(i).as("stage_idx"), lit(name).as("stage"),
            col("n_docs"))
      }.reduce(_.unionByName(_))
      led.coalesce(1).write.mode("overwrite").parquet(s"$outDir/ledger")
      val ledgerRows = spark.read.parquet(s"$outDir/ledger")
        .orderBy("stage_idx").collect()
        .map(r => (r.getString(1), r.getLong(2))).toSeq
      (ledgerRows, stages.collectFirst { case ("decontam", df) => df }.get,
        stages.collectFirst { case ("exact_dedup", df) => df }.get)
    }
    val (shardRep, shardSec) = timed {
      ShardSink.writeShards(clean, s"$outDir/shards", nShards,
        payload = Seq("lang", "text"), curriculumStages = curriculumStages)
    }
    val (manifestRows, manifestSec) = timed {
      Corpus.packSequences(clean, "lang", budgetTokens)
        .write.mode("overwrite").parquet(s"$outDir/manifest")
      spark.read.parquet(s"$outDir/manifest").count()
    }
    val (_, indexSec) =
      if (!buildIndex) ((), 0.0)
      else timed {
        // survivors' embeddings only: the index must answer from
        // exactly the corpus the shards hold
        val embClean = Tables.embeddings(spark, docsDir)
          .join(clean.select(col("doc_id").as("vec_id")), Seq("vec_id"),
            "left_semi")
        // the EIGHTH artifact (r15, VERDICT r14 #6): the graph-ANN
        // serve index (E14b) over the SAME survivor embeddings, so
        // the whole graph-serve family (serve/append/compact/paged)
        // is reachable from a prep run's artifacts alone —
        // `<out>/index/graph`, spec-pinned ≡ a direct
        // writeGraphIndex over the clean frame. The survivor set
        // comes from the LANDED shards (row-identical to `clean` —
        // spec-pinned 1:1), not the clean frame's lineage: the graph
        // build self-joins its input several times, and each copy
        // would re-embed the whole funnel plan (the tree string alone
        // OOMs before any work runs).
        // The three index lands are independent (disjoint dirs; the
        // graph reads the ALREADY-LANDED shards) and run concurrently
        // (r16, guide §2.6) — index_sec prices max(bm25, ivf, graph)
        // plus pool overhead instead of their sum
        graft.operators.Par.run(Seq[Option[() => Unit]](
          Some(() => graft.operators.TextAnalysis.writeBm25Stats(clean,
            "prep_bm25", s"$outDir/index/bm25")),
          Some(() => graft.operators.Similarity.writeIvfIndex(embClean,
            s"$outDir/index/ivf", nlist = 0)),
          if (!graphIndex) None
          else Some { () =>
            val survivorEmb = Tables.embeddings(spark, docsDir)
              .join(spark.read.parquet(s"$outDir/shards")
                  .select(col("doc_id").as("vec_id")),
                Seq("vec_id"), "left_semi")
            graft.operators.Similarity.writeGraphIndex(survivorEmb,
              s"$outDir/index/graph", k = graphK)
          }).flatten): Unit
      }
    // the report's (n_vectors, n_edges) counts read the landed
    // artifact back OUTSIDE the timed stage — they are bookkeeping,
    // and charging them to index_sec would misattribute report cost
    // to the build (the r14-verdict-#7 failure mode; r15 review)
    val graphRep =
      if (!(buildIndex && graphIndex)) None
      else Some((
        spark.read.parquet(s"$outDir/index/graph/vec").count(),
        spark.read.parquet(s"$outDir/index/graph/adj").count()))
    val (audit, auditSec) =
      if (auditFrac <= 0.0) (None, 0.0)
      else timed {
        // the corpus_split md5-coin spelling: deterministic, seedless,
        // replayable — the same sample every re-run audits
        val coin = substring(md5(concat(
          col("doc_id").cast("string"), lit(":audit"))), 1, 8)
        val sample = docs.filter(coin < lit(Corpus.hexThreshold(auditFrac)))
        graft.operators.Dedup.evalPairs(
            graft.operators.Dedup.minhashLsh(sample),
            graft.operators.Dedup.ngramJaccard(sample, 0.05))
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/audit")
        spark.read.parquet(s"$outDir/audit").collect().headOption.map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      }
    val (serveEval, evalSec) =
      if (evalQueries <= 0) (None, 0.0)
      else timed {
        val S = graft.operators.Similarity
        // survivors' embeddings — the universe the landed index holds
        val embClean = Tables.embeddings(spark, docsDir)
          .join(clean.select(col("doc_id").as("vec_id")), Seq("vec_id"),
            "left_semi")
        // deterministic panel: the lowest-id nonzero survivor vectors
        // (zero-norm vectors have no cosine ranking to audit)
        val qIds = embClean
          .filter(expr("aggregate(embedding, 0D, (a, x) -> a + x*x) > 0"))
          .select(col("vec_id")).orderBy(col("vec_id")).limit(evalQueries)
          .collect().map(_.getLong(0)).toSeq
        require(qIds.nonEmpty, "serve eval: no nonzero survivor vectors")
        val isQ = col("vec_id").isin(qIds.map(Long.box): _*)
        val cand = S.ivfTopKFromIndex(spark, s"$outDir/index/ivf",
          embClean.filter(isQ).select("vec_id", "embedding"), evalK,
          nprobe = evalNprobe)
        val ref = S.bruteForceTopK(embClean, isQ, evalK)
        def keyed(df: org.apache.spark.sql.DataFrame) =
          df.select(col("q_id").cast("string").as("system"),
            col("n_id").as("doc_id"), col("rank").cast("long"))
        // past-k sentinel per panel query (the streamingServeEval
        // posture, r13 review): a query whose probed serve returns
        // NOTHING must land a zeros row in the artifact — dropping it
        // would shrink the macro denominator and overstate quality
        // exactly when a query collapsed
        import spark.implicits._
        val sentinels = qIds.map(q => (q.toString, -1L, evalK.toLong + 1L))
          .toDF("system", "doc_id", "rank")
        graft.operators.Retrieval.evalTopKGrouped(
            keyed(cand).unionByName(sentinels), keyed(ref), evalK)
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/eval")
        val rows = spark.read.parquet(s"$outDir/eval").collect()
        // rows.length == qIds.size by the sentinel construction — the
        // macro denominator is the PANEL, never the surviving subset
        Some((rows.length.toLong,
          rows.map(_.getAs[Double]("recall")).sum / rows.length))
      }
    val (profileRows, profileSec) =
      if (!profile) (None, 0.0)
      else timed {
        // the SEVENTH artifact (r14, VERDICT r13 #3): the D16
        // duplication profile of the corpus ENTERING near-dedup
        // (exact-dedup survivors), under the near-dup stage's own
        // τ/df-cap — the cluster-size histogram a prep run publishes
        // before choosing its dedup budget. The pair frame is
        // re-derived here with the funnel's exact spelling (it is
        // not cached — the audit runs opt-in, next to the funnel's
        // one shingle pass)
        graft.operators.Dedup.dedupProfile(nearIn,
            graft.operators.Dedup.ngramJaccard(nearIn, dedupTau,
              maxDf = dedupMaxDf))
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/profile")
        val rows = spark.read.parquet(s"$outDir/profile").collect()
        val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
        val nClusters = rows.map(_.getAs[Long]("n_clusters")).sum
        // 1 − Σclusters/Σdocs — the dedup ratio the scaladoc pins
        Some((rows.length.toLong,
          if (nDocs == 0L) 0.0 else 1.0 - nClusters.toDouble / nDocs))
      }
    // the audit pins Dedup's slot caches (gram/signature tables,
    // sample-sized) — release them with the Corpus ones so a
    // long-lived session doing repeated preps doesn't hold them
    if (auditFrac > 0.0 || profile) graft.operators.Dedup.releaseCaches()
    Corpus.releaseCaches()
    PrepResult(ledger.headOption.map(_._2).getOrElse(0L),
      shardRep.rows, shardRep, manifestRows, ledger,
      funnelSec, shardSec, manifestSec, indexSec, audit, auditSec,
      serveEval, evalSec, profileRows, profileSec, graphRep)
  }

  def main(args: Array[String]): Unit = {
    val docsDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_prep_out").toString)
    val nShards = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    try {
      val r = run(spark, docsDir, outDir, nShards, buildIndex = true,
        auditFrac = 0.25, evalQueries = 8, profile = true,
        graphIndex = true)
      r.graph.foreach { case (nVec, nEdges) =>
        println(f"[prep] graph index: $nVec%d vectors, $nEdges%d edges") }
      r.profile.foreach { case (nBands, ratio) =>
        println(f"[prep] profile: $nBands%d cluster-size bands, " +
          f"dup ratio $ratio%.6f") }
      r.audit.foreach { case (tp, fp, fn, prec, rec, f1) =>
        println(f"[prep] audit: tp=$tp fp=$fp fn=$fn " +
          f"prec=$prec%.6f rec=$rec%.6f f1=$f1%.6f") }
      r.serveEval.foreach { case (nq, macroRecall) =>
        println(f"[prep] serve eval: $nq%d queries, " +
          f"macro recall@10 = $macroRecall%.6f") }
      r.ledger.zipWithIndex.foreach { case ((stage, n), i) =>
        println(f"[prep] stage $i%2d $stage%-14s $n%9d docs")
      }
      println(f"[prep] shards: ${r.shards.files}%d files, " +
        f"rows ${r.shards.minRows}%d..${r.shards.maxRows}%d per shard")
      println(s"""{"metric":"corpus_prep_job","docs_in":${r.docsIn},""" +
        s""""clean_docs":${r.cleanDocs},"shards":${r.shards.nShards},""" +
        s""""manifest_rows":${r.manifestRows},""" +
        s""""funnel_sec":${Jsons.num(r.funnelSec, 3)},""" +
        s""""shard_sec":${Jsons.num(r.shardSec, 3)},""" +
        s""""manifest_sec":${Jsons.num(r.manifestSec, 3)},""" +
        s""""index_sec":${Jsons.num(r.indexSec, 3)},""" +
        s""""audit_sec":${Jsons.num(r.auditSec, 3)}""" +
        r.audit.fold("")(a => s""","audit_f1":${Jsons.num(a._6, 6)}""") +
        s""","eval_sec":${Jsons.num(r.evalSec, 3)}""" +
        r.serveEval.fold("")(e =>
          s""","eval_recall":${Jsons.num(e._2, 6)}""") +
        s""","profile_sec":${Jsons.num(r.profileSec, 3)}""" +
        r.profile.fold("")(p =>
          s""","dup_ratio":${Jsons.num(p._2, 6)}""") +
        r.graph.fold("")(g =>
          s""","graph_vectors":${g._1},"graph_edges":${g._2}""") +
        s""","out":"$outDir"}""")
    } finally spark.stop()
  }
}
