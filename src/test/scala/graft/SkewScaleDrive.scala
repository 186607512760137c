package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Dedup, Similarity, TextAnalysis}

/** One-off scale/skew drive (round-6 verdict ask): synthesize a
  * hot-key corpus well past verify scale — every doc shares a 16-word
  * boilerplate header (so every header gram's df = n, and
  * minhash/simhash band values concentrate into mega-buckets), 90% of
  * docs sit in ONE stratum (the pretraining-corpus skew shape), 2% of
  * docs are planted twins — plus matching embeddings, then run the
  * capped dedup/corpus block (D3b, D2, D4, D5b, F7) at TWO corpus
  * sizes and report:
  *
  *  - wall seconds per op and the size-ratio between runs — the caps
  *    are engaged iff cost grows ~linearly (an uncapped hot bucket or
  *    gram would grow the candidate join quadratically);
  *  - cap-engagement facts (header grams above the df cap, their df
  *    mass share);
  *  - task-level skew of each op's heaviest stage (max/median records
  *    per task) — the mega-stratum/mega-bucket must SPREAD, not pin
  *    one task.
  *
  * Results recorded in PERF.md. Run:
  *   sbt "Test/runMain graft.SkewScaleDrive [nDocs]"
  */
object SkewScaleDrive {

  /** per-stage (records, runtime-ms) task samples. */
  private final class StageStats extends SparkListener {
    val byStage = new java.util.concurrent.ConcurrentHashMap[
      Int, java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]]()
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        val recs = math.max(m.shuffleReadMetrics.recordsRead,
          m.inputMetrics.recordsRead)
        byStage.computeIfAbsent(e.stageId,
            _ => new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]())
          .add((recs, m.executorRunTime))
      }
    }
    def clear(): Unit = byStage.clear()
    /** (tasks, medianRecs, maxRecs, medianMs, maxMs) of the stage with
      * the largest record volume among stages of >1 task. */
    def heaviest: Option[(Int, Long, Long, Long, Long)] = {
      import scala.jdk.CollectionConverters._
      byStage.asScala.values.map(_.asScala.toSeq).filter(_.size > 1)
        .maxByOption(_.map(_._1).sum).map { ts =>
          val recs = ts.map(_._1).sorted
          val ms = ts.map(_._2).sorted
          (ts.size, recs(recs.size / 2), recs.last, ms(ms.size / 2), ms.last)
        }
    }
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"),
      shufflePartitions = "32")
    val stats = new StageStats
    spark.sparkContext.addSparkListener(stats)
    val dir = java.nio.file.Files.createTempDirectory("graft_skew").toString

    // EVERY doc carries these 16 words → every header 3-gram has
    // df = n (the boilerplate regime the df cap exists for)
    val boiler = "the quick brown fox jumps over the lazy dog shared " +
      "portal navigation header copyright all rights"

    def corpus(size: Int): (DataFrame, DataFrame) = {
      // ids k·100 and k·100+1 share a tail seed → 1 planted twin pair
      // per 100 docs (exact near-dups through the unique tail)
      val seed = when(pmod(col("id"), lit(100)) < 2,
        col("id") - pmod(col("id"), lit(100))).otherwise(col("id"))
      val tail = concat_ws(" ", (0 until 8).map(i =>
        md5(concat(seed.cast("string"), lit(s":$i")))): _*)
      val docs = spark.range(size).select(
        col("id").as("doc_id"),
        when(pmod(col("id"), lit(10)) < 9, lit("en"))
          .otherwise(concat(lit("l"), pmod(col("id"), lit(10)))).as("lang"),
        lit("web").as("source"),
        concat(lit(boiler + " "), tail).as("text"))
      val emb = spark.range(size).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(15)), d =>
          ((pmod(hash(seed, d), lit(2000)) - 1000) / 1000.0).cast("float"))
          .as("embedding"),
        concat(lit("c"), pmod(col("id"), lit(7))).as("label"))
      docs.write.mode("overwrite").parquet(s"$dir/docs_$size")
      emb.write.mode("overwrite").parquet(s"$dir/emb_$size")
      (spark.read.parquet(s"$dir/docs_$size"),
        spark.read.parquet(s"$dir/emb_$size"))
    }

    def clearCaches(): Unit = {
      Dedup.releaseCaches(); Similarity.releaseCaches(); Corpus.releaseCaches()
      spark.sharedState.cacheManager.clearCache()
    }

    def runOps(size: Int): Map[String, (Double, Long)] = {
      val (docs, emb) = corpus(size)
      // occupancy 128 — the r8 catalog config (D5bTuneDrive)
      val planes = math.max(4,
        64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, size / 128L)))
      val ops: Seq[(String, () => DataFrame)] = Seq(
        "D3b_ngram_capped" -> (() => Dedup.ngramJaccard(docs, 0.2, maxDf = 50L)),
        "D2_minhash_lsh" -> (() => Dedup.minhashLsh(docs)),
        "D4_simhash" -> (() => Dedup.simhashPairs(docs)),
        "D5b_embedding_lsh" -> (() =>
          Similarity.cosinePairsLsh(emb, 0.95, planes = planes,
            tables = 6, probes = 2)),
        // D11 capped: the 16-token header makes the pure-header window
        // hash a boilerplate fingerprint selected by ~n/w docs —
        // uncapped that one key fans out O((n/w)²) pairs; the cap
        // drops it and cost must stay ~linear
        "D11_substring_capped" -> (() =>
          Dedup.substringDedup(docs, 16, 8, maxDf = 50L)),
        // D9d: ~1% of docs are the "benchmark"; EVERY corpus doc
        // shares the header grams with EVERY bench doc, so uncapped
        // the gram equi-join fans out n_corpus × n_bench pairs — the
        // df cap must drop the header from BOTH sides (denominators
        // recompute over kept grams) and leave only tail collisions,
        // keeping cost ~linear in n
        "D9d_contam_fuzzy" -> (() =>
          Dedup.contaminationFuzzy(docs,
            pmod(col("doc_id"), lit(97)) === 0, tau = 0.5, maxDf = 50L)),
        "F7_pack_sequences" -> (() => Corpus.packSequences(docs, "lang", 2048)),
        // F16: every doc shares the 16-token header, so its 15 bigrams
        // each have count ≈ n — the count tables still hold ONE row
        // per bigram, so the joins must stay linear and the hot keys'
        // probe rows must spread (not pin one task). The n_bigrams
        // filter is load-bearing: scored is unique per doc_id, so a
        // bare count() would let the optimizer ELIMINATE the left
        // join and measure nothing
        "F16_lm_score" -> (() =>
          TextAnalysis.lmScore(docs).filter(col("n_bigrams") >= 0)),
        "F17_global_shuffle" -> (() => Corpus.globalShuffle(docs)),
        // F19: the header's 16 tokens each appear in EVERY doc — the
        // (tok, class) count table still holds one row per pair and
        // hot tokens cost probe rows × |classes|; the n_toks filter
        // is the F16 join-elimination guard
        "F19_nb_classify" -> (() =>
          TextAnalysis.nbClassify(docs).filter(col("n_toks") >= 0)),
        // F20: hot header tokens pile their mass into ≤16 of the 256
        // hashed buckets (the λ table stays 256 rows regardless) and
        // 90% of docs share one lang — the weight groupBy and the
        // range sort must both stay spread
        "F20_dsir_sample" -> (() => Corpus.dsirSample(docs)),
        // F21: the md5 tails make ~8n DISTINCT words (the 32-hex-char
        // kind — long symbol arrays), so the working table is larger
        // than the doc count: 16 merge iterations over it must scale
        // with the VOCABULARY, linearly
        "F21_bpe_train" -> (() =>
          graft.operators.Bpe.trainTable(docs, 16)))
      val wanted = args.lift(1).map(_.split(",").toSet)
      ops.filter(o => wanted.forall(_.contains(o._1))).map { case (name, fn) =>
        clearCaches(); stats.clear()
        val t0 = System.nanoTime()
        val rows = fn().count()
        val wall = (System.nanoTime() - t0) / 1e9
        val skew = stats.heaviest.map { case (t, medR, maxR, medMs, maxMs) =>
          f"tasks=$t%3d recs med/max=$medR%d/$maxR%d " +
            f"(x${maxR.toDouble / math.max(1, medR)}%.1f) " +
            f"ms med/max=$medMs%d/$maxMs%d"
        }.getOrElse("single-task stages only")
        println(f"[skew] n=$size%7d $name%-18s ${wall}%7.2fs rows=$rows%9d  $skew")
        name -> (wall, rows)
      }.toMap
    }

    // cap-engagement facts on the large corpus
    val (docsN, _) = corpus(n)
    val dfs = Dedup.gramDocFrequencies(docsN)
    val hot = dfs.filter(col("df") > 50)
      .agg(count(lit(1)).as("hot_grams"), sum("df").as("hot_mass")).head()
    val tot = dfs.agg(count(lit(1)), sum("df")).head()
    println(s"[skew] n=$n grams=${tot.getLong(0)} gram_mass=${tot.getLong(1)} " +
      s"hot_grams(df>50)=${hot.getLong(0)} hot_mass=${hot.getLong(1)} " +
      f"(${100.0 * hot.getLong(1) / tot.getLong(1)}%.1f%% of all gram " +
      "occurrences leave the D3b join under the cap)")
    val fdfs = Dedup.fingerprintDocFrequencies(docsN)
    val fhot = fdfs.filter(col("df") > 50)
      .agg(coalesce(count(lit(1)), lit(0L)).as("hot_fps"),
        coalesce(sum("df"), lit(0L)).as("hot_mass")).head()
    val ftot = fdfs.agg(count(lit(1)), sum("df")).head()
    println(s"[skew] n=$n fingerprints=${ftot.getLong(0)} " +
      s"fp_mass=${ftot.getLong(1)} hot_fps(df>50)=${fhot.getLong(0)} " +
      s"hot_fp_mass=${fhot.getLong(1)} " +
      f"(${100.0 * fhot.getLong(1) / ftot.getLong(1)}%.1f%% of fingerprint " +
      "occurrences leave the D11 join under the cap)")

    val small = runOps(n / 4)
    val large = runOps(n)
    println(f"[skew] size ratio 4x — wall ratios (linear ≈ 4-6, quadratic ≈ 16):")
    small.keys.toSeq.sorted.foreach { k =>
      val r = large(k)._1 / math.max(1e-9, small(k)._1)
      println(f"[skew]   $k%-18s x$r%.1f  (${small(k)._1}%.2fs -> ${large(k)._1}%.2fs)")
    }

    // cleanup
    val hp = new org.apache.hadoop.fs.Path(dir)
    hp.getFileSystem(spark.sessionState.newHadoopConf()).delete(hp, true)
    spark.stop()
  }
}
