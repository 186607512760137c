package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** One-off: on-disk IVF serve cost, fixed nlist=16 vs auto ~√n.
  *
  * Two modes:
  *  - `sbt "Test/runMain graft.ServeScaleDrive <sfDir>"` — catalog
  *    embeddings at that sf (the r8 run: job-overhead-bound at 20k);
  *  - `sbt "Test/runMain graft.ServeScaleDrive synth:<n>"` — the r9
  *    ask: SkewScaleDrive's synthetic corpus at 200k vectors, where
  *    the layouts separate. Reports per layout: median serve wall,
  *    recall vs brute force (held-recall check), and the PRUNING
  *    AUDIT — index rows actually read during one serve (partition
  *    pruning means a query reads only its nprobe lists; the fixed
  *    layout's 16 fat lists make every probe read n/16 rows).
  *
  * Builds both index layouts (untimed), serves three times each,
  * prints the medians. Not part of `test`. */
object ServeScaleDrive {

  private final class ReadStats extends SparkListener {
    val records = new java.util.concurrent.atomic.AtomicLong()
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) records.addAndGet(m.inputMetrics.recordsRead)
    }
    def reset(): Unit = records.set(0L)
  }

  def main(args: Array[String]): Unit = {
    val arg = args.headOption.getOrElse("synth:200000")
    val spark = Sessions.local("32")
    val emb = arg match {
      case s if s.startsWith("synth:") =>
        val n = s.stripPrefix("synth:").toInt
        val dir = java.nio.file.Files.createTempDirectory("graft_srv_emb").toString
        // ClusteredAnnDrive's mixture-of-Gaussians corpus (the regime
        // coarse quantizers are designed for — real embedding spaces
        // are clustered; an isotropic hash corpus has no structure
        // for ANY coarse quantizer to exploit and only measures the
        // probing ceiling)
        import spark.implicits._
        val dim = 16; val nCenters = 256
        val rnd = new scala.util.Random(421)
        val centers = Array.fill(nCenters, dim)(rnd.nextGaussian())
        (0 until n).map { i =>
          val c = rnd.nextInt(nCenters)
          val v = Array.tabulate(dim)(d =>
            (centers(c)(d) + 0.15 * rnd.nextGaussian()).toFloat)
          (i.toLong, v, s"c$c")
        }.toDF("vec_id", "embedding", "label")
          .repartition(32).write.mode("overwrite").parquet(dir)
        spark.read.parquet(dir)
      case sfDir => Tables.embeddings(spark, sfDir)
    }
    val nCorpus = emb.count()
    val isQuery = col("vec_id") % (nCorpus / 128L) === 0L
    val queries = emb.filter(isQuery).select("vec_id", "embedding")
    val nQ = queries.count()

    val stats = new ReadStats
    spark.sparkContext.addSparkListener(stats)

    // held-recall baseline: exact top-5 ids per query
    val exact = Similarity.bruteForceTopK(emb, isQuery, 5)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def build(nlist: Int): String = {
      val p = java.nio.file.Files.createTempDirectory("graft_srv").toString
      Similarity.writeIvfIndex(emb, p, nlist = nlist)
      p
    }
    val fixedPath = build(16); val autoPath = build(0)

    def serve(label: String, path: String, q: org.apache.spark.sql.DataFrame,
              batch: String): Double = {
      def result() =
        Similarity.ivfTopKFromIndex(spark, path, q, 5, nprobe = 4)
      def once(): Double = {
        val t0 = System.nanoTime()
        result().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val wall = (1 to 3).map(_ => once()).sorted.apply(1)
      val got = result().select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val mine = exact.filter(p => got.exists(_._1 == p._1) ||
        q.select("vec_id").collect().map(_.getLong(0)).contains(p._1))
      val recall = if (mine.isEmpty) 1.0
        else (got & mine).size.toDouble / mine.size
      stats.reset(); once()
      val read = stats.records.get()
      println(f"[serve] $batch%-9s $label%-16s wall=$wall%6.2f s  " +
        f"recall=$recall%.3f  rows_read=$read%,d " +
        f"(${100.0 * read / math.max(1, nCorpus)}%.1f%% of corpus per serve)")
      wall
    }
    // analytics shape: the whole 129-query batch — its probe UNION
    // touches ~every list, so partition pruning cannot engage and the
    // layouts separate only on scored-pair volume
    serve("fixed nlist=16", fixedPath, queries, "batch=129")
    serve("auto ~sqrt(n)", autoPath, queries, "batch=129")
    // online shape: one query — pruning reads only its nprobe lists
    // (fixed: 4/16 of the corpus; auto: 4/√n lists ≈ 1% — the layout
    // the index is FOR)
    val oneQ = queries.limit(1).cache(); oneQ.count()
    serve("fixed nlist=16", fixedPath, oneQ, "batch=1")
    serve("auto ~sqrt(n)", autoPath, oneQ, "batch=1")
    spark.stop()
  }
}
