package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** One-off (r10): the E12c on-disk filtered layout's read-volume win,
  * measured — "the predicate PRUNES partitions instead of
  * post-filtering rows". Builds the label-bucketed index over a
  * clustered 50k-vector / 16-tenant corpus, serves a single-tenant
  * query batch, and compares rows READ from the index against the
  * unfiltered serve at the SAME widened probe count from an identical
  * unbucketed index. Expectation: ~1/B of the rows at equal probing
  * (B = 16 label buckets, one tenant per bucket here), same recall
  * contract. `sbt "Test/runMain graft.FilteredServeDrive [n]"` */
object FilteredServeDrive {

  private final class ReadStats extends SparkListener {
    val records = new java.util.concurrent.atomic.AtomicLong()
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) records.addAndGet(m.inputMetrics.recordsRead)
    }
    def reset(): Unit = records.set(0L)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val spark = Sessions.local("32")
    import spark.implicits._
    val rnd = new scala.util.Random(421)
    val dim = 16; val nCenters = 256; val nLabels = 16
    val centers = Array.fill(nCenters, dim)(rnd.nextGaussian())
    val dir = java.nio.file.Files.createTempDirectory("graft_fsd_emb").toString
    (0 until n).map { i =>
      val c = rnd.nextInt(nCenters)
      (i.toLong, Array.tabulate(dim)(d =>
        (centers(c)(d) + 0.15 * rnd.nextGaussian()).toFloat), i % nLabels)
    }.toDF("vec_id", "embedding", "label")
      .repartition(32).write.mode("overwrite").parquet(dir)
    val emb = spark.read.parquet(dir)

    val flt = java.nio.file.Files.createTempDirectory("graft_fsd_flt").toString
    val pln = java.nio.file.Files.createTempDirectory("graft_fsd_pln").toString
    Similarity.writeIvfIndex(emb, flt, nlist = 0, labelBuckets = nLabels)
    Similarity.writeIvfIndex(emb, pln, nlist = 0)

    // one tenant's query batch (100 queries, label 3)
    val queries = emb.filter(col("label") === 3 && col("vec_id") % 31 === 0)
      .limit(100).select("vec_id", "embedding", "label").cache()
    val nQ = queries.count()

    val stats = new ReadStats
    spark.sparkContext.addSparkListener(stats)
    def measure(tag: String)(run: () => org.apache.spark.sql.DataFrame)
        : (Long, Double, Long) = {
      // warm once for JIT, then measure
      run().write.format("noop").mode("overwrite").save()
      stats.reset()
      val t0 = System.nanoTime()
      run().write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val recs = stats.records.get()
      println(f"filtered_serve[$tag] rows_read=$recs wall=$secs%.2f s")
      (recs, secs, nQ)
    }

    // the filtered serve widens nprobe 4 by the frozen n_labels = 16
    // to probeN = 64; give the unfiltered serve the SAME 64 probes so
    // the comparison isolates the lbl pruning
    val (rf, wf, _) = measure("labelBucketed")(() =>
      Similarity.filteredTopKFromIndex(spark, flt, queries, 5, nprobe = 4))
    val (ru, wu, _) = measure("plain_same_probe")(() =>
      Similarity.ivfTopKFromIndex(spark, pln,
        queries.select("vec_id", "embedding"), 5, nprobe = 64))
    println(f"filtered_serve[ratio] rows ${ru.toDouble / rf}%.1fx fewer " +
      f"read by the bucketed layout (wall ${wu / wf}%.2fx)")
    spark.stop()
  }
}
