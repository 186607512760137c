package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** One-off validation drive (r7 verdict ask #3): the ivf/ivfpq recall
  * ceiling (~0.62 at the verify sfs) is LIST-PROBING loss on an
  * isotropic synthetic corpus — the regime where no coarse quantizer
  * can help. This drive builds the regime the indexes are designed
  * for — a mixture-of-Gaussians corpus (every vector = one of
  * `centers` cluster centers + small noise, the clustered shape of
  * real embedding spaces) — and measures IVF / IVFPQ / residual-IVFPQ
  * recall@5 vs brute force at production-ish nlist, sweeping nprobe,
  * plus residual-vs-plain at fixed budget. Results → PERF.md; catalog
  * defaults retuned there if residual wins.
  *
  *   sbt "Test/runMain graft.ClusteredAnnDrive [nVecs] [nCenters]"
  */
object ClusteredAnnDrive {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val nCenters = args.drop(1).headOption.map(_.toInt).getOrElse(256)
    val dim = 16
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"),
      shufflePartitions = "32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // driver-side MoG generation (deterministic seed): centers are
    // standard gaussians; cluster noise std 0.15 ≪ the ~√dim center
    // spacing, so lists are TIGHT — the residual-PQ regime
    val rnd = new scala.util.Random(421)
    val centers = Array.fill(nCenters, dim)(rnd.nextGaussian())
    val dir = java.nio.file.Files.createTempDirectory("graft_mog").toString
    (0 until n).map { i =>
      val c = rnd.nextInt(nCenters)
      val v = Array.tabulate(dim)(d =>
        (centers(c)(d) + 0.15 * rnd.nextGaussian()).toFloat)
      (i.toLong, v, s"c$c")
    }.toDF("vec_id", "embedding", "label")
      .repartition(32).write.mode("overwrite").parquet(s"$dir/emb")
    val emb = spark.read.parquet(s"$dir/emb")
    val isQ = pmod(col("vec_id"), lit(math.max(1, n / 100))) === 0 // ~100 queries

    def recall(approx: DataFrame, exact: DataFrame): Double = {
      val e = exact.select(col("q_id"), col("n_id"))
      val a = approx.select(col("q_id"), col("n_id")).distinct()
      a.join(e, Seq("q_id", "n_id")).count().toDouble / e.count()
    }
    val exact = Similarity.bruteForceTopK(emb, isQ, 5).cache()
    println(s"[mog] n=$n centers=$nCenters queries=${exact.select("q_id").distinct().count()}")

    def t(label: String)(f: => DataFrame): Unit = {
      Similarity.releaseCaches()
      val t0 = System.nanoTime()
      val r = recall(f, exact)
      println(f"[mog] $label%-44s recall@5 $r%.4f  (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }

    for (nlist <- Seq(64, 256); nprobe <- Seq(4, 16, 32)) {
      t(s"ivf    nlist$nlist nprobe$nprobe") {
        Similarity.ivfTopK(emb, isQ, 5, nlist = nlist, nprobe = nprobe) }
      t(s"ivfpq  nlist$nlist nprobe$nprobe ks64 rr16") {
        Similarity.ivfpqTopK(emb, isQ, 5, nlist = nlist, nprobe = nprobe,
          ks = 64, rerank = 16) }
      t(s"resid  nlist$nlist nprobe$nprobe ks64 rr16") {
        Similarity.ivfpqResidualTopK(emb, isQ, 5, nlist = nlist,
          nprobe = nprobe, ks = 64, rerank = 16) }
    }
    // residual-vs-plain at a REDUCED rerank budget (shortlist = k·rr):
    // ADC ordering quality is where residual codes should earn their
    // keep — rr=1 is pure ADC ranking, no exact-rerank safety net
    for (rr <- Seq(1, 4)) {
      t(s"ivfpq  nlist256 nprobe16 ks64 rr$rr") {
        Similarity.ivfpqTopK(emb, isQ, 5, nlist = 256, nprobe = 16,
          ks = 64, rerank = rr) }
      t(s"resid  nlist256 nprobe16 ks64 rr$rr") {
        Similarity.ivfpqResidualTopK(emb, isQ, 5, nlist = 256,
          nprobe = 16, ks = 64, rerank = rr) }
    }

    val hp = new org.apache.hadoop.fs.Path(dir)
    hp.getFileSystem(spark.sessionState.newHadoopConf()).delete(hp, true)
    spark.stop()
  }
}
