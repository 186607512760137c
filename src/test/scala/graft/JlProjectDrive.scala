package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** E7b validation drive (the ClusteredAnnDrive rationale applied to
  * the JL path): on the ISOTROPIC verify corpus the projected
  * shortlist recall is capped by the absence of real neighbor
  * structure — neighbors are barely above the bulk, and a 4×
  * compression erases the margin. This drive measures the same serve
  * on a mixture-of-Gaussians corpus at the RAW dim (64), sweeping
  * outDim × overfetch, to pin where the deploy flavor operates:
  * clustered corpora with true near neighbors. Results → PERF.md.
  *
  *   sbt "Test/runMain graft.JlProjectDrive [nVecs] [nCenters]"
  */
object JlProjectDrive {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val nCenters = args.drop(1).headOption.map(_.toInt).getOrElse(256)
    val dim = 64
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"),
      shufflePartitions = "32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rnd = new scala.util.Random(422)
    val centers = Array.fill(nCenters, dim)(rnd.nextGaussian())
    val dir = java.nio.file.Files.createTempDirectory("graft_jl").toString
    (0 until n).map { i =>
      val c = rnd.nextInt(nCenters)
      val v = Array.tabulate(dim)(d =>
        (centers(c)(d) + 0.15 * rnd.nextGaussian()).toFloat)
      (i.toLong, v, 0)
    }.toDF("vec_id", "embedding", "label")
      .repartition(32).write.mode("overwrite").parquet(s"$dir/emb")
    val emb = spark.read.parquet(s"$dir/emb")
    val isQ = pmod(col("vec_id"), lit(math.max(1, n / 100))) === 0

    def recall(approx: DataFrame, exact: DataFrame): Double = {
      val e = exact.select(col("q_id"), col("n_id"))
      approx.select(col("q_id"), col("n_id")).distinct()
        .join(e, Seq("q_id", "n_id")).count().toDouble / e.count()
    }
    val exact = Similarity.bruteForceTopK(emb, isQ, 5).cache()
    println(s"[jl] n=$n centers=$nCenters dim=$dim " +
      s"queries=${exact.select("q_id").distinct().count()}")
    val tExact = {
      val t0 = System.nanoTime()
      Similarity.bruteForceTopK(emb, isQ, 5).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[jl] full-dim brute force          wall $tExact%.1f s (baseline)")
    for (outDim <- Seq(4, 16); over <- Seq(4, 20)) {
      val t0 = System.nanoTime()
      val r = recall(
        Similarity.projectedTopK(emb, isQ, 5, outDim = outDim,
          inDim = dim, overfetch = over), exact)
      println(f"[jl] project $dim->$outDim%-3d overfetch=$over%-3d " +
        f"recall@5 $r%.4f  wall ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
