package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** One-off (r10): NN-Descent convergence curve for E10b — edge
  * recall vs the exact graph per refinement round, at the two verify
  * sfs (isotropic corpora — the hard regime for neighbor-of-neighbor
  * locality) and optionally on the clustered synthetic corpus (the
  * deploy regime the builder exists for).
  * `sbt "Test/runMain graft.NnDescentDrive [maxRefine]"` */
object NnDescentDrive {
  def main(args: Array[String]): Unit = {
    val maxRefine = args.headOption.map(_.toInt).getOrElse(3)
    val spark = Sessions.local("16")
    import spark.implicits._
    def recallOf(emb: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val exact = Similarity.knnGraph(emb, 5)
        .select("q_id", "n_id").as[(Long, Long)].collect().toSet
      (0 to maxRefine).foreach { r =>
        val t0 = System.nanoTime()
        val got = Similarity.knnGraphAnn(emb, 5, refine = r)
          .select("q_id", "n_id").as[(Long, Long)].collect().toSet
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"nn_descent[$tag] refine=$r recall=${
          exact.intersect(got).size.toDouble / exact.size}%.4f wall=$secs%.1f s")
        Similarity.releaseCaches()
      }
    }
    recallOf(Tables.embeddings(spark, "/root/testdata/sf0.001"), "sf0.001")
    recallOf(Tables.embeddings(spark, "/root/testdata/sf0.01"), "sf0.01")
    // clustered corpus (ClusteredAnnDrive's mixture-of-Gaussians)
    val rnd = new scala.util.Random(421)
    val dim = 16; val nCenters = 64
    val centers = Array.fill(nCenters, dim)(rnd.nextGaussian())
    val clustered = (0 until 5000).map { i =>
      val c = rnd.nextInt(nCenters)
      (i.toLong, Array.tabulate(dim)(d =>
        (centers(c)(d) + 0.15 * rnd.nextGaussian()).toFloat), c)
    }.toDF("vec_id", "embedding", "label")
    recallOf(clustered, "clustered5k")
    spark.stop()
  }
}
