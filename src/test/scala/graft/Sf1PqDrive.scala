package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** One-off r8 drive: chase the sf1 stretch-verify finding that plain
  * PQ/IVFPQ recall@5 collapses to 0.44 on the clustered sf1 corpus
  * (10 Gaussian clusters × 2k vectors — thousands of near neighbors
  * per query, where the isotropic-calibrated rerank=16 shortlist is
  * too thin for the ADC ordering noise). Sweeps the rerank budget and
  * the residual flavor at the catalog's quantization params to find
  * the cheapest config that restores the floors at sf1 WITHOUT moving
  * the sf0.01 gate numbers.
  *
  *   sbt "Test/runMain graft.Sf1PqDrive /root/repo/target/sf1"
  */
object Sf1PqDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf1")
    val spark = Sessions.local("16")
    val emb = Tables.embeddings(spark, sfDir)
    val isQ = SparkEntry.annIsQuery

    def recall(approx: DataFrame, exact: DataFrame): Double = {
      val e = exact.select(col("q_id"), col("n_id"))
      val a = approx.select(col("q_id"), col("n_id")).distinct()
      val nE = e.count()
      val hit = a.join(e, Seq("q_id", "n_id")).count()
      hit.toDouble / nE
    }

    val exact = Similarity.bruteForceTopK(emb, isQ, 5).cache()
    exact.count()

    def t(label: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = recall(f, exact)
      println(f"$label%-48s recall@5 $r%.4f  (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }

    for (rr <- Seq(16, 32, 64, 128))
      t(s"pq m8 ks64 rerank$rr") {
        Similarity.pqTopK(emb, isQ, 5, rerank = rr) }
    for (rr <- Seq(16, 64))
      t(s"ivfpq nlist32 nprobe8 rerank$rr") {
        Similarity.ivfpqTopK(emb, isQ, 5, nlist = 32, nprobe = 8, rerank = rr) }
    for (rr <- Seq(16, 64))
      t(s"ivfpq-residual nlist32 nprobe8 rerank$rr") {
        Similarity.ivfpqResidualTopK(emb, isQ, 5, nlist = 32, nprobe = 8,
          rerank = rr) }

    spark.stop()
  }
}
