package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** One-off tuning drive: recall@5 vs E1 for ANN parameter variants at
  * a given sf (`sbt "Test/runMain graft.AnnTuneDrive [sfDir]"`).
  * Informs the catalog's quantization parameters; not part of `test`.
  */
object AnnTuneDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
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
      println(f"$label%-52s recall@5 $r%.4f  (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }

    t("ivf nlist16 nprobe4 it5 (pre-r7)") {
      Similarity.ivfTopK(emb, isQ, 5) }
    t("ivf nlist16 nprobe4 it15") {
      Similarity.ivfTopK(emb, isQ, 5, trainIters = 15) }
    t("ivf nlist32 nprobe8 it5 (catalog r7)") {
      Similarity.ivfTopK(emb, isQ, 5, nlist = 32, nprobe = 8) }
    t("pq m8 ks16 rerank8 it5 (pre-r7)") {
      Similarity.pqTopK(emb, isQ, 5, ks = 16, rerank = 8) }
    t("pq m8 ks64 rerank8 it5") {
      Similarity.pqTopK(emb, isQ, 5, ks = 64) }
    t("pq m8 ks64 rerank16 it5 (catalog r7)") {
      Similarity.pqTopK(emb, isQ, 5, ks = 64, rerank = 16) }
    t("pq m8 ks256 rerank16 it5") {
      Similarity.pqTopK(emb, isQ, 5, ks = 256, rerank = 16) }
    t("ivfpq nl16 np4 m8 ks16 rr8 (pre-r7)") {
      Similarity.ivfpqTopK(emb, isQ, 5, ks = 16, rerank = 8) }
    t("ivfpq nl16 np4 m8 ks64 rr16 (catalog r7)") {
      Similarity.ivfpqTopK(emb, isQ, 5, ks = 64, rerank = 16) }
    t("ivfpq-resid nl16 np4 m8 ks16 rr8 (pre-r7)") {
      Similarity.ivfpqResidualTopK(emb, isQ, 5, ks = 16, rerank = 8) }
    t("ivfpq-resid nl16 np4 m8 ks64 rr16 (catalog r7)") {
      Similarity.ivfpqResidualTopK(emb, isQ, 5, ks = 64, rerank = 16) }
    t("ivfpq nl32 np8 m8 ks64 rr16") {
      Similarity.ivfpqTopK(emb, isQ, 5, nlist = 32, nprobe = 8, ks = 64, rerank = 16) }
    t("ivfpq-resid nl32 np8 m8 ks64 rr16") {
      Similarity.ivfpqResidualTopK(emb, isQ, 5, nlist = 32, nprobe = 8, ks = 64, rerank = 16) }
    spark.stop()
  }
}
