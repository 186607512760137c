package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** One-off scale drive: wall + recall@5 of the FIXED catalog ANN
  * configs vs the auto-sized ones (`planes = 0` / `nlist = 0`) at a
  * large sf (`sbt "Test/runMain graft.AutoSizeDrive [sfDir]"`,
  * default the generated sf1 set). Companion evidence for the r8 sf1
  * scaling table: fixed depth/list-count is the super-linear term;
  * auto-sizing is the production configuration. Not part of `test`.
  */
object AutoSizeDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = Sessions.local("32")
    val emb = Tables.embeddings(spark, sfDir)
    val isQ = SparkEntry.annIsQuery

    def recall(approx: DataFrame, exact: DataFrame): Double = {
      val e = exact.select(col("q_id"), col("n_id"))
      val a = approx.select(col("q_id"), col("n_id")).distinct()
      val hit = a.join(e, Seq("q_id", "n_id")).count()
      hit.toDouble / e.count()
    }

    val t0e = System.nanoTime()
    val exact = Similarity.bruteForceTopK(emb, isQ, 5).cache()
    val nTruth = exact.count()
    println(f"exact baseline: $nTruth rows (${(System.nanoTime() - t0e) / 1e9}%.1f s)")

    def t(label: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val df = f
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val r = recall(f, exact)
      println(f"$label%-44s wall $wall%6.2f s  recall@5 $r%.4f")
    }

    t("lsh  planes=4 t8 probes=0   (catalog fixed)") {
      Similarity.lshTopK(emb, isQ, 5) }
    t("lsh  planes=auto(occ64) probes=0") {
      Similarity.lshTopK(emb, isQ, 5, planes = 0) }
    t("lsh  planes=4 t8 probes=2   (catalog fixed)") {
      Similarity.lshTopK(emb, isQ, 5, probes = 2) }
    t("lsh  planes=auto(occ64) probes=2") {
      Similarity.lshTopK(emb, isQ, 5, planes = 0, probes = 2) }
    t("lsh  planes=auto(occ64) probes=3") {
      Similarity.lshTopK(emb, isQ, 5, planes = 0, probes = 3) }
    t("ivf  nlist=32 nprobe=8      (catalog fixed)") {
      Similarity.ivfTopK(emb, isQ, 5, nlist = 32, nprobe = 8) }
    t("ivf  nlist=auto(sqrt n) nprobe=8") {
      Similarity.ivfTopK(emb, isQ, 5, nlist = 0, nprobe = 8) }
    t("ivf  nlist=auto(sqrt n) nprobe=16") {
      Similarity.ivfTopK(emb, isQ, 5, nlist = 0, nprobe = 16) }
    spark.stop()
  }
}
