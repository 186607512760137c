package graft
import org.apache.spark.sql.functions._
object GraphServeDrive {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val S = graft.operators.Similarity
    val emb = Tables.embeddings(spark, sf)
    val p = java.nio.file.Files.createTempDirectory("graft_gsd").toString
    S.writeGraphIndex(emb, s"$p/gidx", k = 5)
    val q = emb.filter(SparkEntry.annIsQuery).select("vec_id", "embedding")
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val n = S.graphTopKFromIndex(spark, s"$p/gidx", q, 5).count()
      println(f"[gsd] rep$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // FIXED 40-query page — the corpus-size-independence number: at
    // 10× the corpus the full-page wall above grows with the PAGE
    // (10× the queries), while this one isolates the per-hop read
    val q40 = q.orderBy("vec_id").limit(40)
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val n = S.graphTopKFromIndex(spark, s"$p/gidx", q40, 5).count()
      println(f"[gsd] fixed40 rep$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
