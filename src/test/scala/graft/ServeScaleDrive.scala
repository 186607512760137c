package graft

import graft.operators.Similarity

/** One-off: on-disk IVF serve cost, fixed nlist=16 vs auto ~√n, at a
  * given sf (`sbt "Test/runMain graft.ServeScaleDrive [sfDir]"`).
  * Builds both index layouts (untimed), serves the catalog queries
  * three times each, prints the medians. Not part of `test`. */
object ServeScaleDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = Sessions.local("32")
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(SparkEntry.annIsQuery).select("vec_id", "embedding")
    def build(nlist: Int): String = {
      val p = java.nio.file.Files.createTempDirectory("graft_srv").toString
      Similarity.writeIvfIndex(emb, p, nlist = nlist)
      p
    }
    val fixedPath = build(16); val autoPath = build(0)
    def serve(path: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        Similarity.ivfTopKFromIndex(spark, path, queries, 5, nprobe = 4)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      (1 to 3).map(_ => once()).sorted.apply(1)
    }
    println(f"fixed nlist=16: ${serve(fixedPath)}%.2f s   auto ~sqrt(n): ${serve(autoPath)}%.2f s")
    spark.stop()
  }
}
