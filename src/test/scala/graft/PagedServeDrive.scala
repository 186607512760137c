package graft
import org.apache.spark.sql.functions._

/** r16: isolated A/B harness for the PAGED graph serve — the bench's
  * own `idx_graph_serve_paged` spelling (400 queries, pageSize=200,
  * maxPages=8 over the sf index), build untimed, one warmup serve,
  * then timed reps. Run on the before/after trees to attribute the
  * concurrent-pages change without a full bench.
  *
  *   sbt "Test/runMain graft.PagedServeDrive [sfDir]"
  */
object PagedServeDrive {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      extra = Map("spark.sql.codegen.cache.maxEntries" -> "5000"))
    spark.sparkContext.setLogLevel("ERROR")
    val S = graft.operators.Similarity
    val emb = Tables.embeddings(spark, sf)
    val p = java.nio.file.Files.createTempDirectory("graft_psd").toString
    try {
      S.writeGraphIndex(emb, s"$p/gidx", k = 5)
      val pagedQ = emb.select(col("vec_id"), col("embedding"))
        .orderBy("vec_id").limit(400)
      def serve() = S.graphTopKFromIndexPaged(spark, s"$p/gidx", pagedQ, 5,
        pageSize = 200, maxPages = 8)
      serve().write.format("noop").mode("overwrite").save() // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        serve().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val load = Bench.loadAvg().headOption.getOrElse(-1.0)
      println(s"""{"metric":"paged_serve","median":${
        Jsons.num(Bench.median(ts), 3)},"reps":${
        ts.map(Jsons.num(_, 3)).mkString("[", ",", "]")},"load1m":${
        Jsons.num(load, 2)},"sf":"$sf"}""")
    } finally {
      import org.apache.hadoop.fs.Path
      val hp = new Path(p)
      hp.getFileSystem(spark.sessionState.newHadoopConf())
        .delete(hp, true): Unit
      spark.stop()
    }
  }
}
