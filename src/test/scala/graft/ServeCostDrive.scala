package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions.col

/** r17 measurement drive (guide §1 — measure BEFORE touching the
  * serve): where does one graph-index attach-serve batch spend its
  * wall? Per-stage seconds from the GraphStages brackets already in
  * the serve (qcollect / hop0 / expand / hop count) and per-rep
  * deterministic counters (jobs / tasks / exec_s) from BenchCounters,
  * over the EXACT ingest spelling — a 128-vector batch of fresh ids
  * served at the index k with beam 32, hops 6.
  *
  *   sbt "Test/runMain graft.ServeCostDrive [sfDir]"
  */
object ServeCostDrive {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      extra = Map("spark.sql.codegen.cache.maxEntries" -> "5000"))
    spark.sparkContext.setLogLevel("ERROR")
    val counters = new BenchCounters(spark.sparkContext)
    try {
      val emb = Tables.embeddings(spark, sf)
      val path = java.nio.file.Files.createTempDirectory("graft_scost").toString
      try {
        Similarity.writeGraphIndex(emb, s"$path/gidx", k = 5)
        // the ingest attach serve's query shape: fresh ids (not in the
        // graph — like arrivals), the bench ingest batch size
        val batch = emb.select(col("vec_id"), col("embedding"))
          .orderBy("vec_id").limit(128)
          .withColumn("vec_id", col("vec_id") + 3000000000L)
        def serveOnce(): Unit =
          Similarity.graphTopKFromIndex(spark, s"$path/gidx", batch, 5,
              beam = 32, hops = 6)
            .write.format("noop").mode("overwrite").save()
        serveOnce() // warmup (JIT/codegen/listing)
        val load0 = Bench.loadAvg().headOption.getOrElse(-1.0)
        for (rep <- 1 to 3) {
          val (wall, stages) = graft.operators.GraphStages.capture(
            counters.record(s"serve_$rep") {
              val t0 = System.nanoTime()
              serveOnce()
              (System.nanoTime() - t0) / 1e9
            })
          val snap = counters.all(s"serve_$rep")
          val stageJson = stages.toSeq.sortBy(_._1).map { case (k, v) =>
            Jsons.str(k) + ":" + Jsons.num(v, 3) }.mkString("{", ",", "}")
          println(s"""{"metric":"serve_cost","rep":$rep,""" +
            s""""wall_sec":${Jsons.num(wall, 3)},"stages":$stageJson,""" +
            s""""counters":${snap.json},""" +
            s""""load1m":${Jsons.num(load0, 2)}}""")
        }
      } finally {
        import org.apache.hadoop.fs.Path
        val hp = new Path(path)
        hp.getFileSystem(spark.sessionState.newHadoopConf())
          .delete(hp, true): Unit
      }
    } finally spark.stop()
  }
}
