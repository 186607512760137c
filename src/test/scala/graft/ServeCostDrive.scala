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
      extra = Map("spark.sql.codegen.cache.maxEntries" -> "5000") ++
        sys.env.get("SPARK_GRAFT_LEAF_PAR")
          .map(v => Map("spark.sql.leafNodeDefaultParallelism" -> v))
          .getOrElse(Map.empty))
    spark.sparkContext.setLogLevel("ERROR")
    val counters = new BenchCounters(spark.sparkContext)
    // per-job breakdown: (jobId, total tasks, first stage name) — the
    // "where do 900 tasks per serve come from" attribution
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val nTasks = e.stageInfos.map(_.numTasks).sum
          val head = e.stageInfos.map(s => s"${s.numTasks}t:" +
            s.rddInfos.map(_.name).distinct.mkString("|")).mkString(" ; ")
          jobLog.add(s"job=${e.jobId} tasks=$nTasks stages=${e.stageInfos.size} $head"): Unit
        }
      })
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
        jobLog.clear()
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
          if (rep == 1) {
            import scala.jdk.CollectionConverters._
            jobLog.asScala.foreach(l => println(s"[jobs] $l"))
          }
          jobLog.clear()
        }
        // ---- diagnostic: one hop's plan, initial + post-AQE ----
        // replicates the expand frame through the SAME pruned-scan
        // helper the serve uses (graphPointScan) so the join
        // strategies and exchange count are the serve's own
        if (args.length > 1 && args(1) == "explain") {
          import spark.implicits._
          import graft.functions.VectorFunctions.{dot, cosineFromParts}
          import org.apache.spark.sql.functions.{broadcast, round}
          val meta = spark.read.parquet(s"$path/gidx/meta").head()
          val buckets = meta.getAs[Int]("p_buckets")
          val p = Similarity.prepared(emb.withColumn("label",
            org.apache.spark.sql.functions.lit(null).cast("string")))
          val qRows = p.select(col("vec_id"), col("v"), col("n2")).limit(128)
            .as[(Long, Seq[Double], Double)].collect()
          val q = qRows.toSeq.toDF("q_id", "q_v", "q_n2")
          val nodes = spark.read.parquet(s"$path/gidx/adj")
            .select(col("src")).distinct().limit(2000).as[Long].collect()
          val frontier = qRows.take(64).flatMap(r =>
            nodes.take(64).map(n => (r._1, n))).toSeq
          val known = qRows.take(64).flatMap(r =>
            nodes.slice(64, 160).map(n => (r._1, n))).toSeq
          val f = frontier.toDF("q_id", "node")
          val cand0 = Similarity.graphPointScan(spark, s"$path/gidx", "adj",
              "src", "pb", buckets, frontier.map(_._2).distinct, None)
            .join(broadcast(f), col("src") === col("node"))
            .select(col("q_id"), col("dst").as("n_id"),
              col("dst_v"), col("dst_n2"))
          val cand = cand0.join(broadcast(known.toDF("q_id", "n_id")),
            Seq("q_id", "n_id"), "left_anti")
          val scored = cand.join(broadcast(q), Seq("q_id"))
            .filter(col("n_id") =!= col("q_id"))
            .select(col("q_id"), col("n_id"),
              round(cosineFromParts(dot(col("q_v"), col("dst_v")),
                col("q_n2"), col("dst_n2")), 6).as("cos_sim"))
            .dropDuplicates("q_id", "n_id")
            .limit(1 << 20)
          println("==== initial plan ====")
          scored.explain("formatted")
          val qe = scored.queryExecution
          qe.toRdd.count(): Unit
          println("==== executed (final AQE) plan ====")
          println(qe.executedPlan.toString)
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
