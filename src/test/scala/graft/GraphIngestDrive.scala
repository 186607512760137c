package graft

import graft.operators.Similarity

/** r15: the graph-ingest CORPUS-SIZE-INDEPENDENCE drive — the ingest
  * dual of GraphServeDrive's serve-flatness measurement. A
  * streamingGraphIngest batch pays (a) one frozen-graph beam serve
  * (pruned point lookups, O(frontier·deg) rows per hop), (b) an exact
  * within-batch kNN (batch² — batch-sized), (c) two dynamic-overwrite
  * partitioned writes and a commit record (batch-sized). None of
  * those scales with the committed corpus, so the two-batch drain
  * time should be ~FLAT from 2k to 20k vectors — this drive measures
  * that claim with the bench's OWN ingest harness
  * ([[Bench.benchGraphIngest]] — same MemoryStream drain, same
  * warmup discipline), so the number is the bench line's number, not
  * a re-spelling.
  *
  * Usage: sbt "Test/runMain graft.GraphIngestDrive [sf1Dir]"
  */
object GraphIngestDrive {
  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      extra = Map("spark.sql.codegen.cache.maxEntries" -> "5000"))
    spark.sparkContext.setLogLevel("ERROR")
    try {
      for ((name, dir) <- Seq("sf0.1" -> "/root/testdata/sf0.1",
                              "sf1" -> sf1)) {
        val emb = Tables.embeddings(spark, dir)
        val n = emb.count()
        val path = java.nio.file.Files
          .createTempDirectory("graft_gingest").toString
        try {
          Similarity.writeGraphIndex(emb, s"$path/gidx", k = 5)
          // load sampled BEFORE AND AFTER the multi-minute reps (r15
          // review: a single pre-run sample cannot attribute a
          // mid-run burst — the exact blindness the bench's own
          // start/mid/end sampling exists to prevent)
          val load0 = Bench.loadAvg().headOption.getOrElse(-1.0)
          // per-stage capture (r15 verdict #3): the drive runs the
          // bench's OWN harness under GraphStages, so the table is an
          // attribution of the bench line's cost, not a re-spelling.
          // 4 reps × 2 batches = 8 batches feed the capture; stages
          // print as per-batch seconds (serve_* nest inside ing_serve
          // — two levels, each internally non-overlapping)
          val (t, stages) = graft.operators.GraphStages.capture(
            Bench.benchGraphIngest(spark, s"$path/gidx", emb, reps = 3))
          val load1 = Bench.loadAvg().headOption.getOrElse(-1.0)
          val nBatches = 8.0
          // `_n`-suffixed entries are counts (avg per batch), the
          // rest are seconds per batch
          val stageJson = stages.toSeq.sortBy(_._1).map { case (k, v) =>
            Jsons.str(k) + ":" + Jsons.num(v / nBatches, 3)
          }.mkString("{", ",", "}")
          println(s"""{"metric":"graph_ingest_scale","corpus":"$name",""" +
            s""""n_vectors":$n,"two_batch_median_sec":${
              t.fold("null")(v => Jsons.num(v._1, 3))},""" +
            s""""reps_sec":${t.fold("null")(_._2.map(Jsons.num(_, 3))
              .mkString("[", ",", "]"))},""" +
            s""""per_batch_stage_sec":$stageJson,""" +
            s""""load1m_start":${Jsons.num(load0, 2)},""" +
            s""""load1m_end":${Jsons.num(load1, 2)}}""")
        } finally {
          import org.apache.hadoop.fs.Path
          val hp = new Path(path)
          hp.getFileSystem(spark.sessionState.newHadoopConf())
            .delete(hp, true): Unit
        }
      }
    } finally spark.stop()
  }
}
