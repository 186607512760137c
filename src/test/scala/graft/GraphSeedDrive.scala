package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** r16: the graph-serve ENTRY-POINT scaling measurement (r15 verdict
  * #4). The frozen min-id entry makes the serve diameter-bound: every
  * query walks from one fixed node, so the hops needed for recall to
  * saturate grow with the corpus. [[Similarity.graphTopKFromIndexSeeded]]
  * seeds each query's hop-0 frontier from the coexisting IVF index
  * (nearest-centroid list members) instead. This drive measures
  * recall-vs-hops for BOTH entry strategies at sf0.1 and at the 10×
  * sf1 corpus, against exact brute force over the same query page —
  * the PERF.md table's source. The claim it gates: seeded recall at
  * few hops ≥ the frozen entry's recall at MORE hops, and the gap
  * widens with corpus size.
  *
  * Usage: sbt "Test/runMain graft.GraphSeedDrive [sf1Dir]"
  * (regenerate /tmp/graft_sf1 first: Test/runMain graft.Sf1GenDrive)
  */
object GraphSeedDrive {
  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      extra = Map("spark.sql.codegen.cache.maxEntries" -> "5000"))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    try {
      for ((name, dir) <- Seq("sf0.1" -> "/root/testdata/sf0.1",
                              "sf1" -> sf1)) {
        val emb = Tables.embeddings(spark, dir)
        val n = emb.count()
        // bounded deterministic query page, in-corpus (self excluded
        // by the serve's n_id =!= q_id), same spelling at both scales
        val isQ = col("vec_id") < 256
        val queries = emb.filter(isQ).select("vec_id", "embedding")
        val path = java.nio.file.Files
          .createTempDirectory("graft_gseed").toString
        try {
          Similarity.writeGraphIndex(emb, s"$path/gidx", k = 5)
          Similarity.writeIvfIndex(emb, s"$path/ivf", nlist = 0)
          val brute = Similarity.bruteForceTopK(emb, isQ, 5)
            .select("q_id", "n_id").as[(Long, Long)].collect().toSet
          val load0 = Bench.loadAvg().headOption.getOrElse(-1.0)
          for (hops <- Seq(1, 2, 3, 4, 6)) {
            def run(seeded: Boolean): (Double, Double) = {
              val t0 = System.nanoTime()
              val got = (if (seeded)
                Similarity.graphTopKFromIndexSeeded(spark, s"$path/gidx",
                  s"$path/ivf", queries, 5, hops = hops)
              else
                Similarity.graphTopKFromIndex(spark, s"$path/gidx",
                  queries, 5, hops = hops))
                .select("q_id", "n_id").as[(Long, Long)].collect().toSet
              ((got & brute).size.toDouble / brute.size,
                (System.nanoTime() - t0) / 1e9)
            }
            val (rF, tF) = run(seeded = false)
            val (rS, tS) = run(seeded = true)
            println(s"""{"metric":"graph_seed_recall","corpus":"$name",""" +
              s""""n_vectors":$n,"hops":$hops,""" +
              s""""recall_frozen":${Jsons.num(rF, 4)},""" +
              s""""recall_seeded":${Jsons.num(rS, 4)},""" +
              s""""sec_frozen":${Jsons.num(tF, 2)},""" +
              s""""sec_seeded":${Jsons.num(tS, 2)},""" +
              s""""load1m":${Jsons.num(
                Bench.loadAvg().headOption.getOrElse(-1.0), 2)},""" +
              s""""load1m_start":${Jsons.num(load0, 2)}}""")
          }
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
