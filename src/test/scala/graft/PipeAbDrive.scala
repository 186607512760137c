package graft

/** r16: warm isolated A/B harness for the headline pipeline — one
  * synthetic reference-scale run (100×100×240×2 systems), one warmup
  * `Pipeline.run`, then timed reps with per-stage medians (the
  * bench's benchPipeline methodology, runnable per tree without a
  * full bench).
  *
  *   sbt "Test/runMain graft.PipeAbDrive"
  */
object PipeAbDrive {
  def main(args: Array[String]): Unit = {
    val reps = sys.env.get("SPARK_GRAFT_TIME_REPS")
      .flatMap(_.toIntOption).getOrElse(3).max(1)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      extra = Map("spark.sql.codegen.cache.maxEntries" -> "5000"))
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graft_pipe_ab").toString
    try {
      Pipeline.generateSyntheticRun(dir, ny = 100, nx = 100, nt = 240)
      Pipeline.run(spark, dir, s"$dir/out_w"): Unit // warmup
      val runs = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        val r = Pipeline.run(spark, dir, s"$dir/out_$i")
        ((System.nanoTime() - t0) / 1e9, r.stageSeconds)
      }
      val stageKeys = runs.flatMap(_._2.keys).distinct.sorted
      val stages = stageKeys.map(k =>
        Jsons.str(k) + ":" +
          Jsons.num(Bench.median(runs.flatMap(_._2.get(k))), 3))
        .mkString("{", ",", "}")
      val load = Bench.loadAvg().headOption.getOrElse(-1.0)
      println(s"""{"metric":"pipe_ab","e2e_median":${
        Jsons.num(Bench.median(runs.map(_._1)), 3)},"reps":${
        runs.map(r => Jsons.num(r._1, 3)).mkString("[", ",", "]")},""" +
        s""""stages":$stages,"load1m":${Jsons.num(load, 2)}}""")
    } finally {
      import org.apache.hadoop.fs.Path
      val hp = new Path(dir)
      hp.getFileSystem(spark.sessionState.newHadoopConf())
        .delete(hp, true): Unit
      spark.stop()
    }
  }
}
