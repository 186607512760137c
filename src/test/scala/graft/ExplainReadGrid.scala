package graft

/** r16: dump the formatted plan of [[graft.sources.NetCdfClassic
  * .readGrid]] over a tiny synthetic run — the parse path is not a
  * catalog query, so the Explain main can't show it; this drive is
  * the plans/r16 evidence for the per-step-row + codegen-explode
  * rewrite (and runs one count so the plan actually executes).
  *
  *   sbt "Test/runMain graft.ExplainReadGrid"
  */
object ExplainReadGrid {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_explain_nc").toString
      Pipeline.generateSyntheticRun(dir, ny = 4, nx = 6, nt = 8)
      val paths = Option(new java.io.File(dir).list()).getOrElse(Array.empty)
        .filter(_.endsWith(".nc")).sorted.map(n => s"$dir/$n").toSeq
      val df = graft.sources.NetCdfClassic.readGrid(spark, paths)
      df.explain("formatted")
      println(s"rows=${df.count()}")
    } finally spark.stop()
  }
}
