package graft

import org.apache.spark.sql.functions._

/** Measurement harness behind PERF.md's series-landing table (r13,
  * VERDICT r12 #5 — the z-order layout wired into its consumer):
  * the reference-scale pipeline run (2 systems × 240 steps × ny×nx
  * cells) lands its series table via [[Pipeline.landSeries]]
  * (z-ordered on lat/lon/ts), a time-sorted linear landing is the
  * strawman (the natural append order a naive landing has), and the
  * three STANDING consumer reads — a basin bbox over all time, a
  * recent time window over all space, and the bbox × window rfield
  * slice ([[Pipeline.seriesWindow]]) — report files holding matching
  * rows under each layout. */
object PipelineLayoutDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val (ny, nx, nt) = (args.lift(0).map(_.toInt).getOrElse(100),
      args.lift(1).map(_.toInt).getOrElse(100),
      args.lift(2).map(_.toInt).getOrElse(240))
    val files = args.lift(3).map(_.toInt).getOrElse(64)
    val dir = java.nio.file.Files.createTempDirectory("graft_pland").toString
    Pipeline.generateSyntheticRun(dir, ny = ny, nx = nx, nt = nt)
    val cfg = PipelineConfig(ncDir = dir, outDir = s"$dir/out",
      landSeries = true, landSeriesFiles = files)
    val res = Pipeline.run(spark, cfg)
    val z = spark.read.parquet(s"$dir/out/series")
    // the strawman: identical rows, time-sorted landing, same file count
    z.repartitionByRange(files, col("ts_us"))
      .sortWithinPartitions("ts_us").write.parquet(s"$dir/out/series_lin")
    val lin = spark.read.parquet(s"$dir/out/series_lin")
    def hit(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    // consumer shapes: a 10×10-cell basin corner, the last 24 steps
    val t0 = 1577836800L
    val bbox = col("lat_u").between(5000000L, 5000000L + 30000L * 9) &&
      col("lon_u").between(79000000L, 79000000L + 30000L * 9)
    val window = col("ts_us") >= (t0 + 900L * (nt - 24)) * 1000000L
    println(s"[pland] files=$files rows=${res.seriesRows} " +
      s"z_files=${z.inputFiles.length} lin_files=${lin.inputFiles.length}")
    for ((name, p) <- Seq(("bbox_10x10", bbox), ("last_24_steps", window),
        ("bbox_x_window", bbox && window)))
      println(s"[pland] $name z=${hit(z.filter(p))} " +
        s"lin=${hit(lin.filter(p))}")
  }
}
