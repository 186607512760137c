package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Timeseries
import graft.sinks.{JdbcUpsert, RfieldSink}
import graft.sources.{NetCdfClassic, NetCdfClassicWriter}

/** End-to-end demo of the reference pipeline on graft — everything
  * `wrf_data_pusher.py` + `gen_rfields.py` do per forecast run, as one
  * Spark job:
  *
  *   netCDF grids → per-interval rainfall → LK-time series keyed by
  *   registered station + deterministic tms id → upsert statements +
  *   per-timestep rfield files + fgt watermark.
  *
  *   sbt "runMain graft.Pipeline <ncDir> <outDir>"
  *
  * With no args, generates a synthetic 2-system WRF run (via
  * [[NetCdfClassicWriter]]) into a temp dir first, then processes it —
  * a self-contained smoke of source → operators → sinks.
  */
object Pipeline {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), shufflePartitions = "8")

    val (ncDir, outDir) = args match {
      case Array(a, b) => (a, b)
      case Array(ny, nx, nt) => // synthetic run at a given grid size
        val d = java.nio.file.Files.createTempDirectory("graft_pipeline")
        (generateSyntheticRun(d.toString, ny.toInt, nx.toInt, nt.toInt), s"$d/out")
      case _ =>
        val d = java.nio.file.Files.createTempDirectory("graft_pipeline")
        (generateSyntheticRun(d.toString), s"$d/out")
    }
    val t0 = System.nanoTime()
    run(spark, ncDir, outDir)
    println(f"PIPELINE wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }

  /** Two WRF systems × nt steps × ny×nx grid of cumulative rainfall
    * (defaults sized for a quick smoke; 100×100×240 ≈ the reference's
    * real d03 grid per run). */
  def generateSyntheticRun(dir: String, ny: Int = 4, nx: Int = 6,
                           nt: Int = 25): String = {
    val lats = Array.tabulate(ny)(i => 5.0f + 0.03f * i)
    val lons = Array.tabulate(nx)(i => 79.0f + 0.03f * i)
    val times = Array.tabulate(nt)(t => 15.0f * t)
    for (sys <- Seq("A", "C")) {
      val base = if (sys == "A") 1.0f else 2.0f
      val cell = ny * nx
      val values = Array.tabulate(nt * cell) { i =>
        val t = i / cell; base * t * ((i % cell) % 5)  // cumulative, per-cell slope
      }
      NetCdfClassicWriter.writeWrfGrid(s"$dir/d03_RAINNC_$sys.nc",
        lats, lons, times, "2020-01-01 00:00:00", "RAINNC", values)
    }
    dir
  }

  def run(spark: SparkSession, ncDir: String, outDir: String): Unit = {
    val paths = new java.io.File(ncDir).listFiles()
      .filter(_.getName.endsWith(".nc")).map(_.toString).toSeq
    require(paths.nonEmpty, s"no .nc files in $ncDir")

    // 1. read all systems' grids (system tag from the file name)
    val grid = NetCdfClassic.readGrid(spark, paths)
      .withColumn("system", regexp_extract(col("path"), "RAINNC_([A-Z]+)", 1))

    // 2. cumulative → per-interval (A1), per (system, cell) series
    val keyed = grid.withColumn("cell",
      concat_ws("_", col("system"),
        format_string("%.6f", col("lat")), format_string("%.6f", col("lon"))))
    // cache(): four downstream actions (registry, series count, rfield
    // write, watermark) would otherwise each re-parse the netCDF files
    // and re-run the diff — materialize the post-diff table once, the
    // same checkpoint a production run would persist
    val rain = Timeseries.intervalDiff(
        keyed, "cell", "epoch_s", "t_idx", "value")
      .withColumn("ts_us", col("epoch_s") * lit(1000000L))
      .cache()

    // 3. station registry (A9) + deterministic tms id (A10) + LK time (A2)
    //    — derived from the CACHED rain table (grid columns ride along),
    //    not the raw grid, so no second netCDF parse
    val stations = Timeseries.stationRegistry(rain, Seq("lat", "lon"), "wrf")
    val series = Timeseries.tzShiftLk(rain, "ts_us")
      .withColumn("sim_tag", lit("evening_18:00"))
      .withColumn("source", concat(lit("wrf_"), col("system")))
      .withColumn("variable", lit("Precipitation"))
      .withColumn("unit", lit("mm"))
    val withId = Timeseries.tmsId(series,
      Seq("sim_tag", "cell", "source", "variable", "unit"))

    // 4. sinks: per-timestep rfield files (ensemble mean across systems
    //    per cell, gen_*_mean_rfields.py flavor) + DB upsert statement
    val rfield = rain
      .groupBy(col("epoch_s").as("t"), col("lon"), col("lat"))
      .agg(round(avg("delta"), 4).as("value"))

    val upsertSql = JdbcUpsert.MySqlDialect.sql("curw_fcst.data",
      Seq("id", "time", "fgt", "value"), Seq("id", "time"))

    // 5. fgt watermark per series (A11)
    val wm = Timeseries.fgtWatermark(withId, "tms_id", "ts_us")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PIPELINE stage $label%-12s ${(System.nanoTime() - t0) / 1e9}%6.1fs")
      r
    }
    timed("rfields")(RfieldSink.write(rfield, s"$outDir/rfields", "t"))
    val nStations = timed("stations")(stations.count())
    val nSeries = timed("series")(withId.count())
    val nWm = timed("watermarks")(wm.count())
    println(s"PIPELINE stations=$nStations series_rows=$nSeries watermarks=$nWm")
    println(s"PIPELINE upsert: $upsertSql")
    println(s"PIPELINE rfields at $outDir/rfields")
  }
}
