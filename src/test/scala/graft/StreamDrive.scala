package graft

// Forked-JVM drive of the streaming surface with a real `rate` source
// (sbt console's REPL classloader breaks Spark codegen on java.sql
// types, so the interactive drive runs here instead):
//   sbt "Test/runMain graft.StreamDrive"
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

object StreamDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rate = spark.readStream.format("rate").option("rowsPerSecond", "100").load()
    val ev = rate
      .withColumn("station", concat(lit("s"), (col("value") % 3).cast("string")))
      .withColumn("v", lit(1.0))
    val q = EventStream.windowedSums(ev, "timestamp", "station", "v",
        "10 seconds", "5 seconds")
      .writeStream.format("memory").queryName("drive_sums")
      .outputMode("complete").start()
    Thread.sleep(5000); q.processAllAvailable()
    val rows = spark.table("drive_sums").orderBy("station", "bucket_start")
    println(s"STREAM ROWS=${rows.count()}")
    rows.show(10, truncate = false)
    q.stop()

    // Stateful cumulative→incremental over a live rate source: value
    // increments globally, so per station (value % 3) the cumulative
    // stream is value itself and every delta must be exactly 3.
    import spark.implicits._
    import graft.streaming.EventStream.CumulReading
    val cum = spark.readStream.format("rate").option("rowsPerSecond", "50").load()
      .select(concat(lit("s"), (col("value") % 3).cast("string")).as("station"),
        col("timestamp").as("ts"), col("value").cast("double").as("value"),
        // the encoder wants every CumulReading field even with its
        // default; the rate source is strictly increasing per station
        // so the tie-break id can stay constant
        lit(0L).as("id"))
      .as[CumulReading]
    val q2 = EventStream.streamingIntervalDiff(cum)
      .writeStream.format("memory").queryName("drive_diffs")
      .outputMode("append").start()
    Thread.sleep(5000); q2.processAllAvailable()
    val d = spark.table("drive_diffs")
    println(s"DIFF ROWS=${d.count()} DISTINCT DELTAS=" +
      d.select("delta").distinct().collect().map(_.getDouble(0)).sorted.mkString(","))
    q2.stop()

    // Dedup: two identical rate sources unioned = every event arrives
    // twice; the watermarked dedup must emit each (station, ts, value)
    // exactly once.
    def rateEvents() = spark.readStream.format("rate")
      .option("rowsPerSecond", "20").load()
      .select(concat(lit("s"), (col("value") % 2).cast("string")).as("station"),
        col("timestamp").as("ts"), col("value"))
    val doubled = rateEvents().union(rateEvents())
    val q3 = EventStream.dedupStream(doubled, "ts", Seq("station", "value"))
      .writeStream.format("memory").queryName("drive_dedup")
      .outputMode("append").start()
    Thread.sleep(5000); q3.processAllAvailable()
    val dd = spark.table("drive_dedup")
    val total = dd.count()
    val distinctRows = dd.distinct().count()
    println(s"DEDUP ROWS=$total DISTINCT=$distinctRows " +
      (if (total == distinctRows) "NO-DUPES" else "DUPES-LEAKED"))
    q3.stop(); spark.stop()
  }
}
