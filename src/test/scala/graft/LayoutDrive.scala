package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Measurement harness behind PERF.md's z-order table: files holding
  * matching rows for ts-only / user-only / rectangle predicates under
  * the z layout vs a user-sorted linear layout, sf0.1, 64 files. */
object LayoutDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val files = args.lift(1).map(_.toInt).getOrElse(64)
    val e = Tables.events(spark, sf)
    val ev = e.select(col("event_id"), col("user_id"),
      Tables.eventTsUs(e).as("ts_us"), col("event_type"), col("value"))
    val base = java.nio.file.Files.createTempDirectory("graft_zdrive").toString
    Layout.writeZordered(ev, s"$base/z", "user_id", "ts_us", files)
    ev.repartitionByRange(files, col("user_id"))
      .sortWithinPartitions("user_id").write.parquet(s"$base/lin")
    val z = spark.read.parquet(s"$base/z")
    val lin = spark.read.parquet(s"$base/lin")
    def hit(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    val (uLo, uHi) = (40, 59)
    val day = col("ts_us") >= 1704067200000000L &&
      col("ts_us") < 1704153600000000L
    val user = col("user_id").between(uLo, uHi)
    println(s"[layout] files=$files rows=${ev.count()}")
    for ((name, p) <- Seq(("ts_day1", day), ("user_40_59", user),
        ("rect", day && user)))
      println(s"[layout] $name z=${hit(z.filter(p))} " +
        s"lin=${hit(lin.filter(p))}")
  }
}
