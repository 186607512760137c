package graft

import org.apache.spark.sql.SparkSession

/** Shared local-session builder for the runnable mains (Verify, Bench,
  * Explain, Pipeline) — one place for the configs every entry point
  * needs instead of four copies. */
object Sessions {
  def local(cpus: String, shufflePartitions: String = null,
            extra: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        Option(shufflePartitions).getOrElse(cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
