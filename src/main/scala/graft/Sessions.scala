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
      // reuse cpus as the partition count only when it IS a count —
      // "*" is a legal local[...] master spec but would blow up far
      // away in SQLConf validation as a partition number
      .config("spark.sql.shuffle.partitions",
        Option(shufflePartitions).getOrElse(
          if (cpus.matches("[0-9]+")) cpus else "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
