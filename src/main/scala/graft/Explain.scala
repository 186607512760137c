package graft
import org.apache.spark.sql.SparkSession

/** Plan-inspection main: dumps the formatted physical plan of every
  * SparkEntry query (or the ones named as args) — the review loop for
  * pushdown / broadcast / shuffle hygiene documented in PERF.md.
  *
  *   sbt "runMain graft.Explain [query ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Sessions.local("4")
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted else args.toSeq
    try wanted.foreach { name =>
      println(s"\n===== $name =====")
      SparkEntry.queries.get(name) match {
        // per-query catch (the Bench.runAll posture): one query's
        // analysis failure must not hide every later plan
        case Some(fn) =>
          try fn(spark, sfDir).explain("formatted")
          catch { case scala.util.control.NonFatal(e) =>
            println(s"FAILED to plan: ${e.getMessage}") }
        case None => println(s"unknown query '$name' — available: " +
          SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      }
    } finally spark.stop()
  }
}
