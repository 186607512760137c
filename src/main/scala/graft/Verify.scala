package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Rows-only queries (no oracle mirror) additionally carry a ROW FLOOR:
  * the DuckDB hash gate can't see them, so a regression that silently
  * empties one (a filter that drops everything, a join that stops
  * matching) would otherwise still read as green. Verify counts every
  * written result and exits non-zero when a rows-only query lands
  * below its floor — the hard signal the hash gate provides for the
  * oracle-able set. */
object Verify {

  /** Rows-only entries whose written output fell below the declared
    * floor ([[SparkEntry.rowFloors]], default 1 = non-empty), plus
    * rows-only entries that produced no output at all. Pure — the
    * spec drives it with synthetic counts. */
  def floorFailures(rowCounts: Map[String, Long]): Seq[String] =
    SparkEntry.queries.keysIterator
      .filterNot(SparkEntry.oracleSql.contains)
      .flatMap { name =>
        val floor = SparkEntry.rowFloors.getOrElse(name, 1L)
        rowCounts.get(name) match {
          case Some(n) if n < floor =>
            Some(s"$name: $n rows < floor $floor (rows-only regression)")
          case None => Some(s"$name: no output written")
          case _ => None
        }
      }.toSeq.sorted

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    new java.io.File(outDir).mkdirs()
    val counts = scala.collection.mutable.Map.empty[String, Long]
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        counts(name) = spark.read.parquet(s"$outDir/$name").count()
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // Jsons.str escapes backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${Jsons.str(k)}: ${Jsons.str(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val failures = floorFailures(counts.toMap)
    failures.foreach(f => System.err.println(s"[verify] FLOOR $f"))
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
