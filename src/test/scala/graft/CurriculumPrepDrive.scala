package graft

import org.apache.spark.sql.functions._

/** One-off measurement drive (r13): the F31 curriculum wiring in the
  * PREP JOB itself — the same artifact run landed twice, hash-shuffle
  * vs curriculum order, so the schedule's landing cost is a measured
  * number (the PipelineLayoutDrive posture), and the landed shard
  * order is re-checked against F31 over the job's own CLEAN corpus.
  *
  *   sbt "Test/runMain graft.CurriculumPrepDrive [docsDir]"
  */
object CurriculumPrepDrive {
  def main(args: Array[String]): Unit = {
    val docsDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val outA = java.nio.file.Files.createTempDirectory("graft_cprep_hash").toString
      val outB = java.nio.file.Files.createTempDirectory("graft_cprep_curr").toString
      val a = CorpusPrepJob.run(spark, docsDir, outA)
      val b = CorpusPrepJob.run(spark, docsDir, outB, curriculumStages = 4)
      println(f"[cprep] hash-order shards: ${a.shardSec}%.2f s, " +
        f"curriculum shards: ${b.shardSec}%.2f s " +
        f"(rows ${b.shards.rows}, files ${b.shards.files})")
      // the landed order IS F31 over the job's own clean corpus: the
      // shards' (doc_id, pos) must equal curriculum() on exactly the
      // surviving docs (text payload rides in the shard files)
      val landed = spark.read.parquet(s"$outB/shards")
        .select(col("doc_id"), col("pos"))
      val clean = spark.read.parquet(s"$outB/shards")
        .select(col("doc_id"), col("text"))
      val sched = graft.operators.Corpus.curriculum(clean, nStages = 4)
        .select(col("doc_id"), col("pos").as("want"))
      val diff = landed.join(sched, Seq("doc_id"))
        .filter(col("pos") =!= col("want")).count()
      val n = landed.count()
      println(s"[cprep] order check: $diff of $n landed positions " +
        "disagree with F31 over the clean corpus (expect 0)")
      require(diff == 0L, "curriculum landing order mismatch")
    } finally spark.stop()
  }
}
