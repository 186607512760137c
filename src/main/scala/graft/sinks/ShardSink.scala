package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Corpus

/** Training-shard writer — the OUTPUT contract of a prep pipeline:
  * the cleaned corpus lands on disk as `shard=<k>/` directories, one
  * ORDERED file per shard, row counts balanced to ±1, such that
  * reading the shards round-robin reconstructs one deterministic
  * global shuffle order (the layout every large-scale trainer
  * consumes — fixed-count numbered shards, e.g. the webdataset/
  * Megatron-style sharded corpus, so the data-loader can assign
  * shard k to worker k%W without coordination).
  *
  * Composition, not new machinery: [[graft.operators.Corpus.globalShuffle]]
  * (F17) already assigns each doc its global position `pos` and
  * `shard = pos % nShards` via the engine-portable md5 coin — this
  * sink attaches the payload columns, routes each shard's rows to ONE
  * task (hash repartition on the shard value), sorts within the task
  * by `pos`, and writes `partitionBy(shard)` parquet: exactly one
  * data file per shard directory, ascending `pos` inside the file.
  *
  * Scale posture: one corpus-sized equi-join (payload ⋈ assignment on
  * doc_id) + one exchange on the shard id. A shard is one task's
  * write, so `nShards` SETS the write parallelism — at 100 TB you
  * size nShards by target shard bytes (corpus/1 GB ≈ 10^5 shards),
  * which also keeps any one task's slice bounded; the balanced ±1
  * row guarantee comes from round-robin position assignment, not
  * sampling, so no shard can run hot. The report is an O(nShards)
  * driver-side aggregate — bounded metadata, the accounting artifact
  * an orchestrator gates on before handing shards to training. */
object ShardSink {

  /** Per-write accounting: `rows` is the total written, `byShard` the
    * per-shard row counts (size nShards, balanced to ±1), `files` the
    * data-file count on disk (== nShards when the invariant holds). */
  final case class ShardReport(nShards: Int, rows: Long,
                               byShard: Map[Long, Long], files: Long) {
    def minRows: Long = if (byShard.isEmpty) 0L else byShard.values.min
    def maxRows: Long = if (byShard.isEmpty) 0L else byShard.values.max
  }

  /** Write `docs` as `nShards` balanced ordered shards under `path`.
    * `payload` names the columns to carry (doc_id always rides).
    *
    * `curriculumStages > 0` swaps the F17 hash order for the F31
    * CURRICULUM order ([[graft.operators.Corpus.curriculum]]): global
    * positions run easy→hard by quality band (md5-mixed within each
    * band), and since shard = pos % nShards stays round-robin, the
    * balance-±1 guarantee is untouched and a data-loader reading the
    * shards round-robin reconstructs the curriculum schedule exactly
    * — the training order is a LANDED property of the shards, not a
    * loader-side re-sort of 100 TB. */
  def writeShards(docs: DataFrame, path: String, nShards: Int = 8,
                  payload: Seq[String] = Seq("text"),
                  curriculumStages: Int = 0): ShardReport = {
    require(nShards > 0, s"nShards=$nShards must be positive")
    val spark = docs.sparkSession
    val assign =
      if (curriculumStages > 0)
        Corpus.curriculum(docs, curriculumStages)
          .select(col("doc_id"), col("pos"), (col("pos") % nShards).as("shard"))
      else Corpus.globalShuffle(docs, nShards)
    docs.select(col("doc_id") +: payload.map(col): _*)
      .join(assign, Seq("doc_id"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    // O(nShards) accounting read-back — the gate artifact; also the
    // file-count invariant (one data file per shard directory)
    // partition-dir values read back type-inferred (int) — pin long
    val counts = spark.read.parquet(path)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(p, true)
    var files = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.startsWith("part-")) files += 1
    }
    ShardReport(nShards, counts.values.sum, counts, files)
  }
}
