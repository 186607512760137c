package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TextAnalysis}

/** The no-concurrent-maintenance contract (r11 ADVICE medium): a
  * compaction holds a lock sentinel the appends check, heal refuses
  * the poison state where deleting `_old` would lose data, and the
  * BM25 meta delta is the append's commit record — a crash-orphaned
  * partial append is invisible to serves and discarded (not
  * resurrected) by compaction. */
class IndexMaintenanceSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sfDir)
    .filter(expr("aggregate(embedding, 0D, (a, x) -> a + x*x) > 0"))
  private def docs = Tables.documents(spark, sfDir)
  private val terms = Seq("spark", "window", "merge", "dup")

  private def fs(path: String) = new Path(path)
    .getFileSystem(spark.sessionState.newHadoopConf())

  test("IVF: appends refuse while the maintenance lock is held; compactions refuse a held lock") {
    val path = java.nio.file.Files.createTempDirectory("graft_imx_lock").toString
    Similarity.writeIvfIndex(emb.filter(col("vec_id") < 300), path,
      nlist = 8, trainIters = 3)
    val f = fs(path)
    val lock = new Path(path, "_maintenance_lock")
    require(f.createNewFile(lock))
    val batch = emb.filter(col("vec_id") >= 300 && col("vec_id") < 320)
    val e = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndex(batch, path, ingestBatch = 0L)
    }
    assert(e.getMessage.contains("maintenance lock"), e.getMessage)
    // an empty sentinel (created out-of-band, like this spec's, or by
    // an older build) renders as metadata-less — the refusal still
    // tells the operator what it knows (r12 verdict #3)
    assert(e.getMessage.contains("no owner metadata"), e.getMessage)
    // nothing landed: the refused append left the index untouched
    assert(spark.read.parquet(s"$path/lists")
      .filter(col("ingest_batch") =!= -1L).isEmpty)
    // a compaction finding the lock held (a crashed or concurrent
    // owner) also dies loudly instead of double-swapping
    val c = intercept[IllegalArgumentException] {
      Similarity.compactIvfIndex(spark, path)
    }
    assert(c.getMessage.contains("already held"), c.getMessage)
    f.delete(lock, false)
    // lock released: the same append goes through
    Similarity.appendToIvfIndex(batch, path, ingestBatch = 0L)
    assert(!spark.read.parquet(s"$path/lists")
      .filter(col("ingest_batch") === 0L).isEmpty)
    // a successful compaction releases its own lock on the way out
    Similarity.compactIvfIndex(spark, path)
    assert(!f.exists(lock))
    Similarity.appendToIvfIndex(batch, path, ingestBatch = 1L)
  }

  test("IVF heal: refuses the live+old+tmp poison state and preserves _old; clears the completed-swap tail") {
    val path = java.nio.file.Files.createTempDirectory("graft_imx_heal").toString
    Similarity.writeIvfIndex(emb.filter(col("vec_id") < 300), path,
      nlist = 8, trainIters = 3)
    val f = fs(path)
    def p(s: String) = new Path(s"$path/$s")
    val lists = spark.read.parquet(s"$path/lists")
    val nRows = lists.count() // materialized NOW — compaction rewrites the files
    // poison state: a writer recreated lists/ mid-swap — old holds
    // segments live does not, tmp is the unswapped compacted copy
    lists.write.partitionBy("c_id", "ingest_batch").parquet(s"$path/lists_old")
    lists.write.partitionBy("c_id", "ingest_batch")
      .parquet(s"$path/lists_compacting")
    val e = intercept[RuntimeException] {
      Similarity.compactIvfIndex(spark, path)
    }
    assert(e.getMessage.contains("refusing to heal"), e.getMessage)
    assert(f.exists(p("lists_old")),
      "_old was deleted in the poison state — permanent data loss")
    // the failed compaction KEEPS the lock: the index needs operator
    // attention, and a released lock would let appends write into the
    // half-recovered state (r12 review)
    assert(f.exists(p("_maintenance_lock")))
    // ... and the kept lock carries WHO held it and SINCE WHEN, so the
    // operator who finds it can tell a crashed run from a live one
    // without out-of-band info (r12 verdict #3)
    val lockBody = {
      val in = f.open(p("_maintenance_lock"))
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    assert(lockBody.contains("owner=") && lockBody.contains("pid=") &&
      lockBody.contains("since_epoch_ms="), lockBody)
    val e2 = intercept[IllegalArgumentException] {
      Similarity.compactIvfIndex(spark, path)
    }
    assert(e2.getMessage.contains("already held"), e2.getMessage)
    // the refusal message renders the sentinel's owner metadata
    assert(e2.getMessage.contains("owner=") &&
      e2.getMessage.contains("since_epoch_ms="), e2.getMessage)
    // live + old WITHOUT tmp is still a refusal — it is
    // indistinguishable from an operator who deleted only the tmp dir
    // out of the poison state, where old is the ONLY copy (r12
    // review: the old delete branch was itself a loss path)
    require(f.delete(p("lists_compacting"), true))
    require(f.delete(p("_maintenance_lock"), false))
    val e3 = intercept[RuntimeException] {
      Similarity.compactIvfIndex(spark, path)
    }
    assert(e3.getMessage.contains("refusing to heal"), e3.getMessage)
    assert(f.exists(p("lists_old")))
    // the manual protocol: verify live, delete old + lock by hand —
    // then compaction proceeds
    require(f.delete(p("lists_old"), true))
    require(f.delete(p("_maintenance_lock"), false))
    Similarity.compactIvfIndex(spark, path)
    assert(!f.exists(p("lists_old")) && !f.exists(p("lists_compacting")))
    assert(!f.exists(p("_maintenance_lock")))
    assert(spark.read.parquet(s"$path/lists").count() === nRows)
  }

  test("IVF: the commit ledger makes appends atomic — a partial batch is serve-invisible, compaction discards it") {
    val path = java.nio.file.Files.createTempDirectory("graft_imx_ivfc").toString
    Similarity.writeIvfIndex(emb.filter(col("vec_id") < 300), path,
      nlist = 8, trainIters = 3)
    val queries = emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < 300)
      .select("vec_id", "embedding")
    def serve() = Similarity.ivfTopKFromIndex(spark, path, queries, 5,
      nprobe = 8).orderBy("q_id", "rank").collect().toSeq.map(_.toSeq)
    val baseline = serve()
    // a full append, then simulate the crash-before-commit by
    // removing the ledger row (the LAST-written artifact — any
    // earlier crash point leaves a subset of this state: some lists'
    // partitions written, others not)
    val batch = emb.filter(col("vec_id") >= 300 && col("vec_id") < 350)
    Similarity.appendToIvfIndex(batch, path, ingestBatch = 3L)
    require(fs(path).delete(new Path(s"$path/commits/ingest_batch=3"), true))
    // uncommitted: the batch's vectors exist under lists/ but must
    // not serve — a partial batch is a silent recall hole, visible
    // here as nondeterministic membership
    assert(serve() === baseline)
    // committed (replay re-lands the batch, ledger row last): visible
    Similarity.appendToIvfIndex(batch, path, ingestBatch = 3L)
    val withBatch = serve()
    assert(withBatch !== baseline)
    // a second uncommitted batch, then compaction: the committed
    // batch folds into -1, the orphan is discarded (not resurrected)
    Similarity.appendToIvfIndex(
      emb.filter(col("vec_id") >= 350 && col("vec_id") < 360), path,
      ingestBatch = 4L)
    require(fs(path).delete(new Path(s"$path/commits/ingest_batch=4"), true))
    Similarity.compactIvfIndex(spark, path)
    assert(spark.read.parquet(s"$path/lists")
      .select(col("ingest_batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq === Seq(-1L))
    // the ledger resets to EMPTY — never absent, which would flip the
    // index into pre-ledger legacy mode where a crashed append is
    // visible (r12 review)
    assert(fs(path).exists(new Path(s"$path/commits")) &&
      fs(path).listStatus(new Path(s"$path/commits")).isEmpty,
      "compaction folds every committed batch into -1 — empty ledger")
    assert(serve() === withBatch)
    // the discarded batch id is now safe to replay in full
    Similarity.appendToIvfIndex(
      emb.filter(col("vec_id") >= 350 && col("vec_id") < 360), path,
      ingestBatch = 4L)
    assert(spark.read.parquet(s"$path/lists")
      .filter(col("ingest_batch") === 4L).count() > 0)
  }

  test("IVF legacy indexes: no ledger means every batch serves; the first new append adopts them") {
    val path = java.nio.file.Files.createTempDirectory("graft_imx_leg").toString
    Similarity.writeIvfIndex(emb.filter(col("vec_id") < 300), path,
      nlist = 8, trainIters = 3)
    val queries = emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < 300)
      .select("vec_id", "embedding")
    def serve() = Similarity.ivfTopKFromIndex(spark, path, queries, 5,
      nprobe = 8).orderBy("q_id", "rank").collect().toSeq.map(_.toSeq)
    Similarity.appendToIvfIndex(
      emb.filter(col("vec_id") >= 300 && col("vec_id") < 350), path,
      ingestBatch = 0L)
    val withBatch = serve()
    // simulate a pre-ledger index: the upgrade must NOT drop batches
    // that were visible before the ledger existed (r12 review)
    require(fs(path).delete(new Path(s"$path/commits"), true))
    assert(serve() === withBatch, "legacy batches vanished from serves")
    // the next append back-fills markers for the legacy batches
    Similarity.appendToIvfIndex(
      emb.filter(col("vec_id") >= 350 && col("vec_id") < 360), path,
      ingestBatch = 1L)
    val ledgered = fs(path).listStatus(new Path(s"$path/commits"))
      .map(_.getPath.getName).sorted.toSeq
    assert(ledgered === Seq("ingest_batch=0", "ingest_batch=1"))
    assert(Similarity.ivfTopKFromIndex(spark, path, queries, 5, nprobe = 8)
      .count() === withBatch.size.toLong)
  }

  test("IVF ledger: a foreign marker name in the commits dir fails loud, naming the file") {
    val path = java.nio.file.Files.createTempDirectory("graft_imx_fmk").toString
    Similarity.writeIvfIndex(emb.filter(col("vec_id") < 300), path,
      nlist = 8, trainIters = 3)
    Similarity.appendToIvfIndex(
      emb.filter(col("vec_id") >= 300 && col("vec_id") < 320), path,
      ingestBatch = 0L)
    val queries = emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < 300)
      .select("vec_id", "embedding")
    def serve() = Similarity.ivfTopKFromIndex(spark, path, queries, 5,
      nprobe = 8).count()
    val n = serve()
    // tooling litter: a truncated/foreign marker must be a named
    // protocol diagnostic, not a bare NumberFormatException on every
    // serve (r12 ADVICE)
    require(fs(path).createNewFile(
      new Path(s"$path/commits/ingest_batch=3.tmp")))
    val e = intercept[RuntimeException] { serve() }
    assert(e.getMessage.contains("ingest_batch=3.tmp") &&
      e.getMessage.contains("foreign marker"), e.getMessage)
    // removing the stray file restores the serve unchanged
    require(fs(path).delete(new Path(s"$path/commits/ingest_batch=3.tmp"),
      false))
    assert(serve() === n)
  }

  test("BM25: meta is the commit record — a partial append is serve-invisible until replayed") {
    val p = java.nio.file.Files.createTempDirectory("graft_imx_bm25").toString
    val half = docs.filter(col("doc_id") % 2 === 0)
    TextAnalysis.writeBm25Stats(half, "imx_bm25", s"$p/bm25")
    val baseline = TextAnalysis.bm25TopKFromIndex(spark, "imx_bm25",
      terms, 20).orderBy("rank").collect().toSeq.map(_.toSeq)
    // a full append, then simulate the crash-before-commit by
    // removing the batch's meta segment (the LAST-written artifact —
    // any earlier crash point leaves a subset of this state)
    val batch = docs.filter(col("doc_id") % 4 === 1)
    TextAnalysis.appendToBm25Index(batch, "imx_bm25", ingestBatch = 5L)
    require(fs(p).delete(new Path(s"$p/bm25_meta_delta/ingest_batch=5"), true))
    // uncommitted: postings/df segments exist but must not fold —
    // folding them would skew every score by the missing df/n/t mass
    val partial = TextAnalysis.bm25TopKFromIndex(spark, "imx_bm25",
      terms, 20).orderBy("rank").collect().toSeq.map(_.toSeq)
    assert(partial === baseline)
    // the replay completes the batch (commit record lands last) and
    // the serve now equals a one-pass rebuild over base ∪ batch
    TextAnalysis.appendToBm25Index(batch, "imx_bm25", ingestBatch = 5L)
    val served = TextAnalysis.bm25TopKFromIndex(spark, "imx_bm25",
      terms, 20).orderBy("rank").collect().toSeq.map(_.toSeq)
    val full = TextAnalysis.bm25TopK(half.unionByName(batch), terms, 20)
      .orderBy("rank").collect().toSeq.map(_.toSeq)
    assert(served === full)
    assert(served !== baseline)
  }

  test("BM25 compaction: discards uncommitted segments, folds committed ones; appends refuse under its lock") {
    val p = java.nio.file.Files.createTempDirectory("graft_imx_bmc").toString
    val half = docs.filter(col("doc_id") % 2 === 0)
    TextAnalysis.writeBm25Stats(half, "imx_bmc", s"$p/bm25")
    val committed = docs.filter(col("doc_id") % 4 === 1)
    val orphan = docs.filter(col("doc_id") % 8 === 3)
    TextAnalysis.appendToBm25Index(committed, "imx_bmc", ingestBatch = 0L)
    TextAnalysis.appendToBm25Index(orphan, "imx_bmc", ingestBatch = 7L)
    require(fs(p).delete(new Path(s"$p/bm25_meta_delta/ingest_batch=7"), true))
    val expect = TextAnalysis.bm25TopK(half.unionByName(committed), terms, 20)
      .orderBy("rank").collect().toSeq.map(_.toSeq)
    TextAnalysis.compactBm25Index(spark, "imx_bmc")
    // batch 7's serve-invisible rows were NOT resurrected into -1
    assert(spark.read.parquet(s"$p/bm25_post_delta")
      .select(col("ingest_batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq === Seq(-1L))
    val afterCompact = TextAnalysis.bm25TopKFromIndex(spark, "imx_bmc",
      terms, 20).orderBy("rank").collect().toSeq.map(_.toSeq)
    assert(afterCompact === expect)
    // the discarded batch id is now safe to replay in full
    TextAnalysis.appendToBm25Index(orphan, "imx_bmc", ingestBatch = 7L)
    val replayed = TextAnalysis.bm25TopKFromIndex(spark, "imx_bmc",
      terms, 20).orderBy("rank").collect().toSeq.map(_.toSeq)
    val fullAll = TextAnalysis.bm25TopK(
        half.unionByName(committed).unionByName(orphan), terms, 20)
      .orderBy("rank").collect().toSeq.map(_.toSeq)
    assert(replayed === fullAll)
    // the lexical lock: an append mid-compaction dies loudly
    val lock = new Path(s"$p/bm25_post_delta_maintenance_lock")
    require(fs(p).createNewFile(lock))
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.appendToBm25Index(orphan, "imx_bmc", ingestBatch = 8L)
    }
    assert(e.getMessage.contains("maintenance lock"), e.getMessage)
    fs(p).delete(lock, false)
  }
}
