package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** D2's deploy flow (writeMinhashTable / minhashFromTable /
  * incrementalMinhash / appendToMinhashTable) under the
  * BucketedJoinSpec criteria: the candidate self-join over the
  * materialized bucket table runs with ZERO exchange on the bucket
  * key, the star collapse is rebuilt LOSSLESSLY from the `_hot`
  * member rows, incremental batches equal the full recompute's cross
  * slice, and appends are replay-idempotent static partition
  * overwrites. */
class MinhashTableSpec extends SparkSpec {
  import spark.implicits._

  // the DedupSpec mega-bucket corpus: 40 byte-identical boilerplate
  // docs (one 40-member bucket in EVERY band), one true near-dup pair,
  // one singleton
  private def corpus = ((1L to 40L).map(i =>
    (i, "identical boilerplate text repeated wholesale across the corpus")) ++ Seq(
    (100L, "a distinct sentence about spark dataframes and shuffle plans"),
    (101L, "a distinct sentence about spark dataframes and shuffle plans"),
    (102L, "completely unrelated prose concerning weather stations and rainfall")
  )).toDF("doc_id", "text")

  test("materialized bucket table: same pairs as minhashLsh, no exchange on the bucket key") {
    val wh = Files.createTempDirectory("graft_mh").toString
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 200)
    Dedup.writeMinhashTable(docs, "mh_b", s"$wh/mh_b", buckets = 8,
      maxBucket = Long.MaxValue)

    val fromTable = Dedup.minhashFromTable(spark, "mh_b")
    val plan = fromTable.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning\\(([a-z_#0-9]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(!exchanges.exists(_.startsWith("bucket")),
      s"bucket key should be co-located by bucketing, got exchanges on: $exchanges")

    val a = fromTable.orderBy("doc_a", "doc_b").collect().toSeq.map(_.toSeq)
    val b = Dedup.minhashLsh(docs, maxBucket = Long.MaxValue)
      .orderBy("doc_a", "doc_b").collect().toSeq.map(_.toSeq)
    assert(a === b)

    spark.sql("DROP TABLE IF EXISTS mh_b")
  }

  test("capped table: main respects the bound, stars rebuilt losslessly from _hot members") {
    val wh = Files.createTempDirectory("graft_mh_cap").toString
    Dedup.writeMinhashTable(corpus, "mh_c", s"$wh/mh_c", buckets = 4,
      maxBucket = 10)

    // the main table itself respects the per-bucket bound; the hot
    // companion holds the mega-bucket's member rows
    val maxSz = spark.table("mh_c").groupBy("band", "bucket")
      .agg(count(lit(1)).as("sz")).agg(max(col("sz"))).as[Long].head()
    assert(maxSz <= 10L)
    assert(spark.table("mh_c_hot").count() > 0)

    // reading the table ≡ the in-memory capped flow, down to the star
    val a = Dedup.minhashFromTable(spark, "mh_c")
      .as[(Long, Long)].collect().toSet
    val b = Dedup.minhashLsh(corpus, maxBucket = 10)
      .as[(Long, Long)].collect().toSet
    assert(a === b)
    assert(a === ((2L to 40L).map(i => (1L, i)).toSet + ((100L, 101L))))

    // an UNCAPPED rebuild must drop the stale _hot companion (the
    // writeSignatureTable rationale: a caller still passing it would
    // hub-attach batches against a collapse the corpus side no longer
    // applies) — explicit MaxValue: the DEFAULT cap (1024, matching
    // minhashLsh) takes the capped branch and keeps a (possibly empty)
    // companion
    Dedup.writeMinhashTable(corpus, "mh_c", s"$wh/mh_c", buckets = 4,
      maxBucket = Long.MaxValue)
    assert(!spark.catalog.tableExists("mh_c_hot"),
      "stale _hot companion survived an uncapped rebuild")

    spark.sql("DROP TABLE IF EXISTS mh_c")
    spark.sql("DROP TABLE IF EXISTS mh_c_hot")
  }

  test("incremental batch equals the full recompute's cross slice; append replay-idempotent") {
    val wh = Files.createTempDirectory("graft_mh_inc").toString
    val batch = Seq(
      (200L, "identical boilerplate text repeated wholesale across the corpus"),
      (201L, "a distinct sentence about spark dataframes and shuffle plans"),
      (202L, "fresh unseen content about streaming watermarks and state")
    ).toDF("doc_id", "text")
    Dedup.writeMinhashTable(corpus, "mh_i", s"$wh/mh_i", buckets = 8,
      maxBucket = Long.MaxValue)

    val inc = Dedup.incrementalMinhash(spark, "mh_i", batch)
      .as[(Long, Long)].collect().toSet
    val fullCross = Dedup.minhashLsh(corpus.unionByName(batch),
        maxBucket = Long.MaxValue)
      .filter(col("doc_a") < 200 && col("doc_b") >= 200)
      .as[(Long, Long)].collect().toSet
    assert(inc === fullCross)
    assert((1L to 40L).forall(i => inc.contains((i, 200L))))
    assert(inc.contains((100L, 201L)) && inc.contains((101L, 201L)))

    // replay-idempotent append: same batch id REPLACES the partition
    Dedup.appendToMinhashTable(batch, "mh_i", 0)
    val n1 = spark.table("mh_i").count()
    Dedup.appendToMinhashTable(batch, "mh_i", 0)
    assert(spark.table("mh_i").count() === n1)

    // under crash-replay the batch's own rows are already in the
    // table: the exclusion reproduces the original pair set exactly
    val replay = Dedup.incrementalMinhash(spark, "mh_i", batch,
        excludeIngestBatch = Some(0L))
      .as[(Long, Long)].collect().toSet
    assert(replay === inc)

    // the NEXT increment sees the appended batch through the table
    val inc2 = Dedup.incrementalMinhash(spark, "mh_i",
        Seq((300L, "fresh unseen content about streaming watermarks and state"))
          .toDF("doc_id", "text"))
      .as[(Long, Long)].collect().toSet
    assert(inc2.contains((202L, 300L)))

    spark.sql("DROP TABLE IF EXISTS mh_i")
  }

  test("minhashBatch star-collapses a batch-local mega bucket (catch-up batch posture)") {
    val wh = Files.createTempDirectory("graft_mh_cb").toString
    Dedup.writeMinhashTable(corpus, "mh_cb", s"$wh/mh_cb", buckets = 4,
      maxBucket = 10)
    // a catch-up batch carries 21 copies of a NEW template the frozen
    // hot list has never seen: not frozen-hot, but batch-locally hot
    // at cap 5 — the within-batch join must star-collapse around the
    // min batch member instead of emitting C(21,2) pairs
    val batch = (500L to 520L).map(i =>
      (i, "a brand new template page never seen before in this corpus"))
      .toDF("doc_id", "text")
    val out = Dedup.minhashBatch(spark, "mh_cb", batch,
        Some("mh_cb_hot"), 0L, maxBucket = 5)
      .as[(Long, Long)].collect().toSet
    assert(out === (501L to 520L).map(i => (500L, i)).toSet)
    spark.sql("DROP TABLE IF EXISTS mh_cb")
    spark.sql("DROP TABLE IF EXISTS mh_cb_hot")
  }

  test("frozen hot bucket: a new arrival hub-attaches, appends divert to _hot") {
    val wh = Files.createTempDirectory("graft_mh_hub").toString
    Dedup.writeMinhashTable(corpus, "mh_h", s"$wh/mh_h", buckets = 4,
      maxBucket = 10)

    // a 41st boilerplate copy arrives: every one of its 8 band buckets
    // is frozen-hot, so it pairs with the hub (doc 1) ONLY — O(1)
    // output instead of 40 fresh pairs, connectivity preserved for D8
    val batch = Seq(
      (200L, "identical boilerplate text repeated wholesale across the corpus")
    ).toDF("doc_id", "text")
    val inc = Dedup.incrementalMinhash(spark, "mh_h", batch,
        hotTable = Some("mh_h_hot"))
      .as[(Long, Long)].collect().toSet
    assert(inc === Set((1L, 200L)))

    // the append diverts the hot rows to the member table: the main
    // table keeps its per-bucket bound and _hot grows by one row per
    // band
    val hotBefore = spark.table("mh_h_hot").count()
    Dedup.appendToMinhashTable(batch, "mh_h", 0, hotTable = Some("mh_h_hot"))
    val maxSz = spark.table("mh_h").groupBy("band", "bucket")
      .agg(count(lit(1)).as("sz")).agg(max(col("sz"))).as[Long].head()
    assert(maxSz <= 10L)
    assert(spark.table("mh_h_hot").count() === hotBefore + 8)

    spark.sql("DROP TABLE IF EXISTS mh_h")
    spark.sql("DROP TABLE IF EXISTS mh_h_hot")
  }
}
