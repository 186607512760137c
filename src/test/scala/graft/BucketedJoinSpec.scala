package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Demonstrates the SURVEY §4 bucketing claim: two tables bucketed on
  * the join key join WITHOUT a shuffle — the physical plan has no
  * Exchange above either scan. This is the co-location strategy for
  * repeated big-big joins at 100 TB (bucket once at write time, every
  * subsequent join on that key is shuffle-free). */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero exchanges; unbucketed join shuffles") {
    // external tables via explicit path (warehouse.dir is static conf)
    val wh = Files.createTempDirectory("graft_wh").toString
    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)

    orders.write.format("parquet").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").option("path", s"$wh/orders_b")
      .mode("overwrite").saveAsTable("orders_b")
    lineitem.write.format("parquet").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").option("path", s"$wh/lineitem_b")
      .mode("overwrite").saveAsTable("lineitem_b")

    // hint("merge") pins SortMergeJoin on both variants: otherwise the
    // small test tables get broadcast and both plans trivially lack a
    // key exchange, proving nothing
    val bucketed = spark.table("orders_b").hint("merge")
      .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").agg(sum("l_quantity").as("qty"))
    val plan = bucketed.queryExecution.executedPlan.toString

    // the JOIN itself is exchange-free: the only Exchange in the plan
    // is the aggregation's (on o_orderpriority), never on the join key
    val exchanges = "Exchange hashpartitioning\\(([a-z_]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(!exchanges.exists(c => c.startsWith("o_orderkey") || c.startsWith("l_orderkey")),
      s"join key should not be shuffled, got exchanges on: $exchanges\n$plan")

    // same join on the raw (unbucketed) tables DOES shuffle the key
    val raw = orders.hint("merge")
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").agg(sum("l_quantity").as("qty"))
    val rawPlan = raw.queryExecution.executedPlan.toString
    val rawHasKeyExchange = "Exchange hashpartitioning\\(([a-z_]+)".r
      .findAllMatchIn(rawPlan).exists(m =>
        m.group(1).startsWith("o_orderkey") || m.group(1).startsWith("l_orderkey"))
    assert(rawHasKeyExchange, "control: unbucketed join should shuffle the key")

    // and results agree
    val a = bucketed.orderBy("o_orderpriority").collect().toSeq.map(_.toSeq)
    val b = raw.orderBy("o_orderpriority").collect().toSeq.map(_.toSeq)
    assert(a === b)

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }

  test("materialized signature table: same Jaccard pairs, no exchange on the gram key") {
    import graft.operators.Dedup
    val wh = Files.createTempDirectory("graft_sig").toString
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 200)
    Dedup.writeSignatureTable(docs, "grams_b", s"$wh/grams_b", buckets = 8)

    val fromTable = Dedup.ngramJaccardFromTable(spark, "grams_b", 0.2)
    val plan = fromTable.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning\\(([a-z_#0-9]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(!exchanges.exists(_.startsWith("gh")),
      s"gram key should be co-located by bucketing, got exchanges on: $exchanges")

    // identical pair set and Jaccard values vs the in-memory flow
    val a = fromTable.orderBy("doc_a", "doc_b").collect().toSeq.map(_.toSeq)
    val b = Dedup.ngramJaccard(docs, 0.2)
      .orderBy("doc_a", "doc_b").collect().toSeq.map(_.toSeq)
    assert(a === b)

    // incremental flow: a new batch vs the materialized corpus equals
    // the full recompute restricted to (corpus, new) cross pairs
    // tau low enough that shared-shingle pairs straddle the batch
    // boundary in this slice (exact near-dup plants may not)
    val all = Tables.documents(spark, sfDir).filter(col("doc_id") < 260)
    val newBatch = all.filter(col("doc_id") >= 200)
    val inc = Dedup.incrementalJaccard(spark, "grams_b", newBatch, 0.02)
      .orderBy("doc_a", "doc_b").collect().toSeq.map(_.toSeq)
    val fullCross = Dedup.ngramJaccard(all, 0.02)
      .filter(col("doc_a") < 200 && col("doc_b") >= 200)
      .orderBy("doc_a", "doc_b").collect().toSeq.map(_.toSeq)
    assert(inc === fullCross)
    assert(inc.nonEmpty, "expected at least one cross-batch candidate at tau=0.02")

    spark.sql("DROP TABLE IF EXISTS grams_b")
  }

  test("capped signature table: born df-capped, increments capped symmetrically") {
    import graft.operators.Dedup
    val wh = Files.createTempDirectory("graft_sig_cap").toString
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 200)
    Dedup.writeSignatureTable(docs, "grams_c", s"$wh/grams_c",
      buckets = 8, maxDf = 3)

    // the table itself respects the cap (no gram key above df=3), and
    // the hot side table holds exactly the dropped hashes
    val tableMaxDf = spark.table("grams_c").groupBy("gh")
      .agg(count(lit(1)).as("df")).agg(max(col("df"))).as[Long].head()
    assert(tableMaxDf <= 3L)
    val hotCount = spark.table("grams_c_hot").count()
    assert(hotCount > 0, "cap should have dropped at least one gram in this slice")

    // reading the capped table ≡ the in-memory capped flow
    val a = Dedup.ngramJaccardFromTable(spark, "grams_c", 0.2)
      .orderBy("doc_a", "doc_b").collect().toSeq.map(_.toSeq)
    val b = Dedup.ngramJaccard(docs, 0.2, maxDf = 3)
      .orderBy("doc_a", "doc_b").collect().toSeq.map(_.toSeq)
    assert(a === b)

    // incremental batch with the hot table ≡ an independent
    // reimplementation over the SAME frozen gram subspace (the cap is
    // a write-time contract: the stored hot list governs later
    // batches, not a df recomputed over corpus+batch)
    val all = Tables.documents(spark, sfDir).filter(col("doc_id") < 260)
    val newBatch = all.filter(col("doc_id") >= 200)
    val inc = Dedup.incrementalJaccard(spark, "grams_c", newBatch, 0.02,
      hotTable = Some("grams_c_hot"))
      .orderBy("doc_a", "doc_b").collect().toSeq.map(_.toSeq)
    import graft.functions.TextFunctions.tokens
    graft.functions.VecExprs.register(spark)
    val gAll = all
      .select(col("doc_id"),
        explode(call_function("graft_grams3h", tokens(col("text")))).as("gh"))
      .join(spark.table("grams_c_hot"), Seq("gh"), "left_anti")
    val sizes = gAll.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val expected = gAll.as("a")
      .join(gAll.as("b"), col("a.gh") === col("b.gh") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .withColumn("jaccard", col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= 0.02)
      .filter(col("doc_a") < 200 && col("doc_b") >= 200)
      .select("doc_a", "doc_b", "inter", "n_a", "n_b", "jaccard")
      .orderBy("doc_a", "doc_b").collect().toSeq.map(_.toSeq)
    assert(inc === expected)

    // an UNCAPPED rebuild of the same table must drop the stale _hot
    // companion — a caller still passing it would silently cap
    // batches against a list the corpus side no longer applies
    Dedup.writeSignatureTable(docs, "grams_c", s"$wh/grams_c", buckets = 8)
    assert(!spark.catalog.tableExists("grams_c_hot"),
      "stale _hot companion survived an uncapped rebuild")

    spark.sql("DROP TABLE IF EXISTS grams_c")
    spark.sql("DROP TABLE IF EXISTS grams_c_hot")
  }
}
