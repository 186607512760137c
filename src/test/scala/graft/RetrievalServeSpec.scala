package graft

import org.apache.spark.sql.functions._

import graft.operators.{Retrieval, Similarity, TextAnalysis}

/** The composed serve path's contract (VERDICT r9 ask #6): with
  * exhaustive probing, every frozen-artifact stage reproduces the
  * self-contained catalog entry it composes — the artifacts add a
  * storage layer, never a semantics change. */
class RetrievalServeSpec extends SparkSpec {

  private val terms = Seq("spark", "window", "merge", "dup")
  private def docs = Tables.documents(spark, sfDir)
  private def emb = Tables.embeddings(spark, sfDir)
  private def query = emb.filter(col("vec_id") === 0)
    .select("vec_id", "embedding")

  private lazy val servePath = {
    val p = java.nio.file.Files.createTempDirectory("graft_serve_spec").toString
    Retrieval.buildArtifacts(docs, emb, "serve_spec_bm25", p, nlist = 8)
    p
  }

  test("frozen-path stages ≡ the self-contained catalog entries (exhaustive probing)") {
    val p = servePath // force artifact build
    assert(p.nonEmpty)
    // lexical from frozen stats ≡ one-pass self-ranking
    val lexFrozen = TextAnalysis.bm25TopKAgainst(spark, "serve_spec_bm25",
      docs, terms, 20).orderBy("rank").collect().toSeq.map(_.toSeq)
    val lexSelf = TextAnalysis.bm25TopK(docs, terms, 20)
      .orderBy("rank").collect().toSeq.map(_.toSeq)
    assert(lexFrozen === lexSelf && lexFrozen.nonEmpty)
    // semantic from the written index at nprobe = nlist ≡ brute force
    val semIdx = Similarity.ivfTopKFromIndex(spark, s"$servePath/ivf",
        query, 20, nprobe = 8)
      .orderBy("rank").collect().toSeq.map(_.toSeq)
    val semExact = Similarity.bruteForceTopK(emb, col("vec_id") === 0, 20)
      .orderBy("rank").collect().toSeq.map(_.toSeq)
    assert(semIdx === semExact)
    // fused from the two frozen stages ≡ the retrieval_hybrid_rrf
    // catalog spelling (same corpus, same query)
    val fusedFrozen = TextAnalysis.rrfFuse(
        TextAnalysis.bm25TopKAgainst(spark, "serve_spec_bm25", docs, terms, 20)
          .select(col("doc_id"), col("rank")),
        Similarity.ivfTopKFromIndex(spark, s"$servePath/ivf", query, 20,
            nprobe = 8)
          .select(col("n_id").as("doc_id"), col("rank")))
      .orderBy("rank").collect().toSeq.map(_.toSeq)
    val fusedCatalog = SparkEntry.queries("retrieval_hybrid_rrf")(spark, sfDir)
      .orderBy("rank").collect().toSeq.map(_.toSeq)
    assert(fusedFrozen === fusedCatalog)
  }

  test("serve: kOut diversified rows, rank-1 = fused argmax, deterministic") {
    val cfg = Retrieval.ServeConfig(terms, nprobe = 8)
    val page = Retrieval.serve(spark, "serve_spec_bm25", servePath,
      docs, emb, query, cfg).collect()
    assert(page.length === cfg.kOut)
    assert(page.map(_.getAs[Long]("rank")).toSeq === (1L to cfg.kOut))
    assert(page.forall(_.getAs[Long]("q_id") === 0L))
    // the first greedy pick is pure relevance (S is empty): the
    // fused page's top rrf score, doc-id tie-break. The serve's MMR
    // candidate set is the WHOLE fused page (topK = kLex + kSem)
    val fused = TextAnalysis.rrfFuse(
      TextAnalysis.bm25TopK(docs, terms, 20).select(col("doc_id"), col("rank")),
      Similarity.bruteForceTopK(emb, col("vec_id") === 0, 20)
        .select(col("n_id").as("doc_id"), col("rank")),
      topK = cfg.kLex + cfg.kSem)
    val top = fused.orderBy(col("rrf_score").desc, col("doc_id")).head()
    assert(page.head.getAs[Long]("doc_id") === top.getAs[Long]("doc_id"))
    // picks are distinct docs from the fused page
    val pageDocs = page.map(_.getAs[Long]("doc_id")).toSet
    assert(pageDocs.size === cfg.kOut)
    val fusedDocs = fused.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(pageDocs.subsetOf(fusedDocs))
    // deterministic re-serve
    val again = Retrieval.serve(spark, "serve_spec_bm25", servePath,
      docs, emb, query, cfg).collect()
    assert(again.map(_.toSeq).toSeq === page.map(_.toSeq).toSeq)
  }

  test("streaming serve: micro-batch pages ≡ direct serve calls, batch-isolated") {
    import spark.implicits._
    val cfg = Retrieval.ServeConfig(terms, nprobe = 8)
    val qs = emb.filter(col("vec_id").isin(0L, 50L))
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    implicit val sqlCtx = spark.sqlContext
    val stream =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
    val input = stream.toDS().toDF("vec_id", "embedding")
    val got = scala.collection.mutable.Map[Long, Seq[Seq[Any]]]()
    val writer = graft.streaming.EventStream.streamingRetrievalServe(
      input, "serve_spec_bm25", servePath, docs, emb, cfg,
      (id, pages) => got(id) =
        pages.orderBy("q_id", "rank").collect().toSeq.map(_.toSeq))
    val q = writer.start()
    try {
      stream.addData(qs.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val direct = Seq(0L, 50L).flatMap { id =>
      Retrieval.serve(spark, "serve_spec_bm25", servePath, docs, emb,
          emb.filter(col("vec_id") === id).select("vec_id", "embedding"), cfg)
        .collect().toSeq.map(_.toSeq)
    }
    assert(got.values.flatten.toSeq === direct && direct.size === 2 * cfg.kOut)
  }
}
