package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** E7 JL sign random projection: one-hot exactness against an
  * independent md5 coin, JL norm preservation on the real corpus,
  * and per-row determinism. */
class RandomProjectSpec extends SparkSpec {
  import spark.implicits._

  test("E7 one-hot vectors project to ±round(1,6)/√k with the md5 sign") {
    // basis vector e_i → p_j = s(i,j)/4 exactly; recompute the sign
    // here independently (string-hex spelling, not the nibble one)
    val d = 64
    def hexSign(i: Int, j: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$j".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString
      if (hex.charAt(0) < '8') 1.0 else -1.0
    }
    val hot = Seq(0, 17, 63).map { i =>
      (i.toLong, Array.tabulate(d)(x => if (x == i) 1.0f else 0.0f), 0)
    }.toDF("vec_id", "embedding", "label")
    val out = Similarity.randomProject(hot).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    for (i <- Seq(0, 17, 63); j <- 0 until 16)
      assert(out((i.toLong, j.toLong)) === hexSign(i, j) / 4.0,
        s"one-hot $i dim $j")
  }

  test("E7 preserves squared norms in expectation (JL isometry)") {
    val emb = Tables.embeddings(spark, sfDir)
    val proj = Similarity.randomProject(emb)
      .groupBy("vec_id").agg(sum(col("value") * col("value")).as("p2"))
    val ratio = Similarity.prepared(emb).filter(col("n2") > 0)
      .join(proj, "vec_id")
      .agg(avg(col("p2") / col("n2"))).head().getDouble(0)
    // E[‖p‖²] = ‖v‖², per-row variance 2/k → the corpus mean is tight
    assert(ratio > 0.8 && ratio < 1.2, s"mean ‖p‖²/‖v‖² = $ratio")
  }

  test("E7 codegen JlProject ≡ the declarative HOF spelling, bit-for-bit") {
    // the fused loop replicates Spark Round's BigDecimal HALF_UP per
    // element — any drift from the oracle-pinned HOF path (repr
    // boundaries, division rounding) must surface here on real floats
    import graft.functions.VectorFunctions.toDoubleVec
    val emb = Tables.embeddings(spark, sfDir)
    graft.functions.VecExprs.register(spark)
    val fast = emb.select(col("vec_id"),
      call_function("graft_jl_project", toDoubleVec(col("embedding")),
        lit(16), lit(64)).as("p"))
    val slow = emb.select(col("vec_id"),
      Similarity.projectionArrHof(16, 64).as("p"))
    val a = fast.orderBy("vec_id").collect().toSeq.map(_.toSeq)
    val b = slow.orderBy("vec_id").collect().toSeq.map(_.toSeq)
    assert(a.nonEmpty && a === b)
  }

  test("E7b projectedTopK with a corpus-covering overfetch ≡ brute force") {
    // the E3x rationale: when the shortlist covers every candidate,
    // the exact rerank must reproduce brute force row-for-row
    val emb = Tables.embeddings(spark, sfDir)
    val isQ = col("vec_id") % 50 === 0
    val n = emb.count().toInt
    val a = Similarity.projectedTopK(emb, isQ, 5, overfetch = n)
      .orderBy("q_id", "rank").collect().toSeq.map(_.toSeq)
    val b = Similarity.bruteForceTopK(emb, isQ, 5)
      .orderBy("q_id", "rank").collect().toSeq.map(_.toSeq)
    assert(a.nonEmpty && a === b)
  }

  test("E7b shortlist recall at the catalog overfetch") {
    val emb = Tables.embeddings(spark, sfDir)
    val isQ = col("vec_id") % 50 === 0
    val e = Similarity.bruteForceTopK(emb, isQ, 5)
      .select("q_id", "n_id")
    val a = Similarity.projectedTopK(emb, isQ, 5)
      .select("q_id", "n_id")
    val recall = a.join(e, Seq("q_id", "n_id")).count().toDouble / e.count()
    // isotropic-corpus JL at 4× compression with the auto-sized
    // constant-fraction shortlist (the ivf-family regime rationale)
    assert(recall >= 0.5, s"recall@5 $recall")
  }

  test("E7 is a pure per-row map: row count and determinism") {
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val a = Similarity.randomProject(emb)
    assert(a.count() === 16 * n)
    val b = Similarity.randomProject(emb.repartition(7))
    assert(a.orderBy("vec_id", "dim").collect().toSeq ===
      b.orderBy("vec_id", "dim").collect().toSeq)
  }
}
