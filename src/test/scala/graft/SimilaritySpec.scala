package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), "q"),
    (1L, Array(0.9f, 0.1f, 0.0f), "c"),
    (2L, Array(0.5f, 0.5f, 0.0f), "c"),
    (3L, Array(0.0f, 1.0f, 0.0f), "c"),
    (4L, Array(0.0f, 0.0f, 1.0f), "c")
  ).toDF("vec_id", "embedding", "label")

  test("E1 bruteForceTopK ranks by exact cosine, deterministic tie-break") {
    val out = Similarity.bruteForceTopK(emb, col("vec_id") === 0, 3)
      .orderBy("rank").select("n_id").as[Long].collect()
    assert(out.toSeq === Seq(1L, 2L, 3L)) // cos: .994, .707, 0 (vec 4 also 0 but id-later)
  }

  test("E1 cosine values match a hand computation at 6 dp") {
    val out = Similarity.bruteForceTopK(emb, col("vec_id") === 0, 1)
      .select("cos_sim").as[Double].head()
    val v = Array(0.9f.toDouble, 0.1f.toDouble) // float-storage roundtrip
    val expected = v(0) / math.sqrt(v(0) * v(0) + v(1) * v(1))
    assert(math.abs(out - math.rint(expected * 1e6) / 1e6) < 1e-9)
  }

  test("E2 lshTopK returns a subset ranking consistent with brute force within buckets") {
    val bf = Similarity.bruteForceTopK(emb, col("vec_id") === 0, 4)
      .select("n_id", "cos_sim").as[(Long, Double)].collect().toMap
    val lsh = Similarity.lshTopK(emb, col("vec_id") === 0, 4)
      .select("n_id", "cos_sim").as[(Long, Double)].collect()
    // every LSH hit carries the exact same cosine as brute force
    lsh.foreach { case (id, cs) => assert(bf(id) === cs) }
    // and the top brute-force hit shares the query's bucket (cos .994 → same signs)
    assert(lsh.map(_._1).contains(1L))
  }
}
