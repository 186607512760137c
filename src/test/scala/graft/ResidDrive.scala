package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

// Diagnostic drive for residual IVFPQ:
//   sbt "Test/runMain graft.ResidDrive"
object ResidDrive {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("16")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val real = Tables.embeddings(spark, sfDir)
    val isQ = col("vec_id") % 50 === 0
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val truth = ids(Similarity.bruteForceTopK(real, isQ, 5))
    // invariant: rerank covering every candidate => exact within probed lists
    val ivfExact = ids(Similarity.ivfTopK(real, isQ, 5, nlist = 16, nprobe = 4))
    val residAll = ids(Similarity.ivfpqResidualTopK(real, isQ, 5,
      nlist = 16, nprobe = 4, rerank = 100000))
    val rawAll = ids(Similarity.ivfpqTopK(real, isQ, 5,
      nlist = 16, nprobe = 4, rerank = 100000))
    println(s"RESID exact-cover == ivfExact: ${residAll == ivfExact}")
    println(s"RAW   exact-cover == ivfExact: ${rawAll == ivfExact}")
    if (residAll != ivfExact) {
      println(s"  missing: ${(ivfExact -- residAll).take(5)}")
      println(s"  extra:   ${(residAll -- ivfExact).take(5)}")
    }
    // cluster tightness: mean cosine of each vector to its NEAREST
    // trained centroid — residual PQ only wins when this is high
    graft.functions.VecExprs.register(spark)
    import graft.functions.VectorFunctions.dot
    val cents = Similarity.trainCentroids(real, nlist = 16, maxIter = 5)
    val u = real
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("n2", expr("aggregate(v, 0D, (a, x) -> a + x*x)"))
      .filter(col("n2") > 0)
      .withColumn("u", transform(col("v"), x => x / sqrt(col("n2"))))
    val centDf = cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("c_id", "cent")
    val tight = u.crossJoin(broadcast(centDf))
      .select(col("vec_id"), dot(col("u"), col("cent")).as("cos"))
      .groupBy("vec_id").agg(max("cos").as("mc"))
      .agg(avg("mc")).as[Double].head()
    println(f"mean cos(u, nearest centroid) = $tight%.3f")
    // ADC-ordering quality at the default rerank
    for (rr <- Seq(8, 16, 32)) {
      val rawR = (truth & ids(Similarity.ivfpqTopK(real, isQ, 5,
        nlist = 16, nprobe = 4, rerank = rr))).size.toDouble / truth.size
      val resR = (truth & ids(Similarity.ivfpqResidualTopK(real, isQ, 5,
        nlist = 16, nprobe = 4, rerank = rr))).size.toDouble / truth.size
      println(f"rerank=$rr%-3d raw=$rawR%.2f resid=$resR%.2f")
    }
    spark.stop()
  }
}
