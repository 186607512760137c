package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** r17 (r16 verdict #7, closing the r15 ask): the dedup_semantic
  * recall-vs-assign PLATEAU table. The catalog entry runs the D10
  * cluster-then-verify at (tau 0.45, nlist 8, assign 2) and gates at
  * pair recall ≥ 0.70 vs the exact D5 ground truth; this drive sweeps
  * `assign` (and the auto-sized nlist) at both verify sfs so the
  * committed table either shows recall saturating (≈.786 is the
  * corpus ceiling at this config) or quantifies exactly what a
  * build-flavored assign/nlist change would buy — changing the
  * catalog spelling itself changes what the declared query computes,
  * out of scope for an optimization round.
  *
  *   sbt "Test/runMain graft.SemanticPlateauDrive"
  */
object SemanticPlateauDrive {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"),
      shufflePartitions = "32")
    spark.sparkContext.setLogLevel("ERROR")
    try {
      for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
        val emb = Tables.embeddings(spark, sf)
        // not cached: clearAllCaches between configs would drop it
        // anyway (it sweeps the session cache manager); the exact
        // pair list recomputes per config — seconds at the verify sfs
        val exact = Dedup.embeddingCosine(emb, 0.45)
          .select(col("vec_a"), col("vec_b")).distinct()
        val nExact = exact.count()
        for (nlist <- Seq(8, 0); assign <- 1 to 4) {
          Bench.clearAllCaches(spark)
          val t0 = System.nanoTime()
          val got = Similarity.semanticDedup(emb, 0.45, nlist = nlist,
              assign = assign)
            .select(col("vec_a"), col("vec_b")).distinct()
          val hit = got.join(exact, Seq("vec_a", "vec_b"), "left_semi").count()
          val wall = (System.nanoTime() - t0) / 1e9
          val recall = if (nExact == 0) 1.0 else hit.toDouble / nExact
          println(s"""{"metric":"semantic_plateau","sf":"$sf",""" +
            s""""nlist":$nlist,"assign":$assign,"exact_pairs":$nExact,""" +
            s""""hit":$hit,"recall":${Jsons.num(recall, 4)},""" +
            s""""wall_sec":${Jsons.num(wall, 2)}}""")
        }
      }
    } finally spark.stop()
  }
}
