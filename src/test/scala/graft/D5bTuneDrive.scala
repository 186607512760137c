package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** One-off tuning drive for D5b (cosinePairsLsh) — the r7 verdict's
  * "one heavy op at scale": sweep (tables, probes, occupancy) and
  * report (a) pair recall vs the exact D5 ground truth at both verify
  * sfs, (b) wall seconds + output volume on a 50k synthetic hot-key
  * corpus (the SkewScaleDrive shape: planted identical twins inside a
  * near-degenerate embedding cloud — the candidate-volume worst
  * case). The catalog config is the CHEAPEST one holding pair recall
  * ≥ 0.95 at both sfs; results recorded in PERF.md.
  *
  *   sbt "Test/runMain graft.D5bTuneDrive"
  */
object D5bTuneDrive {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"),
      shufflePartitions = "32")

    final case class Cfg(tables: Int, probes: Int, planesOff: Int) {
      override def toString =
        s"tables=$tables probes=$probes planesOff=$planesOff"
    }
    val cfgs = Seq(
      Cfg(8, 2, 0), // r7 catalog baseline
      Cfg(8, 1, 0), Cfg(6, 2, 0), Cfg(6, 1, 0),
      Cfg(4, 3, 0), Cfg(4, 2, 0), Cfg(4, 1, 0),
      Cfg(4, 2, 1), Cfg(6, 2, 1), Cfg(4, 2, 2))

    def planesFor(n: Long, off: Int): Int =
      math.max(4, 64 - java.lang.Long.numberOfLeadingZeros(
        math.max(1L, n / 256))) + off

    // ---- recall vs exact at the verify sfs ----
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = Tables.embeddings(spark, sf)
      val n = emb.count()
      val exact = Similarity.cosinePairs(emb, 0.45)
        .select(col("vec_a"), col("vec_b")).cache()
      val nExact = exact.count()
      println(s"[d5b] $sf n=$n exact_pairs=$nExact")
      cfgs.foreach { c =>
        Similarity.releaseCaches()
        val t0 = System.nanoTime()
        val approx = Similarity.cosinePairsLsh(emb, 0.45,
          planes = planesFor(n, c.planesOff), tables = c.tables,
          probes = c.probes)
          .select(col("vec_a"), col("vec_b"))
        val hit = approx.join(exact, Seq("vec_a", "vec_b")).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[d5b]   $c%-34s recall=${hit.toDouble / nExact}%.4f " +
          f"(${hit}%d/${nExact}%d) ${wall}%6.2fs")
      }
      exact.unpersist()
    }

    // ---- cost on the 50k hot-key synthetic corpus ----
    val size = args.headOption.map(_.toInt).getOrElse(50000)
    val dir = java.nio.file.Files.createTempDirectory("graft_d5b").toString
    val seed = when(pmod(col("id"), lit(100)) < 2,
      col("id") - pmod(col("id"), lit(100))).otherwise(col("id"))
    spark.range(size).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(15)), d =>
          ((pmod(hash(seed, d), lit(2000)) - 1000) / 1000.0).cast("float"))
          .as("embedding"),
        lit("x").as("label"))
      .write.mode("overwrite").parquet(s"$dir/emb")
    val big = spark.read.parquet(s"$dir/emb")
    val nTwin = size / 100L // planted identical pairs (cosine 1.0)
    cfgs.foreach { c =>
      Similarity.releaseCaches()
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val out = Similarity.cosinePairsLsh(big, 0.95,
        planes = planesFor(size, c.planesOff), tables = c.tables,
        probes = c.probes)
      val rows = out.count()
      val twins = out.filter(col("vec_b") - col("vec_a") === 1 &&
        pmod(col("vec_a"), lit(100)) === 0).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[d5b] n=$size $c%-34s ${wall}%7.2fs rows=$rows%9d " +
        f"twin_recall=${twins.toDouble / nTwin}%.3f")
    }

    val hp = new org.apache.hadoop.fs.Path(dir)
    hp.getFileSystem(spark.sessionState.newHadoopConf()).delete(hp, true)
    spark.stop()
  }
}
