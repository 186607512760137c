package graft

import org.apache.spark.sql.functions._

/** sf1 margin drive for C13 (r14): the catalog literal `%widget%`
  * matches nothing in the sf1 synthetic part-name domain (word-pair
  * names), so the catalog entry's sf1 wall is a 0-row fast path. This
  * drive re-times the SAME operator with an sf1-domain pattern so the
  * semi-join chain's scale margin is pinned on a populated result.
  *
  *   sbt "Test/runMain graft.Q20Sf1Drive /tmp/graft_sf1"
  */
object Q20Sf1Drive {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    spark.sparkContext.setLogLevel("ERROR")
    for (pat <- Seq("%e%", "%o%")) {
      val t0 = System.nanoTime()
      val n = graft.operators.Relational.q20PotentialPromotion(
        Tables.nation(spark, sf), Tables.supplier(spark, sf),
        Tables.part(spark, sf), Tables.lineitem(spark, sf),
        namePattern = pat).count()
      println(f"[q20sf1] pattern=$pat rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
