package graft

/** One-off diagnostic: output ROW counts of catalog entries at two
  * sfs (`sbt "Test/runMain graft.OutputScaleDrive <small> <large>
  * <name>…"`). Distinguishes a super-linear WALL ratio caused by a
  * bad plan from one caused by the result set itself growing
  * super-linearly (pair-producing operators on denser data: more
  * points per interval, more true near-dup pairs per cluster). Not
  * part of `test`. */
object OutputScaleDrive {
  def main(args: Array[String]): Unit = {
    val small = args(0); val large = args(1); val names = args.drop(2)
    val spark = Sessions.local("32")
    for (n <- names) {
      val q = SparkEntry.queries(n)
      val a = q(spark, small).count()
      val b = q(spark, large).count()
      println(f"$n%-28s $small=$a%10d  $large=$b%10d  x${b.toDouble / a}%.1f")
    }
    spark.stop()
  }
}
