package graft

// Forked-JVM smoke of the driver contract's entry():
//   sbt "Test/runMain graft.EntryDrive"
object EntryDrive {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY ROWS=$n")
    assert(n > 0, "driver smoke requires rows > 0")
    spark.stop()
  }
}
