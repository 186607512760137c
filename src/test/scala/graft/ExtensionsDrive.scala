package graft

// Forked-JVM drive: a session built with spark.sql.extensions=
// graft.GraftExtensions must expose graft_* functions to spark.sql
// with NO runtime register call.  sbt "Test/runMain graft.ExtensionsDrive"
import org.apache.spark.sql.SparkSession

object ExtensionsDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
        |       graft_simhash64(array(5L, 5L)) AS sim,
        |       size(graft_minhash32(array(1L, 2L))) AS k,
        |       graft_hyperplane8(array(1.0d, -1.0d)) AS bucket,
        |       size(graft_grams3h(array('a','b','c','d'))) AS grams
        |""".stripMargin).head()
    println(s"EXT dot=${r.getDouble(0)} sim=${r.getLong(1)} k=${r.getInt(2)} " +
      s"bucket=${r.getLong(3)} grams=${r.getInt(4)}")
    assert(r.getDouble(0) == 11.0 && r.getLong(1) == 5L && r.getInt(2) == 32 && r.getInt(4) == 2)
    println("EXTENSIONS OK")
    spark.stop()
  }
}
