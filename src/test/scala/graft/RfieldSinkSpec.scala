package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.sinks.RfieldSink

class RfieldSinkSpec extends SparkSpec {
  import spark.implicits._

  test("writes one sorted 'lon lat value' file per timestep") {
    val rf = Seq(
      (900L, 79.5, 6.0, 2.5), (900L, 79.0, 6.5, 1.0), (900L, 79.0, 6.0, 0.5),
      (1800L, 79.0, 6.0, 9.0)
    ).toDF("t", "lon", "lat", "value")
    val dir = Files.createTempDirectory("rfield").toString
    RfieldSink.write(rf, dir, "t")

    def partFiles(t: Long) = Files.list(Paths.get(dir, s"t=$t")).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toList
    assert(partFiles(900L).size === 1)   // exactly one file per timestep
    assert(partFiles(1800L).size === 1)
    val lines = Files.readAllLines(partFiles(900L).head).asScala.toList
    assert(lines === List("79.0 6.0 0.5", "79.0 6.5 1.0", "79.5 6.0 2.5")) // (lon, lat) sorted
  }
}
