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

  test("writePackaged emits xy.csv + value-only per-timestep files + zip (round-trips)") {
    // 2×2 grid over 3 timesteps (epoch seconds; 0 → LK 1970-01-01_05-30)
    val cells = Seq((79.0, 6.0), (79.0, 6.5), (79.5, 6.0), (79.5, 6.5))
    val rf = (for {
      (t, k) <- Seq(0L, 900L, 1800L).zipWithIndex
      ((lon, lat), i) <- cells.zipWithIndex
    } yield (t, lon, lat, (k * 10 + i) + 0.125)).toDF("t", "lon", "lat", "value")
    val dir = Files.createTempDirectory("rfield_pkg").toString + "/d03"
    RfieldSink.writePackaged(rf, dir, "t", model = "WRF", system = "A", version = "4.0")

    val xy = Files.readAllLines(Paths.get(dir, "xy.csv")).asScala.toList
    assert(xy === List("79.0,6.0", "79.0,6.5", "79.5,6.0", "79.5,6.5")) // (lon,lat) sorted

    val names = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).toList.sorted
    assert(names.count(_.endsWith(".txt")) === 3)
    assert(names.contains("WRF_A_4.0_1970-01-01_05-30.txt")) // t=0 in LK time
    assert(names.contains("WRF_A_4.0_1970-01-01_05-45.txt"))

    // positional round-trip: xy.csv line i + txt line i == original row
    val v900 = Files.readAllLines(
      Paths.get(dir, "WRF_A_4.0_1970-01-01_05-45.txt")).asScala.map(_.toDouble)
    assert(v900.size === xy.size)
    val rebuilt = xy.map(_.split(",").map(_.toDouble)).zip(v900)
      .map { case (Array(lon, lat), v) => (lon, lat, v) }
    assert(rebuilt === Seq((79.0, 6.0, 10.125), (79.0, 6.5, 11.125),
      (79.5, 6.0, 12.125), (79.5, 6.5, 13.125)))

    // bundle: zip holds exactly the directory's files
    val zf = new java.util.zip.ZipFile(s"$dir.zip")
    try {
      val entries = zf.entries().asScala.map(_.getName).toList.sorted
      assert(entries === ("xy.csv" :: names.filter(_.endsWith(".txt"))).sorted)
    } finally zf.close()
  }

  test("writePackaged fails loud when two timesteps collapse to one file name") {
    // epochs 0 and 30 both stamp to LK 1970-01-01_05-30; the second
    // rename returns false (dest exists) and must throw, not silently
    // ship a bundle with a step missing
    val rf = (for {
      t <- Seq(0L, 30L); (lon, lat) <- Seq((79.0, 6.0), (79.5, 6.0))
    } yield (t, lon, lat, 1.0)).toDF("t", "lon", "lat", "value")
    val dir = Files.createTempDirectory("rfield_dup").toString + "/d03"
    val e = intercept[IllegalArgumentException] {
      RfieldSink.writePackaged(rf, dir, "t", "WRF", "A", "4.0")
    }
    assert(e.getMessage.contains("rename"))
  }

  test("writePackaged rejects a timestep with missing cells (would misalign)") {
    val rf = Seq(
      (0L, 79.0, 6.0, 1.0), (0L, 79.5, 6.0, 2.0),
      (900L, 79.0, 6.0, 3.0) // missing cell (79.5, 6.0)
    ).toDF("t", "lon", "lat", "value")
    val dir = Files.createTempDirectory("rfield_bad").toString + "/d03"
    val e = intercept[IllegalArgumentException] {
      RfieldSink.writePackaged(rf, dir, "t", "WRF", "A", "4.0")
    }
    assert(e.getMessage.contains("misalign"))
  }
}
