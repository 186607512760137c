package graft

import java.nio.file.Files

import graft.sources.{NetCdfClassic, NetCdfClassicWriter}

class WriterRoundTripSpec extends SparkSpec {

  test("writer → reader round-trips a WRF-shaped grid exactly") {
    val lats = Array(6.0f, 6.5f)
    val lons = Array(79.0f, 79.25f, 79.5f)
    val times = Array(0.0f, 15.0f, 30.0f)
    val values = Array.tabulate(3 * 2 * 3)(_.toFloat * 1.5f)
    val p = Files.createTempFile("rt", ".nc").toString
    NetCdfClassicWriter.writeWrfGrid(p, lats, lons, times,
      "2021-06-01 12:00:00", "RAINNC", values)

    val nc = NetCdfClassic.open(p)
    assert(nc.numRecs === 3)
    assert(nc.dims.map(d => (d.name, d.length)) ===
      Seq(("Time", 0), ("south_north", 2), ("west_east", 3)))
    val (shp, got) = nc.readDoubles("RAINNC")
    assert(shp === Seq(3, 2, 3))
    assert(got.toSeq === values.map(_.toDouble).toSeq)
    val units = nc.variable("XTIME").attr("description").get.values
    assert(units === "minutes since 2021-06-01 12:00:00")
    // and through the distributed reader
    val df = NetCdfClassic.readGrid(spark, Seq(p))
    assert(df.count() === 18)
    assert(df.selectExpr("min(epoch_s)").head().getLong(0) === 1622548800L)
  }

  test("mixed fixed + record variables with odd slab sizes pad correctly") {
    import NetCdfClassicWriter._
    val dims = Seq(Dim("Time", 0), Dim("x", 3))
    // record var slab = 3 floats = 12B (no pad); fixed var = 3 floats
    val bytes = NetCdfClassicWriter.bytes(dims, Seq(
      FloatVar("fixed", Seq(1), Nil, Array(1f, 2f, 3f)),
      FloatVar("rec", Seq(0, 1), Nil, Array(10f, 11f, 12f, 20f, 21f, 22f))), 2)
    val nc = NetCdfClassic.parse(bytes)
    assert(nc.readDoubles("fixed")._2.toSeq === Seq(1.0, 2.0, 3.0))
    assert(nc.readDoubles("rec")._2.toSeq === Seq(10.0, 11.0, 12.0, 20.0, 21.0, 22.0))
  }
}
