package graft

import java.nio.file.Files

class PipelineConfigSpec extends SparkSpec {

  test("fromJson parses a reference-shaped config (comma-joined systems)") {
    val dir = Files.createTempDirectory("graft_cfg")
    val p = dir.resolve("run.json")
    Files.write(p,
      """{
        |  "nc_dir": "/data/nc", "out_dir": "/data/out",
        |  "model": "WRF", "version": "4.0", "sim_tag": "gfs_d0_18",
        |  "wrf_systems": "A,C,E,SE",
        |  "unit": "mm", "unit_type": "Accumulative",
        |  "variable": "Precipitation",
        |  "rfield_host": "ignored.example", "rfield_user": "ignored"
        |}""".stripMargin.getBytes)
    val cfg = PipelineConfig.fromJson(p.toString)
    assert(cfg.systems === Seq("A", "C", "E", "SE"))
    assert(cfg.simTag === "gfs_d0_18")
    assert(cfg.sourceName("SE") === "WRF_SE")
    assert(cfg.ncPath("A") === "/data/nc/d03_RAINNC_A.nc")
  }

  test("fromJson accepts a JSON-array systems list and applies defaults") {
    val dir = Files.createTempDirectory("graft_cfg")
    val p = dir.resolve("run.json")
    Files.write(p,
      """{"nc_dir": "/n", "out_dir": "/o", "wrf_systems": ["X", "Y"]}""".getBytes)
    val cfg = PipelineConfig.fromJson(p.toString)
    assert(cfg.systems === Seq("X", "Y"))
    assert(cfg.model === "WRF" && cfg.unit === "mm")
  }

  test("legacy ncDir entry discovers every system present, not just the defaults") {
    val dir = Files.createTempDirectory("graft_disc").toString
    Pipeline.generateSyntheticRun(dir, ny = 2, nx = 2, nt = 3,
      systems = Seq("A", "C", "E"))
    val res = Pipeline.run(spark, dir, s"$dir/out")
    assert(res.perSystem.keySet === Set("A", "C", "E")) // E not silently dropped
    // and a directory with nothing matching the pattern fails loud
    val empty = Files.createTempDirectory("graft_disc_empty").toString
    val e = intercept[IllegalArgumentException](Pipeline.run(spark, empty, s"$empty/out"))
    assert(e.getMessage.contains("no files matching"))
  }

  test("one config-driven invocation processes all systems; per-system counts sum to total") {
    val dir = Files.createTempDirectory("graft_pipe").toString
    val systems = Seq("A", "C", "E", "SE")
    Pipeline.generateSyntheticRun(dir, ny = 3, nx = 4, nt = 6, systems = systems)
    val cfg = PipelineConfig(ncDir = dir, outDir = s"$dir/out",
      simTag = "gfs_d0_18", systems = systems, packagedRfields = true)
    val res = Pipeline.run(spark, cfg)
    assert(res.perSystem.keySet === systems.toSet)
    // every system contributes the same shape: (nt-1) diffs × ny×nx cells
    assert(res.perSystem.values.toSet === Set(5L * 12L))
    assert(res.seriesRows === res.perSystem.values.sum)
    assert(res.stations === 12L)            // registry unions identical grids
    assert(res.watermarks === 4L * 12L)     // one fgt per (system, cell) series
    assert(new java.io.File(s"$dir/out/rfields").exists())
    // per-system reference bundles: shared xy.csv + 5 value files + zip
    for (sysName <- systems) {
      val home = s"$dir/out/rfields_packaged/$sysName"
      assert(Files.readAllLines(java.nio.file.Paths.get(home, "xy.csv")).size === 12)
      val txts = new java.io.File(home).list().count(_.endsWith(".txt"))
      assert(txts === 5) // nt-1 diff steps
      assert(new java.io.File(s"$home.zip").exists())
    }
  }
}
