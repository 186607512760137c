package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.sources.{ArrivalGate, NetCdfClassic, NetCdfClassicWriter}

class ArrivalGateSpec extends SparkSpec {

  private def writeNc(path: String): Unit =
    NetCdfClassicWriter.writeWrfGrid(path,
      Array(6.0f, 6.5f), Array(79.0f, 79.5f), Array.tabulate(5)(_ * 15.0f),
      "2020-01-01 00:00:00", "RAINNC", Array.tabulate(5 * 4)(_.toFloat))

  test("isReady: complete file yes; mid-upload prefix and missing file no") {
    val dir = Files.createTempDirectory("gate")
    val full = dir.resolve("full.nc").toString
    writeNc(full)
    assert(NetCdfClassic.isReady(full))
    assert(NetCdfClassic.withSeekable(full)(f =>
      f.expectedSize === Files.size(Paths.get(full))))

    val bytes = Files.readAllBytes(Paths.get(full))
    // torn mid-record upload: header parses, data section short
    val torn = dir.resolve("torn.nc")
    Files.write(torn, java.util.Arrays.copyOf(bytes, bytes.length - 10))
    assert(!NetCdfClassic.isReady(torn.toString))
    // first bytes only: header itself truncated
    val stub = dir.resolve("stub.nc")
    Files.write(stub, java.util.Arrays.copyOf(bytes, 16))
    assert(!NetCdfClassic.isReady(stub.toString))
    assert(!NetCdfClassic.isReady(dir.resolve("absent.nc").toString))
  }

  test("awaitReady returns once a straggler completes mid-poll (injected time)") {
    val dir = Files.createTempDirectory("gate")
    val a = dir.resolve("a.nc").toString
    val b = dir.resolve("b.nc").toString
    writeNc(a)
    val full = Files.readAllBytes(Paths.get(a))
    Files.write(Paths.get(b), java.util.Arrays.copyOf(full, full.length - 10))

    var now = 0L
    var polls = 0
    val res = ArrivalGate.awaitReady(Seq(a, b), timeoutMs = 60000L, pollMs = 1000L,
      sleep = ms => {
        now += ms; polls += 1
        if (polls == 2) // the upload finishes during the second wait
          Files.write(Paths.get(b), full.drop(full.length - 10),
            StandardOpenOption.APPEND)
      },
      clock = () => now)
    assert(res.ready && res.notReady.isEmpty)
    assert(polls === 2 && res.waitedMs === 2000L)
  }

  test("awaitReady times out listing only the still-incomplete inputs") {
    val dir = Files.createTempDirectory("gate")
    val a = dir.resolve("a.nc").toString
    writeNc(a)
    val ghost = dir.resolve("never.nc").toString
    var now = 0L
    val res = ArrivalGate.awaitReady(Seq(a, ghost), timeoutMs = 3000L, pollMs = 1000L,
      sleep = ms => now += ms, clock = () => now)
    assert(!res.ready)
    assert(res.notReady === Seq(ghost))
    assert(res.waitedMs >= 3000L)
  }
}
