package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import graft.sinks.Retention

class RetentionSpec extends SparkSpec {

  private def mkTree(): (String, String, String, String) = {
    val dir = Files.createTempDirectory("flush")
    Files.createDirectories(dir.resolve("sub"))
    val old1 = dir.resolve("old_run.nc")
    val old2 = dir.resolve("sub/nested_old.nc")
    val fresh = dir.resolve("fresh.nc")
    val other = dir.resolve("old_but_not_nc.txt")
    Seq(old1, old2, fresh, other).foreach(p => Files.write(p, "x".getBytes))
    val ancient = FileTime.fromMillis(System.currentTimeMillis() - 100L * 86400000L)
    Seq(old1, old2, other).foreach(p => Files.setLastModifiedTime(p, ancient))
    (dir.toString, old1.toString, old2.toString, fresh.toString)
  }

  test("flushOlderThan deletes only old matching files, recursively, and reports bytes") {
    val (dir, old1, old2, fresh) = mkTree()
    val r = Retention.flushOlderThan(dir, ".nc", maxAgeMs = 90L * 86400000L)
    assert(r.examined === 3) // the .txt never counts
    assert(r.deleted === Seq(old1, old2).sorted)
    assert(r.freedBytes === 2L)
    assert(r.failed.isEmpty)
    assert(!Files.exists(Paths.get(old1)) && !Files.exists(Paths.get(old2)))
    assert(Files.exists(Paths.get(fresh)))
    assert(Files.exists(Paths.get(dir, "old_but_not_nc.txt"))) // suffix-scoped
  }

  test("dryRun reports the same set without deleting") {
    val (dir, old1, old2, _) = mkTree()
    val r = Retention.flushOlderThan(dir, ".nc", 90L * 86400000L, dryRun = true)
    assert(r.dryRun && r.deleted === Seq(old1, old2).sorted)
    assert(Files.exists(Paths.get(old1)) && Files.exists(Paths.get(old2)))
  }
}
