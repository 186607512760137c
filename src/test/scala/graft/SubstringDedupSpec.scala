package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** D11 substringDedup: the verbatim-run criterion, winnowing's
  * alignment-independent detection guarantee (the property a
  * fixed-stride sample lacks — an earlier stride draft of this
  * operator failed exactly this sweep), per-doc fingerprint dedup,
  * and the boilerplate cap. */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def words(n: Int, tag: String) =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  test("D11 pairs docs sharing a verbatim run; scattered overlap does not pair") {
    val run = words(23, "shared") // k+w−1 = 23-token verbatim run
    val docs = Seq(
      (1L, s"${words(10, "a")} $run ${words(5, "b")}"),
      (2L, s"${words(7, "c")} $run"),
      // doc 3 holds every shared token but interleaved — no 16-run
      (3L, (1 to 23).map(i => s"shared$i x$i").mkString(" ")),
      (4L, words(40, "d"))
    ).toDF("doc_id", "text")
    val pairs = Dedup.substringDedup(docs, k = 16, w = 8)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("D11 winnowing guarantee: a run of ≥ k+w−1 tokens is caught at EVERY alignment") {
    val k = 8; val w = 4
    val run = words(k + w - 1, "r") // 11 tokens: the guaranteed minimum
    // shift the run through alignment offsets on one side — content-
    // defined selection must catch all of them (a stride-4 sample
    // catches only the offsets that happen to align)
    (0 to 6).foreach { off =>
      val docs = Seq(
        (1L, s"${words(off, "pad")} $run"),
        (2L, s"${words(13, "z")} $run")
      ).toDF("doc_id", "text")
      val n = Dedup.substringDedup(docs, k, w).count()
      assert(n === 1L, s"run missed at alignment offset $off")
    }
  }

  test("D11 a doc with fewer than w window hashes fingerprints its overall min") {
    // two IDENTICAL 16-token docs: one window hash each (below w), the
    // single overall-min fingerprint must match. (A short doc against
    // a LONGER doc is deliberately NOT guaranteed — the run is below
    // k+w−1, winnowing may select a different window on the long side.)
    val run = words(16, "w")
    val docs = Seq((1L, run), (2L, run)).toDF("doc_id", "text")
    val out = Dedup.substringDedup(docs, k = 16, w = 8)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L)))
  }

  test("D11 counts a fingerprint repeated inside one doc once per pair") {
    val run = words(23, "w") // k+w−1: detection guaranteed
    val docs = Seq(
      (1L, s"$run $run"), // the run's fingerprints recur in doc 1
      (2L, run)
    ).toDF("doc_id", "text")
    val shared = Dedup.substringDedup(docs, k = 16, w = 8)
      .filter($"doc_a" === 1L && $"doc_b" === 2L)
      .select($"n_shared").as[Long].head()
    // doc 2 emits exactly one fingerprint (8 hashes → one winnow
    // window); dedup inside doc 1 caps the shared count at 1
    assert(shared === 1L)
  }

  test("D11 maxDf drops boilerplate fingerprints shared by more than maxDf docs") {
    val header = words(23, "hdr")
    val docs = (1L to 6L).map(i => (i, s"$header ${words(30, s"u$i")}"))
      .toDF("doc_id", "text")
    // uncapped: the 6-doc header run makes all 15 pairs
    assert(Dedup.substringDedup(docs, 16, 8).count() === 15L)
    // capped at df 3: the header fingerprints are boilerplate — no
    // doc pair may survive on header-only evidence
    assert(Dedup.substringDedup(docs, 16, 8, maxDf = 3L).count() === 0L)
  }

  test("D11 catalog entry finds the planted duplicates") {
    val pairs = SparkEntry.queries("dedup_substring")(spark, sfDir)
    assert(pairs.count() > 0L, "planted near-duplicates must share 23-token runs")
  }
}
