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

  private def greenCounts: Map[String, Long] =
    SparkEntry.queries.keysIterator.map(_ -> 100L).toMap

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
}
