package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4: "skewed keys → salting or AQE
  * skew-join").
  *
  * AQE handles skewed JOINS at runtime; skewed AGGREGATIONS over a
  * hot key (one station producing 100× the events; one near-dup
  * cluster's bucket) still funnel a whole key through one reducer.
  * Salting splits each key into `salts` sub-keys for the heavy first
  * aggregation, then re-combines — two small shuffles instead of one
  * skewed one. Correct for any decomposable aggregate (sum/count/min/
  * max here).
  */
object Skew {

  /** Deterministic salt in [0, salts): hashed from `saltBy` (a row-
    * identity column — an id, never the group key itself). */
  def saltCol(saltBy: Column, salts: Int): Column =
    pmod(xxhash64(saltBy), lit(salts)).cast("int")

  /** Salted sum+count per key set: phase 1 aggregates (keys, salt) —
    * the hot key's rows spread over `salts` reducers — phase 2
    * combines the per-salt partials on the original keys. Result is
    * identical to `df.groupBy(keys).agg(sum, count)` (sums are
    * reassociation-safe for integral/decimal types; use decimal for
    * money — SURVEY §5). */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     saltBy: String, salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    // cast the re-combined sum back to the DIRECT aggregate's type:
    // sum-of-sum widens decimals a second time (decimal(20,2) →
    // (38,2) instead of the direct (30,2)), and "identical result"
    // must include the schema — a caller unioning salted and plain
    // outputs by position would fail on the widened type
    val directType = df.select(sum(col(valueCol))).schema.head.dataType
    df.groupBy((keys.map(col) :+ saltCol(col(saltBy), salts).as("_salt")): _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_psum")).cast(directType).as("value"),
        sum(col("_pcnt")).as("n"))
  }

  /** Salted min per key set — the same two-phase shape for the other
    * decomposable aggregate the engine leans on (D8's per-round
    * min-label propagation: a mega-component's hub node funnels its
    * whole adjacency through one reducer; salting spreads it over
    * `salts` sub-keys first). Identical result to
    * `df.groupBy(keys).agg(min(valueCol))` — min is reassociation-safe
    * unconditionally. */
  def saltedMin(df: DataFrame, keys: Seq[String], valueCol: String,
                saltBy: String, salts: Int = 16,
                out: String = "min_value"): DataFrame = {
    require(salts > 0, "salts must be positive")
    df.groupBy((keys.map(col) :+ saltCol(col(saltBy), salts).as("_salt")): _*)
      .agg(min(col(valueCol)).as("_pmin"))
      .groupBy(keys.map(col): _*)
      .agg(min(col("_pmin")).as(out))
  }
}
