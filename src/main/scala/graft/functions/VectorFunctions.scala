package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `array<float>` embedding columns.
  *
  * All built-in higher-order functions (`transform`/`zip_with`/
  * `aggregate`) — codegen'd, no UDF, no driver round-trip. Sums run
  * sequentially over the array, so the float→double accumulation order
  * is deterministic and matches a sequential oracle implementation to
  * the last ulp (outputs are still rounded at 6 dp before any
  * threshold compare, see SURVEY §5).
  */
object VectorFunctions {

  /** float[] → double[] (all accumulation in double). */
  def toDoubleVec(v: Column): Column = transform(v, x => x.cast("double"))

  /** Σ xᵢ² — squared L2 norm. */
  def norm2(v: Column): Column =
    aggregate(v, lit(0.0), (s, x) => s + x * x)

  /** Σ xᵢyᵢ — dot product of two equal-length double vectors. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)

  /** cosine from a precomputed dot and squared norms — written as
    * dot/(√n2a·√n2b) in exactly this operand order (mirrored in the
    * oracle SQL). */
  def cosineFromParts(dotCol: Column, n2a: Column, n2b: Column): Column =
    dotCol / (sqrt(n2a) * sqrt(n2b))
}
