package graft

import org.apache.spark.sql.types._

/** Schema tripwire for every driver-generated table: the r6 dataset
  * regeneration silently changed `events.ts`'s physical type and 24
  * catalog queries vanished from the oracle run without a single red
  * test. This spec pins each table's REQUIRED columns (with the type
  * families the catalog actually handles), so the next regeneration
  * surprise fails here by name instead of emptying the round. */
class TablesSchemaSpec extends SparkSpec {

  private def integral(dt: DataType) = dt == LongType || dt == IntegerType
  private def fractional(dt: DataType) = dt == DoubleType || dt == FloatType

  private def assertCols(table: String,
                         required: Map[String, DataType => Boolean]): Unit = {
    val schema = Tables.load(spark, sfDir, table).schema
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    required.foreach { case (name, ok) =>
      val dt = byName.getOrElse(name,
        fail(s"$table: required column '$name' missing — " +
          s"regenerated schema is ${schema.simpleString}"))
      assert(ok(dt), s"$table.$name: unhandled type $dt")
    }
  }

  test("events carries the catalog's required columns in handled types") {
    assertCols("events", Map(
      "event_id"   -> integral,
      // either physical encoding Tables.eventTsUs adapts
      "ts"         -> (dt => dt == LongType || dt.isInstanceOf[TimestampType]),
      "user_id"    -> integral,
      "event_type" -> (_ == StringType),
      "value"      -> fractional))
  }

  test("documents carries the catalog's required columns in handled types") {
    assertCols("documents", Map(
      "doc_id" -> integral,
      "text"   -> (_ == StringType),
      "lang"   -> (_ == StringType),
      "source" -> (_ == StringType)))
  }

  test("embeddings carries the catalog's required columns in handled types") {
    assertCols("embeddings", Map(
      "vec_id" -> integral,
      "embedding" -> {
        case ArrayType(et, _) => fractional(et)
        case _ => false
      }))
  }

  test("the TPC-H-ish tables keep their join keys and measures") {
    assertCols("lineitem", Map(
      "l_orderkey" -> integral, "l_partkey" -> integral,
      "l_suppkey" -> integral, "l_quantity" -> fractional,
      "l_extendedprice" -> fractional, "l_discount" -> fractional,
      "l_returnflag" -> (_ == StringType)))
    assertCols("orders", Map(
      "o_orderkey" -> integral, "o_custkey" -> integral))
    assertCols("customer", Map(
      "c_custkey" -> integral, "c_nationkey" -> integral))
    assertCols("supplier", Map(
      "s_suppkey" -> integral, "s_nationkey" -> integral))
    assertCols("part", Map("p_partkey" -> integral, "p_type" -> (_ == StringType)))
    assertCols("nation", Map(
      "n_nationkey" -> integral, "n_regionkey" -> integral,
      "n_name" -> (_ == StringType)))
    assertCols("region", Map(
      "r_regionkey" -> integral, "r_name" -> (_ == StringType)))
  }
}
