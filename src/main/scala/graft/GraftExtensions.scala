package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.VecExprs

/** SparkSessionExtensions hook: build sessions with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * and every graft SQL function (`graft_dot`, `graft_simhash64`,
  * `graft_minhash32`, `graft_hyperplane8`, `graft_grams3h`) is
  * available to `spark.sql(...)` / `call_function` from the start —
  * the deployment-grade alternative to the operators' lazy
  * per-session [[VecExprs.register]] (which remains so the library
  * also works on vanilla sessions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    VecExprs.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
}
