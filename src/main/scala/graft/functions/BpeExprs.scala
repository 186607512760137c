package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom expressions for the BPE tokenizer block (SURVEY §2 F21):
  * the greedy left-to-right merge scan is inherently STATEFUL
  * lookahead (position i+2 after a merge) — a fold/HOF spelling needs
  * a carried struct state per element, interpreted per lambda (the
  * JlProject lesson) — so both the per-iteration training pass and
  * the full-merge-list encode run as fused scans. The loops live in
  * [[BpeExprs.mergePass]]; `doGenCode` emits one call per row through
  * the object's static forwarder, keeping the expressions inside
  * whole-stage codegen spans.
  *
  * Element nulls: symbol arrays are built from split()/char-explode —
  * null-free by construction (the VecExprs contract). */
object BpeExprs {

  /** One greedy, non-overlapping, left-to-right merge pass: every
    * adjacent (left, right) becomes the concatenated symbol, and a
    * just-merged symbol is not reconsidered as the LEFT of another
    * merge in the same pass (i advances by 2) — Sennrich et al.
    * 2016's `merge_vocab` semantics ("a a a" under (a,a) → "aa a"). */
  def mergePass(in: Array[UTF8String], l: UTF8String, r: UTF8String,
                merged: UTF8String): Array[UTF8String] = {
    val n = in.length
    val out = new Array[UTF8String](n)
    var i = 0; var o = 0
    while (i < n) {
      if (i < n - 1 && in(i).equals(l) && in(i + 1).equals(r)) {
        out(o) = merged; i += 2
      } else { out(o) = in(i); i += 1 }
      o += 1
    }
    if (o == n) out else java.util.Arrays.copyOf(out, o)
  }

  private def toAnyArray(a: Array[UTF8String]): Array[Any] = {
    val out = new Array[Any](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i); i += 1 }
    out
  }

  /** [[mergePass]] lifted to ArrayData for the expressions below. */
  def mergeArray(v: ArrayData, l: UTF8String, r: UTF8String,
                 merged: UTF8String): ArrayData = {
    val n = v.numElements()
    val in = new Array[UTF8String](n)
    var i = 0
    while (i < n) { in(i) = v.getUTF8String(i); i += 1 }
    new GenericArrayData(toAnyArray(mergePass(in, l, r, merged)))
  }

  /** The full encode: apply every training merge IN RANK ORDER to one
    * symbol array — the standard fast BPE apply (each pass is
    * [[mergePass]]; a merge learned later can consume symbols formed
    * by earlier merges, never vice versa). */
  def encodeArray(v: ArrayData, merges: Array[Array[UTF8String]]): ArrayData = {
    val n = v.numElements()
    var work = new Array[UTF8String](n)
    var i = 0
    while (i < n) { work(i) = v.getUTF8String(i); i += 1 }
    var m = 0
    while (m < merges.length) {
      val mm = merges(m)
      work = mergePass(work, mm(0), mm(1), mm(2))
      m += 1
    }
    new GenericArrayData(toAnyArray(work))
  }

  private def expectStringArray(fn: String, e: Expression): TypeCheckResult =
    e.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn requires array<string>, got ${other.simpleString}")
    }

  /** One training-iteration merge pass over a symbol-array column. */
  case class BpeMergePass(child: Expression, left: String, right: String)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_bpe_merge"
    override def checkInputDataTypes(): TypeCheckResult =
      expectStringArray(prettyName, child)

    @transient private lazy val lU = UTF8String.fromString(left)
    @transient private lazy val rU = UTF8String.fromString(right)
    @transient private lazy val mU = UTF8String.fromString(left + right)

    override def nullSafeEval(input: Any): Any =
      mergeArray(input.asInstanceOf[ArrayData], lU, rU, mU)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val lRef = ctx.addReferenceObj("bpeL", lU,
          "org.apache.spark.unsafe.types.UTF8String")
        val rRef = ctx.addReferenceObj("bpeR", rU,
          "org.apache.spark.unsafe.types.UTF8String")
        val mRef = ctx.addReferenceObj("bpeM", mU,
          "org.apache.spark.unsafe.types.UTF8String")
        s"""
           |${ev.value} = graft.functions.BpeExprs$$.MODULE$$
           |  .mergeArray($a, $lRef, $rRef, $mRef);
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): BpeMergePass =
      copy(child = c)
  }

  /** The full learned-merge-list encode over a symbol-array column. */
  case class BpeEncodeExpr(child: Expression, merges: Array[(String, String)])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_bpe_encode"
    override def checkInputDataTypes(): TypeCheckResult =
      expectStringArray(prettyName, child)

    @transient private lazy val mergesU: Array[Array[UTF8String]] =
      merges.map { case (l, r) => Array(UTF8String.fromString(l),
        UTF8String.fromString(r), UTF8String.fromString(l + r)) }

    override def nullSafeEval(input: Any): Any =
      encodeArray(input.asInstanceOf[ArrayData], mergesU)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val mRef = ctx.addReferenceObj("bpeMerges", mergesU,
          "org.apache.spark.unsafe.types.UTF8String[][]")
        s"""
           |${ev.value} = graft.functions.BpeExprs$$.MODULE$$
           |  .encodeArray($a, $mRef);
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): BpeEncodeExpr =
      copy(child = c)
  }

  /** Scoped temp-function wrappers (the VecExprs.withTempFunction
    * rationale: per-call matrices must not leak or collide). */
  def withMergePass[A](spark: SparkSession, left: String, right: String)
                      (build: String => A): A =
    VecExprs.withTempFunction(spark, "graft_bpe_merge",
      args => BpeMergePass(args(0), left, right))(build)

  def withEncode[A](spark: SparkSession, merges: Array[(String, String)])
                   (build: String => A): A =
    VecExprs.withTempFunction(spark, "graft_bpe_encode",
      args => BpeEncodeExpr(args(0), merges))(build)
}
