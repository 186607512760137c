package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions with real `doGenCode` for the numeric
  * hot paths the built-in higher-order functions can't serve:
  * `aggregate`/`transform`/`zip_with` are CodegenFallback — evaluated
  * interpreted, per row, with closure + array allocation — which makes
  * an all-pairs 64-dim dot product ~50× slower than a fused loop.
  * These expressions generate tight Java loops over `ArrayData`
  * (no intermediate arrays) and stay inside whole-stage codegen.
  *
  * Element nulls: embedding vectors and token-hash arrays are built
  * null-free upstream (cast/xxhash64 never emit null elements), so the
  * loops skip per-element null checks — documented contract, matching
  * the oracle's list functions which also treat lists as dense.
  */
object VecExprs {

  /** Analysis-time input check for the loops below, which read raw
    * `ArrayData` slots: an `array<float>` fed to a getDouble-loop would
    * silently read wrong bytes, so misuse must fail in the analyzer,
    * not produce garbage. (Spark's `ExpectsInputTypes` mixin is
    * private[sql]; this is the same contract spelled by hand.) */
  private[functions] def expectArrays(fn: String,
      args: (Expression, DataType)*): TypeCheckResult =
    args.zipWithIndex.collectFirst {
      case ((e, elem), i) if (e.dataType match {
            case ArrayType(et, _) => et != elem // nullability-insensitive
            case _                => true
          }) =>
        TypeCheckResult.TypeCheckFailure(
          s"$fn argument ${i + 1} requires array<${elem.simpleString}>, " +
            s"got ${e.dataType.simpleString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  /** Σ aᵢ·bᵢ over two array<double> columns — sequential left-to-right
    * accumulation, the same summation order as `aggregate(zip_with(..))`
    * and DuckDB's `list_dot_product`, so results are bit-identical to
    * both. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"
    override def checkInputDataTypes(): TypeCheckResult =
      expectArrays(prettyName, left -> DoubleType, right -> DoubleType)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(left = l, right = r)
  }

  /** 64-bit SimHash over an array<long> of token hashes: bit j of the
    * result is set iff a strict majority of hashes have bit j set
    * (`2·ones > n`), the standard Charikar construction. One fused
    * loop: per hash, increment 64 counters. */
  case class SimHash64(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash64"
    override def checkInputDataTypes(): TypeCheckResult =
      expectArrays(prettyName, child -> LongType)

    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val n = hs.numElements()
      val counts = new Array[Int](64)
      var i = 0
      while (i < n) {
        val h = hs.getLong(i); var j = 0
        while (j < 64) { counts(j) += ((h >>> j) & 1L).toInt; j += 1 }
        i += 1
      }
      var sim = 0L; var j = 0
      while (j < 64) { if (2 * counts(j) > n) sim |= (1L << j); j += 1 }
      sim
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n"); val counts = ctx.freshName("counts")
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val h = ctx.freshName("h"); val sim = ctx.freshName("sim")
        s"""
           |int $n = $a.numElements();
           |int[] $counts = new int[64];
           |for (int $i = 0; $i < $n; $i++) {
           |  long $h = $a.getLong($i);
           |  for (int $j = 0; $j < 64; $j++) { $counts[$j] += (int)(($h >>> $j) & 1L); }
           |}
           |long $sim = 0L;
           |for (int $j = 0; $j < 64; $j++) { if (2 * $counts[$j] > $n) $sim |= (1L << $j); }
           |${ev.value} = $sim;
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): SimHash64 =
      copy(child = c)
  }

  /** k-slot MinHash signature over an array<long> of shingle hashes:
    * slot i is min over shingles of xxh64(hash, seed = i) — k
    * independent permutation approximations from one stored hash per
    * shingle. Returns array<long> of length k (slots stay at
    * Long.MaxValue for an empty shingle set, a sentinel no real hash
    * collides with in practice). */
  case class MinHashSig(child: Expression, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash_sig"
    override def checkInputDataTypes(): TypeCheckResult =
      expectArrays(prettyName, child -> LongType)

    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val n = hs.numElements()
      val sig = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < n) {
        val h = hs.getLong(i); var s = 0
        while (s < k) {
          val v = XXH64.hashLong(h, s)
          if (v < sig(s)) sig(s) = v
          s += 1
        }
        i += 1
      }
      new GenericArrayData(sig)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
        val i = ctx.freshName("i"); val s = ctx.freshName("s")
        val h = ctx.freshName("h"); val v = ctx.freshName("v")
        val xxh = classOf[XXH64].getName
        s"""
           |int $n = $a.numElements();
           |long[] $sig = new long[$k];
           |java.util.Arrays.fill($sig, Long.MAX_VALUE);
           |for (int $i = 0; $i < $n; $i++) {
           |  long $h = $a.getLong($i);
           |  for (int $s = 0; $s < $k; $s++) {
           |    long $v = $xxh.hashLong($h, (long) $s);
           |    if ($v < $sig[$s]) $sig[$s] = $v;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): MinHashSig =
      copy(child = c)
  }

  /** Distinct word-3-gram hashes from a token array, one fused pass:
    * gram i is tokens (i, i+1, i+2); its hash is the xxh64 seed-chain
    * over the three UTF8 tokens (tokens contain no spaces, so the
    * triple determines the joined gram string injectively — hashing the
    * triple ≡ hashing the gram text, modulo 64-bit collisions).
    * Output is sorted-distinct (order is irrelevant to every consumer:
    * min-sketches, set sizes, equi-joins).
    *
    * Why an expression: the compositional spelling
    * `array_distinct(transform(grams3(toks), xxhash64))` is interpreted
    * (HOFs are CodegenFallback) and — fatally — every `element_at(toks,
    * i+k)` inside the gram lambda re-evaluates the whole tokenization
    * chain after projection collapse, making it O(grams × tokenize). */
  case class Grams3Hashes(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_grams3h"
    override def checkInputDataTypes(): TypeCheckResult =
      expectArrays(prettyName, child -> StringType)

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val n = toks.numElements()
      if (n < 3) return new GenericArrayData(Array.emptyLongArray)
      val out = new Array[Long](n - 2)
      var i = 0
      while (i < n - 2) {
        var h = XXH64.hashUTF8String(toks.getUTF8String(i), 42L)
        h = XXH64.hashUTF8String(toks.getUTF8String(i + 1), h)
        h = XXH64.hashUTF8String(toks.getUTF8String(i + 2), h)
        out(i) = h
        i += 1
      }
      java.util.Arrays.sort(out)
      var m = 1; i = 1
      while (i < out.length) {
        if (out(i) != out(m - 1)) { out(m) = out(i); m += 1 }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(out, m))
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n"); val out = ctx.freshName("out")
        val i = ctx.freshName("i"); val m = ctx.freshName("m")
        val h = ctx.freshName("h")
        val xxh = classOf[XXH64].getName
        s"""
           |int $n = $a.numElements();
           |long[] $out = new long[$n < 3 ? 0 : $n - 2];
           |for (int $i = 0; $i < $n - 2; $i++) {
           |  long $h = $xxh.hashUTF8String($a.getUTF8String($i), 42L);
           |  $h = $xxh.hashUTF8String($a.getUTF8String($i + 1), $h);
           |  $h = $xxh.hashUTF8String($a.getUTF8String($i + 2), $h);
           |  $out[$i] = $h;
           |}
           |java.util.Arrays.sort($out);
           |int $m = $out.length > 0 ? 1 : 0;
           |for (int $i = 1; $i < $out.length; $i++) {
           |  if ($out[$i] != $out[$m - 1]) { $out[$m] = $out[$i]; $m++; }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  java.util.Arrays.copyOf($out, $m));
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Grams3Hashes =
      copy(child = c)
  }

  /** Random-hyperplane LSH bucket over an array<double> vector: bit p
    * of the result is the sign of ⟨v, r_p⟩ where plane r_p's component
    * for dimension d is ±1 from the parity of xxhash64(p, d) (the same
    * two-step seed-42 hash chain the SQL builtin computes for two int
    * args: hashInt(d, hashInt(p, 42))) — deterministic, no stored plane
    * matrix, recomputed identically on every executor. */
  case class HyperplaneBucket(child: Expression, planes: Int, table: Int = 0)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_hyperplane_bucket"
    override def checkInputDataTypes(): TypeCheckResult =
      expectArrays(prettyName, child -> DoubleType)

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = v.numElements()
      var bucket = 0L; var p = 0
      while (p < planes) {
        val seedP = XXH64.hashInt(table * planes + p, 42L)
        var s = 0.0; var d = 0
        while (d < n) {
          val sign = if ((XXH64.hashInt(d, seedP) & 1L) == 1L) 1.0 else -1.0
          s += v.getDouble(d) * sign
          d += 1
        }
        if (s > 0) bucket |= (1L << p)
        p += 1
      }
      bucket
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n"); val bucket = ctx.freshName("bucket")
        val p = ctx.freshName("p"); val d = ctx.freshName("d")
        val s = ctx.freshName("s"); val seedP = ctx.freshName("seedP")
        val xxh = classOf[XXH64].getName
        s"""
           |int $n = $a.numElements();
           |long $bucket = 0L;
           |for (int $p = 0; $p < $planes; $p++) {
           |  long $seedP = $xxh.hashInt(${table * planes} + $p, 42L);
           |  double $s = 0.0;
           |  for (int $d = 0; $d < $n; $d++) {
           |    $s += $a.getDouble($d) *
           |      ((($xxh.hashInt($d, $seedP)) & 1L) == 1L ? 1.0 : -1.0);
           |  }
           |  if ($s > 0) $bucket |= (1L << $p);
           |}
           |${ev.value} = $bucket;
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): HyperplaneBucket =
      copy(child = c)
  }

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an int literal, got $other")
  }

  /** Name → builder for every graft SQL function (single source of
    * truth for both registration paths). */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot"         -> (args => DotProduct(args(0), args(1))),
    "graft_simhash64"   -> (args => SimHash64(args(0))),
    "graft_minhash32"   -> (args => MinHashSig(args(0), 32)),
    "graft_hyperplane8" -> (args => HyperplaneBucket(args(0), 8)),
    // 3-arg variant: (vector, planes literal, table-index literal) —
    // each table draws an independent plane set (OR-construction)
    "graft_hyperplane_t" -> (args =>
      HyperplaneBucket(args(0), intLit(args(1), "planes"), intLit(args(2), "table"))),
    "graft_grams3h"     -> (args => Grams3Hashes(args(0))),
    "graft_minhash_merge32" -> (args =>
      AggExprs.MinHashMerge(args(0), 32).toAggregateExpression()))

  /** Register the expressions as SQL temp functions on the session's
    * registry (idempotent; survives only the session, so every operator
    * entry point calls this — cheap map insert after the first time).
    * Going through the registry keeps us on public-ish API: `expr(...)`
    * resolves the name at analysis, no internal Column constructors.
    * Sessions built with `spark.sql.extensions=graft.GraftExtensions`
    * get the same functions without this call. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}
