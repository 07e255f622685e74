package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructField, StructType}

/** Primitive-loop vector kernels. The declarative equivalent
  * (`zip_with` + `aggregate` lambdas) is evaluated interpreted with per-
  * element boxing — ~10× slower on 64-dim float arrays. These expressions
  * keep EXACTLY the same arithmetic (elementwise float→double widening,
  * left-to-right double accumulation, dot/(√na·√nb)) so results stay
  * bit-identical to the lambda path and the DuckDB oracle.
  *
  * All three implement `doGenCode` (not CodegenFallback): a fallback
  * expression anywhere in a projection knocks that operator out of
  * whole-stage codegen, which is exactly the span the ANN scans live in. */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    CosineSimExpr.cosine(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CosineSimExpr.cosine(" +
        s"$a.toFloatArray(), $b.toFloatArray());")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CosineSimExpr {
  /** Shared by interpreted eval and generated code — one arithmetic. */
  def cosine(x: Array[Float], y: Array[Float]): Double = {
    val n = math.min(x.length, y.length)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x(i).toDouble * y(i).toDouble; i += 1 }
    var na = 0.0
    i = 0
    while (i < x.length) { na += x(i).toDouble * x(i).toDouble; i += 1 }
    var nb = 0.0
    i = 0
    while (i < y.length) { nb += y(i).toDouble * y(i).toDouble; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Σ_i vec[i]·w[i] against a LITERAL weight vector, left-to-right double
  * accumulation — the compact twin of the unrolled
  * `(0 until d).map(get(vec, i)·w(i)).reduce(+)` tree. The unrolled form
  * is O(d) plan NODES (384 for a 6-plane LSH bucket): Catalyst re-analyzes
  * and re-optimizes it on every execution, which at 64+ dims costs more
  * than the actual data pass. One loop expression keeps the plan O(1).
  * Null when the array is shorter than the weights (same as get() OOB →
  * null propagating through the sum). */
case class DotLiteralExpr(child: Expression, weights: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_literal"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    if (x.length < weights.length) null
    else DotLiteralExpr.dot(x, weights)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("weights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val x = ctx.freshName("x")
      s"""float[] $x = $a.toFloatArray();
         |if ($x.length < $w.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.DotLiteralExpr.dot($x, $w);
         |}""".stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object DotLiteralExpr {
  def dot(x: Array[Float], w: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < w.length) { acc += x(i).toDouble * w(i); i += 1 }
    acc
  }
}

/** Σ_i vec[i]², identical fold order to
  * `aggregate(v, 0.0, (acc, x) => acc + x·x)` without boxed lambdas. */
case class Norm2Expr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "norm2"

  override def nullSafeEval(a: Any): Any =
    Norm2Expr.norm2(a.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Norm2Expr.norm2($a.toFloatArray());")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Norm2Expr {
  def norm2(x: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < x.length) { acc += x(i).toDouble * x(i).toDouble; i += 1 }
    acc
  }
}

/** Upper-triangle Gram products in 2^40 fixed point: out[k] =
  * round(x[i]·x[j]·scale) for 0 ≤ i ≤ j < n, row-major over the triangle.
  * The map-only kernel behind `Linalg.covariance` — the declarative
  * nested-`transform` form is interpreted per element (HOFs never enter
  * whole-stage codegen) and measured ~4× slower at dim 64.
  *
  * Rounding is half-away-from-zero on the BINARY double value, decided
  * by exact comparison against the `floor(v) + 0.5` boundary (itself
  * exactly representable — callers' inputs are unit-scale floats,
  * products ≤ ~2^46 ≪ 2^51). This equals
  * Spark SQL `round()` (BigDecimal HALF_UP on the shortest-roundtrip
  * string — order-preserving vs the .5 boundary, and exact .5 is dyadic
  * so both representations agree) and DuckDB/C `round()` — the same
  * equivalence the expression-path fixed-point ops rely on, here in one
  * JVM helper the gate (q110/q113/q140) covers end to end. */
case class GramFixExpr(child: Expression, scale: Double)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)
  override def prettyName: String = "gram_fix"

  override def nullSafeEval(a: Any): Any =
    ArrayData.toArrayData(
      GramFixExpr.gram(a.asInstanceOf[ArrayData].toFloatArray(), scale))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  graft.functions.GramFixExpr.gram($a.toFloatArray(), $scale));""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object GramFixExpr {
  def roundHalfAway(v: Double): Long = {
    val f = math.floor(v)
    // compare against the EXACT boundary f + 0.5 (representable for
    // |f| < 2^51) — a v − f subtraction is inexact near the boundary
    // (e.g. −0.49999999999999994 − (−1) ties-to-even at exactly 0.5 and
    // would round the wrong way)
    val t = f + 0.5
    if (v > t) f.toLong + 1
    else if (v < t) f.toLong
    else if (v >= 0) f.toLong + 1 // true tie: away from zero
    else f.toLong
  }

  def gram(x: Array[Float], scale: Double): Array[Long] = {
    val n = x.length
    val out = new Array[Long](n * (n + 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val xi = x(i).toDouble
      var j = i
      while (j < n) {
        out(k) = roundHalfAway(xi * x(j).toDouble * scale)
        k += 1; j += 1
      }
      i += 1
    }
    out
  }
}

/** PQ encode as ONE loop kernel: per subspace, argmin over the codebook
  * entries' slice-L2 — ascending-dim fold, first-entry init + strict-<
  * update (keeps the lowest cid on ties), recon_err accumulated in
  * ascending subspace order. Bit-identical arithmetic and tie-break to
  * the least(struct(d2, cid)) expression chain it replaces, which at
  * k=16 × 8 subspaces unrolled to ~2,500 Catalyst nodes and made
  * per-execution planning dominate q112/q155 (the round-2
  * DotLiteralExpr lesson). Returns struct(codes array<int>, recon_err
  * double). */
case class PqEncodeExpr(child: Expression, codebook: Array[Array[Float]],
    subspaces: Int) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("recon_err", DoubleType, nullable = false)))
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(a: Any): Any =
    PqEncodeExpr.encode(a.asInstanceOf[ArrayData].toFloatArray(), codebook, subspaces)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("codebook", codebook, "float[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PqEncodeExpr.encode($a.toFloatArray(), $cb, $subspaces);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PqEncodeExpr {
  def encode(x: Array[Float], cb: Array[Array[Float]],
      subspaces: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val dim = cb(0).length
    val subDim = dim / subspaces
    val codes = new Array[Int](subspaces)
    var err = 0.0
    var s = 0
    while (s < subspaces) {
      val off = s * subDim
      // cid 0 first (the least() fold's leftmost element), then strict-<
      var bestD = sliceD2(x, cb(0), off, subDim)
      var bestC = 0
      var c = 1
      while (c < cb.length) {
        val d = sliceD2(x, cb(c), off, subDim)
        if (d < bestD) { bestD = d; bestC = c }
        c += 1
      }
      codes(s) = bestC
      err += bestD
      s += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(codes),
      err))
  }

  private def sliceD2(x: Array[Float], cv: Array[Float], off: Int, subDim: Int): Double = {
    var acc = 0.0
    var j = 0
    while (j < subDim) {
      val d = x(off + j).toDouble - cv(off + j).toDouble
      acc += d * d
      j += 1
    }
    acc
  }
}

object VectorOps {
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimExpr(GraftBridge.expression(a), GraftBridge.expression(b)))

  def dotLiteral(a: Column, w: Array[Double]): Column =
    GraftBridge.column(DotLiteralExpr(GraftBridge.expression(a), w))

  def norm2Fast(a: Column): Column =
    GraftBridge.column(Norm2Expr(GraftBridge.expression(a)))

  def gramFix(a: Column, scale: Double): Column =
    GraftBridge.column(GramFixExpr(GraftBridge.expression(a), scale))

  def pqEncodeFast(a: Column, codebook: Array[Array[Float]], subspaces: Int): Column =
    GraftBridge.column(PqEncodeExpr(GraftBridge.expression(a), codebook, subspaces))
}
