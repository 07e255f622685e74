package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions.{concat, lit, raise_error, when}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert curve index (the classic xy→d walk, e.g. Hamilton's compact
  * Hilbert indices / Wikipedia's public formulation): strictly better
  * multi-dimensional locality than Z-order — every curve step moves one
  * cell, so file ranges under a Hilbert sort are CONTIGUOUS rectangles
  * more often than Morton's quadrant jumps. The per-bit rotate is
  * inherently sequential state, so it ships as a native kernel +
  * codegen'd BinaryExpression (the JaroWinklerKernel pattern), not a
  * Column-combinator tree; the oracle unrolls the same walk as
  * generated chained CTEs. */
object HilbertKernel {
  /** Map (x, y) in [0, 2^order)² to the Hilbert distance d. */
  def xy2d(order: Int, xIn: Long, yIn: Long): Long = {
    var x = xIn; var y = yIn
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) { // rotate quadrant
        val nx = if (rx == 1) s - 1 - y else y
        val ny = if (rx == 1) s - 1 - x else x
        x = nx; y = ny
      }
      s >>= 1
    }
    d
  }
}

object Hilbert {

  case class HilbertExpr(left: Expression, right: Expression, order: Int)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "hilbert_d"

    override def nullSafeEval(a: Any, b: Any): Any =
      HilbertKernel.xy2d(order, a.asInstanceOf[Long], b.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.HilbertKernel.xy2d($order, $a, $b);")

    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): Expression = copy(left = l, right = r)
  }

  /** Hilbert key of two non-negative integer columns over `order` bits
    * per dimension (order ≤ 31 keeps d = x·y ranges in a Long).
    * Domain-reduction contract (shared verbatim with
    * `Layout.zOrderKey` so the two clustering keys never diverge on
    * identical input): a NEGATIVE coordinate raises — that is a sign
    * bug at the caller, and silently wrapping it to 2^order−1 would
    * plant the row at the far end of the curve; a non-negative
    * coordinate is MASKED to its low `order` bits (the curve is only
    * defined on [0, 2^order)², so a caller forgetting the `% 2^order`
    * reduction gets the reduction, not a non-curve key). */
  def hilbertKey(x: Column, y: Column, order: Int): Column = {
    require(order >= 1 && order <= 31, s"order must be in [1, 31], got $order")
    val mask = (1L << order) - 1
    def nonNeg(c: Column) = {
      val l = c.cast("long")
      when(l < 0, raise_error(concat(
        lit("hilbertKey requires non-negative coordinates, got "),
        l.cast("string")))).otherwise(l)
    }
    GraftBridge.column(HilbertExpr(
      GraftBridge.expression(nonNeg(x).bitwiseAND(mask)),
      GraftBridge.expression(nonNeg(y).bitwiseAND(mask)), order))
  }
}
