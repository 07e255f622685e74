package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-subsequence length over two token arrays — the kernel
  * under ROUGE-L (Lin 2004: LCS-based recall/precision, the "in order
  * but not contiguous" overlap ROUGE-2's fixed bigrams miss).
  *
  * One-row dynamic program: O(m·n) time, O(n) space, no allocation
  * beyond the row and a one-time cache of the right side's tokens
  * (UTF8String.equals is a byte compare — no string decoding). Ships as
  * a BinaryExpression with `doGenCode`, so per-pair scoring projections
  * stay inside whole-stage codegen; callers CAP the token arrays
  * (`slice`) because LCS cost is inherently quadratic per pair — the
  * cap is part of the metric's contract, not an optimization knob. */
object Lcs {

  def lcsLength(a: Column, b: Column): Column =
    GraftBridge.column(LcsLengthExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  case class LcsLengthExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "lcs_length"

    override def nullSafeEval(a: Any, b: Any): Any =
      LcsKernel.length(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        // top-level object → static forwarder Janino can resolve
        s"${ev.value} = graft.functions.LcsKernel.length($a, $b);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }
}

/** Shared by LcsLengthExpr's interpreted eval and generated code. Top
  * level so generated Java sees a static method. */
object LcsKernel {
  def length(a: ArrayData, b: ArrayData): Long = {
    val m = a.numElements()
    val n = b.numElements()
    if (m == 0 || n == 0) return 0L
    val bs = new Array[UTF8String](n)
    var j = 0
    while (j < n) { bs(j) = b.getUTF8String(j); j += 1 }
    val row = new Array[Int](n + 1)
    var i = 0
    while (i < m) {
      val ai = a.getUTF8String(i)
      var diag = 0 // previous row's [j-1]
      j = 1
      while (j <= n) {
        val up = row(j)
        row(j) =
          if (ai.equals(bs(j - 1))) diag + 1
          else if (row(j) >= row(j - 1)) row(j)
          else row(j - 1)
        diag = up
        j += 1
      }
      i += 1
    }
    row(n).toLong
  }
}
