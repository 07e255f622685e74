package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Word-level Levenshtein distance over two token arrays — the kernel
  * under WER (word error rate), the reference-transcription metric ASR
  * and seq2seq evals report: minimum substitutions + insertions +
  * deletions turning the candidate into the reference, at TOKEN
  * granularity (char-level edit distance over-credits long shared
  * words; q190's edit-d1 join is the char-level cousin).
  *
  * Two-row dynamic program: O(m·n) time, O(n) space, no allocation
  * beyond the row and a one-time cache of the right side's tokens
  * (UTF8String.equals is a byte compare). Ships as a BinaryExpression
  * with `doGenCode` so per-pair scoring stays inside whole-stage
  * codegen; callers CAP the token arrays (`slice`) because the DP is
  * inherently quadratic per pair — the cap is part of the metric's
  * contract (same convention as [[Lcs]]). */
object WordLev {

  def wordLevenshtein(a: Column, b: Column): Column =
    GraftBridge.column(WordLevExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  case class WordLevExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "word_levenshtein"

    override def nullSafeEval(a: Any, b: Any): Any =
      WordLevKernel.distance(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        // top-level object → static forwarder Janino can resolve
        s"${ev.value} = graft.functions.WordLevKernel.distance($a, $b);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }
}

/** Shared by WordLevExpr's interpreted eval and generated code. Top
  * level so generated Java sees a static method. */
object WordLevKernel {
  def distance(a: ArrayData, b: ArrayData): Long = {
    val m = a.numElements()
    val n = b.numElements()
    if (m == 0) return n.toLong
    if (n == 0) return m.toLong
    val bs = new Array[UTF8String](n)
    var j = 0
    while (j < n) { bs(j) = b.getUTF8String(j); j += 1 }
    val row = new Array[Int](n + 1)
    j = 0
    while (j <= n) { row(j) = j; j += 1 }
    var i = 1
    while (i <= m) {
      val ai = a.getUTF8String(i - 1)
      var diag = row(0) // d[i-1][j-1]
      row(0) = i
      j = 1
      while (j <= n) {
        val up = row(j) // d[i-1][j]
        val sub = if (ai.equals(bs(j - 1))) diag else diag + 1
        var best = sub
        if (up + 1 < best) best = up + 1
        if (row(j - 1) + 1 < best) best = row(j - 1) + 1
        row(j) = best
        diag = up
        j += 1
      }
      i += 1
    }
    row(n).toLong
  }
}
