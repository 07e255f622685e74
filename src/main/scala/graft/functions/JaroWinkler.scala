package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity (Jaro 1989, Winkler 1990 — THE
  * record-linkage name comparator; the graded sibling of the exact
  * field-equality the Fellegi–Sunter scorer (q348) starts from):
  * canonical formulation — match window ⌊max(l1,l2)/2⌋−1, half-counted
  * transpositions, Winkler prefix boost (≤ 4 chars, scale 0.1) applied
  * only when jaro > 0.7. Matches DuckDB's `jaro_winkler_similarity`
  * semantics, which is what gates it.
  *
  * Implemented as a native `BinaryExpression` with `doGenCode` calling a
  * static kernel — similarity-join projections stay inside whole-stage
  * codegen with zero boxing (the SortedIntersectCountExpr pattern). */
object JaroWinklerKernel {

  /** Canonical Jaro–Winkler over UTF-16 code units. */
  def sim(aS: UTF8String, bS: UTF8String): Double = {
    val a = aS.toString; val b = bS.toString
    val l1 = a.length; val l2 = b.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val aM = new Array[Boolean](l1)
    val bM = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a.charAt(i) == b.charAt(j)) {
          aM(i) = true; bM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val mt = t / 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 +
      (m - mt).toDouble / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var p = 0
      val maxP = math.min(4, math.min(l1, l2))
      while (p < maxP && a.charAt(p) == b.charAt(p)) p += 1
      jaro + 0.1 * p * (1.0 - jaro)
    }
  }
}

object JaroWinkler {

  case class JaroWinklerExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaro_winkler"

    override def nullSafeEval(a: Any, b: Any): Any =
      JaroWinklerKernel.sim(a.asInstanceOf[UTF8String],
        b.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.JaroWinklerKernel.sim($a, $b);")

    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): Expression = copy(left = l, right = r)
  }

  def jaroWinkler(a: Column, b: Column): Column =
    GraftBridge.column(JaroWinklerExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
