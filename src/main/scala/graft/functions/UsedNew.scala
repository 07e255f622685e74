package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass twin of Enrich.usedNew's declarative form
  * (split + arrays_overlap ×2 + per-token year regex): walk the
  * space-delimited tokens once — "new" if any token equals a new-marker,
  * else "used" if any token equals a used-marker or is a 4-digit year in
  * [yearLo, yearHi], else "new".
  *
  * Token semantics replicate `split(text, " ")` exactly (adjacent
  * delimiters produce empty tokens, which match nothing). Bit-identical
  * to the declarative chain — property-tested. */
case class UsedNewExpr(child: Expression, usedMarkers: Seq[String],
    newMarkers: Seq[String], yearLo: Int, yearHi: Int)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "used_new"
  // Total like the declarative chain: null text classifies as "new"
  // (when(null,..).when(null,..).otherwise("new") in usedNewDeclarative).
  override def nullable: Boolean = false

  @transient private lazy val usedSet = usedMarkers.toSet
  @transient private lazy val newSet = newMarkers.toSet
  @transient private lazy val loS = yearLo.toString
  @transient private lazy val hiS = yearHi.toString

  private def isYear(t: String): Boolean =
    t.length == 4 && t.forall(c => c >= '0' && c <= '9') &&
      t.compareTo(loS) >= 0 && t.compareTo(hiS) <= 0

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var usedHit = false
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        val tok = s.substring(start, i)
        if (newSet.contains(tok)) return UsedNewExpr.NEW // new overrides all
        if (!usedHit && (usedSet.contains(tok) || isYear(tok))) usedHit = true
        start = i + 1
      }
      i += 1
    }
    if (usedHit) UsedNewExpr.USED else UsedNewExpr.NEW
  }

  /** Null-tolerant entry point shared by eval and codegen. */
  def evalNullable(input: Any): Any =
    if (input == null) UsedNewExpr.NEW else nullSafeEval(input)

  override def eval(input: InternalRow): Any = evalNullable(child.eval(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("usedNewExpr", this, classOf[UsedNewExpr].getName)
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      UTF8String ${ev.value} = (UTF8String) $self.evalNullable(
        ${childGen.isNull} ? null : ${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object UsedNewExpr {
  private val NEW = UTF8String.fromString("new")
  private val USED = UTF8String.fromString("used")
}

object UsedNew {
  def fused(text: Column, usedMarkers: Seq[String], newMarkers: Seq[String],
      yearLo: Int, yearHi: Int): Column =
    GraftBridge.column(UsedNewExpr(GraftBridge.expression(text),
      usedMarkers, newMarkers, yearLo, yearHi))
}
