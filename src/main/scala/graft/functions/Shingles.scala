package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct whitespace word k-shingles in one pass — the fused twin of
  * Dedup.shinglesDeclarative (slice/zip_with/array_distinct), which runs
  * as interpreted lambdas with per-element boxing on the dedup hot path.
  *
  * Semantics replicated exactly: tokens = split(lower(text), " ") (single
  * space, adjacent delimiters yield empty tokens), shingle i =
  * tokens[i..i+k-1] joined by one space, distinct keeps first-occurrence
  * order; fewer than k tokens → empty array. Lowercasing goes through
  * UTF8String.toLowerCase — the same call Spark's `lower` makes. */
case class ShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toLowerCase.toString
    // split(s, " ") semantics incl. trailing-empty removal quirks are
    // java's split with limit -1 in Spark: KEEPS trailing empties
    val toks = s.split(" ", -1)
    val n = toks.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Shingles {
  def wordShingles(text: Column, k: Int): Column =
    GraftBridge.column(ShinglesExpr(GraftBridge.expression(text), k))
}
