package graft.functions

import java.util.concurrent.ConcurrentHashMap
import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Column-side-pattern regex kernels with a compiled-pattern CACHE.
  *
  * Spark's `RLike`/`RegExpExtractAll` memoize only the LAST pattern value:
  * in a broadcast theta-join against a pattern table the pattern alternates
  * on every candidate row, so every evaluation recompiles — the dominant
  * cost of the relational regex-join fallback. These expressions share one
  * bounded per-executor cache keyed by the pattern string; matching
  * semantics are byte-for-byte java.util.regex, identical to the builtins. */
private[functions] object RegexCache {
  private val MaxEntries = 10000
  private val cache = new ConcurrentHashMap[String, Pattern]()
  def get(pat: UTF8String): Pattern = {
    val k = pat.toString
    val hit = cache.get(k)
    if (hit != null) hit
    else {
      val p = Pattern.compile(k)
      if (cache.size < MaxEntries) cache.put(k, p)
      p
    }
  }
}

/** rlike with the shared pattern cache (unanchored find, like RLike). */
case class RLikeCachedExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "rlike_cached"
  override def nullSafeEval(s: Any, p: Any): Any =
    RegexCache.get(p.asInstanceOf[UTF8String])
      .matcher(s.asInstanceOf[UTF8String].toString).find()
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Longest findall match (ties → lexicographically smallest) with the
  * shared pattern cache — one expression instead of
  * regexp_extract_all + array_sort + head, same re.findall/max(key=len)
  * semantics as RegexMatch.longestMatch. Null when nothing matches. */
case class LongestFindallCachedExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "longest_findall_cached"
  override def nullSafeEval(s: Any, p: Any): Any = {
    val m: Matcher = RegexCache.get(p.asInstanceOf[UTF8String])
      .matcher(s.asInstanceOf[UTF8String].toString)
    var best: String = null
    while (m.find()) {
      val g = m.group()
      if (best == null || g.length > best.length ||
        (g.length == best.length && g.compareTo(best) < 0)) best = g
    }
    if (best == null) null else UTF8String.fromString(best)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object RegexCached {
  def rlikeCached(text: Column, pattern: Column): Column =
    GraftBridge.column(RLikeCachedExpr(
      GraftBridge.expression(text), GraftBridge.expression(pattern)))

  def longestFindall(text: Column, pattern: Column): Column =
    GraftBridge.column(LongestFindallCachedExpr(
      GraftBridge.expression(text), GraftBridge.expression(pattern)))
}
