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

/** The whole literal regex-KB pick as ONE expression: for each gated
  * pattern, find its longest findall match; the winner is chosen by
  * (match length desc, pattern priority asc, pattern ordinal asc) —
  * exactly RegexMatch.literalRegexBest's greatest-struct fold, which this
  * replaces (that fold builds ~6 plan nodes per pattern and re-evaluates
  * sort/extract trees; this is one pass with per-instance compiled
  * patterns). Children: the text and one boolean-array gate column.
  * Returns struct(ord INT, matched STRING, n_matched INT), null when no
  * gated pattern matches. */
case class LiteralRegexBestExpr(left: Expression, right: Expression,
    patterns: Seq[String], prios: Seq[Int], findallLongest: Boolean)
    extends BinaryExpression with CodegenFallback {
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
  import org.apache.spark.sql.catalyst.InternalRow

  override def dataType: DataType = StructType(Seq(
    StructField("ord", IntegerType, nullable = false),
    StructField("matched", StringType, nullable = false),
    StructField("n_matched", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "literal_regex_best"

  @transient private lazy val compiled: Array[Pattern] =
    patterns.map(Pattern.compile).toArray

  private def bestMatch(m: Matcher): String = {
    var best: String = null
    if (findallLongest) {
      while (m.find()) {
        val g = m.group()
        if (best == null || g.length > best.length ||
          (g.length == best.length && g.compareTo(best) < 0)) best = g
      }
    } else if (m.find()) best = m.group()
    best
  }

  override def nullSafeEval(textAny: Any, gatesAny: Any): Any = {
    val text = textAny.asInstanceOf[UTF8String].toString
    val gates = gatesAny.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var bestLen = 0
    var bestPrio = 0
    var bestOrd = -1
    var bestStr: String = null
    var nMatched = 0
    var i = 0
    while (i < compiled.length) {
      if (!gates.isNullAt(i) && gates.getBoolean(i)) {
        val s = bestMatch(compiled(i).matcher(text))
        if (s != null && s.length > 0) {
          nMatched += 1
          // (len desc, prio asc, ord asc); prio = -patternLength upstream
          if (bestOrd < 0 || s.length > bestLen ||
            (s.length == bestLen && prios(i) < bestPrio)) {
            bestLen = s.length; bestPrio = prios(i); bestOrd = i; bestStr = s
          }
        }
      }
      i += 1
    }
    if (bestOrd < 0) null
    else InternalRow(bestOrd, UTF8String.fromString(bestStr), nMatched)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object LiteralRegexBest {
  /** `patterns`: (regex, priority, gate) — priority ascending preferred on
    * equal match length (callers pass -pattern.length), gates evaluated
    * per row. */
  def apply(text: Column, patterns: Seq[(String, Int, Column)],
      findallLongest: Boolean): Column = {
    import org.apache.spark.sql.functions.array
    val gates = array(patterns.map(_._3): _*)
    GraftBridge.column(LiteralRegexBestExpr(
      GraftBridge.expression(text), GraftBridge.expression(gates),
      patterns.map(_._1), patterns.map(_._2), findallLongest))
  }
}
