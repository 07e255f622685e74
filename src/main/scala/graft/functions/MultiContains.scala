package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Aho-Corasick automaton over a fixed keyword list. Matching a text is
  * O(|text| + matches) regardless of keyword count — vs the O(keywords ×
  * |text|) of chained `contains`, which is the reference's hot loop
  * (`data_processing_program_20240520.py:75-96`: every row × every brand/
  * model substring scan).
  *
  * `firstByOrder` returns the contained keyword with the LOWEST list index
  * (the reference's first-in-reference-order tie-break), `longest` the
  * longest contained keyword (its longest-model tie-break). */
final class AhoCorasick(keywords: Array[String]) extends Serializable {
  // flat automaton: per-node transition map, fail link, matched kw indices
  private val next = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
  private val fail = mutable.ArrayBuffer(0)
  private val out = mutable.ArrayBuffer(List.empty[Int])

  keywords.zipWithIndex.foreach { case (kw, i) =>
    var node = 0
    kw.foreach { ch =>
      node = next(node).getOrElseUpdate(ch, {
        next += mutable.Map.empty[Char, Int]
        fail += 0
        out += Nil
        next.size - 1
      })
    }
    out(node) ::= i
  }
  locally { // BFS fail links
    val q = mutable.Queue.empty[Int]
    next(0).values.foreach(q.enqueue)
    while (q.nonEmpty) {
      val u = q.dequeue()
      next(u).foreach { case (ch, v) =>
        q.enqueue(v)
        var f = fail(u)
        while (f != 0 && !next(f).contains(ch)) f = fail(f)
        fail(v) = if (f != u && next(f).contains(ch)) next(f)(ch) else 0
        out(v) :::= out(fail(v))
      }
    }
  }

  @inline private def step(state: Int, ch: Char): Int = {
    var s = state
    while (s != 0 && !next(s).contains(ch)) s = fail(s)
    next(s).getOrElse(ch, 0)
  }

  /** Index (in the original list) of the first-by-order contained keyword,
    * or -1. Early-exits when index 0 is seen. */
  def firstByOrder(text: String): Int = {
    var best = Int.MaxValue
    var s = 0
    var i = 0
    while (i < text.length && best > 0) {
      s = step(s, text.charAt(i))
      out(s).foreach(k => if (k < best) best = k)
      i += 1
    }
    if (best == Int.MaxValue) -1 else best
  }

  /** Index of the longest contained keyword (ties → smallest index after
    * the caller pre-sorts; here: lexicographic via keyword compare), -1. */
  def longest(text: String): Int = {
    var best = -1
    var s = 0
    var i = 0
    while (i < text.length) {
      s = step(s, text.charAt(i))
      out(s).foreach { k =>
        if (best == -1) best = k
        else {
          val a = keywords(k); val b = keywords(best)
          if (a.length > b.length || (a.length == b.length && a < b)) best = k
        }
      }
      i += 1
    }
    best
  }
}

/** Catalyst expression: first keyword (in list order) contained in `child`,
  * else null. The automaton builds once per executor (lazy transient) and
  * is shared across rows — the per-row cost is O(|text|).
  *
  * CodegenFallback is deliberate: the win is the automaton, not codegen,
  * and a fallback expression keeps the surrounding WholeStageCodegen span
  * intact for the other columns. */
case class MultiContainsFirst(child: Expression, keywords: Seq[String])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "multi_contains_first"

  @transient private lazy val ac = new AhoCorasick(keywords.toArray)
  @transient private lazy val utf8 = keywords.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any = {
    val i = ac.firstByOrder(input.asInstanceOf[UTF8String].toString)
    if (i < 0) null else utf8(i)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Catalyst expression: longest contained keyword (ties lexicographic). */
case class MultiContainsLongest(child: Expression, keywords: Seq[String])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "multi_contains_longest"

  @transient private lazy val ac = new AhoCorasick(keywords.toArray)
  @transient private lazy val utf8 = keywords.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any = {
    val i = ac.longest(input.asInstanceOf[UTF8String].toString)
    if (i < 0) null else utf8(i)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MultiContains {
  /** First-in-list-order contained keyword (reference J1 semantics). */
  def multiContainsFirst(c: Column, keywords: Seq[String]): Column =
    GraftBridge.column(MultiContainsFirst(GraftBridge.expression(c), keywords))

  /** Longest contained keyword (reference J2 semantics). */
  def multiContainsLongest(c: Column, keywords: Seq[String]): Column =
    GraftBridge.column(MultiContainsLongest(GraftBridge.expression(c), keywords))
}
