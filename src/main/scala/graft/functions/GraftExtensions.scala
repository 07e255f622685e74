package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.unsafe.types.UTF8String

/** SQL-surface registration of the library's custom Catalyst expressions,
  * so `spark.sql("SELECT cosine_sim(a, b) ...")` works alongside the
  * Column API.
  *
  * Two entry points, same registrations:
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *    build time (the cluster-deploy path — SparkSessionExtensions only
  *    applies to sessions created AFTER it is configured);
  *  - `GraftFunctions.register(spark)` on a live session (tests, REPL).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.registrations.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.JaroWinklerLengthPrune)
  }
}

object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.functions", null, name, usage, "")

  /** Evaluate foldable string arguments (keyword lists arrive as SQL
    * literals; the automaton needs them at plan time). */
  private def literalStrings(es: Seq[Expression], fn: String): Seq[String] = es.map {
    case e if e.foldable && e.eval() != null => e.eval() match {
      case s: UTF8String => s.toString
      case other => other.toString
    }
    case e => throw new IllegalArgumentException(
      s"$fn: keyword arguments must be non-null string literals, got $e")
  }

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float vectors"),
      (args: Seq[Expression]) => CosineSimExpr(args(0), args(1))),
    (FunctionIdentifier("vec_norm2"),
      info("vec_norm2", "vec_norm2(a) - sum of squares of a float vector"),
      (args: Seq[Expression]) => Norm2Expr(args(0))),
    (FunctionIdentifier("multi_contains_first"),
      info("multi_contains_first",
        "multi_contains_first(text, kw, ...) - first listed keyword contained in text (Aho-Corasick)"),
      (args: Seq[Expression]) =>
        MultiContainsFirst(args.head, literalStrings(args.tail, "multi_contains_first"))),
    (FunctionIdentifier("multi_contains_longest"),
      info("multi_contains_longest",
        "multi_contains_longest(text, kw, ...) - longest listed keyword contained in text"),
      (args: Seq[Expression]) =>
        MultiContainsLongest(args.head, literalStrings(args.tail, "multi_contains_longest"))))

  /** Register on an already-built session (extensions can't retrofit). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
