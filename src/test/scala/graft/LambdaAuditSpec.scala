package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{
  ArrayAggregate, ArrayDistinct, ArrayExcept, ArrayIntersect, ArrayJoin,
  ArrayMax, ArrayMin, ArrayPosition, ArraysOverlap, ArrayUnion, CreateArray,
  Expression, HigherOrderFunction, LambdaFunction, Levenshtein, Lower, Md5,
  NamedLambdaVariable, RegExpExtract, RegExpExtractAll, RegExpReplace, RLike,
  Sha1, Sha2, SortArray, StringSplit, Upper}
import org.apache.spark.sql.functions._

/** Automated detector for the CSE-exemption lambda trap that plan-level
  * audits cannot see: Catalyst does NOT common-subexpression-eliminate
  * higher-order-function lambda BODIES, so an O(array) expression inside
  * a per-element lambda that does not depend on the lambda's variables
  * re-evaluates on EVERY element — O(n²) per row. Both quadratics the
  * round-15 3× sweep exposed had exactly this shape:
  *
  *   - q240 isotropy: `transform(v, x -> x / sqrt(aggregate(v, …)))`
  *     — the norm re-folds the full vector per element (measured 4.1× on
  *     3× data; fix: hoist the norm to a per-row column);
  *   - q79/q163 packing: an `aggregate` whose accumulator grew by
  *     array-concat per element — O(n²) copy work inside ONE lambda.
  *
  * Rule enforced: inside any lambda body, an O(array)-cost expression
  * (a nested higher-order function, or a scan-the-whole-array builtin)
  * must either reference an enclosing lambda variable (then it varies
  * per element and the work is inherent) or be FOLDABLE (a literal
  * stopword list is a bounded constant). Anything else is an
  * invariant full-array computation that belongs OUTSIDE the lambda.
  * The concat-growth shape is approximated by its observable: a
  * `concat`/`array_union`-class node whose ACCUMULATOR argument is the
  * lambda variable of an `aggregate` — growing state per element. */
class LambdaAuditSpec extends SparkSpec {
  import spark.implicits._

  /** O(whole-array) builtins worth flagging when their array input is
    * lambda-invariant and non-foldable. */
  private def costlyArrayScan(e: Expression): Boolean = e match {
    case _: ArrayMax | _: ArrayMin | _: SortArray | _: ArrayDistinct |
         _: ArrayPosition | _: ArraysOverlap | _: ArrayUnion |
         _: ArrayIntersect | _: ArrayExcept | _: ArrayJoin |
         _: ArrayAggregate => true
    case h: HigherOrderFunction => h != null
    case _ => false
  }

  /** O(string-length) compute nodes — the STRING variant of the same
    * trap: a `split`/`regexp`/`digest` over a lambda-invariant input
    * re-runs per element, O(len·elements) per row (the r12-found
    * gramCounts/chrF shape: `get(split(lower(text)), i+j)` re-split the
    * text once per token slot; chrF's `substr` re-ran the whitespace
    * regexp per character position). */
  private def costlyStringScan(e: Expression): Boolean = e match {
    case _: StringSplit | _: RegExpReplace | _: RegExpExtract |
         _: RegExpExtractAll | _: RLike | _: Lower | _: Upper |
         _: Md5 | _: Sha1 | _: Sha2 | _: Levenshtein => true
    case _ => false
  }

  private def referencesLambdaVar(e: Expression): Boolean =
    e.exists(_.isInstanceOf[NamedLambdaVariable])

  /** `Let.bindOnce`'s shape: a HOF over a ONE-element array literal is
    * a let-binding — its lambda body executes once per row, not once
    * per element, so it opens no loop. */
  private def isLet(h: HigherOrderFunction): Boolean = h.arguments match {
    case Seq(CreateArray(Seq(_), _)) => true
    case _ => false
  }

  /** Scan every lambda body in `df`'s analyzed plan; return a
    * description per violation. `inLoop` tracks whether any ENCLOSING
    * lambda iterates (a let-binding does not). */
  private def audit(df: DataFrame): Seq[String] = {
    val hits = ArrayBuffer.empty[String]
    def walk(e: Expression, inLoop: Boolean): Unit = {
      if (inLoop && costlyArrayScan(e)) {
        // the array inputs are the non-function children
        val arrayArgs = e match {
          case h: HigherOrderFunction => h.arguments
          case other => other.children
        }
        val invariant = arrayArgs.filter(a =>
          a.dataType.typeName == "array" &&
            !referencesLambdaVar(a) && !a.foldable)
        if (invariant.nonEmpty)
          hits += s"lambda-invariant full-array work " +
            s"`${e.sql.take(120)}` — hoist it out of the lambda or " +
            "Let.bindOnce it (lambda bodies are CSE-exempt: this " +
            "re-evaluates per element)"
      }
      if (inLoop && costlyStringScan(e) &&
          !referencesLambdaVar(e) && !e.foldable) {
        hits += s"lambda-invariant string work " +
          s"`${e.sql.take(120)}` — hoist it out of the lambda or " +
          "Let.bindOnce it (lambda bodies are CSE-exempt: this " +
          "re-evaluates per element)"
      }
      e match {
        case h: HigherOrderFunction =>
          h.arguments.foreach(walk(_, inLoop))
          val bodyLoop = inLoop || !isLet(h)
          h.functions.foreach {
            case lf: LambdaFunction => walk(lf.function, bodyLoop)
            case other => walk(other, inLoop)
          }
        case other => other.children.foreach(walk(_, inLoop))
      }
    }
    df.queryExecution.analyzed.foreach { node =>
      node.expressions.foreach(walk(_, inLoop = false))
    }
    hits.distinct.toSeq
  }

  test("the detector flags the q240 pre-fix shape (invariant fold in a lambda)") {
    val df = Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("id", "v")
    val bad = df.select(transform(col("v"), x =>
      x / sqrt(aggregate(col("v"), lit(0.0), (a, e) => a + e * e))).as("n"))
    val hits = audit(bad)
    assert(hits.nonEmpty, "pre-fix isotropy shape not flagged")
    assert(hits.exists(_.contains("aggregate")), hits.mkString("\n"))
  }

  test("the detector accepts the fixed shapes") {
    val df = Seq((1L, Seq(1.0, 2.0, 3.0), Seq("a", "the"))).toDF("id", "v", "w")
    // q240 post-fix: norm hoisted to a per-row column
    val hoisted = df
      .withColumn("__n", sqrt(aggregate(col("v"), lit(0.0), (a, e) => a + e * e)))
      .select(transform(col("v"), x => x / col("__n")).as("n"))
    assert(audit(hoisted).isEmpty, audit(hoisted).mkString("\n"))
    // literal arrays inside lambdas are bounded constants (stopword scan)
    val lits = df.select(filter(col("w"), x =>
      !array_contains(typedLit(Seq("the", "a", "of")), x)).as("kept"))
    assert(audit(lits).isEmpty, audit(lits).mkString("\n"))
    // nested HOF over the LAMBDA VARIABLE varies per element — inherent
    val nested = Seq((1L, Seq(Seq(1.0), Seq(2.0)))).toDF("id", "vv")
      .select(transform(col("vv"), row =>
        aggregate(row, lit(0.0), (a, e) => a + e)).as("sums"))
    assert(audit(nested).isEmpty, audit(nested).mkString("\n"))
    // the Let.bindOnce idiom: the outer 1-element transform is a let,
    // not a loop — the inner full-array transform runs ONCE per row
    val let = df.select(graft.functions.Let.bindOnce(
      aggregate(col("v"), lit(0.0), (a, e) => a + e * e)) { n =>
        transform(col("v"), x => x / n)
      }.as("n"))
    assert(audit(let).isEmpty, audit(let).mkString("\n"))
  }

  test("no lambda-invariant full-array work anywhere in the registry") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try audit(fn(spark, sfTiny)).map(h => s"$name — $h")
      catch { case e: Throwable => Seq(s"$name failed to plan: ${e.getMessage}") }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
