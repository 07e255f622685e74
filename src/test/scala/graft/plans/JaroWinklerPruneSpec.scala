package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.functions.{JaroWinkler, JaroWinklerKernel}

/** `JaroWinklerLengthPrune` contract: the injected optimizer rule adds
  * a length-ratio conjunct to `jw >= t` filters (t > 0.8), the rewrite
  * never changes results, is idempotent, and the implied bound holds
  * for arbitrary strings including astral-plane code points. */
class JaroWinklerPruneSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[A](body: => A): A = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ JaroWinklerLengthPrune
    try body
    finally spark.experimental.extraOptimizations = before
  }

  // parquet-backed (a LocalRelation of literals would constant-fold the
  // whole filter away before the rule could be observed)
  private def pairs = graft.Tables.part(spark, sfTiny)
    .select(substring($"p_name", 1, 12).as("a"),
      substring($"p_name", 3, 12).as("b"))

  test("rewrite adds the length conjunct and preserves results") {
    // build the frame fresh on each side — QueryExecution memoizes the
    // optimized plan, so a pre-rule instance would never see the rule
    def q = pairs.filter(JaroWinkler.jaroWinkler($"a", $"b") >= 0.9)
    val without = q.collect().map(r => (r.getString(0), r.getString(1))).toSet
    withRule {
      val fresh = q
      val plan = fresh.queryExecution.optimizedPlan.toString
      assert(plan.contains("length("), "length conjunct missing:\n" + plan)
      val withR = fresh.collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(withR === without)
    }
  }

  test("idempotent, and inert below the 0.8 threshold") {
    withRule {
      val q = pairs.filter(JaroWinkler.jaroWinkler($"a", $"b") >= 0.95)
      val once = q.queryExecution.optimizedPlan
      // re-applying to the already-optimized plan adds nothing
      assert(JaroWinklerLengthPrune(once).canonicalized == once.canonicalized)
      val low = pairs.filter(JaroWinkler.jaroWinkler($"a", $"b") >= 0.5)
      assert(!low.queryExecution.optimizedPlan.toString.contains("length("),
        "rule fired below its soundness threshold")
      // and the low-threshold filter still returns every qualifying row
      assert(low.count() >= q.count())
    }
  }

  test("property: jw >= t implies the code-point length-ratio bound") {
    // includes astral-plane chars (2 UTF-16 units, 1 code point) — the
    // 1/2 slack in the bound exists exactly for these
    val gen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaChar.map(_.toString),
      1 -> Gen.const("😀"), // 😀
      1 -> Gen.const("é"))).map(_.mkString)
    val seeds = for {
      i <- 0 until 400
      s = org.scalacheck.rng.Seed(i.toLong)
      a <- gen.apply(Gen.Parameters.default, s)
      b <- gen.apply(Gen.Parameters.default, s.next)
    } yield (a, b)
    for (t <- Seq(0.85, 0.9, 0.95); (a, b) <- seeds) {
      val jw = JaroWinklerKernel.sim(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      if (jw >= t) {
        val (ca, cb) = (a.codePointCount(0, a.length), b.codePointCount(0, b.length))
        val r = Math.nextDown((5.0 * t - 4.0) / 2.0)
        assert(math.min(ca, cb).toDouble >= r * math.max(ca, cb),
          s"bound violated for ('$a','$b') jw=$jw t=$t")
      }
    }
  }
}
