package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("preProcess: punctuation→space, /* deleted, ws collapsed, upper, trim") {
    val got = Seq("  a,b(c)[d]:e;f/g*h   i  ")
      .toDF("s").select(Normalize.preProcess($"s")).as[String].head()
    assert(got == "A B C D E FGH I")
  }

  test("preProcess is idempotent") {
    val inputs = Seq("x, y", "A/B*C", "  m  n  ", "plain", "a;;b::c").toDF("s")
    val once = Normalize.preProcess($"s")
    val twice = Normalize.preProcess(Normalize.preProcess($"s"))
    assert(inputs.select(once === twice).as[Boolean].collect().forall(identity))
  }

  test("aliases: substring vs token-equality, first rule wins") {
    val rules = Seq(
      Normalize.AliasRule("XUZHOU CONSTRUCTION MACHINERY", "XCMG"),
      Normalize.AliasRule("CAT", "CATERPILLAR", matchToken = true))
    val df = Seq(
      "XUZHOU CONSTRUCTION MACHINERY CO",  // substring hit
      "CAT 320D",                          // token hit
      "CATERPILLAR SCATTER",               // CAT as substring only: no hit
      "NOTHING").toDF("s")
    val got = df.select(Normalize.applyAliases($"s", rules)).as[String].collect()
    assert(got(0) == "XCMG XUZHOU CONSTRUCTION MACHINERY CO")
    assert(got(1) == "CATERPILLAR CAT 320D")
    assert(got(2) == "CATERPILLAR SCATTER")
    assert(got(3) == "NOTHING")
  }
}
