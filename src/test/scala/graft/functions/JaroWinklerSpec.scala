package graft.functions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerKernel.sim(UTF8String.fromString(a), UTF8String.fromString(b))

  test("kernel: literature reference values") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-10)
    assert(jw("same", "same") == 1.0)
    assert(jw("", "") == 1.0)
    assert(jw("a", "") == 0.0)
    assert(jw("abc", "xyz") == 0.0)
  }

  test("kernel: boost applies only above the 0.7 jaro threshold") {
    // low-similarity pair with a common prefix must NOT get the boost
    val v = jw("ab", "ba")
    assert(v <= 0.7 + 1e-12)
  }

  test("expression: codegen path equals kernel on a column pair") {
    val df = Seq(("martha", "marhta"), ("dwayne", "duane"), ("x", "x"))
      .toDF("a", "b")
    val out = df.select(JaroWinkler.jaroWinkler($"a", $"b").as("jw"))
      .as[Double].collect()
    assert(math.abs(out(0) - 0.9611111111111111) < 1e-12)
    assert(math.abs(out(1) - 0.84) < 1e-12)
    assert(out(2) == 1.0)
  }
}
