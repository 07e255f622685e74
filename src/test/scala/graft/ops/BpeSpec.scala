package graft.ops

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("greedy merge is left-to-right non-overlapping") {
    // 'a a a' must fuse positions 1-2 only, leaving the third 'a' alone
    val df = Seq((1L, "a a a")).toDF("id", "text")
    val toks = Bpe.applyMerges(df, "id", "text", Seq("a" -> "a"), sep = "+")
      .select($"tokens").as[Seq[String]].head()
    assert(toks == Seq("a+a", "a"))
  }

  test("a fused token does not seed a second merge in the same pass") {
    val df = Seq((1L, "a b a b b")).toDF("id", "text")
    val toks = Bpe.applyMerges(df, "id", "text", Seq("a" -> "b"), sep = "+")
      .select($"tokens").as[Seq[String]].head()
    // both (a,b) occurrences fuse; the trailing b survives
    assert(toks == Seq("a+b", "a+b", "b"))
  }

  test("learnMerges picks max count with lexicographic tie-break") {
    val df = Seq(
      (1L, "x y x y"),   // (x,y) twice + (y,x) once
      (2L, "p q"), (3L, "p q")) // (p,q) twice: ties (x,y) at 2, p < x wins
      .toDF("id", "text")
    val m = Bpe.learnMerges(df, "id", "text", iters = 2)
      .as[(Int, String, String, Long)].collect()
    assert(m(0) == ((0, "p", "q", 2L)))
    assert(m(1) == ((1, "x", "y", 2L)))
  }

  test("learnMerges stops early when no pairs remain") {
    val df = Seq((1L, "one"), (2L, "two")).toDF("id", "text")
    assert(Bpe.learnMerges(df, "id", "text", iters = 3).count() == 0)
  }

  test("merge counts reflect previous merges (sequential dependence)") {
    // after fusing (a,b), the pair (a+b, c) becomes countable
    val df = Seq((1L, "a b c a b c")).toDF("id", "text")
    val m = Bpe.learnMerges(df, "id", "text", iters = 2, sep = "+")
      .as[(Int, String, String, Long)].collect()
    assert(m(0)._2 == "a" && m(0)._3 == "b")
    assert(m(1) == ((1, "a+b", "c", 2L)))
  }
}
