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

  test("string-level applyMerges equals the array-level mergeExpr chain") {
    // the q145 rule set (plain pair, a==b run parity, chained fused-left
    // rule) over texts exercising runs, adjacency and regex metachars
    val rules = Seq("a" -> "b", "a" -> "a", "a+b" -> "a")
    val df = Seq(
      (1L, "a b a b b"), (2L, "a a a a"), (3L, "a a a"),
      (4L, "x a b a a y"), (5L, "a.b a b $1 \\q a"), (6L, ""),
      (7L, "a b a"))
      .toDF("id", "text")
    val viaString = Bpe.applyMerges(df, "id", "text", rules, sep = "+")
      .select($"id", $"tokens").as[(Long, Seq[String])].collect().toMap
    val viaArray = rules.foldLeft(
        df.select($"id", org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lower($"text"), " ").as("tokens"))) {
        case (acc, (a, b)) =>
          // localCheckpoint between rules keeps Catalyst from inlining —
          // the array path stays the independently-evaluated baseline
          acc.withColumn("tokens", Bpe.mergeExpr($"tokens", a, b, "+"))
            .localCheckpoint()
      }.select($"id", $"tokens").as[(Long, Seq[String])].collect().toMap
    assert(viaString == viaArray)
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

  test("a trailing newline inside the last token blocks the merge (\\z boundary)") {
    // split cuts only on ' ', so "b\n" is ONE token ≠ "b" — the merge
    // boundary lookahead must use \z (end of input), because $ without
    // MULTILINE also matches BEFORE a final \n and would falsely fuse
    val df = Seq((1L, "a b\n"), (2L, "a b")).toDF("id", "text")
    val out = Bpe.applyMerges(df, "id", "text", Seq("a" -> "b"), sep = "+")
      .select($"id", $"tokens").as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("a", "b\n")) // NOT merged
    assert(out(2L) == Seq("a+b"))      // merged
  }

  test("decode inverts applyMerges back to the normalized text") {
    val rules = Seq("a" -> "b", "a" -> "a", "a\u0001b" -> "a")
    val df = Seq(
      (1L, "A b a B b"), (2L, "a a a a"), (3L, "x  a b  y"),
      (4L, "a b\n c"), (5L, ""))
      .toDF("id", "text")
    val out = Bpe.applyMerges(df, "id", "text", rules)
      .select($"id", Bpe.decode($"tokens").as("d")).as[(Long, String)]
      .collect().toMap
    val expect = df.select($"id", org.apache.spark.sql.functions.lower($"text"))
      .as[(Long, String)].collect().toMap
    assert(out == expect)
  }

  test("compressionCurve: k=0 equals word count, tokens non-increasing in k") {
    val df = Seq((1L, "a b a b c"), (2L, "a b a b"), (3L, "c c a b"))
      .toDF("id", "text")
    val out = Bpe.compressionCurve(df, "id", "text", iters = 2,
        ks = Seq(0, 1, 2))
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.head == ((0L, 3L, 13L, 13L, 1.0))) // unmerged = words
    assert(out.map(_._3).sliding(2).forall(p => p(1) <= p(0)))
    // first merge is (a,b) — 5 occurrences → 13 − 5 = 8 tokens at k=1
    assert(out(1)._3 == 8L)
  }
}
