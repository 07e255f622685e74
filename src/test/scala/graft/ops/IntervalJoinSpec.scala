package graft.ops

import graft.SparkSpec

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed range join output equals the theta join exactly") {
    // deterministic pseudo-random fixture crossing many bucket boundaries
    val points = (1 to 300).map(i => ((i * 7) % 5L, (i * 131L) % 1000L, i.toLong))
      .toDF("k", "p", "pid")
    val ivs = (1 to 60).map { i =>
      val lo = (i * 173L) % 900L
      ((i * 3) % 5L, lo, lo + (i * 37L) % 150L, 1000L + i)
    }.toDF("k", "lo", "hi", "iid")
    val bucketed = IntervalJoin.rangeJoin(points, "p", ivs, "lo", "hi",
        bucketWidth = 64L, keys = Seq("k"))
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val theta = points.join(ivs, Seq("k"))
      .filter($"p" >= $"lo" && $"p" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(bucketed == theta)
    assert(theta.nonEmpty, "fixture must actually produce matches")
  }

  test("no duplicate pairs even when an interval spans many buckets") {
    val points = Seq((1L, 500L, 1L)).toDF("k", "p", "pid")
    val ivs = Seq((1L, 0L, 1000L, 9L)).toDF("k", "lo", "hi", "iid")
    val out = IntervalJoin.rangeJoin(points, "p", ivs, "lo", "hi",
      bucketWidth = 10L, keys = Seq("k"))
    assert(out.count() == 1)
  }

  test("oversized interval trips the distributed guard") {
    val points = Seq((1L, 5L, 1L)).toDF("k", "p", "pid")
    val ivs = Seq((1L, 0L, 1000000L, 9L)).toDF("k", "lo", "hi", "iid")
    val ex = intercept[Exception] {
      IntervalJoin.rangeJoin(points, "p", ivs, "lo", "hi",
        bucketWidth = 10L, keys = Seq("k"),
        maxBucketsPerInterval = 100L).count()
    }
    assert(ex.getMessage != null)
  }

  test("column collisions outside the keys are rejected eagerly") {
    val points = Seq((1L, 5L, 1L)).toDF("k", "p", "x")
    val ivs = Seq((1L, 0L, 10L, 2L)).toDF("k", "lo", "hi", "x")
    val ex = intercept[IllegalArgumentException] {
      IntervalJoin.rangeJoin(points, "p", ivs, "lo", "hi", 10L, Seq("k"))
    }
    assert(ex.getMessage.contains("collision"))
  }

  test("overlap join output equals the theta join, duplicate-free") {
    // intervals spanning several buckets each so pairs share many buckets
    val as = (1 to 80).map { i =>
      val lo = (i * 173L) % 800L
      ((i * 3) % 4L, lo, lo + (i * 61L) % 200L, i.toLong)
    }.toDF("k", "s_a", "e_a", "aid")
    val bs = (1 to 70).map { i =>
      val lo = (i * 97L) % 850L
      ((i * 5) % 4L, lo, lo + (i * 43L) % 180L, 1000L + i)
    }.toDF("k", "s_b", "e_b", "bid")
    val got = IntervalJoin.overlapJoin(as, "s_a", "e_a", bs, "s_b", "e_b",
        bucketWidth = 50L, keys = Seq("k"))
      .select($"aid", $"bid").as[(Long, Long)].collect()
    val theta = as.join(bs, Seq("k"))
      .filter($"s_a" <= $"e_b" && $"s_b" <= $"e_a")
      .select($"aid", $"bid").as[(Long, Long)].collect().toSet
    assert(got.length == got.toSet.size, "reference-bucket dedup must yield each pair once")
    assert(got.toSet == theta)
    assert(theta.nonEmpty, "fixture must actually produce overlaps")
  }

  test("overlap join: touching endpoints count as overlap (closed intervals)") {
    val as = Seq((1L, 0L, 10L, 1L)).toDF("k", "s_a", "e_a", "aid")
    val bs = Seq((1L, 10L, 20L, 2L), (1L, 11L, 20L, 3L)).toDF("k", "s_b", "e_b", "bid")
    val got = IntervalJoin.overlapJoin(as, "s_a", "e_a", bs, "s_b", "e_b",
        bucketWidth = 4L, keys = Seq("k"))
      .select($"bid").as[Long].collect().toSet
    assert(got == Set(2L))
  }

  test("unionCoverage: overlapping and touching intervals merge, gaps split") {
    val df = Seq(
      (1L, 0L, 5L), (1L, 3L, 8L), (1L, 10L, 12L), // [0,8) ∪ [10,12)
      (2L, 0L, 5L), (2L, 5L, 7L))                 // touching → one island
      .toDF("k", "s", "e")
    val out = IntervalJoin.unionCoverage(df, "k", "s", "e")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 2L, 10L)))
    assert(out(2L) == ((2L, 2L, 1L, 7L)))
  }
}
