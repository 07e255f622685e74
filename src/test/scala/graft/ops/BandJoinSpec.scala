package graft.ops

import graft.{SparkSpec, Tables}
import graft.etl.Matching
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The band arg-min join must be EQUAL to the theta-join + rank-window
  * baseline it replaces (Matching.bestMatchJoin) — proven on the q09
  * shape with exact-boundary pairs planted, not argued. */
class BandJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(probe: DataFrame, build: DataFrame): DataFrame =
    Matching.bestMatchJoin(probe, Seq("id"), build,
      col("k") === col("bk") &&
        (col("bv") * 1000 >= col("v") * 999) &&
        (col("bv") * 1000 <= col("v") * 1001),
      Seq(col("bt").asc_nulls_last),
      Map("bt" -> "m_tie", "bp" -> "m_pay"))

  private def hatch(probe: DataFrame, build: DataFrame): DataFrame =
    BandJoin.argMinInBand(probe, col("k"), col("v"),
      build, col("bk"), col("bv"), col("bt"),
      Map("bt" -> "m_tie", "bp" -> "m_pay"), 999L, 1001L, 1000L)

  test("argMinInBand == theta join + rank window on the q09 shape") {
    // few keys (the fixed-domain trap), many values, EXACT boundary
    // pairs planted: v=100000 has builds at exactly 999*v/1000 and
    // 1001*v/1000 — both must be in band, min tie must win
    val probe = (1L to 800L)
      .map(i => (i, s"B${i % 5}", 90000L + i * 37 % 120000))
      .toDF("id", "k", "v")
      .union(Seq((9001L, "B1", 100000L), (9002L, "NOKEY", 100000L))
        .toDF("id", "k", "v"))
    val build = (1L to 600L)
      .map(i => (s"B${i % 7}", 90000L + i * 53 % 120000, i, s"p$i"))
      .toDF("bk", "bv", "bt", "bp")
      .union(Seq(("B1", 99900L, 7001L, "loEdge"),
        ("B1", 100100L, 7002L, "hiEdge"),
        ("B1", 99899L, 7000L, "justBelow"),
        ("B1", 100101L, 7003L, "justAbove")).toDF("bk", "bv", "bt", "bp"))
    val got = hatch(probe, build)
    val want = brute(probe, build)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "band arg-min join diverged from the theta-join baseline")
    // the planted exact-boundary probe matches loEdge (min tie in band
    // is 7001 unless a generated build with smaller tie is in band)
    val m = got.filter(col("id") === 9001L)
      .select(col("m_tie")).as[Long].collect().head
    val inBand = build.filter(col("bk") === "B1" &&
      col("bv") * 1000 >= lit(99900000L) &&
      col("bv") * 1000 <= lit(100100000L))
      .agg(min(col("bt"))).as[Long].collect().head
    assert(m == inBand, s"boundary probe picked tie $m, want $inBand")
  }

  test("probes with no in-band build and null keys keep left semantics") {
    val probe = Seq((1L, "A", 50000L), (2L, null, 50000L),
      (3L, "Z", 50000L)).toDF("id", "k", "v")
    val build = Seq(("A", 49000L, 10L, "far")).toDF("bk", "bv", "bt", "bp")
    val got = hatch(probe, build)
      .select(col("id"), col("m_tie")).as[(Long, Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, None), (2L, None), (3L, None)))
  }

  test("equal ties: first row in (key, value) order wins") {
    val probe = Seq((1L, "A", 100000L)).toDF("id", "k", "v")
    val build = Seq(("A", 99950L, 5L, "first"), ("A", 100050L, 5L, "second"))
      .toDF("bk", "bv", "bt", "bp")
    val got = hatch(probe, build).select(col("m_pay")).as[String]
      .collect().head
    assert(got == "first")
  }

  test("matches the q09 gate shape on real part data") {
    val part = Tables.part(spark, sfTiny)
    val cents = round(col("p_retailprice") * 100).cast("long")
    val known = part.filter(col("p_size") < 40).select(
      col("p_brand").as("bk"), cents.as("bv"),
      col("p_partkey").as("bt"), col("p_type").as("bp"))
    val unknown = part.filter(col("p_size") >= 40)
      .select(col("p_partkey").as("id"), col("p_brand").as("k"),
        cents.as("v"))
    val got = hatch(unknown, known)
    val want = brute(unknown, known)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() == unknown.count(), "left semantics: one row per probe")
  }

  test("out-of-range values raise instead of wrapping") {
    val probe = Seq((1L, "A", Long.MaxValue / 500)).toDF("id", "k", "v")
    val build = Seq(("A", 1L, 1L, "x")).toDF("bk", "bv", "bt", "bp")
    val e = intercept[Exception] {
      hatch(probe, build).collect()
    }
    assert(e.getMessage.contains("argMinInBand") ||
      Option(e.getCause).exists(_.getMessage.contains("argMinInBand")))
  }
}
