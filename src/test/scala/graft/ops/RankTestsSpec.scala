package graft.ops

import scala.math.BigDecimal.RoundingMode.HALF_UP

import graft.SparkSpec

/** Rank tests against naive O(n²)-rank references that replay the ops'
  * float discipline, plus hand-worked Kendall-W fixtures. */
class RankTestsSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double) = BigDecimal(x).setScale(6, HALF_UP).toDouble

  /** tie-averaged ranks by brute force */
  private def ranks(vs: Seq[Double]): Seq[Double] = {
    val sorted = vs.sorted
    vs.map(v => sorted.count(_ < v) + (sorted.count(_ == v) + 1) / 2.0)
  }
  private def tieTerm(vs: Seq[Double]): Double =
    vs.groupBy(identity).values.map(_.size.toDouble).map(t => t * t * t - t).sum

  test("mannWhitneyU == a naive tie-averaged-rank reference") {
    val data = (1 to 300).map(i =>
      (((i * 7) % 13).toDouble + (if (i % 3 == 0) 5 else 0), i % 4 == 0))
    val got = RankTests.mannWhitneyU(data.toDF("v", "a"), $"v", $"a")
      .as[(Long, Long, Double, Double, Double, Double, Option[Double])].head()
    val rk = ranks(data.map(_._1))
    val na = data.count(_._2).toLong
    val nb = data.size - na
    val ra = data.zip(rk).filter(_._1._2).map(_._2).sum
    val ua = ra - na * (na + 1) / 2.0
    val n = data.size.toDouble
    val varU = na.toDouble * nb / 12.0 *
      ((n + 1) - tieTerm(data.map(_._1)) / (n * (n - 1)))
    val z = (ua - na.toDouble * nb / 2.0) / math.sqrt(varU)
    assert(got == ((na, nb, r6(ra), r6(ua),
      r6(na.toDouble * nb - ua),
      r6(2.0 * ua / (na.toDouble * nb) - 1.0), Some(r6(z)))), got.toString)
  }

  test("mannWhitneyU: everything tied degenerates to NULL z, effect size 0") {
    val data = (1 to 40).map(i => (7.0, i % 2 == 0))
    val got = RankTests.mannWhitneyU(data.toDF("v", "a"), $"v", $"a")
      .as[(Long, Long, Double, Double, Double, Double, Option[Double])].head()
    assert(got._7.isEmpty, got.toString)
    assert(got._6 == 0.0, s"all-tied rank-biserial must be 0: $got")
  }

  test("mannWhitneyU: an empty group yields ONE row with NULLs, not zero rows") {
    // all rows in group A: n_a is real, n_b/u/z NULL (the all-tied-z
    // degenerate convention, and what the oracle's scalar subqueries do)
    val rows = RankTests.mannWhitneyU(
        (1 to 5).map(i => (i.toDouble, true)).toDF("v", "a"), $"v", $"a")
      .collect()
    assert(rows.length == 1, s"expected 1 row, got ${rows.length}")
    val r = rows.head
    assert(r.getLong(0) == 5L, r.toString)
    assert(r.isNullAt(1) && r.isNullAt(6), r.toString)
    // fully empty input: every column NULL, still one row
    val e = RankTests.mannWhitneyU(
        Seq.empty[(Double, Boolean)].toDF("v", "a"), $"v", $"a").collect()
    assert(e.length == 1 && (0 to 6).forall(e.head.isNullAt), e.head.toString)
  }

  test("hodgesLehmann: pairwise-difference median by hand, ties, empty group") {
    // A=[1,5,7], B=[2,4]: diffs sorted −3,−1,1,3,3,5 (W=6 even) →
    // middles 1 and 3 → HL = 2.0
    val df = Seq((1L, true), (5L, true), (7L, true), (2L, false),
      (4L, false)).toDF("v", "a")
    val got = RankTests.hodgesLehmann(df, $"v", $"a")
      .as[(Long, Long, Long, Option[Double])].head()
    assert(got == ((3L, 2L, 6L, Some(2.0))), got.toString)
    // duplicated values weight the difference domain: A=[2,2], B=[1]
    val dup = RankTests.hodgesLehmann(
        Seq((2L, true), (2L, true), (1L, false)).toDF("v", "a"), $"v", $"a")
      .as[(Long, Long, Long, Option[Double])].head()
    assert(dup == ((2L, 1L, 2L, Some(1.0))), dup.toString)
    // odd W: A=[10], B=[1,2,4] → diffs 6,8,9 → middle 8
    val odd = RankTests.hodgesLehmann(
        Seq((10L, true), (1L, false), (2L, false), (4L, false))
          .toDF("v", "a"), $"v", $"a")
      .as[(Long, Long, Long, Option[Double])].head()
    assert(odd == ((1L, 3L, 3L, Some(8.0))), odd.toString)
    // one empty group: ONE row, NULL shift (the U-test convention)
    val e = RankTests.hodgesLehmann(
        Seq((3L, true)).toDF("v", "a"), $"v", $"a").collect()
    assert(e.length == 1 && e.head.isNullAt(3), e.head.toString)
  }

  test("jonckheereTerpstra: hand-worked ordered trend, ties, contract bound") {
    // g1=[1,3] g2=[2,5] g3=[4,6]: J = 3+4+3 = 10; μ = (36−12)/4 = 6;
    // no ties: σ² = (6·5·17 − 3·(2·1·9))/72 = 456/72
    val df = Seq((1.0, 1L), (3.0, 1L), (2.0, 2L), (5.0, 2L),
      (4.0, 3L), (6.0, 3L)).toDF("v", "g")
    val got = RankTests.jonckheereTerpstra(df, $"v", $"g")
      .as[(Long, Long, Double, Double, Option[Double])].head()
    assert(got._1 == 3L && got._2 == 6L, got.toString)
    assert(got._3 == 10.0 && got._4 == 6.0, got.toString)
    assert(got._5.contains(r6((10.0 - 6.0) /
      math.sqrt((510.0 - 54.0 - 0.0) / 72.0))), got.toString)
    // cross-group tie at 3 counts ½: g1=[1,3] g2=[3] → J = 1.5, μ = 1,
    // σ² = (66−18−18)/72 + (2·2)/(8·3·2) = 0.5
    val tied = RankTests.jonckheereTerpstra(
        Seq((1.0, 1L), (3.0, 1L), (3.0, 2L)).toDF("v", "g"), $"v", $"g")
      .as[(Long, Long, Double, Double, Option[Double])].head()
    assert(tied._3 == 1.5 && tied._4 == 1.0, tied.toString)
    assert(tied._5.contains(r6(0.5 / math.sqrt(
      (66.0 - 18.0 - 18.0) / 72.0 + 2.0 * 2.0 / (8.0 * 3.0 * 2.0)))),
      tied.toString)
    // reversed trend goes negative-z; constant values degenerate to NULL
    val rev = RankTests.jonckheereTerpstra(
        df.select($"v",
          (org.apache.spark.sql.functions.lit(4L) - $"g").as("g")),
        $"v", $"g")
      .as[(Long, Long, Double, Double, Option[Double])].head()
    assert(rev._5.exists(_ < 0), rev.toString)
    val const = RankTests.jonckheereTerpstra(
        Seq((7.0, 1L), (7.0, 2L)).toDF("v", "g"), $"v", $"g")
      .as[(Long, Long, Double, Double, Option[Double])].head()
    assert(const._5.isEmpty, const.toString)
    // the maxGroups contract fails loudly
    val many = (1 to 9).map(i => (i.toDouble, i.toLong)).toDF("v", "g")
    val ex = intercept[IllegalArgumentException] {
      RankTests.jonckheereTerpstra(many, $"v", $"g", maxGroups = 8)
    }
    assert(ex.getMessage.contains("maxGroups"), ex.getMessage)
  }

  test("wilcoxonSignedRank: hand-worked fixture with a tie pair and a zero") {
    // diffs 3, -1, 2, 2, -4, 0: zero drops; |d| ranks 4, 1, 2.5, 2.5, 5
    // W+ = 4 + 2.5 + 2.5 = 9, W- = 6, n = 5, mu = 7.5,
    // var = 5·6·11/24 - 6/48 = 13.625
    val got = RankTests.wilcoxonSignedRank(
        Seq(3.0, -1.0, 2.0, 2.0, -4.0, 0.0).toDF("d"), $"d")
      .as[(Long, Long, Double, Double, Option[Double])].head()
    assert(got._1 == 5L && got._2 == 1L)
    assert(got._3 == 9.0 && got._4 == 6.0, got.toString)
    assert(got._5.contains(r6(1.5 / math.sqrt(13.625))), got.toString)
  }

  test("wilcoxonSignedRank: all-positive diffs (empty negative class) and all-zero NULL") {
    val got = RankTests.wilcoxonSignedRank(
        Seq(1.0, 2.0, 3.0).toDF("d"), $"d")
      .as[(Long, Long, Double, Double, Option[Double])].head()
    assert(got == ((3L, 0L, 6.0, 0.0, Some(r6(3.0 / math.sqrt(3.0 * 4 * 7 / 24))))),
      got.toString)
    val z = RankTests.wilcoxonSignedRank(Seq(0.0, 0.0).toDF("d"), $"d")
      .as[(Long, Long, Double, Double, Option[Double])].head()
    assert(z._1 == 0L && z._2 == 2L && z._5.isEmpty, z.toString)
  }

  test("kruskalWallis == a naive reference (incl. the dec9 group-term sum)") {
    val data = (1 to 300).map(i =>
      (((i * 11) % 9).toDouble, s"g${i % 3}"))
    val got = RankTests.kruskalWallis(data.toDF("v", "g"), $"v", $"g")
      .as[(Long, Long, Double, Double, Option[Double])].head()
    val rk = ranks(data.map(_._1))
    val byG = data.zip(rk).groupBy(_._1._2)
    def dec9(x: Double) = BigDecimal(x).setScale(9, HALF_UP)
    val st = byG.values.map { rows =>
      val r = rows.map(_._2).sum; dec9(r * r / rows.size.toDouble)
    }.sum
    val n = data.size.toDouble
    val h = 12.0 / (n * (n + 1)) * st.toDouble - 3.0 * (n + 1)
    val c = 1.0 - tieTerm(data.map(_._1)) / (n * n * n - n)
    assert(got == ((3L, 300L, r6(h), r6(c), Some(r6(h / c)))), got.toString)
  }

  test("kendallW: hand-worked 3x4 fixtures — plain, tied, perfect") {
    // J1: 1,2,3,4  J2: 1,3,2,4  J3: 2,1,3,4 -> R = 4,6,8,12, S = 35,
    // W = 12*35/(9*60) = 0.777778
    def df(j3: Seq[Double]) = (Seq(
      (1, 1, 1.0), (1, 2, 2.0), (1, 3, 3.0), (1, 4, 4.0),
      (2, 1, 1.0), (2, 2, 3.0), (2, 3, 2.0), (2, 4, 4.0)) ++
      j3.zipWithIndex.map { case (v, i) => (3, i + 1, v) })
      .toDF("j", "it", "v")
    val plain = RankTests.kendallW(df(Seq(2.0, 1.0, 3.0, 4.0)),
      $"j", $"it", $"v").as[(Long, Long, Double, Option[Double])].head()
    assert(plain == ((3L, 4L, 35.0, Some(0.777778))), plain.toString)
    // J3 ties items 2,3 at rank 1.5: R = 5, 6.5, 6.5, 12 -> S = 28.5,
    // T = 6, W = 342/522 = 0.655172
    val tied = RankTests.kendallW(df(Seq(2.0, 1.0, 1.0, 4.0)),
      $"j", $"it", $"v").as[(Long, Long, Double, Option[Double])].head()
    assert(tied == ((3L, 4L, 28.5, Some(0.655172))), tied.toString)
    // all three judges agree -> S = 45 = m²(n³−n)/12, W = 1
    val perfect = RankTests.kendallW(df(Seq(1.0, 2.0, 3.0, 4.0))
        .filter($"j" =!= 2).unionByName(
          Seq((2, 1, 1.0), (2, 2, 2.0), (2, 3, 3.0), (2, 4, 4.0))
            .toDF("j", "it", "v")),
      $"j", $"it", $"v").as[(Long, Long, Double, Option[Double])].head()
    assert(perfect == ((3L, 4L, 45.0, Some(1.0))), perfect.toString)
  }

  test("kendallW rejects incomplete rankings loudly") {
    val rows = Seq((1, 1, 1.0), (1, 2, 2.0), (2, 1, 1.0)).toDF("j", "it", "v")
    val e = intercept[IllegalArgumentException] {
      RankTests.kendallW(rows, $"j", $"it", $"v")
    }
    assert(e.getMessage.contains("COMPLETE"), e.getMessage)
  }

  test("friedman: chi2 = m(n−1)W on the kendallW fixtures, ties included") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def df(j3: Seq[Double]) = (Seq(
      (1, 1, 1.0), (1, 2, 2.0), (1, 3, 3.0), (1, 4, 4.0),
      (2, 1, 1.0), (2, 2, 3.0), (2, 3, 2.0), (2, 4, 4.0)) ++
      j3.zipWithIndex.map { case (v, i) => (3, i + 1, v) })
      .toDF("j", "it", "v")
    // plain fixture: W = 0.777778 → chi2 = 3·3·W = 7.000002, df = 3
    val plain = RankTests.friedman(df(Seq(2.0, 1.0, 3.0, 4.0)),
      $"j", $"it", $"v")
      .as[(Long, Long, Option[Double], Option[Double], Option[Long])].head()
    assert(plain == ((3L, 4L, Some(0.777778),
      Some(r6(3.0 * 3.0 * 0.777778)), Some(3L))), plain.toString)
    // tied fixture: chi2 composes from the tie-corrected W
    val tied = RankTests.friedman(df(Seq(2.0, 1.0, 1.0, 4.0)),
      $"j", $"it", $"v")
      .as[(Long, Long, Option[Double], Option[Double], Option[Long])].head()
    assert(tied == ((3L, 4L, Some(0.655172),
      Some(r6(3.0 * 3.0 * 0.655172)), Some(3L))), tied.toString)
    // all-tied rows: W degenerates (NULL) → chi2/df NULL, not 0
    val flat = Seq((1, 1, 1.0), (1, 2, 1.0), (2, 1, 1.0), (2, 2, 1.0))
      .toDF("j", "it", "v")
    val g = RankTests.friedman(flat, $"j", $"it", $"v")
      .as[(Long, Long, Option[Double], Option[Double], Option[Long])].head()
    assert(g._3.isEmpty && g._4.isEmpty && g._5.isEmpty, g.toString)
  }

  test("hodgesLehmann raises loudly on a fractional metric (no truncation)") {
    val frac = Seq((1.5, true), (2.0, false)).toDF("v", "a")
    val e = intercept[Exception] {
      RankTests.hodgesLehmann(frac, $"v", $"a").collect()
    }
    assert(e.getMessage.contains("integral"), String.valueOf(e.getMessage))
  }
}
