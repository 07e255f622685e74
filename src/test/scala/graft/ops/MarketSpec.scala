package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MarketSpec extends SparkSpec {
  import spark.implicits._

  test("concentration: monopoly HHI=1, equal split HHI=1/n, CR4 caps at 1") {
    val df = Seq(
      ("mono", 1L, 100.0),
      ("duo", 1L, 50.0), ("duo", 2L, 50.0),
      ("five", 1L, 10.0), ("five", 2L, 10.0), ("five", 3L, 10.0),
      ("five", 4L, 10.0), ("five", 5L, 10.0)
    ).toDF("mkt", "firm", "v")
    val out = Market.concentration(df, "mkt", "firm", "v", k = 4)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("mono") == ((1L, 1.0, 1.0)))
    assert(out("duo") == ((2L, 0.5, 1.0)))
    assert(out("five") == ((5L, 0.2, 0.8))) // CR4 = 4 of 5 equal firms
  }

  test("concentration CR ties break on the firm key (deterministic)") {
    // two firms tied at rank k: only the lower-keyed one enters CR1
    val df = Seq(("m", 2L, 10.0), ("m", 1L, 10.0), ("m", 3L, 5.0))
      .toDF("mkt", "firm", "v")
    val out = Market.concentration(df, "mkt", "firm", "v", k = 1)
      .as[(String, Long, Double, Double)].head()
    assert(out._4 == 0.4) // 10 / 25, firm 1 (not 2) at rank 1
  }

  test("benford: shares sum to 1, expected follows log10(1+1/d)") {
    val out = Market.benford(graft.Tables.orders(spark, sfTiny), "o_totalprice")
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(out.map(_._1).toSeq == (1 to 9).filter(d => out.exists(_._1 == d)))
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-4)
    out.foreach { case (d, _, _, exp, _) =>
      assert(math.abs(exp - math.log10(1.0 + 1.0 / d)) < 1e-6)
    }
    // a digit-9-only corpus: observed share 1 on digit 9
    val nines = Seq(9.0, 90.1, 900.0, 0.09).toDF("amt")
    val o9 = Market.benford(nines, "amt").as[(Int, Long, Double, Double, Double)].collect()
    assert(o9.map(r => (r._1, r._2)).toSeq == Seq((9, 4L)))
  }

  test("laspeyres: flat prices give index 1, doubled prices give 2") {
    val df = Seq(
      // item, period, qty, value (price = v/q)
      (1L, "2024-01", 10.0, 100.0), (2L, "2024-01", 5.0, 100.0),
      (1L, "2024-02", 99.0, 990.0), (2L, "2024-02", 1.0, 20.0),  // p1 flat, p2 flat
      (1L, "2024-03", 2.0, 40.0), (2L, "2024-03", 7.0, 280.0)    // both doubled
    ).toDF("item", "period", "qty", "v")
    val out = Market.laspeyresIndex(df, "item", "period", "qty", "v")
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("2024-01") == ((2L, 1.0)))
    assert(out("2024-02") == ((2L, 1.0)))
    assert(out("2024-03") == ((2L, 2.0)))
  }

  test("priceVolatility: constant price is cv 0; larger swings rank higher") {
    val df = Seq(
      // item 1: constant price 10 across 6 months
      (1L, "01", 1.0, 10.0), (1L, "02", 1.0, 10.0), (1L, "03", 1.0, 10.0),
      (1L, "04", 1.0, 10.0), (1L, "05", 1.0, 10.0), (1L, "06", 1.0, 10.0),
      // item 2: alternates 5/15
      (2L, "01", 1.0, 5.0), (2L, "02", 1.0, 15.0), (2L, "03", 1.0, 5.0),
      (2L, "04", 1.0, 15.0), (2L, "05", 1.0, 5.0), (2L, "06", 1.0, 15.0),
      // item 3: too few months → excluded
      (3L, "01", 1.0, 1.0), (3L, "02", 1.0, 100.0)
    ).toDF("item", "period", "qty", "v")
    val out = Market.priceVolatility(df, "item", "period", "qty", "v",
        minPeriods = 6, topN = 10)
      .as[(Long, Long, Double, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(2L, 1L)) // cv desc
    assert(out.find(_._1 == 1L).get._4 == 0.0)
    assert(out.find(_._1 == 2L).get._3 == 10.0) // mean of 5/15
    assert(!out.exists(_._1 == 3L))
  }

  test("shareTrend: linear share gain has positive slope, constant split has zero") {
    val df = Seq(
      // months 0..2: A's revenue grows 10→20→30 while B shrinks 30→20→10
      ("A", "2024-01", 10.0), ("B", "2024-01", 30.0),
      ("A", "2024-02", 20.0), ("B", "2024-02", 20.0),
      ("A", "2024-03", 30.0), ("B", "2024-03", 10.0)
    ).toDF("g", "period", "v")
    val out = Market.shareTrend(df, "g", "period", "v")
      .as[(String, Long, Double, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("A")._3 == 0.5 && out("B")._3 == 0.5) // mean share both 0.5
    assert(out("A")._4.exists(_ > 0.2) && out("B")._4.exists(_ < -0.2))
    // shares move 0.25→0.5→0.75: slope exactly 0.25/month
    assert(math.abs(out("A")._4.get - 0.25) < 1e-8)
  }

  test("paretoAbc: classes partition, boundary item belongs to A inclusively") {
    // revenues 80, 15, 5: cum shares 0.80 (A, inclusive), 0.95 (B), 1.0 (C)
    val df = Seq((1L, 80.0), (2L, 15.0), (3L, 5.0)).toDF("item", "v")
    val out = Market.paretoAbc(df, "item", "v")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("A") == (("A", 1L, 0.8)))
    assert(out("B") == (("B", 1L, 0.15)))
    assert(out("C") == (("C", 1L, 0.05)))
  }

  test("laspeyres only weights items present in the base period") {
    val df = Seq(
      (1L, "2024-01", 1.0, 10.0),
      (1L, "2024-02", 1.0, 30.0), (9L, "2024-02", 1.0, 999.0) // item 9 has no base
    ).toDF("item", "period", "qty", "v")
    val out = Market.laspeyresIndex(df, "item", "period", "qty", "v")
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("2024-02") == ((1L, 3.0))) // item 9 excluded, n_items=1
  }

  test("copurchaseLift: lift from distinct basket incidence, support-filtered") {
    val df = Seq(
      (1L, "A"), (1L, "A"), (1L, "B"), // duplicate line: A counts once in b1
      (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"),
      (4L, "B")).toDF("bk", "it")
    val out = Market.copurchaseLift(df, "bk", "it", minPairs = 1L)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // N=4, n_A=3, n_B=3, n_C=1; AB in 2 baskets, AC in 1
    assert(out(("A", "B")) == ((2L, 0.888889)))
    assert(out(("A", "C")) == ((1L, 1.333333)))
    assert(!out.contains(("B", "C")))
    // support filter drops singleton pairs
    val filtered = Market.copurchaseLift(df, "bk", "it", minPairs = 2L)
      .as[(String, String, Long, Double)].collect()
    assert(filtered.map(r => (r._1, r._2)).toSet == Set(("A", "B")))
  }

  test("stratifiedEffect: blocked ATE weights usable strata only") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("A", true, 3.0), ("A", true, 5.0), ("A", false, 1.0), ("A", false, 3.0),
      ("B", true, 10.0), ("B", false, 4.0),
      ("C", true, 99.0)) // no control arm → excluded from the ATE
      .toDF("st", "tr", "v")
    val out = Market.stratifiedEffect(df, col("st"), col("tr"), "v")
      .as[(String, Long, Long, Option[Double], Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("A") == (("A", 2L, 2L, Some(2.0), 3.333333)))
    assert(out("B") == (("B", 1L, 1L, Some(6.0), 3.333333)))
    assert(out("C")._4.isEmpty && out("C")._5 == 3.333333)
  }

  test("diffInDiff: 2×2 cell means and the difference; empty cell → NULL") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (true, false, 1.0), (true, true, 4.0),
      (false, false, 2.0), (false, true, 3.0)).toDF("tr", "po", "v")
    val out = Market.diffInDiff(df, col("tr"), col("po"), "v")
      .as[(Long, Double, Double, Double, Double, Option[Double])].head()
    assert(out == ((4L, 1.0, 4.0, 2.0, 3.0, Some(2.0))))
    val missing = Seq((true, true, 4.0), (false, false, 2.0), (false, true, 3.0))
      .toDF("tr", "po", "v")
    assert(Market.diffInDiff(missing, col("tr"), col("po"), "v")
      .as[(Long, Option[Double], Option[Double], Option[Double], Option[Double], Option[Double])]
      .head()._6.isEmpty)
  }

  test("priceElasticity: two-point log-log slope, degenerate price NULL") {
    import org.apache.spark.sql.functions.col
    // price 2→1 while qty 2→4: elasticity −1 (halve price, double demand)
    val df = Seq(
      ("B", "m1", 2.0, 4.0), ("B", "m2", 4.0, 4.0),
      ("C", "m1", 2.0, 4.0), ("C", "m2", 3.0, 6.0)) // constant price 2
      .toDF("g", "pd", "q", "r")
    val out = Market.priceElasticity(df, "g", col("pd"), "q", "r")
      .as[(String, Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    assert(out("B") == (("B", 2L, Some(-1.0))))
    assert(out("C") == (("C", 2L, None))) // zero price variance
  }

  test("mixShift: mix + within contributions reconstruct the mean change") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("G", "A", 10.0), ("G", "A", 10.0), ("H", "A", 20.0), ("H", "A", 20.0),
      ("G", "B", 30.0), ("H", "B", 20.0), ("H", "B", 20.0))
      .toDF("g", "p", "v")
    val out = Market.mixShift(df, "g", col("p"), "v", "A", "B")
      .as[(String, Double, Double, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    // G: w .5→1/3, m 10→30 → mix (1/3−.5)·10 = −1.666667, within 1/3·20
    assert(out("G") == (("G", 0.5, 0.333333, 10.0, 30.0, -1.666667, 6.666667)))
    assert(out("H") == (("H", 0.5, 0.666667, 20.0, 20.0, 3.333333, 0.0)))
    // ledger closes: M_B − M_A = 70/3 − 15 = Σ(mix + within) ≈ 8.333333
    val total = out.values.map(r => r._6 + r._7).sum
    assert(math.abs(total - (70.0 / 3 - 15.0)) < 1e-5)
  }

  test("elbowPoint: max chord gap on a hand-built concentration curve") {
    val df = Seq(("a", 50.0), ("b", 30.0), ("c", 10.0), ("d", 10.0))
      .toDF("item", "v")
    val out = Market.elbowPoint(df, "item", "v")
      .as[(Long, Long, String, Double, Double)].head()
    // cum shares .5/.8/.9/1 vs diagonal .25/.5/.75/1 → gap peaks at rank 2
    assert(out == ((4L, 2L, "b", 0.8, 0.3)))
  }

  test("eValue: closed-form on a hand case (RR = 4)") {
    import org.apache.spark.sql.functions.col
    val df = Seq((true, true), (true, true),
      (false, true), (false, false), (false, false), (false, false))
      .toDF("t", "y")
    val out = Market.eValue(df, col("t"), col("y"))
      .as[(Long, Long, Double, Double, Double, Double)].head()
    val e = BigDecimal(4.0 + math.sqrt(12.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == ((2L, 4L, 1.0, 0.25, 4.0, e)))
  }

  test("cuped: y == x ⇒ θ = 1, full variance removal, zero adjusted diff") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1.0, 1.0, true), (2.0, 2.0, true),
      (3.0, 3.0, false), (4.0, 4.0, false)).toDF("y", "x", "a")
    val out = Market.cuped(df, col("y"), col("x"), col("a"))
      .as[(Long, Double, Double, Double, Double, Double, Double)].head()
    assert(out._1 == 4L && out._2 == 1.0)  // θ = 1
    assert(out._4 == 0.0 && out._5 == 1.0) // var_y_adj 0, reduction 1
    assert(out._6 == -2.0 && out._7 == 0.0) // raw gap vanishes adjusted
  }

  test("ivEstimate: Wald ratio on an exactly-linear system") {
    import org.apache.spark.sql.functions.col
    // x = 2z, y = 6z → first stage 2, reduced form 6, β_IV = 3
    val df = Seq((0.0, 0.0, 0.0), (0.0, 0.0, 0.0),
      (1.0, 2.0, 6.0), (1.0, 2.0, 6.0)).toDF("z", "x", "y")
    val out = Market.ivEstimate(df, col("z"), col("x"), col("y"))
      .as[(Long, Double, Double, Double)].head()
    assert(out == ((4L, 2.0, 6.0, 3.0)))
  }

  test("upliftDeciles: honest-split scoring puts the responsive stratum on top") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      // train (even ids): s1 uplift 1.0, s2 uplift 0.0
      (0L, "s1", true, true), (2L, "s1", true, true),
      (4L, "s1", false, false), (6L, "s1", false, false),
      (8L, "s2", true, false), (10L, "s2", true, false),
      (12L, "s2", false, false), (14L, "s2", false, false),
      // test (odd ids)
      (1L, "s1", true, true), (3L, "s1", false, false),
      (5L, "s2", true, false), (7L, "s2", false, false))
      .toDF("id", "s", "t", "y")
    val out = Market.upliftDeciles(rows, "id", "s", col("t"), col("y"),
        col("id") % 2 === 0, nBuckets = 2)
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 1L, 1L, 1.0, 0.0, 1.0, 1.0))) // s1 rows
    assert(out(2L) == ((2L, 1L, 1L, 0.0, 0.0, 0.0, 0.0))) // s2 rows
  }

  test("theilDecompose: equal within-group values ⇒ within 0, total = between") {
    val df = Seq(("G1", 1.0), ("G1", 1.0), ("G2", 2.0), ("G2", 2.0))
      .toDF("g", "x")
    val out = Market.theilDecompose(df, "g", "x")
      .as[(Long, Long, Double, Double, Double)].head()
    // T = 2·(1/6)ln(2/3) + 2·(1/3)ln(4/3) = 0.056633; T_g = 0 each
    assert(out == ((4L, 2L, 0.056633, 0.0, 0.056633)))
  }

  test("theilDecompose: decomposition ledger closes on skewed groups") {
    val df = Seq(("A", 1.0), ("A", 3.0), ("B", 2.0), ("B", 10.0), ("B", 4.0))
      .toDF("g", "x")
    val r = Market.theilDecompose(df, "g", "x")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r._1 == 5L && r._2 == 2L)
    assert(math.abs(r._3 - (r._4 + r._5)) < 1e-5) // total ≈ within + between
    assert(r._4 > 0 && r._5 > 0)
  }
}
