package graft.ops

import graft.SparkSpec

/** Agreement coefficients against hand-computed fixtures (every number
  * below derives from the published formulas worked by hand). */
class AgreementSpec extends SparkSpec {
  import spark.implicits._

  test("krippendorffAlpha: hand-worked ragged fixture (drops m=1 items)") {
    // A: x,x   B: x,x   C: x,y,y   D: z (dropped — unpairable)
    // n=7, D_o = (0 + 0 + (9-5)/2)/7 = 2/7; marginals x=5 y=2,
    // D_e = (49-29)/42 = 20/42; alpha = 1 - (2/7)/(20/42) = 0.4
    val r = Seq(("A", "x"), ("A", "x"), ("B", "x"), ("B", "x"),
      ("C", "x"), ("C", "y"), ("C", "y"), ("D", "z"))
    val got = Agreement.krippendorffAlpha(r.toDF("item", "label"),
      "item", "label").collect()(0)
    assert(got.getLong(0) == 3L, "n_items")
    assert(got.getLong(1) == 7L, "n_ratings")
    assert(got.getLong(2) == 2L, "n_labels — the dropped item's label must not count")
    assert(got.getDouble(3) == 0.285714, "d_o")
    assert(got.getDouble(4) == 0.47619, "d_e")
    assert(got.getDouble(5) == 0.4, "alpha")
  }

  test("krippendorffAlpha: chance-level disagreement pins alpha to 0; perfect to 1") {
    // A: x,x  B: x,y  C: x,y,y -> D_o = D_e = 4/7 exactly
    val chance = Seq(("A", "x"), ("A", "x"), ("B", "x"), ("B", "y"),
      ("C", "x"), ("C", "y"), ("C", "y"))
    val a0 = Agreement.krippendorffAlpha(chance.toDF("item", "label"),
      "item", "label").collect()(0)
    assert(a0.getDouble(5) == 0.0, s"chance-level alpha: $a0")
    val perfect = Seq(("A", "x"), ("A", "x"), ("B", "y"), ("B", "y"))
    val a1 = Agreement.krippendorffAlpha(perfect.toDF("item", "label"),
      "item", "label").collect()(0)
    assert(a1.getDouble(5) == 1.0, s"perfect alpha: $a1")
  }

  test("fleissKappa: hand-worked 3-rater fixture") {
    // A: x,x,x  B: x,x,y  C: y,y,y  D: x,y,z
    // P_u = 1, 1/3, 1, 0 -> p_bar = 0.583333; p_c = 6/12, 5/12, 1/12
    // -> p_e = 0.25 + 0.173611111 + 0.006944444 = 0.430555555
    // kappa = 0.152777778 / 0.569444445 = 0.268293
    val r = Seq(("A", "x"), ("A", "x"), ("A", "x"),
      ("B", "x"), ("B", "x"), ("B", "y"),
      ("C", "y"), ("C", "y"), ("C", "y"),
      ("D", "x"), ("D", "y"), ("D", "z"))
    val got = Agreement.fleissKappa(r.toDF("item", "label"),
      "item", "label").collect()(0)
    assert(got.getLong(0) == 4L, "n_items")
    assert(got.getLong(1) == 3L, "n_raters")
    assert(got.getLong(2) == 3L, "n_labels")
    assert(got.getDouble(3) == 0.583333, "p_bar")
    assert(got.getDouble(4) == 0.430556, "p_e")
    assert(got.getDouble(5) == 0.268293, "kappa")
  }

  test("fleissKappa rejects ragged coverage loudly") {
    val r = Seq(("A", "x"), ("A", "x"), ("B", "x"))
    val e = intercept[IllegalArgumentException] {
      Agreement.fleissKappa(r.toDF("item", "label"), "item", "label")
    }
    assert(e.getMessage.contains("krippendorffAlpha"),
      "the error must route the caller to the ragged-coverage op")
  }

  test("gwetAC1: hand-worked fixture on the fleiss panel, skew robustness") {
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: BigDecimal) =
      x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = Seq(("A", "x"), ("A", "x"), ("A", "x"),
      ("B", "x"), ("B", "x"), ("B", "y"),
      ("C", "y"), ("C", "y"), ("C", "y"),
      ("D", "x"), ("D", "y"), ("D", "z"))
    // replay the op's own 9-dp term discipline for the expectation
    val pbar = (r9(1.0) + r9(1.0 / 3) + r9(1.0) + r9(0.0)).toDouble / 4
    val spi = r9((6.0 / 12) * (1 - 6.0 / 12)) +
      r9((5.0 / 12) * (1 - 5.0 / 12)) + r9((1.0 / 12) * (1 - 1.0 / 12))
    val peg = spi.toDouble / 2
    val got = Agreement.gwetAC1(r.toDF("item", "label"), "item", "label")
      .collect()(0)
    assert(got.getLong(0) == 4L && got.getLong(1) == 3L && got.getLong(2) == 3L)
    assert(got.getDouble(3) == r6(BigDecimal(pbar)), "p_bar")
    assert(got.getDouble(4) == r6(BigDecimal(peg)), "p_e_gamma")
    assert(got.getDouble(5) == r6(BigDecimal((pbar - peg) / (1 - peg))), "ac1")
    // the kappa paradox: one dominant label, two raters always agreeing
    // on it -> kappa collapses toward 0, AC1 stays high
    val skew = (1 to 49).flatMap(i => Seq((s"i$i", "ok"), (s"i$i", "ok"))) ++
      Seq(("iBad", "ok"), ("iBad", "bad"))
    val k = Agreement.fleissKappa(skew.toDF("item", "label"), "item", "label")
      .collect()(0).getDouble(5)
    val a = Agreement.gwetAC1(skew.toDF("item", "label"), "item", "label")
      .collect()(0).getDouble(5)
    assert(a > 0.9 && k < 0.5, s"AC1 $a should resist the skew kappa $k hits")
  }

  test("cronbachAlpha: hand-worked two-component panel; contracts are loud") {
    // comp a: [1,2,3,4] var 5/3; comp b: [2,3,5,6] var 10/3;
    // totals [3,5,8,10] var 29/3 -> alpha = 2*(1 - 15/29) = 28/29
    val r = Seq((1L, "a", 1L), (1L, "b", 2L), (2L, "a", 2L), (2L, "b", 3L),
      (3L, "a", 3L), (3L, "b", 5L), (4L, "a", 4L), (4L, "b", 6L))
    val got = Agreement.cronbachAlpha(r.toDF("s", "c", "x"),
        $"s", $"c", $"x")
      .as[(Long, Long, Double, Double, Option[Double])].head()
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == ((4L, 2L, 5.0, r6(29.0 / 3), Some(r6(28.0 / 29)))),
      got.toString)
    // incomplete panel raises
    val e = intercept[IllegalArgumentException] {
      Agreement.cronbachAlpha(
        Seq((1L, "a", 1L), (1L, "b", 2L), (2L, "a", 2L)).toDF("s", "c", "x"),
        $"s", $"c", $"x")
    }
    assert(e.getMessage.contains("COMPLETE"), e.getMessage)
    // fractional scores raise (the integralLong contract)
    val e2 = intercept[Exception] {
      Agreement.cronbachAlpha(
        Seq((1L, "a", 1.5), (1L, "b", 2.0), (2L, "a", 2.0), (2L, "b", 3.0))
          .toDF("s", "c", "x"), $"s", $"c", $"x").collect()
    }
    assert(e2.getMessage.contains("integral"), String.valueOf(e2.getMessage))
  }
}
