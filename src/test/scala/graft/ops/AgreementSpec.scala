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
}
