package graft.ops

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("histogram clamps outliers to edge bins and zero-fills gaps") {
    val df = Seq(-5.0, 0.0, 1.0, 4.5, 99.0, 10.0).toDF("v")
    val h = Drift.histogram(df, "v", lo = 0.0, hi = 10.0, nbins = 5)
      .orderBy($"bin").select($"bin", $"n").as[(Int, Long)].collect()
    // bins of width 2: [-5,0]→bin0, 1→0, 4.5→2, 99→clamp bin4, 10→clamp bin4
    assert(h.toSeq == Seq((0, 3L), (1, 0L), (2, 1L), (3, 0L), (4, 2L)))
  }

  test("histogram ignores nulls and reports exact edges") {
    val df = Seq(Some(2.0), None, Some(6.0)).toDF("v")
    val h = Drift.histogram(df, "v", 0.0, 8.0, 4)
      .orderBy($"bin").select($"lo_edge", $"hi_edge", $"n")
      .as[(Double, Double, Long)].collect()
    assert(h.map(_._3).sum == 2)
    assert(h.head == ((0.0, 2.0, 0L)) || h.head._3 == 1L)
    assert(h.last._2 == 8.0)
  }

  test("chi-square drift: identical distributions give chi2 = 0") {
    val a = Seq("x", "x", "y").toDF("c")
    val out = Drift.chiSquareDrift(a, a, "c")
      .select($"chi2").as[Double].collect()
    assert(out.forall(_ == 0.0))
  }

  test("chi-square drift: new category gets NULL contrib, excluded from total") {
    val ref = Seq("x", "x", "y", "y").toDF("c")
    val cur = Seq("x", "y", "y", "z").toDF("c") // z unseen in ref
    val rows = Drift.chiSquareDrift(ref, cur, "c")
      .orderBy($"category")
      .select($"category", $"contrib", $"chi2")
      .as[(String, Option[Double], Double)].collect()
    val z = rows.find(_._1 == "z").get
    assert(z._2.isEmpty, "unseen category must have NULL contrib")
    // manual: p_ref(x)=.5 p_cur(x)=.25 -> .0625/.5 ; y: .5 vs .5 -> 0
    val expected = (0.25 - 0.5) * (0.25 - 0.5) / 0.5
    assert(math.abs(rows.head._3 - expected) < 1e-15)
    assert(rows.map(_._3).distinct.size == 1, "total repeated on every row")
  }

  test("keySkew reports share and mean-load ratio for the hot key") {
    // 6 rows of 'hot', 1 each of 'a','b' -> hot share 6/8, ratio 6*3/8
    val df = (Seq.fill(6)("hot") ++ Seq("a", "b")).toDF("k")
    val top = Drift.keySkew(df, "k", topK = 1)
      .as[(String, Long, Double, Double)].head()
    assert(top == (("hot", 6L, 6.0 / 8.0, 6.0 * 3.0 / 8.0)))
  }
}
