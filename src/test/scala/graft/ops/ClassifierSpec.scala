package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.Tables.documents(spark, sfTiny)

  private def logLoss(iters: Int): Double = {
    val w = Classifier.logregFit(docs, "doc_id", "text", col("lang") === "en",
      buckets = 64, iters = iters, rate = 0.02)
    val rows = Classifier.logregScore(docs, "doc_id", "text",
        col("lang") === "en", w)
      .select($"p", $"is_target").as[(Double, Boolean)].collect()
    rows.map { case (p, y) =>
      val pc = math.min(math.max(p, 1e-9), 1 - 1e-9)
      if (y) -math.log(pc) else -math.log(1 - pc)
    }.sum / rows.length
  }

  test("gradient descent reduces training log-loss monotonically") {
    val l0 = logLoss(0) // zero weights: p = 0.5 everywhere, loss = ln 2
    val l1 = logLoss(1)
    val l3 = logLoss(3)
    assert(math.abs(l0 - math.log(2.0)) < 1e-6)
    assert(l1 < l0, s"one step must cut loss: $l1 vs $l0")
    assert(l3 < l1, s"three steps must cut further: $l3 vs $l1")
  }

  test("fit is invariant to input partitioning (integer-gradient sums)") {
    def fit(parts: Int) = Classifier.logregFit(docs.repartition(parts),
      "doc_id", "text", col("lang") === "en", buckets = 64, iters = 2,
      rate = 0.02)
    assert(fit(3) == fit(17), "weights must not depend on partition layout")
  }

  test("featureless docs still train and score through the bias") {
    val tiny = Seq((1L, "", "en"), (2L, "solo", "de"),
      (3L, "two words here", "en")).toDF("doc_id", "text", "lang")
    val w = Classifier.logregFit(tiny, "doc_id", "text", col("lang") === "en",
      buckets = 8, iters = 2, rate = 0.02)
    val scored = Classifier.logregScore(tiny, "doc_id", "text",
        col("lang") === "en", w)
      .select($"doc_id", $"p").as[(Long, Double)].collect().toMap
    assert(scored.keySet == Set(1L, 2L, 3L))
    // both doc 1 ("") and doc 2 (single token) have zero bigrams:
    // identical bias-only features must yield the identical score
    assert(scored(1L) == scored(2L))
  }

  test("cohenKappa: perfect agreement 1, constant prediction 0") {
    import spark.implicits._
    val perfect = Seq(("a", "a"), ("b", "b"), ("c", "c"), ("a", "a"))
      .toDF("t", "p")
    val k1 = Classifier.cohenKappa(perfect, "t", "p")
      .as[(Long, Double, Double, Double)].head()
    assert(k1._2 == 1.0 && k1._4 == 1.0)
    // constant prediction: po == pe exactly → kappa 0
    val const = Seq(("a", "a"), ("b", "a"), ("a", "a"), ("b", "a"))
      .toDF("t", "p")
    val k2 = Classifier.cohenKappa(const, "t", "p")
      .as[(Long, Double, Double, Double)].head()
    assert(k2._2 == 0.5 && k2._3 == 0.5 && k2._4 == 0.0)
  }

  test("calibrationCurve: bins partition the docs, frac_pos consistent") {
    import spark.implicits._
    val scored = Seq(
      (0.05, false), (0.08, false), (0.12, true), (0.55, true),
      (0.58, false), (0.95, true), (1.0, true))
      .toDF("p", "is_target")
    val out = Classifier.calibrationCurve(scored, "p", "is_target")
      .as[(Int, Long, Double, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.values.map(_._2).sum == 7)
    assert(out(9)._2 == 2) // 0.95 and the clamped 1.0
    assert(out(0) == ((0, 2L, 0.065, 0L, 0.0)))
    assert(out(5)._5 == 0.5) // one of two in bin 5 is positive
  }

  test("perClassF1: hand-checkable asymmetric case incl. never-predicted class") {
    import spark.implicits._
    // truth a,a,b,c — pred a,b,b,b: tp(a)=1, tp(b)=1, tp(c)=0; c never predicted
    val df = Seq(("a", "a"), ("a", "b"), ("b", "b"), ("c", "b")).toDF("t", "p")
    val out = Classifier.perClassF1(df, "t", "p")
      .as[(String, Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("a") == (("a", 2L, 1L, 1L, Some(1.0), Some(0.5), Some(2.0 / 3 * 1e6).map(v => math.round(v) / 1e6))))
    assert(out("b")._5.contains(math.round(1.0 / 3 * 1e6) / 1e6.toDouble))
    assert(out("b")._6.contains(1.0))
    assert(out("c") == (("c", 1L, 0L, 0L, None, Some(0.0), Some(0.0))))
  }

  test("confusion counts are a partition of the rows") {
    import spark.implicits._
    val df = Seq(("a", "a"), ("a", "b"), ("b", "b"), ("b", "b")).toDF("t", "p")
    val m = Classifier.confusion(df, "t", "p")
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    assert(m == Map(("a", "a") -> 1L, ("a", "b") -> 1L, ("b", "b") -> 2L))
  }

  test("rocAuc: separation, reversal, midrank ties, degenerate classes") {
    def auc(rows: Seq[(Int, Int)]) =
      Classifier.rocAuc(rows.toDF("s", "y"), col("s"), col("y"))
        .as[(Long, Long, Option[Double])].head()
    assert(auc(Seq((1, 0), (2, 0), (3, 1), (4, 1))) == ((2L, 2L, Some(1.0))))
    assert(auc(Seq((1, 1), (2, 0))) == ((1L, 1L, Some(0.0))))
    // tie at score 1: pos-vs-neg pair counts 0.5 → AUC (0.5 + 1)/2
    assert(auc(Seq((1, 0), (1, 1), (2, 1))) == ((2L, 1L, Some(0.75))))
    assert(auc(Seq((1, 1), (2, 1)))._3.isEmpty) // no negatives → NULL
  }

  test("ebShrinkRates: rates pull toward the moment-matched beta prior") {
    // rates .5, 0, .5 → m=1/3, v=1/18 → s=3, α=1:
    // shrunk_A = (1+1)/(2+3) = .4, shrunk_B = (0+1)/(2+3) = .2
    val df = Seq(
      ("A", 1), ("A", 0), ("B", 0), ("B", 0), ("C", 1), ("C", 0))
      .toDF("k", "s")
    val out = Classifier.ebShrinkRates(df, "k", col("s"))
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("A") == (("A", 2L, 1L, 0.5, 0.4)))
    assert(out("B") == (("B", 2L, 0L, 0.0, 0.2)))
    assert(out("C") == (("C", 2L, 1L, 0.5, 0.4)))
    // degenerate prior (all rates equal → v=0) falls back to raw rates
    val flat = Seq(("A", 1), ("A", 0), ("B", 1), ("B", 0)).toDF("k", "s")
    val f = Classifier.ebShrinkRates(flat, "k", col("s"))
      .as[(String, Long, Long, Double, Double)].collect()
    assert(f.forall(r => r._4 == r._5))
  }

  test("aipwEffect: reduces to the outcome model under perfect models") {
    // when m1/m0 are exactly the arm means and p is the true propensity,
    // the correction terms cancel within arms of homogeneous y
    val df = Seq(
      (true, 0.5, 1.0, 1.0, 0.0), (true, 0.5, 1.0, 1.0, 0.0),
      (false, 0.5, 0.0, 1.0, 0.0), (false, 0.5, 0.0, 1.0, 0.0))
      .toDF("t", "p", "y", "m1", "m0")
    val out = Classifier.aipwEffect(df, "p", col("t"), col("y"),
        col("m1"), col("m0"))
      .as[(Long, Double, Double)].head()
    // y − m̂ = 0 everywhere → ψ = m1 − m0 = 1 exactly
    assert(out == ((4L, 1.0, 1.0)))
  }

  test("aipwEffect: IPW correction moves the estimate off a wrong model") {
    val df = Seq(
      (true, 0.5, 1.0, 0.0, 0.0),  // model says 0, data says 1
      (false, 0.5, 0.0, 0.0, 0.0))
      .toDF("t", "p", "y", "m1", "m0")
    val out = Classifier.aipwEffect(df, "p", col("t"), col("y"),
        col("m1"), col("m0"))
      .as[(Long, Double, Double)].head()
    assert(out._2 == 0.0)  // the outcome model alone sees nothing
    assert(out._3 == 1.0)  // ψ = 0 + 1·(1−0)/0.5 /2 units = 1
  }

  test("propensityOverlap: range and band share per arm") {
    val df = Seq((true, 0.95), (true, 0.5), (false, 0.05), (false, 0.4))
      .toDF("t", "p")
    val out = Classifier.propensityOverlap(df, "p", col("t"))
      .as[(Boolean, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(true) == ((true, 2L, 0.5, 0.95, 0.5)))   // 0.95 outside
    assert(out(false) == ((false, 2L, 0.05, 0.4, 0.5))) // 0.05 outside
  }

  test("mondrianConformal: per-group q̂ differs from a global one") {
    // group g: residuals {2,3,9} → q̂=9; group h: residuals {1,1,1} → q̂=1
    val df = Seq(
      ("g", 10.0, 0), ("g", 10.0, 0),
      ("g", 12.0, 1), ("g", 13.0, 1), ("g", 19.0, 1),
      ("g", 15.0, 2), ("g", 25.0, 2),
      ("h", 20.0, 0), ("h", 20.0, 0),
      ("h", 21.0, 1), ("h", 21.0, 1), ("h", 19.0, 1),
      ("h", 20.5, 2), ("h", 30.0, 2))
      .toDF("g", "y", "s")
    val out = Classifier.mondrianConformal(df, "g", "y", col("s"),
        alpha = 0.1)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("g") == (("g", 3L, 2L, 9.0, 0.5)))
    assert(out("h") == (("h", 3L, 2L, 1.0, 0.5)))
  }

  test("expectedCalibrationError: two-bin hand case") {
    // bin 2 (p=0.25, n=2, acc 0.5): term (2/4)·|0.5−0.25| = 0.125
    // bin 9 (p=0.95, n=2, acc 1.0): term (2/4)·|1.0−0.95| = 0.025
    val df = Seq((0.25, true), (0.25, false), (0.95, true), (0.95, true))
      .toDF("p", "y")
    val out = Classifier.expectedCalibrationError(df, "p", col("y"))
      .as[(Long, Long, Double)].head()
    assert(out == ((4L, 2L, 0.15)))
  }

  test("ipwEffect: hand-checkable Hájek quotients") {
    val df = Seq(
      (true, 0.8, 1.0), (true, 0.4, 0.0),
      (false, 0.5, 1.0), (false, 0.9, 0.0))
      .toDF("t", "p", "y")
    val out = Classifier.ipwEffect(df, "p", col("t"), col("y"))
      .as[(Long, Long, Double, Double, Double)].head()
    // treated: w 1.25 + 2.5, wy 1.25 → 1/3; control: w 2 + 10, wy 2 → 1/6
    assert(out == ((4L, 2L, 0.333333, 0.166667, 0.166667)))
  }

  test("fairnessAudit: confusion arithmetic and parity gap by hand") {
    val df = Seq(
      ("g1", true, true), ("g1", true, false), ("g1", false, true),
      ("g1", false, false),
      ("g2", true, true), ("g2", false, false), ("g2", false, false),
      ("g3", false, false)) // no positives → tpr NULL
      .toDF("g", "pred", "y")
    val out = Classifier.fairnessAudit(df, "g", col("pred"), col("y"))
      .as[(String, Long, Double, Option[Double], Option[Double], Double)]
      .collect().map(r => r._1 -> r).toMap
    // g1: sel 0.5, tpr 1/2, fpr 1/2; g2: sel 1/3, tpr 1, fpr 0;
    // g3: sel 0, tpr NULL, fpr 0; gap = 0.5 − 0
    assert(out("g1") == (("g1", 4L, 0.5, Some(0.5), Some(0.5), 0.5)))
    assert(out("g2") == (("g2", 3L, 0.333333, Some(1.0), Some(0.0), 0.5)))
    assert(out("g3") == (("g3", 1L, 0.0, None, Some(0.0), 0.5)))
  }

  test("conformalInterval: order-statistic q̂ and test coverage by hand") {
    // split 0 = train {10,10} → μ=10; split 1 = cal residuals {2,3,9};
    // rank = min(ceil(4·0.9), 3) = 3 → q̂ = 9; split 2 = test residuals
    // {5, 15} → coverage 1/2
    val df = Seq(
      ("g", 10.0, 0), ("g", 10.0, 0),
      ("g", 12.0, 1), ("g", 13.0, 1), ("g", 19.0, 1),
      ("g", 15.0, 2), ("g", 25.0, 2))
      .toDF("g", "y", "s")
    val out = Classifier.conformalInterval(df, "g", "y", col("s"), alpha = 0.1)
      .as[(Long, Long, Double, Double)].head()
    assert(out == ((3L, 2L, 9.0, 0.5)))
  }

  test("brierDecomposition: hand-computed Murphy terms and the REL−RES+UNC identity") {
    // two occupied bins: bin 2 (p = .25, .25 → p̄ = .25, 1 of 2 positive,
    // ȳ_b = .5) and bin 7 (p = .75, .75 → p̄ = .75, 1 of 2 positive,
    // ȳ_b = .5); ȳ = .5.
    // REL = [2·(.25−.5)² + 2·(.75−.5)²]/4 = .0625; RES = 0; UNC = .25
    val df = Seq((0.25, true), (0.25, false), (0.75, true), (0.75, false))
      .toDF("p", "y")
    val r = Classifier.brierDecomposition(df, "p", col("y"))
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(r == ((4L, 2L, 0.0625, 0.0, 0.25, 0.3125)))
    // a perfectly calibrated, discriminating forecaster: REL = 0 and
    // RES > 0; identity still holds at round-6
    val good = Seq((0.05, false), (0.05, false), (0.95, true), (0.95, true))
      .toDF("p", "y")
    val g = Classifier.brierDecomposition(good, "p", col("y"))
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(g._3 == 0.0025 && g._4 == 0.25 && g._5 == 0.25)
    assert(math.abs(g._6 - (g._3 - g._4 + g._5)) < 1e-9)
  }

  test("conformalInterval rejects a random split — even as a SQL string") {
    val df = Seq(("g", 10.0, 0)).toDF("g", "y", "s")
    // column-API randomness
    val e1 = intercept[IllegalArgumentException] {
      Classifier.conformalInterval(df, "g", "y",
        when(rand() < 0.5, 0).otherwise(1))
    }
    assert(e1.getMessage.contains("deterministic"))
    // SQL-string randomness parses to an UnresolvedFunction whose
    // default deterministic=true — the guard must check the ANALYZED
    // expression or this leaks rows across train/cal/test
    val e2 = intercept[IllegalArgumentException] {
      Classifier.conformalInterval(df, "g", "y",
        expr("CASE WHEN rand() < 0.5 THEN 0 ELSE 1 END"))
    }
    assert(e2.getMessage.contains("deterministic"))
  }

  test("ipwEffect: propensities clip to the overlap band") {
    val df = Seq((true, 0.001, 1.0), (false, 0.999, 1.0)).toDF("t", "p", "y")
    val out = Classifier.ipwEffect(df, "p", col("t"), col("y"))
      .as[(Long, Long, Double, Double, Double)].head()
    // p clips to 0.05 / 0.95 → both weights 20, both means 1.0, ate 0
    assert(out == ((2L, 1L, 1.0, 1.0, 0.0)))
  }

  test("mcnemar: hand-worked discordant cells") {
    // 3 both-right, 2 both-wrong, 4 only-A, 1 only-B
    // chi2 = (|4-1|-1)²/5 = 0.8
    val rows =
      Seq.fill(3)((true, true, true)) ++ Seq.fill(2)((true, false, false)) ++
      Seq.fill(4)((true, true, false)) ++ Seq.fill(1)((true, false, true))
    val got = Classifier.mcnemar(rows.toDF("t", "a", "b"), $"t", $"a", $"b")
      .as[(Long, Long, Long, Long, Long, Option[Double])].head()
    assert(got == ((10L, 3L, 2L, 4L, 1L, Some(0.8))), got.toString)
    // no disagreement -> NULL chi2
    val same = Seq((true, true, true), (true, false, false))
    val g2 = Classifier.mcnemar(same.toDF("t", "a", "b"), $"t", $"a", $"b")
      .as[(Long, Long, Long, Long, Long, Option[Double])].head()
    assert(g2._6.isEmpty)
  }

  test("cochranQ: hand-worked 3-classifier fixture") {
    // correctness matrix rows: 111, 100, 110, 000
    // C = (3,2,1), N = 6, ΣR² = 14 -> Q = 2(3·14 − 36)/(18 − 14) = 3.0
    val rows = Seq(
      (true, true, true, true),
      (true, true, false, false),
      (true, true, true, false),
      (true, false, false, false))
    val got = Classifier.cochranQ(rows.toDF("t", "a", "b", "c"), $"t",
        Seq($"a", $"b", $"c"))
      .as[(Int, Long, Option[Double], Int)].head()
    assert(got == ((3, 4L, Some(3.0), 2)), got.toString)
  }

  test("isotonicCalibrate: PAV merges the violating bins, weighted") {
    // bin rates 0.5, 0.25, 0.75 -> bins 0+1 pool to 3/8 = 0.375
    def rows(p: Double, pos: Int, neg: Int) =
      Seq.fill(pos)((p, true)) ++ Seq.fill(neg)((p, false))
    val scored = (rows(0.01, 2, 2) ++ rows(0.11, 1, 3) ++ rows(0.21, 3, 1))
      .toDF("p", "y")
    val got = Classifier.isotonicCalibrate(scored, "p", $"y", bins = 10)
      .orderBy($"bin").as[(Int, Long, Double, Double)].collect().toSeq
    assert(got == Seq((0, 4L, 0.5, 0.375), (1, 4L, 0.25, 0.375),
      (2, 4L, 0.75, 0.75)), got.toString)
  }

  test("isotonicCalibrate: already-monotone rates pass through; full collapse pools all") {
    def rows(p: Double, pos: Int, neg: Int) =
      Seq.fill(pos)((p, true)) ++ Seq.fill(neg)((p, false))
    val mono = (rows(0.05, 1, 4) ++ rows(0.55, 3, 2) ++ rows(0.95, 5, 0))
      .toDF("p", "y")
    val g1 = Classifier.isotonicCalibrate(mono, "p", $"y", bins = 10)
      .orderBy($"bin").as[(Int, Long, Double, Double)].collect().toSeq
    assert(g1.forall(r => r._3 == r._4), s"monotone input must be identity: $g1")
    val anti = (rows(0.05, 4, 1) ++ rows(0.55, 2, 3) ++ rows(0.95, 0, 5))
      .toDF("p", "y")
    val g2 = Classifier.isotonicCalibrate(anti, "p", $"y", bins = 10)
      .orderBy($"bin").as[(Int, Long, Double, Double)].collect().toSeq
    assert(g2.forall(_._4 == 0.4), s"anti-monotone input must pool to 6/15: $g2")
  }

  test("prAuc: the scikit hand case, tie blocks, degenerate label sets") {
    // y=[0,0,1,1], s=[.1,.4,.35,.8] → AP = 1·(1/2) + (2/3)·(1/2) = 5/6
    val got = Classifier.prAuc(
        Seq((0.1, 0), (0.4, 0), (0.35, 1), (0.8, 1)).toDF("s", "y"),
        $"s", $"y")
      .as[(Long, Long, Option[Double])].head()
    assert(got._1 == 2L && got._2 == 2L, got.toString)
    assert(got._3.contains(0.833333), got.toString)
    // tied scores form ONE threshold block: TP=1, PP=2 → AP = 0.5
    val tied = Classifier.prAuc(
        Seq((0.5, 1), (0.5, 0)).toDF("s", "y"), $"s", $"y")
      .as[(Long, Long, Option[Double])].head()
    assert(tied._3.contains(0.5), tied.toString)
    // all negative: undefined (NULL), not zero
    val neg = Classifier.prAuc(
        Seq((0.2, 0), (0.7, 0)).toDF("s", "y"), $"s", $"y")
      .as[(Long, Long, Option[Double])].head()
    assert(neg == ((0L, 2L, None)), neg.toString)
    // all positive: every threshold has precision 1 → AP = 1
    val pos = Classifier.prAuc(
        Seq((0.2, 1), (0.7, 1)).toDF("s", "y"), $"s", $"y")
      .as[(Long, Long, Option[Double])].head()
    assert(pos._3.contains(1.0), pos.toString)
  }

  test("mantelHaenszel: hand-worked two-stratum pooling and CMH chi2") {
    // S1: a=4 b=1 c=2 d=3; S2: a=2 b=3 c=1 d=4 (n=10 each)
    // OR_MH = (1.2+0.8)/(0.2+0.3) = 4; E[a]=3+1.5, Var=0.6667+0.5833
    // CMH = (6−4.5)²/1.25 = 1.8
    def cell(s: String, e: Boolean, o: Boolean, k: Int) =
      Seq.fill(k)((s, e, o))
    val df = (cell("s1", true, true, 4) ++ cell("s1", true, false, 1) ++
      cell("s1", false, true, 2) ++ cell("s1", false, false, 3) ++
      cell("s2", true, true, 2) ++ cell("s2", true, false, 3) ++
      cell("s2", false, true, 1) ++ cell("s2", false, false, 4))
      .toDF("st", "e", "o")
    val got = Classifier.mantelHaenszel(df, $"e", $"o", $"st")
      .as[(Long, Long, Option[Double], Option[Double])].head()
    assert(got == ((2L, 20L, Some(4.0), Some(1.8))), got.toString)
    // a single-row stratum adds 0 variance and no crash (n−1 = 0)
    val df2 = df.union(Seq(("s3", true, true)).toDF("st", "e", "o"))
    val got2 = Classifier.mantelHaenszel(df2, $"e", $"o", $"st")
      .as[(Long, Long, Option[Double], Option[Double])].head()
    assert(got2._1 == 3L && got2._2 == 21L, got2.toString)
    // Σa grows by 1, E[a] by 1 (the 1×1 table is deterministic): CMH unchanged
    assert(got2._4.contains(1.8), got2.toString)
  }

  test("isotonicCalibrate: null p / null truth rows drop (no NPE, no silent negative)") {
    val scored = Seq(
      (Some(0.05), Some(false)), (Some(0.05), Some(true)),
      (None, Some(true)),          // null p: would bin to NULL and NPE
      (Some(0.15), None),          // null truth: would count as negative
      (Some(0.15), Some(true))
    ).toDF("p", "y")
    val got = Classifier.isotonicCalibrate(scored, "p", $"y", bins = 10)
      .orderBy($"bin").as[(Int, Long, Double, Double)].collect().toSeq
    assert(got == Seq((0, 2L, 0.5, 0.5), (1, 1L, 1.0, 1.0)), got.toString)
  }

  test("wilsonCi: hand formula; edge rates stay non-degenerate inside [0,1]") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val z = 1.959964
    def wilson(n: Int, x: Int): (Double, Double) = {
      val p = x.toDouble / n
      val den = 1.0 + z * z / n
      val ctr = p + z * z / (2.0 * n)
      val hf = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
      (r6((ctr - hf) / den), r6((ctr + hf) / den))
    }
    val rows = (1 to 7).map(_ => ("a", true)) ++ (1 to 3).map(_ => ("a", false)) ++
      (1 to 5).map(_ => ("zero", false)) ++ (1 to 4).map(_ => ("full", true))
    val got = Classifier.wilsonCi(rows.toDF("g", "s"), "g", $"s")
      .orderBy("group").as[(String, Long, Long, Double, Double, Double)]
      .collect().toSeq
    val (aLo, aHi) = wilson(10, 7)
    val (zLo, zHi) = wilson(5, 0)
    val (fLo, fHi) = wilson(4, 4)
    assert(got == Seq(
      ("a", 10L, 7L, 0.7, aLo, aHi),
      ("full", 4L, 4L, 1.0, fLo, fHi),
      ("zero", 5L, 0L, 0.0, zLo, zHi)), got.toString)
    // the Wald-breaking edges: zero-rate lo pins to 0 but hi is OPEN,
    // full-rate hi pins to 1 but lo is open — never a ±0 interval
    assert(zLo == 0.0 && zHi > 0.0 && fHi == 1.0 && fLo < 1.0)
  }

  test("riskTable: hand-worked 2x2 RR/OR/CI/h; zero cells go NULL, not inf") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // a=8 b=2 c=3 d=7: r1 0.8, r2 0.3, RR 8/3, OR 56/6,
    // se = sqrt(1/8+1/2+1/3+1/7), h = 2asin(sqrt .8) − 2asin(sqrt .3)
    val rows =
      Seq.fill(8)((true, true)) ++ Seq.fill(2)((true, false)) ++
      Seq.fill(3)((false, true)) ++ Seq.fill(7)((false, false))
    val got = Classifier.riskTable(rows.toDF("e", "o"), $"e", $"o")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double], Option[Double], Option[Double],
        Option[Double])].head()
    val orv = 8.0 * 7.0 / (2.0 * 3.0)
    val se = math.sqrt(1.0 / 8 + 1.0 / 2 + 1.0 / 3 + 1.0 / 7)
    val z = 1.959964
    assert(got == ((8L, 2L, 3L, 7L, Some(0.8), Some(0.3),
      Some(r6(0.8 / 0.3)), Some(r6(orv)),
      Some(r6(math.exp(math.log(orv) - z * se))),
      Some(r6(math.exp(math.log(orv) + z * se))),
      Some(r6(2 * math.asin(math.sqrt(0.8)) -
        2 * math.asin(math.sqrt(0.3)))))), got.toString)
    // a zero cell: OR family NULL (not inf), risks and h still defined
    val zc = Seq((true, true), (true, true), (false, true), (false, false))
    val g2 = Classifier.riskTable(zc.toDF("e", "o"), $"e", $"o")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double], Option[Double], Option[Double],
        Option[Double])].head()
    assert(g2._1 == 2L && g2._2 == 0L && g2._8.isEmpty && g2._9.isEmpty &&
      g2._5.contains(1.0) && g2._11.isDefined, g2.toString)
  }

  test("mcc: hand-worked 2x2, degenerate marginals NULL, balanced accuracy") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // tp=3 fp=1 fn=2 tn=4: mcc = (12−2)/√(4·5·5·6) = 10/√600
    val rows =
      Seq.fill(3)((true, true)) ++ Seq.fill(1)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(4)((false, false))
    val got = Classifier.mcc(rows.toDF("p", "t"), $"p", $"t")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])].head()
    assert(got == ((3L, 1L, 2L, 4L,
      Some(r6(10.0 / math.sqrt(600.0))),
      // tpr = 3/(3+2), tnr = 4/(4+1)
      Some(r6((3.0 / 5 + 4.0 / 5) / 2)))), got.toString)
    // all-positive predictions: tn+fn marginal is 0 → mcc undefined,
    // balanced accuracy still defined (both truth classes present)
    val onePred = Seq((true, true), (true, false)).toDF("p", "t")
    val g2 = Classifier.mcc(onePred, $"p", $"t")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])].head()
    // bacc = (1/1 + 0/1)/2: recall 1 on positives, 0 on negatives
    assert(g2 == ((1L, 1L, 0L, 0L, None, Some(0.5))), g2.toString)
    // empty input: one all-zero row, both metrics NULL
    val g3 = Classifier.mcc(Seq.empty[(Boolean, Boolean)].toDF("p", "t"),
        $"p", $"t")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])].head()
    assert(g3 == ((0L, 0L, 0L, 0L, None, None)), g3.toString)
  }
}
