package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts nulls, distincts, typed min/max in one pass") {
    val df = Seq(
      (Some(3), Some("b")), (Some(1), None), (None, Some("a")),
      (Some(3), Some("a"))).toDF("x", "s")
    val p = Profile.profile(df, Seq("x", "s"))
      .orderBy($"column").collect()
    val x = p(1) // 'x' sorts after 's'
    assert(x.getString(0) == "x" && x.getLong(1) == 4 &&
      x.getLong(2) == 1 && x.getLong(3) == 2 &&
      x.getDouble(4) == 1.0 && x.getDouble(5) == 3.0 && x.isNullAt(6))
    val s = p(0)
    assert(s.getString(0) == "s" && s.getLong(2) == 1 &&
      s.getLong(3) == 2 && s.isNullAt(4) &&
      s.getString(6) == "a" && s.getString(7) == "b" &&
      s.getDouble(8) == 1.0)
  }

  test("profile plan shape: stats scan + melt scan, never an Expand") {
    val df = graft.Tables.lineitem(spark, sfTiny)
    val exact = Profile.profile(df,
      Seq("l_orderkey", "l_quantity", "l_returnflag"))
    // two scans (stats + narrow distinct melt), NOT per-column scans
    val scans = exact.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(scans.size == 2)
    // the multi-distinct Expand rewrite (rows × columns blowup) must not
    // appear — the melt replaces it
    val expands = exact.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.ExpandExec => e
    }
    assert(expands.isEmpty, "exact profile must not use the Expand rewrite")
  }

  test("approxDistinct path drops the Expand and stays within HLL error") {
    val df = graft.Tables.lineitem(spark, sfTiny)
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey")
    val exact = Profile.profile(df, cols).orderBy($"column")
      .select($"n_distinct").as[Long].collect()
    val approxPlan = Profile.profile(df, cols, approxDistinct = true)
    val approx = approxPlan.orderBy($"column")
      .select($"n_distinct").as[Long].collect()
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(a - e).toDouble / e < 0.1, s"approx $a vs exact $e")
    }
    val hasExpand = approxPlan.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.ExpandExec => e
    }.nonEmpty
    assert(!hasExpand, "approx profile must not Expand the scan")
  }

  test("audit counts violations per expectation kind") {
    val child = Seq((1, "a"), (1, "a"), (2, null), (3, "zz")).toDF("k", "v")
    val parent = Seq(1, 2).toDF("pk")
    val out = Profile.audit(Seq(
        Profile.Unique("uniq", child, Seq("k")),
        Profile.Complete("complete", child, "v"),
        Profile.SubsetOf("fk", child, "k", parent, "pk"),
        Profile.Satisfies("short", child, length($"v") <= 1)))
      .as[(String, Long, Boolean)].collect()
      .map { case (k, v, p) => k -> ((v, p)) }.toMap
    assert(out("uniq") == ((1L, false)))     // duplicated k=1
    assert(out("complete") == ((1L, false))) // one null v
    assert(out("fk") == ((1L, false)))       // k=3 has no parent
    // null v fails the predicate too (unknown is not a pass): v=null + "zz"
    assert(out("short") == ((2L, false)))
  }

  test("audit passes on clean data") {
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val out = Profile.audit(Seq(
        Profile.Unique("u", df, Seq("k")),
        Profile.Complete("c", df, "v")))
      .as[(String, Long, Boolean)].collect()
    assert(out.forall { case (_, v, p) => v == 0L && p })
  }

  test("winsorize clips exactly the tails outside the per-stratum band") {
    // stratum A: 1..100 → p05 = 5.95 (1 + 99·0.05 = index 5.95 → between
    // 5 and 6... use the invariant properties rather than a magic number
    val df = ((1 to 100).map(i => ("A", i.toDouble)) ++
      Seq(("B", 1.0), ("B", 2.0), ("B", 3.0))).toDF("g", "v")
    val out = Profile.winsorize(df, "v", "g", 0.05, 0.95)
      .select($"g", $"v", $"v_wins", $"clipped_lo", $"clipped_hi")
      .as[(String, Double, Double, Boolean, Boolean)].collect()
    val a = out.filter(_._1 == "A")
    // clipped values equal the (rounded) bound; interior survive untouched
    assert(a.count(_._4) == 5 && a.count(_._5) == 5) // 5% of 100 each side
    a.foreach { case (_, v, w, lo, hi) =>
      if (!lo && !hi) assert(v == w)
      else if (lo) assert(w > v && a.forall(x => x._3 >= w || x._4 == false))
      else assert(w < v)
    }
    // tiny stratum: p05/p95 interpolate within the 3 points, nothing exotic
    val b = out.filter(_._1 == "B")
    assert(b.forall(x => x._3 >= 1.0 && x._3 <= 3.0))
    // winsorized values never escape the original min/max
    assert(out.forall(x => x._3 >= 1.0 && x._3 <= 100.0))
  }

  test("skyline2d keeps exactly the non-dominated points") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, 1.00, 5), // frontier: cheapest
      (2L, 2.00, 9), // frontier: bigger for more money
      (3L, 2.00, 7), // dominated by 2 (same price, smaller)
      (4L, 3.00, 9), // dominated by 2 (pricier, same size)
      (5L, 1.50, 5), // dominated by 1 (pricier, same size)
      (6L, 4.00, 12) // frontier
    ).toDF("id", "price", "size")
    val got = Profile.skyline2d(df, "id", col("price"), col("size"), 100L)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 6L))
    // brute-force dominance check agrees
    val rows = Seq((1L, 100L, 5L), (2L, 200L, 9L), (3L, 200L, 7L),
      (4L, 300L, 9L), (5L, 150L, 5L), (6L, 400L, 12L))
    val brute = rows.filter { case (_, x, y) =>
      !rows.exists { case (_, x2, y2) =>
        (x2 < x && y2 >= y) || (x2 <= x && y2 > y) }
    }.map(_._1).toSet
    assert(got == brute)
  }

  test("anovaF: identical groups score ~0, separated groups score large") {
    import org.apache.spark.sql.functions._
    val sep = (Seq.fill(30)(("a", 10L)) ++ Seq.fill(30)(("b", 1000L)) ++
      (1 to 30).map(i => ("a", 10L + i % 3)) ++ (1 to 30).map(i => ("b", 1000L + i % 3)))
      .toDF("g", "x")
    val f1 = Profile.anovaF(sep, "g", "x")
      .as[(Long, Long, Option[Double])].head()
    assert(f1._1 == 2L && f1._2 == 120L)
    assert(f1._3.exists(_ > 1000.0), s"separated groups F=${f1._3}")
    val same = (1 to 40).map(i => (if (i % 2 == 0) "a" else "b", (i % 5).toLong))
      .toDF("g", "x")
    val f2 = Profile.anovaF(same, "g", "x").as[(Long, Long, Option[Double])].head()
    assert(f2._3.exists(_ < 1.0), s"identical-distribution F=${f2._3}")
  }

  test("brownForsythe == anovaF on hand-derived |x − group-median| deviations") {
    // medians under the doubled-cum crossing convention: a → 2 (lower
    // middle of 1,2,3,4), b → 10 (of 10,10,20)
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 10L), ("b", 10L), ("b", 20L)).toDF("g", "x")
    val got = Profile.brownForsythe(df, "g", "x")
      .as[(Long, Long, Option[Double])].head()
    val z = Seq(("a", 1L), ("a", 0L), ("a", 1L), ("a", 2L),
      ("b", 0L), ("b", 0L), ("b", 10L)).toDF("g", "z")
    val want = Profile.anovaF(z, "g", "z")
      .as[(Long, Long, Option[Double])].head()
    assert(got == want, s"got $got want $want")
    assert(got._1 == 2L && got._2 == 7L)
  }

  test("brownForsythe: equal spreads score small, unequal spreads large") {
    val eq = ((1 to 40).map(i => ("a", (i % 7).toLong)) ++
      (1 to 40).map(i => ("b", 100L + i % 7))).toDF("g", "x")
    val f1 = Profile.brownForsythe(eq, "g", "x")
      .as[(Long, Long, Option[Double])].head()
    // same spread around different centers: the median-deviation F must
    // NOT fire (this is exactly where raw anovaF fires hard)
    assert(f1._3.exists(_ < 1.5), s"equal-spread BF F=${f1._3}")
    val uneq = ((1 to 40).map(i => ("a", (i % 3).toLong)) ++
      (1 to 40).map(i => ("b", (i % 40) * 50L))).toDF("g", "x")
    val f2 = Profile.brownForsythe(uneq, "g", "x")
      .as[(Long, Long, Option[Double])].head()
    assert(f2._3.exists(_ > 20.0), s"unequal-spread BF F=${f2._3}")
  }

  test("welchT: hand-computed unequal-variance t and Satterthwaite df") {
    // A=[1,2,3,4]: m=2.5, s²=5/3; B=[10,20,30]: m=20, s²=100
    val df = Seq((1L, true), (2L, true), (3L, true), (4L, true),
      (10L, false), (20L, false), (30L, false)).toDF("x", "a")
    val got = Profile.welchT(df, $"x", $"a")
      .as[(Long, Long, Double, Double, Option[Double], Option[Double])]
      .head()
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (sa, sb) = ((30.0 - 10.0 * (10.0 / 4.0)) / 3.0,
      (1400.0 - 60.0 * (60.0 / 3.0)) / 2.0)
    val (ua, ub) = (sa / 4.0, sb / 3.0)
    assert(got._1 == 4L && got._2 == 3L)
    assert(got._3 == 2.5 && got._4 == 20.0, got.toString)
    assert(got._5.contains(r6((2.5 - 20.0) / math.sqrt(ua + ub))), got.toString)
    assert(got._6.contains(r6((ua + ub) * (ua + ub) /
      (ua * ua / 3.0 + ub * ub / 2.0))), got.toString)
    // a size-1 group cannot carry a variance: NULL t/df, real counts
    val tiny = Profile.welchT(
        Seq((5L, true), (1L, false), (2L, false)).toDF("x", "a"), $"x", $"a")
      .as[(Long, Long, Double, Double, Option[Double], Option[Double])]
      .head()
    assert(tiny._1 == 1L && tiny._5.isEmpty && tiny._6.isEmpty, tiny.toString)
  }

  test("pairedT: hand case keeps zeros (unlike the signed-rank twin)") {
    val got = Profile.pairedT(
        Seq(3L, -1L, 2L, 2L, -4L, 0L).toDF("d"), $"d")
      .as[(Long, Option[Double], Option[Double], Option[Long])].head()
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // n=6, Σd=2, Σd²=34: m=1/3, s²=(34−2·(2/6))/5
    val m = 2.0 / 6.0
    val v2 = (34.0 - 2.0 * m) / 5.0
    assert(got._1 == 6L && got._2.contains(r6(m)), got.toString)
    assert(got._3.contains(r6(m / math.sqrt(v2 / 6.0))), got.toString)
    assert(got._4.contains(5L), got.toString)
    // constant diffs: zero spread, NULL t
    val const = Profile.pairedT(Seq(4L, 4L, 4L).toDF("d"), $"d")
      .as[(Long, Option[Double], Option[Double], Option[Long])].head()
    assert(const._2.contains(4.0) && const._3.isEmpty, const.toString)
  }

  test("kAnonymity counts small quasi-identifier groups") {
    val df = (Seq.fill(10)(("en", 1)) ++ Seq.fill(3)(("de", 1)) ++
      Seq(("fr", 1))).toDF("lang", "d")
    val out = Profile.kAnonymity(df, Seq("lang", "d"), k = 5L)
      .as[(Long, Long, Long, Long)].head()
    assert(out == ((3L, 2L, 4L, 1L))) // 3 groups; de(3)+fr(1) below k
  }

  test("lDiversity: homogeneous group drives distinct_l and entropy_l to 1") {
    // g1: two sensitive values 3/1 split; g2: homogeneous (the leak)
    val df = (Seq.fill(3)(("g1", "s1")) ++ Seq(("g1", "s2")) ++
      Seq.fill(4)(("g2", "s1"))).toDF("qi", "sens")
    val out = Profile.lDiversity(df, Seq("qi"), "sens", l = 2L)
      .as[(Long, Long, Long, Double)].head()
    assert(out._1 == 2L && out._2 == 1L && out._3 == 1L)
    // min entropy is g2's 0 ⇒ entropy_l = exp(0) = 1
    assert(out._4 == 1.0)
  }

  test("lDiversity: uniform 2-value groups give entropy_l = 2") {
    val df = (Seq.fill(2)(("g1", "a")) ++ Seq.fill(2)(("g1", "b")) ++
      Seq.fill(3)(("g2", "a")) ++ Seq.fill(3)(("g2", "b"))).toDF("qi", "sens")
    val out = Profile.lDiversity(df, Seq("qi"), "sens", l = 2L)
      .as[(Long, Long, Long, Double)].head()
    assert(out._2 == 2L && out._3 == 0L)
    assert(math.abs(out._4 - 2.0) < 1e-6) // exp(ln 2) per group
  }

  test("tCloseness: mirrored skew gives tvd = |Δp|, matched group gives 0") {
    // global: a 50%, b 50%. g1 all-a, g2 all-b ⇒ tvd = ½(0.5+0.5) = 0.5
    val df = (Seq.fill(4)(("g1", "a")) ++ Seq.fill(4)(("g2", "b")))
      .toDF("qi", "sens")
    val out = Profile.tCloseness(df, Seq("qi"), "sens", t = 0.4)
      .as[(Long, Double, Long)].head()
    assert(out._1 == 2L && out._2 == 0.5 && out._3 == 2L)
    // a group that mirrors the global distribution sits at distance 0
    val bal = (Seq.fill(2)(("g1", "a")) ++ Seq.fill(2)(("g1", "b")))
      .toDF("qi", "sens")
    val out2 = Profile.tCloseness(bal, Seq("qi"), "sens", t = 0.1)
      .as[(Long, Double, Long)].head()
    assert(out2._2 == 0.0 && out2._3 == 0L)
  }

  test("wilsonLowerBound: hand-checked 50/100 at z=1.96, bounds in (0, p)") {
    import org.apache.spark.sql.functions._
    val df = (1 to 100).map(i => ("g", i <= 50)).toDF("g", "s")
    val out = Profile.wilsonLowerBound(df, "g", col("s"), z = 1.96)
      .as[(String, Long, Long, Double, Double)].head()
    assert(out._2 == 100L && out._3 == 50L && out._4 == 0.5)
    // Wilson lower bound for 50/100 @95%: (0.519208 − 1.96·0.0509514…)/1.038416 ≈ 0.40383
    assert(math.abs(out._5 - 0.40383) < 1e-4)
    assert(out._5 < out._4 && out._5 > 0)
  }

  test("twoProportionZ: identical arms give z = 0, better arm positive") {
    import org.apache.spark.sql.functions._
    val same = (Seq.fill(10)(("A", true)) ++ Seq.fill(10)(("A", false)) ++
      Seq.fill(10)(("B", true)) ++ Seq.fill(10)(("B", false)))
      .toDF("arm", "s")
    val z0 = Profile.twoProportionZ(same, "arm", col("s"))
      .as[(String, String, Long, Long, Long, Long, Double)].head()
    assert(z0._7 == 0.0)
    val better = ((1 to 20).map(_ => ("A", true)) ++ (1 to 20).map(i => ("B", i <= 5)))
      .toDF("arm", "s")
    val z1 = Profile.twoProportionZ(better, "arm", col("s"))
      .as[(String, String, Long, Long, Long, Long, Double)].head()
    assert(z1._7 > 3.0, s"z=${z1._7}")
  }

  test("weightedMedian: weights shift the cut; equal weights match plain median") {
    import org.apache.spark.sql.functions._
    // values 1..4, weight 10 on value 4: median pulled to 4
    val df = Seq(("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 1.0), ("g", 4.0, 10.0))
      .toDF("g", "v", "w")
    val out = Profile.weightedMedian(df, "g", col("v"), col("w"), col("v"))
      .as[(String, Double, Double)].head()
    assert(out._2 == 13.0 && out._3 == 4.0)
    val eq = Seq(("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 1.0))
      .toDF("g", "v", "w")
    val out2 = Profile.weightedMedian(eq, "g", col("v"), col("w"), col("v"))
      .as[(String, Double, Double)].head()
    assert(out2._3 == 2.0)
  }

  test("momentsProfile: symmetric series has skew 0 and kurtosis −1.5") {
    val df = Seq(("k", 1.0), ("k", 2.0), ("k", 3.0), ("c", 5.0), ("c", 5.0))
      .toDF("g", "v")
    val out = Profile.momentsProfile(df, "g", "v")
      .as[(String, Long, Double, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    // m2 = 2/3, m3 = 0, m4 = 2/3 → skew 0, kurt = 1.5 − 3
    assert(out("k") == (("k", 3L, 2.0,
      Some(0.816497), Some(0.0), Some(-1.5))))
    // constant column → NULL shape stats, mean kept
    assert(out("c") == (("c", 2L, 5.0, None, None, None)))
  }

  test("dispersionIndex: Poisson-like vs bursty per-unit counts") {
    val rows = Seq.fill(2)(("X", "u1")) ++ Seq.fill(2)(("X", "u2")) ++
      Seq(("Z", "u1")) ++ Seq(("Z", "u2")) ++ Seq.fill(7)(("Z", "u3"))
    val out = Profile.dispersionIndex(rows.toDF("cl", "u"), "cl", "u")
      .as[(String, Long, Double, Option[Double], Option[Boolean])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("X") == (("X", 2L, 2.0, Some(0.0), Some(false))))
    // counts 1,1,7 → mean 3, var 8 → D = 8/3
    assert(out("Z") == (("Z", 3L, 3.0, Some(2.666667), Some(true))))
  }

  test("cramersV: perfect association = 1; zero cells carry their mass") {
    val perfect = Seq(("x", "u"), ("x", "u"), ("y", "v"), ("y", "v"))
      .toDF("a", "b")
    val p = Profile.cramersV(perfect, "a", "b")
      .as[(Long, Long, Long, Double, Double)].head()
    // χ² over the FULL 2×2 grid (zero cells contribute e) = n = 4
    assert(p == ((4L, 2L, 2L, 4.0, 1.0)))
    val indep = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v"))
      .toDF("a", "b")
    val i = Profile.cramersV(indep, "a", "b")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(i._4 == 0.0 && i._5 == 0.0)
  }

  test("functionalDependency + keyUniqueness: violations counted exactly") {
    val df = Seq(("A", "x"), ("A", "y"), ("A", "y"), ("B", "z")).toDF("l", "r")
    val fd = Profile.functionalDependency(Seq(("t", df, Seq("l"), "r")))
      .as[(String, Long, Long, Double, Long)].head()
    assert(fd == (("t", 2L, 1L, 0.5, 2L))) // A fans out to {x, y}
    val ku = Profile.keyUniqueness(Seq(
        ("dup", df, Seq("l")), ("ok", df, Seq("l", "r"))))
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(ku("dup") == (("dup", 4L, 2L, 2L, false)))
    assert(ku("ok") == (("ok", 4L, 3L, 1L, false))) // (A,y) repeats
  }

  test("bootstrapMeanCI: deterministic interval bracketing the mean") {
    val df = (1 to 200).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val a = Profile.bootstrapMeanCI(df, "id", "v")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(a._1 == 200L && a._2 == 40L && a._3 == 100.5)
    assert(a._4 < a._5 && a._4 <= a._3 && a._3 <= a._5)
    // same input → bit-identical interval (the reproducibility contract)
    val b = Profile.bootstrapMeanCI(df, "id", "v")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(a == b)
  }

  test("reconcileTotals: tolerance classification + parent without lines") {
    import org.apache.spark.sql.functions.col
    val parent = Seq((1L, 10.0), (2L, 5.0), (3L, 7.0)).toDF("k", "tot")
    val child = Seq((1L, 6.0), (1L, 4.0), (2L, 4.0)).toDF("k", "amt")
    val out = Profile.reconcileTotals(parent, "k", "tot", child, "k",
        col("amt"), tolerance = 0.01)
      .as[(Long, Long, Long, Double)].head()
    // order 1 exact; order 2 off by 1.0; order 3 has no lines (diff 7.0)
    assert(out == ((3L, 1L, 2L, 7.0)))
  }

  test("spearman: rank-invariant to monotone transforms, midrank ties") {
    def rho(rows: Seq[(Long, Long)]) =
      Profile.spearman(rows.toDF("x", "y"), "x", "y")
        .as[(Long, Option[Double])].head()
    // nonlinear but monotone → exactly 1 (Pearson would be < 1)
    assert(rho(Seq((1L, 1L), (2L, 4L), (3L, 9L))) == ((3L, Some(1.0))))
    assert(rho(Seq((1L, 9L), (2L, 4L), (3L, 1L))) == ((3L, Some(-1.0))))
    // tie in x: 2·ranks (3,3,6) vs (2,4,6) → 6/√48
    assert(rho(Seq((1L, 1L), (1L, 2L), (2L, 3L))) == ((3L, Some(0.866025))))
    assert(rho(Seq((1L, 1L), (1L, 2L)))._2.isEmpty) // constant x → NULL
  }

  test("trimmedMean: drops floor(n·f) off each end, exact kept multiset") {
    val df = (1 to 10).map(v => ("a", v.toDouble)) :+ (("b", 7.0))
    val out = Profile.trimmedMean(df.toDF("k", "v"), "k", "v", 0.2)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("a") == (("a", 10L, 6L, 5.5))) // keeps 3..8
    assert(out("b") == (("b", 1L, 1L, 7.0)))  // floor(1·0.2)=0: keeps all
  }

  test("mutualInformation: ln 2 when fully dependent, 0 when independent") {
    val dep = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y")).toDF("a", "b")
    val d = Profile.mutualInformation(dep, "a", "b")
      .as[(Long, Long, Double)].head()
    assert(d._1 == 4L && d._2 == 2L)
    assert(math.abs(d._3 - math.log(2.0)) < 1e-6)
    val ind = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")).toDF("a", "b")
    val i = Profile.mutualInformation(ind, "a", "b")
      .as[(Long, Long, Double)].head()
    assert(i._1 == 4L && i._2 == 4L && i._3 == 0.0)
  }

  test("refIntegrity counts orphans exactly and rates them") {
    import org.apache.spark.sql.functions._
    val child = Seq((1L, 10L), (2L, 10L), (3L, 99L), (4L, 98L)).toDF("id", "fk")
    val parent = Seq(Tuple1(10L)).toDF("pk")
    val clean = Seq((1L, 10L)).toDF("id", "fk")
    val out = Profile.refIntegrity(Seq(
        ("dirty", child, "fk", parent, "pk"),
        ("clean", clean, "fk", parent, "pk")))
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("dirty") == (("dirty", 4L, 2L, 0.5)))
    assert(out("clean") == (("clean", 1L, 0L, 0.0)))
  }

  test("zonemapAudit: envelope tests prune exactly the provably-miss zones") {
    import org.apache.spark.sql.functions._
    val df = Seq((0L, 1.0), (1L, 5.0), (2L, 10.0), (3L, 20.0)).toDF("id", "v")
    val out = Profile.zonemapAudit(df, floor(col("id") / lit(2)).cast("long"),
        Seq(Profile.ZonePred("v_ge_8", "v", Some(8.0), None),
          Profile.ZonePred("v_le_0", "v", None, Some(0.0)),
          Profile.ZonePred("v_2_12", "v", Some(2.0), Some(12.0))))
      .as[(String, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("v_ge_8") == (("v_ge_8", 2L, 1L, 2L, 0.5)))  // zone0 max 5 < 8
    assert(out("v_le_0") == (("v_le_0", 2L, 2L, 4L, 1.0)))  // both mins > 0
    assert(out("v_2_12") == (("v_2_12", 2L, 0L, 0L, 0.0)))  // both overlap
  }

  test("adjustedRand: identical partitions → 1, hand case → 0") {
    val same = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"))
      .toDF("a", "b")
    val r1 = Profile.adjustedRand(same, "a", "b")
      .as[(Long, Long, Double)].head()
    assert(r1 == ((4L, 2L, 1.0)))
    // A=[1,1,2,2], B=[1,1,1,2]: index 1, E 1, max 2.5 → ARI 0
    val mixed = Seq(("1", "1"), ("1", "1"), ("2", "1"), ("2", "2"))
      .toDF("a", "b")
    val r2 = Profile.adjustedRand(mixed, "a", "b")
      .as[(Long, Long, Double)].head()
    assert(r2 == ((4L, 3L, 0.0)))
  }

  test("dkwBounds: ε shrinks as √n, threshold arithmetic exact") {
    val df = (Seq.fill(100)("a") ++ Seq.fill(400)("b")).toDF("g")
    val out = Profile.dkwBounds(df, "g", delta = 0.05, targetEps = 0.01)
      .as[(String, Long, Double, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    val c = math.log(2.0 / 0.05)
    def eps(n: Int) = BigDecimal(math.sqrt(c / (2.0 * n)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("a") == (("a", 100L, eps(100),
      math.ceil(c / 0.0002).toLong, false)))
    // 4× the sample → half the ε
    assert(math.abs(out("b")._3 - eps(400)) < 1e-9)
    assert(out("b")._3 < out("a")._3 / 1.9)
  }

  test("multiTestFdr: planted effect gets rank 1, BH q-values monotone") {
    import org.apache.spark.sql.functions._
    // group A sits far above B/C; null draws can't reproduce that
    val df = ((0L until 40L).map(i => (i, "A", 100.0)) ++
      (40L until 80L).map(i => (i, "B", 1.0 + (i % 3))) ++
      (80L until 120L).map(i => (i, "C", 2.0 + (i % 3))))
      .toDF("id", "g", "v")
    val out = Profile.multiTestFdr(df, "id", "g", "v", perms = 32)
      .as[(String, Double, Double, Long, Double, Boolean)].collect()
      .sortBy(_._4)
    assert(out.head._1 == "A" && out.head._4 == 1L)
    assert(out.head._3 == out.map(_._3).min) // smallest p leads
    // BH q is non-decreasing in rank, and q >= its own p
    assert(out.map(_._5).sliding(2).forall(p => p(1) >= p(0) - 1e-12))
    assert(out.forall(r => r._5 >= r._3 - 1e-12))
    // layout invariance
    val again = Profile.multiTestFdr(df.repartition(7), "id", "g", "v",
        perms = 32)
      .as[(String, Double, Double, Long, Double, Boolean)].collect()
      .sortBy(_._4)
    assert(again.toSeq == out.toSeq)
  }

  test("jackknifeRatio: two-bucket hand case — SE from the replicas") {
    import org.apache.spark.sql.functions._
    // bucket 0: num 10, den 5; bucket 1: num 20, den 5
    // ratio 3; replicas 4 and 2 → R̄ = 3, SE = √((1/2)·(1+1)) = 1
    val df = Seq((0L, 10.0, 5.0), (1L, 20.0, 5.0)).toDF("b", "n", "d")
    val out = Profile.jackknifeRatio(df, col("b"), "n", "d")
      .as[(Long, Double, Double, Double, Double)].head()
    val lo = BigDecimal(3.0 - 1.959963984540054)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val hi = BigDecimal(3.0 + 1.959963984540054)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == ((2L, 3.0, 1.0, lo, hi)))
  }

  test("srmCheck: 60/40 of 100 trips the χ² guard, 50/50 does not") {
    import org.apache.spark.sql.functions._
    val skew = (Seq.fill(60)("A") ++ Seq.fill(40)("B")).toDF("arm")
    val a = Profile.srmCheck(skew, "arm")
      .as[(Long, Long, Double, Double, Boolean)].head()
    assert(a == ((60L, 40L, 0.5, 4.0, true))) // (10²/50)·2 = 4 > 3.841
    val fair = (Seq.fill(50)("A") ++ Seq.fill(50)("B")).toDF("arm")
    val b = Profile.srmCheck(fair, "arm")
      .as[(Long, Long, Double, Double, Boolean)].head()
    assert(b == ((50L, 50L, 0.5, 0.0, false)))
  }

  test("bestSplit: perfect separation found at the right threshold") {
    import org.apache.spark.sql.functions._
    val df = Seq((1.0, false), (1.0, false), (2.0, true), (2.0, true))
      .toDF("x", "y")
    val out = Profile.bestSplit(df, Seq("x"), col("y"))
      .as[(String, Double, Double, Double, Double, Long)].head()
    // parent gini 0.5 fully removed by the x ≤ 1 split
    assert(out == (("x", 1.0, 0.5, 0.0, 1.0, 2L)))
  }

  test("abPowerMde: closed-form MDE arithmetic on a hand case") {
    import org.apache.spark.sql.functions._
    val df = (Seq.fill(50)(("A", true)) ++ Seq.fill(50)(("A", false)) ++
      Seq.fill(40)(("B", true)) ++ Seq.fill(60)(("B", false)))
      .toDF("arm", "s")
    val out = Profile.abPowerMde(df, "arm", col("s"))
      .as[(Long, Long, Double, Double, Double, Long)].head()
    assert(out._1 == 100L && out._2 == 100L && out._3 == 0.45)
    val z = 1.959963984540054 + 0.8416212335729143
    val mde = z * math.sqrt(2.0 * 0.45 * 0.55 / 100.0)
    assert(math.abs(out._4 - mde) < 1e-6)
    assert(math.abs(out._5 - mde / 0.45) < 1e-6)
    val nReq = math.ceil(2.0 * 0.45 * 0.55 * z * z /
      ((0.45 * 0.05) * (0.45 * 0.05))).toLong
    assert(out._6 == nReq)
  }

  test("permutationTest: obvious effect → minimal p, layout-invariant") {
    import org.apache.spark.sql.functions._
    val df = ((0L until 50L).map(i => (i, 100.0)) ++
      (50L until 100L).map(i => (i, 1.0))).toDF("id", "v")
    val a = Profile.permutationTest(df, "id", "v", col("id") < 50,
        perms = 32, seed = 23)
      .as[(Long, Double, Long, Long, Double)].head()
    assert(a._1 == 100L && a._2 == 99.0 && a._3 == 32L)
    assert(a._4 == 0L) // no permutation matches a perfectly separated arm
    assert(a._5 == BigDecimal(1.0 / 33)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val b = Profile.permutationTest(df.repartition(7), "id", "v",
        col("id") < 50, perms = 32, seed = 23)
      .as[(Long, Double, Long, Long, Double)].head()
    assert(a == b)
  }

  test("randomizedResponse: layout-invariant draws, debias arithmetic") {
    import org.apache.spark.sql.functions._
    val df = (0L until 100L).map(i => (i, "g", i < 60)).toDF("id", "g", "y")
    val a = Profile.randomizedResponse(df, "id", "g", col("y"), p = 0.7)
      .as[(String, Long, Long, Double, Double, Double)].head()
    val b = Profile.randomizedResponse(df.repartition(7), "id", "g",
        col("y"), p = 0.7)
      .as[(String, Long, Long, Double, Double, Double)].head()
    assert(a == b)
    assert(a._2 == 100L && a._6 == 0.6) // true rate survives exactly
    // debias identity: est = (obs − 0.15…)/0.7 (same literals as the op)
    val est = BigDecimal((a._4 - (1.0 - 0.7) / 2) / 0.7)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(a._5 - est) < 1e-6)
  }

  test("laplaceNoisyCounts: seeded noise is deterministic and unbiased-shaped") {
    val df = Seq.fill(8)("k1").union(Seq.fill(3)("k2")).toDF("k")
    val a = Profile.laplaceNoisyCounts(df, "k", eps = 1.0, seed = 7)
      .as[(String, Long, Double, Double)].collect().sortBy(_._1)
    val b = Profile.laplaceNoisyCounts(df.repartition(5), "k", eps = 1.0,
        seed = 7)
      .as[(String, Long, Double, Double)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq) // layout-invariant draws
    assert(a.map(_._2).toSeq == Seq(8L, 3L))
    // a different seed moves the noise; the true counts stay put
    val c = Profile.laplaceNoisyCounts(df, "k", eps = 1.0, seed = 8)
      .as[(String, Long, Double, Double)].collect().sortBy(_._1)
    assert(c.map(_._2).toSeq == Seq(8L, 3L))
    assert(a.map(_._3).toSeq != c.map(_._3).toSeq)
  }

  test("integer-metric tests raise loudly on fractional input, not truncate") {
    // a double metric silently floored toward zero would yield wrong
    // statistics — the cast is a LOUD lossless contract instead
    val frac = Seq((1.5, true), (2.0, false), (3.0, true)).toDF("x", "a")
    val e1 = intercept[Exception] { Profile.welchT(frac, $"x", $"a").collect() }
    assert(e1.getMessage.contains("integral"), String.valueOf(e1.getMessage))
    val e2 = intercept[Exception] {
      Profile.pairedT(Seq(0.5, 1.0).toDF("d"), $"d").collect()
    }
    assert(e2.getMessage.contains("integral"), String.valueOf(e2.getMessage))
    val e3 = intercept[Exception] {
      Profile.brownForsythe(
        Seq(("g1", 1.25), ("g1", 2.0), ("g2", 3.0)).toDF("g", "x"),
        "g", "x").collect()
    }
    assert(e3.getMessage.contains("integral"), String.valueOf(e3.getMessage))
    // integral doubles still pass (lossless cast, same stats as longs)
    val ok = Profile.welchT(
      Seq((1.0, true), (2.0, true), (5.0, false), (9.0, false)).toDF("x", "a"),
      $"x", $"a")
    assert(ok.count() == 1L)
  }

  test("cohensD: hand-worked pooled-SD d and Hedges' g, degenerates NULL") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // A = [2,4,6]: m 4, s² 4; B = [1,3]: m 2, s² 2
    // sp² = (2·4 + 1·2)/3 = 10/3; d = 2/√(10/3); g = d·(1 − 3/11)
    val rows = Seq((2L, true), (4L, true), (6L, true), (1L, false), (3L, false))
    val got = Profile.cohensD(rows.toDF("x", "a"), $"x", $"a")
      .as[(Long, Long, Double, Double, Option[Double], Option[Double])].head()
    val d = 2.0 / math.sqrt(10.0 / 3.0)
    assert(got == ((3L, 2L, 4.0, 2.0,
      Some(r6(d)), Some(r6(d * (1.0 - 3.0 / 11.0))))), got.toString)
    // a size-1 group has no variance → pooled s² NULL → d/g NULL
    val g2 = Profile.cohensD(
        Seq((5L, true), (1L, false), (3L, false)).toDF("x", "a"), $"x", $"a")
      .as[(Long, Long, Double, Double, Option[Double], Option[Double])].head()
    assert(g2._5.isEmpty && g2._6.isEmpty, g2.toString)
    // both groups constant → sp² = 0 → NULL, not a division blow-up
    val g3 = Profile.cohensD(
        Seq((5L, true), (5L, true), (3L, false), (3L, false)).toDF("x", "a"),
        $"x", $"a")
      .as[(Long, Long, Double, Double, Option[Double], Option[Double])].head()
    assert(g3._5.isEmpty && g3._6.isEmpty, g3.toString)
  }

  test("gTest: hand-worked 2x2 G and df; equals 2n·MI on the same table") {
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // cells: (A,X) 10, (A,Y) 10, (B,X) 5, (B,Y) 15; n 40, rows 20/20,
    // cols 15/25 — replay the op's own 9-dp per-cell term discipline
    val rows =
      Seq.fill(10)(("A", "X")) ++ Seq.fill(10)(("A", "Y")) ++
      Seq.fill(5)(("B", "X")) ++ Seq.fill(15)(("B", "Y"))
    val cells = Seq((10.0, 20.0, 15.0), (10.0, 20.0, 25.0),
      (5.0, 20.0, 15.0), (15.0, 20.0, 25.0))
    val g = 2.0 * cells.map { case (o, r, c) =>
      r9(o * math.log(o * 40.0 / (r * c))) }.sum.toDouble
    val got = Profile.gTest(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(got == ((40L, 2L, 2L, 1L, r6(g))), got.toString)
    // identity check: G = 2n·MI in nats (both 9-dp-term fixed point,
    // so they agree to the rounding grain, not bit-exactly)
    val mi = Profile.mutualInformation(rows.toDF("a", "b"), "a", "b")
      .select($"mi_nats").as[Double].head()
    assert(math.abs(got._5 - 2.0 * 40.0 * mi) < 1e-4,
      s"G ${got._5} vs 2nMI ${2.0 * 40.0 * mi}")
  }

  test("skewAudit: hand-worked concentration, ties, and salt recommendation") {
    // counts a:6 b:3 c:1 → ascending S = 1·1 + 2·3 + 3·6 = 25,
    // gini = (2·25 − 4·10)/(3·10) = 1/3; salt = ⌈6·4/10⌉ = 3
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val got = Profile.skewAudit(df, $"k", shufflePartitions = 4)
      .as[(Long, Long, Long, Double, Option[Double], Long)].head()
    assert(got == ((10L, 3L, 6L, 0.6, Some(0.333333), 3L)), got.toString)
    // perfectly level keys: gini 0, salt 1 (2 keys × 2 rows, P = 2)
    val even = Seq("a", "a", "b", "b").toDF("k")
    val g2 = Profile.skewAudit(even, $"k", shufflePartitions = 2)
      .as[(Long, Long, Long, Double, Option[Double], Long)].head()
    assert(g2 == ((4L, 2L, 2L, 0.5, Some(0.0), 1L)), g2.toString)
    // null keys drop; a single key → gini NULL (undefined), salt = P
    val one = Seq(Some("a"), Some("a"), None).toDF("k")
    val g3 = Profile.skewAudit(one, $"k", shufflePartitions = 8)
      .as[(Long, Long, Long, Double, Option[Double], Long)].head()
    assert(g3 == ((2L, 1L, 2L, 1.0, None, 8L)), g3.toString)
  }

  test("joinCardinalityAudit: exact blowup prediction, disjoint keys zero") {
    // A: a×2 b×1 c×1; B: a×3 b×2 d×5 → join = 2·3 + 1·2 = 8, worst key 6
    val a = (Seq.fill(2)("a") ++ Seq("b", "c")).toDF("k")
    val b = (Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq.fill(5)("d")).toDF("k")
    val got = Profile.joinCardinalityAudit(a, b, $"k", $"k")
      .as[(Long, Long, Long, Long, Long, Long, Long, Option[Double])].head()
    assert(got == ((4L, 10L, 3L, 3L, 2L, 8L, 6L, Some(0.8))), got.toString)
    // the audit's number IS the join: predicted == actual row count
    assert(a.join(b, "k").count() == got._6)
    // disjoint key sets: zero everywhere, no NULL surprises
    val d2 = Profile.joinCardinalityAudit(a,
        Seq("z").toDF("k"), $"k", $"k")
      .as[(Long, Long, Long, Long, Long, Long, Long, Option[Double])].head()
    assert(d2 == ((4L, 1L, 3L, 1L, 0L, 0L, 0L, Some(0.0))), d2.toString)
  }

  test("anovaEffects: hand-worked eta²/omega², constant metric NULL") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // A=[1,2,3], B=[5,6,7]: SSB 24, SSW 4, MSW 1
    // eta² = 24/28; omega² = (24 − 1·1)/(28 + 1)
    val rows = Seq(("A", 1L), ("A", 2L), ("A", 3L),
      ("B", 5L), ("B", 6L), ("B", 7L))
    val got = Profile.anovaEffects(rows.toDF("g", "x"), "g", "x")
      .as[(Long, Long, Option[Double], Option[Double])].head()
    assert(got == ((2L, 6L, Some(r6(24.0 / 28.0)),
      Some(r6(23.0 / 29.0)))), got.toString)
    // constant metric: zero within-variance → NULL effects
    val g2 = Profile.anovaEffects(
        Seq(("A", 4L), ("A", 4L), ("B", 4L)).toDF("g", "x"), "g", "x")
      .as[(Long, Long, Option[Double], Option[Double])].head()
    assert(g2._3.isEmpty && g2._4.isEmpty, g2.toString)
  }
}
