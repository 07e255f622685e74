package graft.ops

import graft.SparkSpec

class EvalMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // cand "a b a b c" bigrams: {ab:2, ba:1, bc:1} (4 total)
  // ref  "a b c a"   bigrams: {ab:1, bc:1, ca:1} (3 total)
  // clipped overlap: min(2,1)[ab] + min(1,1)[bc] = 2
  val pair = Seq((1L, "a b a b c", "a b c a")).toDF("pid", "cand", "ref")

  test("ROUGE-2 clipped overlap, precision/recall/F1 on a hand-computed pair") {
    val r = EvalMetrics.rougeN(pair, "pid", "cand", "ref", n = 2)
      .as[(Long, Long, Long, Long, Option[Double], Option[Double], Double)].head()
    assert(r == ((1L, 4L, 3L, 2L, Some(0.5), Some(0.666667),
      // f1 = 2·(2/4)·(2/3) / (2/4 + 2/3) = (2/3)/(7/6) = 4/7
      BigDecimal(4.0 / 7.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("ROUGE-n handles a side shorter than n: null ratio, zero f1") {
    val short = Seq((1L, "only", "a b c")).toDF("pid", "cand", "ref")
    val r = EvalMetrics.rougeN(short, "pid", "cand", "ref", n = 2)
      .as[(Long, Long, Long, Long, Option[Double], Option[Double], Double)].head()
    assert(r._2 == 0L && r._4 == 0L && r._5.isEmpty && r._6.contains(0.0) && r._7 == 0.0)
  }

  test("ROUGE-L: LCS kernel equals the textbook recursive definition") {
    // brute reference: exponential recursion, fine at these sizes
    def brute(a: List[String], b: List[String]): Int = (a, b) match {
      case (x :: xs, y :: ys) if x == y => 1 + brute(xs, ys)
      case (x :: xs, y :: ys) =>
        math.max(brute(xs, b), brute(a, ys))
      case _ => 0
    }
    // deterministic pseudo-random token streams over a small alphabet
    // (ties and repeats everywhere — the DP's hard case)
    def toks(seed: Int, n: Int): List[String] =
      List.tabulate(n)(i => ((seed * 31 + i * 17) % 5 + 'a').toChar.toString)
    val cases = for (s <- 1 to 6; t <- 1 to 6)
      yield (toks(s, 8), toks(t * 7, 9))
    val df = cases.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a.mkString(" "), b.mkString(" ")) }
      .toDF("pid", "cand", "ref")
    val got = EvalMetrics.rougeL(df, "pid", "cand", "ref", maxTokens = 16)
      .select($"pair", $"lcs").as[(Long, Long)].collect().toMap
    cases.zipWithIndex.foreach { case ((a, b), i) =>
      assert(got(i.toLong) == brute(a, b).toLong,
        s"case $i: kernel ${got(i.toLong)} != brute ${brute(a, b)} for $a vs $b")
    }
  }

  test("ROUGE-L: hand case, cap, and degenerate sides") {
    // cand "a b c d", ref "a c b d" → LCS 3 ("a b d" or "a c d")
    val df = Seq((1L, "a b c d", "a c b d")).toDF("pid", "cand", "ref")
    val r = EvalMetrics.rougeL(df, "pid", "cand", "ref")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double], Double)].head()
    assert(r._2 == 4L && r._3 == 4L && r._4 == 3L)
    assert(r._5.contains(0.75) && r._6.contains(0.75) && r._7 == 0.75)
    // the cap truncates BOTH sides before matching
    val capped = EvalMetrics.rougeL(
        Seq((1L, "a b c d", "c d a b")).toDF("pid", "cand", "ref"),
        "pid", "cand", "ref", maxTokens = 2)
      .as[(Long, Long, Long, Long, Option[Double], Option[Double], Double)].head()
    // cand→[a b], ref→[c d]: no overlap
    assert(capped._2 == 2L && capped._3 == 2L && capped._4 == 0L && capped._7 == 0.0)
    // disjoint sequences: zero LCS, zero f1, ratios defined
    val dis = EvalMetrics.rougeL(
        Seq((1L, "x y", "p q")).toDF("pid", "cand", "ref"), "pid", "cand", "ref")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double], Double)].head()
    assert(dis._4 == 0L && dis._5.contains(0.0) && dis._7 == 0.0)
  }

  test("corpus BLEU: perfect match scores 1, any empty n-gram level scores 0") {
    val same = Seq((1L, "a b c d e f", "a b c d e f")).toDF("pid", "cand", "ref")
    val b = EvalMetrics.corpusBleu(same, "pid", "cand", "ref", maxN = 4)
      .select("bleu", "bp").as[(Double, Double)].head()
    assert(b == ((1.0, 1.0)))
    // cand has no 4-gram overlap with ref => p_4 = 0 => bleu = 0
    val none = Seq((1L, "a b c d", "w x y z")).toDF("pid", "cand", "ref")
    val z = EvalMetrics.corpusBleu(none, "pid", "cand", "ref", maxN = 4)
      .select("bleu").as[Double].head()
    assert(z == 0.0)
  }

  test("corpus BLEU brevity penalty fires only when candidate is shorter") {
    // cand 4 tokens, ref 6 tokens: bp = exp(1 - 6/4) = exp(-0.5)
    val shortCand = Seq((1L, "a b c d", "a b c d e f")).toDF("pid", "cand", "ref")
    val bp = EvalMetrics.corpusBleu(shortCand, "pid", "cand", "ref", maxN = 2)
      .select("bp").as[Double].head()
    assert(bp == BigDecimal(math.exp(-0.5)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // longer candidate: bp clamps to 1
    val longCand = Seq((1L, "a b c d e f g", "a b c")).toDF("pid", "cand", "ref")
    val bp2 = EvalMetrics.corpusBleu(longCand, "pid", "cand", "ref", maxN = 2)
      .select("bp").as[Double].head()
    assert(bp2 == 1.0)
  }

  test("corpus BLEU aggregates clipped counts before the ratio (not mean of pairs)") {
    // pair 1: cand "a b" vs ref "a b" -> bigram clip 1/1
    // pair 2: cand "x y x y x" vs ref "x y" -> bigrams cand {xy:2, yx:2}, clip 1, total 4
    // corpus p_2 = (1 + 1) / (1 + 4) = 0.4 — a mean of per-pair ratios would give (1 + 0.25)/2
    val two = Seq((1L, "a b", "a b"), (2L, "x y x y x", "x y")).toDF("pid", "cand", "ref")
    val p2 = EvalMetrics.corpusBleu(two, "pid", "cand", "ref", maxN = 2)
      .select("p_2").as[Double].head()
    assert(p2 == 0.4)
  }

  test("chrF: identical pair scores 1, disjoint alphabets 0, beta=2 weights recall") {
    val same = Seq((1L, "hello world", "hello world")).toDF("pid", "cand", "ref")
    val s1 = EvalMetrics.chrF(same, "pid", "cand", "ref", maxN = 3)
      .as[(Double, Double, Double)].head()
    assert(s1 == ((1.0, 1.0, 1.0)))
    val disj = Seq((1L, "aaa", "zzz")).toDF("pid", "cand", "ref")
    assert(EvalMetrics.chrF(disj, "pid", "cand", "ref", maxN = 3)
      .select("chrf").as[Double].head() == 0.0)
    // cand "ab", ref "abab" at n=1: clip {a:1,b:1}=2, P=2/2=1, R=2/4=0.5;
    // n=2: cand {ab:1}, ref {ab:2,ba:1}: clip 1, P=1, R=1/3. chrP=1,
    // chrR=round((.5+1/3)/2)=0.416667; F2=5*1*chrR/(4+chrR)
    val part = Seq((1L, "ab", "abab")).toDF("pid", "cand", "ref")
    val (f, cp, cr) = EvalMetrics.chrF(part, "pid", "cand", "ref", maxN = 2)
      .as[(Double, Double, Double)].head()
    assert(cp == 1.0 && cr == 0.416667)
    assert(f == BigDecimal(5.0 * 1.0 * 0.416667 / (4.0 * 1.0 + 0.416667))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("distinct-n diversity counts distinct grams over instances per group") {
    val docs = Seq(("en", "a b a b"), ("en", "a b c"), ("de", "x y")).toDF("lang", "text")
    // en grams: [ab, ba, ab] + [ab, bc] = 5 instances, distinct {ab, ba, bc} = 3
    val en = EvalMetrics.distinctN(docs, "lang", "text", n = 2)
      .where($"group" === "en").as[(String, Long, Long, Double)].head()
    assert(en == (("en", 5L, 3L, 0.6)))
    val de = EvalMetrics.distinctN(docs, "lang", "text", n = 2)
      .where($"group" === "de").as[(String, Long, Long, Double)].head()
    assert(de == (("de", 1L, 1L, 1.0)))
  }

  test("RBO: identical lists hit the truncation mass, disjoint score 0") {
    val k = 10; val p = 0.9
    def ranks(items: Seq[String]) = items.zipWithIndex
      .map { case (it, i) => ("q", it, i + 1) }.toDF("key", "item", "r")
    val a = ranks((1 to 10).map("x" + _))
    val same = EvalMetrics.rboTruncated(a, a, "key", "item", "r", k, p)
      .as[(String, Double)].head()
    // A_d = 1 at every depth → RBO = (1−p)·Σ p^{d−1} = 1 − p^k, via the
    // op's own fixed-point fold
    val fix = (1L << 40).toDouble
    val want = BigDecimal((1 to k).map(d =>
        math.round((1.0 - p) * math.pow(p, d - 1) * 1.0 * fix)).sum / fix)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(same._2 === want)
    assert(math.abs(same._2 - (1 - math.pow(p, k))) < 1e-6)
    val b = ranks((1 to 10).map("y" + _))
    val disj = EvalMetrics.rboTruncated(a, b, "key", "item", "r", k, p)
      .as[(String, Double)].head()
    assert(disj._2 === 0.0)
    // swap of the top two: overlap 1 at d=1? no — top-1 sets differ, so
    // A_1 = 0, A_d = 1 for d ≥ 2
    val swapped = ranks(Seq("x2", "x1") ++ (3 to 10).map("x" + _))
    val sw = EvalMetrics.rboTruncated(a, swapped, "key", "item", "r", k, p)
      .as[(String, Double)].head()
    val wantSw = BigDecimal(((2 to k).map(d =>
        math.round((1.0 - p) * math.pow(p, d - 1) * 1.0 * fix)) :+
        math.round((1.0 - p) * 0.0 * fix)).sum / fix)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(sw._2 === wantSw)
  }

  test("WER: hand-worked token-Levenshtein fixtures") {
    val pairs = Seq(
      (1L, "a b c", "a x c d"),     // sub + ins = 2 edits over 4 ref tokens
      (2L, "same same", "same same"), // identical
      (3L, "a b c d e", "a"),       // over-generation: 4 dels, WER 4.0
      (4L, "A b", "a B")            // case folds before comparison
    ).toDF("pid", "cand", "ref")
    val got = EvalMetrics.wer(pairs, "pid", "cand", "ref")
      .orderBy("pair")
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 4L, 2L, Some(0.5)),
      (2L, 2L, 2L, 0L, Some(0.0)),
      (3L, 5L, 1L, 4L, Some(4.0)),
      (4L, 2L, 2L, 0L, Some(0.0))), got.toString)
  }

  test("WER: the token cap bounds the DP (differences beyond it are invisible)") {
    val pairs = Seq((1L, "a b THESE DIFFER", "a b ENTIRELY OTHER")).toDF("pid", "cand", "ref")
    val got = EvalMetrics.wer(pairs, "pid", "cand", "ref", maxTokens = 2)
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(got == ((1L, 2L, 2L, 0L, Some(0.0))), got.toString)
  }

  test("WordLevKernel matches a reference DP on adversarial shapes") {
    def ref(a: Seq[String], b: Seq[String]): Long = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length).toLong
    }
    val vocab = Vector("x", "y", "z", "w")
    val cases = for (i <- 0 until 40) yield {
      val a = Seq.tabulate((i * 3) % 7)(k => vocab((i + k * 5) % 4))
      val b = Seq.tabulate((i * 5 + 1) % 8)(k => vocab((i * 2 + k) % 4))
      (i.toLong, a.mkString(" "), b.mkString(" "))
    }
    val got = EvalMetrics.wer(cases.toDF("pid", "cand", "ref"), "pid", "cand", "ref")
      .orderBy("pair").select("edits").as[Long].collect().toSeq
    // empty tokens drop after the split (the goodTuring convention) —
    // mirror that in the reference
    val want = cases.map { case (_, a, b) =>
      ref(a.split(" ").toSeq.filter(_.nonEmpty),
        b.split(" ").toSeq.filter(_.nonEmpty)) }
    assert(got == want, s"got $got\nwant $want")
  }

  test("pass@k: hand combinatorics, saturation at n−c < k, NULL below n < k") {
    // t1: n=5, c=2 → p@1 = 1−3/5 = .4; p@2 = 1−(3/5)(2/4) = .7;
    //     p@4 = 1 (zero factor at i = n−c = 3)
    // t2: n=3, c=0 → 0 at k=1,2; NOT estimable at k=4
    // t3: n=4, c=4 → 1 everywhere
    val rows =
      (1 to 5).map(i => ("t1", i <= 2)) ++
      (1 to 3).map(_ => ("t2", false)) ++
      (1 to 4).map(_ => ("t3", true))
    val got = EvalMetrics.passAtK(rows.toDF("task", "ok"), "task", $"ok",
        Seq(1, 2, 4))
      .orderBy("k").as[(Int, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      (1, 3L, Some(r6((0.4 + 0.0 + 1.0) / 3))),
      (2, 3L, Some(r6((0.7 + 0.0 + 1.0) / 3))),
      (4, 2L, Some(1.0))), got.toString)
  }

  test("bestOfK: order-statistic weights equal the brute-force subset mean") {
    // t1 scores [1,2,6], k=2: E[max of 2] = (2+6+6)/3 = 14/3 exactly
    // (weights (i−1)/3 over the ascending sort); k=1 = plain mean = 3
    // t2 scores [5]: k=1 → 5; k=2 → not estimable (NULL, excluded)
    val rows = Seq(("t1", 1.0), ("t1", 2.0), ("t1", 6.0), ("t2", 5.0))
    val got = EvalMetrics.bestOfK(rows.toDF("task", "s"), "task", $"s",
        Seq(1, 2), maxN = 8)
      .orderBy("k").as[(Int, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      (1, 2L, Some(r6((3.0 + 5.0) / 2))),
      (2, 1L, Some(r6(14.0 / 3.0)))), got.toString)
    // k = n picks the max exactly
    val mx = EvalMetrics.bestOfK(
        Seq(("a", 4.0), ("a", 9.0), ("a", 2.0)).toDF("task", "s"),
        "task", $"s", Seq(3), maxN = 8)
      .as[(Int, Long, Option[Double])].head()
    assert(mx == ((3, 1L, Some(9.0))), mx.toString)
    // a task beyond the maxN contract fails loudly, not silently
    val big = (1 to 5).map(i => ("t", i.toDouble)).toDF("task", "s")
    val ex = intercept[Exception] {
      EvalMetrics.bestOfK(big, "task", $"s", Seq(1), maxN = 4).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("maxN"),
      String.valueOf(ex.getMessage))
  }

  test("WER: empty / multi-space references are undefined (NULL), not phantom tokens") {
    val pairs = Seq(
      (1L, "a b", ""),        // empty ref: n_ref 0, wer NULL
      (2L, "a  b", "a b"),    // double space in cand: still 2 tokens, 0 edits
      (3L, "", " "),          // both empty after filtering
      (4L, " a ", "a")        // leading/trailing spaces: exact match
    ).toDF("pid", "cand", "ref")
    val got = EvalMetrics.wer(pairs, "pid", "cand", "ref")
      .orderBy("pair")
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 0L, 2L, None),
      (2L, 2L, 2L, 0L, Some(0.0)),
      (3L, 0L, 0L, 0L, None),
      (4L, 1L, 1L, 0L, Some(0.0))), got.toString)
  }

  test("n-gram metrics share the empty-token drop (no phantom grams)") {
    // "a  b" must count as 2 tokens / 1 bigram on every metric, and an
    // empty candidate as 0 tokens (cand_len 0, not a phantom 1-gram)
    val pairs = Seq((1L, "a  b", "a b"), (2L, "", "a"))
      .toDF("pid", "cand", "ref")
    val r2 = EvalMetrics.rougeN(pairs, "pid", "cand", "ref", n = 1)
      .orderBy("pair").select("n_cand", "n_ref", "n_overlap")
      .as[(Long, Long, Long)].collect().toSeq
    assert(r2 == Seq((2L, 2L, 2L), (0L, 1L, 0L)), r2.toString)
    val bleu = EvalMetrics.corpusBleu(pairs, "pid", "cand", "ref", maxN = 2)
      .select("cand_len", "ref_len").as[(Long, Long)].head()
    assert(bleu == ((2L, 3L)), bleu.toString) // not (3, 3): "" is 0 tokens
    val rl = EvalMetrics.rougeL(pairs, "pid", "cand", "ref")
      .orderBy("pair").select("n_cand", "n_ref", "lcs")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rl == Seq((2L, 2L, 2L), (0L, 1L, 0L)), rl.toString)
  }

  test("ciderD: hand-worked tf-idf cosine, zero-idf consensus, length penalty") {
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // N = 2. Ref df at n=1: a→1, c→2 ⇒ idf(a) = ln2, idf(c) = 0,
    // unseen cand gram b ⇒ FULL ln2 (the coco convention).
    val pairs = Seq((1L, "a b", "a c"), (2L, "c", "c"))
      .toDF("pid", "cand", "ref")
    val got = EvalMetrics.ciderD(pairs, "pid", "cand", "ref", maxN = 4)
      .orderBy("pair").as[(Long, Long, Long, Double)].collect().toSeq
    // pair 1 level 1: replay the op's own 9-dp term discipline
    val w = math.log(2.0)
    val nc = (r9(w * w) + r9(w * w)).toDouble  // cand a, b
    val nr = r9(w * w).toDouble                // ref a (c weighs 0)
    val num = r9(w * w).toDouble               // shared gram a
    val s1 = num / (math.sqrt(nc) * math.sqrt(nr))
    // level 2: both sides have one bigram, none shared → 0 term;
    // levels 3–4: no grams → no contribution; penalty exp(0) = 1
    val ss = (r9(s1) + r9(0.0)).toDouble
    assert(got == Seq(
      (1L, 2L, 2L, r6(1.0 * (10.0 / 4) * ss)),
      // pair 2: the gram appears in EVERY reference → idf 0 → zero
      // norms → zero consensus (the anti-stopword property)
      (2L, 1L, 1L, 0.0)), got.toString)
    // length mismatch is gaussian-penalized AND gram stuffing is
    // clipped: 7 copies of the right token score far below a clean hit
    val padded = Seq((1L, "x x x x x x x", "x"), (2L, "y", "z"))
      .toDF("pid", "cand", "ref")
    val p = EvalMetrics.ciderD(padded, "pid", "cand", "ref", maxN = 1)
      .orderBy("pair").as[(Long, Long, Long, Double)].collect().toSeq
    val ncP = r9(7 * w * 7 * w).toDouble
    val sP = r9(w * w).toDouble / (math.sqrt(ncP) * math.sqrt(r9(w * w).toDouble))
    val penP = r9(math.exp(-36.0 / 72.0)).toDouble
    assert(p.head == ((1L, 7L, 1L,
      r6(penP * 10.0 * r9(sP).toDouble))), p.toString)
    assert(p.head._4 < 1.0 && p.head._4 > 0.0, p.toString)
  }

  test("pass@k / bestOfK emit one row per k even on an EMPTY input") {
    val empty = Seq.empty[(String, Boolean)].toDF("task", "ok")
    val p = EvalMetrics.passAtK(empty, "task", $"ok", Seq(1, 2, 4))
      .orderBy("k").as[(Int, Long, Option[Double])].collect().toSeq
    assert(p == Seq((1, 0L, None), (2, 0L, None), (4, 0L, None)), p.toString)
    val emptyS = Seq.empty[(String, Double)].toDF("task", "s")
    val b = EvalMetrics.bestOfK(emptyS, "task", $"s", Seq(1, 3), maxN = 8)
      .orderBy("k").as[(Int, Long, Option[Double])].collect().toSeq
    assert(b == Seq((1, 0L, None), (3, 0L, None)), b.toString)
  }
}
