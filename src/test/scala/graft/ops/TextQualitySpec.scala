package graft.ops

import graft.SparkSpec

class TextQualitySpec extends SparkSpec {
  import spark.implicits._

  // ─── simhashDupPairs ──────────────────────────────────────────────────

  test("simhash blocking finds exactly the brute-force Hamming pairs") {
    // near-dups (one-word edits) plus unrelated docs
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy cat again and again"),
      (3L, "the quick brown fox leaps over the lazy dog again and again"),
      (4L, "completely different text about heavy machinery imports"),
      (5L, "unrelated sentence mentioning mobile cranes and excavators")
    ).toDF("doc_id", "text")
    for (maxH <- Seq(2, 3, 5)) {
      val got = Dedup.simhashDupPairs(docs, "doc_id", "text",
          bits = 48, maxHamming = maxH)
        .select($"id_a", $"id_b", $"hamming")
        .as[(Long, Long, Long)].collect().toSet
      // brute force over the same signatures
      val sigs = docs.select($"doc_id", Dedup.simhash($"text", 48).as("s"))
        .as[(Long, Long)].collect()
      val want = (for {
        (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
        h = java.lang.Long.bitCount(sa ^ sb) if h <= maxH
      } yield (ia, ib, h.toLong)).toSet
      assert(got == want, s"maxHamming=$maxH")
    }
  }

  test("simhashFast kernel equals the declarative simhash bit-for-bit") {
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, ""), (3L, "a"),
      (4L, "x y z x y z x y z repeated tokens and more words here")
    ).toDF("doc_id", "text")
    val both = docs.select(
      Dedup.simhash($"text", 48).as("slow"),
      org.apache.spark.sql.functions.coalesce(
        graft.functions.HashOps.simhashFast(
          graft.functions.HashOps.md5Prefix60Array(
            org.apache.spark.sql.functions.split(
              org.apache.spark.sql.functions.lower($"text"), " "), seed = 777),
          48),
        org.apache.spark.sql.functions.lit(0L)).as("fast"))
      .as[(Long, Long)].collect()
    both.foreach { case (s, f) => assert(s == f) }
  }

  test("simhashDupPairs rejects a bits/block mismatch") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.simhashDupPairs(docs, "doc_id", "text", bits = 48, maxHamming = 4)
    }
  }

  // ─── oovRate ──────────────────────────────────────────────────────────

  test("oovRate: top-K vocabulary by frequency with token-ascending ties") {
    // counts: x=3, b=2, a=2 → K=2 vocab is {x, a} (a beats b on the tie)
    val docs = Seq(
      (1L, "x x x"),
      (2L, "a b"),
      (3L, "a b zz")
    ).toDF("doc_id", "text")
    val r = TextStats.oovRate(docs, "doc_id", "text", vocabSize = 2)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_tokens", $"n_oov", $"oov_rate")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(r == Seq(
      (1L, 3L, 0L, 0.0),
      (2L, 2L, 1L, 0.5),
      (3L, 3L, 2L, 2.0 / 3.0)))
  }

  test("oovRate drops empty tokens and token-less docs") {
    val docs = Seq((1L, "a  a"), (2L, "")).toDF("doc_id", "text")
    val r = TextStats.oovRate(docs, "doc_id", "text", vocabSize = 10)
      .select($"doc_id", $"n_tokens").as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 2L)) // double space → no empty token; doc 2 absent
  }

  // ─── charEntropy ──────────────────────────────────────────────────────

  test("charEntropy: uniform two-char doc scores exactly 1 bit") {
    val docs = Seq((1L, "abab"), (2L, "aaaa")).toDF("doc_id", "text")
    val r = TextStats.charEntropy(docs, "doc_id", "text")
      .orderBy($"doc_id")
      .select($"doc_id", $"n_chars", $"distinct_chars", $"entropy")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(r(0) == ((1L, 4L, 2L, 1.0)))
    assert(r(1) == ((2L, 4L, 1L, 0.0)))
  }

  test("charEntropy: four uniform chars score 2 bits; empty docs absent") {
    val docs = Seq((1L, "abcd"), (2L, "")).toDF("doc_id", "text")
    val r = TextStats.charEntropy(docs, "doc_id", "text")
      .select($"doc_id", $"entropy").as[(Long, Double)].collect().toMap
    assert(r == Map(1L -> 2.0))
  }

  // ─── filterReasons ───────────────────────────────────────────────────

  test("filterReasons reports the first failing rule and the full bitmask") {
    val sw = Seq("the", "a")
    val prose = "the a alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima mike november oscar papa quebec romeo " +
      "sierra tango" // 22 distinct tokens, stopwords present: passes everything
    val short = "the brown fox"                             // fails n_tokens only
    val gibber = Seq.fill(25)("zxqwvutsrqp").mkString(" ")  // len ok-count, long tokens, no stopwords, repetitive
    val docs = Seq((1L, prose), (2L, short), (3L, gibber)).toDF("doc_id", "text")
    val byId = docs.select($"doc_id", TextStats.filterReasons($"text", sw).as("fr"))
      .select($"doc_id", $"fr.reason", $"fr.fail_mask")
      .as[(Long, String, Int)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byId(1L) == (("pass", 0)))
    assert(byId(2L) == (("n_tokens", 1)))
    // gibberish: mean_token_len=11 (bit 1), no stopwords (bit 2),
    // word_repetition = 1 - 1/25 (bit 3); first failing = mean_token_len
    assert(byId(3L) == (("mean_token_len", 2 + 4 + 8)))
    // the mask agrees with qualityKeep: keep iff mask == 0
    val keeps = docs.select($"doc_id", TextStats.qualityKeep($"text", sw))
      .as[(Long, Boolean)].collect().toMap
    byId.foreach { case (id, (_, m)) => assert(keeps(id) == (m == 0)) }
  }

  // ─── piiCounts / redactPiiTyped ──────────────────────────────────────

  test("typed PII redaction masks emails, IPv4 and long digit runs in order") {
    val t = "mail bob.smith+x@corp.example.org ip 192.168.0.1 card 4415001234 short 123"
    val df = Seq((1L, t)).toDF("id", "t")
    val out = df.select(TextStats.piiCounts($"t").as("pc"),
        TextStats.redactPiiTyped($"t").as("red"))
      .select($"pc.n_email", $"pc.n_ip", $"pc.n_num", $"red")
      .as[(Int, Int, Int, String)].head()
    assert(out._1 == 1 && out._2 == 1 && out._3 == 1)
    assert(out._4 == "mail <EMAIL> ip <IP> card <NUM> short 123")
    // an IP is never half-eaten by the number rule (order contract)
    assert(!out._4.contains("<NUM>.<NUM>"))
  }

  test("lmEntropyRate: hand-checkable two-token corpus") {
    // "a b a b": bigrams (a,b)×2, (b,a)×1; c1(a)=c1(b)=2; T2=3
    // H = −[2/3·ln(2/2)·... ] = −(round9(2/3·ln 1) + round9(1/3·ln(1/2)))
    val df = Seq(Tuple1("a b a b")).toDF("text")
    val out = TextStats.lmEntropyRate(df, "text")
      .as[(Long, Long, Double)].head()
    assert(out._1 == 3L && out._2 == 2L)
    val expected = -(BigDecimal((1.0 / 3.0) * math.log(0.5))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(math.abs(out._3 - math.round(expected * 1e6) / 1e6.toDouble) < 1e-9)
  }

  test("zipfFit: geometric counts give a negative slope; n_terms respects topN") {
    // counts 16/8/4/2: strictly decreasing → negative log-log slope
    val words = Seq.fill(16)("w1") ++ Seq.fill(8)("w2") ++
      Seq.fill(4)("w3") ++ Seq.fill(2)("w4")
    val df = Seq(Tuple1(words.mkString(" "))).toDF("text")
    val out = TextStats.zipfFit(df, "text", topN = 3)
      .as[(Long, Double, Double)].head()
    assert(out._1 == 3L)
    assert(out._2 < -0.5, s"slope ${out._2} not steeply negative")
  }

  test("burstiness: clumped term VMR 9, sprinkled term VMR 0") {
    val docs = (1L to 9L).map(i => (i, "base")) :+ (10L, "base " + Seq.fill(10)("hot").mkString(" "))
    val df = docs.toDF("doc_id", "text")
    val out = TextStats.burstiness(df, "doc_id", "text", topN = 5)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    // 'hot': 10 occurrences in 1 of 10 docs → mean 1, E[x²] 10 → VMR 9
    assert(out("hot") == (("hot", 10L, 9.0)))
    // 'base': once in each doc → variance 0
    assert(out("base") == (("base", 10L, 0.0)))
  }

  test("templateFingerprints groups same-shape docs regardless of words") {
    val df = Seq(
      (1L, "the quick brown fox"),   // shapes: s m m s... lengths 3,5,5,3 → m m m m
      (2L, "his rapid green cat"),   // lengths 3,5,5,3 → same shape
      (3L, "completely different"),  // l l
      (4L, "a b")                    // s s
    ).toDF("doc_id", "text")
    val out = TextStats.templateFingerprints(df, "doc_id", "text", minDocs = 2L)
      .as[(Long, Long, Long)].collect()
    assert(out.length == 1)
    assert(out.head._2 == 2L && out.head._3 == 1L)
  }

  test("hashedDocEmbedding: weights sum to 1 per doc, partitioning-invariant") {
    val docs = graft.Tables.documents(spark, sfTiny).limit(50)
    val out = TextStats.hashedDocEmbedding(docs, "doc_id", "text", buckets = 16)
      .as[(Long, Long, Double)].collect()
    out.groupBy(_._1).foreach { case (id, rows) =>
      assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, s"doc $id weights != 1")
      assert(rows.map(_._2).forall(b => b >= 0 && b < 16))
    }
    val b = TextStats.hashedDocEmbedding(docs.repartition(7), "doc_id", "text", 16)
      .as[(Long, Long, Double)].collect()
    assert(out.sortBy(r => (r._1, r._2)).toSeq == b.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("hillTail: hand-checkable alpha on a 3-point tail") {
    val df = Seq((1L, 8L), (2L, 4L), (3L, 2L), (4L, 1L)).toDF("id", "v")
    val out = Profile.hillTail(df, "id", "v", k = 2)
      .as[(Int, Long, Option[Double])].head()
    assert(out._1 == 2 && out._2 == 2L)
    val expect = 2.0 / (math.log(8.0 / 2.0) + math.log(4.0 / 2.0))
    assert(out._3.exists(a => math.abs(a - expect) < 1e-6))
  }

  test("chao1Richness: hand case — f1/f2 arithmetic and coverage") {
    val df = Seq(("g", "a a b c")).toDF("lang", "t")
    val out = TextStats.chao1Richness(df, "lang", "t")
      .as[(String, Long, Long, Long, Long, Double, Double)].head()
    // counts a:2 b:1 c:1 → N=4 D=3 f1=2 f2=1; chao1 = 3 + 2·1/4 = 3.5
    assert(out == (("g", 4L, 3L, 2L, 1L, 3.5, 0.5)))
  }

  test("rakeKeyphrases: degree/freq scores on a hand case") {
    val df = Seq((1L, "the big dog the big cat")).toDF("doc_id", "text")
    val out = TextStats.rakeKeyphrases(df, "doc_id", "text",
        stopwords = Seq("the"), topK = 10)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // phrases: "big dog", "big cat"; big: freq 2 deg 4 → 2.0; dog/cat:
    // freq 1 deg 2 → 2.0; each phrase scores 4.0
    assert(out.keySet == Set("big dog", "big cat"))
    assert(out("big dog") == (("big dog", 2L, 1L, 4.0)))
    assert(out("big cat") == (("big cat", 2L, 1L, 4.0)))
  }

  test("scalingCurve: nested fractions, shared slope, sane shape") {
    // 32 docs drawn from one distribution — more data must not HURT the
    // holdout add-α NLL dramatically; structural contract checks
    val docs = (0L until 32L).map(i =>
      (i, if (i % 2 == 0) "a b a b c" else "a b c a b")).toDF("doc_id", "text")
    val out = TextStats.scalingCurve(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(2L, 4L, 8L))
    // nested: half ⊃ quarter ⊃ eighth
    assert(out(0)._2 > out(1)._2 && out(1)._2 > out(2)._2)
    // same holdout everywhere
    assert(out.map(_._3).distinct.length == 1)
    // one shared slope, finite
    assert(out.map(_._5).distinct.length == 1 && !out.head._5.isNaN)
  }

  test("excessLossDeciles: learnable doc ranks above noise doc") {
    // proxy model sees only "x y"; reference model only "x z" — the pool
    // doc "x z" is likely under ref, unlikely under proxy → ρ > 0
    val df = Seq(
      (0L, "x y"), (3L, "x y"),  // train (id % 3 == 0)
      (1L, "x z"), (4L, "x z"),  // ref   (id % 3 == 1)
      (2L, "x z"), (5L, "x y"))  // pool
      .toDF("doc_id", "text")
    import org.apache.spark.sql.functions.col
    val out = TextStats.excessLossDeciles(df, "doc_id", "text",
        col("doc_id") % 3 === 0, col("doc_id") % 3 === 1, nBuckets = 2)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._2 == 1L && out(2L)._2 == 1L) // one pool doc per bucket
    assert(out(1L)._3 > 0 && out(2L)._3 < 0)     // ref-likely doc on top
  }

  // ─── datasetDigest / mlmMaskPlan ──────────────────────────────────────

  test("datasetDigest: edit-sensitive, whitespace-insensitive, order-free") {
    val a = Seq((1L, "s", "alpha beta"), (2L, "s", "gamma delta"))
      .toDF("doc_id", "source", "text")
    def digest(df: org.apache.spark.sql.DataFrame) =
      TextStats.datasetDigest(df, "source", "text")
        .as[(String, Long, Long)].head()
    val base = digest(a)
    assert(base._2 === 2L)
    // row order / partitioning can't move the digest (commutative sum)
    assert(digest(a.repartition(5)) === base)
    assert(digest(Seq((2L, "s", "gamma delta"), (1L, "s", "alpha beta"))
      .toDF("doc_id", "source", "text")) === base)
    // normalization: case/whitespace noise is identity
    assert(digest(Seq((1L, "s", "  ALPHA   beta "), (2L, "s", "gamma delta"))
      .toDF("doc_id", "source", "text")) === base)
    // a one-character edit moves it
    assert(digest(Seq((1L, "s", "alpha betA x"), (2L, "s", "gamma delta"))
      .toDF("doc_id", "source", "text")) !== base)
  }

  test("mlmMaskPlan: deterministic hash selection near the target rate") {
    import org.apache.spark.sql.functions.sum
    val docs = graft.Tables.documents(spark, sfTiny)
    val plan = TextStats.mlmMaskPlan(docs, "doc_id", "text", pct = 15)
    val agg = plan.agg(sum($"n_tokens"), sum($"n_masked"))
      .as[(Long, Long)].head()
    val rate = agg._2.toDouble / agg._1
    assert(rate > 0.12 && rate < 0.18, s"corpus mask rate $rate far from 15%")
    // identical under repartitioning (hash selection, no RNG state)
    val again = TextStats.mlmMaskPlan(docs.repartition(7), "doc_id", "text",
      pct = 15).collect().toSeq
    assert(again === plan.collect().toSeq)
    // pct = 0 and 100 are exact
    assert(TextStats.mlmMaskPlan(docs, "doc_id", "text", pct = 0)
      .agg(sum($"n_masked")).as[Long].head() === 0L)
    val all = TextStats.mlmMaskPlan(docs, "doc_id", "text", pct = 100)
      .agg(sum($"n_masked") - sum($"n_tokens")).as[Long].head()
    assert(all === 0L)
  }

  // ─── chi2Keywords ─────────────────────────────────────────────────────

  test("chi2Keywords: hand-computed 2x2 contingencies, presence-based") {
    // N=4, two labels of 2 docs each; contingencies by hand:
    //   (a,xx): a=2 b=0 c=0 d=2 → χ² = 4·16/16 = 4
    //   (a,zz): a=1 b=2 c=1 d=0 → χ² = 4·4/12  = 4/3
    //   (b,zz): a=2 b=1 c=0 d=1 → 4/3; (·,yy): balanced → 0
    // 'zz zz' also checks presence (array_distinct), not token counts
    val df = Seq((1L, "a", "xx yy"), (2L, "a", "xx zz"),
      (3L, "b", "yy zz"), (4L, "b", "zz zz")).toDF("doc_id", "lang", "text")
    val got = TextStats.chi2Keywords(df, "doc_id", "lang", "text",
        minDf = 1, topK = 2)
      .as[(String, String, Long, Long, Double)].collect().toSeq
    val third = BigDecimal(4.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Seq(
      ("a", "xx", 2L, 0L, 4.0), ("a", "zz", 1L, 2L, third),
      ("b", "zz", 2L, 1L, third), ("b", "yy", 1L, 1L, 0.0)))
  }

  // ─── fleschStats ──────────────────────────────────────────────────────

  test("fleschStats: hand-counted sentences, words, vowel-group syllables") {
    val df = Seq(
      // 2 sentences, 6 words; syllables: the(1) cat(1) sat(1) it(1)
      // was(1) happy(2) = 7
      (1L, "The cat sat. It was happy!"),
      // no sentence punctuation → min 1; "xxxx" has no vowel → 1 beat;
      // "rhythm" has the y group → 1
      (2L, "xxxx rhythm"),
      (3L, "")).toDF("doc_id", "text")
    val got = TextStats.fleschStats(df, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 2L, 6L, 7L,
      BigDecimal(206.835 - 1.015 * 3.0 - 84.6 * 7.0 / 6.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(2L) === ((2L, 1L, 2L, 2L,
      BigDecimal(206.835 - 1.015 * 2.0 - 84.6 * 1.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(3L)._3 === 0L && got(3L)._5 === 0.0) // empty text guard
  }

  // ─── termBurstiness ───────────────────────────────────────────────────

  test("termBurstiness: uniform term ≈ 0 VMR, clumped term ≫ 1") {
    // 'even' once in each of 4 docs (variance 0); 'bursty' 4 times in ONE
    // doc: mean 1, S2 = 16 → var = 16/4 - 1 = 3 → vmr = 3
    val df = Seq(
      (1L, "even bursty bursty bursty bursty"),
      (2L, "even pad"), (3L, "even pad"), (4L, "even pad"))
      .toDF("doc_id", "text")
    val got = TextStats.termBurstiness(df, "doc_id", "text", topK = 10)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("even") === (("even", 4L, 4L, 0.0)))
    assert(got("bursty") === (("bursty", 4L, 1L, 3.0)))
    assert(got("pad")._4 === BigDecimal((3.0 / 4 - 0.75 * 0.75) / 0.75)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  // ─── goodTuring ───────────────────────────────────────────────────────

  test("goodTuring == a reference LGT replay on a hand-sized corpus") {
    // counts: a:3 b:2 c/d/e:1 -> ff = {1:3, 2:1, 3:1}, N=8, V=5, N1=3
    val docs = Seq((1L, "a a a b"), (2L, "b c d e")).toDF("id", "text")
    val got = TextStats.goodTuring(docs, "text")
      .as[(Long, Long, Long, Double, Double, Double, Double, Double, Boolean)]
      .head()
    // reference with the op's dec9 discipline
    def dec9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ff = Seq((1L, 3L), (2L, 1L), (3L, 1L)) // (r, Nr), sorted
    val z = ff.zipWithIndex.map { case ((r, nr), i) =>
      val lo = if (i == 0) 0L else ff(i - 1)._1
      val hi = if (i == ff.length - 1) 2 * r - lo else ff(i + 1)._1
      (r, nr.toDouble * 2.0 / (hi - lo).toDouble)
    }
    val k = z.length.toDouble
    val sx = z.map(p => dec9(math.log(p._1.toDouble))).sum.toDouble
    val sy = z.map(p => dec9(math.log(p._2))).sum.toDouble
    val sxx = z.map(p => dec9(math.log(p._1.toDouble) * math.log(p._1.toDouble))).sum.toDouble
    val sxy = z.map(p => dec9(math.log(p._1.toDouble) * math.log(p._2))).sum.toDouble
    val b = (sxy - sx * sy / k) / (sxx - sx * sx / k)
    val a = sy / k - b * sx / k
    assert(got._1 == 8L && got._2 == 5L && got._3 == 3L)
    assert(got._4 == 0.375, "p0 = N1/N")
    assert(got._5 == r6(a) && got._6 == r6(b), got.toString)
    assert(got._7 == r6(2.0 * math.exp(b * 0.6931471805599453)))
    assert(got._8 == r6(3.0 * math.exp(b * 0.4054651081081644)))
    assert(got._9 == (b < -1.0))
  }
}
