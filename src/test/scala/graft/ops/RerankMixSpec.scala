package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Batch-B ops: MMR re-rank, temperature mixing, n-gram coverage,
  * freshness decay. */
class RerankMixSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  test("mmrRerank at lambda=1 is plain top-k; diversity kicks in below") {
    // 1 and 2 are near-duplicates of each other (cos ≈ 0.9997) and both
    // highly relevant; 3 is less relevant but far from both
    val emb = Seq(
      (1L, vec(0.91, 0.4146, 0.0)),
      (2L, vec(0.90, 0.4359, 0.0)),
      (3L, vec(0.70, -0.7141, 0.0))
    ).toDF("vec_id", "embedding")
    val q = Seq(Tuple1(vec(1.0, 0.0, 0.0))).toDF("qvec")
    val plain = Similarity.mmrRerank(emb, "vec_id", "embedding", q,
        candK = 3, k = 3, lambda = 1.0)
      .as[(Int, Long, Double)].collect().map(_._2).toSeq
    assert(plain == Seq(1L, 2L, 3L)) // pure relevance order
    val diverse = Similarity.mmrRerank(emb, "vec_id", "embedding", q,
        candK = 3, k = 3, lambda = 0.5)
      .as[(Int, Long, Double)].collect().map(_._2).toSeq
    // redundancy penalty demotes the near-dup 2 below the distant 3
    assert(diverse == Seq(1L, 3L, 2L), s"unexpected order: $diverse")
  }

  test("mmrRerank never repeats a pick and ranks are dense from 0") {
    val emb = graft.Tables.embeddings(spark, sfTiny)
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qvec"))
    val out = Similarity.mmrRerank(emb, "vec_id", "embedding", q,
        candK = 15, k = 6, lambda = 0.7)
      .as[(Int, Long, Double)].collect()
    assert(out.map(_._1).toSeq == (0 until 6))
    assert(out.map(_._2).distinct.length == 6)
    // scores are non-increasing is NOT guaranteed by MMR, but pick 0 is
    // the raw top-1 by relevance
    val top1 = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 1)
      .as[(Long, Double)].head()._1
    assert(out.head._2 == top1)
  }

  test("temperatureShares: alpha=1 is identity; alpha<1 boosts the tail") {
    val df = (Seq.fill(90)("big") ++ Seq.fill(10)("small")).toDF("lang")
    val id = Mixing.temperatureShares(df, "lang", alpha = 1.0)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(id("big")._3 == id("big")._4) // share_temp == share_orig
    assert(id("small")._5 == 1.0)
    val flat = Mixing.temperatureShares(df, "lang", alpha = 0.5)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(flat("small")._4 > flat("small")._3, "tail not boosted")
    assert(flat("big")._4 < flat("big")._3, "head not flattened")
    // shares still sum to ~1
    assert(math.abs(flat.values.map(_._4).sum - 1.0) < 1e-5)
  }

  test("doremiWeights: identical domains stay uniform; a distinctive domain gains weight") {
    // two domains with the SAME text → zero excess everywhere → weights
    // exactly uniform at any eta/smoothing
    val same = Seq((1L, "a", "x y z"), (2L, "b", "x y z"))
      .toDF("doc_id", "dom", "text")
    val u = Mixing.doremiWeights(same, "doc_id", "dom", "text",
        eta = 2.0, smoothing = 0.2)
      .select($"dom", $"excess_nats", $"weight")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(u("a") == u("b") && u("a")._2 == 0.5)
    assert(u("a")._1 == 0.0, "identical domains must have zero excess")
    // a domain whose vocabulary is all its own has high excess and must
    // out-weigh a domain that speaks pure corpus-average language
    val mixed = Seq(
      (1L, "plain", "the of and the of and"),
      (2L, "plain", "the of and the of and"),
      (3L, "plain", "the of and the of and"),
      (4L, "jargon", "quark gluon hadron quark gluon"))
      .toDF("doc_id", "dom", "text")
    val w = Mixing.doremiWeights(mixed, "doc_id", "dom", "text")
      .select($"dom", $"excess_nats", $"weight")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(w("jargon")._1 > w("plain")._1, "distinctive domain must have higher excess")
    assert(w("jargon")._2 > w("plain")._2, "distinctive domain must gain weight")
    assert(math.abs(w.values.map(_._2).sum - 1.0) < 1e-5, "weights must sum to 1")
  }

  test("doremiWeights: parameters validated; smoothing pulls toward uniform") {
    val df = Seq((1L, "a", "p q"), (2L, "b", "r s")).toDF("doc_id", "dom", "text")
    intercept[IllegalArgumentException] {
      Mixing.doremiWeights(df, "doc_id", "dom", "text", eta = 0.0) }
    intercept[IllegalArgumentException] {
      Mixing.doremiWeights(df, "doc_id", "dom", "text", smoothing = 1.0) }
    def wOf(s: Double) = Mixing.doremiWeights(df, "doc_id", "dom", "text",
        eta = 1.0, smoothing = s)
      .select($"dom", $"weight").as[(String, Double)].collect().toMap
    val sharp = wOf(0.0); val soft = wOf(0.8)
    val spread = (m: Map[String, Double]) => (m.values.max - m.values.min)
    assert(spread(soft) <= spread(sharp) + 1e-9,
      "higher smoothing must not widen the weight spread")
  }

  test("ngramCoverage: full overlap = 1, disjoint = 0, short docs drop out") {
    val df = Seq(
      (0L, "en", "a b c d"),   // train (even)
      (1L, "en", "a b c d"),   // eval: all 3 bigrams covered
      (2L, "de", "x y z"),     // train
      (3L, "de", "p q r"),     // eval: nothing covered
      (4L, "fr", "only train"),
      (5L, "fr", "w")          // eval: 0 bigrams → fr absent from output
    ).toDF("doc_id", "lang", "text")
    val out = TextStats.ngramCoverage(df, "text", "lang", $"doc_id" % 2 === 0, 2)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("en") == (("en", 3L, 3L, 1.0)))
    assert(out("de") == (("de", 2L, 0L, 0.0)))
    assert(!out.contains("fr"))
  }

  test("rrfFuse: dual-list membership beats single-list, absent docs contribute 0") {
    val la = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val lb = Seq((2L, 1), (4L, 2)).toDF("doc_id", "rank")
    val out = Similarity.rrfFuse(Seq(la, lb), "doc_id", kConst = 60, topN = 10)
      .as[(Long, Double)].collect().toMap
    def r(x: Double) = math.round(x * 1e6) / 1e6.toDouble
    assert(out(2L) == r(1.0 / 62 + 1.0 / 61)) // in both lists
    assert(out(1L) == r(1.0 / 61))
    assert(out(4L) == r(1.0 / 62))
    assert(out(2L) > out(1L), "dual membership must outrank a single top rank")
  }

  test("spanCorruption: adjacent masked positions merge, ratio ~ 1/modulus") {
    val docs = graft.Tables.documents(spark, sfTiny)
    val out = TextStats.spanCorruption(docs, "doc_id", "text", modulus = 5, seed = 5)
      .as[(Long, Long, Long, Long, Double)].collect()
    val totTok = out.map(_._2).sum.toDouble
    val totMask = out.map(_._4).sum.toDouble
    assert(math.abs(totMask / totTok - 0.2) < 0.02, s"mask rate ${totMask / totTok}")
    // spans never exceed masked count; both 0 together
    out.foreach { case (id, nt, ns, nm, ratio) =>
      assert(ns <= nm, s"doc $id: more spans than masked tokens")
      assert((ns == 0) == (nm == 0))
      assert(ratio == math.round(nm.toDouble / nt * 1e6) / 1e6.toDouble)
    }
    // some span must be longer than 1 token at a 20% rate over this corpus
    assert(out.exists { case (_, _, ns, nm, _) => nm > ns })
    // partitioning-invariant (deterministic hash rule)
    val b = TextStats.spanCorruption(docs.repartition(7), "doc_id", "text", 5, 5)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out.sortBy(_._1).toSeq == b)
  }

  test("corrPerKey: exact ±1 on perfect lines, NULL on constants") {
    val df = Seq(
      ("up", 1L, 10L), ("up", 2L, 20L), ("up", 3L, 30L),
      ("down", 1L, 30L), ("down", 2L, 20L), ("down", 3L, 10L),
      ("flat", 1L, 5L), ("flat", 2L, 5L), ("flat", 3L, 5L))
      .toDF("k", "x", "y")
    val out = Profile.corrPerKey(df, "k", "x", "y")
      .as[(String, Long, Option[Double])].collect().map(r => r._1 -> r._3).toMap
    assert(out("up").contains(1.0))
    assert(out("down").contains(-1.0))
    assert(out("flat").isEmpty)
  }

  test("gini: equal split = 0, winner-takes-all = (n-1)/n") {
    val eq = Seq(("m", 1L, 10.0), ("m", 2L, 10.0), ("m", 3L, 10.0), ("m", 4L, 10.0))
      .toDF("mkt", "firm", "v")
    val g1 = Market.gini(eq, "mkt", "firm", "v")
      .as[(String, Long, Option[Double])].head()
    assert(g1 == (("m", 4L, Some(0.0))))
    val wta = Seq(("m", 1L, 0.0), ("m", 2L, 0.0), ("m", 3L, 0.0), ("m", 4L, 100.0))
      .toDF("mkt", "firm", "v")
    val g2 = Market.gini(wta, "mkt", "firm", "v")
      .as[(String, Long, Option[Double])].head()
    assert(g2 == (("m", 4L, Some(0.75))))
  }

  test("lmInterpEm: hand-checkable single-bigram EM step, λ stays in (0,1)") {
    // train (even ids): "a b a b" → p2(b|a) = 1, p1(b) = 0.5
    // held-out (odd id): "a b" → one bigram; posterior at λ=0.5 is
    // 0.5·1 / (0.5·1 + 0.5·0.5) = 2/3, and the fixpoint is λ → 1
    val df = Seq((0L, "a b a b"), (1L, "a b")).toDF("doc_id", "text")
    val out = TextStats.lmInterpEm(df, "doc_id", "text", $"doc_id" % 2 === 0,
        iters = 3, lambda0 = 0.5)
      .as[(Int, Double)].collect().toMap
    assert(math.abs(out(1) - 2.0 / 3.0) < 1e-8)
    assert(out(2) > out(1) && out(3) > out(2), "EM must climb toward the 1.0 fixpoint")
    assert(out.values.forall(l => l > 0 && l < 1))
  }

  test("kcenterCoreset: seed first, no repeats, covering radius non-increasing") {
    val emb = graft.Tables.embeddings(spark, sfTiny)
    val out = Similarity.kcenterCoreset(emb, "vec_id", "embedding", k = 6, seedId = 0L)
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(out.head == ((0, 0L, 0.0)))
    assert(out.map(_._2).distinct.length == 6)
    // Gonzalez invariant: each selection's distance is <= the previous
    out.drop(1).sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 + 1e-9, s"radius grew: $a -> $b")
    }
    assert(out(1)._3 > 0.0)
  }

  test("labelRetrievalEval: perfect neighborhood gives rr=ndcg=recall=1") {
    // query 0 (label 1) surrounded by 3 near-identical label-1 vectors,
    // plus distant label-2 ones
    val emb = Seq(
      (0L, vec(1.0, 0.0, 0.0), 1),
      (1L, vec(0.99, 0.1, 0.0), 1),
      (2L, vec(0.98, 0.15, 0.0), 1),
      (3L, vec(0.97, 0.2, 0.0), 1),
      (4L, vec(0.0, 1.0, 0.0), 2),
      (5L, vec(0.0, 0.9, 0.1), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelRetrievalEval(emb, "vec_id", "embedding", "label",
        nQueries = 1, k = 3)
      .as[(Long, Int, Long, Long, Double, Double, Option[Double])].head()
    assert(out._1 == 0L && out._2 == 1)  // first relevant at rank 1
    assert(out._3 == 3L && out._4 == 3L) // all 3 relevants inside top-3
    assert(out._5 == 1.0)
    assert(out._6 == 1.0, s"ndcg ${out._6}") // top-3 all relevant = ideal
    assert(out._7.contains(1.0))
  }

  test("isotropyAudit: identical directions 1, orthogonal set near -1/(n-1)") {
    val same = Seq(
      (0L, vec(1.0, 0.0, 0.0, 0.0)), (1L, vec(2.0, 0.0, 0.0, 0.0)),
      (2L, vec(0.5, 0.0, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    val s1 = Similarity.isotropyAudit(same, "vec_id", "embedding")
      .as[(Long, Double)].head()
    assert(s1._1 == 3L && math.abs(s1._2 - 1.0) < 1e-6)
    val ortho = Seq(
      (0L, vec(1.0, 0.0, 0.0, 0.0)), (1L, vec(0.0, 1.0, 0.0, 0.0)),
      (2L, vec(0.0, 0.0, 1.0, 0.0)), (3L, vec(0.0, 0.0, 0.0, 1.0))
    ).toDF("vec_id", "embedding")
    val s2 = Similarity.isotropyAudit(ortho, "vec_id", "embedding")
      .as[(Long, Double)].head()
    assert(math.abs(s2._2) < 1e-6, s"orthogonal mean cos ${s2._2}")
  }

  test("freshnessWeights: newest rows weigh 1, decay is monotone, shares sum to 1") {
    def ts(day: Int) = new Timestamp(day * 86400L * 1000L)
    val df = Seq(
      ("new", ts(100)), ("new", ts(100)),
      ("old", ts(0)), ("old", ts(0))
    ).toDF("source", "ts")
    val out = Mixing.freshnessWeights(df, "source", "ts", lambdaPerDay = 0.01)
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("new")._3 == 2.0) // e^0 = 1 per row
    val expOld = BigDecimal(math.exp(-0.01 * 100))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble * 2
    assert(math.abs(out("old")._3 - expOld) < 1e-6)
    assert(math.abs(out("new")._4 + out("old")._4 - 1.0) < 1e-5)
    assert(out("new")._4 > out("old")._4)
  }

  test("reshardPlan: rendezvous moves a fraction, mod moves almost all") {
    val docs = (0L until 500L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val out = Mixing.reshardPlan(docs, "doc_id", kOld = 8, kNew = 10)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("mod")._2 == 500L && out("rendezvous")._2 == 500L)
    // HRW theoretical movement = 2/10; mod ≈ 1 − 1/lcm-ish (most keys)
    assert(out("rendezvous")._4 < 0.35)
    assert(out("mod")._4 > 0.6)
    assert(out("rendezvous")._3 < out("mod")._3)
  }

  test("negativeSample: k draws per anchor, in-range, self-flagged, stable") {
    val docs = (0L until 20L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = Mixing.negativeSample(docs, "doc_id", k = 3, seed = 5)
      .as[(Long, Int, Long, Boolean)].collect().sortBy(r => (r._1, r._2))
    assert(a.length == 60)
    assert(a.forall(r => r._3 >= 0 && r._3 < 20))
    assert(a.forall(r => r._4 == (r._1 == r._3)))
    // deterministic: same input → identical draws
    val b = Mixing.negativeSample(docs, "doc_id", k = 3, seed = 5)
      .as[(Long, Int, Long, Boolean)].collect().sortBy(r => (r._1, r._2))
    assert(a.toSeq == b.toSeq)
    // draws are not degenerate (some spread across the id space)
    assert(a.map(_._3).distinct.length > 5)
  }

  test("neymanAllocation: n_h ∝ N_h·S_h, largest-remainder exact total") {
    val df = (Seq(("A", 0.0), ("A", 10.0), ("C", 0.0), ("C", 20.0)) ++
      Seq.fill(4)(("B", 4.0))).toDF("g", "v")
    val out = Mixing.neymanAllocation(df, "g", "v", nTotal = 10)
      .as[(String, Long, Double, Long)].collect().map(r => r._1 -> r).toMap
    // weights N·S: A 2·5=10, B 0, C 2·10=20 → raw 3.33/0/6.67,
    // floor 3/0/6, leftover 1 goes to C (larger remainder)
    assert(out("A") == (("A", 2L, 5.0, 3L)))
    assert(out("B") == (("B", 4L, 0.0, 0L)))
    assert(out("C") == (("C", 2L, 10.0, 7L)))
    assert(out.values.map(_._4).sum == 10L)
  }

  test("unimaxAllocation: hand-worked waterfill — caps bind, the head levels") {
    // tokens: en 1000, de 300, fr 50, zh 10; maxEpochs 2 -> caps 2000/600/100/20
    // budget 1200: zh+fr capped (S=120), theta = (1200-120)/2 = 540
    val rows = Seq(("en", 600L), ("en", 400L), ("de", 300L),
      ("fr", 50L), ("zh", 10L)).toDF("lang", "w")
    val got = Mixing.unimaxAllocation(rows, "lang", col("w"), 1200L, 2.0)
      .orderBy($"lang")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("de", 300L, 600.0, 540.0, 1.8),
      ("en", 1000L, 2000.0, 540.0, 0.54),
      ("fr", 50L, 100.0, 100.0, 2.0),
      ("zh", 10L, 20.0, 20.0, 2.0)), got.toString)
    // the budget is exactly exhausted when any language is uncapped
    assert(got.map(_._4).sum == 1200.0)
  }

  test("unimaxAllocation: budget above the cap sum caps every language") {
    val rows = Seq(("en", 100L), ("de", 10L)).toDF("lang", "w")
    val got = Mixing.unimaxAllocation(rows, "lang", col("w"), 100000L, 3.0)
      .orderBy($"lang")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(("de", 10L, 30.0, 30.0, 3.0),
      ("en", 100L, 300.0, 300.0, 3.0)), got.toString)
  }
}
