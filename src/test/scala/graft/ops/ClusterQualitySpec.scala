package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `Similarity.silhouette` / `Similarity.daviesBouldin` unit contracts:
  * hand-computed values on orthogonal-centroid fixtures (where cosine
  * distances are exact decimals), tie-break-to-lower-cell assignment,
  * and partition invariance of the fixed-point means. */
class ClusterQualitySpec extends SparkSpec {
  import spark.implicits._

  // two orthogonal unit centroids: cos to each is the matching coordinate
  private val cents: Seq[(Int, Array[Float])] =
    Seq(0 -> Array(1f, 0f), 1 -> Array(0f, 1f))

  private def emb(vs: (Long, Array[Float])*) =
    vs.toDF("vec_id", "embedding")

  test("silhouette: exact members score 1, an equidistant tie scores 0") {
    // v1=(1,0): a=0, b=1 → s=1 in cell 0; v2=(0,1): s=1 in cell 1;
    // v3=(1,1)/√2: cos = √2/2 to BOTH → tie → cell 0, a=b → s=0
    val df = emb(1L -> Array(1f, 0f), 2L -> Array(0f, 1f),
      3L -> Array(1f, 1f))
    val got = Similarity.silhouette(df, "vec_id", "embedding", cents)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq((0, 2L, 0.5), (1, 1L, 1.0)))
  }

  test("silhouette is invariant under repartitioning") {
    val df = emb((1L to 12L).map(i =>
      i -> Array((i % 3).toFloat + 0.25f, (i % 4).toFloat + 0.5f)): _*)
    val a = Similarity.silhouette(df, "vec_id", "embedding", cents).collect().toSeq
    val b = Similarity.silhouette(df.repartition(7), "vec_id", "embedding", cents)
      .collect().toSeq
    assert(a === b)
  }

  test("daviesBouldin: hand-computed S and R on orthogonal centroids") {
    // M01 = 1 - 0 = 1. v1=(1,0): d=0; v2=(0.8,0.6): cos to c0 = 0.8 → cell
    // 0, d=0.2; v3=(0,1): d=0. S0 = 0.1, S1 = 0, R0 = R1 = (0.1+0)/1
    val df = emb(1L -> Array(1f, 0f), 2L -> Array(0.8f, 0.6f),
      3L -> Array(0f, 1f))
    val got = Similarity.daviesBouldin(df, "vec_id", "embedding", cents)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got === Seq((0, 2L, 0.1, 0.1), (1, 1L, 0.0, 0.1)))
  }

  test("daviesBouldin excludes coincident centroids from the max") {
    // duplicate centroid 2 == centroid 0: M02 = 0 must not divide; the
    // max for cell 0 comes from centroid 1 only
    val dup = cents :+ (2 -> Array(1f, 0f))
    val df = emb(1L -> Array(1f, 0f), 2L -> Array(0f, 1f))
    // tie cos(v1)=1 to cells 0 AND 2 → lower cell 0 wins; cell 2 empty
    val got = Similarity.daviesBouldin(df, "vec_id", "embedding", dup)
      .collect().map(r => (r.getInt(0), r.getDouble(3))).toMap
    assert(got.keySet === Set(0, 1))
    assert(got(0) === 0.0 && got(1) === 0.0) // S both 0, M01 = 1
  }

  test("mauve: identical distributions score exactly 1") {
    // even/odd halves land in the same cells with the same proportions
    val e = emb(
      (0L, Array(1f, 0f)), (1L, Array(1f, 0f)),
      (2L, Array(0f, 1f)), (3L, Array(0f, 1f)))
    val m = Similarity.mauve(e, "vec_id", "embedding",
        col("vec_id") % 2 === 0, cents)
      .as[(Long, Long, Long, Double)].head()
    assert(m == ((2L, 2L, 2L, 1.0)))
  }

  test("mauve: disjoint cell supports score near 0; mild drift lands between") {
    // ref all in cell 0, cur all in cell 1 → support mismatch both ways
    val dis = emb(
      (0L, Array(1f, 0f)), (2L, Array(1f, 0f)),
      (1L, Array(0f, 1f)), (3L, Array(0f, 1f)))
    val md = Similarity.mauve(dis, "vec_id", "embedding",
        col("vec_id") % 2 === 0, cents)
      .as[(Long, Long, Long, Double)].head()._4
    // at c = 5 the (1−λ)^c vs λ^c bow hugs the axes
    assert(md < 0.05, s"disjoint mauve should be tiny, got $md")
    // 50/50 ref vs 75/25 cur: same support, different shape → strictly
    // between the extremes
    val drift = emb(
      (0L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (1L, Array(1f, 0f)), (3L, Array(1f, 0f)),
      (5L, Array(1f, 0f)), (7L, Array(0f, 1f)))
    val mm = Similarity.mauve(drift, "vec_id", "embedding",
        col("vec_id") % 2 === 0, cents)
      .as[(Long, Long, Long, Double)].head()._4
    assert(mm > md && mm < 1.0, s"drifted mauve should sit between: $mm")
  }

  test("mauve: rejects an empty side") {
    val e = emb((0L, Array(1f, 0f)), (2L, Array(0f, 1f)))
    val ex = intercept[IllegalArgumentException] {
      Similarity.mauve(e, "vec_id", "embedding",
        col("vec_id") % 2 === 0, cents)
    }
    assert(ex.getMessage.contains("both sides"))
  }

  test("alignmentUniformity: hand-worked 4-vector fixture at B=1 (exact)") {
    import spark.implicits._
    // pos pairs: (0,1) identical -> d² = 0; (2,3) antipodal -> d² = 4
    val e = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(1f, 0f)),
      (2L, Seq(0f, 1f)), (3L, Seq(0f, -1f))).toDF("vec_id", "embedding")
    // n=4 ≤ √budget at the default → B=1, the exact statistic
    val got = Similarity.alignmentUniformity(e, "vec_id", "embedding")
      .as[(Long, Double, Long, Double)].head()
    def dec9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._1 == 2L && got._3 == 6L)
    assert(got._2 == 2.0, s"alignment (0+4)/2: $got")
    // all 6 pairs: cos = 1 once, 0 four times, −1 once
    val su = (dec9(math.exp(0.0)) + dec9(math.exp(-4.0)) * 4 +
      dec9(math.exp(-8.0))).toDouble
    assert(got._4 == r6(math.log(su / 6.0)), got.toString)
  }

  test("mmd: hand-worked two-cluster fixture at B=1 (exact)") {
    import spark.implicits._
    // ref = copies of (1,0), cur = copies of (0,1): k_xx = k_yy = 1,
    // k_xy = dec9(e^{-0.5·2}) -> mmd² = 2 − 2·0.367879441 = 1.264241118
    val e = (0L until 8L).map(i =>
      (i, if (i % 2 == 0) Seq(1f, 0f) else Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.mmd(e, "vec_id", "embedding",
        col("vec_id") % 2 === 0, gamma = 0.5)
      .as[(Long, Long, Long, Long, Long, Option[Double])].head()
    assert(got == ((4L, 4L, 6L, 6L, 16L, Some(1.264241))), got.toString)
    // identical distributions -> exactly 0
    val same = (0L until 8L).map(i => (i, Seq(1f, 0f)))
      .toDF("vec_id", "embedding")
    val z = Similarity.mmd(same, "vec_id", "embedding",
        col("vec_id") % 2 === 0, gamma = 0.5)
      .as[(Long, Long, Long, Long, Long, Option[Double])].head()
    assert(z._6.contains(0.0), z.toString)
  }

  test("alignmentUniformity: tighter pair budgets only thin the pair sample") {
    import spark.implicits._
    val e = (0L until 40L).map(i =>
      (i, Seq(math.cos(i * 0.37).toFloat, math.sin(i * 0.37).toFloat)))
      .toDF("vec_id", "embedding")
    // budget ≥ n² → B=1 (exact); budget = n²/4 → B=4 (thinned sample)
    val exact = Similarity.alignmentUniformity(e, "vec_id", "embedding",
      pairBudget = 1600L).as[(Long, Double, Long, Double)].head()
    val thin = Similarity.alignmentUniformity(e, "vec_id", "embedding",
      pairBudget = 400L).as[(Long, Double, Long, Double)].head()
    assert(exact._3 == 40L * 39 / 2)
    assert(thin._3 < exact._3 && thin._3 > 0)
    assert(thin._1 == exact._1 && thin._2 == exact._2,
      "alignment is never sampled")
  }
}

/** `TextStats.textRankKeywords` contract: hub word outranks spokes,
  * short words are filtered but HOLD their original positions (a
  * filtered word does not shrink the window), determinism. */
class TextRankSpec extends SparkSpec {
  import spark.implicits._

  test("hub word outranks the spokes") {
    val docs = Seq((1L, "hubx aaaa hubx bbbb hubx cccc hubx dddd"))
      .toDF("doc_id", "text")
    val got = TextStats.textRankKeywords(docs, "doc_id", "text",
      minLen = 4, window = 2, iters = 3, topK = 5).collect()
    assert(got.head.getString(0) === "hubx")
    assert(got.length === 5)
    // ranks descend, ties broken by word
    val ranks = got.map(_.getLong(1)).toSeq
    assert(ranks === ranks.sorted.reverse)
  }

  test("filtered short words keep original positions (no window shrink)") {
    // 'bb' is filtered; aaaa(0) and cccc(2) are 2 apart → edge exists;
    // in the 4-token doc they are 3 apart → no edge, both isolated
    def ranks(text: String) =
      TextStats.textRankKeywords(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", minLen = 4, window = 2, iters = 1, topK = 5)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val linked = ranks("aaaa bb cccc")
    val isolated = ranks("aaaa bb bb cccc")
    assert(linked.keySet === Set("aaaa", "cccc"))
    // linked: each passes its mass to the other (no dangling loss beyond
    // integer floors); isolated: ALL mass is dangling, redistributed
    // uniformly — both end equal, but the linked pair keeps more than
    // the 15% restart floor alone
    assert(linked("aaaa") === linked("cccc"))
    assert(isolated("aaaa") === isolated("cccc"))
  }

  test("deterministic under repartitioning") {
    val docs = graft.Tables.documents(spark, sfTiny)
    val a = TextStats.textRankKeywords(docs, "doc_id", "text").collect().toSeq
    val b = TextStats.textRankKeywords(docs.repartition(9), "doc_id", "text")
      .collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

}
