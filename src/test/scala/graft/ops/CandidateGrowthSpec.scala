package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Measured candidate-pair GROWTH for the bucketed pair-generation
  * families, sf0.01 → sf0.1 (N ratio = 10× on every table). The 100 TB
  * contracts for these ops rest on the claim that blocking keeps the
  * candidate set ~linear in N — these tests turn that claim from a
  * plan-shape argument into a measured exponent: a linear family grows
  * ≤ c·10× across the decade; a quadratic one grows ~100×. The bound
  * c = 3 leaves room for corpus-composition drift (duplicate clusters
  * are a fixed FRACTION of the synthetic corpus, so true-pair counts
  * themselves grow slightly super-linearly with cluster size) while
  * still rejecting anything near quadratic by an order of magnitude.
  */
class CandidateGrowthSpec extends SparkSpec {
  import spark.implicits._

  private val sfSmall = "/root/testdata/sf0.01"
  private val sfBig = "/root/testdata/sf0.1"
  private val nRatio = 10.0
  private val c = 3.0

  private def assertSubQuadratic(family: String, small: Double, big: Double): Unit = {
    assert(small > 0, s"$family: empty candidate set at sf0.01 — measurement is vacuous")
    val ratio = big / small
    info(f"$family: cand(sf0.01)=$small%.0f cand(sf0.1)=$big%.0f growth=$ratio%.1f× (N ratio $nRatio×, bound ${c * nRatio}×)")
    assert(ratio <= c * nRatio,
      s"$family candidate pairs grew ${ratio}× across a ${nRatio}× N increase — super-linear blocking")
  }

  test("minhash LSH candidate pairs grow ~linearly at scale banding (r=4)") {
    // threshold = 0.0 passes EVERY banded candidate through the verify
    // filter, so the output count IS the distinct candidate-pair count.
    def cand(nh: Int, dir: String): Double =
      Dedup.minhashPairs(Tables.documents(spark, dir), "doc_id", "text",
        numHashes = nh, bands = 8, shingleK = 3, threshold = 0.0).count().toDouble
    // This measurement EXPOSED the banding trade-off the q385 planner
    // prices: at the q25 gate config (16 hashes / 8 bands = r=2 minhash
    // rows per band key) random collisions between UNRELATED docs carry
    // a quadratic term — measured 35 → 1403 (40×) across the decade
    // while true pairs grew 25 → 256 (10×, exactly linear). At r=4
    // (32 hashes / 8 bands) the collision term vanishes: 25 → 258,
    // candidates ≈ true pairs. So the scale contract is: r ≥ 4 for
    // large corpora (what the banding planner recommends); r=2 is a
    // recall-maximising small-corpus config. Assert both measured facts.
    assertSubQuadratic("minhashPairs(r=4)", cand(32, sfSmall), cand(32, sfBig))
    val r2ratio = cand(16, sfBig) / cand(16, sfSmall)
    info(f"minhashPairs(r=2): growth $r2ratio%.1f× — quadratic collision term, documented planner trade-off")
    assert(r2ratio <= nRatio * nRatio,
      "r=2 banding exceeded even the quadratic envelope — something beyond random collisions")
  }

  test("prefix-filter Jaccard verified pairs grow ~linearly, not quadratically") {
    // The op verifies in-pipeline, so the observable is the EXACT output
    // (q108 gate parameters); output ≥-bounds the useful candidate work
    // and is the quantity a quadratic blow-up would inflate.
    def cand(dir: String): Double =
      Dedup.prefixJaccardPairs(Tables.documents(spark, dir), "doc_id", "text",
        shingleK = 3, tNum = 1, tDen = 2).count().toDouble
    assertSubQuadratic("prefixJaccardPairs", cand(sfSmall), cand(sfBig))
  }

  test("edit-distance-1 deletion-neighborhood candidates grow ~linearly") {
    // Reproduces the op's documented blocking representation (name +
    // every 1-char deletion, hashed — StringSim.editPairsD1) and counts
    // Σ_buckets C(n_b, 2) WITHOUT materialising pairs: the exact number
    // of candidate comparisons the verify stage would run.
    def cand(dir: String): Double = {
      val names = Tables.supplier(spark, dir).select($"s_name".as("name"))
        .where($"name".isNotNull).distinct()
      val variants = array_distinct(expr(
        "transform(sequence(0, length(name)), " +
          "i -> IF(i = length(name), name, " +
          "concat(substring(name, 1, i), substring(name, i + 2, length(name)))))"))
      names.select($"name", explode(variants).as("v"))
        .select($"name", Dedup.baseHash($"v").as("k")).distinct()
        .groupBy($"k").agg(count(lit(1)).as("n"))
        .agg(sum($"n" * ($"n" - 1) / 2).as("cand"))
        .as[Double].head()
    }
    assertSubQuadratic("editPairsD1", cand(sfSmall), cand(sfBig))
  }

  test("Fellegi-Sunter blocked candidate pairs grow ~linearly") {
    // blockingQuality's cand_pairs column is exactly Σ_blocks C(n_b, 2).
    // The q348/q372/q373 gates block on RANK BUCKETS of B over
    // (p_name, p_partkey): block COUNT grows with N, per-block size is
    // a constant B, so candidates are exactly ⌊N/B⌋·C(B,2) + C(N mod B, 2)
    // — asserted as an equality, then as the measured linear exponent.
    def cand(dir: String): (Long, Double) = {
      val parts = Tables.part(spark, dir).select($"p_partkey", $"p_brand",
        $"p_type", $"p_name", element_at(split($"p_name", " "), 1).as("tok0"))
      val ranked = Ranks.withRowNumber(parts, "__rn", $"p_name", $"p_partkey")
      val got = Linkage.blockingQuality(ranked, "p_partkey",
        floor(($"__rn" - 1) / 64).cast("long"),
        Seq("p_brand", "p_type", "tok0"))
        .select($"cand_pairs").as[Double].head()
      (parts.count(), got)
    }
    def closedForm(n: Long, b: Long): Double =
      (n / b).toDouble * (b * (b - 1) / 2) + {
        val r = n % b; (r * (r - 1) / 2).toDouble }
    val (nS, small) = cand(sfSmall)
    val (nB, big) = cand(sfBig)
    assert(small == closedForm(nS, 64) && big == closedForm(nB, 64),
      s"rank-bucket candidates ($small, $big) off the closed form " +
        s"(${closedForm(nS, 64)}, ${closedForm(nB, 64)})")
    assertSubQuadratic("fellegiSunterPairs(rank-bucket)", small, big)
    // The REJECTED alternative, kept as the measured anti-pattern: a
    // fixed-domain equality key (p_size, 50 values) makes Σ C(n_b,2)
    // quadratic in N — the documented FS trade-off (Linkage.scala:
    // "pick blocking columns with bounded fan-out").
    def fixedDomain(dir: String): Double = {
      val parts = Tables.part(spark, dir).select($"p_partkey", $"p_brand",
        $"p_type", $"p_size", element_at(split($"p_name", " "), 1).as("tok0"))
      Linkage.blockingQuality(parts, "p_partkey", $"p_size",
        Seq("p_brand", "p_type", "tok0"))
        .select($"cand_pairs").as[Double].head()
    }
    val fdRatio = fixedDomain(sfBig) / fixedDomain(sfSmall)
    info(f"p_size fixed-domain blocking (rejected by the gates): growth $fdRatio%.1f× — the quadratic envelope the rank-bucket re-key escapes")
    assert(fdRatio >= nRatio * 2,
      "fixed-domain blocking no longer measures super-linear — the anti-pattern documentation is stale")
  }

  test("sorted-neighborhood FS candidates hit the exact linear closed form") {
    // The q401 production shape: EVERY equality key in TPC-H part has a
    // fixed domain (a composite (tok0, p_size) key measured 99.5× for a
    // 10× N increase — quadratic), so the scale escape is positional:
    // candidates of a w-window sorted neighborhood are EXACTLY
    // N·w − w(w+1)/2 — linear by construction, asserted as an equality,
    // not a bound.
    val w = 10
    def cand(dir: String): (Long, Long) = {
      val parts = Tables.part(spark, dir).select($"p_partkey", $"p_brand",
        $"p_type", $"p_name", element_at(split($"p_name", " "), 1).as("tok0"))
      val n = parts.count()
      val pairs = Linkage.sortedNeighborhoodPairs(parts, "p_partkey",
        $"p_name", Seq(Linkage.FieldSpec("p_brand", 0.9, 0.04)), w).count()
      (n, pairs)
    }
    for (dir <- Seq(sfSmall, sfBig)) {
      val (n, pairs) = cand(dir)
      assert(pairs == n * w - w.toLong * (w + 1) / 2,
        s"$dir: SNM candidate count $pairs != closed form for n=$n, w=$w")
    }
  }

  test("budget-derived pair sampling keeps embedding-pair statistics ≤ PairSampleBudget") {
    // q461/q465 contract: B = ⌈n²/budget⌉ buckets, so the materialized
    // pair count is ≈ budget/2 regardless of n — the statistic's cost
    // is FLAT across the SF decade (a fixed B would grow pairs 16×
    // here, n² at corpus scale). Also pins gate-scale exactness: at
    // n=500 the derived B is 1 and n_pairs is exactly C(500,2).
    val budget = Similarity.PairSampleBudget
    val pairCounts = for (dir <- Seq(sfSmall, sfBig)) yield {
      val n = Tables.embeddings(spark, dir).count()
      val au = Similarity.alignmentUniformity(
        Tables.embeddings(spark, dir), "vec_id", "embedding")
        .select($"n_pairs").as[Long].head()
      val md = Similarity.mmd(Tables.embeddings(spark, dir), "vec_id",
          "embedding", $"vec_id" % 2 === 0, gamma = 0.5)
        .select($"pairs_xx" + $"pairs_yy" + $"pairs_xy").as[Long].head()
      info(f"$dir: n=$n uniformity_pairs=$au mmd_pairs=$md (budget $budget)")
      assert(au <= budget, s"$dir: uniformity pair sample $au > budget $budget")
      assert(md <= budget, s"$dir: mmd pair sample $md > budget $budget")
      if (n.toDouble * n <= budget)
        assert(au == n * (n - 1) / 2, s"$dir: B=1 regime must be exact")
      au
    }
    // growth line: pairs at sf0.1 stay bounded even though n grew 4×
    // (n² would be 16×) — budget-derived B absorbs the square.
    info(f"uniformity pair growth across the decade: ${pairCounts(1).toDouble / pairCounts(0)}%.2f× (n² would be 16×)")
  }

  test("rare-shingle kinship edges grow ~linearly (df-bounded self-join)") {
    // The q413/q417/q418 wedge-audit graph: every shingle group is
    // capped at dfMax docs BEFORE the self-join, so edges per shingle
    // are ≤ C(4,2) and total edges track the number of df ∈ [2,4]
    // shingles — which grows with the corpus, not its square.
    def edges(dir: String): Double =
      Dedup.rareShingleEdges(Tables.documents(spark, dir), "doc_id", "text")
        .count().toDouble
    assertSubQuadratic("rareShingleEdges", edges(sfSmall), edges(sfBig))
  }
}
