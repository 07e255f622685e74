package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rank-based (distribution-free) hypothesis tests — the A/B and
  * cohort-comparison tools for metrics too skewed/ordinal for the
  * normal-theory tests (q232 z-test, q247 ANOVA F): Mann–Whitney U
  * (Mann & Whitney 1947), Kruskal–Wallis H (1952), and Kendall's W
  * coefficient of concordance (Kendall & Babington Smith 1939) for
  * multi-judge ranking agreement (the ORDINAL cousin of
  * [[Agreement]]'s nominal coefficients).
  *
  * All three need tie-averaged ranks over a data-scaled frame — the
  * textbook single-partition `rank() OVER (ORDER BY v)` trap. Here
  * ranks come from the value-domain ECDF instead: ONE partial-
  * combining (value, count) aggregate, the distributed prefix-sum
  * hatch ([[Ranks.runningSums]] — or [[Ranks.runningSumsBy]] per
  * judge for W), and the identity
  *
  *   2·avgrank(v) = 2·(cum(≤v) − c(v)) + c(v) + 1
  *
  * kept in INTEGER "doubled-rank" space so every rank sum is an exact
  * decimal — no float enters until the final statistic. Tie terms
  * Σ(t³ − t) accumulate as exact DECIMAL(38,0) (t³ overflows a long
  * once a value repeats ~2e6 times). The single divisions at the end
  * are double, round-6, in one fixed order an oracle replays.
  *
  * Scale shape per test: one shuffle over the fact to (value[, group])
  * counts, the prefix-sum hatch over the value domain, one
  * value-keyed join of the (group, value) count table against the
  * rank table, and partial-combining per-group sums. No unbounded
  * windows, no driver loops. */
object RankTests {

  private def d(c: Column) = c.cast("double")
  private def dec9(c: Column) = round(c, 9).cast("decimal(28,9)")

  /** (value table (__v, __c, __ar2), 1-row totals (__n, __tie)) where
    * __ar2 = 2·tie-averaged-rank of __v and __tie = Σ(c³ − c). */
  private def valueRanks(pts: DataFrame): (DataFrame, DataFrame) = {
    val vc = pts.groupBy(col("__v")).agg(count(lit(1)).as("__c"))
      .localCheckpoint(false) // consumers: the prefix-sum chain + totals
    val run = Ranks.runningSums(vc, Seq("__c" -> "__cum"), None, col("__v"))
    val ar2 = run.df.select(col("__v"), col("__c"),
      ((col("__cum") - col("__c")) * 2 + col("__c") + 1).as("__ar2"))
    val cd = col("__c").cast("decimal(12,0)")
    // coalesced so an EMPTY value domain (e.g. all-zero signed-rank
    // diffs) yields (0, 0) rather than nulls
    val tot = vc.agg(
      coalesce(sum(col("__c")), lit(0L)).as("__n"),
      coalesce(sum((cd * cd * cd - cd).cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("__tie"))
    (ar2, tot)
  }

  /** exact decimal rank sum Σ gc·ar2 (doubled-rank space) */
  private def r2Sum =
    sum((col("__gc").cast("decimal(12,0)") *
      col("__ar2").cast("decimal(19,0)")).cast("decimal(38,1)")).as("__r2")

  /** Mann–Whitney U (Wilcoxon rank-sum), tie-corrected normal
    * approximation. `groupA` is a boolean column splitting the rows;
    * output, 1 row: (n_a, n_b, rank_sum_a, u_a, u_b, z) with
    *
    *   U_a = R_a − n_a(n_a+1)/2,
    *   z = (U_a − n_a n_b/2) / √(n_a n_b/12 · ((N+1) − Σ(t³−t)/(N(N−1))))
    *
    * z is NULL when the variance degenerates (everything tied). No
    * continuity correction (callers comparing to scipy: use
    * `use_continuity=False`). Also emits the rank-biserial effect size
    * (≡ Cliff's δ under ties-split-evenly): r = 2U_a/(n_a n_b) − 1 —
    * the magnitude the z-score's sample-size dependence hides. */
  def mannWhitneyU(df: DataFrame, valueCol: Column,
      groupA: Column): DataFrame = {
    val pts = df.select(valueCol.cast("double").as("__v"),
        groupA.as("__a"))
      .filter(col("__v").isNotNull && col("__a").isNotNull)
      .localCheckpoint(false) // consumers: value ranks + group counts
    val (ar2, tot) = valueRanks(pts)
    val gc = pts.groupBy(col("__v"), col("__a"))
      .agg(count(lit(1)).as("__gc"))
    val rg = gc.join(ar2, "__v").groupBy(col("__a"))
      .agg(sum(col("__gc")).as("__ng"), r2Sum)
    // one conditional aggregate over the ≤2-row group table (the
    // wilcoxon sign-class shape): an EMPTY group yields NULL n/rank
    // sums — and so NULL u/z downstream — instead of zero output rows,
    // matching the all-tied degenerate convention and the oracle's
    // scalar subqueries
    val ra = rg.agg(
      sum(when(col("__a"), col("__ng"))).as("__na"),
      sum(when(!col("__a"), col("__ng"))).as("__nb"),
      sum(when(col("__a"), col("__r2"))).as("__r2a"))
    // 2U_a = R2_a − 2·n_a(n_a+1)/2 stays integral; halve once, in double
    ra.crossJoin(tot)
      .withColumn("__ua",
        (d(col("__r2a")) - d(col("__na")) * (d(col("__na")) + 1)) / 2.0)
      .withColumn("__var",
        d(col("__na")) * d(col("__nb")) / 12.0 *
          ((d(col("__n")) + 1) -
            d(col("__tie")) / (d(col("__n")) * (d(col("__n")) - 1))))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"),
        round(d(col("__r2a")) / 2.0, 6).as("rank_sum_a"),
        round(col("__ua"), 6).as("u_a"),
        round(d(col("__na")) * d(col("__nb")) - col("__ua"), 6).as("u_b"),
        round(lit(2.0) * col("__ua") / (d(col("__na")) * d(col("__nb"))) -
          1.0, 6).as("rank_biserial"),
        when(col("__var") > 0, round(
          (col("__ua") - d(col("__na")) * d(col("__nb")) / 2.0) /
            sqrt(col("__var")), 6)).as("z"))
  }

  /** Wilcoxon signed-rank test over PAIRED differences (Wilcoxon
    * 1945): the matched-samples cousin of [[mannWhitneyU]] — zeros
    * drop (the standard convention), |d| ranks tie-average via the
    * same value-domain ECDF hatch, and
    *
    *   W⁺ = Σ ranks of d > 0,  μ = n(n+1)/4,
    *   σ² = n(n+1)(2n+1)/24 − Σ(t³−t)/48
    *
    * give the tie-corrected normal approximation. NULL z when σ²
    * degenerates. Output, 1 row: (n, n_zero, w_plus, w_minus, z). */
  def wilcoxonSignedRank(df: DataFrame, diffCol: Column): DataFrame = {
    val pts0 = df.select(diffCol.cast("double").as("__d"))
      .filter(col("__d").isNotNull)
      .localCheckpoint(false) // consumers: zero count + the rank chain
    val zeros = pts0.agg(coalesce(
      sum(when(col("__d") === 0.0, 1L).otherwise(0L)), lit(0L)).as("n_zero"))
    val pts = pts0.filter(col("__d") =!= 0.0)
      .select(abs(col("__d")).as("__v"), (col("__d") > 0).as("__pos"))
      .localCheckpoint(false) // consumers: value ranks + signed sums
    val (ar2, tot) = valueRanks(pts)
    val gc = pts.groupBy(col("__v"), col("__pos"))
      .agg(count(lit(1)).as("__gc"))
    // either sign class may be empty — one conditional aggregate over
    // the ≤2-row signed table, null-coalesced to 0
    val zeroDec = lit(0).cast("decimal(38,1)")
    val sg = gc.join(ar2, "__v").groupBy(col("__pos")).agg(r2Sum)
      .agg(coalesce(sum(when(col("__pos"), col("__r2"))), zeroDec)
          .as("__r2p"),
        coalesce(sum(when(!col("__pos"), col("__r2"))), zeroDec)
          .as("__r2m"))
    val nD = d(col("__n"))
    sg.crossJoin(tot).crossJoin(zeros)
      .withColumn("__wp", d(col("__r2p")) / 2.0)
      .withColumn("__mu", nD * (nD + 1) / 4.0)
      .withColumn("__var",
        nD * (nD + 1) * (lit(2.0) * nD + 1) / 24.0 -
          d(col("__tie")) / 48.0)
      .select(col("__n").as("n"), col("n_zero"),
        round(col("__wp"), 6).as("w_plus"),
        round(d(col("__r2m")) / 2.0, 6).as("w_minus"),
        when(col("__var") > 0,
          round((col("__wp") - col("__mu")) / sqrt(col("__var")), 6)).as("z"))
  }

  /** Kruskal–Wallis H across the groups of `groupCol`, with the tie
    * correction C = 1 − Σ(t³−t)/(N³−N); output, 1 row:
    * (k, n, h, tie_correction, h_corrected). h_corrected NULL when C
    * degenerates to 0 (every value identical). */
  def kruskalWallis(df: DataFrame, valueCol: Column,
      groupCol: Column): DataFrame = {
    val pts = df.select(valueCol.cast("double").as("__v"),
        groupCol.as("__g"))
      .filter(col("__v").isNotNull && col("__g").isNotNull)
      .localCheckpoint(false) // consumers: value ranks + group counts
    val (ar2, tot) = valueRanks(pts)
    val gc = pts.groupBy(col("__v"), col("__g"))
      .agg(count(lit(1)).as("__gc"))
    val rg = gc.join(ar2, "__v").groupBy(col("__g"))
      .agg(sum(col("__gc")).as("__ng"), r2Sum)
    // per-group term (R_g²/n_g), 9-dp fixed point so the cross-group
    // sum is order-independent
    val term = dec9((d(col("__r2")) / 2.0) * (d(col("__r2")) / 2.0) /
      d(col("__ng")))
    val ag = rg.agg(count(lit(1)).as("k"), sum(term).as("__st"))
    ag.crossJoin(tot)
      .withColumn("__h",
        lit(12.0) / (d(col("__n")) * (d(col("__n")) + 1)) * d(col("__st")) -
          lit(3.0) * (d(col("__n")) + 1))
      .withColumn("__c",
        lit(1.0) - d(col("__tie")) /
          (d(col("__n")) * d(col("__n")) * d(col("__n")) - d(col("__n"))))
      .select(col("k"), col("__n").as("n"), round(col("__h"), 6).as("h"),
        round(col("__c"), 6).as("tie_correction"),
        when(col("__c") > 0, round(col("__h") / col("__c"), 6))
          .as("h_corrected"))
  }

  /** Kendall's W — concordance of m judges each ranking the SAME n
    * items (one row per (judge, item); completeness is `require`d,
    * m·n rows exactly). Ranks are tie-averaged WITHIN each judge via
    * the grouped prefix-sum hatch, so a judge's item set never
    * collapses to one task. Output, 1 row: (m, n, s, w) with
    *
    *   S = Σ_i (R_i − m(n+1)/2)²,
    *   W = 12S / (m²(n³−n) − m·Σ_j Σ(t³−t))
    *
    * (the tie-corrected form; W NULL when the denominator is 0 —
    * fewer than 2 items or all ranks tied for every judge). */
  def kendallW(df: DataFrame, judgeCol: Column, itemCol: Column,
      valueCol: Column): DataFrame = {
    val cell = df.select(judgeCol.as("__j"), itemCol.as("__it"),
        valueCol.cast("double").as("__v"))
      .filter(col("__j").isNotNull && col("__it").isNotNull &&
        col("__v").isNotNull)
      .localCheckpoint(eager = true) // consumers: shape check, ranks, join
    val shape = cell.agg(countDistinct(col("__j")).as("m"),
      countDistinct(col("__it")).as("n"), count(lit(1)).as("c")).collect()(0)
    val (m, n, cnt) = (shape.getLong(0), shape.getLong(1), shape.getLong(2))
    require(m >= 2, s"kendallW needs >= 2 judges, got $m")
    require(cnt == m * n,
      s"kendallW needs COMPLETE rankings: $m judges x $n items = " +
        s"${m * n} cells, got $cnt rows (missing or duplicate " +
        "(judge, item) cells)")
    val jvc = cell.groupBy(col("__j"), col("__v")).agg(count(lit(1)).as("__c"))
      .localCheckpoint(false) // consumers: grouped prefix sums + tie totals
    val ar2 = Ranks.runningSumsBy(jvc, Seq("__j"), Seq("__c" -> "__cum"),
        col("__v"))
      .select(col("__j"), col("__v"),
        ((col("__cum") - col("__c")) * 2 + col("__c") + 1).as("__ar2"))
    val cd = col("__c").cast("decimal(12,0)")
    val tie = jvc.agg(sum((cd * cd * cd - cd).cast("decimal(38,0)")).as("__tie"))
    // R2_i = Σ_j ar2 ≤ m(2n+1) — a long; dev2 = 2R_i − m(n+1) integral
    val ri = cell.join(ar2, Seq("__j", "__v"))
      .groupBy(col("__it")).agg(sum(col("__ar2")).as("__r2"))
    val dev2 = (col("__r2") - lit(m) * lit(n + 1)).cast("decimal(19,0)")
    val s4 = ri.agg(sum((dev2 * dev2).cast("decimal(38,0)")).as("__s4"))
    val nD = n.toDouble
    val denom = lit(m.toDouble) * m * (nD * nD * nD - nD) -
      lit(m.toDouble) * d(col("__tie"))
    s4.crossJoin(tie)
      .select(lit(m).as("m"), lit(n).as("n"),
        round(d(col("__s4")) / 4.0, 6).as("s"),
        when(denom > 0, round(lit(3.0) * d(col("__s4")) / denom, 6)).as("w"))
  }

  /** Friedman test (Friedman 1937) — "do the k treatments differ?"
    * over complete blocks, the repeated-measures cousin of
    * [[kruskalWallis]] (which assumes independent groups): each judge/
    * block ranks the same n items, and the tie-corrected statistic
    * falls out of [[kendallW]]'s concordance by the standard identity
    *
    *   χ²_F = m·(n − 1)·W,   df = n − 1
    *
    * (m blocks, n treatments), so this reuses kendallW's whole
    * value-domain rank hatch, tie correction, and COMPLETE-rankings
    * contract verbatim — one code path, two published statistics. χ²
    * composes from the round-6 W (one multiply, re-rounded 6 — the
    * fixed order the oracle replays). NULL χ²/df when W degenerates
    * (all-tied rows). Output, 1 row: (m, n, w, chi2_f, df). */
  def friedman(df: DataFrame, judgeCol: Column, itemCol: Column,
      valueCol: Column): DataFrame = {
    kendallW(df, judgeCol, itemCol, valueCol)
      .select(col("m"), col("n"), col("w"),
        round(col("m").cast("double") * (col("n") - 1).cast("double") *
          col("w"), 6).as("chi2_f"),
        when(col("w").isNotNull, (col("n") - 1).cast("long")).as("df"))
  }

  /** Hodges–Lehmann location-shift estimator (Hodges & Lehmann 1963)
    * between two groups: the median of ALL pairwise differences
    * a − b (a ∈ A, b ∈ B) — the robust "how big is the shift?" effect
    * size in original units that [[mannWhitneyU]]'s z/rank-biserial
    * can't give. Median convention: the W = n_a·n_b differences sorted;
    * odd W takes the middle, even W averages the two middles.
    *
    * The n_a·n_b pair blow-up never materializes: both groups reduce to
    * VALUE-DOMAIN count tables, their |dom_A|·|dom_B| cross join (the
    * contract bound — integer/banded metrics keep domains far below the
    * fact; same envelope class as q461's pair sample) carries
    * count-product weights, and the two middle elements fall out of
    * conditional mins over the [[Ranks.runningSums]] prefix of the
    * difference domain. All arithmetic is integral until the final
    * halving. Output, 1 row: (n_a, n_b, n_pairs, hl_shift); NULLs when
    * either group is empty (the [[mannWhitneyU]] degenerate
    * convention). */
  def hodgesLehmann(df: DataFrame, valueCol: Column,
      groupA: Column): DataFrame = {
    val pts = df.select(
        Profile.integralLong(valueCol, "hodgesLehmann").as("__v"),
        groupA.as("__a"))
      .filter(col("__v").isNotNull && col("__a").isNotNull)
      .localCheckpoint(false) // consumers: the two domain tables + counts
    val da = pts.filter(col("__a")).groupBy(col("__v"))
      .agg(count(lit(1)).as("__ca"))
    val db = pts.filter(!col("__a")).groupBy(col("__v"))
      .agg(count(lit(1)).as("__cb"))
    val dw = da.crossJoin(db.withColumnRenamed("__v", "__vb"))
      .select((col("__v") - col("__vb")).as("__d"),
        (col("__ca") * col("__cb")).as("__w"))
      .groupBy(col("__d")).agg(sum(col("__w")).cast("long").as("__w"))
    val cum = Ranks.runningSums(dw, Seq("__w" -> "__cum"), None,
      col("__d")).df
    // total pair count from the 1-row group-count aggregate (always one
    // row, NULL-armed for an empty side)
    val nn = pts.agg(
      sum(when(col("__a"), 1L)).as("__na"),
      sum(when(!col("__a"), 1L)).as("__nb"))
    val w = col("__na") * col("__nb")
    // middle positions in PURE long arithmetic (Spark's `/` on longs is
    // double division — a 2^53+ pair count would lose exactness):
    // lo = ⌈W/2⌉ = (W+1)>>1, hi = ⌊W/2⌋+1
    val mids = cum.crossJoin(nn).agg(
      min(when(col("__cum") >= shiftright(w + 1, 1), col("__d"))).as("__lo"),
      min(when(col("__cum") >= shiftright(w, 1) + 1, col("__d"))).as("__hi"))
    nn.crossJoin(mids).select(
      col("__na").as("n_a"), col("__nb").as("n_b"),
      w.as("n_pairs"),
      ((col("__lo") + col("__hi")).cast("double") / 2.0).as("hl_shift"))
  }

  /** Jonckheere–Terpstra ordered-alternative trend test (Terpstra 1952;
    * Jonckheere 1954): does the metric INCREASE across ORDERED groups
    * g₁ < … < g_k (dose classes, priority tiers, quality buckets)? —
    * strictly sharper than [[kruskalWallis]] when the alternative is
    * monotone. J = Σ_{i<j} #(x∈gᵢ < y∈gⱼ) + ½·#(x = y), with the
    * tie-corrected null moments (Hollander & Wolfe):
    *
    *   μ = (N² − Σnᵢ²)/4,
    *   σ² = T₁/72 + T₂/(36·N(N−1)(N−2)) + T₃/(8·N(N−1)),
    *   T₁ = N(N−1)(2N+5) − Σnᵢ(nᵢ−1)(2nᵢ+5) − Σt_v(t_v−1)(2t_v+5),
    *   T₂ = Σnᵢ(nᵢ−1)(nᵢ−2) · Σt_v(t_v−1)(t_v−2),
    *   T₃ = Σnᵢ(nᵢ−1) · Σt_v(t_v−1).
    *
    * The Σ_{i<j} pair walk never runs: with per-(group, value) counts,
    * 2J = Σ_{(j,v)} c_j(v)·(2·A_j(v) + B_j(v)) where B_j(v) = Σ_{i<j}
    * cᵢ(v) (lower-group mass AT v) and A_j(v) = Σ_{u<v} B_j(u) (lower-
    * group mass BELOW v) — a 2-D prefix built as (1) one broadcast
    * inequality join of the count table against the ≤`maxGroups`-row
    * group list, (2) a DENSIFIED k×|domain| grid (so A exists at every
    * value the j-group occupies), (3) [[Ranks.runningSumsBy]] per
    * group over the value domain. Everything stays integral in doubled
    * space; moment sums are exact DECIMAL(38,0); z divides once,
    * round-6. Output, 1 row: (k_groups, n, j_stat, mu, z); NULL z when
    * σ² degenerates. */
  def jonckheereTerpstra(df: DataFrame, valueCol: Column,
      groupOrdCol: Column, maxGroups: Int = 64): DataFrame = {
    require(maxGroups >= 2 && maxGroups <= 1024,
      s"maxGroups in [2, 1024], got $maxGroups")
    val pts = df.select(valueCol.cast("double").as("__v"),
        groupOrdCol.cast("long").as("__g"))
      .filter(col("__v").isNotNull && col("__g").isNotNull)
    val gvc = pts.groupBy(col("__g"), col("__v"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(false) // consumers: group list, grid, J join, moments
    val gd = gvc.select(col("__g")).distinct()
      .localCheckpoint(false) // consumers: the bound check + two joins
    val k = gd.count()
    require(k <= maxGroups, s"jonckheereTerpstra: $k ordered groups " +
      s"exceed the maxGroups=$maxGroups contract (the dense grid is " +
      "k×|value domain|) — bucket the group column first")
    val dv = gvc.select(col("__v")).distinct()
    // lower-group mass AT each value, per receiving group j
    val b = gvc.join(broadcast(gd.withColumnRenamed("__g", "__gj")),
        col("__g") < col("__gj"))
      .groupBy(col("__gj").as("__g"), col("__v"))
      .agg(sum(col("__c")).as("__bb"))
    // densify to the full k×domain grid so the prefix is defined at
    // every value the j-group occupies, then one grouped prefix sum
    val grid = dv.crossJoin(broadcast(gd))
      .join(b, Seq("__g", "__v"), "left")
      .select(col("__g"), col("__v"),
        coalesce(col("__bb"), lit(0L)).as("__b0"))
    val a = Ranks.runningSumsBy(grid, Seq("__g"),
        Seq("__b0" -> "__cle"), col("__v"))
      .select(col("__g"), col("__v"), col("__b0"),
        (col("__cle") - col("__b0")).as("__alt"))
    val j2 = gvc.join(a, Seq("__g", "__v"))
      .agg(coalesce(sum((col("__c") * (col("__alt") * 2 + col("__b0")))
        .cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as("__j2"))
    // exact integer moment ingredients over the group and value margins
    def m3(n: Column) = {
      val nd = n.cast("decimal(38,0)")
      (nd * (nd - 1) * (nd * 2 + 5),
        nd * (nd - 1) * (nd - 2),
        nd * (nd - 1))
    }
    val gn = gvc.groupBy(col("__g")).agg(sum(col("__c")).as("__n"))
    val gm = {
      val (a1, a2, a3) = m3(col("__n"))
      gn.agg(count(lit(1)).as("k_groups"),
        coalesce(sum(col("__n")), lit(0L)).as("__N"),
        coalesce(sum((col("__n").cast("decimal(38,0)") *
          col("__n")).cast("decimal(38,0)")), lit(0).cast("decimal(38,0)"))
          .as("__sn2"),
        coalesce(sum(a1.cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as("__g1"),
        coalesce(sum(a2.cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as("__g2"),
        coalesce(sum(a3.cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as("__g3"))
    }
    val tvc = gvc.groupBy(col("__v")).agg(sum(col("__c")).as("__t"))
    val tm = {
      val (b1, b2, b3) = m3(col("__t"))
      tvc.agg(
        coalesce(sum(b1.cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as("__t1"),
        coalesce(sum(b2.cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as("__t2"),
        coalesce(sum(b3.cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as("__t3"))
    }
    def dd(c: String) = col(c).cast("double")
    val nD = dd("__N")
    val jStat = dd("__j2") / 2.0
    val mu = (nD * nD - dd("__sn2")) / 4.0
    val t1 = (nD * (nD - 1) * (nD * 2 + 5) - dd("__g1") - dd("__t1")) / 72.0
    val t2 = when(col("__N") > 2,
      dd("__g2") * dd("__t2") / (lit(36.0) * nD * (nD - 1) * (nD - 2)))
      .otherwise(lit(0.0))
    val t3 = when(col("__N") > 1,
      dd("__g3") * dd("__t3") / (lit(8.0) * nD * (nD - 1)))
      .otherwise(lit(0.0))
    val v2 = t1 + t2 + t3
    j2.crossJoin(gm).crossJoin(tm)
      .select(col("k_groups"), col("__N").as("n"),
        round(jStat, 6).as("j_stat"), round(mu, 6).as("mu"),
        when(v2 > 0, round((jStat - mu) / sqrt(v2), 6)).as("z"))
  }
}
