package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator agreement statistics — the quality gate every
  * human-labeled preference/SFT corpus passes before its labels are
  * trusted (and the first diagnostic when rater pools drift).
  *
  * Two complementary coefficients:
  *
  *  - [[krippendorffAlpha]] (Krippendorff 2004, nominal metric) —
  *    handles MISSING ratings: items may carry any number of ratings
  *    ≥ 2, which is the real shape of crowdsourced labels (raters
  *    overlap on a sliding subset). α = 1 − D_o/D_e over the
  *    coincidence matrix.
  *  - [[fleissKappa]] (Fleiss 1971) — the fixed-panel form: exactly
  *    n raters per item (enforced with a loud `require`), the
  *    convention most labeling-vendor dashboards report.
  *
  * Rater IDENTITY never enters either statistic — only the multiset
  * of labels per item — so the input is simply (item, label) rows,
  * one per rating.
  *
  * Float discipline: everything until the final divisions is INTEGER
  * (per-item m_u, Σ_c n_uc² and label marginals — so partial-combining
  * aggregates carry exact values); the per-item disagreement ratio is
  * double-divided then 9-dp fixed-point summed as DECIMAL
  * (order-independent), matching the library-wide contract that a SQL
  * oracle replays bit-equal. Label-marginal squares accumulate as
  * DECIMAL(38,0) — n_c is corpus-sized, so n_c² overflows a long at
  * ~3e9 ratings per label.
  *
  * Scale shape: ONE partial-combining (item, label) count over the
  * ratings fact, then per-item and per-label partial-combining
  * aggregates over that bounded-fanout table (≤ |labels| rows per
  * item); the label marginal re-aggregates the SAME counted table
  * (item-keyed join back to restrict to included items). Everything
  * after runs on 1-row aggregates. No windows, no driver loops. */
object Agreement {

  private def d(c: org.apache.spark.sql.Column) = c.cast("double")
  private def dec9(c: org.apache.spark.sql.Column) =
    round(c, 9).cast("decimal(28,9)")

  /** (item, label) counts with per-item totals — the shared prologue.
    * Returns the counted table (__i, __l, __n) checkpointed for its two
    * consumers plus the per-item rollup (__i, __m, __s2). */
  private def counted(ratings: DataFrame, itemCol: String,
      labelCol: String): (DataFrame, DataFrame) = {
    val cnt = ratings
      .select(col(itemCol).as("__i"), col(labelCol).as("__l"))
      .filter(col("__i").isNotNull && col("__l").isNotNull)
      .groupBy(col("__i"), col("__l")).agg(count(lit(1)).as("__n"))
      .localCheckpoint(eager = true) // consumers: per-item + marginals
    val perItem = cnt.groupBy(col("__i"))
      .agg(sum(col("__n")).as("__m"),
        sum(col("__n") * col("__n")).as("__s2"))
    (cnt, perItem)
  }

  /** Krippendorff's alpha, nominal metric. `ratings` is one row per
    * rating; items with fewer than 2 ratings drop (they carry no
    * pairable information — the standard convention). Output, 1 row:
    * (n_items, n_ratings, n_labels, d_o, d_e, alpha).
    *
    *   D_o = (1/n) Σ_u (m_u² − Σ_c n_uc²)/(m_u − 1)
    *   D_e = (n² − Σ_c n_c²)/(n(n−1))      α = 1 − D_o/D_e */
  def krippendorffAlpha(ratings: DataFrame, itemCol: String,
      labelCol: String): DataFrame = {
    val (cnt, perItem) = counted(ratings, itemCol, labelCol)
    val inc = perItem.filter(col("__m") >= 2)
      .localCheckpoint(eager = true) // consumers: D_o agg + marginal join
    val od = inc.agg(
      count(lit(1)).as("n_items"),
      sum(col("__m")).as("n_ratings"),
      sum(dec9(d(col("__m") * col("__m") - col("__s2")) /
        d(col("__m") - 1))).as("__sd"))
    // label marginals over INCLUDED items only (the item-keyed join
    // back restricts the counted table; both sides are item-partitioned)
    val mg = cnt.join(inc.select(col("__i")), "__i")
      .groupBy(col("__l")).agg(sum(col("__n")).as("__nc"))
    val ed = mg.agg(count(lit(1)).as("n_labels"),
      sum((col("__nc").cast("decimal(19,0)") *
        col("__nc").cast("decimal(19,0)")).cast("decimal(38,0)")).as("__s2l"))
    val out = od.crossJoin(ed)
      .withColumn("__do", d(col("__sd")) / d(col("n_ratings")))
      .withColumn("__de",
        (d(col("n_ratings")) * d(col("n_ratings")) - d(col("__s2l"))) /
          (d(col("n_ratings")) * d(col("n_ratings") - 1)))
      .select(col("n_items"), col("n_ratings"), col("n_labels"),
        round(col("__do"), 6).as("d_o"),
        round(col("__de"), 6).as("d_e"),
        round(lit(1.0) - col("__do") / col("__de"), 6).as("alpha"))
    out
  }

  /** Fleiss' kappa: the fixed-panel agreement coefficient — every item
    * must carry exactly the same number of ratings n ≥ 2 (violations
    * raise; use [[krippendorffAlpha]] for ragged coverage). Output,
    * 1 row: (n_items, n_raters, n_labels, p_bar, p_e, kappa).
    *
    *   P_u = (Σ_c n_uc² − n)/(n(n−1))   P̄ = mean_u P_u
    *   p_c = n_c/(N·n)   P̄_e = Σ_c p_c²   κ = (P̄ − P̄_e)/(1 − P̄_e) */
  def fleissKappa(ratings: DataFrame, itemCol: String,
      labelCol: String): DataFrame = {
    val (cnt, perItem) = counted(ratings, itemCol, labelCol)
    val pi = perItem.localCheckpoint(eager = true) // consumers: require + agg
    val mm = pi.agg(min(col("__m")).as("lo"), max(col("__m")).as("hi"))
      .collect()(0)
    require(!mm.isNullAt(0) && mm.getLong(0) == mm.getLong(1) &&
      mm.getLong(0) >= 2,
      s"fleissKappa needs a CONSTANT rater count >= 2 per item; saw " +
        s"[${mm.get(0)}, ${mm.get(1)}] — use krippendorffAlpha for " +
        "ragged coverage")
    val od = pi.agg(
      count(lit(1)).as("n_items"),
      max(col("__m")).as("n_raters"),
      sum(dec9(d(col("__s2") - col("__m")) /
        d(col("__m") * (col("__m") - 1)))).as("__sp"))
    val mg = cnt.groupBy(col("__l")).agg(sum(col("__n")).as("__nc"))
    // p_c² accumulates as 9-dp decimal of a double ratio — n_c is
    // corpus-sized so the ratio (not n_c²) is the safe representation
    val ed = mg.crossJoin(od.select(
        (d(col("n_items")) * d(col("n_raters"))).as("__nn")))
      .agg(count(lit(1)).as("n_labels"),
        sum(dec9((d(col("__nc")) / col("__nn")) *
          (d(col("__nc")) / col("__nn")))).as("__pe"))
    val out = od.crossJoin(ed)
      .withColumn("__pbar", d(col("__sp")) / d(col("n_items")))
      .select(col("n_items"), col("n_raters"), col("n_labels"),
        round(col("__pbar"), 6).as("p_bar"),
        round(d(col("__pe")), 6).as("p_e"),
        round((col("__pbar") - d(col("__pe"))) /
          (lit(1.0) - d(col("__pe"))), 6).as("kappa"))
    out
  }

  /** Gwet's AC1 (Gwet 2008): the paradox-resistant twin of
    * [[fleissKappa]] — kappa collapses toward 0 when one label
    * dominates (the "high agreement, low kappa" trap every skewed
    * moderation corpus hits), because its chance term REWARDS marginal
    * imbalance; AC1's chance term penalizes it instead:
    *
    *   P_e^γ = (1/(K−1)) Σ_c π_c(1 − π_c),  π_c = n_c/(N·n)
    *   AC1 = (P̄ − P_e^γ)/(1 − P_e^γ)
    *
    * with P̄ the same observed agreement as Fleiss. Same fixed-panel
    * contract (constant raters per item, loud require) and the same
    * integer-until-the-ratio float discipline: π-terms are 9-dp fixed
    * point summed as DECIMAL, divided by (K−1) once. Scale shape:
    * identical to fleissKappa. Output, 1 row:
    * (n_items, n_raters, n_labels, p_bar, p_e_gamma, ac1). */
  def gwetAC1(ratings: DataFrame, itemCol: String,
      labelCol: String): DataFrame = {
    val (cnt, perItem) = counted(ratings, itemCol, labelCol)
    val pi = perItem.localCheckpoint(eager = true) // consumers: require + agg
    val mm = pi.agg(min(col("__m")).as("lo"), max(col("__m")).as("hi"))
      .collect()(0)
    require(!mm.isNullAt(0) && mm.getLong(0) == mm.getLong(1) &&
      mm.getLong(0) >= 2,
      s"gwetAC1 needs a CONSTANT rater count >= 2 per item; saw " +
        s"[${mm.get(0)}, ${mm.get(1)}] — use krippendorffAlpha for " +
        "ragged coverage")
    val od = pi.agg(
      count(lit(1)).as("n_items"),
      max(col("__m")).as("n_raters"),
      sum(dec9(d(col("__s2") - col("__m")) /
        d(col("__m") * (col("__m") - 1)))).as("__sp"))
    val mg = cnt.groupBy(col("__l")).agg(sum(col("__n")).as("__nc"))
    val ed = mg.crossJoin(od.select(
        (d(col("n_items")) * d(col("n_raters"))).as("__nn")))
      .agg(count(lit(1)).as("n_labels"),
        sum(dec9((d(col("__nc")) / col("__nn")) *
          (lit(1.0) - d(col("__nc")) / col("__nn")))).as("__spi"))
    od.crossJoin(ed)
      .withColumn("__pbar", d(col("__sp")) / d(col("n_items")))
      .withColumn("__peg",
        d(col("__spi")) / (d(col("n_labels")) - 1.0))
      .select(col("n_items"), col("n_raters"), col("n_labels"),
        round(col("__pbar"), 6).as("p_bar"),
        round(col("__peg"), 6).as("p_e_gamma"),
        when(col("n_labels") >= 2,
          round((col("__pbar") - col("__peg")) /
            (lit(1.0) - col("__peg")), 6)).as("ac1"))
  }

  /** Cronbach's alpha internal-consistency coefficient over COMPLETE
    * (subject × component) numeric scores — "do the k components
    * measure the same thing?", the multi-metric quality-panel gate
    * (e.g. k rubric dimensions scored per document: a low α says the
    * rubric rows disagree with their own total):
    *
    *   α = k/(k−1) · (1 − Σ_j s²_j / s²_total)
    *
    * with s²_j the sample variance of component j across subjects and
    * s²_total the sample variance of per-subject TOTAL scores. Scores
    * carry the integer-metric contract ([[Profile.integralLong]] —
    * loud on fractional input); every sum is exact DECIMAL(38,0), the
    * per-component variances are one mirrored double expression each,
    * 9-dp fixed-point summed across the k component rows. Completeness
    * (every subject scores every component exactly once) is enforced
    * with a loud require — the [[RankTests.kendallW]] contract.
    *
    * Scale shape: ONE (component)-keyed partial-combining aggregate +
    * ONE subject-keyed aggregate feeding a 1-row variance — subjects
    * scale with the corpus, components are the bounded panel. Output,
    * 1 row: (n_subjects, k_components, sum_var_components, var_total,
    * alpha ← round 6; NULL alpha when k < 2 or the total variance
    * degenerates). */
  def cronbachAlpha(ratings: DataFrame,
      subjectCol: org.apache.spark.sql.Column,
      componentCol: org.apache.spark.sql.Column,
      valueCol: org.apache.spark.sql.Column): DataFrame = {
    val cell = ratings.select(subjectCol.as("__s"), componentCol.as("__c"),
        Profile.integralLong(valueCol, "cronbachAlpha").as("__x"))
      .filter(col("__s").isNotNull && col("__c").isNotNull &&
        col("__x").isNotNull)
      .localCheckpoint(eager = true) // consumers: shape, comps, totals
    val shape = cell.agg(countDistinct(col("__s")).as("n"),
      countDistinct(col("__c")).as("k"), count(lit(1)).as("cells"))
      .collect()(0)
    val (n, k, cells) = (shape.getLong(0), shape.getLong(1), shape.getLong(2))
    require(n >= 2, s"cronbachAlpha needs >= 2 subjects, got $n")
    require(cells == n * k,
      s"cronbachAlpha needs COMPLETE scores: $n subjects x $k " +
        s"components = ${n * k} cells, got $cells (missing or duplicate)")
    val xd = col("__x").cast("decimal(38,0)")
    // per-component sample variance from exact sums, one 9-dp term each
    val perComp = cell.groupBy(col("__c"))
      .agg(sum(xd).as("__sx"), sum((xd * xd).cast("decimal(38,0)")).as("__qx"))
    def varOf(s: org.apache.spark.sql.Column, q: org.apache.spark.sql.Column,
        cnt: Double) =
      (q.cast("double") - s.cast("double") * (s.cast("double") / cnt)) /
        (cnt - 1.0)
    val sumVar = perComp.agg(
      sum(round(varOf(col("__sx"), col("__qx"), n.toDouble), 9)
        .cast("decimal(28,9)")).as("__sv"))
    // per-subject totals, then the 1-row total-score variance
    val perSubj = cell.groupBy(col("__s"))
      .agg(sum(xd).cast("decimal(38,0)").as("__t"))
    val totVar = perSubj.agg(
      sum(col("__t")).as("__st"),
      sum((col("__t") * col("__t")).cast("decimal(38,0)")).as("__qt"))
    val vt = varOf(col("__st"), col("__qt"), n.toDouble)
    sumVar.crossJoin(totVar)
      .select(lit(n).as("n_subjects"), lit(k).as("k_components"),
        round(col("__sv").cast("double"), 6).as("sum_var_components"),
        round(vt, 6).as("var_total"),
        // the ratio composes from the UNROUNDED variance expressions
        // (the display columns are rounded separately)
        when(lit(k) >= 2 && vt > 0.0,
          round((lit(k.toDouble) / (k - 1.0)) *
            (lit(1.0) - col("__sv").cast("double") / vt), 6)).as("alpha"))
  }
}
