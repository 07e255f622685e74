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
}
