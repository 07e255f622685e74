package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Median-based outlier marking (SURVEY.md §2.5 A2; reference `mark_outliers`
  * `data_processing_program_20240520.py:287-316`).
  *
  * Shape: per-group EXACT median (Catalyst `percentile` — linear
  * interpolation, same as pandas and DuckDB `quantile_cont`) computed with a
  * partial-aggregating groupBy, then joined back. The medians table has one
  * row per group key, so at scale AQE turns the join-back into a broadcast
  * join — the fact side is never shuffled twice. A window-median would
  * instead sort every fact partition by key; groupBy+join is the 100TB plan.
  */
object Outliers {

  /** Add `outCol` ∈ {yes, no, unknown}: unknown when `unknownCond`; yes when
    * value ≥ hi×median or ≤ lo×median of its `keys` group; else no. */
  def markOutliers(
      df: DataFrame,
      valueCol: String,
      keys: Seq[String],
      unknownCond: Column,
      outCol: String = "outliers",
      lo: Double = 0.8,
      hi: Double = 1.2): DataFrame = {
    val med = df
      .filter(!unknownCond && col(valueCol).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(percentile(col(valueCol), lit(0.5)).as("__median"))
    val joined = df.join(med, keys, "left")
    joined
      .withColumn(outCol,
        when(unknownCond || col("__median").isNull, "unknown")
          .when(col(valueCol) >= col("__median") * hi ||
            col(valueCol) <= col("__median") * lo, "yes")
          .otherwise("no"))
      .drop("__median")
  }

  /** Term-scoped outlier marking (reference py:287-316 with term=True):
    * medians are computed per (`keys` + `termCol`) group — e.g. per
    * (brand, model, month) instead of all-time.
    *
    * Under documented INTENT this is exactly `markOutliers` with the term
    * appended to the keys. With `compat.termOutlierLowerBoundBug` the
    * reference's §2.12-4 behavior is reproduced: the upper bound compares
    * against the term-scoped median but the lower bound against the
    * all-terms `keys` median (py:304,312 omit the term filter). The bug
    * path joins back two one-row-per-group median tables — both broadcast
    * under AQE, so the fact side still shuffles zero times. */
  def markOutliersTerm(
      df: DataFrame,
      valueCol: String,
      keys: Seq[String],
      termCol: String,
      unknownCond: Column,
      outCol: String = "outliers",
      lo: Double = 0.8,
      hi: Double = 1.2,
      compat: CompatFlags = CompatFlags.intent): DataFrame =
    if (!compat.termOutlierLowerBoundBug)
      markOutliers(df, valueCol, keys :+ termCol, unknownCond, outCol, lo, hi)
    else {
      val clean = df.filter(!unknownCond && col(valueCol).isNotNull)
      val termMed = clean
        .groupBy((keys :+ termCol).map(col): _*)
        .agg(percentile(col(valueCol), lit(0.5)).as("__tmed"))
      val baseMed = clean
        .groupBy(keys.map(col): _*)
        .agg(percentile(col(valueCol), lit(0.5)).as("__bmed"))
      df.join(termMed, keys :+ termCol, "left")
        .join(baseMed, keys, "left")
        .withColumn(outCol,
          when(unknownCond || col("__tmed").isNull, "unknown")
            .when(col(valueCol) >= col("__tmed") * hi ||
              col(valueCol) <= col("__bmed") * lo, "yes")
            .otherwise("no"))
        .drop("__tmed", "__bmed")
    }

  /** Scale variant: approximate median via `percentile_approx` (a
    * TypedImperativeAggregate with map-side partial merge — unlike exact
    * `percentile` it never collects a full value list per group). At 100TB
    * with heavy-hitter groups (SANY ≈ 17% of rows in the golden output)
    * this is the one to run; `accuracy` trades error for state size. */
  def markOutliersApprox(
      df: DataFrame,
      valueCol: String,
      keys: Seq[String],
      unknownCond: Column,
      outCol: String = "outliers",
      lo: Double = 0.8,
      hi: Double = 1.2,
      accuracy: Int = 10000): DataFrame = {
    val med = df
      .filter(!unknownCond && col(valueCol).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(percentile_approx(col(valueCol), lit(0.5), lit(accuracy)).as("__median"))
    df.join(med, keys, "left")
      .withColumn(outCol,
        when(unknownCond || col("__median").isNull, "unknown")
          .when(col(valueCol) >= col("__median") * hi ||
            col(valueCol) <= col("__median") * lo, "yes")
          .otherwise("no"))
      .drop("__median")
  }
}
