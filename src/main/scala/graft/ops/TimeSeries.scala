package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-entity trailing-window features over an event log — the classic
  * feature-engineering shape ("events in the last hour", "spend in the
  * last 24 h") that feeds fraud/quality models and rate limiting.
  *
  * Scale shape: ONE shuffle on the (uniform) entity key, then one sort
  * per partition; the RANGE frame is computed with a sliding two-pointer
  * pass over each entity's sorted events, so cost is O(events) after the
  * sort regardless of window width. Events at the exact same instant are
  * frame PEERS (both included) — deterministic under any partitioning.
  * The window is anchored on epoch MICROseconds (exact integers; no
  * engine-specific timestamp-truncation edge). */
object TimeSeries {

  /** For every event: count and exact value-sum of the same entity's
    * events in `[ts − windowMicros, ts]`. Sum goes through
    * DECIMAL(18,6) — order-independent, so bit-stable across retries
    * and partitionings. Adds `n_win` and `sum_win`. */
  def trailing(events: DataFrame, entityCol: String, tsCol: String,
      valueCol: String, windowMicros: Long): DataFrame = {
    require(windowMicros > 0, "window must be positive")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowMicros, 0)
    events
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("sum_win",
        sum(col(valueCol).cast("decimal(18,6)")).over(w).cast("double"))
  }

  /** Daily gap-fill + forward-fill resample (pandas `asfreq('D').ffill()`
    * re-expressed relationally): per entity, generate the dense daily
    * date spine from its first to its last event day, left-join the
    * exact per-day value sums, and forward-fill missing days with the
    * most recent observed sum. Returns one row per (entity, day):
    * (entity, day, v_sum nullable-exact, v_filled forward-filled,
    * observed flag).
    *
    * Scale shape: the per-day agg and the min/max span are ONE entity-
    * day-keyed and ONE entity-keyed shuffle; the spine explodes
    * `sequence(first, last)` per entity — rows ∝ entities × span-days,
    * never event count; the fill is `last(_, ignoreNulls)` over one
    * entity-keyed window (running frame — a single sorted pass, no
    * per-row lookback scan). A pathological entity spanning decades
    * bounds its own spine (≈ 11 k rows per 30 years) — there is no
    * corpus-wide spine. Sums are DECIMAL(18,6), order-independent. */
  def resampleDailyFfill(events: DataFrame, entityCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = events
      .groupBy(col(entityCol), to_date(col(tsCol)).as("day"))
      .agg(sum(col(valueCol).cast("decimal(18,6)")).cast("double").as("v_sum"))
    val spine = events
      .groupBy(col(entityCol))
      .agg(min(to_date(col(tsCol))).as("__d0"), max(to_date(col(tsCol))).as("__d1"))
      .select(col(entityCol), explode(sequence(col("__d0"), col("__d1"))).as("day"))
    val w = Window.partitionBy(col(entityCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq(entityCol.replace("`", ""), "day"), "left")
      .withColumn("v_filled", last(col("v_sum"), ignoreNulls = true).over(w))
      .withColumn("observed", col("v_sum").isNotNull)
  }
}
