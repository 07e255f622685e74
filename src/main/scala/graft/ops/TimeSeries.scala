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
}
