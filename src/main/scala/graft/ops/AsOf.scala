package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the temporal operator Spark's built-in joins
  * lack (the reference has no as-of joins either, SURVEY.md §2.4; this is
  * part of the training-data-pipeline surface, e.g. "state as of event
  * time" feature joins).
  *
  * Shape: the classic scalable union+window formulation — tag both sides,
  * ONE shuffle on the key, sort within the key by (ts, side, payload), and
  * carry the latest right payload forward with `last(_, ignoreNulls)`.
  * No per-row range probe, no O(left × right-per-key) join explosion: the
  * cost is a single repartition + per-key sort, which survives a 100×
  * scale-up as long as single keys fit a partition (skewed keys salt the
  * same way any window does).
  */
object AsOf {

  /** For each `left` row, attach the single latest `right` row of the same
    * key with `right.rTs` ≤ `left.lTs` (backward as-of, inclusive).
    *
    * Carried columns come back as `<outPrefix><col>` plus
    * `<outPrefix><rTs>` (the matched timestamp); all-null when no right
    * row precedes the left row.
    *
    * Determinism on ties: right rows at the same timestamp resolve to the
    * largest (ts, carry...) payload struct — put a unique column first in
    * `carry` to pin the winner.
    */
  def asofBackward(
      left: DataFrame, lKey: String, lTs: String,
      right: DataFrame, rKey: String, rTs: String,
      carry: Seq[String], outPrefix: String = "asof_"): DataFrame = {
    val payload = struct(col(rTs).as("__ts") +: carry.map(col): _*)
    val r = right.select(col(rKey).as("__k"), col(rTs).as("__t"),
      lit(0).as("__side"), payload.as("__p"))
    val l = left.withColumn("__k", col(lKey)).withColumn("__t", col(lTs))
      .withColumn("__side", lit(1))
    // right rows sort BEFORE left rows on equal ts (side 0 < 1) → inclusive
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = r.unionByName(l, allowMissingColumns = true)
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    filled.select(
      left.columns.map(col) ++
        (carry.map(c => col(s"__last.$c").as(s"$outPrefix$c")) :+
          col("__last.__ts").as(s"$outPrefix$rTs")): _*)
  }
}
