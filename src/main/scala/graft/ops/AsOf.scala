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

  /** Forward as-of: for each `left` row, the single EARLIEST `right`
    * row of the same key with `right.rTs` ≥ `left.lTs` (inclusive) —
    * the "next event after" mirror of `asofBackward`, same union+window
    * shape (ONE key shuffle, no range explosion). Ties at the same
    * right timestamp resolve to the largest payload struct, exactly as
    * in the backward variant. */
  def asofForward(
      left: DataFrame, lKey: String, lTs: String,
      right: DataFrame, rKey: String, rTs: String,
      carry: Seq[String], outPrefix: String = "asof_"): DataFrame = {
    val payload = struct(col(rTs).as("__ts") +: carry.map(col): _*)
    val r = right.select(col(rKey).as("__k"), col(rTs).as("__t"),
      lit(0).as("__side"), payload.as("__p"))
    val l = left.withColumn("__k", col(lKey)).withColumn("__t", col(lTs))
      .withColumn("__side", lit(1))
    // walk time DESCENDING: the last right row seen before a left row is
    // the smallest right ts ≥ left ts; side 0 < 1 keeps equal-ts rights
    // visible to the left row (inclusive)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").desc, col("__side").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = r.unionByName(l, allowMissingColumns = true)
      .withColumn("__next", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    filled.select(
      left.columns.map(col) ++
        (carry.map(c => col(s"__next.$c").as(s"$outPrefix$c")) :+
          col("__next.__ts").as(s"$outPrefix$rTs")): _*)
  }

  /** Timestamp column as an orderable integer (epoch micros for
    * timestamps, plain long otherwise) — the distance arithmetic the
    * tolerance/nearest variants compare on. */
  private def tsNum(c: org.apache.spark.sql.Column,
      dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column =
    dt match {
      case _: org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))
      case _ => c.cast("long")
    }

  /** NEAREST as-of join with tolerance: for each left row, the right row
    * of the same key whose timestamp is CLOSEST to the left's (either
    * direction), at most `toleranceMicros` away; ties between an equally
    * distant past and future row resolve BACKWARD (the reproducible
    * choice — the past row was knowable at event time). All-null carry
    * when nothing lands inside the tolerance window.
    *
    * Shape: the same union+window formulation as `asofBackward` — ONE
    * shuffle on the key, then TWO within-partition sorts over it (the
    * backward pass wants right rows BEFORE left rows at equal ts, the
    * forward pass after; Spark plans one Exchange + two Sort/Window
    * pairs). Still no per-row range probe and no join explosion.
    *
    * Determinism on same-ts right rows: backward carries the LARGEST
    * payload struct, forward the SMALLEST (each direction's window order
    * pins it) — put a unique column first in `carry`. */
  def asofNearest(
      left: DataFrame, lKey: String, lTs: String,
      right: DataFrame, rKey: String, rTs: String,
      carry: Seq[String], toleranceMicros: Long,
      outPrefix: String = "asof_"): DataFrame = {
    require(toleranceMicros >= 0, "tolerance must be >= 0")
    val payload = struct(col(rTs).as("__ts") +: carry.map(col): _*)
    val r = right.select(col(rKey).as("__k"), col(rTs).as("__t"),
      lit(0).as("__side"), payload.as("__p"))
    val l = left.withColumn("__k", col(lKey)).withColumn("__t", col(lTs))
      .withColumn("__side", lit(1))
    // backward: right rows sort BEFORE left at equal ts (inclusive ≤)
    val wb = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: right rows sort AFTER left at equal ts (inclusive ≥)
    val wf = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").desc, col("__p").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val tsType = right.schema(rTs).dataType
    val unioned = r.unionByName(l, allowMissingColumns = true)
      .withColumn("__back", last(col("__p"), ignoreNulls = true).over(wb))
      .withColumn("__fwd", first(col("__p"), ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
    val lNum = tsNum(col("__t"), tsType)
    val bDist = lNum - tsNum(col("__back.__ts"), tsType)
    val fDist = tsNum(col("__fwd.__ts"), tsType) - lNum
    val bOk = col("__back").isNotNull && bDist <= toleranceMicros
    val fOk = col("__fwd").isNotNull && fDist <= toleranceMicros
    val chosen = unioned.withColumn("__pick",
      when(bOk && (!fOk || bDist <= fDist), col("__back"))
        .when(fOk, col("__fwd")))
    chosen.select(
      left.columns.map(col) ++
        (carry.map(c => col(s"__pick.$c").as(s"$outPrefix$c")) :+
          col("__pick.__ts").as(s"$outPrefix$rTs")): _*)
  }
}
