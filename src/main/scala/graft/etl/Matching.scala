package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Containment-join matching (SURVEY.md §2.4 J1/J2).
  *
  * The reference hand-rolls these as O(N·dims) iterrows loops
  * (`data_processing_program_20240520.py:75-107`); here they are broadcast
  * theta-joins plus a window tie-break, so the fact side never shuffles:
  * the dimension is broadcast to every executor and the only exchange is
  * the (partition-local) window over the fact row id.
  */
object Matching {

  /** Join `fact` to the best-matching `dim` row under an arbitrary theta
    * `cond`, keeping exactly one dim row per fact row chosen by `tie`
    * (ascending; put `length(...).desc` first for longest-match semantics).
    *
    * `idCols` must uniquely identify a fact row. `keep` lists dim columns to
    * carry over (renamed via the map). Left-join semantics: unmatched fact
    * rows survive with nulls in the kept columns.
    *
    * Scale note: dim MUST be broadcastable (all reference dims are ≪ 10 MB).
    * The window partitions by the fact id, so with a unique id the sort is
    * per-row-group and cheap; no global sort, no fact-side shuffle beyond
    * the row_number exchange (which AQE coalesces).
    */
  def bestMatchJoin(
      fact: DataFrame,
      idCols: Seq[String],
      dim: DataFrame,
      cond: Column,
      tie: Seq[Column],
      keep: Map[String, String]): DataFrame = {
    val joined = fact.join(broadcast(dim), cond, "left")
    val w = Window.partitionBy(idCols.map(col): _*).orderBy(tie: _*)
    joined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .select(fact.columns.map(col) ++ keep.map { case (from, to) => col(from).as(to) }: _*)
  }

  /** First-match-in-reference-order containment join (J1: reference picks the
    * FIRST brand in df_ref row order, py:88). `dim` must carry `orderCol`. */
  def firstMatchJoin(
      fact: DataFrame,
      idCols: Seq[String],
      dim: DataFrame,
      cond: Column,
      orderCol: String,
      keep: Map[String, String]): DataFrame =
    bestMatchJoin(fact, idCols, dim, cond, Seq(col(orderCol).asc_nulls_last), keep)

  /** Longest-string containment join (J2: reference keeps the longest model,
    * py:99; equal lengths fall back to `matchCol` ascending for determinism). */
  def longestMatchJoin(
      fact: DataFrame,
      idCols: Seq[String],
      dim: DataFrame,
      cond: Column,
      matchCol: String,
      keep: Map[String, String]): DataFrame =
    bestMatchJoin(fact, idCols, dim, cond,
      Seq(length(col(matchCol)).desc_nulls_last, col(matchCol).asc_nulls_last), keep)

  // ─── Shuffle-free literal-expression path ─────────────────────────────
  //
  // A broadcast join already assumes the dimension fits in memory on every
  // executor. When it additionally fits on the driver at plan time (every
  // KB in the reference: hundreds of rows), the best-match lookup can be
  // compiled into a literal array expression instead: no join, no window,
  // NO EXCHANGE — the fact table is never shuffled, the whole match stays
  // inside one WholeStageCodegen span. At 100 TB this removes the only
  // full-fact shuffle of the matching phase.

  /** First entry (in the given order) contained in ANY of `texts`.
    * Null when none match. */
  def literalFirstMatch(texts: Seq[Column], entries: Seq[String]): Column = {
    val arr = array(entries.map(lit): _*)
    get(filter(arr, e => texts.map(_.contains(e)).reduce(_ || _)), lit(0))
  }

  /** Longest entry contained in `text` (ties → lexicographically first).
    * Null when none match. */
  def literalLongestMatch(text: Column, entries: Seq[String]): Column = {
    val sorted = entries.distinct.sortBy(e => (-e.length, e))
    get(filter(array(sorted.map(lit): _*), e => text.contains(e)), lit(0))
  }

  /** Longest match from a per-key candidate list (e.g. models of the
    * already-matched brand): `byKey` maps key → candidates. Null on
    * missing key or no match. */
  def literalKeyedLongestMatch(key: Column, text: Column,
      byKey: Map[String, Seq[String]]): Column = {
    val sortedMap = byKey.map { case (k, vs) => k -> vs.distinct.sortBy(e => (-e.length, e)) }
    get(filter(coalesce(try_element_at(typedLit(sortedMap), key),
      array().cast("array<string>")), e => text.contains(e)), lit(0))
  }
}
