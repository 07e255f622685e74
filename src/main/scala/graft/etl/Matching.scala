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
}
