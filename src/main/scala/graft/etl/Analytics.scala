package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics suite (SURVEY.md §2.5 A3-A8, §2.7 O1-O4; reference
  * `key_players_table` py:610-645, `key_capacity_interval` py:664-689).
  *
  * Money sums run on DECIMAL (exact, order-independent) and only the final
  * presentation casts to double — double summation is shuffle-order
  * dependent and would not reproduce across engines or cluster runs.
  */
object Analytics {

  /** Exact order-independent sum of a double money expression. */
  def exactSum(c: Column): Column = sum(c.cast("decimal(18,6)"))

  /** Group sums + share-of-total percent. `valueExpr` is summed exactly
    * (decimal); `sumCol` stays decimal for downstream exactness, `shareCol`
    * is a double percentage. The grand total is an unpartitioned window
    * over the ALREADY-AGGREGATED table (≤ #groups rows) — single-partition
    * is fine at that altitude and, unlike a 1-row-aggregate crossJoin, it
    * doesn't re-execute the fact scan + join a second time (exchange reuse
    * only shares the shuffle, not the post-shuffle agg). The heavy
    * fact-side aggregation stays partial/map-side combined. */
  def sharesTable(
      df: DataFrame,
      groupCol: String,
      valueExpr: Column,
      shareCol: String = "share",
      sumCol: String = "total_value"): DataFrame =
    df.groupBy(col(groupCol)).agg(exactSum(valueExpr).as(sumCol))
      .withColumn("__grand", sum(col(sumCol)).over(Window.partitionBy()))
      .withColumn(shareCol,
        col(sumCol).cast("double") / col("__grand").cast("double") * 100)

  /** Cumulative-share long-tail regroup (A5, py:622-630): ascending-share
    * cumsum; groups whose cumulative share stays under `cutPct` are
    * relabeled `otherLabel` and re-aggregated; share is recomputed from the
    * exact sums (never sum the float shares). The cumsum window runs over
    * the already-aggregated table (≤ #groups rows), so the single-partition
    * window is fine at any fact-table scale. Expects `sharesTable` output
    * (still carrying `__grand`). */
  def regroupLongTail(
      shares: DataFrame,
      groupCol: String,
      sumCol: String,
      shareCol: String,
      cutPct: Double = 20.0,
      otherLabel: String = "OTHERS"): DataFrame = {
    val w = Window.orderBy(col(shareCol).asc, col(groupCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    shares
      .withColumn("__cum", sum(col(shareCol)).over(w))
      .withColumn(groupCol,
        when(col("__cum") < cutPct, otherLabel).otherwise(col(groupCol)))
      .groupBy(col(groupCol))
      .agg(sum(col(sumCol)).as(sumCol), first(col("__grand")).as("__grand"))
      .withColumn(shareCol,
        col(sumCol).cast("double") / col("__grand").cast("double") * 100)
  }

  /** Move designated labels (OTHERS/UNKNOWN) to the bottom, rest by share
    * desc (O4, py:638-645). Returns an ORDER-BY key column. */
  def bottomLabelsKey(groupCol: String, labels: Seq[String]): Column =
    labels.zipWithIndex.foldLeft(lit(0)) { case (acc, (l, i)) =>
      when(col(groupCol) === l, i + 1).otherwise(acc)
    }

  /** Top-k groups by exact-summed value (O3, py:693). Deterministic:
    * decimal value desc then key; Spark plans ordered-limit as TakeOrdered
    * (per-partition top-k, no global sort). */
  def topK(df: DataFrame, groupCol: String, valueExpr: Column, k: Int): DataFrame =
    df.groupBy(col(groupCol)).agg(exactSum(valueExpr).as("__tv"))
      .orderBy(col("__tv").desc, col(groupCol).asc)
      .limit(k)
      .select(col(groupCol), col("__tv").cast("double").as("total_value"))
}
