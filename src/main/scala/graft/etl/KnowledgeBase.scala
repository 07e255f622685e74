package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Knowledge-base (dimension) tables for the customs pipeline and their
  * maintenance ops (SURVEY.md §1.1, §2.10).
  *
  * In the reference these load from xlsx (notebook cells 14/24); here they
  * are plain DataFrames the caller supplies (parquet/CSV/literal). The
  * sample tables below are small synthetic stand-ins with the same SHAPE
  * (brand, model, capacity, type, model_ref, hp / brand, model_regex,
  * capacity_regex, category, starting_point) for tests and demos.
  */
object KnowledgeBase {

  /** Normalize a model KB: derive `model_ref` (normalized model string) and
    * `ref_order` (row precedence for J1's first-match tie-break), mirroring
    * `data_preperation`'s KB half (py:46-58). */
  def prepareModelKb(kb: DataFrame): DataFrame =
    kb.withColumn("model_ref", Normalize.collapseWs(Normalize.preProcess(col("model"))))
      .withColumn("ref_order", monotonically_increasing_id())

  /** K1 `update_regex_df` (py:435-447): append new patterns, dedup on
    * (brand, model_regex), longer patterns first (priority column — in
    * Spark ordering is a tie-break key, not an iteration order). */
  def updateRegexKb(kb: DataFrame, fresh: DataFrame): DataFrame =
    kb.unionByName(fresh, allowMissingColumns = true)
      .dropDuplicates("brand", "model_regex")
      .withColumn("priority", -length(col("model_regex")))

  /** Raw rows of the sample model KB — shared by `sampleModelKb` and the
    * q40 full-pipeline DuckDB oracle (queries.Q40Oracle), which re-derives
    * the same VALUES table so both engines see one source of truth. */
  val sampleModelKbRows: Seq[(String, String, Double, String, Double)] = Seq(
    ("KOMATSU", "PC200-8", 20.0, "EXCAVATOR", 148.0),
    ("KOMATSU", "PC78US-6N0", 7.8, "EXCAVATOR", 68.0),
    ("KOMATSU", "PC2000", 200.0, "EXCAVATOR", 976.0),
    ("SANY", "SY215C", 21.5, "EXCAVATOR", 158.0),
    ("SANY", "SY55C", 5.5, "EXCAVATOR", 58.0),
    ("HITACHI", "ZX200", 20.0, "EXCAVATOR", 150.0),
    ("HITACHI", "ZX330", 33.0, "EXCAVATOR", 250.0),
    ("CATERPILLAR", "320D", 20.0, "EXCAVATOR", 146.0),
    ("XCMG", "XE215C", 21.5, "EXCAVATOR", 160.0),
    ("GROVE", "RT765E", 60.0, "ROUGH-TERRAIN CRANE", 0.0))

  /** Small synthetic model KB (same shape as notebook cell 16). */
  def sampleModelKb(spark: SparkSession): DataFrame = {
    import spark.implicits._
    sampleModelKbRows.toDF("brand", "model", "capacity", "type", "hp")
  }

  /** Raw rows of the sample regex KB (see `sampleModelKbRows`). */
  val sampleRegexKbRows: Seq[(String, String, String, String, Int)] = Seq(
    ("KOMATSU", "PC ?\\d{2,4}(-\\d)?", "PC ?(\\d{2,4})", "EXCAVATOR", 0),
    ("SANY", "SY ?\\d{2,3}[A-Z]?", "SY ?(\\d{2,3})", "EXCAVATOR", 0),
    ("HITACHI", "ZX ?\\d{2,3}", "ZX ?(\\d{2,3})", "EXCAVATOR", 3),
    ("XCMG", "XE ?\\d{2,3}[A-Z]?", "XE ?(\\d{2,3})", "EXCAVATOR", 0),
    ("CATERPILLAR", "3\\d{2}[A-Z]{0,2}", "(3\\d{2})", "EXCAVATOR", 2))

  /** Small synthetic regex KB (same shape as notebook cell 27; the
    * starting_point codes follow cell 28's documented semantics). */
  def sampleRegexKb(spark: SparkSession): DataFrame = {
    import spark.implicits._
    sampleRegexKbRows.toDF("brand", "model_regex", "capacity_regex", "category", "starting_point")
  }

  /** Monthly USD→CNY rates shaped like the reference's dict (py:322-323). */
  def sampleRates(spark: SparkSession): DataFrame =
    Rates.rateTable(spark,
      for { y <- 2022 to 2024; m <- 1 to 12 } yield (y, m, 6.7 + (y - 2022) * 0.2 + m * 0.005))
}
