package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Small lookup/inference operators rounding out SURVEY.md §2:
  * J8 (translation merge), J9 (literal band-join inference),
  * F10 (dict reverse lookup), B5 (crane lattice-boom refinement). */
object Lookups {

  /** J8 (cell 73): EN↔CN label translation — a broadcast left join on the
    * label column. `translations` carries (key, translated). */
  def translateLabels(df: DataFrame, keyCol: String, translations: DataFrame,
      outCol: String): DataFrame = {
    val dim = translations.select(col("key").as("__tk"), col("translated").as(outCol))
    df.join(broadcast(dim), col(keyCol) === col("__tk"), "left").drop("__tk")
  }

  /** J9 (py:479-491, Zoomlion block): infer (model, capacity, type) when a
    * row's unit weight falls within ±`tol` of a known model's nominal
    * weight. `specs`: (model, weight, capacity, type). Same band-join shape
    * as backward tagging, against a literal dim. */
  def inferFromWeight(df: DataFrame, weightCol: String, specs: DataFrame,
      tol: Double = 0.05): DataFrame = {
    val dim = specs.select(col("model").as("__sm"), col("weight").as("__sw"),
      col("capacity").as("__sc"), col("type").as("__st"))
    Matching.bestMatchJoin(df, Seq("__row_id"), dim,
      col(weightCol).isNotNull &&
        col(weightCol).between(col("__sw") * (1 - tol), col("__sw") * (1 + tol)),
      Seq(abs(col(weightCol) - col("__sw")).asc_nulls_last, col("__sm").asc_nulls_last),
      Map("__sm" -> "inferred_model", "__sc" -> "inferred_capacity",
        "__st" -> "inferred_type"))
  }

  /** F10 (py:471-491): reverse lookup — first key of a literal map whose
    * value equals `v` (the reference's `get_key_from_value`). */
  def reverseLookup(v: Column, m: Map[String, Double]): Column =
    m.toSeq.sortBy(_._1).reverse.foldLeft(lit(null).cast("string")) {
      case (acc, (k, value)) => when(v === value, k).otherwise(acc)
    }

  /** B5 (cell 37): capacity > 300 crawler cranes are lattice-boom. */
  def refineCraneType(df: DataFrame): DataFrame =
    df.withColumn("type",
      when(col("type") === "CRAWLER CRANE" && col("capacity") > 300,
        "CRAWLER CRANE (LATTICE_BOOM)").otherwise(col("type")))
}
