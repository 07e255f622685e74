package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset mixing: replicate each document per its source's epoch weight
  * (how pre-training mixtures up/down-weight sources — a weight of 2.5
  * means every doc appears twice and half of them a third time).
  *
  * repeats = ⌊w⌋ + (uniform(id) < frac(w) ? 1 : 0), with the uniform draw
  * the same md5-derived one the sampling/split operators use — so the
  * mixture is reproducible across runs, engines and cluster layouts, and
  * the fractional part selects a STABLE subset rather than a fresh random
  * one per epoch. Map-only: one explode, no shuffle. Weight 0 drops the
  * source entirely.
  */
object Mixing {

  def epochWeightedRepeat(df: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double], default: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(default)).forall(_ >= 0), "weights must be >= 0")
    val w: Column = coalesce(
      try_element_at(typedLit(weights), col(sourceCol)), lit(default))
    val base = floor(w).cast("int")
    val extra = (TextStats.hashUniform(col(idCol)) < (w - floor(w))).cast("int")
    val repeats = base + extra
    df.withColumn("__copies",
        when(repeats >= 1, sequence(lit(1), repeats)).otherwise(array().cast("array<int>")))
      .withColumn("copy", explode(col("__copies")))
      .drop("__copies")
  }
}
