package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cluster-scale layout utilities: bucketing for co-located joins and
  * salting for skewed keys. Used by the 100TB deployment story (SURVEY
  * §4 "Physical concerns"); exercised by ScaleSpec.
  */
object Scale {

  /** Write `df` as a bucketed, sorted table: repeated equi-joins /
    * aggregations on `keys` then run with NO exchange on either side —
    * the shuffle is paid once at write time. (Parquet + Hive-style
    * bucket metadata in the session catalog.) */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Salted equi-join for heavy-hitter keys (the golden output's SANY ≈ 17%
    * of all rows would hot-spot one reducer): the fact side gets a random-
    * but-deterministic salt in [0, salts); the dim side is exploded ×salts
    * so every (key, salt) pair still matches. Use when AQE's skew split
    * isn't available (e.g. storage-partitioned joins) or for aggregations.
    *
    * The salt is md5-derived from a unique fact column — deterministic
    * across retries (a `rand()` salt breaks task-retry consistency). */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltBy: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(conv(substring(md5(col(saltBy).cast("string")), 1, 15), 16, 10).cast("long"),
        lit(salts)).cast("int"))
    val dimExploded = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(dimExploded, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial aggregate on (key, salt),
    * then final on key. For algebraic aggs Spark's own partial aggregation
    * already does this; the explicit form is for order-sensitive or
    * sketch-style states where the partial combine must be forced. */
  def saltedSum(df: DataFrame, key: String, saltBy: String, valueExpr: Column,
      salts: Int, out: String): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(conv(substring(md5(col(saltBy).cast("string")), 1, 15), 16, 10).cast("long"),
        lit(salts)).cast("int"))
    salted.groupBy(col(key), col("__salt"))
      .agg(sum(valueExpr.cast("decimal(18,6)")).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).cast("double").as(out))
  }
}
