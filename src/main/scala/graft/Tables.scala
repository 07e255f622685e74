package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet corpus (TESTDATA.md). */
object Tables {
  /** Relation memo: `spark.read.parquet` re-lists the path and re-reads
    * the footer schema on EVERY call — ~0.1 s of driver-side metadata
    * work per table per query, ~50 s across a 488-query registry pass.
    * Keyed by (session, dir, name) so each session/dataset pair lists
    * once; the entry is the ANALYZED RELATION (file list + schema — the
    * job a catalog/metastore does at scale), never data or results:
    * every action still computes from the parquet files. */
  private val relCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    relCache.computeIfAbsent((spark, dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))

  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  /** events.ts normalized to session-zone TIMESTAMP regardless of how the
    * generator wrote it: TIMESTAMP(NANOS) (Spark rejects natively — read
    * nanos as long, truncate to micros), TIMESTAMP_NTZ (micros, no zone —
    * cast under the UTC session zone, value-preserving), or already LTZ.
    * All three land on the same instants as DuckDB's `CAST(ts AS
    * TIMESTAMP)` over the same file. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
