package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Newline-delimited JSON corpus ingest — the interchange format crawl
  * dumps actually arrive in. Schema is ENFORCED (no inference pass over
  * 100 TB), and malformed lines are CAPTURED, not dropped: PERMISSIVE
  * mode routes them to `_corrupt_record` so the ingest can account for
  * every input byte (the q129 attrition discipline applied to parsing).
  * Reading is embarrassingly parallel per file split; no shuffle. */
object Jsonl {

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt_record", StringType)))

  /** (parsed rows with null `_corrupt_record`, corrupt-line count). */
  def readDocuments(spark: SparkSession, path: String): (DataFrame, Long) = {
    val raw = spark.read
      .schema(documentsSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache() // corrupt accounting + clean projection share one parse
    val corrupt = raw.filter(col("_corrupt_record").isNotNull).count()
    val clean = raw.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    (clean, corrupt)
  }

  def writeDocuments(df: DataFrame, path: String): Unit =
    df.select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").json(path)
}
