package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions match the Column API bit-for-bit") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sfTiny).createOrReplaceTempView("emb_ext")
    val viaSql = spark.sql(
      """SELECT vec_id, cosine_sim(embedding, embedding) AS c, vec_norm2(embedding) AS n
        |FROM emb_ext ORDER BY vec_id""".stripMargin)
      .as[(Long, Double, Double)].collect()
    val viaCol = Tables.embeddings(spark, sfTiny)
      .select($"vec_id", VectorOps.cosineSim($"embedding", $"embedding").as("c"),
        VectorOps.norm2Fast($"embedding").as("n"))
      .orderBy($"vec_id").as[(Long, Double, Double)].collect()
    assert(viaSql.sameElements(viaCol))
  }

  test("multi_contains SQL functions accept literal keyword lists") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT multi_contains_first('THE KOMATSU PC200 UNIT', 'SANY', 'KOMATSU') AS f,
        |       multi_contains_longest('CATERPILLAR CAT', 'CAT', 'CATERPILLAR') AS l""".stripMargin)
      .as[(String, String)].head()
    assert(row == ("KOMATSU", "CATERPILLAR"))
    // non-literal keyword args are rejected at plan time
    val err = intercept[Exception] {
      spark.sql("SELECT multi_contains_first('X', lower(rand()::string)) ").collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal"))
  }

  test("the extensions class injects every registration") {
    // applies cleanly to a fresh extensions object (the deploy-time path)
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
