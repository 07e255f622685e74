package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("importance weights favor the target distribution on average") {
    val docs = graft.Tables.documents(spark, sfTiny)
    val w = Dsir.importanceWeights(docs, "doc_id", "text", col("lang") === "en")
      .join(docs.select($"doc_id", $"lang"), Seq("doc_id"))
    val mean = w.groupBy(($"lang" === "en").as("t")).agg(avg($"weight"))
      .as[(Boolean, Double)].collect().toMap
    assert(mean(true) > mean(false),
      s"target-language docs must score higher: $mean")
  }

  test("documents with fewer than 2 tokens carry zero weight") {
    val docs = Seq((1L, "single", "en"), (2L, "two tokens", "en"), (3L, "", "de"))
      .toDF("doc_id", "text", "lang")
    val w = Dsir.importanceWeights(docs, "doc_id", "text", col("lang") === "en")
      .select($"doc_id", $"n_bigrams", $"weight")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(w(1L) == ((0L, 0.0)) && w(3L) == ((0L, 0.0)))
    assert(w(2L)._1 == 1L)
  }

  test("weights are invariant to partitioning (integer nano-nat sums)") {
    val docs = graft.Tables.documents(spark, sfTiny)
    def run(parts: Int) =
      Dsir.importanceWeights(docs.repartition(parts), "doc_id", "text",
          col("lang") === "en")
        .select($"doc_id", $"weight").as[(Long, Double)].collect().toMap
    assert(run(3) == run(17), "weight must not depend on partition layout")
  }

  test("resampleTopK is a pure function and biased toward heavy weights") {
    // 10-nat weight gap dwarfs Gumbel(0,1) noise (std ~1.28): the top 50
    // of 100-heavy + 100-light must come overwhelmingly from the heavy half
    val weights = (1L to 200L)
      .map(id => (id, if (id <= 100) 5.0 else -5.0))
      .toDF("doc_id", "w")
    val take = Dsir.resampleTopK(weights, "doc_id", $"w", k = 50)
      .select($"doc_id").as[Long].collect().toSet
    assert(take.size == 50)
    assert(take.count(_ <= 100) >= 48, s"heavy share: ${take.count(_ <= 100)}")
    val again = Dsir.resampleTopK(weights, "doc_id", $"w", k = 50)
      .select($"doc_id").as[Long].collect().toSet
    assert(take == again, "md5-derived Gumbel keys must be reproducible")
  }
}
