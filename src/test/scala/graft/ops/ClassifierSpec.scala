package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.Tables.documents(spark, sfTiny)

  private def logLoss(iters: Int): Double = {
    val w = Classifier.logregFit(docs, "doc_id", "text", col("lang") === "en",
      buckets = 64, iters = iters, rate = 0.02)
    val rows = Classifier.logregScore(docs, "doc_id", "text",
        col("lang") === "en", w)
      .select($"p", $"is_target").as[(Double, Boolean)].collect()
    rows.map { case (p, y) =>
      val pc = math.min(math.max(p, 1e-9), 1 - 1e-9)
      if (y) -math.log(pc) else -math.log(1 - pc)
    }.sum / rows.length
  }

  test("gradient descent reduces training log-loss monotonically") {
    val l0 = logLoss(0) // zero weights: p = 0.5 everywhere, loss = ln 2
    val l1 = logLoss(1)
    val l3 = logLoss(3)
    assert(math.abs(l0 - math.log(2.0)) < 1e-6)
    assert(l1 < l0, s"one step must cut loss: $l1 vs $l0")
    assert(l3 < l1, s"three steps must cut further: $l3 vs $l1")
  }

  test("fit is invariant to input partitioning (integer-gradient sums)") {
    def fit(parts: Int) = Classifier.logregFit(docs.repartition(parts),
      "doc_id", "text", col("lang") === "en", buckets = 64, iters = 2,
      rate = 0.02)
    assert(fit(3) == fit(17), "weights must not depend on partition layout")
  }

  test("featureless docs still train and score through the bias") {
    val tiny = Seq((1L, "", "en"), (2L, "solo", "de"),
      (3L, "two words here", "en")).toDF("doc_id", "text", "lang")
    val w = Classifier.logregFit(tiny, "doc_id", "text", col("lang") === "en",
      buckets = 8, iters = 2, rate = 0.02)
    val scored = Classifier.logregScore(tiny, "doc_id", "text",
        col("lang") === "en", w)
      .select($"doc_id", $"p").as[(Long, Double)].collect().toMap
    assert(scored.keySet == Set(1L, 2L, 3L))
    // both doc 1 ("") and doc 2 (single token) have zero bigrams:
    // identical bias-only features must yield the identical score
    assert(scored(1L) == scored(2L))
  }
}
