package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class StringSimSpec extends SparkSpec {
  import spark.implicits._

  test("editPairsD1 == brute-force levenshtein<=1 over distinct values") {
    val names = Seq("kitten", "sitten", "sittin", "mitten", "kitten", // dup row
      "bolt", "bol", "bout", "completely different", "bolt x", "boltx")
    val df = names.toDF("name")
    val got = StringSim.editPairsD1(df, "name")
      .as[(String, String, Int)].collect().toSet
    val distinct = names.distinct
    val brute = (for {
      a <- distinct; b <- distinct if a < b
      d = {
        // reference Levenshtein (classic DP)
        val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0
        }
        for (i <- 1 to a.length; j <- 1 to b.length)
          dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
            dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        dp(a.length)(b.length)
      }
      if d <= 1
    } yield (a, b, d)).toSet
    assert(got == brute)
    assert(got.contains(("kitten", "mitten", 1))) // substitution
    assert(got.contains(("bol", "bolt", 1)))      // insertion at end
    assert(got.contains(("bolt x", "boltx", 1)))  // deletion mid-string
    assert(!got.exists(_._3 == 0))                // distinct inputs: no 0-pairs
  }

  test("editPairsD1 blocks, never cross-joins (plan has no CartesianProduct)") {
    val df = Seq("aaa", "aab", "zzz").toDF("name")
    val plan = StringSim.editPairsD1(df, "name")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("tfidfCosinePairs: identical docs score 1, df-capped token is ignored") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta"),
      (4L, "alpha delta stop stop"),
      (5L, "stop"), (6L, "stop"), (7L, "stop"), (8L, "stop")
    ).toDF("doc_id", "text")
    // maxDf=4: 'stop' appears in 5 docs → excluded from the representation
    val out = StringSim.tfidfCosinePairs(docs, "doc_id", "text",
        maxDf = 4L, minCos = 0.0, topN = 100)
      .as[(Long, Long, Double)].collect()
    val m = out.map { case (a, b, c) => (a, b) -> c }.toMap
    assert(m((1L, 2L)) == 1.0) // identical over the kept vocabulary
    // doc5..8 are ONLY 'stop' → empty representation → no pairs at all
    assert(!out.exists { case (a, b, _) => a >= 5L || b >= 5L })
    // docs 1 and 3 share no kept token → absent, not zero
    assert(!m.contains((1L, 3L)))
    // 1-4 share 'alpha' only → strictly between 0 and 1
    assert(m.get((1L, 4L)).exists(c => c > 0.0 && c < 1.0))
  }

  test("tfidfCosinePairs is partitioning-invariant (exact decimal dot)") {
    val docs = graft.Tables.documents(spark, sfTiny).limit(60)
    val a = StringSim.tfidfCosinePairs(docs.repartition(1), "doc_id", "text", 50L, 0.2, 10)
      .as[(Long, Long, Double)].collect().toSeq
    val b = StringSim.tfidfCosinePairs(docs.repartition(7), "doc_id", "text", 50L, 0.2, 10)
      .as[(Long, Long, Double)].collect().toSeq
    assert(a == b)
  }
}
