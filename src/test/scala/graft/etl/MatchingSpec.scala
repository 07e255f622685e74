package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MatchingSpec extends SparkSpec {
  import spark.implicits._

  val fact = Seq((1L, "KOMATSU PC200 EXCAVATOR"), (2L, "plain row"),
    (3L, "SANY AND KOMATSU BOTH")).toDF("id", "text")
  val dim = Seq(("KOMATSU", 1), ("SANY", 2)).toDF("brand", "ref_order")

  test("firstMatchJoin keeps first brand in reference order") {
    val got = Matching.firstMatchJoin(fact, Seq("id"), dim,
      $"text".contains($"brand"), "ref_order", Map("brand" -> "matched"))
      .orderBy("id").select("matched").as[Option[String]].collect()
    assert(got.toSeq == Seq(Some("KOMATSU"), None, Some("KOMATSU")))
  }

  test("longestMatchJoin keeps longest match, deterministic on ties") {
    val models = Seq(("PC200", 1), ("PC200-8", 2), ("PC2", 3)).toDF("m", "o")
    val f = Seq((1L, "KOMATSU PC200-8 MODEL")).toDF("id", "text")
    val got = Matching.longestMatchJoin(f, Seq("id"), models,
      $"text".contains($"m"), "m", Map("m" -> "matched"))
      .select("matched").as[String].head()
    assert(got == "PC200-8")
  }

  test("unmatched fact rows survive with nulls (left semantics)") {
    val got = Matching.firstMatchJoin(fact, Seq("id"), dim,
      $"text".contains($"brand"), "ref_order", Map("brand" -> "matched"))
    assert(got.count() == 3)
  }
}
