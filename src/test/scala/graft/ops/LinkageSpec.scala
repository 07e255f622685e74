package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq(
    Linkage.FieldSpec("brand", 0.9, 0.04),
    Linkage.FieldSpec("model", 0.8, 0.1))

  test("fellegiSunterPairs: blocked pairs, weights sum in field order") {
    val df = Seq(
      (1L, "blk1", "CAT", "320D"),
      (2L, "blk1", "CAT", "320D"),
      (3L, "blk1", "KOMATSU", "320D"),
      (4L, "blk2", "CAT", "PC200")) // different block — never paired
      .toDF("id", "blk", "brand", "model")
    val out = Linkage.fellegiSunterPairs(df, "id", col("blk"), fields)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val agree = fields.map(_.agreeW).sum
    val mixed = fields(0).disagreeW + fields(1).agreeW
    assert(math.abs(out((1L, 2L)) - agree) < 1e-6) // both fields agree
    assert(math.abs(out((1L, 3L)) - mixed) < 1e-6) // brand differs
    // agreement weights are positive evidence, disagreement negative
    assert(fields.forall(f => f.agreeW > 0 && f.disagreeW < 0))
  }

  test("fellegiSunterBands: threshold triage and band counts") {
    val pairs = Seq((1L, 2L, 7.5), (1L, 3L, 2.0), (2L, 3L, -3.2))
      .toDF("id_a", "id_b", "score")
    val out = Linkage.fellegiSunterBands(pairs, reviewLo = 0.0, matchHi = 6.0)
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set((7L, "match", 1L), (2L, "review", 1L),
      (-4L, "nonmatch", 1L)))
  }

  test("fellegiSunterGradedPairs: level selection (full / JW partial / dis)") {
    val fields = Seq(
      Linkage.GradedField("name", 0.8, 0.02, 0.1, 0.08, 0.9))
    val df = Seq(
      (1L, "b", "martha"), (2L, "b", "martha"),  // full agreement
      (3L, "b", "marhta"),                        // JW 0.961 → partial vs 1,2
      (4L, "b", "zzzz"))                          // disagree
      .toDF("id", "blk", "name")
    val out = Linkage.fellegiSunterGradedPairs(df, "id", col("blk"), fields)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val f = fields.head
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out((1L, 2L)) == r6(f.wFull))
    assert(out((1L, 3L)) == r6(f.wPart))
    assert(out((1L, 4L)) == r6(f.wDis))
  }

  test("fellegiSunterEm: m/u separate on a corpus with planted duplicates") {
    // 10 entities × 3 copies: within-entity pairs agree on both fields;
    // cross-entity pairs agree on (almost) nothing
    val rows = for (e <- 0L until 10L; c <- 0 until 3)
      yield (e * 3 + c, "blk", s"brand$e", s"type${e % 4}")
    val df = rows.toDF("id", "blk", "brand", "ty")
    val out = Linkage.fellegiSunterEm(df, "id", col("blk"),
        Seq("brand", "ty"), iters = 10)
      .as[(String, Double, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set("brand", "ty"))
    // EM must find brand agreement far likelier under M than U
    assert(out("brand")._2 > 0.7 && out("brand")._2 > out("brand")._3 + 0.5)
    assert(out("brand")._4 > 0.0 && out("brand")._4 < 1.0) // λ sane
    assert(out("brand")._5 == 435L) // C(30,2) blocked pairs
    // deterministic across layouts
    val again = Linkage.fellegiSunterEm(df.repartition(7), "id", col("blk"),
        Seq("brand", "ty"), iters = 10)
      .as[(String, Double, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(again == out)
  }

  test("blockingQuality: RR and PC from hand-counted pair sets") {
    val df = Seq(
      (1L, "A", "t1"), (2L, "A", "t1"), (3L, "B", "t1"), (4L, "B", "t2"))
      .toDF("id", "blk", "truth")
    val out = Linkage.blockingQuality(df, "id", col("blk"), Seq("truth"))
      .as[(Long, Long, Double, Double, Double, Double, Double)].head()
    // cand = C(2,2)+C(2,2) = 2 of 6 total → RR 2/3; truth pairs C(3,2)=3,
    // captured only (1,2) (same block) → PC 1/3
    assert(out == ((4L, 2L, 2.0, 3.0, 1.0, 0.666667, 0.333333)))
  }
}
