package graft.ops

import graft.SparkSpec

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("pieceVocab: substring counts, minCount cut, single-char fallback") {
    val df = Seq(Tuple1("ab ab b")).toDF("text")
    val v = Unigram.pieceVocab(df, "text", maxPieceLen = 4, minCount = 3)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    // counts: a 2, b 3, ab 2 → ab dropped (< 3, len 2); chars kept anyway
    assert(v.keySet == Set("a", "b"))
    assert(v("a")._2 == 2L && v("b")._2 == 3L)
    // total over KEPT pieces = 5
    assert(math.abs(v("a")._3 - (-math.log(2.0 / 5))) < 1e-12)
    assert(math.abs(v("b")._3 - (-math.log(3.0 / 5))) < 1e-12)
  }

  test("viterbiSegment: DP min-cost equals hand-enumerated best path") {
    val df = Seq(Tuple1("ab ab b")).toDF("text")
    val out = Unigram.viterbiSegment(df, "text", maxPieceLen = 4, minCount = 3)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    val cA = -math.log(2.0 / 5); val cB = -math.log(3.0 / 5)
    // 'ab' must fall back to a+b (piece 'ab' was cut); 'b' is one piece
    assert(out("ab") == (("ab", 2L,
      BigDecimal(cA + cB).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(out("b") == (("b", 1L,
      BigDecimal(cB).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("viterbiSegment: a frequent long piece beats char fallback") {
    // 'abcd' appears 3× → piece kept; its cost < sum of 4 char costs
    val df = Seq(Tuple1("abcd abcd abcd")).toDF("text")
    val out = Unigram.viterbiSegment(df, "text", 4, 3)
      .as[(String, Long, Double)].collect().head
    // vocab keeps everything with cnt >= 3: all substrings appear 3×
    // best segmentation is the single piece 'abcd'
    val pieces = Unigram.pieceVocab(df, "text", 4, 3)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out._3 == BigDecimal(pieces("abcd"))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
