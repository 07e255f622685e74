package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  test("learnVocab: all singles kept, multis frequency-first with ## prefix") {
    // "ab" x3, "cab" x1: start units ab(3), ca(1), cab(1); continuation
    // units ##b(3+1), ##ab(1), ##b from cab pos3(1)... enumerate: topMulti=2
    val wf = Seq(("ab", 3L), ("cab", 1L)).toDF("word", "freq")
    val v = Wordpiece.learnVocab(wf, maxLen = 3, topMulti = 2)
      .as[String].collect().toSet
    // singles: a, c (start) and ##b, ##a (continuation), ##c never occurs
    assert(Set("a", "c", "##b", "##a").subsetOf(v))
    // multi ranking: ##b? no — length-1. Multis by weight:
    //   ab: 3 (from "ab" pos1)      ##ab: 1 (cab pos2)
    //   ca: 1, cab: 1, ##b is single.
    // top-2 multis = ab (3), then tie at 1 broken by string asc:
    //   "##ab" < "ca" < "cab"  => ##ab
    assert(v.contains("ab") && v.contains("##ab"))
    assert(!v.contains("ca") && !v.contains("cab"))
  }

  test("segmentWords: greedy longest match, foreign char advances by one") {
    val vocab = Seq("a", "b", "c", "ab", "##c").toDF("unit")
    val words = Seq("abc", "ba", "axa").toDF("word")
    val out = Wordpiece.segmentWords(words, vocab, maxLen = 2)
      .as[(String, Long)].collect().toMap
    assert(out("abc") == 2L) // ab + ##c
    // "ba": b, then pos2 needs ##a — not in vocab => advance 1 anyway
    assert(out("ba") == 2L)
    // "axa": a, ##x unseen (advance 1), ##a unseen (advance 1) => 3
    assert(out("axa") == 3L)
  }

  test("fertility: single-token words give fertility 1 and share 1") {
    val df = Seq(("en", "aa aa bb"), ("en", "aa")).toDF("lang", "text")
    // vocab learns aa and bb as multis; every word = 1 token
    val out = Wordpiece.fertility(df, "lang", "text", maxLen = 2, topMulti = 10)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(out.toSeq == Seq(("en", 4L, 4L, 1.0, 1.0)))
  }

  test("fertility: zero multis forces pure char segmentation") {
    val df = Seq(("de", "abc de")).toDF("lang", "text")
    val out = Wordpiece.fertility(df, "lang", "text", maxLen = 2, topMulti = 0)
      .as[(String, Long, Long, Double, Double)].collect()
    // abc -> 3 tokens, de -> 2 tokens: fertility 5/2
    assert(out.toSeq == Seq(("de", 2L, 5L, 2.5, 0.0)))
  }
}
