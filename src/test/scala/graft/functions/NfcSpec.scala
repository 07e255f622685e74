package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class NfcSpec extends SparkSpec {
  import spark.implicits._

  // decomposed e + COMBINING ACUTE (explicit escape so no editor can
  // silently precompose it) vs the composed single code point
  private val decomposed = "café"
  private val composed = "café"

  test("NFC composes decomposed sequences; identity on ASCII and composed") {
    val got = Seq(decomposed, composed, "plain ascii", "")
      .toDF("t")
      .select(Nfc.nfc($"t").as("n"), length($"t").as("lb"),
        length(Nfc.nfc($"t")).as("la"))
      .as[(String, Int, Int)].collect().toSeq
    assert(got == Seq(
      (composed, 5, 4),        // 2 code points fold to 1
      (composed, 4, 4),        // already NFC: untouched
      ("plain ascii", 11, 11), // ASCII fast path
      ("", 0, 0)), got.toString)
    // null passes through (UnaryExpression null semantics)
    val n = Seq[Option[String]](None).toDF("t")
      .select(Nfc.nfc($"t")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("the kernel (interpreted path) agrees with the JDK normalizer") {
    // multi-mark sequence: a + ring + acute composes to ǻ (U+01FB)
    val tricky = "ǻ x́ é́"
    val want = java.text.Normalizer.normalize(tricky,
      java.text.Normalizer.Form.NFC)
    assert(NfcKernel.normalize(UTF8String.fromString(tricky)).toString == want)
    // fast path returns the SAME object for normalized input (no rebuild)
    val s = UTF8String.fromString("ascii only")
    assert(NfcKernel.normalize(s) eq s)
  }

  test("nfcAudit: per-group changed-doc counts and code-point deltas") {
    val df = Seq(
      ("a", decomposed),          // changes, delta 1
      ("a", composed),            // already normalized
      ("a", decomposed + " é"), // changes, delta 2
      ("b", "plain")).toDF("g", "t")
    val got = graft.ops.TextStats.nfcAudit(df, "g", "t")
      .orderBy($"group").as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 3L, 2L, 3L), ("b", 1L, 0L, 0L)), got.toString)
  }
}
