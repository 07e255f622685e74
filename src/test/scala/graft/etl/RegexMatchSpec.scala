package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RegexMatchSpec extends SparkSpec {
  import spark.implicits._

  test("longestMatch = findall + max-by-length (not first match)") {
    // first match is "PC20", the longest anywhere is "PC2000"
    val got = Seq(("PC20 AND PC2000"))
      .toDF("s")
      .select(RegexMatch.longestMatch($"s", lit("PC\\d+")))
      .as[String].head()
    assert(got == "PC2000")
  }

  test("regexJoin picks pattern with longest extracted match") {
    val fact = Seq((1L, "SANY SY215C MACHINE")).toDF("id", "text")
    val pats = Seq(("SY\\d+", "short", 1), ("SY\\d+[A-Z]", "long", 2)).toDF("pat", "cls", "prio")
    val got = RegexMatch.regexJoin(fact, Seq("id"), "text", pats, "pat",
      lit(true), Some("prio"), Map("cls" -> "cls"))
      .select("cls", "matched").as[(String, String)].head()
    assert(got == ("long", "SY215C"))
  }

  test("decodeCapacity: documented starting_point intent (SURVEY §2.3 F6)") {
    val df = Seq(("215", 0), ("1215", 1), ("215", 2), ("21.5", 3), ("9215", -1), ("88215", -2))
      .toDF("num", "sp")
    val got = df.select(RegexMatch.decodeCapacity($"num", $"sp")).as[Option[Double]].collect()
    assert(got.toSeq == Seq(Some(21.5), Some(21.5), None, Some(21.5), Some(215.0), Some(215.0)))
  }

  test("literalRegexBest equals relational regexJoin tie-breaks") {
    import org.apache.spark.sql.types._
    val texts = Seq("SY215C AND PC2000", "PC20 ONLY", "NOTHING", "XE99Z SY55")
    val pats = Seq(("SY ?\\d{2,3}[A-Z]?", 1), ("PC ?\\d{2,4}", 2), ("XE ?\\d{2}[A-Z]", 3))
    // literal path
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val sorted = pats.sortBy { case (p, _) => (-p.length, p) }
    val best = RegexMatch.literalRegexBest($"text",
      sorted.map { case (p, _) => (p, -p.length, lit(true)) }, findallLongest = true)
    val lit_ = df.select($"id", best.getField("matched").as("m")).orderBy("id")
      .as[(Long, Option[String])].collect().toSeq
    // relational path
    val dim = sorted.map { case (p, _) => (p, -p.length) }.toDF("pat", "prio")
    val rel = RegexMatch.regexJoin(df, Seq("id"), "text", dim, "pat",
      lit(true), Some("prio"), Map.empty, findallLongest = true)
      .select($"id", $"matched").orderBy("id").as[(Long, Option[String])].collect().toSeq
    assert(lit_ == rel)
  }
}

class CompatFlagsSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("bug-compatible decode drops the codes the reference never assigns") {
    val df = Seq(("215", 1), ("99", 2), ("330", 3), ("1234", -2)).toDF("num", "sp")
    val intent = df.select(
      RegexMatch.decodeCapacity($"num", $"sp").as("c")).as[Option[Double]].collect()
    val buggy = df.select(
      RegexMatch.decodeCapacity($"num", $"sp", CompatFlags.bugCompatible).as("c"))
      .as[Option[Double]].collect()
    // documented intent: 1 → drop-first/10, 2 → null, 3 → n, −2 → drop two
    assert(intent.toSeq == Seq(Some(1.5), None, Some(330.0), Some(34.0)))
    // reference's actual behavior: 1/2 never assigned, −2 crashes (→ none)
    assert(buggy.toSeq == Seq(None, None, Some(330.0), None))
  }
}

class LiteralRegexBestEquivalenceSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("fused literal-regex pick is bit-identical to the greatest-struct fold") {
    val texts = Seq(
      "KOMATSU PC200-8 AND PC2000 UNITS", "SY365H ONLY", "ZX85 AND XE215C",
      "NOTHING HERE", "PC 300 SPACED", "320D 330GC 345", "", "PC20",
      "MULTI PC200 SY215 ZX330 XE215 320") ++
      (0 until 50).map(i => s"ROW $i PC${100 + i * 7} SY${200 + i} FILLER")
    val df = texts.toDF("t").withColumn("brand",
      when(length($"t") % 3 === 0, "KOMATSU")
        .when(length($"t") % 3 === 1, "UNKNOWN").otherwise("SANY"))
    val pats = graft.etl.KnowledgeBase.sampleRegexKbRows
      .sortBy { case (_, pat, _, _, _) => (-pat.length, pat) }
      .map { case (b, pat, _, _, _) =>
        (pat, -pat.length, $"brand" === "UNKNOWN" || $"brand" === b)
      }
    for (fl <- Seq(true, false)) {
      val both = df.select(
        RegexMatch.literalRegexBest($"t", pats, fl).as("f"),
        RegexMatch.literalRegexBestDeclarative($"t", pats, fl).as("d"))
      val diff = both.filter(
        not($"f.ord" <=> $"d.ord") || not($"f.matched" <=> $"d.matched") ||
          not($"f.n_matched" <=> $"d.n_matched") ||
          ($"f".isNull =!= $"d".isNull))
      assert(diff.count() == 0, s"findallLongest=$fl mismatch")
    }
  }
}
