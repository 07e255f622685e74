package graft.ops

import graft.SparkSpec

class TextQualitySpec extends SparkSpec {
  import spark.implicits._

  // ─── simhashDupPairs ──────────────────────────────────────────────────

  test("simhash blocking finds exactly the brute-force Hamming pairs") {
    // near-dups (one-word edits) plus unrelated docs
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy cat again and again"),
      (3L, "the quick brown fox leaps over the lazy dog again and again"),
      (4L, "completely different text about heavy machinery imports"),
      (5L, "unrelated sentence mentioning mobile cranes and excavators")
    ).toDF("doc_id", "text")
    for (maxH <- Seq(2, 3, 5)) {
      val got = Dedup.simhashDupPairs(docs, "doc_id", "text",
          bits = 48, maxHamming = maxH)
        .select($"id_a", $"id_b", $"hamming")
        .as[(Long, Long, Long)].collect().toSet
      // brute force over the same signatures
      val sigs = docs.select($"doc_id", Dedup.simhash($"text", 48).as("s"))
        .as[(Long, Long)].collect()
      val want = (for {
        (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
        h = java.lang.Long.bitCount(sa ^ sb) if h <= maxH
      } yield (ia, ib, h.toLong)).toSet
      assert(got == want, s"maxHamming=$maxH")
    }
  }

  test("simhashFast kernel equals the declarative simhash bit-for-bit") {
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, ""), (3L, "a"),
      (4L, "x y z x y z x y z repeated tokens and more words here")
    ).toDF("doc_id", "text")
    val both = docs.select(
      Dedup.simhash($"text", 48).as("slow"),
      org.apache.spark.sql.functions.coalesce(
        graft.functions.HashOps.simhashFast(
          graft.functions.HashOps.md5Prefix60Array(
            org.apache.spark.sql.functions.split(
              org.apache.spark.sql.functions.lower($"text"), " "), seed = 777),
          48),
        org.apache.spark.sql.functions.lit(0L)).as("fast"))
      .as[(Long, Long)].collect()
    both.foreach { case (s, f) => assert(s == f) }
  }

  test("simhashDupPairs rejects a bits/block mismatch") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.simhashDupPairs(docs, "doc_id", "text", bits = 48, maxHamming = 4)
    }
  }

  // ─── oovRate ──────────────────────────────────────────────────────────

  test("oovRate: top-K vocabulary by frequency with token-ascending ties") {
    // counts: x=3, b=2, a=2 → K=2 vocab is {x, a} (a beats b on the tie)
    val docs = Seq(
      (1L, "x x x"),
      (2L, "a b"),
      (3L, "a b zz")
    ).toDF("doc_id", "text")
    val r = TextStats.oovRate(docs, "doc_id", "text", vocabSize = 2)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_tokens", $"n_oov", $"oov_rate")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(r == Seq(
      (1L, 3L, 0L, 0.0),
      (2L, 2L, 1L, 0.5),
      (3L, 3L, 2L, 2.0 / 3.0)))
  }

  test("oovRate drops empty tokens and token-less docs") {
    val docs = Seq((1L, "a  a"), (2L, "")).toDF("doc_id", "text")
    val r = TextStats.oovRate(docs, "doc_id", "text", vocabSize = 10)
      .select($"doc_id", $"n_tokens").as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 2L)) // double space → no empty token; doc 2 absent
  }

  // ─── charEntropy ──────────────────────────────────────────────────────

  test("charEntropy: uniform two-char doc scores exactly 1 bit") {
    val docs = Seq((1L, "abab"), (2L, "aaaa")).toDF("doc_id", "text")
    val r = TextStats.charEntropy(docs, "doc_id", "text")
      .orderBy($"doc_id")
      .select($"doc_id", $"n_chars", $"distinct_chars", $"entropy")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(r(0) == ((1L, 4L, 2L, 1.0)))
    assert(r(1) == ((2L, 4L, 1L, 0.0)))
  }

  test("charEntropy: four uniform chars score 2 bits; empty docs absent") {
    val docs = Seq((1L, "abcd"), (2L, "")).toDF("doc_id", "text")
    val r = TextStats.charEntropy(docs, "doc_id", "text")
      .select($"doc_id", $"entropy").as[(Long, Double)].collect().toMap
    assert(r == Map(1L -> 2.0))
  }

  // ─── filterReasons ───────────────────────────────────────────────────

  test("filterReasons reports the first failing rule and the full bitmask") {
    val sw = Seq("the", "a")
    val prose = "the a alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima mike november oscar papa quebec romeo " +
      "sierra tango" // 22 distinct tokens, stopwords present: passes everything
    val short = "the brown fox"                             // fails n_tokens only
    val gibber = Seq.fill(25)("zxqwvutsrqp").mkString(" ")  // len ok-count, long tokens, no stopwords, repetitive
    val docs = Seq((1L, prose), (2L, short), (3L, gibber)).toDF("doc_id", "text")
    val byId = docs.select($"doc_id", TextStats.filterReasons($"text", sw).as("fr"))
      .select($"doc_id", $"fr.reason", $"fr.fail_mask")
      .as[(Long, String, Int)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byId(1L) == (("pass", 0)))
    assert(byId(2L) == (("n_tokens", 1)))
    // gibberish: mean_token_len=11 (bit 1), no stopwords (bit 2),
    // word_repetition = 1 - 1/25 (bit 3); first failing = mean_token_len
    assert(byId(3L) == (("mean_token_len", 2 + 4 + 8)))
    // the mask agrees with qualityKeep: keep iff mask == 0
    val keeps = docs.select($"doc_id", TextStats.qualityKeep($"text", sw))
      .as[(Long, Boolean)].collect().toMap
    byId.foreach { case (id, (_, m)) => assert(keeps(id) == (m == 0)) }
  }

  // ─── piiCounts / redactPiiTyped ──────────────────────────────────────

  test("typed PII redaction masks emails, IPv4 and long digit runs in order") {
    val t = "mail bob.smith+x@corp.example.org ip 192.168.0.1 card 4415001234 short 123"
    val df = Seq((1L, t)).toDF("id", "t")
    val out = df.select(TextStats.piiCounts($"t").as("pc"),
        TextStats.redactPiiTyped($"t").as("red"))
      .select($"pc.n_email", $"pc.n_ip", $"pc.n_num", $"red")
      .as[(Int, Int, Int, String)].head()
    assert(out._1 == 1 && out._2 == 1 && out._3 == 1)
    assert(out._4 == "mail <EMAIL> ip <IP> card <NUM> short 123")
    // an IP is never half-eaten by the number rule (order contract)
    assert(!out._4.contains("<NUM>.<NUM>"))
  }
}
