package graft.sources

import graft.SparkSpec

/** TFRecord codec contract: known CRC32C vector, masking math checked
  * against an independent BigInt reimplementation, round-trip identity,
  * and loud failure on corruption/truncation. */
class TfRecordSpec extends SparkSpec {

  test("CRC32C known vector and masking math") {
    // the public CRC32C check value: crc32c("123456789") = 0xE3069283
    val nine = "123456789".getBytes("US-ASCII")
    val c = new java.util.zip.CRC32C(); c.update(nine, 0, nine.length)
    assert(c.getValue === 0xe3069283L)
    // masked form vs an independent BigInt rotate-and-add
    def maskRef(crc: Long): Long = {
      val rot = (crc >>> 15) | ((crc << 17) & 0xffffffffL)
      (rot + 0xa282ead8L) & 0xffffffffL
    }
    assert(TfRecord.maskedCrc(nine, 0, nine.length) === maskRef(0xe3069283L))
  }

  test("round trip, corruption detection, truncation detection") {
    val recs = Seq(Array[Byte](1, 2, 3), Array[Byte](), "hello".getBytes("US-ASCII"))
    val enc = TfRecord.encode(recs.iterator)
    val back = TfRecord.decode(enc)
    assert(back.size === 3)
    recs.zip(back).foreach { case (a, b) => assert(a.sameElements(b)) }
    // flip one payload byte → data CRC mismatch
    val corrupt = enc.clone()
    corrupt(12) = (corrupt(12) ^ 0x7f).toByte // first record's first byte
    val e1 = intercept[IllegalArgumentException](TfRecord.decode(corrupt))
    assert(e1.getMessage.contains("CRC"))
    // drop the tail → truncated
    val e2 = intercept[IllegalArgumentException](
      TfRecord.decode(java.util.Arrays.copyOfRange(enc, 0, enc.length - 2)))
    assert(e2.getMessage.toLowerCase.contains("trunc") ||
      e2.getMessage.contains("length"))
    // corrupt a length header → length CRC mismatch
    val badLen = enc.clone(); badLen(0) = (badLen(0) ^ 1).toByte
    intercept[IllegalArgumentException](TfRecord.decode(badLen))
    assert(TfRecord.decode(Array.emptyByteArray).isEmpty)
  }

  test("varint/zigzag: canonical vectors, round trip, malformed streams") {
    import TfRecord.Varint
    // canonical protobuf examples: 1 → 0x01, 300 → 0xAC 0x02
    val out = new java.io.ByteArrayOutputStream()
    Varint.write(out, 1L); Varint.write(out, 300L)
    assert(out.toByteArray.map(_ & 0xff).toSeq === Seq(0x01, 0xac, 0x02))
    assert(Varint.readAll(out.toByteArray) === Seq(1L, 300L))
    // zigzag canonical: 0→0, -1→1, 1→2, -2→3, Long.MinValue round-trips
    assert(Seq(0L, -1L, 1L, -2L).map(Varint.zigzag) === Seq(0L, 1L, 2L, 3L))
    for (v <- Seq(0L, -1L, 1L, Long.MaxValue, Long.MinValue, -123456789L))
      assert(Varint.unzigzag(Varint.zigzag(v)) === v)
    // max-length group (Long.MinValue zigzagged = all ones) round-trips
    val big = new java.io.ByteArrayOutputStream()
    Varint.write(big, Varint.zigzag(Long.MinValue))
    assert(big.size === 10)
    assert(Varint.readAll(big.toByteArray).map(Varint.unzigzag) ===
      Seq(Long.MinValue))
    // truncated group fails loudly
    intercept[IllegalArgumentException](
      Varint.readAll(Array[Byte](0x80.toByte)))
  }

  test("tf.Example: round trip, foreign-field skipping, key selection") {
    val tokens = Seq(0L, 1L, 300L, 4095L)
    val ex = TfExample.encode("tokens", tokens)
    assert(TfExample.tokensOf(ex, "tokens") === tokens)
    assert(TfExample.tokensOf(ex, "other") === Seq.empty)
    assert(TfExample.tokensOf(TfExample.encode("tokens", Seq.empty), "tokens")
      === Seq.empty)
    // a real parser must SKIP unknown fields by wire type: prepend a
    // varint field 7 and a fixed32 field 5 at the top level
    val noise = new java.io.ByteArrayOutputStream()
    TfRecord.Varint.write(noise, (7 << 3) | 0) // field 7, varint
    TfRecord.Varint.write(noise, 12345L)
    TfRecord.Varint.write(noise, (5 << 3) | 5) // field 5, fixed32
    noise.write(Array[Byte](1, 2, 3, 4))
    noise.write(ex)
    assert(TfExample.tokensOf(noise.toByteArray, "tokens") === tokens)
    // truncated LEN field fails loudly
    intercept[IllegalArgumentException](
      TfExample.tokensOf(java.util.Arrays.copyOfRange(ex, 0, ex.length - 3),
        "tokens"))
  }

  test("mixed Example: projection skips bytes features, bytes read back") {
    val tokens = Seq(7L, 300L, 4095L)
    val text = "the quick brown fox".getBytes("UTF-8")
    val lang = "en".getBytes("UTF-8")
    val ex = TfExample.encodeMixed(
      Seq("tokens" -> tokens),
      Seq("text" -> Seq(text), "lang" -> Seq(lang)))
    // projecting ONE feature out of three: identical to an Example that
    // never carried the bytes payloads
    assert(TfExample.tokensOf(ex, "tokens") === tokens)
    assert(TfExample.tokensOf(ex, "tokens") ===
      TfExample.tokensOf(TfExample.encode("tokens", tokens), "tokens"))
    // asking an int64 reader for a bytes feature yields nothing (kind
    // mismatch is a skip, not a crash) and vice versa
    assert(TfExample.tokensOf(ex, "text") === Seq.empty)
    assert(TfExample.bytesValuesOf(ex, "tokens") === Seq.empty)
    // the bytes features themselves read back exactly
    assert(TfExample.bytesValuesOf(ex, "text").map(_.toSeq) === Seq(text.toSeq))
    assert(TfExample.bytesValuesOf(ex, "lang").map(_.toSeq) === Seq(lang.toSeq))
    // multi-value bytes list keeps order
    val multi = TfExample.encodeMixed(Seq.empty,
      Seq("chunks" -> Seq(Array[Byte](1), Array[Byte](2, 3), Array.emptyByteArray)))
    assert(TfExample.bytesValuesOf(multi, "chunks").map(_.toSeq) ===
      Seq(Seq[Byte](1), Seq[Byte](2, 3), Seq.empty[Byte]))
  }

  test("synthesizeMixedShards: projected stats match the plain-token shards") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfTiny).limit(25)
    val mixed = TfExample.shardStats(
      TfExample.synthesizeMixedShards(docs, "doc_id", "text", "lang",
        vocab = 4096), "doc_id")
    // reference: same tokens, no bytes payloads — projection must not
    // see a difference
    val plainRows = mixed.as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(plainRows.nonEmpty && plainRows.forall(_._2 == 1L))
    val wantToks = docs.select($"doc_id",
        org.apache.spark.sql.functions.transform(
          org.apache.spark.sql.functions.filter(
            org.apache.spark.sql.functions.split(
              org.apache.spark.sql.functions.lower($"text"), " "),
            t => org.apache.spark.sql.functions.length(t) > 0),
          w => org.apache.spark.sql.functions.pmod(
            graft.ops.Dedup.baseHash(w),
            org.apache.spark.sql.functions.lit(4096L))).as("t"))
      .as[(Long, Seq[Long])].collect().toMap
    plainRows.foreach { case (id, _, n, sum) =>
      assert(n === wantToks(id).size.toLong, s"doc $id token count")
      assert(sum === wantToks(id).sum, s"doc $id token sum")
    }
  }

  test("synthesize/decodeStats agree with the closed form on a doc sample") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfTiny).limit(20)
    val got = TfRecord.decodeStats(
        TfRecord.synthesizeTfRecords(docs, "doc_id"), "doc_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, nRec, total, sum) =>
      val nf = 1 + id % 5
      assert(nRec === nf)
      val ns = (0 until nf.toInt).map(k => 8 + (id + k) % 16)
      assert(total === ns.sum)
      val want = (0 until nf.toInt).flatMap(k =>
        (0 until (8 + (id + k) % 16).toInt).map(i => (31 * id + 97 * k + i) % 256)).sum
      assert(sum === want)
    }
  }
}
