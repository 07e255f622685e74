package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sfTiny)

  test("minhash candidate pairs are a superset of high-jaccard truth pairs") {
    // LSH with 8 bands × 2 rows catches jaccard≥0.9 pairs w.p. ~1-1e-7;
    // the planted sf0.001 near-dups must all be found.
    val truth = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture should contain planted near-dups")
    assert(truth.subsetOf(lsh), s"missed: ${truth -- lsh}")
  }

  test("incremental near-dup equals the batch op's cross-set subset") {
    val corpus = docs.filter($"doc_id" % 10 =!= 3)
    val batch = docs.filter($"doc_id" % 10 === 3)
    val inc = Dedup.minhashPairsIncremental(corpus, batch, "doc_id", "text",
        threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    // the batch op over the union, restricted to pairs straddling the
    // split (either orientation — the batch op canonicalizes a < b)
    val full = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect()
      .flatMap { case (a, b, j) =>
        if (a % 10 != 3 && b % 10 == 3) Some((a, b, j))
        else if (a % 10 == 3 && b % 10 != 3) Some((b, a, j))
        else None
      }.toSet
    assert(inc === full)
    assert(inc.forall { case (c, b, _) => c % 10 != 3 && b % 10 == 3 })
  }

  test("quadratic audit baselines refuse inputs over their enforced row bound") {
    val big = spark.range(0, 50).selectExpr("id AS doc_id",
      "concat('alpha beta gamma delta epsilon ', id) AS text")
    val eJ = intercept[IllegalArgumentException](
      Dedup.jaccardPairs(big, "doc_id", "text", maxRows = 10L))
    assert(eJ.getMessage.contains("prefixJaccardPairs"))
    val eC = intercept[IllegalArgumentException](
      Dedup.containmentPairs(big, "doc_id", "text", maxRows = 10L))
    assert(eC.getMessage.contains("prefixContainmentPairs"))
    // and an explicit opt-in raise still works
    assert(Dedup.jaccardPairs(big, "doc_id", "text", threshold = 0.0,
      maxRows = 100L).count() > 0)
  }

  test("minhash pairs report exact jaccard (verified, not estimated)") {
    val viaLsh = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect().map { case (a, b, j) => (a, b) -> j }.toMap
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect().map { case (a, b, j) => (a, b) -> j }.toMap
    viaLsh.foreach { case (pair, j) => assert(exact(pair) == j) }
  }

  test("connected components: chain, separate component, singleton") {
    // 1-2-3-4 chain (via pairwise edges), {10, 11}, and isolated 20
    val verts = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 3L), (11L, 10L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(verts, "doc_id", edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("connectedComponents refuses to return inconsistent labels on non-convergence") {
    // a 6-doc chain needs 5 propagation rounds; maxIter = 2 must THROW
    // rather than silently emit labels that aren't any row's canonical id
    val verts = (1L to 6L).toDF("doc_id")
    val edges = (1L to 5L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(verts, "doc_id", edges, maxIter = 2).collect()
    }
    // and with enough iterations the same chain resolves to one component
    val ok = Dedup.connectedComponents(verts, "doc_id", edges, maxIter = 10)
      .select($"label").as[Long].collect().toSet
    assert(ok == Set(1L))
  }

  test("keepCanonical retains exactly one doc per component") {
    val verts = Seq(1L, 2L, 3L, 10L, 20L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val clusters = Dedup.connectedComponents(verts, "doc_id", edges)
    val corpus = Seq((1L, "a"), (2L, "b"), (3L, "c"), (10L, "d"), (20L, "e"))
      .toDF("doc_id", "text")
    val kept = Dedup.keepCanonical(corpus, "doc_id", clusters)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 10L, 20L)) // min id of {1,2,3}, plus singletons
  }

  test("identical texts give identical simhash; disjoint vocab differs") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "zz yy xx qq"))
      .toDF("id", "text")
    val hs = df.select(Dedup.simhash($"text")).as[Long].collect()
    assert(hs(0) == hs(1) && hs(0) != hs(2))
    assert(hs.forall(_ >= 0), "48-bit simhash stays positive")
  }

  test("exact dedup groups duplicates under whitespace/case noise") {
    val df = Seq((1L, "Hello  World"), (2L, "hello world "), (3L, "other")).toDF("doc_id", "text")
    val g = Dedup.exactDupGroups(df, "doc_id", "text")
      .select("n_docs", "canonical_id").as[(Long, Long)].collect().toSet
    assert(g == Set((2L, 1L), (1L, 3L)))
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine(v, v) == 1 and top-1 of self-query is the query vector") {
    val emb = Tables.embeddings(spark, sfTiny)
    val q = emb.filter($"vec_id" === 7).select($"embedding".as("qvec"))
    val top = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 3)
      .as[(Long, Double)].collect()
    assert(top.head._1 == 7L)
    assert(math.abs(top.head._2 - 1.0) < 1e-12)
    assert(top.map(_._2).sameElements(top.map(_._2).sorted(Ordering[Double].reverse)))
  }

  test("centroidDistanceMatrix: identical groups cosine 1, orthogonal 0") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), "a"), (2L, Array(1.0f, 0.0f), "a"),
      (3L, Array(1.0f, 0.0f), "b"),                // b centroid == a's
      (4L, Array(0.0f, 2.0f), "c"))                // orthogonal
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidDistanceMatrix(emb, "embedding", "label")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("a", "b")) == 1.0)
    assert(out(("a", "c")) == 0.0 && out(("b", "c")) == 0.0)
    assert(out.size == 3)
  }

  test("lsh bucket is deterministic and self-query is always in its bucket") {
    val emb = Tables.embeddings(spark, sfTiny)
    val q = emb.filter($"vec_id" === 7).select($"embedding".as("qvec"))
    val top = Similarity.lshTopK(emb, "vec_id", "embedding", q, 64, 6, 5)
      .as[(Long, Double)].collect()
    assert(top.head._1 == 7L) // query shares its own bucket
  }

  test("planeWeight is stable across calls (pure function of (j,i))") {
    assert(Similarity.planeWeight(3, 17) == Similarity.planeWeight(3, 17))
    assert((0 until 64).exists(i => Similarity.planeWeight(0, i) != Similarity.planeWeight(1, i)))
  }

  test("standardizeDims: unit mean/std per dimension, zero-variance dim -> 0") {
    val emb = Seq(
      (1L, Seq(1.0f, 5.0f)), (2L, Seq(3.0f, 5.0f)), (3L, Seq(5.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.standardizeDims(emb, "vec_id", "embedding")
      .select($"vec_id", $"norm_vec").as[(Long, Seq[Double])].collect()
      .sortBy(_._1)
    // dim 0: mean 3, std sqrt(8/3); dim 1 constant -> all 0.0
    val sd = math.sqrt(8.0 / 3.0)
    assert(out.map(_._2(1)).toSeq == Seq(0.0, 0.0, 0.0))
    assert(math.abs(out(0)._2(0) - (-2.0 / sd)) < 1e-12)
    assert(math.abs(out(1)._2(0)) < 1e-9)
    assert(math.abs(out(2)._2(0) - 2.0 / sd) < 1e-12)
  }
}

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace vs BPE-ish") {
    val r = Seq("hello world 123 a,b").toDF("s").select(
      TextStats.wsTokenCount($"s"), TextStats.bpeTokenCount($"s"))
      .as[(Int, Int)].head()
    assert(r._1 == 4)      // hello | world | 123 | a,b
    assert(r._2 == 6)      // hello world 123 a , b
  }

  test("langGuess: argmax, tie→lexicographic, none→und") {
    val markers = Map("de" -> Seq("der"), "en" -> Seq("the"), "fr" -> Seq("le"))
    val got = Seq("the cat the dog le", "xyz", "le der")
      .toDF("s").select(TextStats.langGuess($"s", markers)).as[String].collect()
    assert(got.toSeq == Seq("en", "und", "de"))
  }

  test("chunkTokens: windows cover every token with the right overlap") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ") // 10 tokens
    val chunks = Seq(text, "short one", "").toDF("s")
      .select($"s", explode(TextStats.chunkTokens($"s", chunk = 4, stride = 3)).as("c"))
      .select($"s", $"c.chunk_idx", $"c.chunk_text")
      .as[(String, Int, String)].collect()
    val ten = chunks.filter(_._1 == text).sortBy(_._2).map(_._3)
    // windows at 0,3,6 — ceil((10-4)/3)+1 = 3 windows cover all 10 tokens
    assert(ten.toSeq == Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(chunks.filter(_._1 == "short one").map(_._3).toSeq == Seq("short one"))
    assert(chunks.filter(_._1 == "").map(_._3).toSeq == Seq("")) // 1 empty chunk
  }

  test("repetition signals: 0 on all-distinct, high on looped text") {
    val r = Seq("a b c d", "a a a a").toDF("s")
      .select(TextStats.wordRepetition($"s"), TextStats.shingleRepetition($"s", 2))
      .as[(Double, Double)].collect()
    assert(r(0) == ((0.0, 0.0)))
    assert(r(1)._1 == 0.75 && r(1)._2 > 0.6) // 1 distinct of 4; 1 distinct 2-gram of 3
  }

  test("fingerprint is order- and repetition-insensitive") {
    val fp = Seq("b a a b", "a b").toDF("s")
      .select(TextStats.fingerprint($"s")).as[String].collect()
    assert(fp(0) == fp(1))
  }

  test("contentDefinedChunks: concatenation reconstructs, boundaries are edit-local") {
    val a = (1 to 40).map(i => s"w$i").mkString(" ")
    // insert two tokens at the FRONT: every suffix chunk boundary should
    // re-align (same k-grams -> same cuts), unlike fixed windows
    val b = "x y " + a
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val rows = TextStats.contentDefinedChunks(docs, "doc_id", "text", k = 3, m = 4)
      .select($"doc_id", $"chunk_idx", $"chunk_text")
      .as[(Long, Int, String)].collect()
    val ca = rows.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val cb = rows.filter(_._1 == 2L).sortBy(_._2).map(_._3)
    assert(ca.mkString(" ") == a, "chunks must concatenate back to the text")
    assert(cb.mkString(" ") == b)
    // all chunks of a except the first are reproduced verbatim in b's set
    assert(ca.tail.toSet.subsetOf(cb.toSet),
      s"suffix chunks did not re-align after a front insertion:\n a=${ca.toSeq}\n b=${cb.toSeq}")
  }

  test("contentDefinedChunks: short doc is one chunk") {
    val rows = TextStats.contentDefinedChunks(
        Seq((1L, "a b"), (2L, "")).toDF("doc_id", "text"), "doc_id", "text")
      .select($"doc_id", $"chunk_text").as[(Long, String)].collect()
    assert(rows.toSet == Set((1L, "a b"), (2L, "")))
  }

  test("luhnValid: known-valid and known-invalid 16-digit numbers") {
    // 4532015112830366 is a standard Luhn-valid test number; +1 breaks it
    val got = Seq("4532015112830366", "4532015112830367", "0000000000000000")
      .toDF("s").select(TextStats.luhnValid($"s", 16)).as[Boolean].collect()
    assert(got.toSeq == Seq(true, false, true))
  }

  test("repeatedWindowStats: planted repeat counted at every alignment, short docs 0/0") {
    val docs = Seq(
      (1L, "a b c d e f"),  // windows(3): abc bcd cde def
      (2L, "x y a b c d q"),// windows: xya yab abc bcd cdq... abc,bcd shared with doc 1
      (3L, "p q")           // too short -> 0 windows
    ).toDF("doc_id", "text")
    val r = Dedup.repeatedWindowStats(docs, "doc_id", "text", L = 3)
      .select($"doc_id", $"n_windows", $"n_repeated", $"repeat_frac")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(r(0) == ((1L, 4L, 2L, 0.5)))  // abc bcd repeated in doc 2
    assert(r(1) == ((2L, 5L, 2L, 0.4)))
    assert(r(2) == ((3L, 0L, 0L, 0.0)))
  }

  test("vocabJaccard: distinct-token sets, disjoint pairs absent") {
    val docs = Seq(
      (1L, "g1", "a b c a"),    // V1 = {a,b,c} — repeat doesn't inflate
      (2L, "g2", "b c d"),
      (3L, "g3", "x")).toDF("doc_id", "g", "text")
    val out = TextStats.vocabJaccard(docs, "g", "text")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out(("g1", "g2")) == ((2L, 0.5))) // |{b,c}| / |{a,b,c,d}|
    // zero-intersection pairs are ABSENT (inner token join), not 0-rows
    assert(out.size == 1)
  }

  test("distinctiveTerms: log-odds z surfaces each slice's signature term") {
    val docs = Seq((1L, "g1", "a a a b"), (2L, "g2", "b b c c"))
      .toDF("doc_id", "g", "text")
    val out = TextStats.distinctiveTerms(docs, "g", "text", topK = 1)
      .as[(String, String, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(out == Map("g1" -> "a", "g2" -> "c"))
  }

  test("vocabHealth: hapax/dis counts and type-token ratio per slice") {
    val docs = Seq(
      (1L, "g1", "a a b"), (2L, "g2", "c c c")).toDF("doc_id", "g", "text")
    val out = TextStats.vocabHealth(docs, "g", "text")
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("g1") == (("g1", 3L, 2L, 1L, 1L, 0.5, 0.666667)))
    assert(out("g2") == (("g2", 3L, 1L, 0L, 0L, 0.0, 0.333333)))
  }

  test("vocabJaccardSketch: identical vocabularies estimate exactly 1") {
    val docs = Seq(
      (1L, "g1", "a b c d e f g h"),
      (2L, "g2", "h g f e d c b a"), // same set, different order
      (3L, "g3", "x y z")).toDF("doc_id", "g", "text")
    val out = TextStats.vocabJaccardSketch(docs, "g", "text", numHashes = 32)
      .as[(String, String, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val id = out(("g1", "g2"))
    assert(id._3 == 1.0 && id._4 == 1.0 && id._5 == 0.0)
    // disjoint pair: absent from the exact side → absent entirely
    assert(!out.contains(("g1", "g3")))
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("synthesize + partition-batched decode round-trips deterministically") {
    val docs = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    val decoded = Multimodal.decodeBatch(
      Multimodal.synthesizeMedia(docs, "doc_id"), "doc_id")
    val rows = decoded.orderBy("doc_id").collect()
    assert(decoded.schema == Multimodal.decodedSchema)
    assert(rows.length == 2)
    // id=1: w = 4+1 = 5, h = 4+7%11 = 11, nf = 1+1 = 2
    assert(rows(0).getInt(1) == 5 && rows(0).getInt(2) == 11 && rows(0).getInt(3) == 2)
    val again = Multimodal.decodeBatch(
      Multimodal.synthesizeMedia(docs, "doc_id"), "doc_id")
      .orderBy("doc_id").collect()
    assert(rows.sameElements(again))
  }

  test("PPM decoder parses hand-built frames, comments, and rejects malformed streams") {
    // hand-built single frame, NOT from the encoder: 2x1, pixels
    // (1,2,3) (250,251,252), with a header comment
    val hand = ("P6\n# a comment\n2 1\n255\n").getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 250.toByte, 251.toByte, 252.toByte)
    val f = Multimodal.Ppm.decode(hand)
    assert(f == Seq(Multimodal.Ppm.Frame(2, 1, 251, 253, 255)))
    // unsigned read: 250-252 must not come back negative
    assert(f.head.sumAll == 759)
    // two concatenated frames parse as a 2-frame container
    assert(Multimodal.Ppm.decode(hand ++ hand).size == 2)
    // malformed: bad magic, truncated raster, maxval > 255
    intercept[IllegalArgumentException](Multimodal.Ppm.decode("P5\n1 1\n255\n".getBytes ++ Array[Byte](0, 0, 0)))
    intercept[IllegalArgumentException](Multimodal.Ppm.decode("P6\n2 2\n255\n".getBytes ++ Array[Byte](9)))
    intercept[IllegalArgumentException](Multimodal.Ppm.decode("P6\n1 1\n65535\n".getBytes ++ Array[Byte](0, 0, 0)))
    // encoder output is decoder-consistent for a spread of ids
    for (id <- Seq(0L, 3L, 17L, 255L, 1000003L)) {
      val fs = Multimodal.Ppm.decode(Multimodal.Ppm.encodeFrames(id))
      assert(fs.size == (1 + id % 4).toInt)
      assert(fs.head.width == (4 + id % 13).toInt && fs.head.height == (4 + 7 * id % 11).toInt)
    }
  }

  test("hostile headers fail loudly: PPM dims overflow, WAV multi-chunk counts") {
    // 3*w*h would wrap Int: must be IllegalArgumentException, never a
    // silent accept or an ArrayIndexOutOfBounds
    val hostile = "P6\n26755 26755\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3)
    val e = intercept[IllegalArgumentException](Multimodal.Ppm.decode(hostile))
    assert(e.getMessage.contains("truncated raster"))
    intercept[IllegalArgumentException](
      Multimodal.Ppm.decode("P6\n999999999999 2\n255\n".getBytes))
    // two data chunks: samples AND nSamples must both accumulate
    def chunk(samples: Seq[Short]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + 2 * samples.size)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("data".getBytes).putInt(2 * samples.size)
      samples.foreach(bb.putShort)
      bb.array()
    }
    val head = java.nio.ByteBuffer.allocate(36)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    head.put("RIFF".getBytes).putInt(28 + 10 + 8).put("WAVE".getBytes)
    head.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
    val two = head.array() ++ chunk(Seq[Short](1, 2, 3)) ++ chunk(Seq[Short](4))
    val d = Multimodal.Wav.decode(two)
    assert(d.nSamples == 4L && d.sumAbs == 10L && d.peak == 4)
  }

  test("PPM decodeSampled: strided sums match a reference resize, factor 1 = decode") {
    // hand-built 3x2 frame with distinct per-pixel values: factor-2 keeps
    // pixels (x,y) ∈ {0,2}×{0} → source bytes at raster offsets 0-2, 6-8
    val raster = (0 until 18).map(v => (v * 7 % 256).toByte).toArray
    val hand = "P6\n3 2\n255\n".getBytes("US-ASCII") ++ raster
    val got = Multimodal.Ppm.decodeSampled(hand, 2)
    def u(i: Int) = raster(i) & 0xff
    assert(got == Seq(Multimodal.Ppm.Frame(2, 1,
      u(0) + u(6), u(1) + u(7), u(2) + u(8))))
    // factor 1 degenerates to the full decode on every encoder payload
    for (id <- Seq(0L, 3L, 17L, 255L)) {
      val bytes = Multimodal.Ppm.encodeFrames(id)
      assert(Multimodal.Ppm.decodeSampled(bytes, 1) == Multimodal.Ppm.decode(bytes))
    }
    // out dims are ceilings: 5x5 at factor 2 → 3x3
    val five = "P6\n5 5\n255\n".getBytes("US-ASCII") ++ Array.fill(75)(1.toByte)
    val s5 = Multimodal.Ppm.decodeSampled(five, 2).head
    assert(s5.width == 3 && s5.height == 3 && s5.sumAll == 27L)
    // malformed streams still fail through the shared walk
    intercept[IllegalArgumentException](
      Multimodal.Ppm.decodeSampled("P6\n2 2\n255\n".getBytes ++ Array[Byte](9), 2))
  }

  test("WAV decoder walks chunks, handles endianness/signedness, rejects malformed") {
    val enc = Multimodal.Wav.encode(5L) // n = 13 samples
    val d = Multimodal.Wav.decode(enc)
    assert(d.sampleRate == 8000 && d.channels == 1 && d.bits == 16 && d.nSamples == 13)
    // closed form: sample k = ((65 + 7k) % 65536) - 32768 => all near -32768
    val expSamples = (0 until 13).map(k => ((13 * 5 + 7 * k) % 65536) - 32768)
    assert(d.sumAbs == expSamples.map(math.abs(_).toLong).sum)
    assert(d.peak == expSamples.map(math.abs).max)
    // a LIST chunk between fmt and data must be skipped, not choke the parse
    val head = java.util.Arrays.copyOfRange(enc, 0, 36)   // RIFF..fmt chunk end
    val data = java.util.Arrays.copyOfRange(enc, 36, enc.length)
    val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val withList = head ++ list ++ data
    assert(Multimodal.Wav.decode(withList) == d)
    // malformed: not RIFF; float PCM rejected
    intercept[IllegalArgumentException](Multimodal.Wav.decode("JUNK".getBytes ++ enc.drop(4)))
    val floatFmt = enc.clone(); floatFmt(20) = 3 // audioFormat = IEEE float
    intercept[IllegalArgumentException](Multimodal.Wav.decode(floatFmt))
  }

  test("PPM decodeEdges: hand-computed Sobel on a 3x3 gradient frame") {
    // raster bytes 0..26 → gray(x,y) = 9·(3y+x) + 3; the single interior
    // pixel: gx = (21+2·48+75) − (3+2·30+57) = 72, gy = (57+2·66+75) −
    // (3+2·12+21) = 216
    val hand = "P6\n3 3\n255\n".getBytes("US-ASCII") ++
      (0 until 27).map(_.toByte).toArray
    assert(Multimodal.Ppm.decodeEdges(hand) ==
      Seq(Multimodal.Ppm.Frame(1, 1, 72, 216, 288)))
    // flat frame: zero gradients everywhere
    val flat = "P6\n4 4\n255\n".getBytes("US-ASCII") ++ Array.fill(48)(7.toByte)
    val f = Multimodal.Ppm.decodeEdges(flat).head
    assert(f == Multimodal.Ppm.Frame(2, 2, 0, 0, 0))
  }

  test("PPM colorHistogram and dHash: hand-checkable invariants") {
    // flat gray frame: every byte 40 → all three channels bin 2 only
    val flat = "P6\n4 4\n255\n".getBytes("US-ASCII") ++ Array.fill(48)(40.toByte)
    val bins = Multimodal.Ppm.colorHistogram(flat)
    for (c <- 0 until 3; b <- 0 until 16)
      assert(bins(c)(b) == (if (b == 2) 16L else 0L), s"channel $c bin $b")
    // flat frame: no g(x+1) > g(x) anywhere → dHash all-zero
    assert(Multimodal.Ppm.dHash(flat) == ((0L, 0L)))
    // horizontal ramp: every right neighbor with a strictly larger sx
    // is brighter; on a 9-wide frame sx = gx (w/9 = 1 floor) — all
    // 64 bits set except columns where sx ties... w=9: sx = gx*9/9 = gx,
    // strictly increasing → every bit set
    val ramp = "P6\n9 8\n255\n".getBytes("US-ASCII") ++
      Array.tabulate(3 * 9 * 8)(i => ((i / 3) % 9 * 20).toByte)
    val (hi, lo) = Multimodal.Ppm.dHash(ramp)
    assert(hi == 0xffffffffL && lo == 0xffffffffL)
    // silence: a frame of zeros is silent, a full-scale frame is not
    def wav(samples: Seq[Short]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + 2 * samples.size)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + 2 * samples.size).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
        .putInt(8000).putInt(16000).putShort(2).putShort(16)
      bb.put("data".getBytes).putInt(2 * samples.size)
      samples.foreach(bb.putShort)
      bb.array()
    }
    val quietLoud = wav(Seq.fill[Short](8)(0) ++ Seq.fill[Short](8)(20000) ++
      Seq.fill[Short](3)(1))  // ragged tail of 3 dropped
    assert(Multimodal.Wav.silence(quietLoud, 8, 100000000L) == ((2L, 1L)))
  }

  test("WAV features: consecutive-sign zero crossings and integer energy") {
    val enc = Multimodal.Wav.encode(5L)
    val exp = (0 until 13).map(k => ((13 * 5 + 7 * k) % 65536) - 32768)
    val f = Multimodal.Wav.features(enc)
    assert(f.nSamples == 13L)
    assert(f.energy == exp.map(v => v.toLong * v).sum)
    assert(f.zeroCross ==
      exp.sliding(2).count(p => p(0).toLong * p(1) < 0))
    // hand case through the shared walk: +1 -1 +1 0 -1 → crossings at
    // (+1,-1), (-1,+1); the zero breaks the (+1 → -1) run (strict rule)
    val samples = Seq[Short](1, -1, 1, 0, -1)
    val bb = java.nio.ByteBuffer.allocate(44 + 10)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + 10).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(10)
    samples.foreach(bb.putShort)
    val hand = Multimodal.Wav.features(bb.array())
    assert(hand == Multimodal.Wav.Features(5L, 2L, 4L))
  }

  test("metadata matches payload bytes") {
    val m = Multimodal.ingestAsBinary(Seq((1L, "abc")).toDF("doc_id", "text"), "text", "t")
      .select($"meta.n_bytes", $"meta.content_md5").as[(Long, String)].head()
    assert(m._1 == 3L)
    assert(m._2 == "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
  }

  test("frame sampling fans out per stride; resize plan preserves aspect") {
    val docs = Seq((1L, "some payload"), (2L, "other bytes")).toDF("doc_id", "text")
    val decoded = Multimodal.decodeBatch(
      Multimodal.synthesizeMedia(docs, "doc_id"), "doc_id")
    val frames = Multimodal.sampleFrames(decoded, stride = 1)
    val perDoc = frames.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    val nFrames = decoded.select($"doc_id", $"n_frames").as[(Long, Int)].collect().toMap
    assert(perDoc == nFrames.map { case (k, v) => k -> v.toLong })
    val strided = Multimodal.sampleFrames(decoded, stride = 2)
    assert(strided.count() == nFrames.values.map(n => (n + 1) / 2).sum)

    val resized = Multimodal.resizePlan(decoded, maxSide = 20)
      .select($"width", $"height", $"out_width", $"out_height")
      .as[(Int, Int, Int, Int)].collect()
    resized.foreach { case (w, h, ow, oh) =>
      assert(ow <= 20 || oh <= 20)
      assert(math.max(ow, oh) <= 20)
      if (w > h) assert(ow >= oh) else if (h > w) assert(oh >= ow)
    }
  }

  test("aspect bucketing: nearest ladder ratio wins, ties to the earlier entry") {
    val ladder = Seq((1, 1), (4, 3), (3, 4), (16, 9), (9, 16))
    val imgs = Seq(
      (1L, 100, 100),  // exactly 1:1
      (2L, 400, 300),  // exactly 4:3
      (3L, 90, 160),   // exactly 9:16
      (4L, 110, 100))  // closest to 1:1 (d=10·?) vs 4:3
      .toDF("doc_id", "width", "height")
    val out = Multimodal.aspectBuckets(imgs, "doc_id", "width", "height",
        ladder, batchSize = 2)
      .select($"doc_id", $"bucket", $"bucket_ratio")
      .as[(Long, Int, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((0, "1:1")))
    assert(out(2L) == ((1, "4:3")))
    assert(out(3L) == ((4, "9:16")))
    assert(out(4L)._2 == "1:1") // |110·1−100·1|=10 < |110·3−100·4|=70
    // a square image ties 4:3 against 3:4? no — 1:1 is exact; check an
    // actual tie: w=7,h=5 → d(16:9)=|63−80|=17, d(4:3)=|21−20|=1 → 4:3
    val tie = Multimodal.aspectBuckets(
        Seq((9L, 7, 5)).toDF("doc_id", "width", "height"), "doc_id",
        "width", "height", Seq((4, 3), (3, 4)), 2)
      .select($"bucket").as[Int].head()
    assert(tie == 0)
  }

  test("aspect bucketing: batches fill to batchSize within each bucket, id order") {
    val imgs = (1L to 10L).map(i => (i, 50, 50)).toDF("doc_id", "width", "height")
    val out = Multimodal.aspectBuckets(imgs, "doc_id", "width", "height",
        Seq((1, 1), (4, 3)), batchSize = 4)
      .select($"doc_id", $"bucket", $"batch_idx")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(out.forall(_._2 == 0)) // all square → one bucket
    assert(out.map(_._3).toSeq == Seq(0, 0, 0, 0, 1, 1, 1, 1, 2, 2))
  }
}

class VectorOpsSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("primitive cosine expression is bit-identical to the lambda path") {
    val emb = graft.Tables.embeddings(spark, sfTiny)
    val q = emb.filter($"vec_id" === 3).select($"embedding".as("qvec"))
    val both = emb.crossJoin(broadcast(q)).select(
      Similarity.cosine($"embedding", $"qvec").as("fast"),
      Similarity.cosineLambda($"embedding", $"qvec").as("slow"))
      .as[(Double, Double)].collect()
    both.foreach { case (f, sl) =>
      assert(java.lang.Double.doubleToLongBits(f) == java.lang.Double.doubleToLongBits(sl))
    }
  }

  test("IVF-PQ with every cell probed equals the plain ADC scan") {
    val emb = graft.Tables.embeddings(spark, sfTiny)
    val centroids = emb.filter($"vec_id" < 16)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq
    val cb = emb.orderBy($"vec_id").limit(16).select($"embedding").collect()
      .zipWithIndex.map { case (r, i) => i -> r.getSeq[Float](0).toArray }.toSeq
    val qvec = emb.filter($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).toArray
    val everyCell = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
        centroids, cb, 8, qvec, k = 10, nprobe = 16)
      .as[(Long, Double)].collect().toSeq
    val plain = Similarity.pqAdcTopK(emb, "vec_id", "embedding", cb, 8, qvec, 10)
      .as[(Long, Double)].collect().toSeq
    assert(everyCell == plain, "nprobe=K must degenerate to the full ADC scan")
    // and a 2-cell probe returns a subset of the probed cells only
    val probed = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
        centroids, cb, 8, qvec, k = 10, nprobe = 2)
      .as[(Long, Double)].collect().map(_._1).toSet
    val cellOf = emb.select($"vec_id",
        Similarity.ivfCell($"embedding", centroids).as("c"))
      .as[(Long, Int)].collect().toMap
    val qCells = probed.map(cellOf)
    assert(qCells.size <= 2, s"candidates leaked outside the probed cells: $qCells")
  }

  test("sign packing sets exactly the positive-dim bits, 32 per word") {
    // dims 0, 1, 33, 63 positive → word0 = b0+b1, word1 = b1+b31
    val v = Array.fill(64)(-1.0f)
    v(0) = 0.5f; v(1) = 2f; v(33) = 1f; v(63) = 0.25f
    val df = Seq((1L, v.toSeq)).toDF("vec_id", "embedding")
    val packed = df.select(Similarity.signPack32($"embedding", 64))
      .as[Seq[Long]].head()
    assert(packed == Seq((1L << 0) + (1L << 1), (1L << 1) + (1L << 31)))
    // zero is NOT positive: sign bit clear
    val z = Seq((1L, Seq.fill(64)(0.0f))).toDF("vec_id", "embedding")
    assert(z.select(Similarity.signPack32($"embedding", 64))
      .as[Seq[Long]].head() == Seq(0L, 0L))
  }

  test("hamming distance counts differing sign bits; self-distance is 0") {
    val a = Array.fill(64)(1.0f)
    val b = a.clone(); b(5) = -1f; b(40) = -1f; b(63) = -1f
    val df = Seq((a.toSeq, b.toSeq)).toDF("va", "vb")
    val d = df.select(
        Similarity.hammingDist(Similarity.signPack32($"va", 64),
          Similarity.signPack32($"vb", 64)).as("d"),
        Similarity.hammingDist(Similarity.signPack32($"va", 64),
          Similarity.signPack32($"va", 64)).as("self"))
      .as[(Int, Int)].head()
    assert(d == ((3, 0)))
  }

  test("hamming top-k ranks the query itself first with distance 0") {
    val emb = graft.Tables.embeddings(spark, sfTiny)
    val q0 = emb.filter($"vec_id" === 0L).select($"embedding")
      .head().getSeq[Float](0)
    val words = (0 until 2).map { w =>
      (0 until 32).map(j => if (q0(32 * w + j) > 0) 1L << j else 0L).sum
    }
    val top = Similarity.hammingTopK(emb, "vec_id", "embedding", words, 64, 5)
      .as[(Long, Int)].collect()
    assert(top.head == ((0L, 0)))
    assert(top.map(_._2).sorted.sameElements(top.map(_._2)), "ascending distances")
  }

  test("mahalanobisDiag: the planted outlier tops the score list") {
    // dim0 constant (zero variance → 0 contribution); dim1 has one
    // far-out value that must dominate
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.1f)),
      (2L, Array(1.0f, -0.1f)), (3L, Array(1.0f, 10.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.mahalanobisDiag(emb, "vec_id", "embedding", topK = 4)
      .as[(Long, Double)].collect()
    assert(out.head._1 == 3L)                  // planted outlier first
    assert(out.head._2 > out(1)._2 * 2)        // by a wide margin
    assert(out.map(_._2).forall(_ >= 0.0))
  }
}
