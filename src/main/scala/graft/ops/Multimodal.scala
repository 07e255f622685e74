package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, batch-decoded per partition.
  *
  * The decoders are REAL pure-JVM parsers of uncompressed containers —
  * PPM P6 (Netpbm: ASCII header + raw RGB bytes; the spec permits
  * multiple images concatenated in one stream, which is this library's
  * multi-frame container) and WAV (RIFF chunk walk + PCM samples). No
  * codec library is needed for either, so the decode path carries no
  * stub: header validation, comment handling, chunk skipping, and pixel/
  * sample arithmetic all execute on the actual bytes. Compressed formats
  * (JPEG/MP3) would swap the per-partition decode function only — the
  * Spark-side shape (binary column + metadata struct, `mapPartitions`
  * batching so one decoder instance amortises across a partition, an
  * explicit output schema) is the same.
  */
object Multimodal {

  /** Media metadata carried alongside every binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("content_md5", StringType, nullable = false),
    StructField("media_type", StringType, nullable = false)))

  /** Wrap a text column as a binary payload column + metadata struct —
    * the ingest shape for opaque media. Pure expressions. */
  def ingestAsBinary(df: DataFrame, srcCol: String, mediaType: String): DataFrame =
    df.withColumn("content", encode(col(srcCol), "UTF-8"))
      .withColumn("meta", struct(
        octet_length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("content_md5"),
        lit(mediaType).as("media_type")))

  /** The decoded-frame schema a real decoder would produce. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("checksum", LongType)))

  /** PPM P6 codec (Netpbm, https://netpbm.sourceforge.net/doc/ppm.html):
    * per frame, the ASCII header `P6 <w> <h> <maxval>` (tokens separated
    * by whitespace, `#`-to-newline comments legal anywhere in the header)
    * followed by ONE whitespace byte and then 3·w·h raw sample bytes
    * (maxval ≤ 255 ⇒ 1 byte/sample). The format permits several images
    * back-to-back in one stream — the multi-frame container here. */
  object Ppm {
    /** Deterministic synthetic payload for doc `id`: nf = 1 + id%4 frames
      * of w = 4 + id%13 by h = 4 + (7·id)%11 RGB pixels, frame f's sample
      * i = (31·id + 97·f + i) mod 256. The closed form is what the DuckDB
      * oracle recomputes, so a green gate proves the DECODER inverted the
      * actual bytes (parse bug ⇒ stats mismatch). */
    def encodeFrames(id: Long): Array[Byte] = {
      val w = (4 + id % 13).toInt
      val h = (4 + (7 * id) % 11).toInt
      val nf = (1 + id % 4).toInt
      val out = new java.io.ByteArrayOutputStream()
      var f = 0
      while (f < nf) {
        out.write(s"P6\n$w $h\n255\n".getBytes("US-ASCII"))
        var i = 0
        val n = 3 * w * h
        while (i < n) {
          out.write(((31 * id + 97 * f + i) % 256).toInt)
          i += 1
        }
        f += 1
      }
      out.toByteArray
    }

    /** One decoded frame: dims + per-channel unsigned byte sums. */
    final case class Frame(width: Int, height: Int,
        sumR: Long, sumG: Long, sumB: Long) {
      def sumAll: Long = sumR + sumG + sumB
    }

    /** Parse every concatenated frame; throws IllegalArgumentException on
      * a malformed stream (bad magic, missing token, maxval > 255,
      * truncated raster) — decoder behavior, not stub behavior. */
    def decode(bytes: Array[Byte]): Seq[Frame] =
      parseFrames(bytes) { (w, h, raster, at) =>
        var sr = 0L; var sg = 0L; var sb = 0L
        val n = 3 * w * h
        var i = 0
        while (i < n) {
          val v = at(raster + i)
          (i % 3: @annotation.switch) match {
            case 0 => sr += v
            case 1 => sg += v
            case _ => sb += v
          }
          i += 1
        }
        Frame(w, h, sr, sg, sb)
      }

    /** Nearest-neighbor downsample fused into the parse: out pixel
      * (x, y) = source pixel (factor·x, factor·y), out dims =
      * ⌈w/factor⌉ × ⌈h/factor⌉ — the raster is STRIDED, never
      * materialized, so the decode stays one pass over the bytes.
      * Returns the downsampled frames' dims + channel sums. */
    def decodeSampled(bytes: Array[Byte], factor: Int): Seq[Frame] = {
      require(factor >= 1, s"factor must be >= 1, got $factor")
      parseFrames(bytes) { (w, h, raster, at) =>
        val ow = (w + factor - 1) / factor
        val oh = (h + factor - 1) / factor
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            val base = raster + 3 * (factor * y * w + factor * x)
            sr += at(base); sg += at(base + 1); sb += at(base + 2)
            x += 1
          }
          y += 1
        }
        Frame(ow, oh, sr, sg, sb)
      }
    }

    /** Per-channel 16-bin color histogram (bin = value ÷ 16) summed
      * over every frame — the palette-profile feature an image-quality
      * filter reads (a near-flat histogram = noise; a one-bin spike =
      * a blank/solid image). Integer counts, one parse pass.
      * Returns counts[channel 0..2][bin 0..15]. */
    def colorHistogram(bytes: Array[Byte]): Array[Array[Long]] = {
      val bins = Array.ofDim[Long](3, 16)
      parseFrames(bytes) { (w, h, raster, at) =>
        val n = 3 * w * h
        var i = 0
        while (i < n) {
          bins(i % 3)((at(raster + i) / 16).toInt) += 1
          i += 1
        }
        Frame(w, h, 0L, 0L, 0L)
      }
      bins
    }

    /** dHash perceptual hash (difference hash — the classic cheap
      * near-duplicate image fingerprint): the FIRST frame is sampled on
      * a 9×8 nearest-floor grid (sx = gx·w ÷ 9, sy = gy·h ÷ 8),
      * grayscale g = r+g+b, bit (gy·8 + gx) set iff g(gx+1,·) >
      * g(gx,·). Returned as (hi, lo) 32-bit halves so neither engine
      * touches the sign bit. Integer end to end. */
    def dHash(bytes: Array[Byte]): (Long, Long) = {
      val frames = parseFrames(bytes) { (w, h, raster, at) =>
        Frame(w, h, raster.toLong, 0L, 0L) // carry the offset out
      }
      val f0 = frames.head
      val (w, h, raster) = (f0.width, f0.height, f0.sumR.toInt)
      // re-read bytes via the same offset (parseFrames validated them)
      def g(gx: Int, gy: Int): Long = {
        val sx = gx * w / 9; val sy = gy * h / 8
        val base = raster + 3 * (sy * w + sx)
        (bytes(base) & 0xffL) + (bytes(base + 1) & 0xffL) +
          (bytes(base + 2) & 0xffL)
      }
      var hi = 0L; var lo = 0L
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          if (g(gx + 1, gy) > g(gx, gy)) {
            val b = gy * 8 + gx
            if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
          }
          gx += 1
        }
        gy += 1
      }
      (hi, lo)
    }

    /** Sobel edge extraction fused into the parse: per frame, grayscale
      * g(x,y) = r+g+b (integer, no division), 3×3 Sobel over INTERIOR
      * pixels, per-frame Σ|gx| / Σ|gy| / Σ(|gx|+|gy|) — returned in the
      * Frame's channel slots with width/height = the interior dims.
      * Integer convolution end to end: engine-exact. */
    def decodeEdges(bytes: Array[Byte]): Seq[Frame] =
      parseFrames(bytes) { (w, h, raster, at) =>
        def g(x: Int, y: Int): Long = {
          val base = raster + 3 * (y * w + x)
          at(base) + at(base + 1) + at(base + 2)
        }
        var sgx = 0L; var sgy = 0L; var se = 0L
        var y = 1
        while (y < h - 1) {
          var x = 1
          while (x < w - 1) {
            val gx = (g(x + 1, y - 1) + 2 * g(x + 1, y) + g(x + 1, y + 1)) -
              (g(x - 1, y - 1) + 2 * g(x - 1, y) + g(x - 1, y + 1))
            val gy = (g(x - 1, y + 1) + 2 * g(x, y + 1) + g(x + 1, y + 1)) -
              (g(x - 1, y - 1) + 2 * g(x, y - 1) + g(x + 1, y - 1))
            sgx += math.abs(gx); sgy += math.abs(gy)
            se += math.abs(gx) + math.abs(gy)
            x += 1
          }
          y += 1
        }
        Frame(math.max(w - 2, 0), math.max(h - 2, 0), sgx, sgy, se)
      }

    /** The shared header/raster walk: validates each frame, hands
      * (w, h, rasterOffset, unsigned-byte reader) to `fold`, advances
      * past the raster, and enforces cross-frame dimension agreement
      * on the ORIGINAL dims. */
    private def parseFrames(bytes: Array[Byte])
        (fold: (Int, Int, Int, Int => Long) => Frame): Seq[Frame] = {
      var pos = 0
      def fail(msg: String) =
        throw new IllegalArgumentException(s"PPM parse error at byte $pos: $msg")
      def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
      // whitespace + `#` comments between header tokens
      def skipWs(): Unit = {
        var go = true
        while (go && pos < bytes.length) {
          if (isWs(bytes(pos))) pos += 1
          else if (bytes(pos) == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
          else go = false
        }
      }
      def asciiInt(): Int = {
        skipWs()
        val start = pos
        var v = 0L
        while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
          v = v * 10 + (bytes(pos) - '0'); pos += 1
          if (v > 1000000000L) fail("header integer out of range")
        }
        if (pos == start) fail("expected ASCII integer")
        v.toInt
      }
      val frames = Seq.newBuilder[Frame]
      val dims = Seq.newBuilder[(Int, Int)]
      while (pos < bytes.length) {
        if (pos + 2 > bytes.length || bytes(pos) != 'P' || bytes(pos + 1) != '6')
          fail("bad magic (want P6)")
        pos += 2
        val w = asciiInt(); val h = asciiInt(); val maxval = asciiInt()
        if (w <= 0 || h <= 0) fail(s"bad dims ${w}x$h")
        if (maxval <= 0 || maxval > 255) fail(s"unsupported maxval $maxval")
        if (pos >= bytes.length || !isWs(bytes(pos))) fail("missing raster separator")
        pos += 1 // exactly ONE whitespace byte before the raster (spec)
        // Long arithmetic: 3*w*h can wrap Int for hostile headers, which
        // would slide past the truncation check instead of failing loudly
        val n = 3L * w * h
        if (n > bytes.length - pos) fail(s"truncated raster (need $n bytes)")
        dims += ((w, h))
        frames += fold(w, h, pos, idx => (bytes(idx) & 0xffL))
        pos += n.toInt
      }
      val out = frames.result()
      if (out.isEmpty) fail("empty stream")
      val ds = dims.result()
      if (ds.exists(_ != ds.head)) fail("frames disagree on dimensions")
      out
    }
  }

  /** Synthesize the deterministic PPM payload column for each row —
    * the "fetch blob bytes" stage of a real pipeline, partition-batched
    * like the decode. Output: (id, content, meta). */
  def synthesizeMedia(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"))
      .mapPartitions { rows =>
        rows.map { r => val id = r.getLong(0); Row(id, Ppm.encodeFrames(id)) }
      }(enc)
      .withColumn("meta", struct(
        octet_length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("content_md5"),
        lit("image/x-portable-pixmap").as("media_type")))
  }

  /** Partition-batched REAL decode: one decoder per partition, rows
    * streamed through it. `mapPartitions` (not a per-row UDF) so decoder
    * state amortizes across the partition — the standard Spark shape for
    * heavy native decode at scale. `checksum` = Σ unsigned sample bytes
    * over all frames (exact integer — engine-portable). */
  def decodeBatch(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedSchema)
    val input = df.select(col(idCol).cast("long"), col("content"))
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val frames = Ppm.decode(r.getAs[Array[Byte]](1))
        Row(id, frames.head.width, frames.head.height, frames.size,
          frames.iterator.map(_.sumAll).sum)
      }
    }(enc)
  }

  /** Per-channel pixel statistics across all frames — the feature-extract
    * stage (exact integer sums + round-6 means). */
  def decodeImageStats(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_pixels", LongType),
      StructField("sum_r", LongType),
      StructField("sum_g", LongType),
      StructField("sum_b", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val frames = Ppm.decode(r.getAs[Array[Byte]](1))
          val px = frames.iterator.map(f => f.width.toLong * f.height).sum
          Row(r.getLong(0), px, frames.iterator.map(_.sumR).sum,
            frames.iterator.map(_.sumG).sum, frames.iterator.map(_.sumB).sum)
        }
      }(enc)
      .withColumn("mean_r", round(col("sum_r").cast("double") / col("n_pixels"), 6))
      .withColumn("mean_g", round(col("sum_g").cast("double") / col("n_pixels"), 6))
      .withColumn("mean_b", round(col("sum_b").cast("double") / col("n_pixels"), 6))
  }

  /** REAL downsample pass: nearest-neighbor ÷`factor` resize fused into
    * the PPM parse (`Ppm.decodeSampled` — strided reads, no raster
    * materialization), then the same per-channel stats as
    * [[decodeImageStats]]. The thumbnail/preview stage of an image
    * pipeline with the identical partition-batched map-only shape: at
    * 100 TB this is the op that cuts pixel volume ~factor² before any
    * feature extraction. Output: (idCol, n_pixels, sum_r, sum_g, sum_b,
    * mean_r, mean_g, mean_b) over the RESIZED rasters. */
  def downsampleStats(df: DataFrame, idCol: String, factor: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_pixels", LongType),
      StructField("sum_r", LongType),
      StructField("sum_g", LongType),
      StructField("sum_b", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val frames = Ppm.decodeSampled(r.getAs[Array[Byte]](1), factor)
          val px = frames.iterator.map(f => f.width.toLong * f.height).sum
          Row(r.getLong(0), px, frames.iterator.map(_.sumR).sum,
            frames.iterator.map(_.sumG).sum, frames.iterator.map(_.sumB).sum)
        }
      }(enc)
      .withColumn("mean_r", round(col("sum_r").cast("double") / col("n_pixels"), 6))
      .withColumn("mean_g", round(col("sum_g").cast("double") / col("n_pixels"), 6))
      .withColumn("mean_b", round(col("sum_b").cast("double") / col("n_pixels"), 6))
  }

  /** WAV (RIFF) codec: canonical PCM little-endian layout — `RIFF <size>
    * WAVE`, then chunks; `fmt ` carries (audioFormat=1, channels, rate,
    * bits), `data` carries the samples. The decoder WALKS chunks (skipping
    * unknown ones, e.g. LIST/INFO) rather than assuming the canonical
    * 44-byte offset — real-world WAV files interleave metadata chunks. */
  object Wav {
    /** Deterministic mono 16-bit 8 kHz payload for doc `id`:
      * n = 8 + id%32 samples, sample k = ((13·id + 7·k) mod 65536) −
      * 32768 — the closed form the oracle recomputes. */
    def encode(id: Long): Array[Byte] = {
      val n = (8 + id % 32).toInt
      val dataLen = n * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000)
        .putShort(2).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      var k = 0
      while (k < n) {
        bb.putShort((((13 * id + 7 * k) % 65536) - 32768).toShort)
        k += 1
      }
      bb.array()
    }

    final case class Decoded(sampleRate: Int, channels: Int, bits: Int,
        nSamples: Long, sumAbs: Long, peak: Int)

    def decode(bytes: Array[Byte]): Decoded = {
      var sumAbs = 0L; var peak = 0
      val (rate, ch, bits, n) = walkPcm(bytes) { v =>
        val a = math.abs(v)
        sumAbs += a
        if (a > peak) peak = a
      }
      Decoded(rate, ch, bits, n, sumAbs, peak)
    }

    /** Audio features from one fused sample pass: strict-sign zero
      * crossings between CONSECUTIVE samples (v_{k-1}·v_k < 0, the
      * product rule — a zero sample never crosses) and integer energy
      * Σv² (Long-safe: ≤ 2³⁰ per sample). */
    final case class Features(nSamples: Long, zeroCross: Long, energy: Long)

    def features(bytes: Array[Byte]): Features = {
      var zc = 0L; var energy = 0L; var prev = 0
      val (_, _, _, n) = walkPcm(bytes) { v =>
        if (prev.toLong * v < 0) zc += 1
        prev = v
        energy += v.toLong * v
      }
      Features(n, zc, energy)
    }

    /** Frame-wise silence detection in the same fused pass: samples
      * group into complete `frame`-sized windows (the ragged tail is
      * dropped, the standard STE convention); a frame is silent when
      * its energy < `thresholdMeanSq`·frame — an integer compare, no
      * division. Returns (nFrames, nSilent). */
    def silence(bytes: Array[Byte], frame: Int,
        thresholdMeanSq: Long): (Long, Long) = {
      require(frame >= 1, s"frame must be >= 1, got $frame")
      var nf = 0L; var silent = 0L; var acc = 0L; var k = 0
      walkPcm(bytes) { v =>
        acc += v.toLong * v
        k += 1
        if (k == frame) {
          nf += 1
          if (acc < thresholdMeanSq * frame) silent += 1
          acc = 0L; k = 0
        }
      }
      (nf, silent)
    }

    /** The shared RIFF chunk walk: validates RIFF/WAVE/fmt/data, feeds
      * every 16-bit sample to `onSample`, returns
      * (rate, channels, bits, nSamples). */
    private def walkPcm(bytes: Array[Byte])
        (onSample: Int => Unit): (Int, Int, Int, Long) = {
      def fail(msg: String) = throw new IllegalArgumentException(s"WAV parse error: $msg")
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(): String = { val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII") }
      if (bytes.length < 12 || tag() != "RIFF") fail("missing RIFF")
      bb.getInt() // riff size — trust the chunk walk, not this field
      if (tag() != "WAVE") fail("missing WAVE")
      var rate = -1; var ch = -1; var bits = -1
      var nSamples = 0L
      var sawData = false
      while (bb.remaining() >= 8) {
        val id = tag(); val len = bb.getInt()
        if (len < 0 || len > bb.remaining()) fail(s"chunk $id overruns payload")
        id match {
          case "fmt " =>
            if (len < 16) fail("fmt chunk too short")
            val start = bb.position()
            val audioFormat = bb.getShort()
            if (audioFormat != 1) fail(s"not PCM (format $audioFormat)")
            ch = bb.getShort(); rate = bb.getInt()
            bb.getInt(); bb.getShort() // byte rate, block align
            bits = bb.getShort()
            if (bits != 16) fail(s"only 16-bit PCM supported, got $bits")
            bb.position(start + len + (len & 1)) // chunks are word-aligned
          case "data" =>
            if (rate < 0) fail("data chunk before fmt")
            if (len % 2 != 0) fail("odd data length for 16-bit PCM")
            var i = 0
            while (i < len / 2) {
              onSample(bb.getShort().toInt)
              i += 1
            }
            nSamples += len / 2 // += : multi-data-chunk files accumulate
            sawData = true
          case _ => // skip unknown chunk (LIST, INFO, fact, ...)
            bb.position(bb.position() + len + (len & 1))
        }
      }
      if (!sawData) fail("no data chunk")
      (rate, ch, bits, nSamples)
    }
  }

  /** Synthesize the deterministic WAV payload column. */
  def synthesizeWav(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"))
      .mapPartitions { rows =>
        rows.map { r => val id = r.getLong(0); Row(id, Wav.encode(id)) }
      }(enc)
      .withColumn("meta", struct(
        octet_length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("content_md5"),
        lit("audio/wav").as("media_type")))
  }

  /** Partition-batched WAV decode → per-doc audio stats. */
  def decodeWavBatch(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("n_channels", IntegerType),
      StructField("bits_per_sample", IntegerType),
      StructField("n_samples", LongType),
      StructField("sum_abs", LongType),
      StructField("peak", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val d = Wav.decode(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), d.sampleRate, d.channels, d.bits, d.nSamples,
            d.sumAbs, d.peak)
        }
      }(enc)
  }

  /** REAL image feature extraction over the PPM decode path: Sobel
    * edge density per document — Σ|gx|, Σ|gy|, and the mean edge
    * magnitude over every interior pixel of every frame (the cheap
    * blur/richness discriminator an image-quality filter thresholds
    * on). Same partition-batched map-only shape as the decoders;
    * integer convolution makes the one division engine-exact.
    * Output: (idCol, n_interior, sum_gx, sum_gy, edge_sum, mean_edge). */
  def edgeStats(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_interior", LongType),
      StructField("sum_gx", LongType),
      StructField("sum_gy", LongType),
      StructField("edge_sum", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val frames = Ppm.decodeEdges(r.getAs[Array[Byte]](1))
          val n = frames.iterator.map(f => f.width.toLong * f.height).sum
          Row(r.getLong(0), n, frames.iterator.map(_.sumR).sum,
            frames.iterator.map(_.sumG).sum, frames.iterator.map(_.sumB).sum)
        }
      }(enc)
      .withColumn("mean_edge", when(col("n_interior") > 0,
        round(col("edge_sum").cast("double") /
          col("n_interior").cast("double"), 6)).otherwise(lit(0.0)))
  }

  /** Frame-wise silence profile per document (short-time-energy gate):
    * complete `frame`-sample windows, silent when mean-square <
    * `thresholdMeanSq` (integer compare inside the fused pass).
    * Output: (idCol, n_frames, n_silent, silence_ratio). */
  def silenceStats(df: DataFrame, idCol: String, frame: Int = 8,
      thresholdMeanSq: Long = 100000000L): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_frames", LongType),
      StructField("n_silent", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val (nf, ns) = Wav.silence(r.getAs[Array[Byte]](1), frame,
            thresholdMeanSq)
          Row(r.getLong(0), nf, ns)
        }
      }(enc)
      .withColumn("silence_ratio", when(col("n_frames") > 0,
        round(col("n_silent").cast("double") /
          col("n_frames").cast("double"), 6)).otherwise(lit(0.0)))
  }

  /** Per-channel 16-bin color histogram per document, exploded to
    * (idCol, channel, bin, n) rows — the palette profile as a narrow
    * fact the rest of the engine can aggregate. Map-only decode pass;
    * 48 rows per document. */
  def colorHistogramStats(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("channel", IntegerType),
      StructField("bin", IntegerType),
      StructField("n", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bins = Ppm.colorHistogram(r.getAs[Array[Byte]](1))
          for (c <- 0 until 3; b <- 0 until 16 if bins(c)(b) > 0L)
            yield Row(r.getLong(0), c, b, bins(c)(b))
        }
      }(enc)
  }

  /** dHash perceptual fingerprint per document (first frame, 9×8
    * nearest-floor grid): the constant-size key an image near-dup pass
    * bands on (exact-match or Hamming-bucket join downstream — the
    * SimHash discipline applied to pixels).
    * Output: (idCol, dhash_hi, dhash_lo). */
  def dhashes(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("dhash_hi", LongType),
      StructField("dhash_lo", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val (hi, lo) = Ppm.dHash(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), hi, lo)
        }
      }(enc)
  }

  /** REAL audio feature extraction over the WAV decode path: strict
    * zero-crossing count and integer energy from ONE fused sample pass
    * (`Wav.features`), then ZCR = zc/(n−1) and RMS = √(energy/n) —
    * the two classic cheap speech/music discriminators. Same
    * partition-batched map-only shape as the decoders; integer counts
    * make the doubles engine-exact (sqrt is IEEE correctly-rounded).
    * Output: (idCol, n_samples, zero_cross, energy, zcr, rms). */
  def audioFeatures(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_samples", LongType),
      StructField("zero_cross", LongType),
      StructField("energy", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val f = Wav.features(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), f.nSamples, f.zeroCross, f.energy)
        }
      }(enc)
      .withColumn("zcr", when(col("n_samples") > 1,
        round(col("zero_cross").cast("double") /
          (col("n_samples") - 1).cast("double"), 6)).otherwise(lit(0.0)))
      .withColumn("rms", round(sqrt(col("energy").cast("double") /
        col("n_samples").cast("double")), 6))
  }

  /** Frame sampling as a lateral explode (the UDTF shape): every decoded
    * row fans out to ceil(n_frames / `stride`) frame rows with a
    * deterministic per-frame checksum (a real sampler would emit the
    * decoded frame tensor here). Pure generator expression — distributes
    * with the row, no shuffle. */
  def sampleFrames(decoded: DataFrame, stride: Int = 1): DataFrame =
    decoded.select(col("doc_id"), col("width"), col("height"),
        posexplode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as(Seq("k", "frame_idx")))
      .select(col("doc_id"), col("width"), col("height"), col("frame_idx"),
        // stand-in for the frame payload: id-and-index-derived checksum
        (col("doc_id") * 1000003L + col("frame_idx")).as("frame_checksum"))

  /** Ranged-read fetch plan: for each blob, the k byte ranges a remote
    * reader should GET to sample frames WITHOUT pulling the whole blob
    * — at 100 TB the ranged-GET plan IS the frame sampler (full-blob
    * reads for a 1 % frame sample waste 99 % of the egress). Offsets
    * spread evenly over [0, n_bytes − frameBytes] in pure integer
    * arithmetic (engine-exact); blobs smaller than one frame emit a
    * single whole-blob range. Output: (id, frame_idx, offset, length).
    */
  def byteRangePlan(meta: DataFrame, idCol: String, nBytesCol: String,
      frameBytes: Long, k: Int): DataFrame = {
    require(frameBytes > 0 && k >= 2, "frameBytes > 0, k >= 2")
    val n = col(nBytesCol).cast("long")
    meta.select(col(idCol), n.as("__nb"))
      .select(col(idCol),
        posexplode(sequence(lit(0), lit(k.toLong - 1))).as(Seq("__p", "frame_idx")),
        col("__nb"))
      .select(col(idCol), col("frame_idx"),
        when(col("__nb") <= frameBytes, lit(0L))
          .otherwise((col("frame_idx") * (col("__nb") - frameBytes)) / (k - 1))
          .cast("long").as("offset"),
        least(lit(frameBytes), col("__nb")).as("length"))
  }

  /** Resize plan: fit (width, height) into a `maxSide` box preserving
    * aspect ratio, computed as pure integer expressions (the real pixel
    * work belongs in the partition-batched decoder; the PLANNED output
    * dims are what downstream batching/packing needs). */
  def resizePlan(decoded: DataFrame, maxSide: Int): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    val scale = when(longest <= maxSide, lit(1.0))
      .otherwise(lit(maxSide.toDouble) / longest.cast("double"))
    decoded
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }

  /** ASPECT-RATIO BUCKETING for image batching (the SDXL-style trainer
    * prep: images batch with same-shaped peers so a batch crops/pads to
    * ONE canvas): each image goes to the ladder entry minimizing
    * |w·rh − h·rw| — integer cross-multiplication, no float ratios, so
    * assignment is engine-exact; ties break to the EARLIER ladder entry
    * — then images batch `batchSize` at a time within their bucket in
    * id order. Adds (bucket, bucket_ratio, batch_idx).
    *
    * Scale shape: map-only assignment (a `least` over `ladder.size`
    * structs — lexicographic (diff, index) min) + ONE bucket-keyed
    * window for the running batch index. Ladder size is a literal
    * constant; nothing model-sized moves. */
  def aspectBuckets(df: DataFrame, idCol: String, wCol: String, hCol: String,
      ladder: Seq[(Int, Int)], batchSize: Int): DataFrame = {
    require(ladder.nonEmpty, "ladder must not be empty")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val cands = ladder.zipWithIndex.map { case ((rw, rh), i) =>
      struct(abs(col(wCol) * rh - col(hCol) * rw).as("d"), lit(i).as("i"))
    }
    val names = array(ladder.map { case (rw, rh) => lit(s"$rw:$rh") }: _*)
    val withBucket = df.withColumn("bucket", least(cands: _*).getField("i"))
      .withColumn("bucket_ratio", get(names, col("bucket")))
    // per-bucket position via the GROUPED row-number hatch: the ladder
    // has a handful of buckets over a corpus-scaled image table, so a
    // Window.partitionBy(bucket) would land each bucket's whole slice
    // on one task — the q267 straggler class
    Ranks.withRowNumberBy(withBucket, Seq("bucket"), "__rn", col(idCol))
      .withColumn("batch_idx",
        floor((col("__rn") - 1) / batchSize).cast("long"))
      .drop("__rn")
  }
}
