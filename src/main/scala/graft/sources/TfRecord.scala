package graft.sources

/** TFRecord container codec (the TensorFlow training-data format,
  * public spec: tensorflow/core/lib/io/record_writer.cc — each record
  * is `length:uint64le, masked_crc32c(length):uint32le, data[length],
  * masked_crc32c(data):uint32le`), implemented pure-JVM on
  * `java.util.zip.CRC32C`. The WRITE side is what a packing stage
  * (q163's offset contract) ships to a trainer; the READ side walks and
  * CRC-verifies — a flipped byte or truncated tail fails loudly, never
  * yields a silently-corrupt sample. */
object TfRecord {

  private val MaskDelta = 0xa282ead8L

  /** TFRecord's masked CRC: rot-right-15 of the CRC32C, plus a
    * constant, in uint32 arithmetic. */
  def maskedCrc(bytes: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes, off, len)
    val crc = c.getValue // uint32 in a Long
    (((crc >>> 15) | (crc << 17)) + MaskDelta) & 0xffffffffL
  }

  /** Serialize records into one TFRecord stream. */
  def encode(records: Iterator[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val hdr = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ftr = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    records.foreach { r =>
      hdr.clear()
      hdr.putLong(r.length.toLong)
      val lenBytes = new Array[Byte](8)
      java.nio.ByteBuffer.wrap(lenBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(r.length.toLong)
      hdr.putInt(maskedCrc(lenBytes, 0, 8).toInt)
      out.write(hdr.array(), 0, 12)
      out.write(r)
      ftr.clear()
      ftr.putInt(maskedCrc(r, 0, r.length).toInt)
      out.write(ftr.array(), 0, 4)
    }
    out.toByteArray
  }

  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types._

  /** Deterministic TFRecord payload per doc (nf = 1 + id%5 records,
    * record k: 8 + (id+k)%16 bytes, byte i = (31·id + 97·k + i) mod 256
    * — the closed form the q432 oracle replays), partition-batched like
    * the media synthesizers. Output: (idCol, content). */
  def synthesizeTfRecords(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val nf = (1 + id % 5).toInt
          val recs = (0 until nf).iterator.map { k =>
            val n = (8 + (id + k) % 16).toInt
            Array.tabulate[Byte](n)(i => ((31 * id + 97 * k + i) % 256).toByte)
          }
          Row(id, encode(recs))
        }
      }(enc)
  }

  /** Deterministic packed-zigzag-varint payload per doc: n = 16 + id%16
    * signed values v_k = ((17·id + 29·k) mod 2001) − 1000 — the token-id
    * list shape (with negatives so zigzag is actually exercised). */
  def synthesizeVarints(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val n = (16 + id % 16).toInt
          val out = new java.io.ByteArrayOutputStream()
          var k = 0
          while (k < n) {
            Varint.write(out, Varint.zigzag((17 * id + 29 * k) % 2001 - 1000))
            k += 1
          }
          Row(id, out.toByteArray)
        }
      }(enc)
  }

  /** Decode each doc's packed zigzag varints and fold stats. The oracle
    * recomputes `payload_bytes` from the CLOSED-FORM group count (1 byte
    * below zigzag 128, else 2 here), so a green row proves the encoder's
    * 7-bit packing, not just the value round-trip.
    * Output: (idCol, n_values, value_sum, n_negative, payload_bytes). */
  def varintStats(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_values", LongType),
      StructField("value_sum", LongType),
      StructField("n_negative", LongType),
      StructField("payload_bytes", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val raw = r.getAs[Array[Byte]](1)
          val vs = Varint.readAll(raw).map(Varint.unzigzag)
          Row(r.getLong(0), vs.size.toLong, vs.sum,
            vs.count(_ < 0).toLong, raw.length.toLong)
        }
      }(enc)
  }

  /** Walk + CRC-verify each doc's TFRecord stream and fold per-record
    * stats — the REAL read side of the container a packing stage ships.
    * Output: (idCol, n_records, total_bytes, byte_sum). */
  def decodeStats(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_records", LongType),
      StructField("total_bytes", LongType),
      StructField("byte_sum", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val recs = decode(r.getAs[Array[Byte]](1))
          var total = 0L; var sum = 0L
          recs.foreach { rec =>
            total += rec.length
            var i = 0
            while (i < rec.length) { sum += rec(i) & 0xffL; i += 1 }
          }
          Row(r.getLong(0), recs.size.toLong, total, sum)
        }
      }(enc)
  }

  /** Protobuf-style varint/zigzag primitives (public wire format,
    * developers.google.com/protocol-buffers/docs/encoding): base-128
    * little-endian groups with a continuation bit; zigzag folds signed
    * values to unsigned so small negatives stay short. These are the
    * bytes inside every training shard's token-id lists. */
  object Varint {
    def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
    def unzigzag(u: Long): Long = (u >>> 1) ^ -(u & 1)

    def write(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
      var v = value
      while ((v & ~0x7fL) != 0) {
        out.write(((v & 0x7f) | 0x80).toInt)
        v >>>= 7
      }
      out.write(v.toInt)
    }

    /** Decode a packed varint stream; throws on a truncated tail or an
      * over-long (> 10 byte) group. */
    def readAll(bytes: Array[Byte]): Seq[Long] = {
      val out = Seq.newBuilder[Long]
      var pos = 0
      while (pos < bytes.length) {
        var shift = 0; var v = 0L; var done = false
        while (!done) {
          if (pos >= bytes.length)
            throw new IllegalArgumentException("varint: truncated group")
          if (shift >= 64)
            throw new IllegalArgumentException("varint: group too long")
          val b = bytes(pos); pos += 1
          v |= (b & 0x7fL) << shift
          shift += 7
          done = (b & 0x80) == 0
        }
        out += v
      }
      out.result()
    }
  }

  /** Parse and CRC-verify every record; throws IllegalArgumentException
    * on a bad length CRC, bad data CRC, or truncated stream. */
  def decode(bytes: Array[Byte]): Seq[Array[Byte]] = {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"TFRecord parse error: $msg")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = Seq.newBuilder[Array[Byte]]
    while (bb.remaining() > 0) {
      if (bb.remaining() < 12) fail("truncated header")
      val pos = bb.position()
      val len = bb.getLong()
      if (len < 0 || len > bb.remaining() - 8) fail(s"bad record length $len")
      val lenCrc = bb.getInt() & 0xffffffffL
      if (lenCrc != maskedCrc(bytes, pos, 8)) fail("length CRC mismatch")
      val data = new Array[Byte](len.toInt)
      bb.get(data)
      val dataCrc = bb.getInt() & 0xffffffffL
      if (dataCrc != maskedCrc(data, 0, data.length)) fail("data CRC mismatch")
      out += data
    }
    out.result()
  }
}
