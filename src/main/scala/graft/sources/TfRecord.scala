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
