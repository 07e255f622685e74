package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, batch-decoded per partition.
  *
  * The decode itself is STUBBED (no image/audio libraries in this
  * container) behind `FakeDecoder` — a deterministic byte-derived fake —
  * but the Spark-side shape is real: binary column + metadata struct,
  * `mapPartitions` batching (one decoder instance per partition, the same
  * shape a JNI/FFmpeg/JPEG decoder needs), and an explicit output schema.
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

  /** STUB decoder: deterministic pseudo-metadata from the payload bytes.
    * A real implementation decodes here (libjpeg/ffmpeg per partition);
    * the partition-batched shape, schema, and driver code don't change.
    * The fake outputs are md5-derived (60-bit prefix), so even the stub
    * path is DuckDB-oracle-checkable — a Java-overflow polynomial hash
    * would not port. */
  object FakeDecoder {
    def decode(bytes: Array[Byte]): (Int, Int, Int, Long) = {
      val md = graft.functions.HashOps.mdLocal.get()
      md.reset()
      val checksum = graft.functions.HashOps.prefix60(md.digest(bytes))
      val width = 16 + (checksum % 64).toInt
      val height = 16 + ((checksum >> 8) % 64).toInt
      val frames = 1 + (bytes.length % 4)
      (width, height, frames, checksum)
    }
  }

  /** Partition-batched decode: one decoder per partition, rows streamed
    * through it. `mapPartitions` (not a per-row UDF) so a real decoder can
    * amortize init (model load / codec ctx) across the partition — the
    * standard Spark shape for heavy native decode at scale. */
  def decodeBatch(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedSchema)
    val input = df.select(col(idCol).cast("long"), col("content"))
    input.mapPartitions { rows =>
      // decoder init happens HERE once per partition in the real version
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h, f, c) = FakeDecoder.decode(bytes)
        Row(id, w, h, f, c)
      }
    }(enc)
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
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col(idCol))
    df.withColumn("bucket", least(cands: _*).getField("i"))
      .withColumn("bucket_ratio", get(names, col("bucket")))
      .withColumn("batch_idx",
        floor((row_number().over(w) - 1) / batchSize).cast("long"))
  }
}
