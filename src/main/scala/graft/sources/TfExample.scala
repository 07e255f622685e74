package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Minimal tf.train.Example reader/writer over the public protobuf wire
  * format (developers.google.com/protocol-buffers/docs/encoding;
  * tensorflow/core/example/example.proto & feature.proto):
  * `Example{1: Features{1: repeated map entry{1: key, 2: Feature{3:
  * Int64List{1: packed int64}}}}}` — the schema of every LLM
  * token-shard. The walker skips unknown fields BY WIRE TYPE (varint /
  * 64-bit / LEN / 32-bit) like a real proto parser, so foreign features
  * pass through instead of breaking the read. Composed with
  * [[TfRecord]]'s CRC-verified container, this is an end-to-end
  * training-shard read path in pure JVM. */
object TfExample {

  private def writeTag(out: java.io.ByteArrayOutputStream, field: Int,
      wire: Int): Unit = TfRecord.Varint.write(out, (field << 3) | wire)

  private def writeLenDelim(out: java.io.ByteArrayOutputStream, field: Int,
      body: Array[Byte]): Unit = {
    writeTag(out, field, 2)
    TfRecord.Varint.write(out, body.length.toLong)
    out.write(body)
  }

  /** Serialize one Example holding a single int64 feature list. */
  def encode(key: String, tokens: Seq[Long]): Array[Byte] = {
    val packed = new java.io.ByteArrayOutputStream()
    tokens.foreach(TfRecord.Varint.write(packed, _))
    val int64List = new java.io.ByteArrayOutputStream()
    writeLenDelim(int64List, 1, packed.toByteArray) // Int64List.value (packed)
    val feature = new java.io.ByteArrayOutputStream()
    writeLenDelim(feature, 3, int64List.toByteArray) // Feature.int64_list
    val entry = new java.io.ByteArrayOutputStream()
    writeLenDelim(entry, 1, key.getBytes("UTF-8")) // map key
    writeLenDelim(entry, 2, feature.toByteArray)   // map value
    val features = new java.io.ByteArrayOutputStream()
    writeLenDelim(features, 1, entry.toByteArray)  // Features.feature entry
    val example = new java.io.ByteArrayOutputStream()
    writeLenDelim(example, 1, features.toByteArray) // Example.features
    example.toByteArray
  }

  /** Serialize one Example holding SEVERAL features — int64 lists and
    * bytes lists side by side (Feature.int64_list = field 3,
    * Feature.bytes_list = field 1, per the public feature.proto): the
    * shape of a real multimodal training shard, token ids next to raw
    * payloads. Entries are emitted in argument order (deterministic
    * bytes). */
  def encodeMixed(intFeats: Seq[(String, Seq[Long])],
      bytesFeats: Seq[(String, Seq[Array[Byte]])]): Array[Byte] = {
    def entry(features: java.io.ByteArrayOutputStream, key: String,
        feature: Array[Byte]): Unit = {
      val e = new java.io.ByteArrayOutputStream()
      writeLenDelim(e, 1, key.getBytes("UTF-8")) // map key
      writeLenDelim(e, 2, feature)               // map value (Feature)
      writeLenDelim(features, 1, e.toByteArray)  // Features.feature entry
    }
    val features = new java.io.ByteArrayOutputStream()
    intFeats.foreach { case (k, vs) =>
      val packed = new java.io.ByteArrayOutputStream()
      vs.foreach(TfRecord.Varint.write(packed, _))
      val int64List = new java.io.ByteArrayOutputStream()
      writeLenDelim(int64List, 1, packed.toByteArray) // Int64List.value
      val feature = new java.io.ByteArrayOutputStream()
      writeLenDelim(feature, 3, int64List.toByteArray) // Feature.int64_list
      entry(features, k, feature.toByteArray)
    }
    bytesFeats.foreach { case (k, vs) =>
      val bytesList = new java.io.ByteArrayOutputStream()
      vs.foreach(writeLenDelim(bytesList, 1, _)) // BytesList.value
      val feature = new java.io.ByteArrayOutputStream()
      writeLenDelim(feature, 1, bytesList.toByteArray) // Feature.bytes_list
      entry(features, k, feature.toByteArray)
    }
    val example = new java.io.ByteArrayOutputStream()
    writeLenDelim(example, 1, features.toByteArray) // Example.features
    example.toByteArray
  }

  private final class Reader(bytes: Array[Byte], var pos: Int, end: Int) {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"tf.Example parse error at $pos: $msg")
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L; var done = false
      while (!done) {
        if (pos >= end) fail("truncated varint")
        if (shift >= 64) fail("varint too long")
        val b = bytes(pos); pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
        done = (b & 0x80) == 0
      }
      v
    }
    def lenDelim(): (Int, Int) = { // (start, end)
      val n = varint()
      if (n < 0 || n > end - pos) fail(s"bad length $n")
      val s = pos; pos += n.toInt; (s, pos)
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => if (end - pos < 8) fail("truncated fixed64") else pos += 8
      case 2 => lenDelim()
      case 5 => if (end - pos < 4) fail("truncated fixed32") else pos += 4
      case w => fail(s"unsupported wire type $w")
    }
  }

  /** Span-based proto walker: every LEN field's (field, start, end) is
    * handed to the visitor; non-LEN fields are skipped by wire type —
    * the property that makes feature PROJECTION free (unread features,
    * whatever their kind, cost one length-skip each). */
  private def lenFields(bytes: Array[Byte], start: Int, end: Int)(
      f: (Int, Int, Int) => Unit): Unit = {
    val r = new Reader(bytes, start, end)
    while (r.hasMore) {
      val tag = r.varint()
      val field = (tag >>> 3).toInt; val wire = (tag & 7).toInt
      if (wire == 2) { val (s, e) = r.lenDelim(); f(field, s, e) }
      else r.skip(wire)
    }
  }

  /** Visit the Feature span of every map entry whose key == `key`. */
  private def featureSpansOf(bytes: Array[Byte], key: String)(
      visit: (Int, Int) => Unit): Unit = {
    val keyBytes = key.getBytes("UTF-8")
    lenFields(bytes, 0, bytes.length) { (f1, s1, e1) =>
      if (f1 == 1) lenFields(bytes, s1, e1) { (f2, s2, e2) => // Features
        if (f2 == 1) { // one map entry
          var matches = false
          lenFields(bytes, s2, e2) { (fk, sk, ek) =>
            if (fk == 1) matches = ek - sk == keyBytes.length &&
              (sk until ek).forall(i => bytes(i) == keyBytes(i - sk))
            else ()
          }
          if (matches) lenFields(bytes, s2, e2) { (fv, sv, ev) =>
            if (fv == 2) visit(sv, ev) // the Feature message
          }
        }
      }
    }
  }

  /** Extract the int64 values of feature `key` from one Example's
    * bytes; unknown fields at every level — including sibling
    * bytes_list/float_list features — are skipped by wire type. */
  def tokensOf(bytes: Array[Byte], key: String): Seq[Long] = {
    val out = Seq.newBuilder[Long]
    featureSpansOf(bytes, key) { (sv, ev) =>
      lenFields(bytes, sv, ev) { (ff, sf, ef) => // Feature
        if (ff == 3) lenFields(bytes, sf, ef) { (fl, sl, el) => // Int64List
          if (fl == 1) { // packed values
            val r = new Reader(bytes, sl, el)
            while (r.hasMore) out += r.varint()
          }
        }
      }
    }
    out.result()
  }

  /** Extract the bytes_list values of feature `key`
    * (Feature.bytes_list = field 1, BytesList.value = repeated bytes). */
  def bytesValuesOf(bytes: Array[Byte], key: String): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    featureSpansOf(bytes, key) { (sv, ev) =>
      lenFields(bytes, sv, ev) { (ff, sf, ef) => // Feature
        if (ff == 1) lenFields(bytes, sf, ef) { (fl, sl, el) => // BytesList
          if (fl == 1) out += java.util.Arrays.copyOfRange(bytes, sl, el)
        }
      }
    }
    out.result()
  }

  /** Deterministic full training shard per doc: ne = 1 + id%3 Examples,
    * example j carrying 8 + (id+j)%8 tokens t_i = (17·id + 29·j + 13·i)
    * mod 4096 under key "tokens", wrapped in the CRC-verified TFRecord
    * container. */
  def synthesizeShards(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val ne = (1 + id % 3).toInt
          val recs = (0 until ne).iterator.map { j =>
            val n = (8 + (id + j) % 8).toInt
            encode("tokens",
              (0 until n).map(i => (17 * id + 29 * j + 13 * i) % 4096))
          }
          Row(id, TfRecord.encode(recs))
        }
      }(enc)
  }

  /** REAL shard SINK + read-back: tokenize each document (whitespace,
    * md5-hash ids mod `vocab` — deterministic, oracle-replayable), write
    * one CRC-framed TFRecord file of tf.Examples per shard
    * (shard = id mod nShards, documents in id order), then read the
    * FILES back through the binaryFile source and return the per-shard
    * manifest — a write→filesystem→read round trip, not an in-memory
    * echo. Each shard is owned by one task (repartition on the shard
    * key + sortWithinPartitions), the dataloader-friendly layout.
    * Output: (shard, n_examples, n_tokens, token_sum). */
  def writeAndManifest(df: DataFrame, idCol: String, textCol: String,
      dir: String, nShards: Int = 4, vocab: Int = 50000): DataFrame = {
    require(nShards >= 1 && vocab >= 2, "need nShards >= 1, vocab >= 2")
    val spark = df.sparkSession
    // All filesystem traffic goes through the Hadoop FileSystem API
    // resolved from `dir`'s scheme, so the round trip is CLUSTER-VALID:
    // with an hdfs://, s3a:// or file://-on-shared-storage dir, executor
    // tasks write shards the driver-side binaryFile read-back can see.
    // (Plain executor-local java.io would only work under a local
    // master.) The Hadoop conf ships to tasks via its own writable
    // serialization (Configuration is not java-serializable).
    val hconf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val dfs = dirPath.getFileSystem(hconf.conf)
    if (dfs.exists(dirPath)) // recursive: stale _temporary/checkpoint
      dfs.listStatus(dirPath).foreach(s => dfs.delete(s.getPath, true))
    else dfs.mkdirs(dirPath)
    val toks = df.select((col(idCol) % nShards).cast("int").as("__shard"),
        col(idCol).cast("long").as("__id"),
        transform(filter(split(lower(col(textCol)), " "), t => length(t) > 0),
          w => pmod(graft.ops.Dedup.baseHash(w), lit(vocab.toLong))).as("__toks"))
      .repartition(nShards, col("__shard"))
      .sortWithinPartitions(col("__shard"), col("__id"))
    val written = toks.mapPartitions { rows =>
      // a partition may own several shards (hash collisions); groups are
      // contiguous after the sort, so stream each to its own file
      var cur = -1
      var recs: scala.collection.mutable.ArrayBuffer[Array[Byte]] = null
      val out = Seq.newBuilder[Int]
      def flush(): Unit = if (cur >= 0) {
        val p = new org.apache.hadoop.fs.Path(s"$dir/shard-$cur.tfrecord")
        val f = p.getFileSystem(hconf.conf).create(p, true)
        try f.write(TfRecord.encode(recs.iterator)) finally f.close()
        out += cur
      }
      rows.foreach { r =>
        val sh = r.getInt(0)
        if (sh != cur) { flush(); cur = sh
          recs = scala.collection.mutable.ArrayBuffer.empty }
        recs += encode("tokens", r.getSeq[Long](2))
      }
      flush()
      out.result().iterator
    }(org.apache.spark.sql.Encoders.scalaInt)
    val n = written.count() // force the write before the read-back plan
    require(n >= 1, "no shards written")
    val files = spark.read.format("binaryFile").load(s"$dir/shard-*.tfrecord")
      .select(regexp_extract(col("path"), "shard-(\\d+)\\.tfrecord", 1)
        .cast("int").as("shard"), col("content"))
    val schema = StructType(Seq(
      StructField("shard", IntegerType),
      StructField("n_examples", LongType),
      StructField("n_tokens", LongType),
      StructField("token_sum", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    files.mapPartitions { rows =>
      rows.map { r =>
        val recs = TfRecord.decode(r.getAs[Array[Byte]](1))
        var nTok = 0L; var sum = 0L
        recs.foreach { rec =>
          val ts = tokensOf(rec, "tokens")
          nTok += ts.size; sum += ts.sum
        }
        Row(r.getInt(0), recs.size.toLong, nTok, sum)
      }
    }(enc)
  }

  /** Deterministic MIXED training shard per doc: ONE Example holding
    * THREE features — "tokens" int64_list (md5-hash whitespace-word ids
    * mod `vocab`, the oracle-replayable q435 vocabulary), "text"
    * bytes_list (the raw UTF-8 document), "lang" bytes_list — wrapped
    * in the CRC-verified TFRecord container. Paired with [[shardStats]]
    * this gates the PROJECTION contract: reading one feature out of
    * three skips the (much larger) bytes payloads by wire type.
    * Output: (doc_id, content). */
  def synthesizeMixedShards(df: DataFrame, idCol: String, textCol: String,
      langCol: String, vocab: Int = 4096): DataFrame = {
    require(vocab >= 2, "vocab >= 2")
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"),
        transform(filter(split(lower(col(textCol)), " "), t => length(t) > 0),
          w => pmod(graft.ops.Dedup.baseHash(w), lit(vocab.toLong))).as("__toks"),
        col(textCol).cast("string").as("__text"),
        col(langCol).cast("string").as("__lang"))
      .mapPartitions { rows =>
        rows.map { r =>
          val ex = encodeMixed(
            Seq("tokens" -> r.getSeq[Long](1)),
            Seq("text" -> Seq(r.getString(2).getBytes("UTF-8")),
              "lang" -> Seq(r.getString(3).getBytes("UTF-8"))))
          Row(r.getLong(0), TfRecord.encode(Iterator(ex)))
        }
      }(enc)
  }

  /** End-to-end shard read: CRC-verified container walk → per-record
    * tf.Example parse → token stats.
    * Output: (idCol, n_examples, n_tokens, token_sum). */
  def shardStats(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_examples", LongType),
      StructField("n_tokens", LongType),
      StructField("token_sum", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val recs = TfRecord.decode(r.getAs[Array[Byte]](1))
          var nTok = 0L; var sum = 0L
          recs.foreach { rec =>
            val ts = tokensOf(rec, "tokens")
            nTok += ts.size; sum += ts.sum
          }
          Row(r.getLong(0), recs.size.toLong, nTok, sum)
        }
      }(enc)
  }
}
