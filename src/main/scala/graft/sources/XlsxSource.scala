package graft.sources

import java.util
import java.util.zip.ZipFile

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 xlsx source: `spark.read.format("graft-xlsx").load(dir)`.
  *
  * The driver-side `Xlsx.read` is fine for one small sheet; THIS is the
  * distributed shape — schema inferred once from the first file's header,
  * then ONE InputPartition PER FILE with the zip+StAX parse running on the
  * executors, so ingesting a directory of thousands of monthly sheets
  * scales horizontally like any file source.
  *
  * Implements `SupportsPushDownRequiredColumns`: the reader materializes
  * only the pruned columns (rows project by header NAME per file, so files
  * with reordered columns still land correctly).
  *
  * Options: `sheet` (default `xl/worksheets/sheet1.xml`). `load(path)`
  * accepts a single .xlsx file or a directory (every `*.xlsx` inside, one
  * partition each).
  */
class XlsxSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-xlsx"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val paths = XlsxSource.resolvePaths(options)
    require(paths.nonEmpty, "graft-xlsx: no input files (option 'path')")
    Xlsx.headerSchema(paths.head, XlsxSource.sheetOf(options))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new XlsxTable(schema, new CaseInsensitiveStringMap(properties))
}

object XlsxSource {
  def sheetOf(options: CaseInsensitiveStringMap): String =
    options.getOrDefault("sheet", "xl/worksheets/sheet1.xml")

  /** Resolve the `path`/`paths` option to concrete .xlsx files: a file is
    * itself; a directory contributes every *.xlsx inside (sorted).
    *
    * Spark encodes multi-path load() as a JSON array of strings — parsed
    * with a real JSON parser (Jackson, on Spark's classpath), so paths
    * containing commas or quotes survive.
    *
    * Filesystem contract: paths must be on a LOCAL or shared-mounted
    * filesystem (the reader needs ZipFile random access) — the same
    * driver-small positioning as Xlsx.read. A `file:` scheme is accepted
    * and stripped; any other scheme fails fast with a clear error instead
    * of silently listing nothing. */
  def resolvePaths(options: CaseInsensitiveStringMap): Seq[String] = {
    val raw: Seq[String] = Option(options.get("paths"))
      .map { js =>
        val m = new com.fasterxml.jackson.databind.ObjectMapper()
        m.readValue(js, classOf[Array[String]]).toSeq
      }
      .getOrElse(Option(options.get("path")).toSeq)
    // ≥2-char scheme: a single letter before ':' is a Windows drive, not
    // a URI scheme
    val scheme = "^([a-zA-Z][a-zA-Z0-9+.-]+):.*".r
    raw.filter(_.nonEmpty).flatMap { p =>
      val local = p match {
        case scheme(s) if s.equalsIgnoreCase("file") => p.substring(s.length + 1)
        case scheme(other) => throw new IllegalArgumentException(
          s"graft-xlsx reads local/shared filesystems only, got scheme '$other' in $p " +
            "(xlsx is a driver-small format; land big data as parquet/CSV)")
        case _ => p
      }
      val f = new java.io.File(local)
      if (f.isDirectory)
        f.listFiles((_, name) => name.toLowerCase.endsWith(".xlsx"))
          .toSeq.map(_.getPath).sorted
      else Seq(local)
    }
  }
}

class XlsxTable(schema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-xlsx(${XlsxSource.resolvePaths(options).mkString(",")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new XlsxScanBuilder(schema, options)
}

class XlsxScanBuilder(fullSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve only known columns; empty projection (count(*)) is legal
    required = StructType(requiredSchema.fields.filter(f => fullSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new XlsxScan(required,
    XlsxSource.resolvePaths(options), XlsxSource.sheetOf(options))
}

class XlsxScan(readSchema: StructType, paths: Seq[String], sheet: String)
    extends Scan with Batch {
  override def readSchema(): StructType = readSchema
  override def toBatch: Batch = this
  override def description(): String = s"graft-xlsx ${paths.size} file(s)"

  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => XlsxInputPartition(p, sheet): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new XlsxReaderFactory(readSchema.fieldNames)
}

case class XlsxInputPartition(path: String, sheet: String) extends InputPartition

class XlsxReaderFactory(columns: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[XlsxInputPartition]
    new XlsxPartitionReader(p.path, p.sheet, columns)
  }
}

/** Executor-side reader: parses ONE xlsx file, projects the pruned columns
  * by header name. */
class XlsxPartitionReader(path: String, sheet: String, columns: Array[String])
    extends PartitionReader[InternalRow] {

  private val rows: Iterator[InternalRow] = {
    val zip = new ZipFile(path)
    try {
      val shared = Xlsx.parseSharedStrings(zip)
      val all = Xlsx.parseSheet(zip, sheet, shared)
      if (all.isEmpty) Iterator.empty
      else {
        val header = Xlsx.dedupeHeader(all.head)
        // required column name -> this file's column ordinal (or -1)
        val ordinals = columns.map(c => header.indexOf(c))
        all.tail.iterator.map { m =>
          InternalRow.fromSeq(ordinals.toSeq.map { i =>
            if (i < 0) null
            else m.get(i).map(UTF8String.fromString).orNull
          })
        }.toVector.iterator // materialize before the zip closes
      }
    } finally zip.close()
  }

  private var current: InternalRow = _
  override def next(): Boolean = {
    if (rows.hasNext) { current = rows.next(); true } else false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
