package graft.sources

import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.Row

import scala.collection.mutable

/** Minimal XLSX reader (S1: the reference ingests xlsx sheets,
  * `pd.read_excel` at notebook cells 4/14/24). Pure JDK (zip + StAX) — no
  * external Excel dependency exists in this zero-egress build.
  *
  * Scope: string/shared-string/inline-string/numeric cells of one
  * worksheet; every value surfaces as a string column (the pipeline's
  * `prepare` stage owns numeric coercion, mirroring pandas' to_numeric).
  * Driver-side parse → `createDataFrame`: xlsx is a driver-small format
  * (the reference's sheets are ≤ a few MB); big data arrives as
  * parquet/CSV via the other sources.
  */
object Xlsx {

  private[sources] def parseSharedStrings(zip: ZipFile): Vector[String] = {
    val entry = zip.getEntry("xl/sharedStrings.xml")
    if (entry == null) return Vector.empty
    val in = zip.getInputStream(entry)
    val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = true; cur.clear()
              case "t" if inSi => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inT => cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "si" => inSi = false; out += cur.toString
              case _ =>
            }
          case _ =>
        }
      }
    } finally { r.close(); in.close() }
    out.result()
  }

  /** "BC" → 54 (0-based column index). */
  private def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i) - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  /** Parse one worksheet into rows of (colIdx → cell string). */
  private[sources] def parseSheet(zip: ZipFile, sheetPath: String,
      shared: Vector[String]): Vector[mutable.Map[Int, String]] = {
    val entry = zip.getEntry(sheetPath)
    require(entry != null, s"no $sheetPath in xlsx")
    val in = zip.getInputStream(entry)
    val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
    val rows = Vector.newBuilder[mutable.Map[Int, String]]
    var row: mutable.Map[Int, String] = null
    var cellCol = -1
    var cellType = ""
    var inV = false
    var inIsT = false
    val v = new StringBuilder
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => row = mutable.Map.empty
              case "c" =>
                cellCol = Option(r.getAttributeValue(null, "r")).map(colIndex).getOrElse(cellCol + 1)
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
                v.clear()
              case "v" => inV = true
              case "t" if cellType == "inlineStr" => inIsT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inV || inIsT => v.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" => inV = false
              case "t" => inIsT = false
              case "c" =>
                val raw = v.toString
                val value = cellType match {
                  case "s" => shared.lift(raw.trim.toInt).getOrElse("")
                  case _ => raw
                }
                if (value.nonEmpty) row(cellCol) = value
              case "row" => rows += row; row = null
              case _ =>
            }
          case _ =>
        }
      }
    } finally { r.close(); in.close() }
    rows.result()
  }

  /** Dedupe header names with an ordinal suffix (pandas-style). */
  private[sources] def dedupeHeader(headerMap: collection.Map[Int, String]): IndexedSeq[String] = {
    val width = headerMap.keys.max + 1
    val seen = mutable.Map.empty[String, Int]
    (0 until width).map { i =>
      val base = headerMap.getOrElse(i, s"_c$i").trim
      val n = seen.getOrElse(base, 0)
      seen(base) = n + 1
      if (n == 0) base else s"${base}_$n"
    }
  }

  /** Header row of a sheet as an all-string schema (used by both the
    * driver-side reader and the DSv2 source's schema inference). */
  private[sources] def headerSchema(path: String, sheetPath: String): StructType = {
    val zip = new ZipFile(path)
    try {
      val shared = parseSharedStrings(zip)
      val rows = parseSheet(zip, sheetPath, shared)
      require(rows.nonEmpty, s"empty sheet in $path")
      StructType(dedupeHeader(rows.head).map(StructField(_, StringType)))
    } finally zip.close()
  }

  /** Read a worksheet as an all-string DataFrame, first row = header.
    * Trailing unnamed columns are dropped; duplicate headers deduped with
    * an ordinal suffix. */
  def read(spark: SparkSession, path: String,
      sheetPath: String = "xl/worksheets/sheet1.xml"): DataFrame = {
    val zip = new ZipFile(path)
    try {
      val shared = parseSharedStrings(zip)
      val rows = parseSheet(zip, sheetPath, shared)
      require(rows.nonEmpty, s"empty sheet in $path")
      val header = dedupeHeader(rows.head)
      val width = header.length
      val data = rows.tail.map { m =>
        Row.fromSeq((0 until width).map(i => m.get(i).orNull))
      }
      val schema = StructType(header.map(StructField(_, StringType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(data.toSeq, 4), schema)
    } finally zip.close()
  }
}
