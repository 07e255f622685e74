package graft.sources

import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
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

  // ─── Writer (S2: the reference exports its golden output as xlsx,
  //     notebook cells 75/83) ──────────────────────────────────────────

  private def xmlEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      // XML 1.0 allows only #x9 #xA #xD below #x20: other control chars
      // would corrupt the sheet (openpyxl raises IllegalCharacterError
      // here; we strip, which keeps the export total on dirty text)
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ()
      case c => sb.append(c)
    }
    sb.toString
  }

  /** 0-based column index → "A"/"BC" ref letters (inverse of colIndex). */
  private[sources] def colLetters(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) {
      val r = (n - 1) % 26
      sb.insert(0, ('A' + r).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  /** Plain-decimal lexical form for a numeric cell: no scientific
    * notation (Excel shows `<v>` verbatim for General format), minimal
    * digits (via Double.toString's shortest round-trip rendering). */
  private def numericLexical(n: java.lang.Number): String = n match {
    case d: java.lang.Double =>
      if (d.doubleValue == d.longValue && math.abs(d.doubleValue) < 1e15) d.longValue.toString
      else new java.math.BigDecimal(d.toString).toPlainString
    // Float.toString is the SHORTEST float round-trip form — widening to
    // double first would render 0.1f as 0.10000000149011612
    case f: java.lang.Float => new java.math.BigDecimal(f.toString).toPlainString
    case bd: java.math.BigDecimal => bd.toPlainString
    case bd: scala.math.BigDecimal => bd.bigDecimal.toPlainString
    case other => other.toString // integral types
  }

  /** A value Excel can hold losslessly in a numeric cell (doubles always —
    * Excel stores IEEE doubles; integrals/decimals only up to 15
    * significant digits, Excel's display-and-save precision). Everything
    * else falls back to an inline string so a human opening and re-saving
    * the report can't corrupt it. */
  private def numericCellSafe(n: java.lang.Number): Boolean = n match {
    case d: java.lang.Double => !d.isNaN && !d.isInfinite
    case f: java.lang.Float => !f.isNaN && !f.isInfinite
    case l: java.lang.Long => math.abs(l.longValue) < 1000000000000000L // 10^15
    case bd: java.math.BigDecimal => bd.stripTrailingZeros.precision <= 15
    case bd: scala.math.BigDecimal => bd.bigDecimal.stripTrailingZeros.precision <= 15
    case _ => true // int/short/byte always fit
  }

  /** Write a DataFrame as a single-sheet xlsx, first row = header.
    * Numeric columns become real NUMERIC cells (plain-decimal `<v>`, the
    * form `to_excel` writes — so Excel sorts/formats them as numbers);
    * everything else is an inline string (the reader's widest-supported
    * cell form; no sharedStrings table to build). Null cells are omitted,
    * which round-trips as null through `read`. Driver-side collect,
    * symmetric with the reader's driver-side parse: xlsx is a DRIVER-SMALL
    * format for golden exports and KB sheets — big data belongs in the
    * parquet/CSV sinks. The byte stream goes through the Hadoop
    * FileSystem API (the q435 TFRecord-sink pattern), so the one small
    * file can land on hdfs://-/s3a://-style URIs, not only the local
    * disk — the collect stays driver-side by design. */
  def write(df: DataFrame, path: String, sheetName: String = "Sheet1"): Unit = {
    val header = df.columns
    val rows = df.collect()
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    // local paths route through the checksummed LocalFileSystem, which
    // would drop a `.name.xlsx.crc` sidecar next to every export —
    // golden-export dirs must hold exactly the file asked for (no-op on
    // filesystems without client-side checksums)
    fs.setWriteChecksum(false)
    val out = new ZipOutputStream(new java.io.BufferedOutputStream(
      fs.create(hPath, true)))
    def entry(name: String, content: String): Unit = {
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    }
    try {
      entry("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin)
      entry("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      entry("xl/workbook.xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
           |<sheets><sheet name="${xmlEscape(sheetName)}" sheetId="1" r:id="rId1"/></sheets>
           |</workbook>""".stripMargin)
      entry("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin)

      out.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
      val w = new java.io.OutputStreamWriter(out, "UTF-8")
      w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      w.write("\n<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
      def writeRow(rowIdx: Int, cells: Seq[Any]): Unit = {
        w.write(s"""<row r="$rowIdx">""")
        cells.zipWithIndex.foreach { case (cell, i) =>
          cell match {
            case null => ()
            case n: java.lang.Number if numericCellSafe(n) =>
              w.write(s"""<c r="${colLetters(i)}$rowIdx"><v>${numericLexical(n)}</v></c>""")
            case other =>
              val s = other.toString
              // xml:space keeps leading/trailing whitespace through StAX
              val preserve = s.nonEmpty && (s.head.isWhitespace || s.last.isWhitespace)
              val attr = if (preserve) " xml:space=\"preserve\"" else ""
              w.write(s"""<c r="${colLetters(i)}$rowIdx" t="inlineStr"><is><t$attr>${xmlEscape(s)}</t></is></c>""")
          }
        }
        w.write("</row>")
      }
      writeRow(1, header.toSeq)
      rows.zipWithIndex.foreach { case (r, i) => writeRow(i + 2, r.toSeq) }
      w.write("</sheetData></worksheet>")
      w.flush()
      out.closeEntry()
    } finally out.close()
  }
}
