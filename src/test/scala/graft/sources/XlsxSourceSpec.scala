package graft.sources

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec

class XlsxSourceSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal xlsx writer: one sheet, inline-string cells. */
  private def writeXlsx(path: String, rows: Seq[Seq[String]]): Unit = {
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    val sheetXml = {
      val sb = new StringBuilder(
        """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      rows.zipWithIndex.foreach { case (r, i) =>
        sb.append(s"""<row r="${i + 1}">""")
        r.zipWithIndex.foreach { case (v, j) =>
          val ref = s"${('A' + j).toChar}${i + 1}"
          sb.append(s"""<c r="$ref" t="inlineStr"><is><t>$v</t></is></c>""")
        }
        sb.append("</row>")
      }
      sb.append("</sheetData></worksheet>").toString
    }
    put("[Content_Types].xml", """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("xl/worksheets/sheet1.xml", sheetXml)
    zos.close()
  }

  test("xlsx sink round-trips: write → read is value-identical (escapes, ws, nulls)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_w").toString
    val path = s"$dir/out.xlsx"
    val df = Seq(
      ("KOMATSU PC200-8", "a & b <c> \"d\"", Some("20.5")),
      (" leading and trailing ", "中文/ünïcode", None),
      ("plain", "AB", Some("-3")))
      .toDF("model desc", "tricky", "num")
    Xlsx.write(df, path)
    val back = Xlsx.read(spark, path)
    assert(back.columns.toSeq == df.columns.toSeq)
    val got = back.as[(String, String, Option[String])].collect().toSeq
    val want = df.as[(String, String, Option[String])].collect().toSeq
    assert(got.sortBy(_._1) == want.sortBy(_._1))
    // golden-export dirs must hold exactly the file asked for — the
    // checksummed LocalFileSystem would otherwise drop a .crc sidecar
    val sidecars = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.endsWith(".crc"))
    assert(sidecars.isEmpty, s"checksum sidecar(s) written: ${sidecars.toSeq}")
  }

  test("xlsx sink writes numeric cells plain-decimal and strips illegal control chars") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_n").toString
    val path = s"$dir/num.xlsx"
    val df = Seq(
      ("big", 12345678.0, 3L),
      ("frac", 0.1, -4L),
      // 16 significant digits: Excel would corrupt a numeric cell → must
      // fall back to an inline string
      ("bigid", 2.0, 9007199254740993L),
      ("ctl" + 1.toChar + "char", 2.5, 0L)) // U+0001 is illegal in XML 1.0 → stripped
      .toDF("k", "d", "n")
    Xlsx.write(df, path)
    // numeric cells: <v> holds plain decimals, never scientific notation
    val zip = new java.util.zip.ZipFile(path)
    val sheet = scala.io.Source.fromInputStream(
      zip.getInputStream(zip.getEntry("xl/worksheets/sheet1.xml")), "UTF-8").mkString
    zip.close()
    assert(sheet.contains("<v>12345678</v>") && sheet.contains("<v>0.1</v>"))
    assert(!sheet.toLowerCase.contains("e7"), "scientific notation leaked into a cell")
    assert(!sheet.contains(1.toChar.toString))
    // >15-digit long is an inline STRING cell (Excel-lossless), not numeric
    assert(sheet.contains("<is><t>9007199254740993</t></is>"))
    val back = Xlsx.read(spark, path).as[(String, String, String)].collect().toSet
    assert(back == Set(("big", "12345678", "3"), ("frac", "0.1", "-4"),
      ("bigid", "2", "9007199254740993"), ("ctlchar", "2.5", "0")))
  }

  test("xlsx sink renders floats at their own shortest precision") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_f").toString
    val path = s"$dir/f.xlsx"
    Xlsx.write(Seq((1L, 0.1f)).toDF("id", "f"), path)
    val zip = new java.util.zip.ZipFile(path)
    val sheet = scala.io.Source.fromInputStream(
      zip.getInputStream(zip.getEntry("xl/worksheets/sheet1.xml")), "UTF-8").mkString
    zip.close()
    assert(sheet.contains("<v>0.1</v>"), "float widened to double noise:\n" + sheet)
  }

  test("xlsx sink round-trips the reference's golden output colDiff-clean") {
    val goldenPath = "/root/reference/Output/Indonesia_excavator_2022_2024.07.xlsx"
    assume(new java.io.File(goldenPath).exists())
    val golden = Xlsx.read(spark, goldenPath)
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_g").toString
    val rewritten = s"$dir/golden_rt.xlsx"
    Xlsx.write(golden, rewritten)
    val back = Xlsx.read(spark, rewritten)
    assert(back.columns.toSeq == golden.columns.toSeq)
    assert(back.count() == golden.count())
    // cell-by-cell: zero differing values in any column (null-safe; row
    // order is stable — parallelize preserves input order through collect)
    val gRows = golden.collect().map(_.toSeq)
    val bRows = back.collect().map(_.toSeq)
    val diffs = gRows.zip(bRows).zipWithIndex.collect {
      case ((g, b), i) if g != b => (i, g, b)
    }
    assert(diffs.isEmpty, s"first diff: ${diffs.headOption}")
  }

  test("DSv2 source reads a directory, one partition per file, pruned columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx").toString
    writeXlsx(s"$dir/a.xlsx", Seq(
      Seq("brand", "model", "qty"), Seq("SANY", "SY215C", "2"), Seq("XCMG", "XE215C", "1")))
    // second file has REORDERED columns — projection is by header name
    writeXlsx(s"$dir/b.xlsx", Seq(
      Seq("qty", "brand", "model"), Seq("5", "KOMATSU", "PC200-8")))

    val df = spark.read.format("graft-xlsx").load(dir)
    assert(df.columns.toSeq == Seq("brand", "model", "qty"))
    assert(df.rdd.getNumPartitions == 2) // one per file
    val got = df.as[(String, String, String)].collect().toSet
    assert(got == Set(("SANY", "SY215C", "2"), ("XCMG", "XE215C", "1"),
      ("KOMATSU", "PC200-8", "5")))

    // column pruning reaches the scan (readSchema shows only `brand`)
    val pruned = df.select($"brand")
    val scanLine = pruned.queryExecution.executedPlan.toString
    assert(scanLine.contains("brand") && !scanLine.contains("model"))
    assert(pruned.as[String].collect().sorted.toSeq == Seq("KOMATSU", "SANY", "XCMG"))
  }

  test("DSv2 result matches the driver-side reader on the real reference sheet") {
    val path = "/root/reference/Input data/Indonesia_842952_May_July.xlsx"
    val v2 = spark.read.format("graft-xlsx").load(path)
    val v1 = Xlsx.read(spark, path)
    assert(v2.schema == v1.schema)
    assert(v2.count() == v1.count())
    // spot-check full-row equality on a deterministic slice
    val cols = v1.columns.take(5).map(org.apache.spark.sql.functions.col).toSeq
    assert(v2.select(cols: _*).collect().map(_.toString).sorted.sameElements(
      v1.select(cols: _*).collect().map(_.toString).sorted))
  }
}
