package graft

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._
import graft.etl._

/** The README "Using the library" story, executed verbatim: monthly xlsx
  * batches → DSv2 read → Pipeline.run → partitioned history append →
  * re-read → key-players analytics. Keeps the documentation honest. */
class UserJourneySpec extends SparkSpec {
  import spark.implicits._

  private def writeXlsx(path: String, rows: Seq[Seq[String]]): Unit = {
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name)); zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    val sb = new StringBuilder(
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    rows.zipWithIndex.foreach { case (r, i) =>
      sb.append(s"""<row r="${i + 1}">""")
      r.zipWithIndex.foreach { case (v, j) =>
        sb.append(s"""<c r="${('A' + j).toChar}${i + 1}" t="inlineStr"><is><t>$v</t></is></c>""")
      }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")
    put("[Content_Types].xml", """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("xl/worksheets/sheet1.xml", sb.toString)
    zos.close()
  }

  test("xlsx batches → pipeline → history sink → key-players report") {
    val dir = java.nio.file.Files.createTempDirectory("graft_journey").toString
    val header = Seq("declaration number", "product description", "supplier",
      "amount in usd", "qty", "weight in kg", "date", "hs code", "month")
    writeXlsx(s"$dir/may.xlsx", Seq(header,
      Seq("m1", "KOMATSU PC200-8 EXCAVATOR", "MOKAC CO", "120000", "1", "20000", "2024/05/01", "84295200", "202405"),
      Seq("m2", "SANY SY215C EXCAVATOR", "SOMECO", "200000", "2", "43000", "2024/05/02", "84295200", "202405")))
    writeXlsx(s"$dir/jun.xlsx", Seq(header,
      Seq("j1", "XCMG XE215C EXCAVATOR", "XUZHOU CONSTRUCTION MACHINERY", "110000", "1", "21500", "2024/06/01", "84295200", "202406")))

    // distributed ingest of the whole directory (one partition per file)
    val fact = spark.read.format("graft-xlsx").load(dir)
    assert(fact.count() == 3)

    val enriched = Pipeline.run(fact,
      KnowledgeBase.sampleModelKb(spark), KnowledgeBase.sampleRegexKb(spark),
      KnowledgeBase.sampleRates(spark))

    val sink = s"$dir/history"
    graft.sources.CustomsSource.appendToHistory(enriched, sink)
    val history = graft.sources.CustomsSource.readHistory(spark, sink)
    assert(history.count() == 3)
    assert(history.filter($"brand" === "XCMG").count() == 1) // supplier alias hit

    // FY analytics over the history (A3/A4 composition)
    val shares = Analytics.sharesTable(history, "brand",
      col("`amount in usd`"), "share", "revenue")
    val got = shares.select($"brand", $"share").as[(String, Double)].collect().toMap
    assert(math.abs(got.values.sum - 100.0) < 1e-9)
    assert(got("SANY") > got("KOMATSU")) // 200k vs 120k

    // K2: the KB later learns a brand → re-match ONLY the affected rows of
    // the (supplier_norm-less) history, in place
    val rematched = Matching.rematchIndividual(history,
      col("remark") === Pipeline.Remark.noMatch, KnowledgeBase.sampleModelKb(spark))
    assert(rematched.count() == history.count())

    // golden export: the report a human opens, written back as xlsx and
    // re-readable (S2 closes the read-write loop)
    val golden = s"$dir/report.xlsx"
    graft.sources.CustomsSource.writeGoldenXlsx(
      shares.select($"brand", $"revenue".cast("double").as("revenue"), $"share"), golden)
    val reread = graft.sources.Xlsx.read(spark, golden)
    assert(reread.columns.toSeq == Seq("brand", "revenue", "share"))
    assert(reread.count() == shares.count())
  }

  test("corpus journey: raw docs → quality/dedup/pack → splits → LM + centroid signals") {
    import graft.ops._
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfTiny)

    // the five-stage prep pipeline, one call (q81's operator)
    val packed = CorpusPipeline.run(docs).persist()
    val keptIds = packed.select($"doc_id").distinct().as[Long].collect().toSet
    assert(keptIds.nonEmpty && keptIds.size < docs.count())

    // training splits over the SURVIVORS — stable under corpus growth
    val splits = docs.filter($"doc_id".isin(keptIds.toSeq: _*))
      .select($"doc_id", TextStats.assignSplit($"doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
    val bySplit = splits.groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit("train") > bySplit.getOrElse("val", 0L))

    // per-doc quality signals a curator would join in: corpus-LM score +
    // embedding distance to the doc's label centroid
    val lm = TextStats.lmScore(docs, "doc_id", "text")
    assert(lm.filter($"mean_p" < 0.0 || $"mean_p" > 1.0).isEmpty)
    val centroids = Similarity.centroidSim(
      Tables.embeddings(spark, sfTiny), "vec_id", "embedding", "label")
    assert(centroids.count() == Tables.embeddings(spark, sfTiny).count())

    // and the heavy-hitter vocabulary view over the kept corpus
    val hh = docs.filter($"doc_id".isin(keptIds.toSeq: _*))
      .select($"lang", explode(split(lower($"text"), " ")).as("term"))
      .groupBy($"lang").agg(Sketches.misraGries($"term", 10).as("mg"))
    assert(hh.count() > 0)
    packed.unpersist()
  }

  test("curation journey: boilerplate scrub → leakage-safe splits → balanced budgeted mixture → hard negatives") {
    import graft.ops._
    val docs = Tables.documents(spark, sfTiny)

    // 1. sub-document boilerplate scrub; the cleaned text feeds the mixture
    val scrubbed = Dedup.dedupSegments(docs, "doc_id", "text",
        segTokens = 8, maxOccurrences = 1L)
      .join(docs.select($"doc_id", $"lang", $"source"), "doc_id")
      .select($"doc_id", $"lang", $"source", $"clean_text".as("text"))
    assert(scrubbed.count() <= docs.count())

    // 2. leakage-safe splits: every near-dup cluster lands in ONE split
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text")
    val clusters = Dedup.connectedComponents(docs.select($"doc_id"), "doc_id", pairs)
    val assigned = clusters.select($"id".as("doc_id"), $"label",
      TextStats.assignSplit($"label",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
    val straddlers = assigned.groupBy($"label")
      .agg(countDistinct($"split").as("n")).filter($"n" > 1)
    assert(straddlers.isEmpty)

    // 3. equal-size language mixture, then a per-source token budget
    val balanced = Mixing.balancePerStratum(scrubbed, "doc_id", "lang")
    val sizes = balanced.groupBy($"lang").count()
      .as[(String, Long)].collect().map(_._2).toSet
    assert(sizes.size == 1, s"languages not equal-sized: $sizes")
    val budgeted = Mixing.tokenBudgetSelect(
      balanced.withColumn("n_tokens", size(split($"text", " ")).cast("long"))
        .withColumn("score", ops.TextStats.meanTokenLen($"text")),
      "doc_id", "source", "n_tokens", "score", budget = 500L)
    assert(budgeted.groupBy($"source").agg(max($"cum_tokens").as("m"))
      .filter($"m" > 500L).isEmpty)

    // 4. contrastive extras: cross-label hard negatives + compressed vectors
    val emb = Tables.embeddings(spark, sfTiny)
    val hn = Similarity.hardNegatives(emb, "vec_id", "embedding", "label", 64, 6)
    assert(hn.join(emb.select($"vec_id", $"label"), "vec_id")
      .filter($"label" === $"neg_label").isEmpty)
    val mv = emb.select(Similarity.matryoshka($"embedding", 16).as("mv"))
    assert(mv.filter(abs(sqrt(Similarity.norm2($"mv")) - 1.0) > 1e-3).isEmpty)
  }
}
