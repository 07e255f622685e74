package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** End-to-end pipeline test on a customs-shaped fixture (FIXTURES.md A1):
  * each row exercises one matching path of SURVEY.md §3 E2. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def factRow(id: String, desc: String, supplier: String, amount: Double,
      qty: Double, kg: Double, date: String) =
    (id, desc, supplier, amount, qty, kg, date, "84295200", "202405")

  lazy val fact = Seq(
    // full KB match (brand in desc, model longest)
    factRow("r1", "KOMATSU PC200-8 EXCAVATOR YEAR 2020", "MOKAC CO", 120000, 1, 20000, "2024/05/01"),
    // brand via supplier alias (XUZHOU → XCMG), model via regex
    factRow("r2", "EXCAVATOR XE215C UNIT", "XUZHOU CONSTRUCTION MACHINERY CO", 110000, 1, 21000, "2024/05/02"),
    // brand known, no model → regex pass (brand-scoped)
    factRow("r3", "SANY EXCAVATOR SY365H GOOD", "SOMECO", 105000, 1, 36500, "2024/05/03"),
    // no brand anywhere → global regex (KOMATSU pattern)
    factRow("r4", "MACHINE PC2000 HEAVY", "NOBRAND LTD", 500000, 1, 200000, "2024/05/04"),
    // no match at all
    factRow("r5", "MYSTERY DEVICE", "NOBRAND LTD", 90000, 1, 15000, "2024/05/05"),
    // used marker + year token
    factRow("r6", "USED KOMATSU PC200-8 YEAR 2015", "MOKAC CO", 95000, 1, 20000, "2024/05/06"),
    // irrelevant keyword → dropped
    factRow("r7", "WHEEL LOADER BIG", "MOKAC CO", 100000, 1, 9000, "2024/05/07"),
    // below amount threshold → dropped
    factRow("r8", "KOMATSU PC200-8", "MOKAC CO", 5000, 1, 20000, "2024/05/08"),
    // capacity from description text (brand known, no model, no regex hit)
    factRow("r9", "HITACHI SPECIAL 25 TONS RIG", "SOMECO", 130000, 1, 25000, "2024/05/09"),
    // parts row
    factRow("r10", "KOMATSU SPARE PARTS SKD", "MOKAC CO", 60000, 1, 3000, "2024/05/10"))
    .toDF("declaration number", "product description", "supplier", "amount in usd",
      "qty", "weight in kg", "date", "hs code", "month")

  lazy val out = Pipeline.run(fact,
    KnowledgeBase.sampleModelKb(spark), KnowledgeBase.sampleRegexKb(spark),
    KnowledgeBase.sampleRates(spark)).cache()

  private def row(id: String) =
    out.filter($"`declaration number`" === id).collect().headOption
      .map(r => out.columns.zip(r.toSeq).toMap)

  test("filters: low-amount and irrelevant rows dropped") {
    val ids = out.select($"`declaration number`").as[String].collect().toSet
    assert(!ids.contains("r7") && !ids.contains("r8"))
    assert(ids.size == 8)
  }

  test("full KB match path") {
    val r = row("r1").get
    assert(r("brand") == "KOMATSU" && r("model") == "PC200-8")
    assert(r("type") == "EXCAVATOR" && r("capacity") == 20.0)
    assert(r("remark") == Pipeline.Remark.fully)
    assert(r("new/used") == "new")
  }

  test("supplier alias feeds brand match; regex completes the model") {
    val r = row("r2").get
    assert(r("brand") == "XCMG")
    assert(r("model") == "XE215C")
    assert(r("capacity") == 21.5) // starting_point 0: 215/10
  }

  test("brand-scoped regex pass with capacity decode") {
    val r = row("r3").get
    assert(r("brand") == "SANY" && r("model") == "SY365H")
    assert(r("remark") == Pipeline.Remark.uniqueRegex)
    assert(r("capacity") == 36.5)
  }

  test("global regex pass labels brand from the pattern table") {
    val r = row("r4").get
    assert(r("brand") == "KOMATSU" && r("model") == "PC2000")
    assert(r("remark") == Pipeline.Remark.noBrandUniqueRegex)
  }

  test("no-match rows keep UNKNOWNs") {
    val r = row("r5").get
    assert(r("brand") == "UNKNOWN" && r("model") == "UNKNOWN")
    assert(r("remark") == Pipeline.Remark.noMatch)
  }

  test("used detection from marker tokens") {
    assert(row("r6").get("new/used") == "used")
  }

  test("capacity extracted from description text") {
    val r = row("r9").get
    assert(r("capacity") == 25.0)
    assert(r("remark") == Pipeline.Remark.capacityInDesc)
  }

  test("parts remark wins over match provenance") {
    assert(row("r10").get("remark") == Pipeline.Remark.parts)
  }

  test("intervals, outliers and cny columns are populated") {
    val r = row("r1").get
    assert(r("capacity interval") == "20-30T")
    assert(r("type interval") == "10-30T")
    assert(Set("yes", "no", "unknown").contains(r("outliers").asInstanceOf[String]))
    val cny = r("amount in cny").asInstanceOf[Double]
    assert(math.abs(cny - 120000 * (6.7 + 0.4 + 5 * 0.005)) < 1e-6)
  }

  test("used rows and unlabeled rows get outliers=unknown") {
    assert(row("r6").get("outliers") == "unknown")
    assert(row("r5").get("outliers") == "unknown")
  }

  test("K2 over actual pipeline output: supplier_norm is re-derived, not required") {
    // `out` comes from Pipeline.run, whose runStages drops supplier_norm —
    // the documented K2 flow (re-match pipeline output by remark class).
    assert(!out.columns.contains("supplier_norm"))
    val rematched = Matching.rematchIndividual(out,
      col("remark") === Pipeline.Remark.noMatch, KnowledgeBase.sampleModelKb(spark))
    assert(!rematched.columns.contains("supplier_norm")) // not leaked into output
    assert(rematched.count() == out.count())
    // r2's brand came from the supplier alias (XUZHOU → XCMG); force it
    // through the rematch path and prove the supplier-derived brand survives
    val viaSupplier = Matching.rematchIndividual(out,
      $"`declaration number`" === "r2", KnowledgeBase.sampleModelKb(spark))
      .filter($"`declaration number`" === "r2")
      .select($"brand").as[String].head()
    assert(viaSupplier == "XCMG")
  }

  test("output schema carries the §1.3 enrichment columns") {
    val need = Seq("description2", "brand", "model", "type", "capacity",
      "capacity interval", "type interval", "new/used", "unit weight in ton",
      "price in cny", "amount in cny", "outliers", "hp", "remark", "datasource")
    assert(need.forall(out.columns.contains))
  }
}

class CranePipelineSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("crane mode: capacity-only intervals + type translation merge") {
    def factRow(id: String, desc: String, kg: Double) =
      (id, desc, "MOKAC CO", 900000.0, 1.0, kg, "2024/05/01", "84261100", "202405")
    val fact = Seq(
      factRow("c1", "GROVE RT765E ROUGH TERRAIN CRANE", 60000.0),
      factRow("c2", "KOMATSU MYSTERY RIG", 50000.0)) // no capacity → UNKNOWN, no weight fallback
      .toDF("declaration number", "product description", "supplier", "amount in usd",
        "qty", "weight in kg", "date", "hs code", "month")
    val translations = Seq(("ROUGH-TERRAIN CRANE", "越野轮胎起重机")).toDF("key", "translated")
    val out = Pipeline.runCrane(fact,
      KnowledgeBase.sampleModelKb(spark), KnowledgeBase.sampleRegexKb(spark),
      KnowledgeBase.sampleRates(spark), Some(translations), loadInterval = 50)
    val r1 = out.filter($"`declaration number`" === "c1").collect().head
    val m1 = out.columns.zip(r1.toSeq).toMap
    assert(m1("capacity interval") == "50-100T") // 60T in a 50-wide band
    assert(m1("type_translated") == "越野轮胎起重机")
    val m2 = out.columns.zip(
      out.filter($"`declaration number`" === "c2").collect().head.toSeq).toMap
    assert(m2("capacity interval") == "UNKNOWN") // crane: NO weight fallback
    assert(m2("type interval") == "UNKNOWN")
  }

  test("K2: scoped re-match only touches the targeted rows") {
    val df = Seq(
      ("r1", "KOMATSU PC200-8 UNIT", "S", "No match"),
      ("r2", "SANY SY215C UNIT", "S", "Fully match"))
      .toDF("declaration number", "description2", "supplier_norm", "remark")
      .withColumn("brand", lit("STALE")).withColumn("model", lit("STALE"))
      .withColumn("capacity", lit(null).cast("double"))
      .withColumn("type", lit("STALE")).withColumn("hp", lit(null).cast("double"))
    val out = Matching.rematchIndividual(df, col("remark") === "No match",
      KnowledgeBase.sampleModelKb(spark))
    val byId = out.select($"`declaration number`", $"brand", $"model", $"remark")
      .as[(String, String, String, String)].collect().map(r => r._1 -> r).toMap
    assert(byId("r1")._2 == "KOMATSU" && byId("r1")._3 == "PC200-8"
      && byId("r1")._4 == Pipeline.Remark.fully)
    assert(byId("r2")._2 == "STALE") // untouched
  }
}
