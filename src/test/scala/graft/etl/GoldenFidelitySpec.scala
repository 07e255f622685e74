package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Xlsx

/** End-to-end fidelity against the reference's REAL data (SURVEY §5.2):
  * run the pipeline on the actual customs input sheet
  * (`Input data/Indonesia_842952_May_July.xlsx`, 1294 rows) and compare
  * labels with the golden output
  * (`Output/Indonesia_excavator_2022_2024.07.xlsx`, 7627 rows).
  *
  * The author's model/regex knowledge bases are NOT in the repo (they load
  * from local paths, notebook cells 14/24), so both are reconstructed from
  * the golden output's own labeled rows: the model KB with spaced
  * model_ref variants ("330 GC" → 330GC, the mapping the reference's
  * explicit model_ref column encodes), and a literal regex KB generated
  * from the labeled models (K1-style, so "R215" also matches inside
  * "FR215F..." serials). Measured agreement: brand ≈96.2%, model ≈95.2%,
  * used/new 100%. Residual disagreement traces to KB history the golden
  * table cannot reveal (patterns the author's sheet did/didn't contain in
  * May–Jul 2024, model_ref mappings like 915E ↔ CLG915E).
  *
  * CRANE golden: none exists to pin. The reference repo ships exactly one
  * golden output (`Output/Indonesia_excavator_2022_2024.07.xlsx`,
  * excavator) and one report (`Report/Indonesia Excavator Import Report
  * 2023.pdf` — excavator-only by title, and a full decompressed-stream
  * scan of the PDF finds no "crane"/"crawler"/"lattice"/"lifting"
  * occurrence). The crane branch's semantics (matching_program
  * file_type='crane', lattice-boom refinement, crane load intervals,
  * translation merge — data_processing_program_20240520.py:140-144,
  * 387-399) are therefore pinned only by their oracle-gated queries
  * (q52/q68 + `LookupsSpec`), not by a published aggregate table.
  */
class GoldenFidelitySpec extends SparkSpec {
  import spark.implicits._

  private val inputXlsx = "/root/reference/Input data/Indonesia_842952_May_July.xlsx"
  private val goldenXlsx = "/root/reference/Output/Indonesia_excavator_2022_2024.07.xlsx"

  lazy val golden = Xlsx.read(spark, goldenXlsx).cache()

  lazy val joined = {
    val in = Xlsx.read(spark, inputXlsx)
    val kb = golden.filter($"model" =!= "UNKNOWN" && $"brand" =!= "UNKNOWN")
      .select($"brand", $"model",
        expr("try_cast(capacity AS DOUBLE)").as("capacity"), $"type",
        expr("try_cast(hp AS DOUBLE)").as("hp"))
      .groupBy("brand", "model")
      .agg(first($"capacity").as("capacity"), first($"type").as("type"), first($"hp").as("hp"))
      .orderBy("brand", "model")
    val rates = Rates.rateTable(spark,
      for { y <- 2022 to 2024; m <- 1 to 12 } yield (y, m, 7.0))
    val mine = Pipeline.run(in,
      KnowledgeBase.expandModelRefVariants(kb),
      KnowledgeBase.regexKbFromModels(kb), rates)
      .select($"description2".as("d2"), $"`amount in usd`".as("amt"),
        $"brand", $"model", $"`new/used`".as("usednew"), $"remark")
      .dropDuplicates("d2", "amt")
    val gsub = golden.filter($"month".isin("202405", "202406", "202407"))
      .select(
        Normalize.collapseWs(Normalize.preProcess(
          Normalize.applyAliases(upper($"`product description`"), Normalize.customsAliases))).as("d2"),
        expr("try_cast(`amount in usd` AS DOUBLE)").as("amt"),
        $"brand".as("g_brand"), $"model".as("g_model"),
        $"`new/used`".as("g_usednew"), $"remark".as("g_remark"))
      .dropDuplicates("d2", "amt")
    mine.join(gsub, Seq("d2", "amt")).cache()
  }

  test("real input parses to the documented 27×1294 sheet; golden to 43×7627") {
    val in = Xlsx.read(spark, inputXlsx)
    assert(in.columns.length == 27 && in.count() == 1294)
    assert(golden.columns.length == 43 && golden.count() == 7627)
  }

  test("≥600 of the ~832 golden May–Jul rows align on (description2, amount)") {
    assert(joined.count() >= 600)
  }

  test("brand agreement ≥ 95% with only repo-recoverable knowledge") {
    val n = joined.count().toDouble
    val agree = joined.filter($"brand" === $"g_brand").count()
    assert(agree / n >= 0.95, s"brand agreement ${agree / n}")
  }

  test("model agreement ≥ 94%") {
    val n = joined.count().toDouble
    val agree = joined.filter($"model" === $"g_model").count()
    assert(agree / n >= 0.94, s"model agreement ${agree / n}")
  }

  test("used/new classifier matches the golden labels ≥ 99%") {
    val n = joined.count().toDouble
    val agree = joined.filter($"usednew" === $"g_usednew").count()
    assert(agree / n >= 0.99, s"used/new agreement ${agree / n}")
  }

  test("disagreements trace to the missing private KBs, not our matcher") {
    // cross-brand disagreements are bounded and every one is a KB-content
    // ambiguity, not a matcher bug: (a) "FR215F 800 TRACK SHOES..." rows —
    // FR215F/FR215E2/FR220D ARE LOVOL models in the golden table, but the
    // author's private mapping labels these rows HYUNDAI R215/R220 (their
    // regex sheet matched the embedded R2xx); our longest-match picks the
    // LOVOL model the description literally names. (b) one supplier-
    // containment hit ("WORLD" in the supplier name) the author's private
    // KB overrode to XCMG.
    val invented = joined
      .filter($"brand" =!= $"g_brand" && $"brand" =!= "UNKNOWN" && $"g_brand" =!= "UNKNOWN")
    assert(invented.count() <= 12)
    val families = invented.groupBy($"g_brand", $"brand").count().count()
    assert(families <= 3, "unexpected new cross-brand disagreement family")
  }
}
