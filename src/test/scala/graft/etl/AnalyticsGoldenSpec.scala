package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Xlsx

/** Reproduce the reference's PUBLISHED analytic numbers (BASELINE.md
  * "Golden analytic results") from its real golden output with our
  * Analytics/Enrich/Outliers modules.
  */
class AnalyticsGoldenSpec extends SparkSpec {
  import spark.implicits._

  lazy val golden = Xlsx.read(spark, "/root/reference/Output/Indonesia_excavator_2022_2024.07.xlsx")
    .withColumn("amt", expr("try_cast(`amount in usd` AS DOUBLE)"))
    .withColumn("price", expr("try_cast(`price in usd` AS DOUBLE)"))
    .withColumn("capn", expr("try_cast(capacity AS DOUBLE)"))
    // golden `date` is an Excel serial (days since 1899-12-30)
    .withColumn("yr", year(expr("date_add(DATE '1899-12-30', CAST(try_cast(date AS DOUBLE) AS INT))")))
    .cache()

  private def shareOf(df: org.apache.spark.sql.DataFrame, brand: String): (Double, Double) =
    Analytics.sharesTable(df, "brand", $"amt")
      .filter($"brand" === brand)
      .select($"total_value".cast("double"), $"share")
      .as[(Double, Double)].head()

  test("key players May–Jul 2024 match notebook cell 65: SANY $52.2M/27.4% …") {
    val mj = golden.filter($"month".isin("202405", "202406", "202407"))
    val (sanyV, sanyS) = shareOf(mj, "SANY")
    assert(math.abs(sanyV - 5.223730607e7) < 1.0 && math.abs(sanyS - 27.435) < 0.01)
    val (komV, komS) = shareOf(mj, "KOMATSU")
    assert(math.abs(komV - 3.076032321e7) < 1.0 && math.abs(komS - 16.156) < 0.01)
    val (_, kobS) = shareOf(mj, "KOBELCO")
    assert(math.abs(kobS - 9.119) < 0.01)
    val (unkV, unkS) = shareOf(mj, "UNKNOWN")
    assert(math.abs(unkV - 1.241424619e7) < 1.0 && math.abs(unkS - 6.520) < 0.01)
  }

  test("key players FY2023 match notebook cell 87 / PDF p.7") {
    val fy = golden.filter($"yr" === 2023)
    assert(math.abs(shareOf(fy, "KOMATSU")._2 - 21.02) < 0.05)
    assert(math.abs(shareOf(fy, "SANY")._2 - 14.89) < 0.05)
    assert(math.abs(shareOf(fy, "HITACHI")._2 - 12.57) < 0.05)
    assert(math.abs(shareOf(fy, "KOBELCO")._2 - 11.94) < 0.05)
    assert(math.abs(shareOf(fy, "XCMG")._2 - 9.05) < 0.05)
  }

  test("top-3 players (py:693) = SANY, KOMATSU, KOBELCO for May–Jul 2024") {
    val mj = golden.filter($"month".isin("202405", "202406", "202407"))
    val top = Analytics.topK(mj, "brand", $"amt", 3).select("brand").as[String].collect()
    assert(top.toSeq == Seq("SANY", "KOMATSU", "KOBELCO"))
  }

  test("our interval bucketing reproduces the golden interval columns ≥ 99.9%") {
    val basis = when($"capn".isNotNull && $"capn" > 0, $"capn")
      .otherwise(expr("try_cast(`unit weight in ton` AS DOUBLE)"))
    val iv = golden
      .withColumn("my_iv", Enrich.dynamicBuckets(basis, 10))
      .withColumn("my_tv", Enrich.fixedBuckets(basis))
    val n = iv.count().toDouble
    assert(iv.filter($"my_iv" === $"`capacity interval`").count() / n >= 0.999)
    assert(iv.filter($"my_tv" === $"`type interval`").count() / n >= 0.999)
    // the ≤0.1% residue: rows with capacity=0 AND weight=0, which the
    // reference labels '<5T' where the documented intent (cell 51) is
    // UNKNOWN — see SURVEY §2.12 bug 6
  }

  test("golden outliers distribution reads back exactly (no 6155 / unknown 1352 / yes 120)") {
    val d = golden.groupBy("outliers").count().as[(String, Long)].collect().toMap
    assert(d == Map("no" -> 6155L, "unknown" -> 1352L, "yes" -> 120L))
  }

  test("batch-local outlier recompute matches the golden May–Jul batch ≥ 98.5%") {
    // the reference marks outliers per ingest batch BEFORE the history
    // union (cell 50 runs on the new batch alone) — recomputing within
    // the same window reproduces 823/832; the 9 leftovers are rows whose
    // capacity was relabeled to UNKNOWN after the outlier pass ran
    val mj = golden.filter($"month".isin("202405", "202406", "202407"))
    val unknownCond = $"model" === "UNKNOWN" || $"capacity" === "UNKNOWN" ||
      $"`new/used`" === "used"
    val mine = Outliers.markOutliers(mj, "price", Seq("brand", "model"), unknownCond, "my_out")
    val n = mine.count().toDouble
    assert(mine.filter($"my_out" === $"outliers").count() / n >= 0.985)
  }

  test("recomputed outlier flags agree ≥ 94% with the incremental golden labels") {
    // golden was produced batch-by-batch against history-at-the-time
    // medians; recomputing from the final table shifts some medians, so
    // exact reproduction is impossible by construction
    val unknownCond = $"model" === "UNKNOWN" || $"capn".isNull || $"`new/used`" === "used"
    val mine = Outliers.markOutliers(golden, "price", Seq("brand", "model"), unknownCond, "my_out")
    val n = mine.count().toDouble
    assert(mine.filter($"my_out" === $"outliers").count() / n >= 0.94)
  }
}
