package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The range-partitioned exact-rank hatch must be EQUAL to the
  * single-partition `row_number()/ntile()` windows it replaces — proven
  * here on a multi-partition frame, not argued. */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  test("withRowNumber == row_number() OVER (ORDER BY ...) exactly") {
    val parts = Tables.part(spark, sfTiny)
      .select($"p_partkey", $"p_name", $"p_size")
    val got = Ranks.withRowNumber(parts, "rn", $"p_name", $"p_partkey")
      .select($"p_partkey", $"rn")
    val want = parts.withColumn("rn",
        row_number().over(Window.orderBy($"p_name", $"p_partkey")).cast("long"))
      .select($"p_partkey", $"rn")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "range-partitioned rank diverged from the window rank")
    // and the ranked frame really spans several partitions (the point)
    val nPart = Ranks.withRowNumber(parts, "rn", $"p_name", $"p_partkey")
      .select(spark_partition_id()).distinct().count()
    assert(nPart > 1, s"rank ran in $nPart partition(s) — hatch not engaged")
  }

  test("withRowNumber: ties across range boundaries stay deterministic") {
    // a 1000-row frame with only 3 distinct sort-key values forces every
    // range partition boundary into a tie run; id tie-break keeps exact
    val df = spark.range(1000).select($"id",
      pmod($"id", lit(3)).as("k"))
    val got = Ranks.withRowNumber(df, "rn", $"k", $"id")
    val want = df.withColumn("rn",
      row_number().over(Window.orderBy($"k", $"id")).cast("long"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("ntileFromRank == ntile() OVER (ORDER BY ...) for ragged buckets") {
    // 103 rows / 8 buckets: 103 % 8 = 7 buckets of 13, one of 12 — the
    // ragged case where an off-by-one would diverge
    val df = spark.range(103).select($"id")
    val n = df.count()
    for (b <- Seq(1, 7, 8, 32, 200)) { // incl. n < buckets
      val got = Ranks.withRowNumber(df, "rn", $"id")
        .select($"id", Ranks.ntileFromRank($"rn", n, b).as("t"))
      val want = df.select($"id",
        ntile(b).over(Window.orderBy($"id")).cast("long").as("t"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"ntile($b) diverged")
    }
  }

  test("withNtile == ntile() window, including DESC sort orders") {
    val df = spark.range(157).select($"id",
      pmod($"id" * 37, lit(91)).as("v"))
    val got = Ranks.withNtile(df, "t", 8, $"v".desc, $"id")
      .select($"id", $"t")
    val want = df.select($"id",
      ntile(8).over(Window.orderBy($"v".desc, $"id")).cast("long").as("t"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "desc-ordered withNtile diverged from the window ntile")
  }

  test("sortedNeighborhoodCandidates payload structs carry both sides") {
    val df = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("id", "name", "v")
    val cand = Linkage.sortedNeighborhoodCandidates(df, "id", $"name",
      Seq("name", "v"), window = 2)
    val rows = cand.select($"id_a", $"id_b",
        $"__fa".getField("v"), $"__fb".getField("v"))
      .as[(Long, Long, Int, Int)].collect().sorted
    assert(rows.toSeq == Seq((1L, 2L, 10, 20), (1L, 3L, 10, 30),
      (2L, 3L, 20, 30)))
  }
}
