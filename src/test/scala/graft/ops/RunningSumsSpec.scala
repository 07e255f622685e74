package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed prefix-sum hatch must be EQUAL to the
  * single-partition `sum()/lead() OVER (ORDER BY …)` windows it
  * replaces — proven here on multi-partition frames (including frames
  * with empty range partitions), not argued. */
class RunningSumsSpec extends SparkSpec {
  import spark.implicits._

  test("runningSums == sum() OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)") {
    // distinct sort keys (the call-site contract: value tables), two
    // sum columns at once, enough rows to span several range partitions
    val df = spark.range(1000).select($"id",
      ($"id" * 37 % 101).as("a"), ($"id" % 7).as("b"))
    val r = Ranks.runningSums(df, Seq("a" -> "ca", "b" -> "cb"), None, $"id")
    val w = Window.orderBy($"id").rowsBetween(Window.unboundedPreceding, 0)
    val want = df
      .withColumn("ca", sum($"a").over(w))
      .withColumn("cb", sum($"b").over(w))
    assert(r.df.exceptAll(want).isEmpty && want.exceptAll(r.df).isEmpty,
      "distributed prefix sum diverged from the window form")
    // totals and row count ride along from the partials job
    val (ta, tb) = df.agg(sum($"a"), sum($"b"))
      .as[(Long, Long)].collect().head
    assert(r.totals == Map("a" -> ta, "b" -> tb) && r.rows == 1000L)
    // and the decorated frame really spans several partitions (the point)
    val nPart = r.df.select(spark_partition_id()).distinct().count()
    assert(nPart > 1, s"prefix sum ran in $nPart partition(s) — hatch not engaged")
  }

  test("lead boundaries patch across range partitions (incl. global last)") {
    val df = spark.range(500).select(($"id" * 3).as("v"),
      lit(1L).as("c"))
    val r = Ranks.runningSums(df, Seq("c" -> "cum"), Some("v" -> "vn"), $"v")
    val w = Window.orderBy($"v")
    val want = df
      .withColumn("cum", sum($"c").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("vn", lead($"v", 1).over(w))
    assert(r.df.exceptAll(want).isEmpty && want.exceptAll(r.df).isEmpty,
      "lead across partition boundaries diverged from the window lead")
    // globally last row gets NULL, exactly one of them
    assert(r.df.filter($"vn".isNull).count() == 1L)
  }

  test("empty range partitions neither shift offsets nor break lead") {
    // 3 rows across 4 shuffle partitions: at least one partition is
    // empty; offsets/lead must skip it, not zero-fill through it
    val df = Seq((10L, 2L), (20L, 3L), (30L, 5L)).toDF("v", "c")
    val r = Ranks.runningSums(df, Seq("c" -> "cum"), Some("v" -> "vn"), $"v")
    val got = r.df.select($"v", $"cum", $"vn")
      .as[(Long, Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(got == Seq((10L, 2L, Some(20L)), (20L, 5L, Some(30L)),
      (30L, 10L, None)))
    assert(r.totals("c") == 10L && r.rows == 3L)
  }

  test("null sum inputs count as 0 (SQL sum skips them)") {
    val df = Seq((1L, Some(4L)), (2L, None), (3L, Some(6L)))
      .toDF("v", "c")
    val r = Ranks.runningSums(df, Seq("c" -> "cum"), None, $"v")
    val got = r.df.select($"v", $"cum").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 4L), (2L, 4L), (3L, 10L)))
    assert(r.totals("c") == 10L)
  }

  test("non-Long sum input is rejected loudly") {
    val df = Seq((1L, 1.5)).toDF("v", "c")
    val e = intercept[IllegalArgumentException] {
      Ranks.runningSums(df, Seq("c" -> "cum"), None, $"v")
    }
    assert(e.getMessage.contains("LongType"))
  }

  test("runningMaxByValue == RANGE-frame window maxima, ties included/excluded") {
    // only 7 distinct values over 400 rows: every range boundary falls
    // inside a tie group, which must share maxLe and exclude itself
    // from maxLt
    val df = spark.range(400).select($"id",
      ($"id" % 7 * 10).as("v"),
      when($"id" % 13 === 0, lit(null).cast("long"))
        .otherwise(($"id" * 31) % 97).as("y"))
    val got = Ranks.runningMaxByValue(df, "y", "mlt", "mle", $"v")
    val lt = Window.orderBy($"v").rangeBetween(Window.unboundedPreceding, -1)
    val le = Window.orderBy($"v")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("mlt", max($"y").over(lt))
      .withColumn("mle", max($"y").over(le))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "distributed RANGE running max diverged from the window form")
    val nPart = got.select(spark_partition_id()).distinct().count()
    assert(nPart > 1, s"running max ran in $nPart partition(s)")
  }

  test("runningMaxByValue: all-null prefix yields NULL, as SQL max does") {
    val df = Seq((1L, 10L, None: Option[Long]), (2L, 20L, None),
      (3L, 30L, Some(5L))).toDF("id", "v", "y")
    val got = Ranks.runningMaxByValue(df, "y", "mlt", "mle", $"v")
      .select($"id", $"mlt", $"mle")
      .as[(Long, Option[Long], Option[Long])].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, None, None), (2L, None, None),
      (3L, None, Some(5L))))
  }
}
