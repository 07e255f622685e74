package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Evidence for the SURVEY §4 bucketing claim: two tables bucketed the
  * same way on the join key join WITHOUT any exchange — the layout that
  * turns a repeated 100 TB fact⋈fact join from a per-run shuffle into a
  * one-time write cost. (Registry queries read the driver's plain
  * parquet, so this is spec-level evidence, like the S2 write half.) */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def withNoBroadcast[A](body: => A): A = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "-1"))
    try body
    finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("same-bucketed tables join with zero exchanges (co-located SMJ)") {
    val docs = graft.Tables.documents(spark, sfTiny)
    docs.write.mode("overwrite").bucketBy(4, "doc_id").sortBy("doc_id")
      .saveAsTable("graft_bucketed_docs")
    docs.select($"doc_id", length($"text").as("len"))
      .write.mode("overwrite").bucketBy(4, "doc_id").sortBy("doc_id")
      .saveAsTable("graft_bucketed_len")
    withNoBroadcast {
      val joined = spark.table("graft_bucketed_docs")
        .join(spark.table("graft_bucketed_len"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        "expected a sort-merge join over bucketed scans:\n" + plan.take(1500))
      assert(!plan.contains("Exchange"),
        "bucketed join still shuffles:\n" + plan.take(1500))
      assert(joined.count() == docs.count())
    }
  }

  test("the same join UNbucketed pays the exchange (the baseline the layout removes)") {
    val docs = graft.Tables.documents(spark, sfTiny)
    withNoBroadcast {
      val joined = docs.join(
        docs.select($"doc_id", length($"text").as("len")), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"),
        "control case should shuffle — did defaults change?\n" + plan.take(1200))
    }
  }
}
