package graft.etl

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero exchanges") {
    Scale.writeBucketed(Tables.lineitem(spark, sfTiny)
      .select("l_orderkey", "l_partkey", "l_extendedprice"), "li_b", 4, Seq("l_partkey"))
    Scale.writeBucketed(Tables.part(spark, sfTiny)
      .select("p_partkey", "p_brand"), "part_b", 4, Seq("p_partkey"))
    val joined = spark.table("li_b")
      .join(spark.table("part_b"), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand").agg(count(lit(1)).as("n"))
    // disable broadcast so the join actually tests bucket co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      // SortMergeJoin with NO ShuffleExchange feeding it: buckets align
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning(l_partkey"),
        s"fact side was shuffled:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(p_partkey"),
        s"dim side was shuffled:\n$plan")
      // and the result is right
      val viaBucket = joined.as[(String, Long)].collect().toMap
      val plain = Tables.lineitem(spark, sfTiny)
        .join(Tables.part(spark, sfTiny), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      assert(viaBucket == plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("salted join equals plain join on skewed data") {
    // heavy hitter: 90% of facts share one key
    val fact = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 1L, i.toLong))
      .toDF("k", "v")
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"), (5L, "d"), (6L, "e"), (0L, "z"))
      .toDF("k", "label")
    val salted = Scale.saltedJoin(fact, dim, "k", "v", 8)
      .groupBy("label").count().as[(String, Long)].collect().toMap
    val plain = fact.join(dim, Seq("k")).groupBy("label").count()
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("salted two-phase sum equals direct exact sum") {
    val df = (1 to 1000).map(i => ("hot", i * 1.01)).toDF("k", "v")
    val salted = Scale.saltedSum(df, "k", "v", $"v", 8, "total")
      .as[(String, Double)].head()
    val direct = df.groupBy($"k")
      .agg(sum($"v".cast("decimal(18,6)")).cast("double").as("t"))
      .as[(String, Double)].head()
    assert(salted == direct)
  }
}
