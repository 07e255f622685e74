package graft

import org.apache.spark.sql.functions._

import graft.ops.{Drift, Market, Profile, Sketches}

/** Partition-invariance evidence: the fixed-point / exact-decimal
  * disciplines claim bit-identical results on ANY physical
  * partitioning — this spec asserts it directly by running
  * arithmetic-sensitive ops on the same data repartitioned two
  * different ways and comparing collected row SETS. A double-sum
  * formulation of any of these would fail here under fold-order
  * drift; these must not. */
class DeterminismSpec extends SparkSpec {
  import spark.implicits._

  private def bothWays[T](f: Int => Set[T]): Unit =
    assert(f(3) == f(7), "output changed under repartitioning")

  test("momentsProfile is partition-invariant (9-dp centered powers)") {
    val orders = Tables.orders(spark, sfTiny)
    bothWays { np =>
      Profile.momentsProfile(orders.repartition(np),
        "o_orderpriority", "o_totalprice").collect().map(_.toString).toSet
    }
  }

  test("jsDivergence is partition-invariant (decimal term sums)") {
    val docs = Tables.documents(spark, sfTiny)
    bothWays { np =>
      val d = docs.repartition(np)
      def tok(f: org.apache.spark.sql.Column) = d.filter(f)
        .select(explode(split(lower($"text"), " ")).as("t"))
        .where($"t" =!= "")
      Drift.jsDivergence(tok($"lang" === "en"), tok($"lang" =!= "en"), "t")
        .collect().map(_.toString).toSet
    }
  }

  test("priceElasticity is partition-invariant (9-dp ln fixed point)") {
    val li = Tables.lineitem(spark, sfTiny)
      .join(Tables.part(spark, sfTiny), $"l_partkey" === $"p_partkey")
    bothWays { np =>
      Market.priceElasticity(li.repartition(np), "p_brand",
          date_format(date_trunc("month", $"l_shipdate"), "yyyy-MM"),
          "l_quantity", "l_extendedprice")
        .collect().map(_.toString).toSet
    }
  }

  test("minhash signatures are partition-invariant (mergeable mins)") {
    val docs = Tables.documents(spark, sfTiny)
    bothWays { np =>
      docs.repartition(np)
        .select($"source", explode(graft.functions.HashOps.md5Prefix60Array(
          split(lower($"text"), " "))).as("h"))
        .groupBy($"source").agg(Sketches.minhashSig($"h", 16).as("sig"))
        .select($"source", concat_ws(",", transform($"sig", _.cast("string"))))
        .collect().map(_.toString).toSet
    }
  }

  test("theilDecompose is partition-invariant (9-dp decimal ln terms)") {
    val orders = Tables.orders(spark, sfTiny)
      .join(Tables.customer(spark, sfTiny), $"o_custkey" === $"c_custkey")
      .join(Tables.nation(spark, sfTiny), $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"o_totalprice")
    bothWays { np =>
      Market.theilDecompose(orders.repartition(np), "n_name", "o_totalprice")
        .collect().map(_.toString).toSet
    }
  }

  test("excessLossDeciles is partition-invariant (q84 fixed-point means)") {
    val docs = Tables.documents(spark, sfTiny)
    bothWays { np =>
      graft.ops.TextStats.excessLossDeciles(docs.repartition(np), "doc_id",
          "text", $"doc_id" % 3 === 0, $"doc_id" % 3 === 1)
        .collect().map(_.toString).toSet
    }
  }

  test("rakeKeyphrases is partition-invariant (9-dp member sums)") {
    val docs = Tables.documents(spark, sfTiny)
    bothWays { np =>
      graft.ops.TextStats.rakeKeyphrases(docs.repartition(np), "doc_id",
          "text", Seq("the", "a", "der", "und", "el", "y", "le", "et"), 20)
        .collect().map(_.toString).toSet
    }
  }

  test("permutationTest is partition-invariant (seeded draws + decimal sums)") {
    val orders = Tables.orders(spark, sfTiny)
    bothWays { np =>
      Profile.permutationTest(orders.repartition(np), "o_orderkey",
          "o_totalprice", pmod($"o_orderkey", lit(2)) === 0, perms = 16)
        .collect().map(_.toString).toSet
    }
  }
}
