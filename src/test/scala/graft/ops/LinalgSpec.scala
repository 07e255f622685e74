package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{GramFixExpr, VectorOps}

/** Bit-equivalence of the codegen'd Gram kernel with the declarative
  * (nested-transform) twin and with Spark SQL `round()` semantics — the
  * same equivalence-spec convention the cosine/shingle kernels follow. */
class LinalgSpec extends SparkSpec {
  import spark.implicits._

  private val Fx = 1099511627776.0

  test("gramFix == nested-transform declarative twin on real embeddings") {
    val emb = graft.Tables.embeddings(spark, sfTiny).limit(100)
    val v = col("embedding")
    val dim = 64
    val declarative = flatten(transform(sequence(lit(0), lit(dim - 1)), i =>
      transform(sequence(i, lit(dim - 1)), j =>
        round(element_at(v, i + 1).cast("double") *
          element_at(v, j + 1).cast("double") * Fx).cast("long"))))
    val rows = emb.select(VectorOps.gramFix(v, Fx).as("fast"), declarative.as("slow"))
      .as[(Seq[Long], Seq[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (fast, slow) => assert(fast == slow) }
  }

  test("roundHalfAway matches Spark SQL round on boundary values") {
    val vals = Seq(2.5, -2.5, 0.5, -0.5, 1.5, -1.5, 0.49999999999999994,
      -0.49999999999999994, 2.4999999999999996, 3.5000000000000004, 0.0,
      -0.0, 123456789.5, -123456789.5)
    val viaSql = vals.toDF("v").select(round(col("v")).cast("long")).as[Long].collect()
    vals.zip(viaSql).foreach { case (v, expected) =>
      assert(GramFixExpr.roundHalfAway(v) == expected, s"mismatch at $v")
    }
  }

  test("covariance diagonal equals standardize's variance construction") {
    val emb = graft.Tables.embeddings(spark, sfTiny)
    val n = emb.count().toDouble
    val diag = Linalg.covariance(emb, "embedding", 64)
      .filter(col("i") === col("j")).orderBy(col("i"))
      .select(col("cov")).as[Double].collect()
    assert(diag.length == 64 && diag.forall(_ > 0.0))
  }
}
