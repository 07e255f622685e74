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

  test("cka: self-similarity pins to 1; an orthogonal transform preserves it") {
    // deterministic 4-dim cloud, 60 rows
    def v(i: Long) = Seq(
      math.sin(i * 0.7).toFloat, math.cos(i * 1.3).toFloat,
      (i % 5 - 2).toFloat / 3f, math.sin(i * 0.29 + 1).toFloat)
    val e = (0L until 60L).map(i => (i, v(i), v(i)))
      .toDF("id", "x", "y")
    val self = Linalg.cka(e, col("x"), col("y"), 4, 4)
      .select(col("cka")).as[Option[Double]].head().get
    assert(math.abs(self - 1.0) < 1e-4, s"CKA(X,X) = $self")
    // orthogonal transform: permute dims and flip signs
    val rot = (0L until 60L).map { i =>
      val a = v(i); (i, a, Seq(-a(2), a(0), a(3), -a(1)))
    }.toDF("id", "x", "y")
    val r = Linalg.cka(rot, col("x"), col("y"), 4, 4)
      .select(col("cka")).as[Option[Double]].head().get
    assert(math.abs(r - 1.0) < 1e-4, s"CKA under orthogonal transform = $r")
  }

  test("cka: unrelated representations score low; degenerate Y is NULL") {
    def vx(i: Long) = Seq(math.sin(i * 0.7).toFloat, math.cos(i * 1.3).toFloat)
    def vy(i: Long) = Seq(((i * 7919) % 13 - 6).toFloat / 6f,
      ((i * 104729) % 17 - 8).toFloat / 8f)
    val e = (0L until 200L).map(i => (i, vx(i), vy(i))).toDF("id", "x", "y")
    val low = Linalg.cka(e, col("x"), col("y"), 2, 2)
      .select(col("cka")).as[Option[Double]].head().get
    assert(low < 0.5, s"independent spaces should score low: $low")
    val const = (0L until 50L).map(i => (i, vx(i), Seq(1f, 1f))).toDF("id", "x", "y")
    val nul = Linalg.cka(const, col("x"), col("y"), 2, 2)
      .select(col("cka")).as[Option[Double]].head()
    assert(nul.isEmpty, "constant Y has zero covariance — CKA must be NULL")
  }

  test("cka on the int8 round trip (dequant8) stays near 1 on real embeddings") {
    val emb = graft.Tables.embeddings(spark, sfTiny).limit(200)
    val got = Linalg.cka(emb, col("embedding"),
        Quantize.dequant8(col("embedding")), 64, 64)
      .select(col("cka")).as[Option[Double]].head().get
    assert(got > 0.99, s"int8 should preserve the geometry: $got")
  }
}
