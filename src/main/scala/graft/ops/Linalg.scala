package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed dense linear algebra over an embedding column — the
  * feature-engineering tier: second-moment/covariance matrix (the input
  * to PCA/whitening) and per-dimension standardization.
  *
  * Determinism contract (the q80/q89 construction): every data-dependent
  * sum runs over 2^40 FIXED-POINT integers (v·2^40 is an exact exponent
  * shift; `round` is half-away-from-zero in Spark SQL and DuckDB alike;
  * integer sums commute), carried as decimal(38,0) so no corpus size can
  * overflow, cast to double only at the final divide. Results are
  * bit-identical on any partitioning and any engine.
  */
object Linalg {

  private val Fx = 1099511627776.0 // 2^40

  /** Upper-triangle covariance matrix of a `dim`-wide vector column:
    * (i, j, cov) for 0 ≤ i ≤ j < dim, cov = E[xᵢxⱼ] − E[xᵢ]E[xⱼ].
    *
    * Scale shape: the pair explode (dim·(dim+1)/2 rows per vector) is
    * built by ONE nested-transform expression and exploded map-side; the
    * only shuffle is the partial-combining (i, j) aggregation — it
    * carries ≤ dim²·partitions partial sums, never the exploded corpus.
    * The output is dim²-bounded (driver-small at any corpus size): the
    * eigendecomposition for PCA runs driver-side on this matrix, exactly
    * like the k-means fit collects k×dim. */
  def covariance(emb: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    // upper-triangle fixed-point products via the codegen'd GramFixExpr
    // kernel (the nested-transform HOF form is interpreted per element —
    // measured 4.4 s vs 0.9 s at sf0.1); (pos → i,j) resolves through a
    // broadcast dim²-row literal AFTER the aggregation, so the mapping
    // join touches 2080 rows, never the corpus
    val spark = emb.sparkSession
    import spark.implicits._
    val m2 = emb
      .select(posexplode(graft.functions.VectorOps.gramFix(col(vecCol), Fx))
        .as(Seq("__pos", "__p")))
      .groupBy(col("__pos"))
      .agg(sum(col("__p").cast("decimal(38,0)")).cast("double").as("m2fx"),
        count(lit(1)).as("n"))
      .join(broadcast(
        (for { i <- 0 until dim; j <- i until dim } yield (i, j))
          .zipWithIndex.map { case ((i, j), k) => (k, i, j) }
          .toDF("__pos", "i", "j")), Seq("__pos"))
      .drop("__pos")
    val m1 = emb.select(posexplode(col(vecCol)).as(Seq("i", "__x")))
      .groupBy(col("i"))
      .agg(sum(round(col("__x").cast("double") * Fx).cast("decimal(38,0)"))
        .cast("double").as("m1fx"))
    m2.join(m1.select(col("i"), col("m1fx").as("__m1i")), Seq("i"))
      .join(m1.select(col("i").as("j"), col("m1fx").as("__m1j")), Seq("j"))
      .select(col("i"), col("j"),
        (col("m2fx") / Fx / col("n") -
          (col("__m1i") / Fx / col("n")) * (col("__m1j") / Fx / col("n"))).as("cov"))
  }

  /** Top principal component by POWER ITERATION on the `covariance`
    * matrix: the distributed pass builds the dim²-bounded matrix (one
    * partial-combining aggregation over the corpus); the iteration itself
    * is a driver-side loop over dim² doubles — the same driver-small
    * contract as the k-means fit (k×dim) and the IVF codebooks. Returns
    * (i, loading, eigenvalue) with `eigenvalue` = ‖Cv‖ after the final
    * matvec (the Rayleigh estimate at convergence).
    *
    * Determinism: the matrix is bit-exact by `covariance`'s fixed-point
    * construction; every accumulation here runs ascending (j asc for the
    * matvec, i asc for the norm) so an engine replaying the same loop —
    * or a SQL oracle with ORDER-BY'd list folds — reproduces it exactly.
    * Init = the uniform unit vector (1/√dim — exact when dim is a power
    * of 4, e.g. 0.125 at dim 64); sign is therefore stable across runs.
    * Fixed iteration count, no convergence test (the PageRank contract). */
  def pcaTopComponent(emb: DataFrame, vecCol: String, dim: Int,
      iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val c = Array.ofDim[Double](dim, dim)
    covariance(emb, vecCol, dim).collect().foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1); val v = r.getDouble(2)
      c(i)(j) = v; c(j)(i) = v
    }
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var lambda = 0.0
    for (_ <- 0 until iters) {
      val w = Array.tabulate(dim) { i =>
        var acc = 0.0; var j = 0
        while (j < dim) { acc += c(i)(j) * v(j); j += 1 }
        acc
      }
      var nacc = 0.0; var i = 0
      while (i < dim) { nacc += w(i) * w(i); i += 1 }
      lambda = math.sqrt(nacc)
      v = w.map(_ / lambda)
    }
    val spark = emb.sparkSession
    import spark.implicits._
    v.toSeq.zipWithIndex.map { case (l, i) => (i, l, lambda) }
      .toDF("i", "loading", "eigenvalue")
  }

  // Per-dimension z-score standardization lives in
  // Similarity.standardizeDims (hash-gated by q140) — the former
  // `standardize` twin here was retired in round 7 to keep a single
  // code path for the kernel.

  /** Linear CKA between two representation spaces on the SAME rows
    * (Kornblith et al. 2019, feature-space form):
    *
    *   CKA(X, Y) = ‖C_XY‖²_F / (‖C_XX‖_F · ‖C_YY‖_F)
    *
    * over column-centered covariance blocks — invariant to orthogonal
    * transforms and isotropic scaling, the standard "did the structure
    * survive?" score for quantization, distillation, or a re-trained
    * encoder. 1 = same geometry, → 0 = unrelated.
    *
    * Both vectors concatenate into ONE `gramFix` pass, so all three
    * blocks (XX, YY, XY) come out of a single (dimX+dimY)²-bounded
    * [[covariance]] aggregate — the corpus is scanned once. Frobenius
    * sums re-fold the upper triangle (diagonal once, off-diagonal
    * twice; the XY block appears exactly once since i < dimX ≤ j) as
    * 9-dp fixed point, order-independent. Output, 1 row: (dim_x,
    * dim_y, fro2_xx, fro2_yy, fro2_xy, cka) — cka NULL when a block
    * degenerates to 0 (a constant representation). */
  def cka(emb: DataFrame, xCol: Column, yCol: Column, dimX: Int,
      dimY: Int): DataFrame = {
    require(dimX >= 1 && dimY >= 1 && dimX + dimY <= 512,
      s"dims in [1, 512] combined, got $dimX + $dimY")
    def d(c: Column) = c.cast("double")
    def dec9(c: Column) = round(c, 9).cast("decimal(28,9)")
    val z = emb.select(concat(xCol, yCol).as("__z"))
    val cov = covariance(z, "__z", dimX + dimY)
    val c2 = d(col("cov")) * d(col("cov"))
    val tri = when(col("i") === col("j"), c2).otherwise(c2 * 2.0)
    val zero = lit(0).cast("decimal(28,9)")
    val agg = cov.agg(
      sum(when(col("j") < dimX, dec9(tri)).otherwise(zero)).as("__fxx"),
      sum(when(col("i") >= dimX, dec9(tri)).otherwise(zero)).as("__fyy"),
      sum(when(col("i") < dimX && col("j") >= dimX, dec9(c2))
        .otherwise(zero)).as("__fxy"))
    agg.select(lit(dimX).as("dim_x"), lit(dimY).as("dim_y"),
      round(d(col("__fxx")), 6).as("fro2_xx"),
      round(d(col("__fyy")), 6).as("fro2_yy"),
      round(d(col("__fxy")), 6).as("fro2_xy"),
      when(col("__fxx") > 0 && col("__fyy") > 0,
        round(d(col("__fxy")) /
          (sqrt(d(col("__fxx"))) * sqrt(d(col("__fyy")))), 6)).as("cka"))
  }
}
