package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Let

/** Int8 scalar quantization of an embedding column — the compression
  * step a vector store applies before ANN at scale (4× smaller than
  * float32, SIMD-friendly dot products). Per-vector symmetric scheme:
  * scale = 127 / max|vᵢ|, qᵢ = clamp(round(vᵢ·scale), ±127).
  *
  * Everything is rational double arithmetic + half-away rounding —
  * deterministic in any engine; the reconstruction MSE folds through the
  * repo's 2^40 fixed-point so its sum is order-independent. A zero
  * vector quantizes to all-zero with zero error (guarded — its scale
  * would otherwise divide by zero).
  *
  * Map-only: no shuffle, stays in whole-stage codegen. Returns the
  * quantized array plus audit stats; `quantizeStats` projects the
  * scalar-only view (array outputs can't go through the driver's
  * hash-compare).
  */
object Quantize {

  private val Fix = (1L << 40).toDouble

  def maxAbs(vec: Column): Column =
    array_max(transform(vec, v => abs(v.cast("double"))))

  /** array<int> of clamped round(vᵢ·scale); all zeros for a zero vector.
    * The max-abs is LET-BOUND: referenced directly inside the transform
    * lambda it would re-scan the vector per element (lambda bodies are
    * CSE-exempt) — O(d²)/row, the LambdaAuditSpec class. */
  def int8(vec: Column): Column =
    Let.bindOnce(maxAbs(vec)) { m =>
      val scale = lit(127.0) / m
      transform(vec, v =>
        when(m === 0.0, lit(0))
          .otherwise(greatest(lit(-127),
            least(lit(127), round(v.cast("double") * scale).cast("int")))))
    }

  /** int8 round trip: the dequantized array<float> q·(m/127) — the
    * lossy reconstruction that space-similarity audits (CKA) score
    * against the original. Zero vectors reconstruct to zeros (m/127 is
    * 0, no special case). */
  def dequant8(vec: Column): Column =
    Let.bindOnce(maxAbs(vec)) { m =>
      transform(int8(vec), q =>
        (q.cast("double") * (m / lit(127.0))).cast("float"))
    }

  /** (qmin, qmax, qsum, mse): quantized range, exact integer sum, and
    * fixed-point mean squared reconstruction error. The 2^40 fixed-point
    * error sum assumes embedding magnitudes ≲ 10⁵ per element (beyond
    * that, err²·2^40 would overflow int64 — unit-norm-ish embeddings are
    * orders of magnitude inside the bound). */
  def quantizeStats(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // "__q" stages the quantized array per row; withColumn would
    // silently REPLACE a caller's same-named column
    require(!emb.columns.contains("__q"),
      "quantizeStats: input already has a column named '__q' (reserved " +
        "for internal staging) — rename it before calling")
    val vec = col(vecCol)
    // max-abs let-bound for the same reason as in int8; the quantized
    // array is a per-row COLUMN (computed once), so only m needs the let
    val errFix = Let.bindOnce(maxAbs(vec)) { m =>
      val scale = lit(127.0) / m
      zip_with(vec, col("__q"), (v, qi) =>
        when(m === 0.0, lit(0L)).otherwise {
          val e = v.cast("double") - qi.cast("double") / scale
          round(e * e * Fix).cast("long")
        })
    }
    emb.withColumn("__q", int8(vec)).select(col(idCol),
      array_min(col("__q")).as("qmin"),
      array_max(col("__q")).as("qmax"),
      aggregate(col("__q"), lit(0L), (acc, x) => acc + x).as("qsum"),
      (aggregate(errFix, lit(0L), (acc, x) => acc + x).cast("double") / Fix /
        size(vec)).as("mse"))
  }
}
