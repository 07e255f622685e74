package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering keys and the
  * zone-map evidence that justifies them. At 100 TB the scan is the
  * dominant cost, and a scan prunes on per-file min/max statistics —
  * which only help if the LAYOUT clusters each filter column. A sort on
  * one column destroys locality in every other; a Z-order (Morton)
  * interleave gives every participating dimension partial locality, so
  * point/range filters on ANY of them prune files. (Same public design
  * as Delta/Iceberg Z-ordering; implemented here as pure integer
  * Catalyst expressions — engine-exact, no UDF.) */
object Layout {

  /** Morton/Z-order interleave of the low `bits` bits of two
    * non-negative integer columns: bit b of x lands at position 2b, bit
    * b of y at 2b+1. Pure shift/mask expression tree (codegen'd,
    * map-only); `bits` ≤ 31 keeps the result in a positive Long.
    * Domain-reduction contract (shared verbatim with
    * `functions.Hilbert.hilbertKey`): a NEGATIVE coordinate raises (a
    * sign bug — its low bits are all-ones under two's complement and
    * would silently interleave to the far corner); a non-negative one
    * is reduced to its low `bits` bits. */
  def zOrderKey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    def nonNeg(c: Column) = {
      val l = c.cast("long")
      when(l < 0, raise_error(concat(
        lit("zOrderKey requires non-negative coordinates, got "),
        l.cast("string")))).otherwise(l)
    }
    val xl = nonNeg(x); val yl = nonNeg(y)
    (0 until bits).map { b =>
      shiftleft(shiftright(xl, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(yl, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)
  }

  /** Zone-map pruning audit: lay `df` out in `nBuckets` equal row-range
    * "files" under each candidate sort key, record each file's
    * [min, max] of `probeCol`, and count how many files a point filter
    * `probeCol = probeValue` would have to READ (zone overlap) — the
    * measured version of "Z-order lets other columns prune too".
    * One global sort per strategy (the honest layout cost, paid once at
    * write time); the audit output is nBuckets rows per strategy.
    * Output: (strategy, n_files, files_overlapping, mean_span) where
    * mean_span = mean (max−min) of `probeCol` per file, 2^40-free —
    * integer spans divided at the edge. */
  def zoneMapAudit(df: DataFrame, idCol: String,
      strategies: Seq[(String, Column)], probeCol: String, probeValue: Long,
      nBuckets: Int = 32): DataFrame = {
    require(strategies.nonEmpty && nBuckets >= 1, "need strategies and buckets")
    // ntile over a RANGE-PARTITIONED exact rank (Ranks) — identical
    // bucket assignment to `ntile(n) OVER (ORDER BY …)` but with no
    // single-partition window on the fact-sized frame
    strategies.map { case (name, key) =>
      val bucketed = Ranks.withNtile(
        df.select(col(idCol).as("__id"),
          col(probeCol).cast("long").as("__p"), key.as("__k")),
        "__b", nBuckets, col("__k"), col("__p"), col("__id"))
      val files = bucketed.groupBy(col("__b"))
        .agg(min(col("__p")).as("__lo"), max(col("__p")).as("__hi"))
      files.agg(count(lit(1)).as("n_files"),
          sum(when(lit(probeValue) >= col("__lo") &&
            lit(probeValue) <= col("__hi"), 1L).otherwise(0L))
            .as("files_overlapping"),
          sum(col("__hi") - col("__lo")).as("__span"))
        .select(lit(name).as("strategy"), col("n_files"),
          col("files_overlapping"),
          round(col("__span").cast("double") / col("n_files").cast("double"), 6)
            .as("mean_span"))
    }.reduce(_ unionByName _)
  }
}
