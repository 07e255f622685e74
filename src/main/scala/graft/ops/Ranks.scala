package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact global ranks WITHOUT a single-partition sort — the implemented
  * version of the range-partitioned exact-rank hatch the ops-layer
  * scaladocs reference (`Mixing.scala` mega-stratum note). A
  * `row_number() OVER (ORDER BY …)` window forces every row through ONE
  * partition — fine for audit-sized frames, a straggler at fact scale.
  * This helper keeps the sort distributed:
  *
  *   1. `repartitionByRange` on the sort key (Spark's sampled range
  *      exchange — each partition holds a contiguous key range),
  *   2. `sortWithinPartitions` (partition-local sort, no global merge),
  *   3. `monotonically_increasing_id()` = (partitionId << 33 | local
  *      row index) taken IN THAT ORDER, so the low 33 bits are the exact
  *      partition-local rank,
  *   4. one bounded collect of per-partition row counts (≤ one row per
  *      shuffle partition) → cumulative offsets, broadcast-joined back.
  *
  * rank = offset(partition) + local_index + 1 is EXACT (not approximate)
  * for any partitioning, because range partitions are key-contiguous and
  * ordered; determinism needs `sortCols` to be a TOTAL order (append the
  * id column as the final tie-break — ties split across a range boundary
  * would otherwise rank nondeterministically).
  *
  * Storage: the sorted frame is lazily localCheckpoint'ed (the count job
  * and the caller share one materialization); the blocks release via the
  * ContextCleaner when the frame is GC'd — one-shot query use. A caller
  * invoking this in a LOOP should release eagerly after its consuming
  * action: the returned plan contains the checkpoint scan, so
  * `Dedup.unpersistCheckpoint(returnedFrame)` drops the blocks.
  *
  * Scale shape: one range exchange + partition-local sorts + a
  * #partitions-row collect + a broadcast equi-join — no single-partition
  * stage anywhere. The frame is localCheckpoint'ed (consumed by the
  * count job and by the caller; callers that fan out further reuse the
  * same blocks). */
object Ranks {

  /** Returns `df` plus a 1-based LongType global row number `rnCol`
    * under the total order `sortCols`. */
  def withRowNumber(df: DataFrame, rnCol: String,
      sortCols: Column*): DataFrame =
    rankedWithTotal(df, rnCol, sortCols)._1

  /** `ntile(nBuckets) OVER (ORDER BY sortCols)` without the
    * single-partition window: the bucket derives from the exact rank
    * and the TOTAL row count the rank pass already collected — no extra
    * action, no extra pass. */
  def withNtile(df: DataFrame, bucketCol: String, nBuckets: Int,
      sortCols: Column*): DataFrame = {
    val (r, total) = rankedWithTotal(df, "__rnk", sortCols)
    r.withColumn(bucketCol, ntileFromRank(col("__rnk"), total, nBuckets))
      .drop("__rnk")
  }

  private def rankedWithTotal(df: DataFrame, rnCol: String,
      sortCols: Seq[Column]): (DataFrame, Long) = {
    require(sortCols.nonEmpty, "need at least one sort column")
    val spark = df.sparkSession
    import spark.implicits._
    val nPart = spark.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(nPart, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint(false) // consumers: the count job + the caller
    val pid = shiftright(col("__mid"), 33)
    val local = col("__mid").bitwiseAND(lit((1L << 33) - 1))
    val counts = parted.groupBy(pid.as("__pid"))
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxPid = if (counts.isEmpty) -1L else counts.keys.max
    // cumulative offsets in partition order; range partitions are
    // key-ordered, so offset(p) = Σ counts(p' < p)
    val offsets = (0L to maxPid).scanLeft(0L)((acc, p) =>
      acc + counts.getOrElse(p, 0L))
    val offsetDf = (0L to maxPid).map(p => (p, offsets(p.toInt)))
      .toDF("__pid", "__off")
    val out = parted.withColumn("__pid", pid).withColumn("__loc", local)
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn(rnCol, col("__off") + col("__loc") + lit(1L))
      .drop("__pid", "__loc", "__off", "__mid")
    (out, counts.valuesIterator.sum)
  }

  /** `ntile(n)` bucket (1-based) derived from an exact global rank over
    * `nRows` total rows — identical to SQL NTILE semantics: the first
    * `nRows % n` buckets take ⌈nRows/n⌉ rows, the rest ⌊nRows/n⌋. Pure
    * integer expression over the [[withRowNumber]] output — no window. */
  def ntileFromRank(rn: Column, nRows: Long, n: Int): Column = {
    require(n >= 1 && nRows >= 0, "need n >= 1, nRows >= 0")
    val q = nRows / n
    val r = nRows % n
    val cut = r * (q + 1)
    if (q == 0) rn.cast("long") // fewer rows than buckets: bucket = rank
    else when(rn <= cut, floor((rn - 1) / (q + 1)).cast("long") + 1L)
      .otherwise(lit(r) + floor((rn - cut - 1) / q).cast("long") + 1L)
  }
}
