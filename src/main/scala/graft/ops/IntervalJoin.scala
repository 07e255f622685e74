package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval RANGE JOIN — the join Spark's planner turns into a
  * nested-loop scan (a `BETWEEN` theta condition has no equi key), made
  * scalable by BUCKETING the time axis: every interval explodes into the
  * fixed-width buckets it covers, every point maps to exactly ONE
  * bucket, and the join becomes a plain hash equi-join on
  * (keys…, bucket) with the exact containment re-checked after. Output
  * is identical to the theta join — a (point, interval) pair shares at
  * least the point's bucket — with no duplicates, because the point's
  * single bucket meets each covering interval exactly once.
  *
  * Scale shape: ONE equi-shuffle on (keys…, bucket); the interval side
  * inflates by ⌈len/bucketWidth⌉ + 1 rows per interval, so pick
  * `bucketWidth` near the TYPICAL interval length (factor ≈ 2) — the
  * explode factor is the contract, enforced by `maxBucketsPerInterval`
  * (a distributed guard, failing loudly instead of silently inflating a
  * 100 TB shuffle; a degenerate months-long interval is a data bug this
  * operator refuses to amplify). Timestamps must be pre-converted to a
  * numeric axis (epoch micros) by the caller — the operator is
  * unit-agnostic. */
object IntervalJoin {

  /** Join each `points` row to every `intervals` row of the same `keys`
    * with `startCol <= pointCol <= endCol`. Column sets must be disjoint
    * apart from `keys`. */
  def rangeJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long, keys: Seq[String] = Nil,
      maxBucketsPerInterval: Long = 1000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
      .diff(keys.toSet)
    require(overlap.isEmpty,
      s"point/interval column collision (alias first): $overlap")
    val p = points.withColumn("__b",
      floor(col(pointCol).cast("long") / bucketWidth))
    val nBuckets = floor(col(endCol).cast("long") / bucketWidth) -
      floor(col(startCol).cast("long") / bucketWidth) + 1
    val iv = intervals
      .withColumn("__guard", assert_true(
        col(startCol) <= col(endCol) && nBuckets <= maxBucketsPerInterval,
        concat(lit("rangeJoin: interval spans too many buckets or is " +
          "inverted; got ["), col(startCol), lit(", "), col(endCol),
          lit(s"] at bucketWidth=$bucketWidth (max $maxBucketsPerInterval)"))))
      .filter(col("__guard").isNull).drop("__guard")
      .withColumn("__b", explode(sequence(
        floor(col(startCol).cast("long") / bucketWidth),
        floor(col(endCol).cast("long") / bucketWidth))))
    p.join(iv, keys :+ "__b")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__b")
  }

  /** INTERVAL × INTERVAL overlap join: each `a` row meets every `b` row
    * of the same `keys` with `[startA, endA] ∩ [startB, endB] ≠ ∅`
    * (closed intervals). Same bucketing idea as `rangeJoin`, plus the
    * REFERENCE-BUCKET dedup: a pair sharing n buckets would surface n
    * times, so the pair is emitted only from the bucket containing
    * `max(startA, startB)` — the first bucket where both intervals are
    * present, which every overlapping pair has exactly one of. Output ==
    * the theta join, duplicate-free WITHOUT a distinct (no second
    * shuffle, no wide-row comparison).
    *
    * Scale shape: ONE equi-shuffle on (keys…, bucket); each side
    * inflates ⌈len/bucketWidth⌉ + 1×, guarded by
    * `maxBucketsPerInterval` exactly like `rangeJoin`. */
  def overlapJoin(a: DataFrame, startA: String, endA: String,
      b: DataFrame, startB: String, endB: String,
      bucketWidth: Long, keys: Seq[String] = Nil,
      maxBucketsPerInterval: Long = 1000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlapCols = a.columns.toSet.intersect(b.columns.toSet).diff(keys.toSet)
    require(overlapCols.isEmpty,
      s"a/b column collision (alias first): $overlapCols")
    def buckets(df: DataFrame, s: String, e: String): DataFrame = {
      val nBuckets = floor(col(e).cast("long") / bucketWidth) -
        floor(col(s).cast("long") / bucketWidth) + 1
      df.withColumn("__guard", assert_true(
          col(s) <= col(e) && nBuckets <= maxBucketsPerInterval,
          concat(lit("overlapJoin: interval spans too many buckets or is " +
            "inverted; got ["), col(s), lit(", "), col(e),
            lit(s"] at bucketWidth=$bucketWidth (max $maxBucketsPerInterval)"))))
        .filter(col("__guard").isNull).drop("__guard")
        .withColumn("__b", explode(sequence(
          floor(col(s).cast("long") / bucketWidth),
          floor(col(e).cast("long") / bucketWidth))))
    }
    buckets(a, startA, endA).join(buckets(b, startB, endB), keys :+ "__b")
      .filter(col(startA) <= col(endB) && col(startB) <= col(endA) &&
        col("__b") === floor(greatest(col(startA), col(startB)).cast("long") / bucketWidth))
      .drop("__b")
  }

  /** Per-key interval-union coverage: merge overlapping/touching
    * half-open [start, end) intervals and report the total covered
    * length and merged-island count — the "how much of the timeline is
    * actually serviced" read (summing raw interval lengths double-counts
    * overlap). Island detection is the classic sorted running-max-end
    * pass: a new island starts where `start` exceeds every previous
    * end.
    *
    * Scale shape: ONE key shuffle + per-key sort window, then key-level
    * aggregates. Output: (key, n_intervals, n_islands, covered). */
  def unionCoverage(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("key"))
      .orderBy(col("__s"), col("__e"))
    val prevMax = max(col("__e")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val base = df.select(col(keyCol).as("key"),
        col(startCol).cast("long").as("__s"), col(endCol).cast("long").as("__e"))
      .withColumn("__new",
        when(prevMax.isNull || col("__s") > prevMax, 1L).otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    base.groupBy(col("key"), col("__isl"))
      .agg(count(lit(1)).as("__cnt"), min(col("__s")).as("__is"),
        max(col("__e")).as("__ie"))
      .groupBy(col("key"))
      .agg(sum(col("__cnt")).as("n_intervals"), count(lit(1)).as("n_islands"),
        sum(col("__ie") - col("__is")).as("covered"))
  }
}
