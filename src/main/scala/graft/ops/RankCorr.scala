package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kendall's τ-b rank correlation — EXACT and distributed. The
  * concordance statistic robust to monotone transforms and heavy tie
  * mass (the label-vs-metric agreement check where Spearman's ρ (q266)
  * over-weights large rank gaps), with the τ-b tie normalization.
  *
  * The naive definition is O(n²) pairs; the single-machine answer is
  * Knight (1966)'s O(n log n) inversion count. This is the distributed
  * form of the same identity:
  *
  *   D (discordant) = # strict inversions of y in (x, y)-sorted order
  *     (ties in x or y contribute no inversion under strict
  *      comparison — the sort's (x, y) tie-break makes equal-x runs
  *      y-ascending, so they can never count)
  *   C − D = n₀ − n₁ − n₂ + n₃ − 2D,
  *     n₀ = n(n−1)/2, n₁/n₂ = Σ t(t−1)/2 over x / y tie groups,
  *     n₃ = the same over (x, y) tie groups
  *   τ-b = (C − D) / √((n₀ − n₁)(n₀ − n₂))
  *
  * Distribution of the inversion count (the novel part):
  *  - WITHIN x-partition: a per-partition bottom-up merge sort counts
  *    strict inversions locally — O(m log m), working set = the
  *    partition's y column as one primitive double array (8 B/row;
  *    size partitions accordingly — the same contract as any
  *    sort-based per-partition algorithm).
  *  - ACROSS x-partitions: a pair (a, b) with xpid_a < xpid_b inverts
  *    iff y_a > y_b, so re-range-exchange by y and scan ascending,
  *    maintaining per-x-partition seen-counts (a P-vector): each
  *    element adds Σ_{q > its xpid} cnt[q] (elements of LATER
  *    x-partitions with STRICTLY smaller y — the same pair set,
  *    roles swapped), with y tie groups buffered so equal y never
  *    counts. The scan distributes exactly like
  *    [[Ranks.runningSums]]: per-y-partition (ypid, xpid) counts are
  *    ONE partial-combining aggregate (≤ P² rows collected), the
  *    driver prefix-sums them into per-partition offset VECTORS, and
  *    each y-partition walks once seeded with its offset — partition
  *    ids ride in the data via `monotonically_increasing_id >> 33`
  *    (never TaskContext — the stage-renumbering trap documented in
  *    Ranks). Range partitioning puts equal keys in ONE partition, so
  *    earlier y-partitions are STRICTLY smaller — offsets need no
  *    tie handling across the boundary.
  *
  * Tie terms are partial-combining aggregates over the (x, y)-distinct
  * count table. Everything is exact integer arithmetic (tie pair
  * counts as DECIMAL — t² overflows a long once a value repeats ~3e9
  * times); the single division at the end is double, round-6. `n` is
  * `require`d ≤ 3e9 so n(n−1) fits a signed long.
  *
  * Output, 1 row: (n, pairs, tied_x, tied_y, tied_xy, concordant,
  * discordant, tau_b) — pair counts as longs (exact under the n
  * require), tau_b NULL when a margin is constant (denominator 0). */
object RankCorr {

  def kendallTauB(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions
    val pts = df
      .select(xCol.cast("double").as("__x"), yCol.cast("double").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .localCheckpoint(false) // consumers: the sorted walks + tie counts

    // ── within-partition inversions (x-range exchange) ────────────────
    val parted = pts.repartitionByRange(nPart, col("__x"), col("__y"))
      .sortWithinPartitions(col("__x"), col("__y"))
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint(false) // consumers: local count + the y re-exchange
    val pSchema = parted.schema
    val yIdx = pSchema.fieldIndex("__y")
    val midIdx = pSchema.fieldIndex("__mid")
    val localSchema = StructType(Seq(StructField("pid", LongType, false),
      StructField("cnt", LongType, false), StructField("inv", LongType, false)))
    val localRows = parted.mapPartitions { it =>
      val ys = new ArrayBuffer[Double](1 << 12)
      var pid = -1L
      it.foreach { r =>
        if (pid < 0) pid = r.getLong(midIdx) >>> 33
        ys += r.getDouble(yIdx)
      }
      if (pid < 0) Iterator.empty
      else Iterator(Row(pid, ys.length.toLong, mergeInversions(ys.toArray)))
    }(Encoders.row(localSchema)).collect()
    val dLocal = localRows.map(_.getLong(2)).sum
    val n = localRows.map(_.getLong(1)).sum
    require(n <= 3000000000L,
      s"kendallTauB: n = $n exceeds 3e9 — n(n−1) would overflow the " +
        "long pair-count arithmetic; pre-aggregate or sample")

    // ── cross-partition inversions (y-range exchange + vector scan) ───
    val tagged = parted
      .select(col("__y"), shiftright(col("__mid"), 33).as("__xp"))
      .repartitionByRange(nPart, col("__y"))
      .sortWithinPartitions(col("__y"))
      .withColumn("__mid2", monotonically_increasing_id())
      .localCheckpoint(false) // consumers: the V-matrix partials + the scan
    val vmat = tagged
      .groupBy(shiftright(col("__mid2"), 33).as("__yp"), col("__xp"))
      .agg(count(lit(1)).as("__n")).collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2)))
    val maxXp = (localRows.map(_.getLong(0)).maxOption.getOrElse(0L) + 1).toInt
    // exclusive per-y-partition offset VECTORS (strictly-smaller-y counts
    // per x-partition) — P vectors of P longs, driver-prefix-summed
    val yps = vmat.map(_._1).distinct.sorted
    val offs = scala.collection.mutable.Map.empty[Long, Array[Long]]
    val acc = new Array[Long](maxXp)
    yps.foreach { p =>
      offs(p) = acc.clone()
      vmat.filter(_._1 == p).foreach { case (_, q, c) => acc(q) += c }
    }
    val bOff = spark.sparkContext.broadcast(offs.toMap)
    val tSchema = tagged.schema
    val yIdx2 = tSchema.fieldIndex("__y")
    val xpIdx = tSchema.fieldIndex("__xp")
    val midIdx2 = tSchema.fieldIndex("__mid2")
    val crossSchema = StructType(Seq(StructField("inv", LongType, false)))
    val mxp = maxXp
    val dCross = tagged.mapPartitions { it =>
      val buf = it.buffered
      if (!buf.hasNext) Iterator.empty
      else {
        val yp = buf.head.getLong(midIdx2) >>> 33
        val cnt = bOff.value.get(yp) match {
          case Some(a) => java.util.Arrays.copyOf(a, mxp)
          case None => new Array[Long](mxp)
        }
        var cross = 0L
        var tieY = Double.NaN
        val tieQ = new ArrayBuffer[Int](16)
        def flush(): Unit = {
          var i = 0
          while (i < tieQ.length) { cnt(tieQ(i)) += 1; i += 1 }
          tieQ.clear()
        }
        while (buf.hasNext) {
          val r = buf.next()
          val y = r.getDouble(yIdx2)
          val q = r.getLong(xpIdx).toInt
          if (tieQ.nonEmpty && y != tieY) flush()
          tieY = y
          var s = 0L
          var k = q + 1
          while (k < mxp) { s += cnt(k); k += 1 }
          cross += s
          tieQ += q
        }
        Iterator(Row(cross))
      }
    }(Encoders.row(crossSchema)).collect().map(_.getLong(0)).sum
    val dTotal = BigInt(dLocal) + BigInt(dCross)

    // ── tie terms over the (x, y)-distinct count table ────────────────
    def twicePairs(c: Column) =
      sum((c.cast("decimal(19,0)") * (c - 1).cast("decimal(19,0)"))
        .cast("decimal(38,0)"))
    val g = pts.groupBy(col("__x"), col("__y")).agg(count(lit(1)).as("__c"))
      .localCheckpoint(false) // consumers: three tie aggregates
    val t3r = g.agg(twicePairs(col("__c")).as("t")).collect()(0)
    val t1r = g.groupBy(col("__x")).agg(sum(col("__c")).as("__cx"))
      .agg(twicePairs(col("__cx")).as("t")).collect()(0)
    val t2r = g.groupBy(col("__y")).agg(sum(col("__c")).as("__cy"))
      .agg(twicePairs(col("__cy")).as("t")).collect()(0)
    def half(r: Row): BigInt =
      if (r.isNullAt(0)) BigInt(0)
      else BigInt(r.getDecimal(0).toBigInteger) / 2

    val n0 = BigInt(n) * BigInt(n - 1) / 2
    val n1 = half(t1r); val n2 = half(t2r); val n3 = half(t3r)
    val conc = n0 - n1 - n2 + n3 - dTotal
    val denomSq = (n0 - n1).toDouble * (n0 - n2).toDouble
    val tau: Any =
      if (denomSq <= 0.0) null
      else {
        val t = (conc - dTotal).toDouble / math.sqrt(denomSq)
        BigDecimal(t).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    // the n ≤ 3e9 require above bounds every pair count by n(n−1)/2
    // < 2^63, so longs are exact here
    val outSchema = StructType(Seq(
      StructField("n", LongType, false),
      StructField("pairs", LongType, false),
      StructField("tied_x", LongType, false),
      StructField("tied_y", LongType, false),
      StructField("tied_xy", LongType, false),
      StructField("concordant", LongType, false),
      StructField("discordant", LongType, false),
      StructField("tau_b", DoubleType, true)))
    val row = Row(n, n0.toLong, n1.toLong, n2.toLong, n3.toLong,
      conc.toLong, dTotal.toLong, tau)
    spark.createDataFrame(
      java.util.Collections.singletonList(row), outSchema)
  }

  /** Strict inversion count (# pairs i < j with a(i) > a(j)) by
    * bottom-up merge sort — O(m log m), two m-sized buffers. Equal
    * values never count (stability: ties take from the left run). */
  private[ops] def mergeInversions(a: Array[Double]): Long = {
    val m = a.length
    if (m < 2) return 0L
    var src = a
    var dst = new Array[Double](m)
    var inv = 0L
    var width = 1
    while (width < m) {
      var lo = 0
      while (lo < m) {
        val mid = math.min(lo + width, m)
        val hi = math.min(lo + 2 * width, m)
        var i = lo; var j = mid; var k = lo
        while (i < mid && j < hi) {
          if (src(i) <= src(j)) { dst(k) = src(i); i += 1 }
          else { dst(k) = src(j); j += 1; inv += (mid - i).toLong }
          k += 1
        }
        while (i < mid) { dst(k) = src(i); i += 1; k += 1 }
        while (j < hi) { dst(k) = src(j); j += 1; k += 1 }
        lo = hi
      }
      val t = src; src = dst; dst = t
      width *= 2
    }
    inv
  }
}
