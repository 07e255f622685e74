package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Sketch aggregators (SURVEY §7.3 "north-star" custom UDAF surface).
  *
  * `MinHashSigAgg` folds a stream of 60-bit shingle hashes into a
  * numHashes-wide MinHash signature. It is associative + commutative, so
  * Spark runs it with map-side partial aggregation and merges tiny
  * fixed-size buffers at the exchange — constant state per group
  * regardless of input size (the property that makes sketching the right
  * tool at 100 TB, vs exact distinct structures that grow with the data).
  *
  * The per-seed mixing is the same rotate-xor family as the Column-level
  * `Dedup.mixHash`, so signatures from this aggregator, the expression
  * path, and the DuckDB oracle are all bit-identical.
  */
object Sketches {

  /** JVM twin of `Dedup.mixHash` (same constants, same result). */
  def mixLong(h: Long, seed: Int): Long = {
    val r = Dedup.mixRot(seed)
    val low = h & ((1L << (60 - r)) - 1)
    ((low << r) | (h >>> (60 - r))) ^ Dedup.mixConst(seed)
  }

  final class MinHashSigAgg(numHashes: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    // cache the per-seed constants once per executor instance
    private val rots = (0 until numHashes).map(Dedup.mixRot).toArray
    private val consts = (0 until numHashes).map(Dedup.mixConst).toArray

    override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      var i = 0
      while (i < numHashes) {
        val r = rots(i)
        val m = (((h & ((1L << (60 - r)) - 1)) << r) | (h >>> (60 - r))) ^ consts(i)
        if (m < buf(i)) buf(i) = m
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }

    // Long.MaxValue sentinel (empty group) → 0, matching the expression path
    override def finish(buf: Array[Long]): Array[Long] =
      buf.map(v => if (v == Long.MaxValue) 0L else v)

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** The aggregator as a Column over a LongType hash column. */
  def minhashSig(hashCol: Column, numHashes: Int = 16): Column =
    udaf(new MinHashSigAgg(numHashes)).apply(hashCol)

  /** Estimated Jaccard between two equal-length signatures: fraction of
    * agreeing positions. */
  def sigJaccard(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), (v: Column) => v))
      .cast("double") / size(a)

  /** Misra-Gries heavy-hitter summary: at most `k` (item, weight)
    * counters. Guarantee (the textbook one): any item with true frequency
    * > n/(k+1) is PRESENT in the summary, and each reported weight
    * undercounts its true frequency by at most n/(k+1). The merge is the
    * Agarwal-Cormode-Huang-Phillips-Wei-Yi mergeable-summaries
    * construction (add counters, then subtract the (k+1)-th largest and
    * drop ≤ 0), so the same guarantee holds under Spark's map-side
    * partial aggregation — constant O(k) state per group at any scale.
    * This is the APPROXIMATE twin of the exact two-phase top-k
    * (q76_heavy_hitters); it exists for cardinalities where even the
    * (group, term) aggregate is too big to shuffle. */
  final class MisraGriesAgg(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1)

    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
      buf.get(item) match {
        case Some(c) => buf.updated(item, c + 1)
        case None if buf.size < k => buf.updated(item, 1L)
        case None =>
          // decrement-all step; deterministic regardless of map order
          buf.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (acc, (i, c)) =>
        acc.updated(i, acc.getOrElse(i, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-th largest weight from everything, drop ≤ 0
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
        sum.flatMap { case (i, c) => if (c > cut) Some(i -> (c - cut)) else None }
      }
    }

    override def finish(buf: Map[String, Long]): Map[String, Long] = buf

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** The aggregator as a Column over a string item column. */
  def misraGries(itemCol: Column, k: Int): Column =
    udaf(new MisraGriesAgg(k)).apply(itemCol)

  /** Seed base for the CMS hash rows — offset from the MinHash seeds so
    * the two sketch families never share a hash function. */
  val CmsSeedBase = 211

  /** Count-Min sketch: `d` rows × `w` counters; every item increments one
    * counter per row (position = mixed 60-bit hash mod w); the point
    * estimate is the MIN across rows. Overestimate-only by construction
    * (collisions can only add), and — unlike Misra-Gries — the sketch
    * CONTENTS are a pure function of the exact (item, count) multiset:
    * counter[j][b] = Σ counts of items hashing to b in row j, independent
    * of fold order. So the oracle replays the whole sketch exactly (q104),
    * not just a guarantee bound. Mergeable by elementwise addition —
    * Spark's map-side partial aggregation applies, O(d·w) state per group
    * at any corpus size. */
  final class CmsAgg(d: Int, w: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(d >= 1 && w >= 1, s"CMS needs d,w >= 1, got d=$d w=$w")
    private val rots = (0 until d).map(j => Dedup.mixRot(CmsSeedBase + j)).toArray
    private val consts = (0 until d).map(j => Dedup.mixConst(CmsSeedBase + j)).toArray

    override def zero: Array[Long] = new Array[Long](d * w)

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      var j = 0
      while (j < d) {
        val r = rots(j)
        val m = (((h & ((1L << (60 - r)) - 1)) << r) | (h >>> (60 - r))) ^ consts(j)
        buf(j * w + (m % w).toInt) += 1
        j += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** The CMS as a Column over a 60-bit hash column (`Dedup.baseHash`). */
  def cmsSketch(hashCol: Column, d: Int, w: Int): Column =
    udaf(new CmsAgg(d, w)).apply(hashCol)

  /** Point estimate from a built sketch for the item hashed as `hashCol`:
    * min across the d row counters. Pure expression — probe a broadcast
    * sketch at any fan-out. */
  def cmsEstimate(sketch: Column, hashCol: Column, d: Int, w: Int): Column =
    (0 until d).map { j =>
      element_at(sketch,
        (lit(j * w + 1) + Dedup.mixHash(hashCol, CmsSeedBase + j) % w).cast("int"))
    }.reduce(least(_, _))

  /** Deterministic bottom-k sample: keep the k rows with the smallest
    * (draw, id) per group, where `draw` is the md5-uniform double the
    * split/sampling operators share (`TextStats.hashUniform`). The
    * mergeable-summary counterpart of `q94`'s exact window rank: a
    * row_number() sample sorts the WHOLE stratum (one shuffle + full
    * sort), while this aggregator carries ≤ k pairs per partition and the
    * exchange moves ≤ k·partitions rows — the classic distributed top-k
    * shape, O(k) state at any corpus size. Same result as the window
    * formulation because (draw, id) is a total order. */
  final class BottomKAgg(k: Int)
      extends Aggregator[(Double, Long), Array[(Double, Long)], Array[Long]] {
    require(k >= 1)
    private val ord = Ordering.Tuple2[Double, Long]

    override def zero: Array[(Double, Long)] = Array.empty

    override def reduce(buf: Array[(Double, Long)], x: (Double, Long)): Array[(Double, Long)] =
      if (buf.length == k && ord.gteq(x, buf(k - 1))) buf
      else {
        // binary-search insert into the sorted buffer, drop the overflow
        var lo = 0; var hi = buf.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (ord.lt(buf(mid), x)) lo = mid + 1 else hi = mid
        }
        val out = new Array[(Double, Long)](math.min(buf.length + 1, k))
        System.arraycopy(buf, 0, out, 0, lo)
        if (lo < out.length) {
          out(lo) = x
          System.arraycopy(buf, lo, out, lo + 1, out.length - lo - 1)
        }
        out
      }

    override def merge(a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] =
      b.foldLeft(a)(reduce) // ≤ k elements each — O(k²) worst case, constant

    override def finish(buf: Array[(Double, Long)]): Array[Long] = buf.map(_._2)

    override def bufferEncoder: Encoder[Array[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Double, Long)]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** The aggregator as a Column: ids of the k smallest (draw, id) pairs,
    * in ascending draw order. */
  /** ROLLING HyperLogLog cardinality: per day, the HLL estimate of
    * distinct `keyCol` values over the trailing `windowDays`-day window
    * — the "7-day active users" sketch, with REGISTERS built from
    * integer expressions an oracle can replay exactly (unlike the
    * engine-internal `approx_count_distinct` state q96 audits as a
    * bound):
    *   - 60-bit md5 key hash; register = h mod m, payload = h div m;
    *   - rho = leading-zero count of the 54-bit payload + 1, computed
    *     as 55 − length(binary(payload)) — INTEGER string arithmetic,
    *     no float log2 anywhere;
    *   - daily register = max(rho) per (day, register); rolling merge =
    *     max over the trailing window on a DENSE day×m frame (HLL's
    *     union IS register-wise max — the property that makes the
    *     sketch mergeable across days, shards, and retries);
    *   - the harmonic sum Σ 2^(60−M_j) runs as an EXACT decimal integer
    *     (dyadic doubles of spread exponents do NOT sum exactly —
    *     2^0 + 2^−60 needs 61 mantissa bits), so the one double
    *     division per day is deterministic in both engines.
    * Returns (day ISO-string, zero_regs, est) with est = α·m²·2^60/S
    * rounded to 6 decimals — the RAW HLL estimator; small/large-range
    * corrections (which need ln) are the caller's post-step, and
    * `zero_regs` is exactly what the linear-counting branch needs.
    *
    * Scale shape: map-only hashing, ONE (day, register) partial-
    * combining max, a register-keyed rolling window over the tiny dense
    * day×m frame, one day-keyed fold. m = 64 ⇒ ~1.3 % of the corpus
    * moves nothing — the whole sketch table is days × 64 rows. */
  def rollingHll(events: DataFrame, tsCol: String, keyCol: String,
      windowDays: Int = 7, seed: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val m = 64
    val alpha = 0.709 // α_64 (Flajolet et al.), fixed literal by contract
    val h = Dedup.seededHash(seed, col(keyCol).cast("string"))
    val daily = events
      .select(to_date(col(tsCol)).as("__day"),
        pmod(h, lit(m.toLong)).cast("int").as("__reg"),
        shiftright(h, 6).as("__p"))
      .withColumn("__rho",
        when(col("__p") === 0L, lit(55))
          .otherwise(lit(55) - length(conv(col("__p"), 10, 2))).cast("int"))
      .groupBy(col("__day"), col("__reg"))
      .agg(max(col("__rho")).as("__m"))
    val days = events.select(to_date(col(tsCol)).as("__day")).distinct()
    val regIds = events.sparkSession.range(m)
      .select(col("id").cast("int").as("__reg"))
    val dense = days.crossJoin(regIds)
      .join(daily, Seq("__day", "__reg"), "left")
      .withColumn("__m", coalesce(col("__m"), lit(0)))
    // RANGE on the epoch-day number, not ROWS: a zero-event calendar day
    // is absent from the frame, and a row-based trailing window would
    // silently stretch past `windowDays` calendar days across the gap
    val w = Window.partitionBy(col("__reg"))
      .orderBy(datediff(col("__day"), lit("1970-01-01").cast("date")))
      .rangeBetween(-(windowDays - 1), 0)
    val rolled = dense.withColumn("__mw", max(col("__m")).over(w))
    rolled.groupBy(col("__day"))
      .agg(sum(when(col("__mw") === 0, 1L).otherwise(0L)).as("zero_regs"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 60 - __mw)").cast("decimal(38,0)"))
          .as("__s"))
      .select(date_format(col("__day"), "yyyy-MM-dd").as("day"),
        col("zero_regs"),
        round(lit(rollingHllNumerator(m, alpha)) / col("__s").cast("double"), 6)
          .as("est"))
  }

  /** The raw-estimator numerator α·m²·2^60 as ONE driver-computed double
    * literal — the oracle embeds the SAME shortest-round-trip repr, so
    * both engines divide the identical IEEE value. */
  def rollingHllNumerator(m: Int, alpha: Double): Double =
    alpha * m * m * math.pow(2.0, 60)

  def bottomK(drawCol: Column, idCol: Column, k: Int): Column =
    udaf(new BottomKAgg(k)).apply(drawCol, idCol)
}
