package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed multiplicative-band arg-min join — the operator behind
  * "borrow the attribute of the minimum-id same-key row whose value
  * lies within ±x % of mine" (reference
  * data_processing_program_20240520.py:255-276 backward tagging, and
  * the q09 gate's ±0.1 % price band).
  *
  * The naive plan is a theta join on `key equal AND value between
  * probe·lo AND probe·hi` followed by a per-probe rank window. On a
  * FIXED key domain (25 brands) per-key occupancy grows ∝N, so
  * candidate pairs grow super-linearly — the measured 3.4× on 3× data
  * this operator retires (the same class as the linkage-gate re-key).
  * This plan materializes NO pair at all:
  *
  *   1. range-partition the PROBES by (key, value) (sampled exchange,
  *      data-adaptive — never the fixed key domain), checkpoint, and
  *      collect each partition's (key, value) min/max — ≤ 1 row per
  *      partition, the `Ranks` partials shape, partition ids carried
  *      in the data via `monotonically_increasing_id() >> 33`;
  *   2. broadcast those boundary intervals and replicate each BUILD
  *      row to exactly the partitions whose probe range intersects its
  *      service interval `[⌈den·v/numHi⌉, ⌊den·v/numLo⌋]` — EXACT
  *      integer arithmetic (a log-space RANGE frame would put float
  *      rounding on the band boundary, and a `PARTITION BY key` window
  *      would re-create the fixed-domain straggler); bands are narrow,
  *      so the replication factor is ~1;
  *   3. hash-shuffle the union by partition id, sort within partitions
  *      by (pid, key, side, value) — each key's builds immediately
  *      ahead of its probes — and run ONE streaming partition walk:
  *      both band endpoints are monotone in the probe value, so a
  *      two-pointer sweep with a monotonic deque yields each probe's
  *      in-band minimum-`tie` build row in amortized O(1), with only
  *      ONE key's builds buffered at a time and zero pair
  *      materialization.
  *
  * Band semantics (all integer, no division in the match): build `v`
  * matches probe `u` ⟺ `numLo·u ≤ den·v ≤ numHi·u`, i.e.
  * v ∈ [u·numLo/den, u·numHi/den]. Values must be non-negative longs
  * (scale decimals to integer units first — cents, grams) and bounded
  * so every product stays under 2^53: that keeps the vectorized
  * double `floor(a/b)` of the routing stage EXACT (for a < 2^53 the
  * correctly-rounded quotient can never cross an integer: the true
  * quotient is ≥ 1/b away from the next integer while a half-ulp is
  * a·2⁻⁵³/b < 1/b) — out-of-range values raise rather than wrap.
  * Among equal `tie` values the first row in (key, value) order wins —
  * pass a unique tie (an id) for full determinism, as every call site
  * does. NULL probe keys/values take the unmatched path (left-join
  * semantics); NULL build keys/values/ties cannot match and are
  * dropped.
  *
  * Scale shape: one sampled range exchange over probes + a
  * ≤#partitions-row collect + one broadcast boundary join over builds
  * + one hash exchange + partition-local sort + one O(n) walk. Every
  * stage is data-partitioned; nothing scales with the KEY domain. */
object BandJoin {

  /** Left-join `probe` to the minimum-`tie` `build` row with equal key
    * and value within the band (see object doc). Output: all `probe`
    * columns plus `keep` (build column → output name), NULL when no
    * build row is in band. */
  def argMinInBand(probe: DataFrame, probeKey: Column, probeVal: Column,
      build: DataFrame, buildKey: Column, buildVal: Column,
      tie: Column, keep: Map[String, String],
      numLo: Long, numHi: Long, den: Long): DataFrame = {
    require(den > 0 && numLo > 0 && numHi >= numLo,
      s"need 0 < numLo <= numHi and den > 0, got $numLo/$numHi/$den")
    require(keep.nonEmpty, "keep at least one build column")
    val spark = probe.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions
    // loud bound guard: every product in the plan stays under 2^53
    // (see object doc for why that makes the double floor-div exact)
    val lim = ((1L << 53) - numHi) / math.max(numHi, den)
    def guarded(v: Column) =
      when(v < 0 || v > lim, raise_error(concat(
        lit(s"argMinInBand: value outside [0, $lim]: "),
        v.cast("string")))).otherwise(v)

    val probeCols = probe.columns.toSeq
    val keepSeq = keep.toSeq
    val keepCols = keepSeq.map(_._1)
    val p0 = probe.select(struct(probeCols.map(col): _*).as("__probe"),
      probeKey.cast("string").as("__k"),
      guarded(probeVal.cast("long")).as("__v"))
    val pValid = p0.filter(col("__k").isNotNull && col("__v").isNotNull)
    val pNull = p0.filter(col("__k").isNull || col("__v").isNull)

    // 1. range-partition probes; pid rides in the data (mid >> 33 —
    // TaskContext/spark_partition_id renumber under multi-root stages)
    val parted = pValid.repartitionByRange(nPart, col("__k"), col("__v"))
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint(false) // consumers: bounds collect + the union
    val pidOf = shiftright(col("__mid"), 33)
    val bounds = parted.groupBy(pidOf.as("__pid"))
      .agg(min(struct(col("__k"), col("__v"))).as("__lo"),
        max(struct(col("__k"), col("__v"))).as("__hi"))

    // 2. builds -> every pid whose probe range intersects the build's
    // exact service interval [ceil(den*v/numHi), floor(den*v/numLo)]
    val b0 = build.select(buildKey.cast("string").as("__k"),
        guarded(buildVal.cast("long")).as("__v"),
        tie.cast("long").as("__tie"),
        struct(keepCols.map(col): _*).as("__pay"))
      .filter(col("__k").isNotNull && col("__v").isNotNull &&
        col("__tie").isNotNull)
    val routed = b0
      .withColumn("__uLo",
        floor((col("__v") * den + (numHi - 1)) / numHi).cast("long"))
      .withColumn("__uHi", floor(col("__v") * den / numLo).cast("long"))
      .join(broadcast(bounds),
        struct(col("__k"), col("__uHi")) >= col("__lo") &&
          struct(col("__k"), col("__uLo")) <= col("__hi"))

    // 3. union (side 0 = build, 1 = probe), hash by pid, local sort,
    // streaming two-pointer walk
    val pSchema = p0.schema("__probe").dataType.asInstanceOf[StructType]
    val paySchema = b0.schema("__pay").dataType.asInstanceOf[StructType]
    val buildSide = routed.select(col("__pid"), col("__k"),
      lit(0).as("__side"), col("__v"), col("__tie"), col("__pay"),
      lit(null).cast(pSchema).as("__probe"))
    val probeSide = parted.select(pidOf.as("__pid"), col("__k"),
      lit(1).as("__side"), col("__v"), lit(null).cast("long").as("__tie"),
      lit(null).cast(paySchema).as("__pay"), col("__probe"))
    val outSchema = StructType(pSchema.fields ++
      keepSeq.map { case (from, to) =>
        paySchema(from).copy(name = to, nullable = true) })
    val keepIdx = keepCols.map(paySchema.fieldIndex).toArray
    val nLo = numLo; val nHi = numHi; val d = den // not closing over this

    val answered = buildSide.unionByName(probeSide)
      .repartition(nPart, col("__pid"))
      .sortWithinPartitions(col("__pid"), col("__k"), col("__side"),
        col("__v"))
      .mapPartitions { it =>
        // ONE (pid, key) slice of builds buffered at a time — the sort
        // puts a key's builds immediately before its probes
        var pid = Long.MinValue
        var key: String = null
        val vs = new ArrayBuffer[Long]
        val ties = new ArrayBuffer[Long]
        val pays = new ArrayBuffer[Row]
        var l = 0; var r = 0 // in-band window [l, r) over the slice
        val deque = new java.util.ArrayDeque[Int]
        def reset(p: Long, k: String): Unit = {
          pid = p; key = k
          vs.clear(); ties.clear(); pays.clear()
          l = 0; r = 0; deque.clear()
        }
        val nulls = Seq.fill(keepIdx.length)(null)
        it.flatMap { row =>
          val rPid = row.getLong(0)
          val rKey = row.getString(1)
          if (row.getInt(2) == 0) { // build row
            if (rPid != pid || rKey != key) reset(rPid, rKey)
            vs += row.getLong(3); ties += row.getLong(4)
            pays += row.getStruct(5)
            Iterator.empty
          } else { // probe — its key's builds are all buffered (or none)
            if (rPid != pid || rKey != key) reset(rPid, rKey)
            val u = row.getLong(3)
            val lo = nLo * u // products < 2^53 by the input guard
            val hi = nHi * u
            while (r < vs.length && d * vs(r) <= hi) {
              // strict >: among equal ties the earliest (key, value)
              // order row survives at the front
              while (!deque.isEmpty && ties(deque.peekLast) > ties(r))
                deque.pollLast()
              deque.addLast(r)
              r += 1
            }
            while (l < r && d * vs(l) < lo) {
              if (!deque.isEmpty && deque.peekFirst == l) deque.pollFirst()
              l += 1
            }
            val tail: Seq[Any] =
              if (deque.isEmpty) nulls
              else {
                val best = pays(deque.peekFirst)
                keepIdx.toSeq.map(best.get)
              }
            Iterator.single(Row.fromSeq(row.getStruct(6).toSeq ++ tail))
          }
        }
      }(Encoders.row(outSchema))

    val unmatched = pNull.select(
      pSchema.fieldNames.map(f => col("__probe").getField(f).as(f)) ++
        keepSeq.map { case (from, to) =>
          lit(null).cast(paySchema(from).dataType).as(to) }: _*)
    answered.unionByName(unmatched)
  }
}
