package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative Bloom-filter semi-join pruning: build a bitmask over the
  * SMALL side's keys, broadcast it, and pre-filter the 100 TB fact side
  * with pure codegen'd bit tests before the exact join.
  *
  * Why not `DataFrameStatFunctions.bloomFilter`: that collects the sketch
  * to the driver as an opaque JVM object with no Column-side probe. Here
  * BOTH build and probe are Catalyst expressions, so the whole thing stays
  * in whole-stage codegen and the build is a map-side-combinable `bit_or`
  * aggregation (a mergeable sketch by construction — partial bitmasks OR
  * together on the combiners, exactly how a 1000-executor build must work).
  *
  * Hash family: double hashing pos_i = (h1 + i·h2) mod m with
  * h1 = xxhash64(0, key), h2 = xxhash64(1, key) — the classic
  * Kirsch-Mitzenmacher construction; build and probe share it by calling
  * the same function, so false NEGATIVES are impossible by construction.
  *
  * The filter is a PRUNE, not the answer: callers follow with the exact
  * semi-join on the survivors (see `semiJoinPruned`), so false positives
  * only cost work, never correctness — the oracle for this operator is the
  * plain semi-join.
  */
object Bloom {

  /** Bit positions for `key` (non-negative, < m). `pmod` keeps the result
    * positive for negative hashes. */
  private def positions(key: Column, m: Int, k: Int): Seq[Column] = {
    // reduce mod m BEFORE combining: (h1 + i·h2) mod m ≡ ((h1 mod m) +
    // i·(h2 mod m)) mod m, and the reduced form can't overflow int64
    // (ANSI mode makes a raw h1 + i·h2 on full-range hashes an error)
    val h1 = pmod(xxhash64(lit(0), key), lit(m.toLong))
    val h2 = pmod(xxhash64(lit(1), key), lit(m.toLong))
    (0 until k).map(i => pmod(h1 + lit(i.toLong) * h2, lit(m.toLong)))
  }

  /** Aggregate `df`'s `key` column into a 1-row DataFrame holding the
    * bitmask as `array<long>` (column `bloom_bits`, m/64 words).
    *
    * Shape: explode k positions per key → groupBy word index with
    * `bit_or` partial aggregation → assemble the (m/64)-row result into
    * one array via a map lookup over a dense index sequence. Everything
    * after the explode runs over ≤ m/64 rows. */
  def buildBits(df: DataFrame, key: Column, m: Int = 1 << 16, k: Int = 3): DataFrame = {
    require(m % 64 == 0, s"m must be a multiple of 64, got $m")
    val words = m / 64
    val pos = df.select(explode(array(positions(key, m, k): _*)).as("__pos"))
    val wordRows = pos
      .groupBy((col("__pos") / 64).cast("int").as("__w"))
      .agg(bit_or(shiftBit(col("__pos"))).as("__bits"))
    wordRows
      .agg(map_from_entries(collect_list(struct(col("__w"), col("__bits")))).as("__m"))
      .select(transform(sequence(lit(0), lit(words - 1)),
        w => coalesce(element_at(col("__m"), w), lit(0L))).as("bloom_bits"))
  }

  /** Probe: true iff every one of `key`'s k bit positions is set in
    * `bits` (an `array<long>` column, normally from a broadcast of
    * `buildBits`). Pure expressions — stays inside whole-stage codegen. */
  def mightContain(bits: Column, key: Column, m: Int = 1 << 16, k: Int = 3): Column =
    positions(key, m, k).map { p =>
      get(bits, (p / 64).cast("int")).bitwiseAND(shiftBit(p)) =!= 0L
    }.reduce(_ && _)

  /** 1L << (pos % 64) with a COLUMN shift amount — `functions.shiftleft`
    * only accepts a literal Int, so this goes through the SQL function. */
  private def shiftBit(pos: Column): Column =
    call_function("shiftleft", lit(1L), (pos % 64).cast("int"))

  /** `buildBits` evaluated: the build aggregation runs distributed
    * (partial bit_or on the combiners), then the finished m/64-word mask —
    * a few KB — comes back to the driver, exactly like
    * `DataFrameStatFunctions.bloomFilter`. Eager by design: the mask must
    * be a LITERAL in the probe (see `semiJoinPruned`). */
  def buildBitsLocal(df: DataFrame, key: Column, m: Int = 1 << 16, k: Int = 3): Array[Long] =
    buildBits(df, key, m, k).collect()(0).getSeq[Long](0).toArray

  /** The full pattern: bloom-prune `fact` on `factKey` against `dim`'s
    * `dimKey`, then exact LEFT SEMI join to drop the false positives.
    *
    * The mask is embedded as a LITERAL, not cross-joined as a broadcast
    * column: a probe that references a joined-in column makes Catalyst's
    * PushDownLeftSemiAntiJoin slide the exact semi-join BELOW the bloom
    * filter (join conditions only reference the fact side), and the fact
    * rows would reach the join — and at scale, its shuffle — unpruned.
    * With a literal predicate the optimized plan keeps Filter(bloom)
    * directly on the fact scan with the join above it, so a shuffle semi
    * join exchanges only the surviving rows. The exact join carries no
    * broadcast hint — AQE broadcasts small dims on its own, and a huge dim
    * side legitimately shuffle-joins (what the prune is FOR). */
  def semiJoinPruned(fact: DataFrame, factKey: Column, dim: DataFrame,
      dimKey: Column, m: Int = 1 << 16, k: Int = 3): DataFrame =
    semiJoinPruned(fact, factKey, dim, dimKey, buildBitsLocal(dim, dimKey, m, k), m, k)

  /** Prebuilt-mask form — the production path: the build aggregation runs
    * ONCE per dim-table version (`buildBitsLocal`), the mask is stored
    * with the dim snapshot, and every prune against that version reuses
    * it. The convenience overload above re-runs the build per invocation,
    * which is fine for one-shot queries and wasteful in a loop. `bits`
    * must come from `buildBitsLocal` with the SAME (m, k) — the require
    * catches the m mismatch; a k mismatch can't be detected from the mask
    * shape and is on the caller. */
  def semiJoinPruned(fact: DataFrame, factKey: Column, dim: DataFrame,
      dimKey: Column, bits: Array[Long], m: Int, k: Int): DataFrame = {
    require(m % 64 == 0, s"m=$m must be a multiple of 64 (whole words); " +
      "a ragged final word would let probe positions index past the mask " +
      "and silently null the predicate (false negatives)")
    require(bits.length == m / 64,
      s"mask has ${bits.length} words, expected ${m / 64} for m=$m")
    fact.filter(mightContain(lit(bits), factKey, m, k))
      .join(dim.select(dimKey.as("__dk")).distinct(),
        factKey === col("__dk"), "left_semi")
  }
}
