package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Dedup.unpersistCheckpoint

/** Bradley–Terry preference-strength estimation (Bradley & Terry 1952)
  * via Hunter (2004)'s MM update — the standard fit for PAIRWISE
  * preference data, which is what an RLHF/eval pipeline curates by the
  * billions (chosen/rejected pairs, A/B rater verdicts, tournament
  * results):
  *
  *   w_i ← W_i / Σ_{j≠i} n_ij / (w_i + w_j),   then rescale Σw = N
  *
  * with W_i = i's total wins and n_ij = comparisons between i and j.
  * Each MM step provably increases the likelihood (no learning rate,
  * no RNG — fits the engine-wide determinism contract).
  *
  * Float discipline: per-opponent terms are double-divided then 9-dp
  * fixed point summed as DECIMAL (order-independent); the rescale
  * divides by the 9-dp decimal sum of raws; strengths carry
  * DECIMAL(28,9) between iterations so an oracle replays bit-equal.
  *
  * Scale shape: comparisons aggregate ONCE (one partial-combining
  * pass over the fact) to the DIRECTED pair-count table
  * (entity²-bounded and sparse — the pairs actually compared, NOT the
  * raw comparison volume); wins and the unordered comps table both
  * derive from that bounded table. Each of
  * the `iters` MM steps is comps ⋈ strengths twice (strengths are
  * entity-sized — AQE broadcasts them) + one partial-combining
  * per-entity sum + a 1-row rescale aggregate. Strengths checkpoint
  * eagerly per iteration and release the previous step (the PageRank
  * loop discipline). Output: (id, wins, strength). */
object Preference {

  def bradleyTerry(pairs: DataFrame, winnerCol: Column, loserCol: Column,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters in [1, 8], got $iters")
    // ONE partial-combining pass over the raw comparisons -> DIRECTED
    // pair counts (entity²-bounded, sparse); wins and the unordered
    // comps table both derive from it, so the fact-sized comparison
    // frame is scanned once and never materialized
    val pc = pairs
      .select(winnerCol.cast("long").as("__w"), loserCol.cast("long").as("__l"))
      .filter(col("__w").isNotNull && col("__l").isNotNull &&
        col("__w") =!= col("__l"))
      .groupBy(col("__w"), col("__l")).agg(count(lit(1)).as("__n"))
      .localCheckpoint(eager = true) // consumers: wins + comps
    val wins = pc.groupBy(col("__w").as("id")).agg(sum(col("__n")).as("wins"))
    val comps = pc
      .select(least(col("__w"), col("__l")).as("__a"),
        greatest(col("__w"), col("__l")).as("__b"), col("__n"))
      .groupBy(col("__a"), col("__b")).agg(sum(col("__n")).as("__n"))
      .localCheckpoint(eager = true) // reused every iteration
    val base = comps.select(col("__a").as("id"))
      .unionByName(comps.select(col("__b").as("id")))
      .distinct()
      .join(wins, Seq("id"), "left")
      .na.fill(0L, Seq("wins"))
      .localCheckpoint(eager = true) // reused every iteration + the output
    // pc's blocks release only after BOTH consumers (comps above, wins
    // inside base) have materialized — a localCheckpoint scan cannot
    // replay once dropped
    unpersistCheckpoint(pc)
    def d(c: Column) = c.cast("double")
    def dec9(c: Column) = round(c, 9).cast("decimal(28,9)")

    var w = base.select(col("id"),
      lit(1.0).cast("decimal(28,9)").as("__s"))
    var prev: DataFrame = null
    for (_ <- 1 to iters) {
      val sa = w.select(col("id").as("__a"), col("__s").as("__sa"))
      val sb = w.select(col("id").as("__b"), col("__s").as("__sb"))
      val t = comps.join(sa, "__a").join(sb, "__b")
      // both directions of every unordered pair share one denominator
      val terms = t.select(col("__a").as("id"),
          dec9(d(col("__n")) / d(col("__sa") + col("__sb"))).as("__t"))
        .unionByName(t.select(col("__b").as("id"),
          dec9(d(col("__n")) / d(col("__sa") + col("__sb"))).as("__t")))
      val raw = base
        .join(terms.groupBy(col("id")).agg(sum(col("__t")).as("__d")), "id")
        .select(col("id"), (d(col("wins")) / d(col("__d"))).as("__raw"))
      // rescale Σw = N (BT is scale-invariant; pinning the sum makes
      // the fixture comparable across iterations and engines)
      val tot = raw.agg(sum(dec9(col("__raw"))).as("__S"),
        count(lit(1)).as("__N"))
      val next = raw.crossJoin(tot)
        .select(col("id"),
          dec9(d(col("__raw")) * d(col("__N")) / d(col("__S"))).as("__s"))
        .localCheckpoint(eager = true)
      if (prev != null) unpersistCheckpoint(prev)
      prev = next
      w = next
    }
    val out = base.join(w, "id")
      .select(col("id"), col("wins"), round(d(col("__s")), 6).as("strength"))
    out
  }

  /** Plackett–Luce strength estimation over FULL RANKINGS (Plackett
    * 1975; Luce 1959) via Hunter (2004)'s MM update — the listwise
    * extension of [[bradleyTerry]] for data that arrives as ordered
    * lists (best-of-n decode rankings, rater-ordered response sets)
    * rather than pairs. A ranking of m items is m−1 sequential choices;
    * the MM step is
    *
    *   w_i ← W_i / Σ_{(g,j): i ∈ choice set of stage j} 1/S_gj,
    *   S_gj = Σ_{rank ≥ j in g} w,   then rescale Σw = N
    *
    * with W_i = i's total choice count (# stages where i was picked =
    * # rankings where i is not last). Each step provably increases the
    * likelihood — no learning rate, no RNG.
    *
    * Float discipline: stage reciprocals are double-divided then 9-dp
    * fixed-point (DECIMAL(28,9)); suffix/prefix sums over stages stay
    * decimal-exact (window sums of decimals), so per-item denominators
    * are order-independent and an oracle replays bit-equal. Strengths
    * carry DECIMAL(28,9) between iterations, Σw = N rescale as in BT.
    *
    * Scale shape: positions densify ONCE (row_number + count windows
    * keyed by the HIGH-CARDINALITY group column — distributed) and the
    * ranked table checkpoints for reuse across iterations. Each of the
    * `iters` MM steps is one item-keyed join against the entity-sized
    * strengths (AQE broadcasts it), two group-keyed window sums (the
    * suffix S_gj and the prefix of reciprocals — both bounded by the
    * ranking length per group), and one partial-combining per-item sum.
    * Groups of size 1 drop (no stages — rankings carry no signal).
    * Output: (id, wins, strength); strength 0 for never-chosen items
    * (the MLE boundary, same convention as BT's winless entities). */
  def plackettLuce(rankings: DataFrame, groupCol: Column, itemCol: Column,
      posCol: Column, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters in [1, 8], got $iters")
    val byG = Window.partitionBy(col("__g"))
    val rk = rankings
      .select(groupCol.as("__g"), itemCol.cast("long").as("__it"),
        posCol.as("__p"))
      .filter(col("__g").isNotNull && col("__it").isNotNull &&
        col("__p").isNotNull)
      .withColumn("__r", row_number()
        .over(byG.orderBy(col("__p"), col("__it"))).cast("long"))
      .withColumn("__m", count(lit(1)).over(byG).cast("long"))
      .filter(col("__m") >= 2)
      .select(col("__g"), col("__it"), col("__r"), col("__m"))
      .localCheckpoint(eager = true) // reused every iteration + wins/base
    val wins = rk.filter(col("__r") < col("__m"))
      .groupBy(col("__it").as("id")).agg(count(lit(1)).as("wins"))
    val base = rk.select(col("__it").as("id")).distinct()
      .join(wins, Seq("id"), "left")
      .na.fill(0L, Seq("wins"))
      .localCheckpoint(eager = true) // reused every iteration + the output
    def d(c: Column) = c.cast("double")
    def dec9(c: Column) = round(c, 9).cast("decimal(28,9)")

    var w = base.select(col("id"), lit(1.0).cast("decimal(28,9)").as("__s"))
    var prev: DataFrame = null
    for (_ <- 1 to iters) {
      val j = rk.join(w.withColumnRenamed("id", "__it"), "__it")
      // S_gj: inclusive suffix sum of strengths in rank order (exact
      // decimal); stage reciprocal only for the m−1 true stages, then
      // an inclusive prefix accumulates each item's stage memberships
      // (the last item's prefix equals P_{m−1} since c_m = 0)
      val p = j
        .withColumn("__sw", sum(col("__s")).over(byG.orderBy(col("__r").desc)))
        .withColumn("__c", when(col("__r") < col("__m"),
          dec9(lit(1.0) / d(col("__sw"))))
          .otherwise(lit(0).cast("decimal(28,9)")))
        .withColumn("__cp", sum(col("__c")).over(byG.orderBy(col("__r"))))
      val denom = p.groupBy(col("__it").as("id")).agg(sum(col("__cp")).as("__d"))
      val raw = base.join(denom, "id")
        .select(col("id"), (d(col("wins")) / d(col("__d"))).as("__raw"))
      val tot = raw.agg(sum(dec9(col("__raw"))).as("__S"),
        count(lit(1)).as("__N"))
      val next = raw.crossJoin(tot)
        .select(col("id"),
          dec9(d(col("__raw")) * d(col("__N")) / d(col("__S"))).as("__s"))
        .localCheckpoint(eager = true)
      if (prev != null) unpersistCheckpoint(prev)
      prev = next
      w = next
    }
    base.join(w, "id")
      .select(col("id"), col("wins"), round(d(col("__s")), 6).as("strength"))
  }

  /** Positional rank aggregation — the closed-form (no-iteration)
    * companions to the MM fits above, the standard way to merge ranked
    * lists from many judges/retrievers when a model fit is overkill:
    *
    *  - BORDA (de Borda 1781): an item at tie-averaged position r̄ in a
    *    ranking of m earns m − r̄ points; score = the sum over rankings.
    *  - COPELAND (1951): from the pairwise-majority table (i over j in
    *    more rankings than j over i), 1 point per opponent beaten, ½
    *    per tied opponent — over OBSERVED pairs only (the incomplete-
    *    tournament convention: never-compared pairs contribute 0).
    *
    * Ties in `posCol` within a ranking average positionally for Borda
    * and count for NEITHER side in Copeland (strict position order).
    *
    * Float discipline: positions stay in integer doubled-rank space
    * (2r̄ = 2·rank + tiecount − 1), so Borda totals and Copeland's
    * doubled scores are exact longs; the single halving is the only
    * float op (round-6).
    *
    * Scale shape: rank/count windows keyed by the HIGH-CARDINALITY
    * group column; the pair expansion is per-ranking (list-length-
    * bounded fanout, the q442 shape) aggregated straight to the sparse
    * entity²-bounded majority table. Output: (id, n_rankings, borda,
    * copeland). */
  def rankAggregation(rankings: DataFrame, groupCol: Column,
      itemCol: Column, posCol: Column): DataFrame = {
    val byG = Window.partitionBy(col("__g"))
    val rk = rankings
      .select(groupCol.as("__g"), itemCol.cast("long").as("__it"),
        posCol.as("__p"))
      .filter(col("__g").isNotNull && col("__it").isNotNull &&
        col("__p").isNotNull)
      .withColumn("__rmin", rank().over(byG.orderBy(col("__p"))).cast("long"))
      .withColumn("__tc",
        count(lit(1)).over(Window.partitionBy(col("__g"), col("__p")))
          .cast("long"))
      .withColumn("__m", count(lit(1)).over(byG).cast("long"))
      .localCheckpoint(eager = true) // consumers: borda agg + pair join
    val borda = rk.groupBy(col("__it").as("id"))
      .agg(count(lit(1)).as("n_rankings"),
        sum(lit(2) * col("__m") - (lit(2) * col("__rmin") + col("__tc") - 1))
          .as("__b2"))
    // directed above-counts -> unordered majority table (sparse)
    val x = rk.select(col("__g"), col("__it").as("__wi"), col("__p").as("__wp"))
    val y = rk.select(col("__g"), col("__it").as("__li"), col("__p").as("__lp"))
    val nij = x.join(y, Seq("__g"))
      .filter(col("__wp") < col("__lp"))
      .groupBy(col("__wi"), col("__li")).agg(count(lit(1)).as("__n"))
    val und = nij
      .select(least(col("__wi"), col("__li")).as("__a"),
        greatest(col("__wi"), col("__li")).as("__b"),
        when(col("__wi") < col("__li"), col("__n")).otherwise(0L).as("__na"),
        when(col("__wi") > col("__li"), col("__n")).otherwise(0L).as("__nb"))
      .groupBy(col("__a"), col("__b"))
      .agg(sum(col("__na")).as("__wa"), sum(col("__nb")).as("__wb"))
    val c2 = und.select(col("__a").as("id"),
        when(col("__wa") > col("__wb"), 2L)
          .when(col("__wa") === col("__wb"), 1L).otherwise(0L).as("__c2"))
      .unionByName(und.select(col("__b").as("id"),
        when(col("__wb") > col("__wa"), 2L)
          .when(col("__wa") === col("__wb"), 1L).otherwise(0L).as("__c2")))
      .groupBy(col("id")).agg(sum(col("__c2")).as("__c2"))
    borda.join(c2, Seq("id"), "left")
      .na.fill(0L, Seq("__c2"))
      .select(col("id"), col("n_rankings"),
        round(col("__b2").cast("double") / 2.0, 6).as("borda"),
        round(col("__c2").cast("double") / 2.0, 6).as("copeland"))
  }
}
