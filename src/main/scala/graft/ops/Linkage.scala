package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — Fellegi–Sunter pair scoring (Fellegi &
  * Sunter, JASA 1969; the model behind Splink/dedupe-style entity
  * resolution). The reference resolves near-duplicate machine listings by
  * containment/regex matching (SURVEY §2.5); this is the statistical
  * generalisation a 100 TB curation pipeline uses when no single field is
  * authoritative: candidate pairs from a blocking key, per-field
  * agreement weights log2(m/u) (agree) / log2((1-m)/(1-u)) (disagree),
  * summed to a match score.
  *
  * Scale shape: pair generation is ONE self-equi-join on the blocking
  * key (never a cross join); everything after runs on the candidate-pair
  * table, whose size the blocking key controls. m/u parameters are
  * model-sized literals baked into codegen'd `when` chains — no lookup
  * join, no UDF. Skewed blocks are the operator's documented knob: pick
  * blocking columns with bounded fan-out (or salt them) exactly as the
  * LSH band join does. */
object Linkage {

  /** Per-field comparison spec: equality on `field` with assumed
    * m = P(agree | match) and u = P(agree | non-match). */
  final case class FieldSpec(field: String, m: Double, u: Double) {
    /** log2 agreement / disagreement weights — computed once on the
      * driver so both engines see identical double literals. */
    val agreeW: Double = math.log(m / u) / math.log(2.0)
    val disagreeW: Double = math.log((1.0 - m) / (1.0 - u)) / math.log(2.0)
  }

  /** Candidate pairs (id_a < id_b sharing `blockCol`) scored by the
    * Fellegi–Sunter log-odds sum over `fields`, in declaration order so
    * the float sum is order-fixed and engine-exact. Output:
    * (id_a, id_b, score) with score rounded to 6. */
  def fellegiSunterPairs(df: DataFrame, idCol: String, blockCol: Column,
      fields: Seq[FieldSpec]): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), blockCol.as("__blk"),
      struct(fields.map(f => col(f.field)): _*).as("__fa"))
    val b = df.select(col(idCol).as("id_b"), blockCol.as("__blk"),
      struct(fields.map(f => col(f.field)): _*).as("__fb"))
    val score = fields.zipWithIndex.map { case (f, i) =>
      when(col("__fa").getField(f.field) === col("__fb").getField(f.field),
        lit(f.agreeW)).otherwise(lit(f.disagreeW))
    }.reduce(_ + _)
    a.join(b, Seq("__blk")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(score, 6).as("score"))
  }

  /** Sorted-neighborhood CANDIDATE pairs (Hernández & Stolfo 1998 —
    * THE scalable blocking when every equality key has a fixed domain):
    * records sort by `sortKey` (ties broken by id), and each record
    * pairs with the `window` records after it in sort order. The
    * candidate count is EXACTLY N·w − w(w+1)/2 — linear in N by
    * construction, regardless of key-domain cardinality (the sf0.3
    * sweep measured equality blocking on TPC-H's fixed-domain columns
    * at ~N²; this is the shipped escape). Output:
    * (id_a, id_b, __fa, __fb) with id_a the sort-order predecessor and
    * __fa/__fb the `payload` column structs for any downstream
    * comparator (FS log-odds here, Jaro–Winkler in q369).
    *
    * Scale shape: one RANGE-PARTITIONED exact rank ([[Ranks]] — no
    * single-partition window anywhere), then each row emits TWO
    * rank-bucket keys (its own and the next), ONE equi-join on the
    * bucket, and a |Δrank| ≤ w filter — never a rank theta-join. */
  def sortedNeighborhoodCandidates(df: DataFrame, idCol: String,
      sortKey: Column, payload: Seq[String], window: Int): DataFrame = {
    require(window >= 1, "window >= 1")
    val ranked = Ranks.withRowNumber(
      df.select(col(idCol).as("__id"),
        struct(payload.map(col): _*).as("__f"), sortKey.as("__sk")),
      "__rn", col("__sk"), col("__id"))
      .drop("__sk") // Ranks localCheckpoints: both join sides reuse blocks
    val blk = floor((col("__rn") - 1) / window).cast("long")
    val a = ranked.select(col("__id").as("id_a"), col("__f").as("__fa"),
      col("__rn").as("__ra"),
      explode(array(blk, blk + 1)).as("__blk"))
    val b = ranked.select(col("__id").as("id_b"), col("__f").as("__fb"),
      col("__rn").as("__rb"), blk.as("__blk"))
    a.join(b, Seq("__blk"))
      .where(col("__rb") > col("__ra") && col("__rb") <= col("__ra") + window)
      .select(col("id_a"), col("id_b"), col("__fa"), col("__fb"))
  }

  /** [[sortedNeighborhoodCandidates]] scored by the same Fellegi–Sunter
    * log-odds sum as [[fellegiSunterPairs]] — the scale-safe FS shape.
    * Output: (id_a, id_b, score rounded 6). */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, sortKey: Column,
      fields: Seq[FieldSpec], window: Int): DataFrame = {
    val cand = sortedNeighborhoodCandidates(df, idCol, sortKey,
      fields.map(_.field), window)
    val score = fields.map { f =>
      when(col("__fa").getField(f.field) === col("__fb").getField(f.field),
        lit(f.agreeW)).otherwise(lit(f.disagreeW))
    }.reduce(_ + _)
    cand.select(col("id_a"), col("id_b"), round(score, 6).as("score"))
  }

  /** Blocking-quality audit (the standard record-linkage evaluation
    * pair: REDUCTION RATIO and PAIRS COMPLETENESS, Christen 2012):
    * against an exact truth key (rows agreeing on ALL of `truthCols`
    * are true matches),
    *   RR = 1 − candidate_pairs / C(n,2)      (how much work blocking saves)
    *   PC = captured_truth_pairs / truth_pairs (how many true matches survive)
    * where candidate pairs = Σ_blocks C(n_b,2) and a truth pair is
    * captured iff both rows share a block. The knob this audit tunes is
    * the q348 blocking key: tighter blocks raise RR and risk PC.
    *
    * Scale shape: three partial-combining aggregates (block sizes,
    * truth-group sizes, (truth, block) cell sizes) — NO pair
    * materialisation anywhere; all C(·,2) sums run as exact DECIMAL on
    * the aggregated tables. Output: 1 row (n, n_blocks, cand_pairs,
    * truth_pairs, captured_pairs, reduction_ratio, pairs_completeness).
    *
    * Truth-key construction: NULL-PROPAGATING concat with a \\u0001
    * separator, exactly matching the oracle's `a || chr(1) || b` — the
    * separator prevents conflating distinct groups whose concatenations
    * collide (('ab','c') vs ('a','bc')), and NULL propagation (concat,
    * not concat_ws which silently SKIPS nulls) puts every row with any
    * NULL truth field into the single NULL group in both engines. */
  def blockingQuality(df: DataFrame, idCol: String, blockCol: Column,
      truthCols: Seq[String]): DataFrame = {
    val truthKey = truthCols.map(c => col(c).cast("string"))
      .reduce((a, b) => concat(a, lit(""), b))
    val base = df.select(col(idCol).as("__id"), blockCol.as("__blk"),
      truthKey.as("__truth"))
      .localCheckpoint(false) // consumers: 3 independent aggregates
    def pairs2(c: Column) = (c.cast("decimal(19,0)") *
      (c - 1).cast("decimal(19,0)")).cast("decimal(38,0)")
    val blocks = base.groupBy(col("__blk")).agg(count(lit(1)).as("__c"))
      .agg(count(lit(1)).as("n_blocks"), sum(col("__c")).as("__n"),
        sum(pairs2(col("__c"))).as("__cand2"))
    val truth = base.groupBy(col("__truth")).agg(count(lit(1)).as("__c"))
      .agg(sum(pairs2(col("__c"))).as("__truth2"))
    val captured = base.groupBy(col("__truth"), col("__blk"))
      .agg(count(lit(1)).as("__c"))
      .agg(sum(pairs2(col("__c"))).as("__cap2"))
    def d(c: Column) = c.cast("double")
    blocks.crossJoin(truth).crossJoin(captured)
      .select(col("__n").as("n"), col("n_blocks"),
        // reported as DOUBLE (exact under 2^53; the RATIOS always run on
        // the exact decimal sums) so both engines agree on the dtype
        (d(col("__cand2")) / 2.0).as("cand_pairs"),
        (d(col("__truth2")) / 2.0).as("truth_pairs"),
        (d(col("__cap2")) / 2.0).as("captured_pairs"),
        round(lit(1.0) - d(col("__cand2")) /
          (d(col("__n")) * (d(col("__n")) - 1.0)), 6).as("reduction_ratio"),
        round(d(col("__cap2")) / d(col("__truth2")), 6)
          .as("pairs_completeness"))
  }

  /** Graded comparison spec for [[fellegiSunterGradedPairs]]: equality
    * → full agreement; round(JW, 6) ≥ `jwThreshold` → partial;
    * otherwise disagreement. m/u split across the three levels
    * (disagree mass = the remainders). */
  final case class GradedField(field: String, mFull: Double, uFull: Double,
      mPart: Double, uPart: Double, jwThreshold: Double) {
    require(mFull + mPart < 1 && uFull + uPart < 1, "level masses < 1")
    private def log2(x: Double) = math.log(x) / math.log(2.0)
    val wFull: Double = log2(mFull / uFull)
    val wPart: Double = log2(mPart / uPart)
    val wDis: Double = log2((1.0 - mFull - mPart) / (1.0 - uFull - uPart))
  }

  /** Fellegi–Sunter with GRADED string agreement (the Splink-style
    * comparison-level model): each field contributes the log2 weight of
    * its level — exact match, Jaro–Winkler partial match (the q369
    * codegen'd comparator, thresholded on the 6-dp ROUNDED similarity
    * so both engines band identically), or disagreement. Same blocked
    * self-join shape as [[fellegiSunterPairs]]. Output:
    * (id_a, id_b, score rounded 6). */
  def fellegiSunterGradedPairs(df: DataFrame, idCol: String,
      blockCol: Column, fields: Seq[GradedField]): DataFrame = {
    import graft.functions.JaroWinkler.jaroWinkler
    val a = df.select(col(idCol).as("id_a"), blockCol.as("__blk"),
      struct(fields.map(f => col(f.field)): _*).as("__fa"))
    val b = df.select(col(idCol).as("id_b"), blockCol.as("__blk"),
      struct(fields.map(f => col(f.field)): _*).as("__fb"))
    val score = fields.map { f =>
      val x = col("__fa").getField(f.field)
      val y = col("__fb").getField(f.field)
      when(x === y, lit(f.wFull))
        .when(round(jaroWinkler(x, y), 6) >= f.jwThreshold, lit(f.wPart))
        .otherwise(lit(f.wDis))
    }.reduce(_ + _)
    a.join(b, Seq("__blk")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(score, 6).as("score"))
  }

  /** Unsupervised m/u/λ estimation for the Fellegi–Sunter model by EM
    * over agreement PATTERNS (Winkler 1988; the algorithm inside
    * Splink): blocked pairs collapse to ≤ 2^k pattern counts, then EM
    * alternates pattern match-posteriors w_γ = λP(γ|M)/(λP(γ|M)+(1−λ)P(γ|U))
    * with λ/m/u re-estimates. The parameters q348 assumes as literals,
    * LEARNED from the data.
    *
    * Determinism: the E/M arithmetic runs on the driver over the
    * pattern table (model-sized by construction) with products and sums
    * folded in FIXED field/pattern order — the oracle replays the same
    * folds with ordered list_reduce, bit-for-bit.
    *
    * Scale shape: ONE blocked self-join collapsed immediately to the
    * (≤ 2^k)-row pattern aggregate — the EM never touches pairs again.
    * Output per field: (field, m, u, lambda, n_pairs) — lambda repeated. */
  def fellegiSunterEm(df: DataFrame, idCol: String, blockCol: Column,
      fields: Seq[String], iters: Int = 5, lambda0: Double = 0.1,
      m0: Double = 0.8, u0: Double = 0.2): DataFrame = {
    require(fields.nonEmpty && fields.size <= 8, "1..8 fields")
    val spark = df.sparkSession
    import spark.implicits._
    val a = df.select(col(idCol).as("id_a"), blockCol.as("__blk"),
      struct(fields.map(col): _*).as("__fa"))
    val b = df.select(col(idCol).as("id_b"), blockCol.as("__blk"),
      struct(fields.map(col): _*).as("__fb"))
    val gammaCols = fields.map(f =>
      (col("__fa").getField(f) === col("__fb").getField(f)).cast("int")
        .as(s"__g_$f"))
    val pat = a.join(b, Seq("__blk")).where(col("id_a") < col("id_b"))
      .select(gammaCols: _*)
      .groupBy(fields.map(f => col(s"__g_$f")): _*)
      .agg(count(lit(1)).as("__n"))
      .collect() // ≤ 2^k rows by construction
      .map(r => (fields.indices.map(i => r.getInt(i) == 1).toArray,
        r.getLong(fields.size)))
      .sortBy { case (g, _) =>
        g.zipWithIndex.map { case (v, i) => if (v) 1 << i else 0 }.sum }
    val nPairs = pat.map(_._2).sum
    val nD = nPairs.toDouble
    val k = fields.size
    var lam = lambda0
    var m = Array.fill(k)(m0)
    var u = Array.fill(k)(u0)
    (1 to iters).foreach { _ =>
      val w = pat.map { case (g, _) =>
        val pm = (0 until k).foldLeft(lam)((acc, f) =>
          acc * (if (g(f)) m(f) else 1.0 - m(f)))
        val pu = (0 until k).foldLeft(1.0 - lam)((acc, f) =>
          acc * (if (g(f)) u(f) else 1.0 - u(f)))
        pm / (pm + pu)
      }
      def fold(term: (Int, Double) => Double): Double =
        pat.indices.foldLeft(0.0)((acc, i) => acc + term(i, w(i)))
      val sumW = fold((i, wi) => pat(i)._2.toDouble * wi)
      val sumU = fold((i, wi) => pat(i)._2.toDouble * (1.0 - wi))
      val m2 = Array.tabulate(k)(f => fold((i, wi) =>
        if (pat(i)._1(f)) pat(i)._2.toDouble * wi else 0.0) / sumW)
      val u2 = Array.tabulate(k)(f => fold((i, wi) =>
        if (pat(i)._1(f)) pat(i)._2.toDouble * (1.0 - wi) else 0.0) / sumU)
      lam = sumW / nD
      m = m2; u = u2
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    fields.zipWithIndex.map { case (f, i) =>
      (f, r6(m(i)), r6(u(i)), r6(lam), nPairs) }
      .toDF("field", "m", "u", "lambda", "n_pairs")
  }

  /** Score-band triage of the scored pairs: band = floor(score),
    * decision by the (reviewLo, matchHi] thresholds. Output per
    * (band, decision): pair count — the linkage-quality histogram a
    * clerical-review queue is sized from. */
  def fellegiSunterBands(pairs: DataFrame, reviewLo: Double,
      matchHi: Double): DataFrame =
    pairs.select(floor(col("score")).cast("long").as("band"),
        when(col("score") > matchHi, lit("match"))
          .when(col("score") <= reviewLo, lit("nonmatch"))
          .otherwise(lit("review")).as("decision"))
      .groupBy(col("band"), col("decision"))
      .agg(count(lit(1)).as("n_pairs"))
}
