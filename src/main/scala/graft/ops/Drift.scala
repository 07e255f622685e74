package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution monitoring — the ops that watch a 100 TB corpus CHANGE:
  * histograms for the profile dashboard, chi-square drift between two
  * snapshots (yesterday's crawl vs today's), and join-key skew
  * measurement (the evidence behind a salting decision, not a guess).
  *
  * Determinism: every ratio is computed by the same left-to-right IEEE
  * double expression on both engines; the chi-square TOTAL is a fold
  * over the category-sorted contribution list (the proven q28-family
  * parity pattern) — never a shuffle-order-dependent double sum. */
object Drift {

  /** Equi-width histogram of a numeric column → (bin, lo_edge, hi_edge,
    * n) with `nbins` rows, zero-filled. Values outside [lo, hi] clamp to
    * the edge bins (a monitoring histogram must count outliers, not drop
    * them). ONE partial-combining aggregation on the bin id; the
    * zero-fill joins against an nbins-row literal range.
    */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double,
      nbins: Int): DataFrame = {
    require(nbins > 0 && hi > lo, "histogram needs nbins > 0 and hi > lo")
    val spark = df.sparkSession
    import spark.implicits._
    val bin = least(lit(nbins - 1), greatest(lit(0),
      floor((col(valueCol).cast("double") - lit(lo)) / lit(hi - lo)
        * lit(nbins)).cast("int")))
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(bin.as("bin")).agg(count(lit(1)).as("__n"))
    spark.range(nbins).select(col("id").cast("int").as("bin"))
      .withColumn("lo_edge", lit(lo) + col("bin") * lit((hi - lo) / nbins))
      .withColumn("hi_edge", lit(lo) + (col("bin") + 1) * lit((hi - lo) / nbins))
      .join(counts, Seq("bin"), "left")
      .withColumn("n", coalesce(col("__n"), lit(0L))).drop("__n")
  }

  /** Chi-square drift of a categorical column between two snapshots →
    * one row per category (n_ref, n_cur, p_ref, p_cur, contrib) plus
    * the ordered-fold total in every row (`chi2`). contrib =
    * (p_cur − p_ref)² / p_ref over the REFERENCE-present categories;
    * a category absent from the reference (p_ref = 0) would divide by
    * zero — it's reported with NULL contrib and excluded from the
    * total, which is itself a drift signal (new category appeared).
    *
    * Scale shape: two filtered single-scan aggs on the (few-valued)
    * category key, one tiny outer join, a category-count-row window for
    * totals — no data-sized state. The chi2 total folds the SORTED
    * contribution list left-to-right, so it is bit-identical on any
    * partitioning and across engines. */
  def chiSquareDrift(ref: DataFrame, cur: DataFrame,
      catCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val r = ref.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n_ref"))
    val c = cur.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n_cur"))
    val joined = r.join(c, Seq("category"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    // totals and the chi2 fold are 1-row aggregates cross-joined back
    // (AQE broadcasts them) — NOT a global single-partition window, so
    // the category rows never funnel through one task
    val tot = joined.agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"))
    val withP = joined.crossJoin(tot)
      .withColumn("p_ref",
        col("n_ref").cast("double") / col("__tr").cast("double"))
      .withColumn("p_cur",
        col("n_cur").cast("double") / col("__tc").cast("double"))
      .withColumn("contrib",
        when(col("n_ref") > 0,
          (col("p_cur") - col("p_ref")) * (col("p_cur") - col("p_ref"))
            / col("p_ref")))
      .drop("__tr", "__tc")
    val chi2 = withP.agg(
      aggregate(
        array_sort(collect_list(
          when(col("contrib").isNotNull,
            struct(col("category"), col("contrib"))))),
        lit(0.0), (acc, x) => acc + x.getField("contrib")).as("chi2"))
    withP.crossJoin(chi2)
  }

  /** KL-divergence + PSI drift of a categorical column between two
    * snapshots — the log-scaled complement of `chiSquareDrift` (chi2 is
    * dominated by the largest categories; KL(cur‖ref) and the population
    * stability index weight by the CURRENT mass and its log-ratio, so a
    * small category 10×-ing registers). One row per category with both
    * per-category contributions plus the ordered-fold totals (`kl`,
    * `psi`) in every row.
    *
    *  - kl_contrib  = p_cur · ln(p_cur/p_ref)   (n_cur > 0 AND n_ref > 0)
    *  - psi_contrib = (p_cur − p_ref) · ln(p_cur/p_ref)   (same guard;
    *    always ≥ 0 — the factors share a sign)
    *
    * A category present on only one side has NULL contributions and is
    * excluded from both totals — that asymmetry (new category appeared /
    * category vanished) is itself the loudest drift signal and is visible
    * in its n_ref/n_cur zeros; folding ±∞ instead would destroy the
    * totals for every other category.
    *
    * Determinism: ln() differs by 1 ulp between JVM Math.log and glibc,
    * so each contribution is rounded to 9 decimals BEFORE the fold (the
    * proven q42 tfidf pattern) and the totals fold the category-SORTED
    * contribution list (the q127 pattern) — never a shuffle-order double
    * sum. Scale shape identical to `chiSquareDrift`: two filtered aggs on
    * the few-valued category key, a tiny outer join, 1-row-aggregate
    * cross joins (AQE broadcasts). */
  def klDrift(ref: DataFrame, cur: DataFrame, catCol: String): DataFrame = {
    val r = ref.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n_ref"))
    val c = cur.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n_cur"))
    val joined = r.join(c, Seq("category"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val tot = joined.agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"))
    val lr = log(col("p_cur") / col("p_ref"))
    val withP = joined.crossJoin(tot)
      .withColumn("p_ref",
        col("n_ref").cast("double") / col("__tr").cast("double"))
      .withColumn("p_cur",
        col("n_cur").cast("double") / col("__tc").cast("double"))
      .withColumn("kl_contrib",
        when(col("n_ref") > 0 && col("n_cur") > 0,
          round(col("p_cur") * lr, 9)))
      .withColumn("psi_contrib",
        when(col("n_ref") > 0 && col("n_cur") > 0,
          round((col("p_cur") - col("p_ref")) * lr, 9)))
      .drop("__tr", "__tc")
    def foldedTotal(contrib: String): Column =
      aggregate(
        array_sort(collect_list(
          when(col(contrib).isNotNull, struct(col("category"), col(contrib))))),
        lit(0.0), (acc, x) => acc + x.getField(contrib))
    val totals = withP.agg(foldedTotal("kl_contrib").as("kl"),
      foldedTotal("psi_contrib").as("psi"))
    withP.crossJoin(totals)
  }

  /** Robust per-group standardization: median/MAD z-scores with an
    * outlier flag — the scaling a quality-score column needs before
    * thresholding across heterogeneous sources (mean/stddev move with
    * the outliers they're supposed to catch; median and MAD don't).
    * Emits m (group median), mad (median of |x − m|), robust_z =
    * (x − m) / (1.4826·mad) and is_outlier = |robust_z| > `zCut`.
    * A group whose MAD is 0 (over half the values identical) gets NULL
    * z — flagging everything off-median there would be noise, and the
    * caller sees the degenerate spread in the mad column.
    *
    * Scale shape: two exact-percentile aggregations on the group key
    * (the q10 proven pattern — `percentile` ↔ DuckDB `quantile_cont`)
    * joined back; both one-row-per-group tables broadcast under AQE, so
    * the fact side shuffles zero times. At heavy-hitter group sizes swap
    * `percentile` for `percentile_approx` (the q69 escape hatch). */
  def robustZ(df: DataFrame, valueCol: String, keys: Seq[String],
      zCut: Double = 3.0): DataFrame = {
    val v = col(valueCol).cast("double")
    val med = df.filter(v.isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(percentile(v, lit(0.5)).as("m"))
    val mad = df.join(med, keys)
      .filter(v.isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(percentile(abs(v - col("m")), lit(0.5)).as("mad"))
    df.join(med, keys, "left").join(mad, keys, "left")
      .withColumn("robust_z",
        when(col("mad") > 0, (v - col("m")) / (col("mad") * lit(1.4826))))
      .withColumn("is_outlier",
        when(col("robust_z").isNotNull, abs(col("robust_z")) > lit(zCut)))
  }

  /** Join-key skew profile: the top-k heaviest keys of `keyCol` with
    * each key's share of all rows and its ratio to the MEAN key load
    * (ratio ≫ 1 ⇒ that key hot-spots a hash-partitioned join; the
    * number says how many salt buckets it needs). One partial-combining
    * count shuffle + a top-k (TakeOrdered, no global sort); totals ride
    * along as 1-row-aggregate cross joins (AQE broadcasts them). */
  /** Two-sample distribution distance between the `isA`/else-B slices
    * of a numeric column: the Kolmogorov–Smirnov sup-distance AND the
    * 1-Wasserstein (earth-mover) distance, both computed EXACTLY from
    * the merged value-level ECDFs:
    *   KS = max_v |F_A(v) − F_B(v)|,
    *   W1 = Σ_v |F_A(v) − F_B(v)| · (v⁺ − v)  (v⁺ = next distinct value).
    * KS says "do they differ", W1 says "by how much value-mass" — the
    * pair a drift monitor wants before alerting. ECDF steps are exact
    * integer cumulative counts; W1 terms are 9-dp fixed point summed as
    * DECIMAL; the max of doubles is order-independent.
    *
    * Scale shape: ONE (value) partial-combining aggregate with
    * conditional counts, then `Ranks.runningSums` over the VALUE-DOMAIN
    * table (range exchange + local sort + broadcast offsets — no
    * single-partition stage even when continuous values make the value
    * table fact-sized), one 1-row aggregate. Output:
    * (n_a, n_b, ks_d, emd). */
  def twoSampleDist(df: DataFrame, valueCol: String, isA: Column): DataFrame = {
    val v = df.select(col(valueCol).cast("decimal(18,6)").as("__v"),
        isA.as("__a"))
      .groupBy(col("__v"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("__na"),
        sum(when(col("__a"), 0L).otherwise(1L)).as("__nb"))
    // distributed prefix sums + lead over the value-domain table
    // (continuous values make it fact-sized — the q209-class hatch, not
    // a single-partition Window.orderBy); the slice totals ride along
    // from the same partials job as literals, dropping the old
    // checkpoint + totals aggregate + crossJoin entirely
    val run = Ranks.runningSums(v, Seq("__na" -> "__ca", "__nb" -> "__cb"),
      Some("__v" -> "__vn"), col("__v"))
    val dec = run.df.withColumn("__ta", lit(run.totals("__na")))
      .withColumn("__tb", lit(run.totals("__nb")))
    val diff = abs(col("__ca").cast("double") / col("__ta").cast("double") -
      col("__cb").cast("double") / col("__tb").cast("double"))
    dec.agg(
      max(col("__ta")).as("n_a"), max(col("__tb")).as("n_b"),
      round(max(diff), 6).as("ks_d"),
      round(sum(when(col("__vn").isNotNull,
          round(diff * (col("__vn") - col("__v")).cast("double"), 9)
            .cast("decimal(28,9)"))).cast("double"), 6).as("emd"))
  }

  /** Jensen–Shannon divergence between two snapshots' categorical
    * distributions: JSD = ½KL(p‖m) + ½KL(q‖m) with m = (p+q)/2 — the
    * SYMMETRIC, always-finite drift metric (unlike KL, a category
    * present on one side only contributes a finite ½p·ln2-ish term, so
    * JSD works on open vocabularies where klDrift must drop
    * asymmetric categories). Per-category terms are 9-dp fixed point
    * summed as DECIMAL — order-free, so this op scales to VOCAB-sized
    * category spaces where klDrift's driver-side sorted fold (built for
    * few-valued categories) would not. Also reports jsd_norm = JSD/ln 2
    * ∈ [0, 1].
    *
    * Scale shape: two category-keyed partial-combining counts, one
    * category-keyed outer join, ONE 1-row decimal aggregate. */
  def jsDivergence(ref: DataFrame, cur: DataFrame, catCol: String): DataFrame = {
    val r = ref.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n_ref"))
    val c = cur.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n_cur"))
    val joined = r.join(c, Seq("category"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .localCheckpoint(false) // totals + the term pass
    val tot = joined.agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"))
    val p = col("n_ref").cast("double") / col("__tr").cast("double")
    val q = col("n_cur").cast("double") / col("__tc").cast("double")
    val m = (p + q) / lit(2.0)
    val term =
      coalesce(when(col("n_ref") > 0, p * log(p / m) / lit(2.0)), lit(0.0)) +
        coalesce(when(col("n_cur") > 0, q * log(q / m) / lit(2.0)), lit(0.0))
    joined.crossJoin(tot)
      .select(col("__tr"), col("__tc"),
        round(term, 9).cast("decimal(18,9)").as("__t"))
      .groupBy(col("__tr").as("n_ref"), col("__tc").as("n_cur"))
      .agg(count(lit(1)).as("n_cats"),
        round(sum(col("__t")).cast("double"), 6).as("jsd_nats"),
        round(sum(col("__t")).cast("double") / lit(math.log(2.0)), 6)
          .as("jsd_norm"))
  }

  /** Freedman–Diaconis auto-binned histogram: bin width
    * h = 2·IQR/∛n (the robust bin rule — Sturges under-bins heavy
    * tails, fixed-width guesses), quartiles as TYPE-1 order statistics
    * read off the value-level cumulative table (no row-level sort),
    * bin count capped at `maxBins`. Degenerate spread (IQR = 0) falls
    * back to a single bin.
    *
    * Scale shape: ONE (value) partial-combining count +
    * `Ranks.runningSums` over the VALUE-DOMAIN table (no
    * single-partition stage for continuous values) + ONE fused
    * min/max/quartile aggregate + one map pass binning against the
    * broadcast 1-row parameter row. Output: (bin, lo, hi, n). */
  def fdHistogram(df: DataFrame, valueCol: String, maxBins: Int = 50): DataFrame = {
    require(maxBins >= 1, "maxBins >= 1")
    val v = df.select(col(valueCol).cast("decimal(18,6)").as("__v"))
    val vc = v.groupBy(col("__v")).agg(count(lit(1)).as("__c"))
    // distributed prefix sum over the value-domain table (q209-class
    // hatch); n comes back from the partials job as a literal, so the
    // min/max/quartile reads FUSE into one aggregate over the decorated
    // table — the old form ran a single-partition window plus two
    // checkpoint-shared aggregate passes
    val run = Ranks.runningSums(vc, Seq("__c" -> "__cum"), None,
      col("__v"))
    def rank(q: Double) =
      lit(math.floor((run.totals("__c") - 1).toDouble * q).toLong + 1)
    val par = run.df.agg(
        min(col("__v")).as("__mn"), max(col("__v")).as("__mx"),
        min(when(col("__cum") >= rank(0.25), col("__v"))).as("__q1"),
        min(when(col("__cum") >= rank(0.75), col("__v"))).as("__q3"))
      .withColumn("__n", lit(run.totals("__c")))
      .withColumn("__h", lit(2.0) *
        (col("__q3") - col("__q1")).cast("double") /
        cbrt(col("__n").cast("double")))
      .withColumn("__nb", when(col("__h") > 0.0,
          least(lit(maxBins.toLong), greatest(lit(1L),
            ceil((col("__mx") - col("__mn")).cast("double") / col("__h"))
              .cast("long"))))
        .otherwise(lit(1L)))
      .localCheckpoint(false) // binning pass + edge decoration
    val binned = v.crossJoin(par)
      .select(when(col("__nb") === 1, lit(0L))
        .otherwise(least(col("__nb") - 1,
          floor((col("__v") - col("__mn")).cast("double") / col("__h"))
            .cast("long"))).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    binned.crossJoin(par)
      .select(col("bin"),
        round(col("__mn").cast("double") +
          col("bin").cast("double") * col("__h"), 6).as("lo"),
        round(col("__mn").cast("double") +
          (col("bin") + 1).cast("double") * col("__h"), 6).as("hi"),
        col("n"))
  }

  def keySkew(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    require(topK > 0, "keySkew needs topK > 0")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("__n"),
      count(lit(1)).as("__d"))
    counts.crossJoin(totals)
      .withColumn("share", col("cnt").cast("double") / col("__n").cast("double"))
      .withColumn("load_ratio",
        col("cnt").cast("double") * col("__d").cast("double")
          / col("__n").cast("double"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(topK)
      .select(col("key"), col("cnt"), col("share"), col("load_ratio"))
  }
}
