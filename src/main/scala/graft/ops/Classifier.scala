package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** On-engine quality-classifier training: logistic regression over
  * hashed-bigram presence features by full-batch gradient descent — the
  * fastText-style linear filter (Joulin et al. 2016) that CCNet-class
  * pipelines (Wenzek et al. 2020) train to score web text against a
  * high-quality target. Shares `Dsir.bigramBuckets`' 64-bucket md5
  * feature hash, so the generative (DSIR) and discriminative selectors
  * score the same feature space.
  *
  * Determinism (the oracle replays every iteration):
  *  - a doc's margin is an ORDERED fold (bucket-ascending, bias last,
  *    seed 0.0) over weight literals — bit-identical across engines;
  *  - the sigmoid is the only engine-dependent step (exp at 1 ulp), so
  *    each doc's gradient contribution is immediately quantized to an
  *    INTEGER nano-unit (round((p − y)·1e9), half-away both engines) and
  *    per-bucket gradients are integer sums — order-independent;
  *  - the weight update replays the same IEEE chain driver-side
  *    (w − rate·(g/1e9)/n, left-associated) that the oracle computes in
  *    SQL.
  *
  * Scale shape: the feature frame (id, y, sorted distinct buckets +
  * bias) builds with ONE distinct-shuffle and persists across
  * iterations; each iteration is one map-only margin/gradient pass +
  * one (buckets+1)-keyed partial-combining aggregation collected as
  * ≤ 65 rows (the k-means-fit contract — model-sized, not data-scaled).
  * Weights fold back in as array LITERALS (the IVF-centroid
  * discipline): zero model-table joins anywhere. */
object Classifier {

  /** Sorted-distinct hashed-bigram features + the bias index appended
    * last: (id, y, feats array<long>). Every doc has ≥ 1 feature (the
    * bias), so featureless short docs still train the intercept. */
  private def featureFrame(docs: DataFrame, idCol: String, textCol: String,
      labelPred: Column, buckets: Int): DataFrame = {
    val bg = Dsir.bigramBuckets(docs, idCol, textCol, labelPred, buckets)
    val feats = bg.groupBy(col(idCol))
      .agg(sort_array(collect_set(col("__b"))).as("__f"))
    docs.select(col(idCol), labelPred.cast("double").as("__y"))
      .join(feats, Seq(idCol), "left")
      .withColumn("__f", concat(
        coalesce(col("__f"), array().cast("array<long>")),
        array(lit(buckets.toLong))))
  }

  /** margin = fold(0.0, w[b] for b in feats ascending) — feats carry the
    * bias index last, so the intercept is the final addend. */
  private def marginCol(w: Array[Double]): Column = {
    val wLit = array(w.map(lit(_)): _*)
    aggregate(transform(col("__f"), b => get(wLit, b.cast("int"))),
      lit(0.0), (a, x) => a + x)
  }

  /** Full-batch GD fit → (bucket, weight), `buckets` feature weights +
    * the bias at index `buckets`. */
  def logregFit(docs: DataFrame, idCol: String, textCol: String,
      labelPred: Column, buckets: Int = 64, iters: Int = 3,
      rate: Double = 0.02): Seq[(Int, Double)] = {
    require(buckets > 0 && iters >= 0, s"bad buckets=$buckets iters=$iters")
    val base = featureFrame(docs, idCol, textCol, labelPred, buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = base.count()
    var w = Array.fill(buckets + 1)(0.0)
    for (_ <- 0 until iters) {
      val g9 = round(((lit(1.0) / (lit(1.0) + exp(-marginCol(w)))) - col("__y"))
        * lit(1e9)).cast("long")
      // one map-only pass + one (buckets+1)-keyed agg → ≤ 65-row collect
      val grads = base.select(g9.as("__g9"), explode(col("__f")).as("__b"))
        .groupBy(col("__b")).agg(sum(col("__g9")).as("__gs"))
        .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
      w = w.zipWithIndex.map { case (wv, b) =>
        wv - rate * (grads.getOrElse(b, 0L).toDouble / 1e9) / n
      }
    }
    base.unpersist()
    w.zipWithIndex.map { case (wv, b) => (b, wv) }.toSeq
  }

  /** Score every doc with a fitted weight vector: (id, margin, p, pred,
    * is_target). `margin` is engine-exact (ordered fold of literals);
    * `p` is the sigmoid rounded to 9 decimals (the ln/exp discipline);
    * `pred` thresholds the ROUNDED p so both engines decide alike. */
  def logregScore(docs: DataFrame, idCol: String, textCol: String,
      labelPred: Column, weights: Seq[(Int, Double)]): DataFrame = {
    val buckets = weights.length - 1
    val w = Array.ofDim[Double](weights.length)
    weights.foreach { case (b, wv) => w(b) = wv }
    val m = marginCol(w)
    featureFrame(docs, idCol, textCol, labelPred, buckets)
      .withColumn("margin", m)
      .withColumn("p", round(lit(1.0) / (lit(1.0) + exp(-col("margin"))), 9))
      .select(col(idCol), col("margin"), col("p"),
        (col("p") >= 0.5).as("pred"), (col("__y") === 1.0).as("is_target"))
  }

  /** Group-fairness audit over a scored classifier (Hardt et al. 2016
    * equalized odds; Feldman et al. 2015 disparate impact — the ML-
    * governance pass a production filter ships with): per protected
    * group, the selection rate (demographic parity), TPR and FPR, plus
    * the max−min selection-rate gap repeated on every row so the
    * headline number needs no second query. TPR/FPR are NULL for groups
    * with no positives/negatives rather than 0/0.
    *
    * Scale shape: ONE (group)-keyed aggregate over the scored frame
    * (confusion cells as conditional sums), then a group-table window
    * for the gap. Output: (group, n, sel_rate, tpr, fpr, dp_gap). */
  def fairnessAudit(df: DataFrame, groupCol: String, predCol: Column,
      truthCol: Column): DataFrame = {
    val g = df.select(col(groupCol).as("group"), predCol.as("__p"),
        truthCol.as("__y"))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__p"), 1L).otherwise(0L)).as("__np"),
        sum(when(col("__p") && col("__y"), 1L).otherwise(0L)).as("__tp"),
        sum(when(col("__p") && !col("__y"), 1L).otherwise(0L)).as("__fp"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__pos"))
    val sel = col("__np").cast("double") / col("n").cast("double")
    val dec = g.select(col("group"), col("n"),
      round(sel, 6).as("sel_rate"),
      round(when(col("__pos") > 0,
        col("__tp").cast("double") / col("__pos").cast("double")), 6)
        .as("tpr"),
      round(when(col("n") - col("__pos") > 0,
        col("__fp").cast("double") /
          (col("n") - col("__pos")).cast("double")), 6).as("fpr"),
      sel.as("__sel"))
    val w = Window.partitionBy()
    dec.select(col("group"), col("n"), col("sel_rate"), col("tpr"),
        col("fpr"),
        round(max(col("__sel")).over(w) - min(col("__sel")).over(w), 6)
          .as("dp_gap"))
  }

  /** Split-conformal prediction interval (Vovk et al. 2005; Lei et al.
    * 2018 — distribution-free coverage): fit a per-group mean predictor
    * on the TRAIN split, take q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest
    * absolute residual on the CALIBRATION split, and audit the
    * guaranteed ≥ 1−α coverage of μ̂_g ± q̂ on the TEST split. The
    * statistical wrapper any point predictor in the engine (group mean
    * here, logreg/trend elsewhere) needs before its predictions ship.
    *
    * Float discipline: μ̂_g = exact-DECIMAL train sum / count, cast to
    * double once; residuals are value-domain aggregated and q̂ is a
    * type-1 order statistic (min value whose cumulative count reaches
    * the rank) — no interpolation, no float sums.
    *
    * Scale shape: ONE group aggregate (train), residual passes join the
    * GROUP table back (AQE broadcast); q̂ comes from a value-domain
    * count + `Ranks.runningSums` over distinct residuals (no
    * single-partition stage — continuous residuals make the value table
    * fact-sized); coverage is a 1-row aggregate. Output:
    * (n_cal, n_test, qhat, coverage). */
  def conformalInterval(df: DataFrame, groupCol: String, valueCol: String,
      splitCol: Column, alpha: Double = 0.1): DataFrame = {
    // splitCol: 0 = train, 1 = calibration, 2 = test. The three split
    // filters re-evaluate splitCol on three independent scans, so a
    // rand()-based split would silently leak rows across train/cal/test
    // — enforced below, not just documented. The re-scan is deliberate:
    // each is one narrow column-pruned pass, cheaper than checkpointing
    // the full projection (the r8 checkpoint was the measured q361
    // bench regression).
    // check determinism on the ANALYZED expression, not the unresolved
    // one: expr("rand() < 0.5") parses to an UnresolvedFunction whose
    // default deterministic=true, so the unresolved check would wave a
    // SQL-string random split straight through
    require(df.select(splitCol).queryExecution.analyzed.expressions
        .forall(_.deterministic),
      "splitCol must be deterministic (hash/modulo of an id) — it is " +
        "re-evaluated per split scan; a rand()-based split would leak " +
        "rows across train/cal/test")
    val base = df.select(col(groupCol).as("__g"),
        col(valueCol).cast("decimal(18,6)").as("__y"), splitCol.as("__s"))
    val mu = base.filter(col("__s") === 0).groupBy(col("__g"))
      .agg((sum(col("__y")).cast("double") / count(lit(1)).cast("double"))
        .as("__mu"))
    def resid = abs(col("__y").cast("double") - col("__mu"))
    val cal = base.filter(col("__s") === 1).join(mu, "__g")
      .select(resid.as("__r"))
    val vc = cal.groupBy(col("__r")).agg(count(lit(1)).as("__c"))
    // n_cal folds into the same value-domain window pass (Σ counts over
    // the unbounded frame) — the previous separate count(cal) aggregate
    // recomputed the calibration join a second time per run
    // distributed prefix sum over the residual-value table (continuous
    // residuals make it fact-sized); n_cal rides along from the same
    // partials job as a literal — the old form ran BOTH a
    // single-partition cumulative window AND a whole-frame total window
    val run = Ranks.runningSums(vc, Seq("__c" -> "__cum"), None,
      col("__r"))
    val cum = run.df.withColumn("__tot", lit(run.totals("__c")))
    val qhat = cum
      .agg(max(col("__tot")).as("n_cal"),
        min(when(col("__cum") >=
          least(ceil((col("__tot") + 1).cast("double") * lit(1.0 - alpha))
            .cast("long"), col("__tot")), col("__r"))).as("__q"))
    val test = base.filter(col("__s") === 2).join(mu, "__g")
      .crossJoin(qhat.select(col("n_cal"), col("__q")))
      .agg(max(col("n_cal")).as("n_cal"), count(lit(1)).as("n_test"),
        round(max(col("__q")), 6).as("qhat"),
        round(sum(when(resid <= col("__q"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double"), 6).as("coverage"))
    test
  }

  /** Doubly-robust (AIPW) average treatment effect (Robins et al. 1994;
    * the estimator that is consistent if EITHER the propensity OR the
    * outcome model is right — the modern default over plain IPW):
    *   ψ_i = (m̂₁(i) − m̂₀(i)) + T(y − m̂₁)/p̂ − (1−T)(y − m̂₀)/(1−p̂)
    * averaged over all units, with p̂ clipped to the overlap band.
    * `m1Col`/`m0Col` carry the outcome-model predictions (per-stratum
    * rates in the gate — any model plugs in).
    *
    * Float discipline: per-unit ψ rounds to 9 dp and sums as DECIMAL;
    * output also reports the outcome-model-only (g-formula) estimate
    * for the robustness comparison. Output: 1 row
    * (n, ate_outcome_model, ate_aipw).
    *
    * Scale shape: map-only ψ arithmetic + ONE 1-row aggregate. */
  def aipwEffect(df: DataFrame, pCol: String, treatCol: Column,
      outcomeCol: Column, m1Col: Column, m0Col: Column,
      clipLo: Double = 0.05, clipHi: Double = 0.95): DataFrame = {
    val pc = least(greatest(col(pCol), lit(clipLo)), lit(clipHi))
    val t = treatCol.cast("double")
    val y = outcomeCol.cast("double")
    val psi = (m1Col - m0Col) +
      t * (y - m1Col) / pc -
      (lit(1.0) - t) * (y - m0Col) / (lit(1.0) - pc)
    def dec(c: Column) = round(c, 9).cast("decimal(28,9)")
    df.select(dec(psi).as("__psi"), dec(m1Col - m0Col).as("__dm"))
      .agg(count(lit(1)).as("n"),
        sum(col("__dm")).as("__sdm"), sum(col("__psi")).as("__sp"))
      .select(col("n"),
        round(col("__sdm").cast("double") / col("n").cast("double"), 6)
          .as("ate_outcome_model"),
        round(col("__sp").cast("double") / col("n").cast("double"), 6)
          .as("ate_aipw"))
  }

  /** Positivity / overlap audit of a propensity model (Crump et al.
    * 2009's trimming diagnostic): per treatment arm, the propensity
    * range and the share of units inside the [lo, hi] overlap region —
    * the check that decides whether the q356 IPW weights are usable at
    * all (an arm living outside the overlap band has units no
    * reweighting can represent). Output per arm:
    * (treated, n, p_min, p_max, overlap_share).
    *
    * Scale shape: ONE arm-keyed aggregate over the scored frame. */
  def propensityOverlap(scored: DataFrame, pCol: String, treatCol: Column,
      lo: Double = 0.1, hi: Double = 0.9): DataFrame =
    scored.select(treatCol.as("treated"), col(pCol).as("__p"))
      .groupBy(col("treated"))
      .agg(count(lit(1)).as("n"),
        round(min(col("__p")), 6).as("p_min"),
        round(max(col("__p")), 6).as("p_max"),
        round(sum(when(col("__p") >= lo && col("__p") <= hi, 1L)
            .otherwise(0L)).cast("double") / count(lit(1)).cast("double"), 6)
          .as("overlap_share"))

  /** Mondrian (group-conditional) split-conformal intervals (Vovk's
    * taxonomy-conformal): [[conformalInterval]] with q̂ computed PER
    * GROUP from that group's own calibration residuals — the guarantee
    * upgrades from marginal to per-group coverage, which is what a
    * fairness-aware deployment actually needs (the global q̂ of q361
    * can under-cover a high-variance group).
    *
    * Scale shape: the q361 shapes PER GROUP — value-domain residual
    * counts, then `Ranks.runningSumsBy` for the per-group cumulative
    * (continuous residuals make the (group, value) table fact-sized,
    * and the group domain is SMALL — a `Window.partitionBy(group)`
    * would put each group's whole residual domain on one task), a
    * per-group rank cut, one group-keyed coverage aggregate. Output per
    * group: (group, n_cal, n_test, qhat, coverage). */
  def mondrianConformal(df: DataFrame, groupCol: String, valueCol: String,
      splitCol: Column, alpha: Double = 0.1): DataFrame = {
    val base = df.select(col(groupCol).as("__g"),
        col(valueCol).cast("decimal(18,6)").as("__y"), splitCol.as("__s"))
      .localCheckpoint(false) // consumers: train agg + cal + test passes
    val mu = base.filter(col("__s") === 0).groupBy(col("__g"))
      .agg((sum(col("__y")).cast("double") / count(lit(1)).cast("double"))
        .as("__mu"))
    def resid = abs(col("__y").cast("double") - col("__mu"))
    val cal = base.filter(col("__s") === 1).join(mu, "__g")
      .select(col("__g"), resid.as("__r"))
    val vc = cal.groupBy(col("__g"), col("__r")).agg(count(lit(1)).as("__c"))
    val cum = Ranks.runningSumsBy(vc, Seq("__g"),
      Seq("__c" -> "__cum"), col("__r"))
    val nCal = cal.groupBy(col("__g")).agg(count(lit(1)).as("n_cal"))
    val qhat = cum.join(nCal, "__g")
      .groupBy(col("__g"))
      .agg(max(col("n_cal")).as("n_cal"),
        min(when(col("__cum") >=
          least(ceil((col("n_cal") + 1).cast("double") * lit(1.0 - alpha))
            .cast("long"), col("n_cal")), col("__r"))).as("__q"))
    base.filter(col("__s") === 2).join(mu, "__g").join(qhat, "__g")
      .groupBy(col("__g").as("group"))
      .agg(max(col("n_cal")).as("n_cal"), count(lit(1)).as("n_test"),
        round(max(col("__q")), 6).as("qhat"),
        round(sum(when(resid <= col("__q"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double"), 6).as("coverage"))
  }

  /** Expected Calibration Error (Guo et al. 2017 — the scalar the
    * reliability diagram (q216) rolls up to): over ten fixed-width
    * probability bins, ECE = Σ_b (n_b/n)·|acc_b − conf_b|, with conf_b
    * the bin's exact-DECIMAL mean 9-dp probability and acc_b its
    * observed positive rate. Per-bin terms round to 9 dp and sum as
    * DECIMAL. Output: 1 row (n, n_bins, ece). */
  def expectedCalibrationError(scored: DataFrame, pCol: String,
      truthCol: Column): DataFrame = {
    val bins = scored.select(
        least(floor(col(pCol) * 10).cast("int"), lit(9)).as("__b"),
        col(pCol).cast("decimal(10,9)").as("__p"),
        truthCol.as("__y"))
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("__n"), sum(col("__p")).as("__sp"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__k"))
    def d(c: Column) = c.cast("double")
    val tot = bins.agg(sum(col("__n")).as("__nt"))
    bins.crossJoin(tot)
      .select(col("__nt"),
        round((d(col("__n")) / d(col("__nt"))) *
          abs(d(col("__k")) / d(col("__n")) - d(col("__sp")) / d(col("__n"))),
          9).cast("decimal(18,9)").as("__t"))
      .groupBy(col("__nt").as("n"))
      .agg(count(lit(1)).as("n_bins"),
        round(sum(col("__t")).cast("double"), 6).as("ece"))
  }

  /** Murphy decomposition of the (binned) Brier score (Murphy 1973 —
    * the standard forecast-quality breakdown every calibration audit
    * pairs with ECE): over 10 fixed-width probability bins,
    *   reliability = Σ n_b·(p̄_b − ȳ_b)² / N   (miscalibration — bad),
    *   resolution  = Σ n_b·(ȳ_b − ȳ)² / N     (discrimination — good),
    *   uncertainty = ȳ·(1 − ȳ)                (irreducible base rate),
    * and the binned Brier identity REL − RES + UNC. Distinguishes a
    * model that is miscalibrated-but-discriminating from one that is
    * calibrated-but-uninformative — ECE alone cannot.
    *
    * Float discipline: p is 9-dp fixed (logregScore), bin means divide
    * exact decimal sums, per-bin squared terms round to 9 dp and sum as
    * DECIMAL. Output: 1 row (n, n_bins, reliability, resolution,
    * uncertainty, brier_binned ← round 6).
    *
    * Scale shape: ONE partial-combining 10-bin aggregate over the
    * scored frame; everything after runs on ≤10 rows. */
  def brierDecomposition(scored: DataFrame, pCol: String,
      truthCol: Column): DataFrame = {
    val bins = scored.select(
        least(floor(col(pCol) * 10).cast("int"), lit(9)).as("__b"),
        col(pCol).cast("decimal(10,9)").as("__p"),
        truthCol.as("__y"))
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("__n"), sum(col("__p")).as("__sp"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__k"))
    def d(c: Column) = c.cast("double")
    val tot = bins.agg(sum(col("__n")).as("__nt"), sum(col("__k")).as("__kt"))
    val pbar = d(col("__sp")) / d(col("__n"))
    val ybarB = d(col("__k")) / d(col("__n"))
    val ybar = d(col("__kt")) / d(col("__nt"))
    val raw = bins.crossJoin(tot)
      .select(col("__nt"), col("__kt"),
        round(d(col("__n")) * (pbar - ybarB) * (pbar - ybarB), 9)
          .cast("decimal(28,9)").as("__rel"),
        round(d(col("__n")) * (ybarB - ybar) * (ybarB - ybar), 9)
          .cast("decimal(28,9)").as("__res"))
      .groupBy(col("__nt"), col("__kt"))
      .agg(count(lit(1)).as("n_bins"),
        (sum(col("__rel")).cast("double") / d(col("__nt"))).as("__relR"),
        (sum(col("__res")).cast("double") / d(col("__nt"))).as("__resR"))
      .withColumn("__uncR", ybar * (lit(1.0) - ybar))
    raw.select(col("__nt").as("n"), col("n_bins"),
      round(col("__relR"), 6).as("reliability"),
      round(col("__resR"), 6).as("resolution"),
      round(col("__uncR"), 6).as("uncertainty"),
      round(col("__relR") - col("__resR") + col("__uncR"), 6)
        .as("brier_binned"))
  }

  /** Inverse-propensity-weighted (Hájek-normalized) average treatment
    * effect (Horvitz–Thompson/Hájek estimators; Rosenbaum & Rubin 1983
    * propensity framework): over a frame carrying a 9-dp propensity
    * `pCol` = P(treated | X), a treatment indicator and an outcome,
    *   ATE = Σ(T·Y/p̂)/Σ(T/p̂) − Σ((1−T)·Y/(1−p̂))/Σ((1−T)/(1−p̂))
    * with p̂ clipped to [clipLo, clipHi] (the standard overlap guard —
    * an unclipped p̂ near 0/1 gives one row unbounded weight).
    *
    * Float discipline: p is already 9-dp fixed (logregScore), weights
    * and weighted outcomes round to 9 dp and sum as DECIMAL, so both
    * sides of the difference are partition-order-free; the two Hájek
    * quotients and their difference run in doubles, rounded 6.
    *
    * Scale shape: map-only weight arithmetic + ONE 1-row aggregate.
    * Output: (n, n_treat, mean_y_treat, mean_y_ctrl, ate). */
  def ipwEffect(df: DataFrame, pCol: String, treatCol: Column,
      outcomeCol: Column, clipLo: Double = 0.05,
      clipHi: Double = 0.95): DataFrame = {
    val pc = least(greatest(col(pCol), lit(clipLo)), lit(clipHi))
    val t = treatCol.cast("double")
    val y = outcomeCol.cast("double")
    val w1 = t / pc
    val w0 = (lit(1.0) - t) / (lit(1.0) - pc)
    def dec(c: Column) = round(c, 9).cast("decimal(28,9)")
    df.select(treatCol.as("__t"),
        dec(w1 * y).as("__wy1"), dec(w1).as("__w1"),
        dec(w0 * y).as("__wy0"), dec(w0).as("__w0"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("n_treat"),
        sum(col("__wy1")).as("__sy1"), sum(col("__w1")).as("__sw1"),
        sum(col("__wy0")).as("__sy0"), sum(col("__w0")).as("__sw0"))
      .select({
        val m1 = col("__sy1").cast("double") / col("__sw1").cast("double")
        val m0 = col("__sy0").cast("double") / col("__sw0").cast("double")
        Seq(col("n"), col("n_treat"),
          round(m1, 6).as("mean_y_treat"), round(m0, 6).as("mean_y_ctrl"),
          round(m1 - m0, 6).as("ate"))
      }: _*)
  }

  /** Reliability diagram over a scored frame with 9-dp probability `p`
    * and boolean `is_target`: ten fixed-width bins (the fixed-point p
    * makes the floor(p·10) boundary arithmetic engine-exact), per bin
    * the count, exact mean predicted probability (DECIMAL sum) and the
    * observed positive rate. One bin-keyed aggregate. */
  def calibrationCurve(scored: DataFrame, pCol: String,
      targetCol: String): DataFrame = {
    scored
      .withColumn("bin", least(floor(col(pCol) * 10).cast("int"), lit(9)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(sum(col(pCol).cast("decimal(10,9)")).cast("double") /
          count(lit(1)), 6).as("mean_p"),
        sum(when(col(targetCol), 1L).otherwise(0L)).as("n_pos"))
      .withColumn("frac_pos",
        round(col("n_pos").cast("double") / col("n").cast("double"), 6))
  }

  /** Isotonic calibration by pool-adjacent-violators over the binned
    * reliability table (Zadrozny & Elkan 2002; Robertson's PAV): fixed-
    * width probability bins, then the least-squares monotone
    * (non-decreasing) fit of the per-bin positive rate — the
    * non-parametric alternative to q216/q382's diagnostic curves when
    * the scores must actually be REMAPPED.
    *
    * PAV runs on the ≤`bins`-row binned table on the driver (bounded —
    * the same contract as the logreg fit's per-iteration collect), with
    * EXACT integer cross-multiplied violation tests (k₁n₂ > k₂n₁ — no
    * float enters the pooling decisions); pooled rates divide exact
    * integer sums once, round-6. A SQL oracle replays the fit through
    * the min-max identity ŷᵢ = max_{j≤i} min_{k≥i} avg(j..k) over the
    * same integer prefix sums — pool bounds select identical sums, so
    * the doubles agree bit-for-bit.
    *
    * Scale shape: ONE partial-combining bin aggregate over the scored
    * frame; everything after is ≤`bins` rows. Output per non-empty
    * bin: (bin, n, rate_raw, rate_iso). */
  def isotonicCalibrate(scored: DataFrame, pCol: String, truthCol: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 4096, s"bins in [2, 4096], got $bins")
    val spark = scored.sparkSession
    // null p/truth rows drop (the sibling ops' null discipline): a null
    // p would otherwise produce a null bin group — getInt NPEs on the
    // driver — and a null truth would silently count as a negative
    val g = scored
      .filter(col(pCol).isNotNull && truthCol.isNotNull)
      .select(
        least(floor(col(pCol) * bins).cast("int"), lit(bins - 1)).as("bin"),
        truthCol.as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__k"))
      .orderBy(col("bin"))
      .collect() // ≤ bins rows — bounded by the bin-count literal
    // PAV: pools carry exact (Σk, Σn, span); merge while the previous
    // pool's rate exceeds the current's (integer cross-multiply)
    val pools = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    g.foreach { r =>
      var cur = (r.getLong(2), r.getLong(1), 1)
      while (pools.nonEmpty &&
        pools.last._1 * cur._2 > cur._1 * pools.last._2) {
        val p = pools.remove(pools.length - 1)
        cur = (p._1 + cur._1, p._2 + cur._2, p._3 + cur._3)
      }
      pools += cur
    }
    val iso = pools.flatMap { case (k, n, span) =>
      Seq.fill(span)(k.toDouble / n.toDouble)
    }
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("bin", IntegerType, false),
      StructField("n", LongType, false),
      StructField("rate_raw", DoubleType, false),
      StructField("rate_iso", DoubleType, false)))
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    g.zip(iso).foreach { case (r, y) =>
      rows.add(Row(r.getInt(0), r.getLong(1),
        BigDecimal(r.getLong(2).toDouble / r.getLong(1).toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(y).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    spark.createDataFrame(rows, schema)
  }

  /** McNemar's test (1947) for PAIRED classifier comparison — the
    * right test when two classifiers score the SAME items (accuracy
    * deltas ignore the pairing and waste power): only the discordant
    * cells matter,
    *
    *   χ² = (|b − c| − 1)² / (b + c)   (continuity-corrected)
    *
    * with b = items only A got right, c = only B. NULL χ² when the
    * classifiers never disagree (b + c = 0). ONE partial-combining
    * aggregate over the scored frame. Output, 1 row: (n, both_right,
    * both_wrong, only_a, only_b, chi2). */
  def mcnemar(df: DataFrame, truthCol: Column, predA: Column,
      predB: Column): DataFrame = {
    def d(c: Column) = c.cast("double")
    val t = df.select((predA === truthCol).as("__a"),
      (predB === truthCol).as("__b"))
    val agg = t.agg(count(lit(1)).as("n"),
      sum(when(col("__a") && col("__b"), 1L).otherwise(0L)).as("both_right"),
      sum(when(!col("__a") && !col("__b"), 1L).otherwise(0L)).as("both_wrong"),
      sum(when(col("__a") && !col("__b"), 1L).otherwise(0L)).as("only_a"),
      sum(when(!col("__a") && col("__b"), 1L).otherwise(0L)).as("only_b"))
    agg.withColumn("chi2",
      when(col("only_a") + col("only_b") > 0, round(
        (abs(d(col("only_a")) - d(col("only_b"))) - 1.0) *
          (abs(d(col("only_a")) - d(col("only_b"))) - 1.0) /
          (d(col("only_a")) + d(col("only_b"))), 6)))
  }

  /** Cochran's Q (1950) — the k-classifier generalization of McNemar:
    * do k paired classifiers have the same accuracy? With C_j = per-
    * classifier correct counts, R_i = per-ITEM correct counts, N = ΣC,
    *
    *   Q = (k−1)(k·ΣC_j² − N²) / (k·N − ΣR_i²)  ~ χ²(k−1)
    *
    * Because each row IS one item, R_i is a map-side row expression —
    * the whole statistic is ONE partial-combining aggregate over the
    * scored frame, no shuffle beyond it. NULL when the denominator
    * degenerates (all items all-right or all-wrong). Output, 1 row:
    * (k, n_items, q, df). */
  def cochranQ(df: DataFrame, truthCol: Column,
      preds: Seq[Column]): DataFrame = {
    require(preds.size >= 2, s"cochranQ needs >= 2 classifiers, got ${preds.size}")
    val k = preds.size
    def d(c: Column) = c.cast("double")
    val corr = preds.zipWithIndex.map { case (p, i) =>
      when(p === truthCol, 1L).otherwise(0L).as(s"__c$i") }
    val t = df.select(corr: _*)
      .withColumn("__r", preds.indices.map(i => col(s"__c$i")).reduce(_ + _))
    val aggs = Seq(count(lit(1)).as("n_items"),
      sum(col("__r")).as("__N"), sum(col("__r") * col("__r")).as("__R2")) ++
      preds.indices.map(i => sum(col(s"__c$i")).as(s"__C$i"))
    val a = t.agg(aggs.head, aggs.tail: _*)
    val sumC2 = preds.indices.map(i => d(col(s"__C$i")) * d(col(s"__C$i")))
      .reduce(_ + _)
    val den = lit(k.toDouble) * d(col("__N")) - d(col("__R2"))
    a.select(lit(k).as("k"), col("n_items"),
      when(den > 0, round(lit((k - 1).toDouble) *
        (lit(k.toDouble) * sumC2 - d(col("__N")) * d(col("__N"))) / den, 6))
        .as("q"),
      lit(k - 1).as("df"))
  }

  /** Confusion-matrix counts for a (truth, prediction) pair of label
    * columns: one partial-combining aggregate. */
  def confusion(df: DataFrame, truthCol: String, predCol: String): DataFrame =
    df.groupBy(col(truthCol).as("truth"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n"))

  /** Per-class precision / recall / F1 from the confusion counts.
    * F1 uses the algebraic identity 2PR/(P+R) = 2·tp/(n_pred+n_true),
    * so it never composes the two already-rounded ratios. Classes that
    * appear only in truth or only in prediction still get a row (full
    * outer marginal join); undefined ratios are NULL, not 0/0.
    * Output: (clazz, n_true, n_pred, tp, precision, recall, f1). */
  def perClassF1(df: DataFrame, truthCol: String, predCol: String): DataFrame = {
    val ct = confusion(df, truthCol, predCol).localCheckpoint(false)
    val rt = ct.groupBy(col("truth").as("clazz")).agg(sum(col("n")).as("n_true"))
    val pt = ct.groupBy(col("pred").as("clazz")).agg(sum(col("n")).as("n_pred"))
    val tp = ct.filter(col("truth") === col("pred"))
      .select(col("truth").as("clazz"), col("n").as("tp"))
    rt.join(pt, Seq("clazz"), "full_outer").join(tp, Seq("clazz"), "left")
      .select(col("clazz"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("precision", when(col("n_pred") > 0,
        round(col("tp").cast("double") / col("n_pred").cast("double"), 6)))
      .withColumn("recall", when(col("n_true") > 0,
        round(col("tp").cast("double") / col("n_true").cast("double"), 6)))
      .withColumn("f1", when(col("n_pred") + col("n_true") > 0,
        round(lit(2.0) * col("tp").cast("double") /
          (col("n_pred") + col("n_true")).cast("double"), 6)))
  }

  /** Cohen's kappa between two label columns: κ = (p_o − p_e)/(1 − p_e)
    * with p_o the observed agreement and p_e the chance agreement from
    * the marginals. All counts integer; marginal products go through
    * DECIMAL(38,0) so a billion-row class cannot overflow int64; the
    * three ratio divisions run once on the driver-sized 1-row frame.
    * Output: (n, po, pe, kappa), each rounded to 6. */
  def cohenKappa(df: DataFrame, truthCol: String, predCol: String): DataFrame = {
    val ct = confusion(df, truthCol, predCol).localCheckpoint(false)
    val rt = ct.groupBy(col("truth").as("c")).agg(sum(col("n")).as("__rt"))
    val cmt = ct.groupBy(col("pred").as("c")).agg(sum(col("n")).as("__ct"))
    val pe = rt.join(cmt, Seq("c"))
      .agg(coalesce(sum((col("__rt") * col("__ct")).cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("__spe"))
    val tr = ct.filter(col("truth") === col("pred"))
      .agg(coalesce(sum(col("n")), lit(0L)).as("__tr"))
    val tot = ct.agg(sum(col("n")).as("__n"))
    val nD = col("__n").cast("double")
    val poRaw = col("__tr").cast("double") / nD
    val peRaw = col("__spe").cast("double") / (nD * nD)
    tot.crossJoin(tr).crossJoin(pe)
      .select(col("__n").as("n"),
        round(poRaw, 6).as("po"),
        round(peRaw, 6).as("pe"),
        round((poRaw - peRaw) / (lit(1.0) - peRaw), 6).as("kappa"))
  }

  /** Matthews correlation coefficient + balanced accuracy of a binary
    * prediction against a binary truth — the chance-robust 1-number
    * classifier summaries next to [[cohenKappa]] (MCC is Pearson's φ
    * on the 2×2 table, symmetric in classes; balanced accuracy
    * averages the two class recalls, so a majority-class predictor
    * scores 0.5, not the base rate — the imbalanced-gate headline).
    *
    * Float discipline: the four cells are exact longs from ONE
    * conditional aggregate; the 1-row final expression multiplies the
    * cross-products and the four marginal sqrts in one FIXED order the
    * oracle replays literally (a DECIMAL product of four 10⁹-scale
    * marginals would overflow 38 digits — the sqrt composition is
    * inherently double, and it runs once). NULL mcc when any marginal
    * is zero (undefined φ); NULL balanced_acc when a truth class is
    * empty. Scale shape: ONE partial-combining aggregate, nothing else
    * moves. Output, 1 row: (tp, fp, fn, tn, mcc, balanced_acc ← r6). */
  def mcc(df: DataFrame, predCol: Column, truthCol: Column): DataFrame = {
    val pts = df.select(predCol.as("__p"), truthCol.as("__t"))
      .filter(col("__p").isNotNull && col("__t").isNotNull)
    val agg = pts.agg(
      coalesce(sum(when(col("__p") && col("__t"), 1L).otherwise(0L)), lit(0L)).as("tp"),
      coalesce(sum(when(col("__p") && !col("__t"), 1L).otherwise(0L)), lit(0L)).as("fp"),
      coalesce(sum(when(!col("__p") && col("__t"), 1L).otherwise(0L)), lit(0L)).as("fn"),
      coalesce(sum(when(!col("__p") && !col("__t"), 1L).otherwise(0L)), lit(0L)).as("tn"))
    def d(c: String) = col(c).cast("double")
    val denom = sqrt((col("tp") + col("fp")).cast("double")) *
      sqrt((col("tp") + col("fn")).cast("double")) *
      sqrt((col("tn") + col("fp")).cast("double")) *
      sqrt((col("tn") + col("fn")).cast("double"))
    agg.select(col("tp"), col("fp"), col("fn"), col("tn"),
      when(col("tp") + col("fp") > 0 && col("tp") + col("fn") > 0 &&
          col("tn") + col("fp") > 0 && col("tn") + col("fn") > 0,
        round((d("tp") * d("tn") - d("fp") * d("fn")) / denom, 6)).as("mcc"),
      when(col("tp") + col("fn") > 0 && col("tn") + col("fp") > 0,
        round((d("tp") / (d("tp") + d("fn")) +
          d("tn") / (d("tn") + d("fp"))) / lit(2.0), 6)).as("balanced_acc"))
  }

  /** Empirical-Bayes shrinkage of per-key success rates toward a
    * beta-binomial prior fit by method of moments on the observed
    * per-key rates (m = mean, v = population variance):
    *   s = m(1−m)/v − 1,  α = m·s,  shrunk_k = (x_k + α) / (n_k + s)
    * — the standard small-sample CTR/quality-rate stabilizer: keys with
    * few trials pull hard toward the global mean, high-volume keys keep
    * their own rate. Moment terms are 9-dp fixed point summed as
    * DECIMAL; the prior solves once on the 1-row moment aggregate, and
    * the one double shrink expression is mirrored per key. Degenerate
    * prior (v = 0 or s ≤ 0) falls back to the raw rate.
    *
    * Scale shape: ONE key-partial-combining (n, x) aggregate over the
    * fact; moments are a second aggregate over the KEY table; the prior
    * broadcasts as a 1-row crossJoin. Output per key:
    * (key, n, x, rate, shrunk). */
  /** Exact ROC-AUC of a score against a binary label via the
    * Mann–Whitney rank statistic with midrank tie handling:
    *   AUC = (Σ_pos avgrank − P(P+1)/2) / (P·N⁻)
    * computed entirely in INTEGERS until one final double division:
    * per distinct score value, 2·avgrank = 2·cnt_lt + n_v + 1, and
    * S2 = Σ_v np_v·(2·avgrank) accumulates as DECIMAL(38,0) —
    * bit-identical on any engine, no per-row rank join.
    *
    * Scale shape: ONE (score) partial-combining aggregate over the
    * fact, then `Ranks.runningSums` over the SCORE-VALUE table (no
    * single-partition stage even when continuous scores make the value
    * table fact-sized), one 1-row aggregate. Output: (n_pos, n_neg,
    * auc — NULL if a class is empty). */
  def rocAuc(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val sv = df.select(scoreCol.as("__s"), labelCol.cast("int").as("__y"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__np"))
    // distributed prefix sum over the score-value table (continuous
    // scores make the value table fact-sized — no single-partition
    // Window.orderBy here, the q209-class hatch instead)
    val cum = Ranks.runningSums(sv, Seq("__n" -> "__cle"), None,
      col("__s")).df
    val s2term = col("__np") *
      (lit(2L) * (col("__cle") - col("__n")) + col("__n") + lit(1L))
    val agg = cum.agg(
      sum(col("__np")).as("__P"), sum(col("__n")).as("__T"),
      sum(s2term.cast("decimal(38,0)")).as("__S2"))
    def d(c: String) = col(c).cast("double")
    val nNeg = col("__T") - col("__P")
    agg.select(col("__P").as("n_pos"), nNeg.as("n_neg"),
      when(col("__P") > 0 && nNeg > 0,
        round((d("__S2") - d("__P") * (d("__P") + lit(1.0))) /
          (lit(2.0) * d("__P") * nNeg.cast("double")), 6)).as("auc"))
  }

  /** Average precision (step-wise PR-AUC, the scikit
    * `average_precision_score` convention): AP = Σ_t (R_t − R_{t−1})·P_t
    * over distinct score thresholds in DESCENDING order, ties grouped
    * at their threshold. The whole sum reduces to score-domain algebra
    * on the DESCENDING cumulative table — at threshold s,
    * TP(s) = cum_pos(≥s) and predicted-positives PP(s) = cum(≥s), and
    * ΔR(s) = np(s)/P — so AP = (Σ_s np(s)·TP(s)/PP(s)) / P with no lag
    * column and no totals join: ONE partial-combining (score) count,
    * the [[Ranks.runningSums]] prefix hatch ordered by −score, one
    * scalar aggregate (the [[rocAuc]] shape — continuous scores make
    * the value table fact-sized, so no single-partition window).
    *
    * Terms are round-9 fixed point summed as DECIMAL(28,9); the single
    * division by P runs once, round-6. Output, 1 row:
    * (n_pos, n_neg, pr_auc); NULL pr_auc when no positives. */
  def prAuc(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val sv = df.select(scoreCol.as("__s"), labelCol.cast("int").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"), sum(col("__y").cast("long")).as("__np"))
    // descending-threshold cumulatives: order the hatch by −score
    val cum = Ranks.runningSums(sv,
      Seq("__n" -> "__ppge", "__np" -> "__tpge"), None,
      negate(col("__s"))).df
    def d(c: String) = col(c).cast("double")
    val term = d("__np") * (d("__tpge") / d("__ppge"))
    val agg = cum.agg(
      sum(col("__np")).as("__P"), sum(col("__n")).as("__T"),
      sum(round(term, 9).cast("decimal(28,9)")).as("__S"))
    val nNeg = col("__T") - col("__P")
    agg.select(col("__P").as("n_pos"), nNeg.as("n_neg"),
      when(col("__P") > 0,
        round(col("__S").cast("double") / d("__P"), 6)).as("pr_auc"))
  }

  /** Mantel–Haenszel pooled odds ratio + Cochran–Mantel–Haenszel χ²
    * (Mantel & Haenszel 1959) over per-stratum 2×2 tables — "is the
    * exposure↔outcome association real once the stratifier is held
    * fixed?", the confounding-aware cousin of [[mcnemar]] and the
    * engine's Simpson's-paradox guard (q322 shows the paradox; this
    * pools it away):
    *
    *   OR_MH = Σ_i(a_i·d_i/n_i) / Σ_i(b_i·c_i/n_i),
    *   χ²_CMH = (Σa_i − ΣE[a_i])² / ΣVar[a_i]   (no continuity corr.),
    *   E[a] = (a+b)(a+c)/n,  Var[a] = (a+b)(c+d)(a+c)(b+d)/(n²(n−1)).
    *
    * Null exposure/outcome/stratum rows drop; single-row strata
    * contribute 0 variance (n−1 = 0 — the standard convention). All
    * per-stratum rationals are round-9 fixed point summed as DECIMAL;
    * the two final divisions run once, round-6.
    *
    * Scale shape: ONE partial-combining stratum aggregate over the
    * fact (each 2×2 cell is a conditional sum), then strata-sized
    * arithmetic. Output, 1 row: (n_strata, n_rows, or_mh, cmh_chi2);
    * NULLs on degenerate denominators. */
  def mantelHaenszel(df: DataFrame, exposure: Column, outcome: Column,
      strataCol: Column): DataFrame = {
    val cells = df
      .select(strataCol.as("__st"), exposure.as("__e"), outcome.as("__o"))
      .filter(col("__st").isNotNull && col("__e").isNotNull &&
        col("__o").isNotNull)
      .groupBy(col("__st"))
      .agg(sum(when(col("__e") && col("__o"), 1L).otherwise(0L)).as("__a"),
        sum(when(col("__e") && !col("__o"), 1L).otherwise(0L)).as("__b"),
        sum(when(!col("__e") && col("__o"), 1L).otherwise(0L)).as("__c"),
        sum(when(!col("__e") && !col("__o"), 1L).otherwise(0L)).as("__d"))
    def d(c: String) = col(c).cast("double")
    val n = d("__a") + d("__b") + d("__c") + d("__d")
    def dec9(c: Column) = round(c, 9).cast("decimal(28,9)")
    val terms = cells.select(
      (col("__a") + col("__b") + col("__c") + col("__d")).as("__nr"),
      col("__a"),
      dec9(d("__a") * d("__d") / n).as("__rr"),
      dec9(d("__b") * d("__c") / n).as("__ss"),
      dec9((d("__a") + d("__b")) * (d("__a") + d("__c")) / n).as("__ea"),
      dec9(when(n > 1,
        (d("__a") + d("__b")) * (d("__c") + d("__d")) *
          (d("__a") + d("__c")) * (d("__b") + d("__d")) /
          (n * n * (n - 1))).otherwise(lit(0.0))).as("__va"))
    val agg = terms.agg(count(lit(1)).as("n_strata"),
      sum(col("__nr")).cast("long").as("n_rows"),
      sum(col("__a")).as("__sa"),
      sum(col("__rr")).as("__srr"), sum(col("__ss")).as("__sss"),
      sum(col("__ea")).as("__sea"), sum(col("__va")).as("__sva"))
    def dd(c: String) = col(c).cast("double")
    val dev = dd("__sa") - dd("__sea")
    agg.select(col("n_strata"), col("n_rows"),
      when(col("__sss").cast("double") > 0,
        round(dd("__srr") / dd("__sss"), 6)).as("or_mh"),
      when(col("__sva").cast("double") > 0,
        round(dev * dev / dd("__sva"), 6)).as("cmh_chi2"))
  }

  def ebShrinkRates(df: DataFrame, keyCol: String, successCol: Column): DataFrame = {
    val perKey = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"),
        sum(successCol.cast("long")).as("x"))
      .localCheckpoint(false) // 2 consumers: the moment fit + the shrink pass
    val r = col("x").cast("double") / col("n").cast("double")
    val moments = perKey
      .select(round(r, 9).cast("decimal(18,9)").as("__t1"),
        round(r * r, 9).cast("decimal(18,9)").as("__t2"))
      .agg(count(lit(1)).as("__k"),
        sum(col("__t1")).as("__s1"), sum(col("__t2")).as("__s2"))
    def d(c: String) = col(c).cast("double")
    val m = d("__s1") / d("__k")
    val v = d("__s2") / d("__k") - m * m
    val s = m * (lit(1.0) - m) / v - lit(1.0)
    perKey.crossJoin(moments)
      .select(col("key"), col("n"), col("x"),
        round(r, 6).as("rate"),
        round(when(col("__k") >= 2 && v > 0.0 && s > 0.0,
            (col("x").cast("double") + m * s) / (col("n").cast("double") + s))
          .otherwise(r), 6).as("shrunk"))
  }

  /** Wilson score interval per group (Wilson 1927): the proportion CI
    * that behaves at the edges the Wald interval breaks on — x = 0 or
    * x = n gives a non-degenerate interval inside [0, 1], and small-n
    * groups get honestly wide bounds (the release-dashboard companion
    * to [[ebShrinkRates]]'s point shrinkage):
    *
    *   (p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)
    *
    * `z` is a plan-time double literal (default 1.959964 ≈ 97.5 %
    * two-sided) that the oracle replays as the same decimal text —
    * no engine-side quantile function. ONE group-keyed conditional
    * aggregate; the interval algebra runs once per GROUP row in a
    * fixed composition order. Output per group:
    * (group, n, x, rate, ci_lo, ci_hi ← round 6). */
  def wilsonCi(df: DataFrame, groupCol: String, successCol: Column,
      z: Double = 1.959964): DataFrame = {
    require(z > 0, s"z must be > 0, got $z")
    val g = df.select(col(groupCol).as("group"), successCol.as("__s"))
      .filter(col("__s").isNotNull)
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__s"), 1L).otherwise(0L)).as("x"))
    def d(c: String) = col(c).cast("double")
    val p = d("x") / d("n")
    val z2 = z * z
    val denom = lit(1.0) + lit(z2) / d("n")
    val center = p + lit(z2) / (lit(2.0) * d("n"))
    val half = lit(z) * sqrt(p * (lit(1.0) - p) / d("n") +
      lit(z2) / (lit(4.0) * d("n") * d("n")))
    g.select(col("group"), col("n"), col("x"),
      round(p, 6).as("rate"),
      round((center - half) / denom, 6).as("ci_lo"),
      round((center + half) / denom, 6).as("ci_hi"))
  }

  /** The unstratified 2×2 risk readout — [[mantelHaenszel]]'s
    * single-table sibling for when there is no confounder to adjust:
    * exposure × outcome cells (a, b, c, d), the two risks, the risk
    * ratio, the odds ratio with its log-normal Woolf CI
    * (exp(ln OR ± z·√(1/a+1/b+1/c+1/d))), and Cohen's h effect size
    * (2·asin√p₁ − 2·asin√p₂ — the arcsine-stabilized difference power
    * analyses for proportions are computed in).
    *
    * Conventions: the ratio family is NULL when its denominators
    * degenerate (a zero cell kills the OR CI; a zero unexposed risk
    * kills the RR) — reported as NULL, not ±inf; h is defined whenever
    * both rows are non-empty. `z` is a plan-time decimal literal (the
    * [[wilsonCi]] convention). ONE conditional aggregate, 1-row
    * algebra. Output: (a, b, c, d, risk_exposed, risk_unexposed,
    * risk_ratio, odds_ratio, or_ci_lo, or_ci_hi, cohens_h ← r6). */
  def riskTable(df: DataFrame, exposure: Column, outcome: Column,
      z: Double = 1.959964): DataFrame = {
    require(z > 0, s"z must be > 0, got $z")
    val pts = df.select(exposure.as("__e"), outcome.as("__o"))
      .filter(col("__e").isNotNull && col("__o").isNotNull)
    val agg = pts.agg(
      coalesce(sum(when(col("__e") && col("__o"), 1L).otherwise(0L)), lit(0L)).as("a"),
      coalesce(sum(when(col("__e") && !col("__o"), 1L).otherwise(0L)), lit(0L)).as("b"),
      coalesce(sum(when(!col("__e") && col("__o"), 1L).otherwise(0L)), lit(0L)).as("c"),
      coalesce(sum(when(!col("__e") && !col("__o"), 1L).otherwise(0L)), lit(0L)).as("d"))
    def dd(c: String) = col(c).cast("double")
    val r1 = dd("a") / (dd("a") + dd("b"))
    val r2 = dd("c") / (dd("c") + dd("d"))
    val orv = (dd("a") * dd("d")) / (dd("b") * dd("c"))
    val se = sqrt(lit(1.0) / dd("a") + lit(1.0) / dd("b") +
      lit(1.0) / dd("c") + lit(1.0) / dd("d"))
    val allPos = col("a") > 0 && col("b") > 0 && col("c") > 0 && col("d") > 0
    val rowsOk = col("a") + col("b") > 0 && col("c") + col("d") > 0
    agg.select(col("a"), col("b"), col("c"), col("d"),
      when(col("a") + col("b") > 0, round(r1, 6)).as("risk_exposed"),
      when(col("c") + col("d") > 0, round(r2, 6)).as("risk_unexposed"),
      when(rowsOk && r2 > 0, round(r1 / r2, 6)).as("risk_ratio"),
      when(allPos, round(orv, 6)).as("odds_ratio"),
      when(allPos, round(exp(log(orv) - lit(z) * se), 6)).as("or_ci_lo"),
      when(allPos, round(exp(log(orv) + lit(z) * se), 6)).as("or_ci_hi"),
      when(rowsOk, round(lit(2.0) * asin(sqrt(r1)) -
        lit(2.0) * asin(sqrt(r2)), 6)).as("cohens_h"))
  }
}
