package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-entity trailing-window features over an event log — the classic
  * feature-engineering shape ("events in the last hour", "spend in the
  * last 24 h") that feeds fraud/quality models and rate limiting.
  *
  * Scale shape: ONE shuffle on the (uniform) entity key, then one sort
  * per partition; the RANGE frame is computed with a sliding two-pointer
  * pass over each entity's sorted events, so cost is O(events) after the
  * sort regardless of window width. Events at the exact same instant are
  * frame PEERS (both included) — deterministic under any partitioning.
  * The window is anchored on epoch MICROseconds (exact integers; no
  * engine-specific timestamp-truncation edge). */
object TimeSeries {

  /** For every event: count and exact value-sum of the same entity's
    * events in `[ts − windowMicros, ts]`. Sum goes through
    * DECIMAL(18,6) — order-independent, so bit-stable across retries
    * and partitionings. Adds `n_win` and `sum_win`. */
  def trailing(events: DataFrame, entityCol: String, tsCol: String,
      valueCol: String, windowMicros: Long): DataFrame = {
    require(windowMicros > 0, "window must be positive")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowMicros, 0)
    events
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("sum_win",
        sum(col(valueCol).cast("decimal(18,6)")).over(w).cast("double"))
  }

  /** Daily gap-fill + forward-fill resample (pandas `asfreq('D').ffill()`
    * re-expressed relationally): per entity, generate the dense daily
    * date spine from its first to its last event day, left-join the
    * exact per-day value sums, and forward-fill missing days with the
    * most recent observed sum. Returns one row per (entity, day):
    * (entity, day, v_sum nullable-exact, v_filled forward-filled,
    * observed flag).
    *
    * Scale shape: the per-day agg and the min/max span are ONE entity-
    * day-keyed and ONE entity-keyed shuffle; the spine explodes
    * `sequence(first, last)` per entity — rows ∝ entities × span-days,
    * never event count; the fill is `last(_, ignoreNulls)` over one
    * entity-keyed window (running frame — a single sorted pass, no
    * per-row lookback scan). A pathological entity spanning decades
    * bounds its own spine (≈ 11 k rows per 30 years) — there is no
    * corpus-wide spine. Sums are DECIMAL(18,6), order-independent. */
  def resampleDailyFfill(events: DataFrame, entityCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = events
      .groupBy(col(entityCol), to_date(col(tsCol)).as("day"))
      .agg(sum(col(valueCol).cast("decimal(18,6)")).cast("double").as("v_sum"))
    val spine = events
      .groupBy(col(entityCol))
      .agg(min(to_date(col(tsCol))).as("__d0"), max(to_date(col(tsCol))).as("__d1"))
      .select(col(entityCol), explode(sequence(col("__d0"), col("__d1"))).as("day"))
    val w = Window.partitionBy(col(entityCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq(entityCol.replace("`", ""), "day"), "left")
      .withColumn("v_filled", last(col("v_sum"), ignoreNulls = true).over(w))
      .withColumn("observed", col("v_sum").isNotNull)
  }

  /** Per-entity ordinary-least-squares TREND: slope and intercept of
    * `valueCol` against the epoch-day of `tsCol`, from the closed-form
    * normal equations
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    * computed over EXACT sums — x is an integer day, y goes through
    * DECIMAL(18,6), so Σx, Σy, Σxy, Σx² are all order-independent exact
    * decimals and the one double division happens once per entity on
    * identical inputs in any engine. Output: (entity, n, slope,
    * intercept), both rounded to 9 decimals (the q42 double-emission
    * discipline); entities with < 2 points or zero x-variance emit NULL
    * slope/intercept rather than a 0/0.
    *
    * Scale shape: ONE entity-keyed partial-combining aggregation —
    * map-side combine does almost all the work; nothing else moves. */
  def trendPerKey(events: DataFrame, entityCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    // x stays an exact integer day; per-row products are bounded
    // (decimal(12,0)·decimal(18,6) and long·long) so neither engine's
    // decimal-width inference can overflow, and every SUM is exact.
    val xL = datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date"))
      .cast("long")
    val y = col(valueCol).cast("decimal(18,6)")
    val agg = events.groupBy(col(entityCol)).agg(
      count(lit(1)).as("n"),
      sum(xL).as("__sx"), sum(y).as("__sy"),
      sum(xL.cast("decimal(12,0)") * y).as("__sxy"),
      sum((xL * xL).cast("decimal(38,0)")).as("__sxx"))
    val nD = col("n").cast("double")
    val den = nD * col("__sxx").cast("double") -
      col("__sx").cast("double") * col("__sx").cast("double")
    val slope = (nD * col("__sxy").cast("double") -
      col("__sx").cast("double") * col("__sy").cast("double")) / den
    agg
      .withColumn("slope",
        when(col("n") >= 2 && den =!= 0.0, round(slope, 9)))
      .withColumn("intercept",
        when(col("n") >= 2 && den =!= 0.0, round(
          (col("__sy").cast("double") - slope * col("__sx").cast("double")) / nD, 9)))
      .drop("__sx", "__sy", "__sxy", "__sxx")
  }

  /** Per-entity exponential smoothing in FIR form: a `taps`-point
    * finite-impulse-response truncation of the EWMA recurrence,
    *   y_t = Σ_{k<taps} α(1−α)^k · v_{t−k}  /  Σ_{k<taps, t−k≥0} α(1−α)^k,
    * renormalized over the taps actually present so the series head is
    * unbiased. The truncation (not the infinite recurrence) is the
    * operator contract — at (1−α)=0.7, tap 8 carries <6 % weight, and
    * the FIR form is what scales: `taps` lag() columns over ONE
    * entity-keyed sort window, literal coefficients folded in ascending
    * k on both engines, no sequential dependence across rows (the exact
    * recurrence would need a per-entity serial scan). Row order within
    * an entity is (ts, tiebreakCol) — total, so deterministic under any
    * partitioning. Output adds `ewma` rounded to 6. */
  def ewmaFir(events: DataFrame, entityCol: String, tsCol: String,
      tiebreakCol: String, valueCol: String, alpha: Double, taps: Int): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    require(taps >= 1, "taps >= 1")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val terms = (0 until taps).map { k =>
      val coef = alpha * math.pow(1.0 - alpha, k)
      (lag(col(valueCol), k).over(w), lit(coef))
    }
    // ascending-k folds on both numerator and denominator keep the
    // double-addition order identical to the oracle's
    val num = terms.map { case (v, c) => when(v.isNotNull, v * c).otherwise(lit(0.0)) }
      .reduce(_ + _)
    val den = terms.map { case (v, c) => when(v.isNotNull, c).otherwise(lit(0.0)) }
      .reduce(_ + _)
    events.withColumn("ewma", round(num / den, 6))
  }

  /** CUSUM changepoint scan over the monthly value series: cusum_i =
    * Σ_{j≤i} v_j − i·mean, computed as (exact DECIMAL running sum) −
    * (integer rank × the one mean double) — NO floating running sum, so
    * the scan is bit-stable even where windowed double aggregation
    * would re-associate. The peak |cusum| month (ties → earliest) is
    * the level-shift candidate. ONE fact aggregate to months + windows
    * over the month series. Output: (month, value, cusum, is_peak). */
  def cusumChangepoint(df: DataFrame, tsCol: String,
      valueCol: String): DataFrame = {
    val monthly = df
      .groupBy(date_format(date_trunc("month", col(tsCol)), "yyyy-MM").as("month"))
      .agg(sum(col(valueCol).cast("decimal(18,6)")).as("__v"))
    val ord = Window.orderBy(col("month"))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    val withC = monthly
      .withColumn("__rn", row_number().over(ord).cast("long"))
      .withColumn("__cumv", sum(col("__v")).over(run).cast("decimal(28,6)"))
      .withColumn("__mean",
        sum(col("__v")).over(all).cast("double") / count(lit(1)).over(all).cast("double"))
      .withColumn("cusum", round(
        col("__cumv").cast("double") - col("__rn").cast("double") * col("__mean"), 6))
    withC
      .withColumn("__mx", max(abs(col("cusum"))).over(all))
      .withColumn("is_peak", abs(col("cusum")) === col("__mx") &&
        col("month") === min(when(abs(col("cusum")) === col("__mx"), col("month"))).over(all))
      .select(col("month"), round(col("__v").cast("double"), 6).as("value"),
        col("cusum"), col("is_peak"))
  }

  /** Trend strength of the monthly series (Hyndman & Athanasopoulos,
    * FPP: F_T = max(0, 1 − Var(remainder)/Var(value)) — with the MA(3)
    * trend as the fit and no seasonal term). Variances accumulate as
    * 9-dp fixed-point DECIMAL sums over the interior months (where the
    * centered window is complete), so F is order-independent. Output:
    * one row (n_months, var_value, var_resid, trend_strength). */
  def trendStrength(df: DataFrame, tsCol: String, valueCol: String): DataFrame = {
    // The series is normalized by its own mean FIRST (F_T is
    // scale-invariant), so every squared term is O(1) — where 9-dp
    // rounding is engine-exact at any data scale. Rounding raw
    // revenue-scale squares is NOT (DuckDB's double round overflows
    // its ×10^d trick above ~2^53).
    val dec = monthlyMaDecompose(df, tsCol, valueCol)
      .where(col("trend").isNotNull)
      .localCheckpoint(false)
    val mean = dec.agg(
        (sum(col("value").cast("decimal(24,6)")).cast("double") /
          count(lit(1)).cast("double")).as("__mean"))
    val norm = dec.crossJoin(broadcast(mean))
      .select(round(col("value") / col("__mean"), 9).as("nv"),
        round(col("resid") / col("__mean"), 9).as("nr"))
    val agg = norm.agg(count(lit(1)).as("n_months"),
      sum(col("nv").cast("decimal(18,9)")).as("__sv"),
      sum(round(col("nv") * col("nv"), 9).cast("decimal(18,9)")).as("__svv"),
      sum(col("nr").cast("decimal(18,9)")).as("__sr"),
      sum(round(col("nr") * col("nr"), 9).cast("decimal(18,9)")).as("__srr"))
    val nD = col("n_months").cast("double")
    def d(c: String) = col(c).cast("double")
    val varV = d("__svv") / nD - (d("__sv") / nD) * (d("__sv") / nD)
    val varR = d("__srr") / nD - (d("__sr") / nD) * (d("__sr") / nD)
    agg.select(col("n_months"),
      round(varV, 9).as("var_value_norm"), round(varR, 9).as("var_resid_norm"),
      round(greatest(lit(0.0), lit(1.0) - varR / varV), 6).as("trend_strength"))
  }

  /** Monthly trend/residual decomposition by centered 3-month moving
    * average: value_m (exact DECIMAL month sum), trend = MA(3) over
    * [m−1, m+1] (NULL at the series edges where the window is
    * incomplete), resid = value − trend. The seasonal-adjustment
    * primitive for the reference's monthly import-volume reporting.
    *
    * Scale shape: ONE fact aggregate to calendar months; the window
    * runs over the AGGREGATED month series (tiny, one partition by
    * design — a decade is 120 rows). Sums are DECIMAL-exact; trend
    * divides the exact 3-month sum once, in double. */
  def monthlyMaDecompose(df: DataFrame, tsCol: String,
      valueCol: String): DataFrame = {
    val monthly = df
      .groupBy(date_format(date_trunc("month", col(tsCol)), "yyyy-MM").as("month"))
      .agg(sum(col(valueCol).cast("decimal(18,6)")).as("__v"))
    val w = Window.orderBy(col("month")).rowsBetween(-1, 1)
    monthly
      .withColumn("__n3", count(lit(1)).over(w))
      .withColumn("__t", when(col("__n3") === 3,
        sum(col("__v")).over(w).cast("double") / 3.0))
      .select(col("month"),
        round(col("__v").cast("double"), 6).as("value"),
        round(col("__t"), 6).as("trend"),
        round(col("__v").cast("double") - col("__t"), 6).as("resid"))
  }

  /** Sample autocorrelation function of the DAILY value series at lags
    * 1..`maxLag` — the seasonality probe read before picking a drift
    * window or a forecasting period:
    *   acf(k) = Σ_{t>k} e_t·e_{t−k} / Σ_t e_t²,  e_t = x_t − x̄.
    * Deviations are 6-dp fixed point (DECIMAL), so every lag product is
    * EXACT decimal arithmetic — the one double division per lag runs on
    * identical sums in any engine; x̄ itself divides the exact decimal
    * day-sum total once.
    *
    * Scale shape: ONE date-keyed partial-combining aggregate over the
    * fact; everything after (global sort, maxLag lag windows in one
    * pass, melt, per-lag sums) runs on the DAY-level series — the
    * aggregated-table-sized global-window class (q209 hatch note).
    * Output: (lag, n_terms, acf) for k = 1..maxLag. */
  def acf(df: DataFrame, tsCol: String, valueCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 366, "maxLag in [1, 366]")
    val daily = df.groupBy(col(tsCol).cast("date").as("__d"))
      .agg(sum(col(valueCol).cast("decimal(18,6)")).as("__v"))
    val stats = daily.agg(sum(col("__v")).as("__s"), count(lit(1)).as("__n"))
    val dev = daily.crossJoin(stats)
      .select(col("__d"),
        round(col("__v").cast("double") -
            col("__s").cast("double") / col("__n").cast("double"), 6)
          .cast("decimal(18,6)").as("__e"))
    val w = Window.orderBy(col("__d"))
    val wide = dev.select(
      (0 to maxLag).map(k => (col("__e") * lag(col("__e"), k).over(w)).as(s"__p$k")): _*)
    val melted = wide
      .select(posexplode(array((0 to maxLag).map(k => col(s"__p$k")): _*))
        .as(Seq("lag", "__t")))
      .where(col("__t").isNotNull)
    val agg = melted.groupBy(col("lag"))
      .agg(count(lit(1)).as("n_terms"), sum(col("__t")).as("__sk"))
      .localCheckpoint(false) // 2 consumers: the k=0 denominator + the k≥1 rows
    val denom = agg.where(col("lag") === 0).select(col("__sk").as("__s0"))
    agg.where(col("lag") >= 1).crossJoin(denom)
      .select(col("lag"), col("n_terms"),
        round(col("__sk").cast("double") / col("__s0").cast("double"), 6).as("acf"))
  }

  /** Normalized cross-correlation between two DAILY series at lags
    * −maxLag..maxLag — "does X lead Y?" (positive lag k: X shifted k
    * days EARLIER against Y):
    *   xcorr(k) = Σ_d ex(d−k)·ey(d) / √(Σex² · Σey²),
    * deviations taken from each series' own full-series mean. The acf
    * fixed-point discipline applies: 6-dp DECIMAL deviations, exact
    * decimal lag products, one double division per lag on identical
    * sums.
    *
    * Scale shape: ONE date-keyed aggregate per input; the lag explode ×
    * date join runs on DAY-level series (aggregated-table-sized).
    * Output: (lag, n_days, xcorr) — n_days = overlapping days at that
    * alignment. */
  def crossCorrelation(dfX: DataFrame, tsX: String, valX: String,
      dfY: DataFrame, tsY: String, valY: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 366, "maxLag in [1, 366]")
    def devSeries(df: DataFrame, ts: String, v: String): DataFrame = {
      val daily = df.groupBy(col(ts).cast("date").as("__d"))
        .agg(sum(col(v).cast("decimal(18,6)")).as("__v"))
      val stats = daily.agg(sum(col("__v")).as("__s"), count(lit(1)).as("__n"))
      daily.crossJoin(stats)
        .select(col("__d"),
          round(col("__v").cast("double") -
              col("__s").cast("double") / col("__n").cast("double"), 6)
            .cast("decimal(19,6)").as("__e"))
    }
    val ex = devSeries(dfX, tsX, valX).localCheckpoint(false) // join + denom
    val ey = devSeries(dfY, tsY, valY).localCheckpoint(false)
    val denom = ex.agg(sum(col("__e") * col("__e")).as("__dx"))
      .crossJoin(ey.agg(sum(col("__e") * col("__e")).as("__dy")))
    val lags = (-maxLag to maxLag).map(k => lit(k))
    val terms = ey.select(col("__d"), col("__e").as("__ey"))
      .crossJoin(ex.sparkSession.range(1).select(
        explode(array(lags: _*)).as("lag")))
      .join(ex.select(col("__d").as("__dx2"), col("__e").as("__ex")),
        col("__dx2") === date_sub(col("__d"), col("lag")))
    terms.groupBy(col("lag"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("__ex") * col("__ey")).as("__sk"))
      .crossJoin(denom)
      .select(col("lag"), col("n_days"),
        round(col("__sk").cast("double") /
          sqrt(col("__dx").cast("double") * col("__dy").cast("double")), 6)
          .as("xcorr"))
  }

  /** The MONTHLY series shared by the robust-trend ops: month index
    * i = calendar months since the series' first month (integer),
    * value = exact decimal month sum. Aggregated-table-sized. */
  private def monthlySeries(df: DataFrame, tsCol: String,
      valueCol: String): DataFrame = {
    val m = df.groupBy(
        (year(col(tsCol)) * 12 + month(col(tsCol))).cast("long").as("__mi"))
      .agg(sum(col(valueCol).cast("decimal(18,6)")).as("__v"))
    val base = m.agg(min(col("__mi")).as("__m0"))
    m.crossJoin(base)
      .select((col("__mi") - col("__m0")).as("__i"), col("__v"))
  }

  /** Theil–Sen robust slope of the monthly value series: the MEDIAN of
    * all pairwise slopes (v_j − v_i)/(j − i), i < j — the
    * outlier-immune twin of the OLS trend (q174): one wild month moves
    * OLS arbitrarily, but not the slope median. Slopes are doubles from
    * exact decimal differences over integer month gaps; the median is
    * the average of the two middle order statistics (tie-order-free —
    * it depends only on the slope MULTISET).
    *
    * Scale shape: ONE month aggregate over the fact; the O(n²) pair
    * join and the median sort run on the MONTH table (aggregated-table
    * sized by contract — never on fact rows). Output:
    * (n_months, n_pairs, slope_per_month). */
  def theilSen(df: DataFrame, tsCol: String, valueCol: String): DataFrame = {
    val s = monthlySeries(df, tsCol, valueCol).localCheckpoint(false)
    val pairs = s.join(
        s.select(col("__i").as("__j"), col("__v").as("__w")),
        col("__i") < col("__j"))
      .select(((col("__w") - col("__v")).cast("double") /
        (col("__j") - col("__i")).cast("double")).as("__sl"))
    val w = Window.orderBy(col("__sl"))
    val ranked = pairs
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy()))
    // integer medians: Spark's `/` on longs is DOUBLE division — cast
    // back to long (truncation == integer div for positives)
    val mid = ranked.where(
      col("__rn") === ((col("__n") + 1) / 2).cast("long") ||
        col("__rn") === (col("__n") / 2).cast("long") + 1)
    mid.agg(max(col("__n")).as("n_pairs"),
        round(avg(col("__sl")), 6).as("slope_per_month"))
      .crossJoin(s.agg(count(lit(1)).as("n_months")))
      .select(col("n_months"), col("n_pairs"), col("slope_per_month"))
  }

  /** Mann–Kendall trend statistic over the monthly series:
    *   S = Σ_{i<j} sign(v_j − v_i),  tau_a = S / (n(n−1)/2)
    * — the nonparametric "is there a monotone trend?" test that pairs
    * with the Theil–Sen slope. Pure INTEGER arithmetic on exact decimal
    * month sums; ties contribute 0 to S (the standard convention).
    *
    * Scale shape: same as [[theilSen]] — the pair join runs on the
    * MONTH table only. Output: (n_months, s_stat, tau). */
  def mannKendall(df: DataFrame, tsCol: String, valueCol: String): DataFrame = {
    val s = monthlySeries(df, tsCol, valueCol).localCheckpoint(false)
    val pairs = s.join(
        s.select(col("__i").as("__j"), col("__v").as("__w")),
        col("__i") < col("__j"))
      .select(signum((col("__w") - col("__v")).cast("double"))
        .cast("long").as("__sg"))
    pairs.agg(sum(col("__sg")).as("s_stat"), count(lit(1)).as("__np"))
      .crossJoin(s.agg(count(lit(1)).as("n_months")))
      .select(col("n_months"), col("s_stat"),
        round(col("s_stat").cast("double") / col("__np").cast("double"), 6)
          .as("tau"))
  }

  /** Kolmogorov–Smirnov distance between each event type's observed
    * inter-arrival gaps and the exponential fit at the MLE rate
    * λ = n/Σgaps — the "is this a Poisson process?" audit behind rate
    * limiting and burst detection. The ECDF is evaluated per DISTINCT
    * gap value on BOTH sides of the step (sup over |F̂(g)−F(g)| and
    * |F̂(g⁻)−F(g)|), so tie handling is order-free; gaps are exact
    * integer microseconds, λ derives from exact integer sums, and the
    * final max of doubles is order-independent.
    *
    * Scale shape: BOTH per-type passes ride the grouped hatches — the
    * event-type domain is a HANDFUL of values over an event-scaled
    * table, so `Window.partitionBy(type)` would put each type's whole
    * history (and, for the ECDF, its µs-distinct gap domain) on one
    * task. Gaps come from `Ranks.runningLeadBy` (range exchange on
    * (type, ts) + partition walk; the sorted multiset of consecutive
    * differences is tie-order-free), the ECDF from `Ranks.runningSumsBy`
    * over the (type, gap) counts; one max per type. Output:
    * (event_type, n_gaps, lambda_per_hour, ks_d). */
  def interArrivalKs(df: DataFrame, typeCol: String, tsCol: String): DataFrame = {
    val ev = df.select(col(typeCol).as("__ty"),
      unix_micros(col(tsCol).cast("timestamp")).as("__us"))
    val gaps = Ranks.runningLeadBy(ev, Seq("__ty"),
        "__us" -> "__nx", col("__us"))
      .select(col("__ty"), (col("__nx") - col("__us")).as("__g"))
      .filter(col("__g").isNotNull)
    val stats = gaps.groupBy(col("__ty"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("__g").cast("decimal(38,0)")).as("__sum"))
    val gc = gaps.groupBy(col("__ty"), col("__g")).agg(count(lit(1)).as("__c"))
    val ec = Ranks.runningSumsBy(gc, Seq("__ty"),
      Seq("__c" -> "__cle"), col("__g"))
    val nD = col("n_gaps").cast("double")
    val lam = nD / (col("__sum").cast("double") / lit(1e6)) // per second
    val fexp = lit(1.0) - exp(-lam * (col("__g").cast("double") / lit(1e6)))
    val fle = col("__cle").cast("double") / nD
    val flt = (col("__cle") - col("__c")).cast("double") / nD
    ec.join(stats, "__ty")
      .groupBy(col("__ty").as("event_type"))
      .agg(max(col("n_gaps")).as("n_gaps"), // constant within the group
        round(max(lit(3600.0) * nD / (col("__sum").cast("double") / lit(1e6))), 6)
          .as("lambda_per_hour"),
        round(max(greatest(abs(fle - fexp), abs(flt - fexp))), 6).as("ks_d"))
  }

  /** Holt double-exponential smoothing (level + linear trend; Holt 1957)
    * per key over the monthly value series — the forecast step the MA
    * decomposition (q206) and OLS trend (q174) stop short of:
    *   l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    * initialised l₂ = y₂, b₂ = y₂ − y₁ (recursion from t = 3). The
    * linear recurrence is folded with the `aggregate` higher-order
    * function over the month-sorted array — sequential by definition,
    * so the float op order is FIXED and engine-reproducible (monthly
    * y values are doubles cast from exact DECIMAL sums; α/β inline as
    * driver-computed literals).
    *
    * Scale shape: ONE (key, month) partial-combining aggregate over the
    * fact, then one key-level collect into a calendar-bounded array
    * (months per key ≤ series span — a contract bound, not data-scaled);
    * the fold is a map-only expression on that table. Output per key:
    * (key, n_months, level_last, trend_last, forecast) — forecast =
    * level + horizon·trend, all rounded 6. */
  /** Holt–Winters ADDITIVE triple exponential smoothing (Winters 1960)
    * per key over the monthly series — [[holtLinear]] plus a seasonal
    * component of period 12:
    *   l_t = α(y_t − s_{t−12}) + (1−α)(l_{t−1} + b_{t−1})
    *   b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}
    *   s_t = γ(y_t − l_t) + (1−γ)s_{t−12}
    * initialised over the first period: l = mean(y₁..y₁₂) (ordered
    * left-associated sum), b = 0, sᵢ = yᵢ − l; recursion from t = 13.
    * Keys with ≤ `period` months are dropped (nothing to smooth).
    *
    * Determinism: the fold runs the same `aggregate` HOF recurrence as
    * holtLinear (fixed float op order), with the seasonal ring buffer
    * as an in-accumulator array updated by indexed `transform` — the
    * oracle replays it with 12 explicit state columns. Output per key:
    * (key, n_months, level_last, trend_last, season_next, forecast1). */
  def holtWinters(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, alpha: Double = 0.5, beta: Double = 0.5,
      gamma: Double = 0.5, period: Int = 12): DataFrame = {
    val monthly = df.groupBy(col(keyCol).as("key"),
        (year(col(tsCol)) * 12 + month(col(tsCol))).cast("long").as("__mi"))
      .agg(sum(col(valueCol).cast("decimal(18,6)")).as("__v"))
    val series = monthly.groupBy(col("key"))
      .agg(sort_array(collect_list(struct(col("__mi").as("mi"),
        col("__v").cast("double").as("y")))).as("__arr"))
      .where(size(col("__arr")) > period)
    val init = struct(lit(0.0).as("sum"), lit(0.0).as("l"),
      lit(0.0).as("b"), array_repeat(lit(0.0), period).as("s"),
      lit(0).as("i"))
    val folded = aggregate(col("__arr"), init, (acc, e) => {
      val y = e.getField("y")
      val i = acc.getField("i")
      val idx = pmod(i, lit(period))
      val sum2 = acc.getField("sum") + y
      val l = acc.getField("l"); val b = acc.getField("b")
      val sArr = acc.getField("s")
      val sIdx = element_at(sArr, idx + 1)
      val lInit = sum2 / lit(period.toDouble)
      val l2 = lit(alpha) * (y - sIdx) + lit(1.0 - alpha) * (l + b)
      val b2 = lit(beta) * (l2 - l) + lit(1.0 - beta) * b
      val sWarm = transform(sArr, (v, ix) =>
        when(ix === idx, y).otherwise(v))
      val sAtInit = transform(sWarm, v => v - lInit)
      val sUpd = transform(sArr, (v, ix) =>
        when(ix === idx, lit(gamma) * (y - l2) + lit(1.0 - gamma) * v)
          .otherwise(v))
      struct(
        sum2.as("sum"),
        when(i < period - 1, lit(0.0))
          .when(i === period - 1, lInit).otherwise(l2).as("l"),
        when(i <= period - 1, lit(0.0)).otherwise(b2).as("b"),
        when(i < period - 1, sWarm)
          .when(i === period - 1, sAtInit).otherwise(sUpd).as("s"),
        (i + lit(1)).as("i"))
    })
    val sNext = element_at(col("__f.s"),
      pmod(col("__f.i"), lit(period)) + 1)
    series.select(col("key"), folded.as("__f"))
      .select(col("key"), col("__f.i").cast("long").as("n_months"),
        round(col("__f.l"), 6).as("level_last"),
        round(col("__f.b"), 6).as("trend_last"),
        round(sNext, 6).as("season_next"),
        round(col("__f.l") + col("__f.b") + sNext, 6).as("forecast1"))
  }

  def holtLinear(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, alpha: Double, beta: Double,
      horizon: Int): DataFrame = {
    val monthly = df.groupBy(col(keyCol).as("key"),
        (year(col(tsCol)) * 12 + month(col(tsCol))).cast("long").as("__mi"))
      .agg(sum(col(valueCol).cast("decimal(18,6)")).as("__v"))
    val series = monthly.groupBy(col("key"))
      .agg(sort_array(collect_list(struct(col("__mi").as("mi"),
        col("__v").cast("double").as("y")))).as("__arr"))
    val folded = aggregate(
      col("__arr"),
      struct(lit(0.0).as("l"), lit(0.0).as("b"), lit(0).as("i")),
      (acc, e) => {
        val y = e.getField("y")
        val l = acc.getField("l"); val b = acc.getField("b")
        val i = acc.getField("i")
        val l2 = lit(alpha) * y + lit(1.0 - alpha) * (l + b)
        val b2 = lit(beta) * (l2 - l) + lit(1.0 - beta) * b
        struct(
          when(i <= lit(1), y).otherwise(l2).as("l"),
          when(i === lit(0), lit(0.0))
            .when(i === lit(1), y - l).otherwise(b2).as("b"),
          (i + lit(1)).as("i"))
      })
    series.select(col("key"), folded.as("__f"))
      .select(col("key"),
        col("__f.i").cast("long").as("n_months"),
        round(col("__f.l"), 6).as("level_last"),
        round(col("__f.b"), 6).as("trend_last"),
        round(col("__f.l") + lit(horizon.toDouble) * col("__f.b"), 6)
          .as("forecast"))
  }
}
