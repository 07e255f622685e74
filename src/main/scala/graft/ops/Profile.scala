package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality profiling over arbitrary tables — the ingest-time audit a
  * 100 TB pipeline runs BEFORE any training-data op touches the batch
  * (schema drift, null explosions, key duplication and broken foreign
  * keys are cheaper to catch at the scan than to debug downstream).
  * Deequ-style, but expressed as plain Catalyst aggregates so the whole
  * profile stays inside whole-stage codegen.
  *
  * Scale shape (`profile`): the min/max/count/length statistics are ONE
  * aggregation job over one scan (every per-column stat is an agg
  * expression in the same `agg(...)`, map-side partials throughout). The
  * EXACT per-column distinct counts deliberately do NOT go through
  * Spark's multi-distinct rewrite — that Expand duplicates every full
  * row once per profiled column and re-groups on an all-columns-wide key
  * (measured 18 s vs 2 s at sf0.1×11 columns). Instead a second scan
  * melts each row to narrow (column, value-as-string) pairs, dedups them
  * with map-side partial aggregation (shuffle volume = sum of per-column
  * distinct counts, not rows × columns), and counts per column. The
  * string cast is injective per column, so distinct values map 1:1 to
  * distinct strings (caveat: −0.0 and 0.0 render distinctly — exact
  * engines disagree on that edge anyway). At 100 TB pass
  * `approxDistinct = true`: the HLL++ sketches fold into the ONE stats
  * pass (single scan, no melt, sketches merge map-side; not
  * oracle-gated because DuckDB's approx_distinct is a different
  * estimator).
  *
  * Scale shape (`audit`): each expectation is a 1-row aggregate over its
  * own scan (filters push down; the referential check is a key-shuffle
  * anti join, broadcast when the parent is dim-sized) unioned into one
  * O(#checks)-row result — no driver collect anywhere.
  */
object Profile {

  /** `c` as long under a LOUD lossless contract: a fractional value
    * raises instead of silently truncating toward zero (the bestOfK
    * raise_error convention). The integer-metric tests (welchT /
    * pairedT / brownForsythe / hodgesLehmann) document exact integral
    * sums as their determinism discipline — a caller passing a double
    * metric must hear about it, not get a quietly wrong statistic
    * (pre-bucket with floor/round if truncation is intended). NULL
    * passes through: every caller filters nulls after this cast. */
  private[ops] def integralLong(c: Column, opName: String): Column =
    when(c.isNull || c.cast("double") === c.cast("long").cast("double"),
      c.cast("long"))
    .otherwise(raise_error(concat(
      lit(s"$opName: value column must be integral, got "),
      c.cast("string"))).cast("long"))

  /** One row per profiled column: (column, n, n_null, n_distinct,
    * min_num, max_num, min_str, max_str, avg_len). Numeric and timestamp
    * columns report min/max as DOUBLE (timestamps as epoch millis —
    * exact for ms-precision data); string columns report lexicographic
    * min/max and mean length. */
  def profile(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")

    val aggExprs: Seq[Column] = count(lit(1)).as("__total") +:
      cols.zipWithIndex.flatMap { case (c, i) =>
        val base = Seq(count(col(c)).as(s"__n_$i")) ++
          (if (approxDistinct) Seq(approx_count_distinct(col(c)).as(s"__d_$i"))
           else Nil)
        val typed = df.schema(c).dataType match {
          case _: NumericType => Seq(
            min(col(c)).cast("double").as(s"__mn_$i"),
            max(col(c)).cast("double").as(s"__mx_$i"))
          case _: TimestampType | _: TimestampNTZType =>
            // NTZ casts to LTZ under the session's UTC zone — epoch-exact
            Seq(
              unix_millis(min(col(c)).cast(TimestampType)).cast("double")
                .as(s"__mn_$i"),
              unix_millis(max(col(c)).cast(TimestampType)).cast("double")
                .as(s"__mx_$i"))
          case StringType => Seq(
            min(col(c)).as(s"__ms_$i"), max(col(c)).as(s"__xs_$i"),
            avg(length(col(c))).as(s"__al_$i"))
          case dt => throw new IllegalArgumentException(
            s"profile: unsupported type $dt for column $c")
        }
        base ++ typed
      }
    val row = df.agg(aggExprs.head, aggExprs.tail: _*)

    val entries = cols.zipWithIndex.map { case (c, i) =>
      val isStr = df.schema(c).dataType == StringType
      struct(
        lit(c).as("column"),
        col("__total").as("n"),
        (col("__total") - col(s"__n_$i")).as("n_null"),
        (if (approxDistinct) col(s"__d_$i") else lit(0L)).as("n_distinct"),
        (if (isStr) nullD else col(s"__mn_$i")).as("min_num"),
        (if (isStr) nullD else col(s"__mx_$i")).as("max_num"),
        (if (isStr) col(s"__ms_$i") else nullS).as("min_str"),
        (if (isStr) col(s"__xs_$i") else nullS).as("max_str"),
        (if (isStr) col(s"__al_$i") else nullD).as("avg_len"))
    }
    val stats = row.select(inline(array(entries: _*)))
    if (approxDistinct) stats
    else {
      val melted = df.select(explode(array(cols.map(c =>
          struct(lit(c).as("column"),
            col(c).cast("string").as("__v"))): _*)).as("kv"))
        .select(col("kv.column").as("column"), col("kv.__v").as("__v"))
        .filter(col("__v").isNotNull)
        .distinct()
        .groupBy(col("column")).agg(count(lit(1)).as("__nd"))
      stats.drop("n_distinct")
        .join(melted, Seq("column"), "left")
        .withColumn("n_distinct", coalesce(col("__nd"), lit(0L)))
        .select("column", "n", "n_null", "n_distinct", "min_num",
          "max_num", "min_str", "max_str", "avg_len")
    }
  }

  /** Declarative expectations; each yields ONE (check_name, violations)
    * row. `violations` counts rows that break the contract (for Unique:
    * surplus rows beyond one per key, i.e. n − distinct-keys). */
  sealed trait Expectation { def name: String }
  /** Key uniqueness over `cols` (composite keys supported). */
  final case class Unique(name: String, df: DataFrame, cols: Seq[String])
      extends Expectation
  /** No nulls in `col`. */
  final case class Complete(name: String, df: DataFrame, col: String)
      extends Expectation
  /** Every non-null `childCol` value exists in `parent.parentCol`
    * (referential integrity). */
  final case class SubsetOf(name: String, child: DataFrame, childCol: String,
      parent: DataFrame, parentCol: String) extends Expectation
  /** Every row satisfies `cond` (range / domain checks; rows where
    * `cond` is NULL count as violations — an unknown is not a pass). */
  final case class Satisfies(name: String, df: DataFrame, cond: Column)
      extends Expectation

  /** Run all expectations → (check_name, violations, passed), one row
    * per check, sorted by name. */
  def audit(checks: Seq[Expectation]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one expectation")
    require(checks.map(_.name).distinct.size == checks.size,
      "expectation names must be unique")
    val rows = checks.map {
      case Unique(n, df, cs) =>
        df.agg((count(lit(1)) -
            countDistinct(col(cs.head), cs.tail.map(col): _*)).as("violations"))
          .select(lit(n).as("check_name"), col("violations"))
      case Complete(n, df, c) =>
        df.agg((count(lit(1)) - count(col(c))).as("violations"))
          .select(lit(n).as("check_name"), col("violations"))
      case SubsetOf(n, ch, cc, par, pc) =>
        ch.filter(col(cc).isNotNull)
          .join(par.select(col(pc).as("__pk")).distinct(),
            col(cc) === col("__pk"), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(n).as("check_name"), col("violations"))
      case Satisfies(n, df, cond) =>
        df.filter(!coalesce(cond, lit(false)))
          .agg(count(lit(1)).as("violations"))
          .select(lit(n).as("check_name"), col("violations"))
    }
    rows.reduce(_ unionByName _)
      .withColumn("passed", col("violations") === 0)
      .orderBy(col("check_name"))
  }

  /** Per-stratum WINSORIZATION: clip `valueCol` into its stratum's
    * [pLo, pHi] exact-percentile band — the standard robust-feature prep
    * that tames outliers without dropping rows. Adds `<value>_wins`
    * (clipped), `clipped_lo`/`clipped_hi` flags. Percentile bounds are
    * ROUNDED to 6 decimals before clipping: linear interpolation
    * `a + (b−a)·f` is the one step engines may disagree on in the last
    * ulp, and a rounded bound makes the clip decision (and the emitted
    * bound itself) engine-exact while moving the clip point ≤ 5e-7.
    *
    * Scale shape: ONE stratum-keyed exact-percentile aggregation (the
    * A2/q10 shape — swap in `percentile_approx` for heavy-hitter strata
    * at 100 TB, same contract as the median op) + one broadcast-sized
    * join-back (bounds table = one row per stratum). */
  def winsorize(df: DataFrame, valueCol: String, stratumCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad band [$pLo, $pHi]")
    val bounds = df.groupBy(col(stratumCol))
      .agg(round(percentile(col(valueCol), lit(pLo)), 6).as("__lo"),
        round(percentile(col(valueCol), lit(pHi)), 6).as("__hi"))
    df.join(bounds, Seq(stratumCol))
      .withColumn(s"${valueCol}_wins",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .withColumn("clipped_lo", col(valueCol) < col("__lo"))
      .withColumn("clipped_hi", col(valueCol) > col("__hi"))
      .drop("__lo", "__hi")
  }

  /** Per-key exact Pearson correlation between two INTEGER-valued
    * metric columns (the trendPerKey discipline): Σx, Σy, Σxy, Σx²,
    * Σy² accumulate as exact decimals (per-row products go through
    * DECIMAL(38,0) BEFORE summing, so a hot key cannot overflow int64),
    * and the one double expression runs once per key on identical
    * inputs in any engine. Degenerate variance (constant column)
    * yields NULL, not 0/0. Output: (key, n, corr ← round 6).
    *
    * Scale shape: ONE key-partial-combining aggregation; nothing else
    * moves. */
  def corrPerKey(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val agg = df.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(x.cast("decimal(38,0)")).as("__sx"),
      sum(y.cast("decimal(38,0)")).as("__sy"),
      sum((x * y).cast("decimal(38,0)")).as("__sxy"),
      sum((x * x).cast("decimal(38,0)")).as("__sxx"),
      sum((y * y).cast("decimal(38,0)")).as("__syy"))
    val nD = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val vx = nD * d("__sxx") - d("__sx") * d("__sx")
    val vy = nD * d("__syy") - d("__sy") * d("__sy")
    val cov = nD * d("__sxy") - d("__sx") * d("__sy")
    agg
      .withColumn("corr",
        when(col("n") >= 2 && vx > 0.0 && vy > 0.0,
          round(cov / (sqrt(vx) * sqrt(vy)), 6)))
      .drop("__sx", "__sy", "__sxy", "__sxx", "__syy")
  }

  /** 2-D skyline (Pareto frontier): rows not dominated under (minimize
    * `xCol`, maximize `yCol`) — dominated ⟺ ∃ other with (x' < x ∧
    * y' ≥ y) ∨ (x' ≤ x ∧ y' > y). Computed WITHOUT a self-join: x
    * scales to integer `xScale`-ths (exact RANGE offsets), and two
    * running maxima over the x-ordered rows — max y among strictly
    * smaller x (RANGE … −1) and among ≤ x (RANGE … 0) — decide
    * dominance in one sorted pass — via `Ranks.runningMaxByValue`, so
    * the sort is range-partitioned and the operator takes FACT-sized
    * input without a single-partition window; the classic skyline
    * needs no quadratic pass in 2-D. Output: the frontier rows. */
  def skyline2d(df: DataFrame, idCol: String, xCol: Column, yCol: Column,
      xScale: Long): DataFrame = {
    val base = df.select(col(idCol),
      round(xCol * xScale).cast("long").as("__x"),
      yCol.cast("long").as("__y"))
    // distributed RANGE-frame running maxima (tie groups included on
    // the LE side, excluded on the LT side — exact window semantics)
    // via the Ranks hatch: the input is the FACT table here, so a
    // Window.orderBy would single-partition the whole frame
    Ranks.runningMaxByValue(base, "__y", "__mlt", "__mle", col("__x"))
      .where(!(coalesce(col("__mlt"), lit(Long.MinValue)) >= col("__y")) &&
        !(col("__mle") > col("__y")))
      .drop("__mlt", "__mle")
  }

  /** One-way ANOVA F-statistic of an integer metric across groups, from
    * exact per-group sums (n, Σx, Σx² as DECIMAL(38,0)):
    *   F = (SSB/(k−1)) / (SSW/(N−k)).
    * The group table is tiny; the double expression runs once, mirrored.
    * Output: (k_groups, n_total, f_stat ← round 6; NULL on degenerate
    * denominators). */
  def anovaF(df: DataFrame, groupCol: String, xCol: String): DataFrame = {
    val (agg, ssb, ssw) = anovaCore(df, groupCol, xCol)
    val nD = col("n_total").cast("double")
    val kD = col("k_groups").cast("double")
    agg.select(col("k_groups"), col("n_total"),
      when(col("k_groups") >= 2 && col("n_total") > col("k_groups") && ssw > 0.0,
        round((ssb / (kD - lit(1.0))) / (ssw / (nD - kD)), 6)).as("f_stat"))
  }

  /** the shared one-way-ANOVA sum-of-squares aggregate behind
    * [[anovaF]] and [[anovaEffects]]: the 1-row frame plus the
    * between/within SS expressions over it (in grand-mean-normalized
    * units — every consumer is a ratio, so the units cancel) */
  private def anovaCore(df: DataFrame, groupCol: String,
      xCol: String): (DataFrame, Column, Column) = {
    val x = col(xCol).cast("long")
    val g = df.groupBy(col(groupCol)).agg(
        count(lit(1)).as("n"),
        sum(x.cast("decimal(38,0)")).as("sx"),
        sum((x * x).cast("decimal(38,0)")).as("sxx"))
      .localCheckpoint(false)
    val tot = g.agg(sum(col("n")).as("__tN"),
      sum(col("sx")).as("__ttsx"), sum(col("sxx")).as("__ttsxx"))
    // F/η²/ω² are scale-invariant: normalize by the grand mean so the
    // one fixed-point-rounded per-group term is O(n_g) — never a
    // raw-scale square (whose 9-dp round overflows DuckDB's ×10^d
    // double trick)
    val cross = g.crossJoin(broadcast(tot))
    val m = col("__ttsx").cast("double") / col("__tN").cast("double")
    val agg = cross.agg(
      count(lit(1)).as("k_groups"),
      max(col("__tN")).as("n_total"),
      max(col("__ttsx").cast("double")).as("__tsxD"),
      max(col("__ttsxx").cast("double")).as("__tsxxD"),
      sum(round((col("sx").cast("double") / m) * (col("sx").cast("double") / m) /
        col("n").cast("double"), 9).cast("decimal(28,9)")).as("__ssq"))
    val nD = col("n_total").cast("double")
    val m2 = col("__tsxD") / nD
    val su = col("__tsxD") / m2
    val ssb = col("__ssq").cast("double") - su * su / nD
    val ssw = col("__tsxxD") / (m2 * m2) - col("__ssq").cast("double")
    (agg, ssb, ssw)
  }

  /** One-way ANOVA EFFECT SIZES — [[anovaF]]'s "how much, not whether"
    * companion (the F grows with n; these don't):
    *
    *   η² = SSB/SST   (variance share explained by the grouping),
    *   ω² = (SSB − (k−1)·MSW)/(SST + MSW)   (the less-biased estimate)
    *
    * from the same grand-mean-normalized exact sums as [[anovaF]]
    * (units cancel in both ratios). ω² can go negative when F < 1 —
    * reported as computed, not clamped (the caller's call). NULL both
    * when the within-variance degenerates (a constant metric). Scale
    * shape: identical to anovaF — ONE group aggregate + 1-row algebra.
    * Output, 1 row: (k_groups, n_total, eta_sq, omega_sq ← round 6). */
  def anovaEffects(df: DataFrame, groupCol: String,
      xCol: String): DataFrame = {
    val (agg, ssb, ssw) = anovaCore(df, groupCol, xCol)
    val nD = col("n_total").cast("double")
    val kD = col("k_groups").cast("double")
    val msw = ssw / (nD - kD)
    val ok = col("k_groups") >= 2 && col("n_total") > col("k_groups") &&
      ssw > 0.0
    agg.select(col("k_groups"), col("n_total"),
      when(ok, round(ssb / (ssb + ssw), 6)).as("eta_sq"),
      when(ok, round((ssb - (kD - 1) * msw) / (ssb + ssw + msw), 6))
        .as("omega_sq"))
  }

  /** Brown–Forsythe variance-homogeneity test (Brown & Forsythe 1974):
    * the robust Levene variant — [[anovaF]]'s equal-variance assumption
    * checked by running the SAME one-way F on the absolute deviations
    * from each group's MEDIAN, z = |x − med_g|. Large F ⇒ the spreads
    * differ and q247's pooled-variance F is suspect.
    *
    * Group medians come from [[weightedMedian]]'s value-domain crossing
    * (unit weights) — the first value whose doubled cumulative count
    * reaches the group total, an integer-valued median for integer
    * metrics, so z stays integral and [[anovaF]]'s exact decimal sums
    * apply unchanged (the oracle replays the same crossing convention).
    *
    * Scale shape: the median hatch (one group aggregate + the grouped
    * prefix sum), a broadcast join of the group-sized median table back
    * onto the fact, then anovaF's single partial-combining aggregate.
    * Output: (k_groups, n_total, f_stat ← round 6). */
  def brownForsythe(df: DataFrame, groupCol: String,
      xCol: String): DataFrame = {
    val in = df.select(col(groupCol), col(xCol))
      .filter(col(groupCol).isNotNull && col(xCol).isNotNull)
    val med = weightedMedian(in, groupCol, col(xCol).cast("double"),
        lit(1.0), col(xCol))
      .select(col("grp"), col("w_median").cast("long").as("__med"))
    val z = in.select(col(groupCol).as("grp"),
        integralLong(col(xCol), "brownForsythe").as("__x"))
      .join(broadcast(med), "grp")
      .select(col("grp"), abs(col("__x") - col("__med")).as("__z"))
    anovaF(z, "grp", "__z")
  }

  /** Welch's unequal-variance t-test (Welch 1947) between two groups of
    * an integer metric — the parametric mean-comparison workhorse next
    * to [[RankTests.mannWhitneyU]]'s rank twin (use this when the mean
    * IS the business quantity; use the rank test when outliers own the
    * tail). From exact per-group (n, Σx, Σx²) DECIMAL(38,0) sums:
    *
    *   t = (m̄_a − m̄_b)/√(s²_a/n_a + s²_b/n_b),
    *   df = (v_a + v_b)² / (v_a²/(n_a−1) + v_b²/(n_b−1)),  v = s²/n
    *
    * (Welch–Satterthwaite). ONE conditional aggregate over the fact —
    * 1 row always, NULL-armed for an empty/size-1 group (the
    * mannWhitneyU degenerate convention); t NULL when both spreads
    * are zero. Output: (n_a, n_b, mean_a, mean_b, t, df ← round 6). */
  def welchT(df: DataFrame, valueCol: Column, groupA: Column): DataFrame = {
    val pts = df.select(integralLong(valueCol, "welchT").as("__x"),
        groupA.as("__a"))
      .filter(col("__x").isNotNull && col("__a").isNotNull)
    val xd = col("__x").cast("decimal(38,0)")
    def side(flag: Column, suffix: String) = Seq(
      sum(when(flag, 1L)).as(s"__n$suffix"),
      sum(when(flag, xd)).as(s"__s$suffix"),
      sum(when(flag, (xd * xd).cast("decimal(38,0)"))).as(s"__q$suffix"))
    val agg = pts.agg(side(col("__a"), "a").head,
      (side(col("__a"), "a").tail ++ side(!col("__a"), "b")): _*)
    def d(c: String) = col(c).cast("double")
    def stats(sfx: String) = {
      val (n, s, q) = (d(s"__n$sfx"), d(s"__s$sfx"), d(s"__q$sfx"))
      val m = s / n
      val v2 = when(col(s"__n$sfx") >= 2, (q - s * m) / (n - 1))
      (n, m, v2)
    }
    val (na, ma, va) = stats("a")
    val (nb, mb, vb) = stats("b")
    val (ua, ub) = (va / na, vb / nb)
    val denom = ua + ub
    agg.select(col("__na").as("n_a"), col("__nb").as("n_b"),
      round(ma, 6).as("mean_a"), round(mb, 6).as("mean_b"),
      when(denom > 0, round((ma - mb) / sqrt(denom), 6)).as("t"),
      // denom > 0 already implies n ≥ 2 on both sides (v NULL below 2)
      // and at least one positive variance term in the df denominator
      when(denom > 0, round(denom * denom /
        (ua * ua / (na - 1) + ub * ub / (nb - 1)), 6)).as("df"))
  }

  /** Cohen's d + Hedges' g standardized mean difference between two
    * groups of an integer metric — the EFFECT SIZE companion to
    * [[welchT]]'s significance (a billion-row t is always "significant";
    * d says whether the shift is a hair or a head). Pooled-SD form:
    *
    *   s²_p = ((n_a−1)s²_a + (n_b−1)s²_b)/(n_a+n_b−2),
    *   d = (m̄_a − m̄_b)/s_p,   g = d·(1 − 3/(4(n_a+n_b) − 9))
    *
    * (Hedges' small-sample bias correction). Same exact per-group
    * (n, Σx, Σx²) DECIMAL(38,0) conditional sums as welchT — ONE
    * partial-combining aggregate, 1 row always; NULL d/g when either
    * group has n < 2 or the pooled variance degenerates to 0. The
    * variance composition ((q − s·m)/(n−1), then the pooled blend)
    * runs in one fixed double order the oracle replays. Output:
    * (n_a, n_b, mean_a, mean_b, cohens_d, hedges_g ← round 6). */
  def cohensD(df: DataFrame, valueCol: Column, groupA: Column): DataFrame = {
    val pts = df.select(integralLong(valueCol, "cohensD").as("__x"),
        groupA.as("__a"))
      .filter(col("__x").isNotNull && col("__a").isNotNull)
    val xd = col("__x").cast("decimal(38,0)")
    def side(flag: Column, suffix: String) = Seq(
      sum(when(flag, 1L)).as(s"__n$suffix"),
      sum(when(flag, xd)).as(s"__s$suffix"),
      sum(when(flag, (xd * xd).cast("decimal(38,0)"))).as(s"__q$suffix"))
    val agg = pts.agg(side(col("__a"), "a").head,
      (side(col("__a"), "a").tail ++ side(!col("__a"), "b")): _*)
    def d(c: String) = col(c).cast("double")
    def stats(sfx: String) = {
      val (n, s, q) = (d(s"__n$sfx"), d(s"__s$sfx"), d(s"__q$sfx"))
      val m = s / n
      val v2 = when(col(s"__n$sfx") >= 2, (q - s * m) / (n - 1))
      (n, m, v2)
    }
    val (na, ma, va) = stats("a")
    val (nb, mb, vb) = stats("b")
    val sp2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
    val dEff = (ma - mb) / sqrt(sp2)
    val corr = lit(1.0) - lit(3.0) / (lit(4.0) * (na + nb) - 9)
    agg.select(col("__na").as("n_a"), col("__nb").as("n_b"),
      round(ma, 6).as("mean_a"), round(mb, 6).as("mean_b"),
      when(sp2 > 0, round(dEff, 6)).as("cohens_d"),
      when(sp2 > 0, round(dEff * corr, 6)).as("hedges_g"))
  }

  /** Paired (one-sample) t-test on per-pair differences — the
    * parametric twin of [[RankTests.wilcoxonSignedRank]] (zeros KEPT
    * here: the t statistic uses the raw mean, unlike the signed-rank
    * zero-drop convention). t = d̄/(s_d/√n), df = n − 1, from the same
    * exact (n, Σd, Σd²) sums. Output, 1 row: (n, mean_d, t, df);
    * NULL t on n < 2 or zero spread. */
  def pairedT(df: DataFrame, diffCol: Column): DataFrame = {
    val pts = df.select(integralLong(diffCol, "pairedT").as("__d"))
      .filter(col("__d").isNotNull)
    val dd = col("__d").cast("decimal(38,0)")
    val agg = pts.agg(count(lit(1)).as("__n"), sum(dd).as("__s"),
      sum((dd * dd).cast("decimal(38,0)")).as("__q"))
    def d(c: String) = col(c).cast("double")
    val (n, s, q) = (d("__n"), d("__s"), d("__q"))
    val m = s / n
    val v2 = (q - s * m) / (n - 1)
    agg.select(col("__n").as("n"),
      when(col("__n") > 0, round(m, 6)).as("mean_d"),
      when(col("__n") >= 2 && v2 > 0,
        round(m / sqrt(v2 / n), 6)).as("t"),
      when(col("__n") >= 2, (col("__n") - 1).cast("long")).as("df"))
  }

  /** k-anonymity audit over a quasi-identifier tuple: group sizes of
    * the QI projection, how many groups (and rows) fall below `k` —
    * the re-identification risk table a release gate reads. ONE
    * QI-keyed count + a group-sized aggregate. Output: one row
    * (n_groups, n_below_k, n_rows_below_k, min_group_size). */
  def kAnonymity(df: DataFrame, quasiIds: Seq[String], k: Long): DataFrame = {
    val g = df.groupBy(quasiIds.map(col): _*).agg(count(lit(1)).as("__n"))
    g.agg(count(lit(1)).as("n_groups"),
      sum(when(col("__n") < k, 1L).otherwise(0L)).as("n_below_k"),
      sum(when(col("__n") < k, col("__n")).otherwise(lit(0L))).cast("long")
        .as("n_rows_below_k"),
      min(col("__n")).as("min_group_size"))
  }

  /** l-diversity audit (Machanavajjhala et al. 2007) — the companion to
    * [[kAnonymity]]: k-anonymity bounds GROUP SIZE, but a size-k group
    * whose sensitive attribute is constant still leaks it (the homogeneity
    * attack). Per QI group: the distinct sensitive-value count (distinct
    * l-diversity) and exp of the sensitive-distribution entropy (entropy
    * l-diversity); the release gate reads the corpus minima.
    *
    * Determinism: each group×value entropy term −p·ln p is rounded to
    * 9 dp and summed as DECIMAL (the lmEntropyRate discipline), so the
    * group entropies are combine-order-stable; exp(min H) = min exp(H)
    * by monotonicity, so ONE exp call on the exact decimal minimum.
    *
    * Scale shape: one (QI, sensitive) partial-combining count shuffle —
    * rows after it are n_groups × |S|, never data-scaled — then a
    * window over the QI partition (bounded by |S|) and one group-sized
    * rollup. No join touches the fact table twice.
    * Output: one row (n_groups, distinct_l, n_groups_below_l,
    * entropy_l ← round 6). */
  def lDiversity(df: DataFrame, quasiIds: Seq[String], sensitiveCol: String,
      l: Long): DataFrame = {
    val qi = quasiIds.map(col)
    val gs = df.groupBy((quasiIds :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(qi: _*)
    val withN = gs.withColumn("__n", sum(col("__c")).over(w))
    val p = col("__c").cast("double") / col("__n").cast("double")
    val per = withN
      .withColumn("__term",
        round((lit(0.0) - p) * log(p), 9).cast("decimal(18,9)"))
      .groupBy(qi: _*)
      .agg(count(lit(1)).as("__d"), sum(col("__term")).as("__h"))
    per.agg(count(lit(1)).as("n_groups"),
      min(col("__d")).as("distinct_l"),
      sum(when(col("__d") < l, 1L).otherwise(0L)).as("n_groups_below_l"),
      round(exp(min(col("__h")).cast("double")), 6).as("entropy_l"))
  }

  /** t-closeness audit (Li et al. 2007) — the third rung of the release
    * ladder: even an l-diverse group leaks when its sensitive
    * DISTRIBUTION skews far from the corpus-wide one. For a nominal
    * sensitive attribute the distance is total variation:
    *   tvd(g) = ½ Σ_s |c_gs/n_g − c_s/N|
    * summed over the FULL sensitive domain (values absent from the
    * group contribute their global mass — hence the group×domain grid
    * below, not a raw left join of observed pairs only).
    *
    * Determinism: per-(group, value) |Δp| is rounded to 9 dp and summed
    * as DECIMAL; the ½ and the headline round-6 happen after the exact
    * sum.
    *
    * Scale shape: one (QI, sensitive) count shuffle + one sensitive-only
    * count (both partial-combining); the grid is n_groups × |S| rows —
    * |S| is bounded by contract (a nominal sensitive attribute), so the
    * grid cross join is group-table-sized, never fact-scaled, and the
    * global distribution broadcasts as |S| rows.
    * Output: one row (n_groups, max_tvd ← round 6, n_groups_above_t). */
  def tCloseness(df: DataFrame, quasiIds: Seq[String], sensitiveCol: String,
      t: Double): DataFrame = {
    val qi = quasiIds.map(col)
    val gs = df.groupBy((quasiIds :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val gTot = gs.groupBy(qi: _*).agg(sum(col("__c")).as("__n"))
    val glob = df.groupBy(col(sensitiveCol)).agg(count(lit(1)).as("__cs"))
    val nTot = df.count()
    val grid = gTot.crossJoin(broadcast(glob))
      .join(gs, quasiIds :+ sensitiveCol, "left")
      .na.fill(0L, Seq("__c"))
    val dp = abs(col("__c").cast("double") / col("__n").cast("double") -
      col("__cs").cast("double") / lit(nTot.toDouble))
    val per = grid
      .withColumn("__term", round(dp, 9).cast("decimal(18,9)"))
      .groupBy(qi: _*).agg(sum(col("__term")).as("__s"))
      .withColumn("__tvd", col("__s").cast("double") / lit(2.0))
    per.agg(count(lit(1)).as("n_groups"),
      round(max(col("__tvd")), 6).as("max_tvd"),
      sum(when(col("__tvd") > t, 1L).otherwise(0L)).as("n_groups_above_t"))
  }

  /** Wilson score lower bound per group: the ranking-safe success rate
    * for (successes k of n trials) at confidence z —
    *   (p̂ + z²/2n − z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n).
    * Inputs are exact integers; z and z² enter as the same Scala
    * doubles on both engines, and the expression shape is mirrored
    * term by term, so the bound is bit-stable. ONE group aggregate.
    * Output: (group, n, k, p_hat, wilson_lb ← round 6). */
  def wilsonLowerBound(df: DataFrame, groupCol: String, successCol: Column,
      z: Double = 1.96): DataFrame = {
    val z2 = z * z
    val agg = df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(when(successCol, 1L).otherwise(0L)).as("k"))
    val nD = col("n").cast("double")
    val p = col("k").cast("double") / nD
    val lb = (p + lit(z2) / (lit(2.0) * nD) -
      lit(z) * sqrt(p * (lit(1.0) - p) / nD + lit(z2) / (lit(4.0) * nD * nD))) /
      (lit(1.0) + lit(z2) / nD)
    agg.select(col("grp"), col("n"), col("k"),
      round(p, 6).as("p_hat"), round(lb, 6).as("wilson_lb"))
  }

  /** Two-proportion z-test between the two arms of `armCol` (must take
    * exactly two values; arms ordered ascending so arm1 − arm2 is
    * well-defined): z = (p₁ − p₂)/√(p̄(1−p̄)(1/n₁ + 1/n₂)) with the
    * pooled p̄. Integer counts → mirrored double expression. Output:
    * one row (arm_a, arm_b, n_a, k_a, n_b, k_b, z ← round 6). */
  def twoProportionZ(df: DataFrame, armCol: String,
      successCol: Column): DataFrame = {
    val agg = df.groupBy(col(armCol).as("arm"))
      .agg(count(lit(1)).as("n"), sum(when(successCol, 1L).otherwise(0L)).as("k"))
      .orderBy(col("arm"))
      .limit(2)
    val rows = agg.collect()
    require(rows.length == 2, s"need exactly two arms, got ${rows.length}")
    val spark = df.sparkSession
    import spark.implicits._
    val (aA, nA, kA) = (rows(0).get(0).toString, rows(0).getLong(1), rows(0).getLong(2))
    val (aB, nB, kB) = (rows(1).get(0).toString, rows(1).getLong(1), rows(1).getLong(2))
    val p1 = kA.toDouble / nA.toDouble
    val p2 = kB.toDouble / nB.toDouble
    val pp = (kA + kB).toDouble / (nA + nB).toDouble
    val zv = (p1 - p2) / math.sqrt(pp * (1.0 - pp) * (1.0 / nA.toDouble + 1.0 / nB.toDouble))
    Seq((aA, aB, nA, kA, nB, kB,
      BigDecimal(zv).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("arm_a", "arm_b", "n_a", "k_a", "n_b", "k_b", "z")
  }

  /** Weighted median (and general weighted percentile num/den) per
    * group: rows sort by (value, tiebreak) inside each group, weights
    * accumulate as EXACT decimals, and the answer is the first value
    * whose doubled cumulative weight reaches the total — an all-decimal
    * comparison, no float shares. `valueCol` is 9-dp fixed point by
    * contract. ONE group-keyed sort window + one group aggregate.
    * Output: (group, total_weight, w_median). */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: Column,
      weightCol: Column, tiebreak: Column): DataFrame = {
    // The median is a VALUE-DOMAIN statistic: the crossing value of the
    // cumulative weight is the same whether the running sum walks raw
    // rows (the old per-group window — one task per group over
    // fact-scaled rows) or per-DISTINCT-value weight sums (a group
    // aggregate + the distributed grouped decimal prefix sum) — if the
    // threshold crosses mid-tie-group, that group's value is the
    // answer either way. `tiebreak` is retained in the signature for
    // contract compatibility; it only ever disambiguated the
    // within-value walk order, never the result.
    val base = df.select(col(groupCol).as("grp"),
      round(valueCol, 9).cast("decimal(15,9)").as("__v"),
      weightCol.cast("decimal(18,6)").as("__w"))
    val wc = base.groupBy(col("grp"), col("__v"))
      .agg(sum(col("__w")).cast("decimal(28,6)").as("__ws"))
    val cum = Ranks.runningDecimalSumsBy(wc, Seq("grp"),
      Seq("__ws" -> "__cum"), col("__v"))
    val tots = wc.groupBy(col("grp"))
      // DECIMAL(28,6): the ×2 comparison must stay inside precision 38
      .agg(sum(col("__ws")).cast("decimal(28,6)").as("__tot"))
    cum.join(tots, "grp")
      .groupBy(col("grp"))
      .agg(max(col("__tot")).cast("double").as("total_weight"),
        min(when(col("__cum").cast("decimal(28,6)") * 2 >= col("__tot"),
          col("__v"))).cast("double").as("w_median"))
  }

  /** Hill tail-index estimator over the top-(k+1) order statistics of a
    * positive integer metric: α̂ = k / Σ_{i<k} ln(x_(i) / x_(k)) — the
    * heavy-tail exponent of e.g. the document-length distribution (how
    * aggressively a max-length cut truncates mass). The top-(k+1)
    * values come from ONE distributed TakeOrdered (k is a contract
    * bound, like candK); the log fold runs in (value desc, id) order on
    * the driver, mirroring the oracle's ordered list_reduce. Output:
    * (k, x_k, alpha ← round 6); NULL alpha if the top values are all
    * equal (zero denominator). */
  def hillTail(df: DataFrame, idCol: String, valueCol: String,
      k: Int): DataFrame = {
    require(k >= 2, "k >= 2")
    val top = df.where(col(valueCol) > 0)
      .select(col(idCol).cast("long").as("__id"), col(valueCol).cast("long").as("__v"))
      .orderBy(col("__v").desc, col("__id"))
      .limit(k + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    require(top.length == k + 1, s"need at least ${k + 1} positive rows")
    val xk = top.last._2
    var s = 0.0
    top.dropRight(1).foreach { case (_, x) => s += math.log(x.toDouble / xk.toDouble) }
    val alpha = if (s > 0) Some(BigDecimal(k.toDouble / s)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) else None
    val spark = df.sparkSession
    import spark.implicits._
    Seq((k, xk, alpha)).toDF("k", "x_k", "alpha")
  }

  /** Referential-integrity audit across a set of FK relations: for each
    * (name, child, childKey, parent, parentKey), the child row count,
    * the count of child rows whose key has no parent (LEFT ANTI join),
    * and the orphan rate. The cross-table expectations check a warehouse
    * runs before publishing a snapshot.
    *
    * Scale shape: per relation ONE anti-join on the key (dimension
    * parents broadcast under AQE; fact-fact keys shuffle once) + 1-row
    * aggregates; the audit output is relations-sized. */
  def refIntegrity(
      relations: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(relations.nonEmpty, "need at least one relation")
    relations.map { case (name, child, ck, parent, pk) =>
      val orphans = child
        .join(parent.select(col(pk).as("__pk")).distinct(),
          col(ck) === col("__pk"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      child.agg(count(lit(1)).as("n_child")).crossJoin(orphans)
        .select(lit(name).as("relation"), col("n_child"), col("n_orphans"))
        .withColumn("orphan_rate",
          round(col("n_orphans").cast("double") / col("n_child").cast("double"), 6))
    }.reduce(_ unionByName _)
  }

  /** Per-key central-moment profile — mean, standard deviation,
    * skewness, excess kurtosis — the distribution-shape panel behind
    * "is this metric bimodal / heavy-tailed?". TWO passes: pass 1 takes
    * the exact-decimal mean; pass 2 accumulates 9-dp fixed-point
    * centered powers (x−μ)² ³ ⁴ — the one-pass raw-power formulation
    * needs Σx⁴, which overflows DECIMAL(38) for any real money column,
    * and double power sums are shuffle-order-dependent. Degenerate
    * spread → NULL shape stats.
    *
    * Scale shape: two key-partial aggregates with a key-join between
    * them (the mean broadcast is key-table-sized under AQE). Output:
    * (key, n, mean, std, skewness, kurtosis). */
  def momentsProfile(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("decimal(18,6)")
    val m1 = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"), sum(v).as("__s"))
      .select(col("key"), col("n"),
        (col("__s").cast("double") / col("n").cast("double")).as("__mean"))
    val dev = df.select(col(keyCol).as("key"), v.as("__v"))
      .join(m1, "key")
      .withColumn("__d", col("__v").cast("double") - col("__mean"))
    val terms = dev.groupBy(col("key"))
      .agg(max(col("n")).as("n"), max(col("__mean")).as("__mean"),
        sum(round(col("__d") * col("__d"), 9).cast("decimal(28,9)")).as("__s2"),
        sum(round(col("__d") * col("__d") * col("__d"), 9)
          .cast("decimal(38,9)")).as("__s3"),
        sum(round(col("__d") * col("__d") * col("__d") * col("__d"), 9)
          .cast("decimal(38,9)")).as("__s4"))
    def d(c: String) = col(c).cast("double")
    val m2 = d("__s2") / d("n")
    val m3 = d("__s3") / d("n")
    val m4 = d("__s4") / d("n")
    terms.select(col("key"), col("n"),
      round(col("__mean"), 6).as("mean"),
      when(m2 > 0.0, round(sqrt(m2), 6)).as("std"),
      when(m2 > 0.0, round(m3 / pow(m2, 1.5), 6)).as("skewness"),
      when(m2 > 0.0, round(m4 / (m2 * m2) - lit(3.0), 6)).as("kurtosis"))
  }

  /** Dispersion index (variance-to-mean ratio) of per-unit event
    * counts, per class: D = 1 for a Poisson process, D ≫ 1 for bursty /
    * clumped behavior — the overdispersion read that decides between a
    * Poisson and a negative-binomial model of per-user activity. Count
    * sums are exact integers through DECIMAL(38,0); population
    * variance; one double division per class.
    *
    * Scale shape: ONE (class, unit) partial-combining count, ONE class
    * aggregate. Output: (class, n_units, mean_count, dispersion,
    * overdispersed = D > threshold). */
  def dispersionIndex(df: DataFrame, classCol: String, unitCol: String,
      threshold: Double = 1.5): DataFrame = {
    val cu = df.groupBy(col(classCol).as("class"), col(unitCol).as("__u"))
      .agg(count(lit(1)).as("__c"))
    val agg = cu.groupBy(col("class")).agg(count(lit(1)).as("n_units"),
      sum(col("__c").cast("decimal(38,0)")).as("__s"),
      sum((col("__c") * col("__c")).cast("decimal(38,0)")).as("__s2"))
    def d(c: String) = col(c).cast("double")
    val m = d("__s") / d("n_units")
    val v = d("__s2") / d("n_units") - m * m
    agg.select(col("class"), col("n_units"),
      round(m, 6).as("mean_count"),
      when(col("__s") > 0, round(v / m, 6)).as("dispersion"),
      when(col("__s") > 0, v / m > threshold).as("overdispersed"))
  }

  /** Cramér's V association strength between two categorical columns —
    * the bounded-[0,1] complement of [[mutualInformation]] (V is
    * comparable ACROSS tables with different category counts; MI is
    * not): V = √(χ²/(n·(min(r,c)−1))) with the contingency χ² from
    * marginal-expected cells. χ² terms are 9-dp fixed point summed as
    * DECIMAL; expected counts come from count products through DOUBLE.
    *
    * Scale shape: ONE (a,b) count over the fact; marginals and terms on
    * the checkpointed CELL table (|A|·|B| a contract bound). Output:
    * 1 row (n, r_levels, c_levels, chi2, cramers_v). */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__cab"))
      .localCheckpoint(false) // marginals ×2, total, levels, terms
    val ma = cells.groupBy(col("__a")).agg(sum(col("__cab")).as("__ca"))
      .localCheckpoint(false)
    val mb = cells.groupBy(col("__b")).agg(sum(col("__cab")).as("__cb"))
      .localCheckpoint(false)
    val tot = cells.agg(sum(col("__cab")).as("__n"))
    val lv = ma.agg(count(lit(1)).as("__r"))
      .crossJoin(mb.agg(count(lit(1)).as("__c")))
    def d(c: String) = col(c).cast("double")
    val e = d("__ca") * d("__cb") / d("__n")
    // χ² sums over the FULL r×c grid — an absent cell (o = 0) still
    // contributes its expected mass e; summing observed cells only
    // under-counts exactly the association being measured
    val terms = ma.crossJoin(mb)
      .join(cells, Seq("__a", "__b"), "left")
      .na.fill(0L, Seq("__cab"))
      .crossJoin(tot)
      .select(col("__n"),
        round((d("__cab") - e) * (d("__cab") - e) / e, 9)
          .cast("decimal(18,9)").as("__t"))
    terms.groupBy(col("__n").as("n"))
      .agg(sum(col("__t")).as("__chi2"))
      .crossJoin(lv)
      .select(col("n"), col("__r").as("r_levels"), col("__c").as("c_levels"),
        round(col("__chi2").cast("double"), 6).as("chi2"),
        round(sqrt(col("__chi2").cast("double") /
          (col("n").cast("double") *
            (least(col("__r"), col("__c")) - 1).cast("double"))), 6)
          .as("cramers_v"))
  }

  /** Functional-dependency audit: does `lhs` determine `rhs`? Reports,
    * per named dependency, the lhs-key count, how many keys map to MORE
    * than one rhs value (violations), the violation rate, and the worst
    * fan-out — the schema-discovery profiling staple behind "can I use
    * this as a dimension key?".
    *
    * Scale shape: per dependency TWO key-partial aggregates —
    * (lhs, rhs) distinct reduction, then lhs — never a row-level
    * distinct; output is dependencies-sized. */
  def functionalDependency(
      deps: Seq[(String, DataFrame, Seq[String], String)]): DataFrame = {
    require(deps.nonEmpty, "need at least one dependency to test")
    deps.map { case (name, df, lhs, rhs) =>
      val perKey = df
        .select((lhs.map(col) :+ col(rhs).as("__rhs")): _*)
        .distinct()
        .groupBy(lhs.map(col): _*)
        .agg(count(lit(1)).as("__nd"))
      perKey.agg(count(lit(1)).as("n_lhs"),
          sum(when(col("__nd") > 1, 1L).otherwise(0L)).as("n_violating"),
          max(col("__nd")).as("max_fanout"))
        .select(lit(name).as("dependency"), col("n_lhs"), col("n_violating"),
          round(col("n_violating").cast("double") / col("n_lhs").cast("double"), 6)
            .as("violation_rate"),
          col("max_fanout"))
    }.reduce(_ unionByName _)
  }

  /** Candidate-key uniqueness audit: for each named (relation, columns)
    * candidate, the row count, distinct-key count, and duplicate-row
    * count — the "is this actually a primary key?" pre-flight a load
    * job runs before declaring merge semantics.
    *
    * Scale shape: per candidate ONE key-partial count aggregate +
    * 1-row summary; output is candidates-sized. */
  def keyUniqueness(
      candidates: Seq[(String, DataFrame, Seq[String])]): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate key")
    candidates.map { case (name, df, cols) =>
      df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__c"))
        .agg(sum(col("__c")).as("n_rows"), count(lit(1)).as("n_keys"))
        .select(lit(name).as("candidate"),
          col("n_rows").cast("long").as("n_rows"), col("n_keys"),
          (col("n_rows").cast("long") - col("n_keys")).as("n_dup_rows"),
          (col("n_rows") === col("n_keys")).as("is_unique"))
    }.reduce(_ unionByName _)
  }

  /** Deterministic Poisson bootstrap CI for the mean of a value column:
    * each row's multiplicity in resample b is Poisson(1), drawn by
    * inverse-CDF on a seeded-md5 uniform of (id, b) — the classic
    * streaming bootstrap (each resample needs no global n), made
    * REPRODUCIBLE (same rows → same CI, any engine, any partitioning).
    * The CDF thresholds are fixed 12-dp literals, so the k decision is
    * bit-portable; resample sums are exact DECIMAL; the interval is the
    * 2nd-smallest / 2nd-largest of the B resample means (≈ the 95 % CI
    * at B = 40 — an order statistic, not an interpolated quantile, so
    * no engine-specific quantile convention).
    *
    * Scale shape: the fact fans out B× (the honest bootstrap cost), but
    * the aggregate is keyed on B values with map-side combine — the
    * shuffle moves B partials per task, not B× the data. The B-row mean
    * table sorts on the driver-scale. Output: 1 row
    * (n, b, mean_full, ci_lo, ci_hi). */
  def bootstrapMeanCI(df: DataFrame, idCol: String, valueCol: String,
      b: Int = 40, seed: Int = 77): DataFrame = {
    require(b >= 8, "need at least 8 resamples")
    // cumulative Poisson(1) CDF, fixed literals (12 dp)
    val cdf = Seq(0.367879441171, 0.735758882343, 0.919698602929,
      0.980981203313, 0.996302853448, 0.999359183497, 0.999868571922,
      0.999941340150)
    // ONE md5 per row; the B per-resample uniforms derive via the cheap
    // rotate-xor mix family (the q38/minhash discipline — hashing
    // md5("seed|id:b") per (row, b) costs B× the md5 budget for nothing)
    val base = df.select(
      Dedup.seededHash(seed, col(idCol).cast("string")).as("__h0"),
      col(valueCol).cast("decimal(18,6)").as("__v"))
    val drawn = base
      .select(col("__v"),
        posexplode(array((0 until b).map(j =>
          Dedup.mixHash(col("__h0"), j)): _*)).as(Seq("__b", "__h")))
      .withColumn("__u",
        col("__h").cast("double") / lit(1152921504606846976.0)) // 2^60
      .withColumn("__k",
        // fold DESCENDING so the smallest matching threshold is the
        // OUTERMOST when() — k = min{k : u < cdf(k)}
        cdf.zipWithIndex.reverse.foldLeft(lit(cdf.length)) {
          case (acc, (t, k)) => when(col("__u") < t, k).otherwise(acc) })
    val means = drawn.groupBy(col("__b"))
      .agg(sum(col("__v") * col("__k")).as("__s"),
        sum(col("__k").cast("long")).as("__n"))
      .where(col("__n") > 0)
      .select((col("__s").cast("double") / col("__n").cast("double")).as("__m"))
    val w = Window.orderBy(col("__m"))
    val ranked = means
      .withColumn("__rn", row_number().over(w))
      .withColumn("__nb", count(lit(1)).over(Window.partitionBy()))
    val full = df.agg(count(lit(1)).as("n"),
      round(sum(col(valueCol).cast("decimal(18,6)")).cast("double") /
        count(lit(1)).cast("double"), 6).as("mean_full"))
    ranked
      .agg(max(when(col("__rn") === 2, col("__m"))).as("__lo"),
        max(when(col("__rn") === col("__nb") - 1, col("__m"))).as("__hi"),
        max(col("__nb")).as("b"))
      .crossJoin(full)
      .select(col("n"), col("b"), col("mean_full"),
        round(col("__lo"), 6).as("ci_lo"), round(col("__hi"), 6).as("ci_hi"))
  }

  /** Cross-table money reconciliation: for each parent order, recompute
    * the total from its lines — Σ round(ext·(1−disc)·(1+tax), 9-dp
    * fixed point) — and classify |parent − recomputed| against
    * `tolerance`. The warehouse conformance audit that runs before any
    * revenue number ships; a mismatch COUNT is the product, whichever
    * way the data leans.
    *
    * Scale shape: ONE key aggregate over the child + ONE key join to
    * the parent, 1-row summary. Output:
    * (n_orders, n_ok, n_mismatch, max_abs_diff). */
  def reconcileTotals(parent: DataFrame, parentKey: String, totalCol: String,
      child: DataFrame, childKey: String, lineAmount: Column,
      tolerance: Double): DataFrame = {
    val per = child.groupBy(col(childKey).as("__k"))
      .agg(sum(round(lineAmount, 9).cast("decimal(28,9)")).as("__recon"))
    val j = parent.select(col(parentKey).as("__k"),
        col(totalCol).cast("decimal(18,6)").as("__tot"))
      .join(per, Seq("__k"), "left")
    val diff = abs(col("__tot").cast("double") -
      coalesce(col("__recon").cast("double"), lit(0.0)))
    j.agg(count(lit(1)).as("n_orders"),
      sum(when(diff <= tolerance, 1L).otherwise(0L)).as("n_ok"),
      sum(when(diff > tolerance, 1L).otherwise(0L)).as("n_mismatch"),
      round(max(diff), 6).as("max_abs_diff"))
  }

  /** Spearman rank correlation between two INTEGER-valued columns:
    * exact Pearson on midrank-tied ranks. Ranks come from per-VALUE
    * cumulative counts (2·avgrank = 2·cnt_lt + n_v + 1 — integers, no
    * per-row rank window), decorate the fact by two value-keyed joins,
    * and the Pearson sums follow the corrPerKey exact-DECIMAL contract
    * (ranks cast to DECIMAL(18,0) BEFORE multiplying — a rank is
    * data-scaled, so a long×long product could overflow where a degree
    * product cannot). The constant factor 2 cancels in Pearson.
    *
    * Scale shape: two (value) partial-combining aggregates +
    * `Ranks.runningSums` over the VALUE-DOMAIN tables (no
    * single-partition stage for data-scaled integer domains), two
    * value-keyed decorating joins, ONE 1-row aggregate. Output:
    * (n, spearman — NULL when a column is constant). */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    def ranks2(c: String) = {
      val v = df.select(col(c).cast("long").as("__v"))
        .groupBy(col("__v")).agg(count(lit(1)).as("__n"))
      // distributed prefix sum over the value table (data-scaled for
      // arbitrary integer domains — no single-partition Window.orderBy)
      Ranks.runningSums(v, Seq("__n" -> "__cle"), None, col("__v")).df
        .select(col("__v"),
          (lit(2L) * (col("__cle") - col("__n")) + col("__n") + lit(1L))
            .as("__r2"))
    }
    val j = df.select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .join(ranks2(xCol).select(col("__v").as("__x"), col("__r2").as("__rx")), "__x")
      .join(ranks2(yCol).select(col("__v").as("__y"), col("__r2").as("__ry")), "__y")
    val x = col("__rx").cast("decimal(18,0)")
    val y = col("__ry").cast("decimal(18,0)")
    val agg = j.agg(count(lit(1)).as("n"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(x * y).as("__sxy"), sum(x * x).as("__sxx"), sum(y * y).as("__syy"))
    def d(c: String) = col(c).cast("double")
    val nD = col("n").cast("double")
    val vx = nD * d("__sxx") - d("__sx") * d("__sx")
    val vy = nD * d("__syy") - d("__sy") * d("__sy")
    val cov = nD * d("__sxy") - d("__sx") * d("__sy")
    agg.select(col("n"),
      when(col("n") >= 2 && vx > 0.0 && vy > 0.0,
        round(cov / (sqrt(vx) * sqrt(vy)), 6)).as("spearman"))
  }

  /** Per-key trimmed mean: drop the ⌊n·trimFrac⌋ smallest and largest
    * values, average the rest — the robust central-tendency metric
    * between mean (trim 0) and median (trim →0.5). The kept MULTISET is
    * deterministic under any tie order (trimming is by count off each
    * end of the value order), and the sum is exact DECIMAL. Output:
    * (key, n, n_kept, trimmed_mean).
    *
    * Scale shape: ONE key shuffle + per-key sort window (the q234
    * weighted-median class); the aggregate is partial-combining. */
  def trimmedMean(df: DataFrame, keyCol: String, valueCol: String,
      trimFrac: Double): DataFrame = {
    require(trimFrac >= 0.0 && trimFrac < 0.5, "trimFrac in [0, 0.5)")
    // Rank-window-free form: the kept mass of a per-key rank window
    // `trim < rn ≤ cnt − trim` is computable per DISTINCT value from
    // the grouped cumulative count — a tie group occupying ranks
    // (lo, hi] contributes max(0, min(hi, cnt−trim) − max(lo, trim))
    // copies of its value. Exact integer arithmetic, and the per-key
    // row_number window (one task per key over fact-scaled rows — keys
    // like l_returnflag have THREE values) is gone.
    val base = df.select(col(keyCol).as("key"),
      col(valueCol).cast("decimal(18,6)").as("__v"))
    val vc = base.groupBy(col("key"), col("__v"))
      .agg(count(lit(1)).as("__c"))
    val cum = Ranks.runningSumsBy(vc, Seq("key"),
      Seq("__c" -> "__hi"), col("__v"))
    val cnts = vc.groupBy(col("key")).agg(sum(col("__c")).as("__cnt"))
    val trim = floor(col("__cnt").cast("double") * lit(trimFrac)).cast("long")
    val lo = col("__hi") - col("__c")
    val take = greatest(lit(0L),
      least(col("__hi"), col("__cnt") - trim) - greatest(lo, trim))
    cum.join(cnts, "key")
      .select(col("key"), col("__cnt"), col("__v"), take.as("__take"))
      .where(col("__take") > 0)
      .groupBy(col("key"))
      .agg(max(col("__cnt")).as("n"), sum(col("__take")).as("n_kept"),
        round(sum(col("__v") * col("__take")).cast("double") /
          sum(col("__take")).cast("double"), 6).as("trimmed_mean"))
  }

  /** Mutual information (nats) between two categorical columns — the
    * dependence audit behind "is `lang` informative about `source`?"
    * that a mixing plan wants before stratifying on both:
    *   MI = Σ_{a,b} p(a,b) · ln( p(a,b) / (p(a)·p(b)) ).
    * Per-cell terms are 9-dp fixed point summed as DECIMAL (the q151
    * contribution discipline), count products go through DOUBLE before
    * dividing so a hot cell can't overflow int64.
    *
    * Scale shape: ONE (a,b) partial-combining count over the fact;
    * marginals, the total, and the term table all derive from the
    * checkpointed CELL table (|A|·|B| rows — a contract bound, not
    * data-scaled). Output: 1 row (n, n_cells, mi_nats). */
  def mutualInformation(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__cab"))
      .localCheckpoint(false) // 4 consumers: marginals ×2, total, terms
    val ma = cells.groupBy(col("__a")).agg(sum(col("__cab")).as("__ca"))
    val mb = cells.groupBy(col("__b")).agg(sum(col("__cab")).as("__cb"))
    val tot = cells.agg(sum(col("__cab")).as("__n"))
    def d(c: String) = col(c).cast("double")
    val terms = cells.join(ma, "__a").join(mb, "__b").crossJoin(tot)
      .select(col("__n"),
        round((d("__cab") / d("__n")) *
            log(d("__cab") * d("__n") / (d("__ca") * d("__cb"))), 9)
          .cast("decimal(18,9)").as("__t"))
    terms.groupBy(col("__n").as("n"))
      .agg(count(lit(1)).as("n_cells"),
        round(sum(col("__t")).cast("double"), 6).as("mi_nats"))
      .select(col("n"), col("n_cells"), col("mi_nats"))
  }

  /** Shuffle-skew audit of a prospective partition/join key — the
    * pre-flight read BEFORE shuffling 100 TB on it: per-key row counts
    * reduced to (top-1 share, a Gini concentration coefficient over
    * the key distribution, and a salt-factor recommendation). A top-1
    * share near 1/P (P = target shuffle partitions) means one reducer
    * owns that key's whole slice; `recommended_salt` =
    * ⌈top1_count·P/n_rows⌉ is the split factor that levels it (1 = no
    * salting needed — the AQE-skew-join threshold intuition as a
    * number you can read BEFORE running the join).
    *
    * All arithmetic is integer until the two output ratios: the Gini
    * runs over the COUNT-DOMAIN table (count value → #keys with that
    * count) via [[Ranks.runningSums]], with each tie block's rank sum
    * in closed form ((hi(hi+1) − lo(lo+1))/2 — no per-key rank
    * decoration). Scale shape: ONE key-keyed partial-combining count,
    * ONE count-domain aggregate + the prefix hatch, 1-row output:
    * (n_rows, n_keys, top1_count, top1_share, gini_keys,
    * recommended_salt). */
  def skewAudit(df: DataFrame, keyCol: Column,
      shufflePartitions: Int): DataFrame = {
    require(shufflePartitions >= 1, "shufflePartitions >= 1")
    val kc = df.select(keyCol.as("__k")).filter(col("__k").isNotNull)
      .groupBy(col("__k")).agg(count(lit(1)).as("__c"))
    // count-of-counts: value v = a per-key row count, __m keys carry it
    val vc = kc.groupBy(col("__c").as("__v")).agg(count(lit(1)).as("__m"))
      .localCheckpoint(false) // consumers: prefix walk + totals
    val run = Ranks.runningSums(vc, Seq("__m" -> "__hi"), None, col("__v")).df
    // ascending-rank sum over each tie block in closed form; S = Σ i·c_i
    val lo = (col("__hi") - col("__m")).cast("decimal(38,0)")
    val hi = col("__hi").cast("decimal(38,0)")
    val rankSum = (hi * (hi + 1) - lo * (lo + 1)) / 2
    val agg = run.agg(
      sum((col("__v") * col("__m")).cast("decimal(38,0)")).as("__T"),
      sum(col("__m")).as("n_keys"),
      max(col("__v")).as("top1_count"),
      sum((col("__v").cast("decimal(38,0)") * rankSum).cast("decimal(38,0)"))
        .as("__S"))
    def d(c: String) = col(c).cast("double")
    // ⌈top1·P/rows⌉ via the repo's positive-integer-div idiom (long `/`
    // is double division; truncation == integer div below the 2^53
    // exactness envelope — top1·P at 100 TB row counts sits far under)
    val tLong = col("__T").cast("long")
    val salt = ((col("top1_count") * shufflePartitions + tLong - 1) / tLong)
      .cast("long")
    agg.select(col("__T").cast("long").as("n_rows"), col("n_keys"),
      col("top1_count"),
      round(d("top1_count") / d("__T"), 6).as("top1_share"),
      when(col("n_keys") >= 2 && col("__T") > 0, round(
        (lit(2.0) * d("__S") - (d("n_keys") + 1) * d("__T")) /
          (d("n_keys") * d("__T")), 6)).as("gini_keys"),
      salt.as("recommended_salt"))
  }

  /** EXACT join-cardinality audit — "will this equi-join explode?"
    * answered BEFORE running it: |A ⋈_k B| = Σ_k c_A(k)·c_B(k) computed
    * from the two key-count tables (each a partial-combining aggregate;
    * the count-table join moves |keys| rows, never the facts). Reports
    * the exact output rows, the single worst key's contribution (the
    * straggler that would own one task), and the output/input
    * amplification factor. Products accumulate as DECIMAL(38,0) — two
    * 10⁹-row hot keys already overflow int64.
    *
    * Output, 1 row: (rows_a, rows_b, n_keys_a, n_keys_b,
    * n_common_keys, join_rows, max_key_join_rows,
    * amplification = join_rows / max(rows_a, rows_b) ← round 6). */
  def joinCardinalityAudit(a: DataFrame, b: DataFrame, keyA: Column,
      keyB: Column): DataFrame = {
    def kc(df: DataFrame, k: Column) =
      df.select(k.as("__k")).filter(col("__k").isNotNull)
        .groupBy(col("__k")).agg(count(lit(1)).as("__c"))
        .localCheckpoint(false) // consumers: totals + the count join
    val ca = kc(a, keyA)
    val cb = kc(b, keyB)
    def tot(c: DataFrame, rn: String, kn: String) =
      c.agg(coalesce(sum(col("__c")), lit(0L)).as(rn),
        count(lit(1)).as(kn))
    val j = ca.join(cb.withColumnRenamed("__c", "__cb"), "__k")
      .select((col("__c").cast("decimal(38,0)") * col("__cb"))
        .cast("decimal(38,0)").as("__p"))
      .agg(count(lit(1)).as("n_common_keys"),
        coalesce(sum(col("__p")), lit(0).cast("decimal(38,0)"))
          .as("__jr"),
        max(col("__p")).as("__mx"))
    def d(c: String) = col(c).cast("double")
    tot(ca, "rows_a", "n_keys_a").crossJoin(tot(cb, "rows_b", "n_keys_b"))
      .crossJoin(j)
      .select(col("rows_a"), col("rows_b"), col("n_keys_a"),
        col("n_keys_b"), col("n_common_keys"),
        // reported as BIGINT: the ANSI decimal→long cast RAISES when
        // the prediction overflows int64 — which is itself the audit's
        // loudest possible "this join explodes" answer
        col("__jr").cast("long").as("join_rows"),
        coalesce(col("__mx"), lit(0).cast("decimal(38,0)"))
          .cast("long").as("max_key_join_rows"),
        when(greatest(col("rows_a"), col("rows_b")) > 0,
          round(d("__jr") /
            greatest(col("rows_a"), col("rows_b")).cast("double"), 6))
          .as("amplification"))
  }

  /** G-test (log-likelihood-ratio independence test) between two
    * categorical columns — [[mutualInformation]]'s significance twin:
    * G = 2·Σ_cells O·ln(O·n/(r_a·c_b)) ~ χ² with (r−1)(c−1) df
    * (equivalently G = 2n·MI in nats; the additive form is what makes
    * it preferable to Pearson's χ² for sparse cells). Zero cells
    * contribute nothing (the 0·ln 0 = 0 convention — absent from the
    * observed table anyway).
    *
    * Determinism: per-cell terms are 9-dp fixed point summed as
    * DECIMAL(28,9) (the [[mutualInformation]] discipline — the cell
    * order can't move the sum), doubled once. Scale shape: ONE
    * (a, b)-keyed partial-combining count, two marginal aggregates of
    * the CELL table, a cell-sized join. Output, 1 row:
    * (n, a_levels, b_levels, df, g_stat ← round 6); empty input →
    * empty output (no contingency to test). */
  def gTest(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__cab"))
      .localCheckpoint(false) // consumers: marginals ×2, total, terms
    val ma = cells.groupBy(col("__a")).agg(sum(col("__cab")).as("__ca"))
    val mb = cells.groupBy(col("__b")).agg(sum(col("__cab")).as("__cb"))
    val tot = cells.agg(sum(col("__cab")).as("__n"),
      countDistinct(col("__a")).as("__ra"),
      countDistinct(col("__b")).as("__rb"))
    def d(c: String) = col(c).cast("double")
    val terms = cells.join(ma, "__a").join(mb, "__b").crossJoin(tot)
      .select(col("__n"), col("__ra"), col("__rb"),
        round(d("__cab") *
            log(d("__cab") * d("__n") / (d("__ca") * d("__cb"))), 9)
          .cast("decimal(28,9)").as("__t"))
    terms.groupBy(col("__n").as("n"), col("__ra"), col("__rb"))
      .agg(round(lit(2.0) * sum(col("__t")).cast("double"), 6).as("g_stat"))
      .select(col("n"), col("__ra").as("a_levels"), col("__rb").as("b_levels"),
        ((col("__ra") - 1) * (col("__rb") - 1)).as("df"), col("g_stat"))
  }

  /** Range predicate spec for [[zonemapAudit]]: keep rows where
    * `field` (cast to double) lies in [lo, hi]; `None` = unbounded.
    * A zone is PRUNABLE when its [min,max] envelope provably misses
    * the interval — exactly the parquet row-group / ORC stripe /
    * Delta-file-stats skipping decision. */
  final case class ZonePred(label: String, field: String,
    lo: Option[Double], hi: Option[Double])

  /** Zone-map (data-skipping) effectiveness audit: bucket the fact table
    * into storage-unit proxies by `zoneKey` (e.g. orderkey ⫽ rowsPerGroup
    * — the write order a sorted/clustered table would have), collect each
    * zone's min/max envelope per referenced column, then score every
    * candidate predicate by how many zones (and rows) its envelope test
    * skips. This is the audit that decides Z-ORDER / sort-key choices
    * before rewriting 100 TB of files.
    *
    * Scale shape: ONE zone-keyed partial-combining aggregate over the
    * fact (min/max/count — algebraic, map-side combined); the per-
    * predicate scoring explodes a LITERAL predicate array over the
    * zone-sized stats table. Nothing after the first aggregate is
    * data-scaled. Output per predicate:
    * (pred, n_zones, zones_pruned, rows_skipped, skip_ratio). */
  def zonemapAudit(df: DataFrame, zoneKey: Column,
      preds: Seq[ZonePred]): DataFrame = {
    require(preds.nonEmpty && preds.forall(p => p.lo.nonEmpty || p.hi.nonEmpty),
      "each ZonePred needs at least one bound")
    val cols = preds.map(_.field).distinct
    val aggs = cols.flatMap { c =>
      Seq(min(col(c).cast("double")).as(s"__mn_$c"),
        max(col(c).cast("double")).as(s"__mx_$c"))
    } :+ count(lit(1)).as("__n")
    val zones = df.groupBy(zoneKey.as("__zone"))
      .agg(aggs.head, aggs.tail: _*)
    val predRows = preds.map { p =>
      val pruned = p.lo.map(v => col(s"__mx_${p.field}") < lit(v))
        .toSeq ++ p.hi.map(v => col(s"__mn_${p.field}") > lit(v)).toSeq
      struct(lit(p.label).as("pred"),
        pruned.reduce(_ || _).as("__pruned"))
    }
    zones.select(col("__n"), explode(array(predRows: _*)).as("__p"))
      .groupBy(col("__p.pred").as("pred"))
      .agg(count(lit(1)).as("n_zones"),
        sum(when(col("__p.__pruned"), 1L).otherwise(0L)).as("zones_pruned"),
        sum(when(col("__p.__pruned"), col("__n")).otherwise(0L))
          .as("rows_skipped"),
        round(sum(when(col("__p.__pruned"), col("__n")).otherwise(0L))
            .cast("double") / sum(col("__n")).cast("double"), 6)
          .as("skip_ratio"))
  }

  /** Adjusted Rand Index between two partitions of the same rows
    * (Hubert & Arabie 1985) — the chance-corrected agreement the
    * purity/NMI gates (q290) stop short of: from the contingency table
    *   ARI = (Σᵢⱼ C(nᵢⱼ,2) − E) / (½·(ΣC(aᵢ,2)+ΣC(bⱼ,2)) − E),
    *   E = ΣC(aᵢ,2)·ΣC(bⱼ,2) / C(n,2).
    * The pair-count sums Σ x(x−1) accumulate as exact DECIMAL (they
    * overflow int64 once any class holds > 3B rows), and only the final
    * ratio arithmetic runs in doubles.
    *
    * Scale shape: ONE (a,b) partial-combining count over the fact; the
    * marginals and all C(·,2) sums derive from the checkpointed CELL
    * table (|A|·|B| rows, a contract bound). Output: 1 row
    * (n, n_cells, ari). */
  def adjustedRand(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(false) // consumers: both marginals + cell sum
    def s2(g: DataFrame, key: String) = g.groupBy(col(key))
      .agg(sum(col("__c")).as("__m"))
      .agg(sum((col("__m").cast("decimal(19,0)") *
        (col("__m") - 1).cast("decimal(19,0)")).cast("decimal(38,0)"))
        .as("__s"))
    val sij = cells.agg(
      sum((col("__c").cast("decimal(19,0)") *
        (col("__c") - 1).cast("decimal(19,0)")).cast("decimal(38,0)"))
        .as("__sij"),
      sum(col("__c")).as("__n"), count(lit(1)).as("n_cells"))
    val sa = s2(cells, "__a").select(col("__s").as("__sa"))
    val sb = s2(cells, "__b").select(col("__s").as("__sb"))
    def d(c: Column) = c.cast("double")
    sij.crossJoin(sa).crossJoin(sb)
      .select(col("__n").as("n"), col("n_cells"), {
        val index = d(col("__sij")) / 2.0
        val ca = d(col("__sa")) / 2.0
        val cb = d(col("__sb")) / 2.0
        val cn = d(col("__n")) * (d(col("__n")) - 1.0) / 2.0
        val e = ca * cb / cn
        val m = (ca + cb) / 2.0
        round((index - e) / (m - e), 6).as("ari")
      })
  }

  /** Best single split per numeric feature (a CART decision stump,
    * Breiman et al. 1984 — the automatic-segmentation primitive): for
    * every candidate threshold v in the feature's VALUE DOMAIN, the
    * Gini impurity reduction of the split x ≤ v, maximised per feature
    * (ties → smaller threshold). The "which feature separates the
    * outcome best, and where" answer a segment-discovery pass needs.
    *
    * Scale shape: per feature, ONE value-domain aggregate (value,
    * n, n_pos) + `Ranks.runningSums` over DISTINCT values (no
    * single-partition stage — double features make the value table
    * fact-sized) — never a row sort. Gains are doubles from exact
    * counts; the per-feature argmax is a TakeOrdered top-1 on
    * (gain desc, threshold asc). Output per feature:
    * (feature, threshold, gain, p_left, p_right, n_left). */
  def bestSplit(df: DataFrame, features: Seq[String],
      outcomePred: Column): DataFrame = {
    require(features.nonEmpty, "at least one feature")
    def d(c: Column) = c.cast("double")
    features.map { f =>
      val vc = df.select(col(f).cast("double").as("__v"),
          outcomePred.as("__y"))
        .groupBy(col("__v"))
        .agg(count(lit(1)).as("__n"),
          sum(when(col("__y"), 1L).otherwise(0L)).as("__k"))
      // distributed prefix sums over the DISTINCT-value table (double
      // features make it fact-sized — the q265-class hatch); the totals
      // ride along from the same partials job as literals
      val run = Ranks.runningSums(vc, Seq("__n" -> "__cn", "__k" -> "__ck"),
        None, col("__v"))
      val cum = run.df
        .withColumn("__tn", lit(run.totals("__n")))
        .withColumn("__tk", lit(run.totals("__k")))
        .where(col("__cn") < col("__tn")) // right side must be non-empty
      def gini(k: Column, n: Column) = {
        val p = d(k) / d(n)
        lit(2.0) * p * (lit(1.0) - p)
      }
      val gain = gini(col("__tk"), col("__tn")) -
        (d(col("__cn")) / d(col("__tn"))) * gini(col("__ck"), col("__cn")) -
        ((d(col("__tn")) - d(col("__cn"))) / d(col("__tn"))) *
          gini(col("__tk") - col("__ck"), col("__tn") - col("__cn"))
      // argmax as a TakeOrdered top-1 (distributed), not a
      // single-partition row_number over the value table
      val ranked = cum.select(col("__v"), col("__cn"), col("__ck"),
          col("__tn"), col("__tk"), gain.as("__g"))
        .orderBy(col("__g").desc, col("__v"))
        .limit(1)
      ranked.select(lit(f).as("feature"), col("__v").as("threshold"),
        round(col("__g"), 6).as("gain"),
        round(d(col("__ck")) / d(col("__cn")), 6).as("p_left"),
        round((d(col("__tk")) - d(col("__ck"))) /
          (d(col("__tn")) - d(col("__cn"))), 6).as("p_right"),
        col("__cn").as("n_left"))
    }.reduce(_.unionByName(_))
  }

  /** A/B power analysis at the standard (α = 0.05 two-sided, 80 %
    * power) operating point: from the two arms' sizes and pooled rate,
    * the MINIMUM DETECTABLE EFFECT mde = (z_{α/2}+z_β)·√(2p̄(1−p̄)/n̄)
    * and the required per-arm n to detect a given relative lift —
    * the "is this experiment even big enough" gate that runs BEFORE
    * the q232 z-test runs after. z quantiles are shared literals (no
    * Φ⁻¹ in either engine).
    *
    * Scale shape: ONE arm-keyed aggregate; everything after is 2-row
    * arithmetic. Output: 1 row (n_a, n_b, p_pool, mde_abs, mde_rel,
    * n_req_per_arm). */
  def abPowerMde(df: DataFrame, armCol: String, successPred: Column,
      relLift: Double = 0.05): DataFrame = {
    val zA = 1.959963984540054 // Φ⁻¹(0.975)
    val zB = 0.8416212335729143 // Φ⁻¹(0.8)
    val arms = df.select(col(armCol).as("__arm"),
        successPred.as("__s"))
      .groupBy(col("__arm"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__s"), 1L).otherwise(0L)).as("__k"))
    def d(c: Column) = c.cast("double")
    // arm sizes enter symmetrically (n̄) — min/max is just the display
    val wide = arms.agg(min(col("__n")).as("__na2"),
      max(col("__n")).as("__nb2"),
      sum(col("__n")).as("__nt"), sum(col("__k")).as("__kt"))
    wide.select(
        col("__na2").as("n_a"), col("__nb2").as("n_b"),
        round(d(col("__kt")) / d(col("__nt")), 6).as("p_pool"), {
          val p = d(col("__kt")) / d(col("__nt"))
          val nbar = d(col("__nt")) / 2.0
          val mde = lit(zA + zB) * sqrt(lit(2.0) * p * (lit(1.0) - p) / nbar)
          round(mde, 6).as("mde_abs")
        }, {
          val p = d(col("__kt")) / d(col("__nt"))
          val nbar = d(col("__nt")) / 2.0
          val mde = lit(zA + zB) * sqrt(lit(2.0) * p * (lit(1.0) - p) / nbar)
          round(mde / p, 6).as("mde_rel")
        }, {
          val p = d(col("__kt")) / d(col("__nt"))
          val delta = p * lit(relLift)
          round(ceil(lit(2.0) * p * (lit(1.0) - p) *
            lit((zA + zB) * (zA + zB)) / (delta * delta)), 0).cast("long")
            .as("n_req_per_arm")
        })
  }

  /** DKW sample-size bounds (Dvoretzky–Kiefer–Wolfowitz; the
    * distribution-free guarantee behind "how many docs until the
    * empirical CDF is trustworthy"): per group, the implied uniform
    * CDF error ε = √(ln(2/δ)/(2n)) at confidence 1−δ, and whether the
    * group already meets a target ε. The sizing answer a per-language
    * quality-threshold calibration (q119/q144) needs before trusting
    * its quantiles. Output per group:
    * (group, n, eps_at_delta, n_required, sufficient).
    *
    * Scale shape: ONE group count + group-table arithmetic. */
  def dkwBounds(df: DataFrame, groupCol: String, delta: Double = 0.05,
      targetEps: Double = 0.01): DataFrame = {
    require(delta > 0 && delta < 1 && targetEps > 0, "bad delta/eps")
    val c = math.log(2.0 / delta)
    val nReq = math.ceil(c / (2.0 * targetEps * targetEps)).toLong
    df.groupBy(col(groupCol).as("group"))
      .agg(count(lit(1)).as("n"))
      .select(col("group"), col("n"),
        round(sqrt(lit(c) / (lit(2.0) * col("n").cast("double"))), 6)
          .as("eps_at_delta"),
        lit(nReq).as("n_required"),
        (col("n") >= nReq).as("sufficient"))
  }

  /** Multiple-testing control: per-group seeded randomization tests +
    * Benjamini–Hochberg FDR (Benjamini & Hochberg 1995) — the "which of
    * these m segment effects survive multiplicity" answer. Each group's
    * null distribution re-draws membership as a seeded binomial at the
    * group's observed share (the q376 mechanism, one chain per group);
    * BH then converts the m p-values to q-values via the reverse
    * running minimum of p·m/rank. Fully deterministic.
    *
    * Scale shape: obs diffs come from ONE group aggregate; the null
    * draws are ONE (group, perm) partial-combining aggregate over a
    * ×(m·perms) explode (the cost knob — shuffle carries partials,
    * never the exploded rows); BH runs on the m-row table. Output per
    * group: (group, obs_diff, p_value, rank, q_value, reject). */
  def multiTestFdr(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String, perms: Int = 32, seed: Int = 29,
      alpha: Double = 0.1): DataFrame = {
    require(perms >= 1, "perms >= 1")
    val base = df.select(col(idCol).cast("string").as("__id"),
        col(groupCol).as("__g"),
        col(valueCol).cast("decimal(18,6)").as("__v"))
      .localCheckpoint(false) // consumers: group stats + null draws
    def d(c: Column) = c.cast("double")
    val gs = base.groupBy(col("__g"))
      .agg(count(lit(1)).as("__ng"), sum(col("__v")).as("__sg"))
    val tot = gs.agg(sum(col("__ng")).as("__n"), sum(col("__sg")).as("__s"))
    val obs = gs.crossJoin(tot)
      .select(col("__g"), col("__ng"), col("__n"),
        (d(col("__sg")) / d(col("__ng")) -
          (d(col("__s")) - d(col("__sg"))) /
          (d(col("__n")) - d(col("__ng")))).as("__obs"),
        (d(col("__ng")) / d(col("__n"))).as("__share"))
      .localCheckpoint(false) // joined by the draws AND the p rollup
    val m = obs.count().toInt // group cardinality — model-sized
    val drawn = base
      .join(obs.select(col("__g"), col("__share")), Seq("__g"))
      .select(col("__g"), col("__v"), col("__share"),
        explode(sequence(lit(0), lit(perms - 1))).as("__k"),
        col("__id"))
      .withColumn("__t",
        Dedup.seededHash(seed, concat(col("__g").cast("string"), lit("|"),
          col("__k").cast("string"), lit("|"), col("__id"))).cast("double") /
          lit((1L << 60).toDouble) < col("__share"))
      .groupBy(col("__g"), col("__k"))
      .agg(sum(when(col("__t"), col("__v"))).as("__st"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("__nt"),
        sum(when(!col("__t"), col("__v"))).as("__su"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("__nu"))
      .select(col("__g"),
        (d(col("__st")) / d(col("__nt")) - d(col("__su")) / d(col("__nu")))
          .as("__pd"))
    val pv = drawn.join(obs.select(col("__g"), col("__obs")), Seq("__g"))
      .groupBy(col("__g"))
      .agg(max(col("__obs")).as("__obs"),
        count(lit(1)).as("__np"),
        sum(when(abs(col("__pd")) >= abs(col("__obs")), 1L).otherwise(0L))
          .as("__ne"))
      .select(col("__g"),
        round(col("__obs"), 6).as("obs_diff"),
        ((col("__ne") + 1).cast("double") / (col("__np") + 1).cast("double"))
          .as("__p"))
    val ranked = pv.withColumn("p_rank",
      row_number().over(Window.orderBy(col("__p"), col("__g"))).cast("long"))
    // standard BH q-value clamps each step at 1 BEFORE the reverse
    // running min — without it q_value > 1 leaks out for high ranks
    val qv = ranked.withColumn("__q",
      min(least(lit(1.0),
        col("__p") * lit(m.toDouble) / col("p_rank").cast("double"))).over(
        Window.orderBy(col("p_rank").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    qv.select(col("__g").as("group"), col("obs_diff"),
      round(col("__p"), 6).as("p_value"), col("p_rank"),
      round(col("__q"), 6).as("q_value"),
      (col("__q") <= lit(alpha)).as("reject"))
  }

  /** Delete-one-bucket jackknife for a RATIO metric (Quenouille/Tukey;
    * the standard error every ratio metric in an A/B readout needs —
    * the naive per-row variance is WRONG for sum(num)/sum(den)):
    * buckets partition the rows; replicate i recomputes the ratio with
    * bucket i removed, and SE² = (B−1)/B · Σ(R_i − R̄)². Deterministic,
    * closed-form, no resampling randomness.
    *
    * Float discipline: bucket sums are exact DECIMAL; replicate ratios
    * divide exact decimal differences; the R̄ and Σ(R_i−R̄)² folds sum
    * 9-dp decimal terms over the BUCKET table. Output: 1 row
    * (n_buckets, ratio, se_jack, ci_lo, ci_hi) at ±1.96·SE.
    *
    * Scale shape: ONE bucket-keyed aggregate over the fact; the
    * replicas are bucket-table arithmetic (B rows by contract). */
  def jackknifeRatio(df: DataFrame, bucketCol: Column, numCol: String,
      denCol: String): DataFrame = {
    val b = df.select(bucketCol.as("__b"),
        col(numCol).cast("decimal(18,6)").as("__n"),
        col(denCol).cast("decimal(18,6)").as("__d"))
      .groupBy(col("__b"))
      .agg(sum(col("__n")).as("__sn"), sum(col("__d")).as("__sd"))
    val w = Window.partitionBy()
    val dec = b
      .withColumn("__tn", sum(col("__sn")).over(w))
      .withColumn("__td", sum(col("__sd")).over(w))
      .withColumn("__nb", count(lit(1)).over(w))
    def d(c: Column) = c.cast("double")
    val ri = (d(col("__tn")) - d(col("__sn"))) /
      (d(col("__td")) - d(col("__sd")))
    val terms = dec.select(col("__nb"), col("__tn"), col("__td"),
        ri.as("__ri"),
        round(ri, 9).cast("decimal(18,9)").as("__rt"))
    val m = terms.groupBy(col("__nb"), col("__tn"), col("__td"))
      .agg(sum(col("__rt")).as("__sr"))
    val withMean = terms.join(m, Seq("__nb", "__tn", "__td"))
      .withColumn("__rbar",
        col("__sr").cast("double") / col("__nb").cast("double"))
      .select(col("__nb"), col("__tn"), col("__td"),
        round((col("__ri") - col("__rbar")) * (col("__ri") - col("__rbar")), 9)
          .cast("decimal(18,9)").as("__sq"))
    withMean.groupBy(col("__nb").as("n_buckets"), col("__tn"), col("__td"))
      .agg(sum(col("__sq")).as("__ssq"))
      .select({
        val r = d(col("__tn")) / d(col("__td"))
        val bD = col("n_buckets").cast("double")
        val se = sqrt((bD - lit(1.0)) / bD * col("__ssq").cast("double"))
        Seq(col("n_buckets"), round(r, 6).as("ratio"),
          round(se, 6).as("se_jack"),
          round(r - lit(1.959963984540054) * se, 6).as("ci_lo"),
          round(r + lit(1.959963984540054) * se, 6).as("ci_hi"))
      }: _*)
  }

  /** Sample-ratio-mismatch guard (the first thing a trustworthy A/B
    * system checks — Fabijan et al. 2019): χ² of the observed arm
    * counts against the intended allocation, flagged against the
    * df=1 critical value 3.841 (α = 0.05, a shared literal — no χ²
    * CDF in either engine). A triggered SRM invalidates the experiment
    * before any metric is read.
    *
    * Scale shape: ONE arm count + 2-row arithmetic. Output: 1 row
    * (n_a, n_b, expected_share_a, chi2, srm_flag). */
  def srmCheck(df: DataFrame, armCol: String,
      expectedShareA: Double = 0.5): DataFrame = {
    val arms = df.groupBy(col(armCol).as("__arm"))
      .agg(count(lit(1)).as("__n"))
    def d(c: Column) = c.cast("double")
    val two = arms.agg(
      min(struct(col("__arm"), col("__n"))).as("__m"),
      sum(col("__n")).as("__nt"))
      .select(col("__m.__n").as("__na"), col("__nt"))
    two.select({
      val na = d(col("__na")); val nt = d(col("__nt"))
      val nb = nt - na
      val ea = nt * lit(expectedShareA)
      val eb = nt * lit(1.0 - expectedShareA)
      val chi2 = (na - ea) * (na - ea) / ea + (nb - eb) * (nb - eb) / eb
      Seq(col("__na").cast("long").as("n_a"),
        (col("__nt") - col("__na")).cast("long").as("n_b"),
        lit(expectedShareA).as("expected_share_a"),
        round(chi2, 6).as("chi2"),
        (chi2 > lit(3.841)).as("srm_flag"))
    }: _*)
  }

  /** Deterministic permutation test for a difference in group means
    * (Fisher 1935 randomization inference — exact-by-construction,
    * no normality assumption, the q232 z-test's nonparametric check):
    * the observed |meanA − meanB| is compared against `perms`
    * re-randomized assignments drawn from seeded md5 bits, and
    * p = (1 + #{|diff_k| ≥ |obs|}) / (perms + 1) — reproducible
    * anywhere, like every seeded draw in the engine.
    *
    * Scale shape: ONE (perm, arm) aggregate over a ×perms explode
    * (perms is the documented cost knob — shuffle volume is
    * perms × 2 partial rows per partition, NOT perms × data), plus the
    * 1-row observed aggregate. Output: 1 row
    * (n, obs_diff, n_perms, n_extreme, p_value). */
  def permutationTest(df: DataFrame, idCol: String, valueCol: String,
      armPred: Column, perms: Int = 64, seed: Int = 23): DataFrame = {
    require(perms >= 1, "perms >= 1")
    val base = df.select(col(idCol).cast("string").as("__id"),
        col(valueCol).cast("decimal(18,6)").as("__v"), armPred.as("__a"))
      .localCheckpoint(false) // consumers: observed + permuted passes
    def d(c: Column) = c.cast("double")
    def diff(g: DataFrame, flag: String) = g
      .agg(count(lit(1)).as("n"),
        sum(when(col(flag), col("__v"))).as("__sa"),
        sum(when(col(flag), 1L).otherwise(0L)).as("__na"),
        sum(when(!col(flag), col("__v"))).as("__sb"),
        sum(when(!col(flag), 1L).otherwise(0L)).as("__nb"))
      .select(col("n"),
        (d(col("__sa")) / d(col("__na")) - d(col("__sb")) / d(col("__nb")))
          .as("diff"))
    val obs = diff(base, "__a")
    val permed = base.select(col("__v"),
        explode(sequence(lit(0), lit(perms - 1))).as("__k"),
        col("__id"))
      .withColumn("__pa", pmod(Dedup.seededHash(seed,
        concat(col("__k").cast("string"), lit("|"), col("__id"))),
        lit(2L)) === 0L)
      .groupBy(col("__k"))
      .agg(sum(when(col("__pa"), col("__v"))).as("__sa"),
        sum(when(col("__pa"), 1L).otherwise(0L)).as("__na"),
        sum(when(!col("__pa"), col("__v"))).as("__sb"),
        sum(when(!col("__pa"), 1L).otherwise(0L)).as("__nb"))
      .select(col("__k"),
        (d(col("__sa")) / d(col("__na")) - d(col("__sb")) / d(col("__nb")))
          .as("__pd"))
    permed.crossJoin(obs)
      .agg(max(col("n")).as("n"),
        round(max(col("diff")), 6).as("obs_diff"),
        count(lit(1)).as("n_perms"),
        sum(when(abs(col("__pd")) >= abs(col("diff")), 1L).otherwise(0L))
          .as("n_extreme"))
      .select(col("n"), col("obs_diff"), col("n_perms"), col("n_extreme"),
        round((col("n_extreme") + 1).cast("double") /
          (col("n_perms") + 1).cast("double"), 6).as("p_value"))
  }

  /** Randomized response (Warner 1965 — the LOCAL-DP mechanism the
    * central-DP Laplace histogram pairs with): each row reports its
    * true boolean with probability `p`, otherwise a fair coin; the
    * group-level rate debiases as (obs − (1−p)/2) / p. Both draws are
    * the engine's seeded md5 uniforms, so the noisy microdata — not
    * just the aggregate — is reproducible across engines and layouts.
    * ε ledger: ε = ln((p + (1−p)/2) / ((1−p)/2)).
    *
    * Scale shape: map-only response arithmetic + ONE group aggregate.
    * Output: (group, n, n_obs_yes, obs_rate, est_rate, true_rate). */
  def randomizedResponse(df: DataFrame, idCol: String, groupCol: String,
      truthCol: Column, p: Double, seed: Int = 11): DataFrame = {
    require(p > 0 && p < 1, "p in (0,1)")
    val denom = lit((1L << 60).toDouble)
    val u1 = Dedup.seededHash(seed, col(idCol).cast("string"))
      .cast("double") / denom
    val u2 = Dedup.seededHash(seed + 1, col(idCol).cast("string"))
      .cast("double") / denom
    val observed = when(u1 < lit(p), truthCol).otherwise(u2 < lit(0.5))
    df.select(col(groupCol).as("group"), truthCol.as("__y"),
        observed.as("__obs"))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__obs"), 1L).otherwise(0L)).as("n_obs_yes"),
        round(sum(when(col("__obs"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double"), 6).as("obs_rate"),
        round((sum(when(col("__obs"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double") - lit((1.0 - p) / 2)) / lit(p), 6)
          .as("est_rate"),
        round(sum(when(col("__y"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double"), 6).as("true_rate"))
  }

  /** Seeded-Laplace differentially-private histogram (the Laplace
    * mechanism, Dwork et al. 2006; sensitivity 1 for disjoint count
    * queries → noise b = 1/ε): per key, true count + count ⊕
    * Laplace(1/ε) noise drawn from the key's seeded md5 uniform via the
    * inverse CDF — REPRODUCIBLE across engines, runs and cluster
    * layouts, exactly like the sampling/split operators' md5 draws
    * (a fresh-random mechanism would not be oracle-checkable; the ε
    * ledger and mechanism shape are what this op pins). Output:
    * (key, n_true, n_noisy, epsilon).
    *
    * Scale shape: ONE key-keyed count, then map-only noise arithmetic
    * on the key-sized table. */
  def laplaceNoisyCounts(df: DataFrame, keyCol: String, eps: Double,
      seed: Int = 7): DataFrame = {
    require(eps > 0, "epsilon must be positive")
    val cnt = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n_true"))
    val u = Dedup.seededHash(seed, col("key")).cast("double") /
      lit((1L << 60).toDouble) // uniform [0,1)
    val c = u - lit(0.5)
    val noise = (lit(-1.0 / eps) * signum(c) *
      log(greatest(lit(1e-12), lit(1.0) - lit(2.0) * abs(c))))
    cnt.select(col("key"), col("n_true"),
      round(col("n_true").cast("double") + noise, 6).as("n_noisy"),
      lit(eps).as("epsilon"))
  }
}
