package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-structure analytics — the quantitative half of the reference's
  * import-market reports (key players, shares, concentration;
  * `Report/Indonesia Excavator Import Report 2023.pdf` tables, SURVEY
  * §2.7/§3): Herfindahl–Hirschman concentration, top-k concentration
  * ratios, Benford first-digit audit for declared-amount anomaly
  * screening, and a Laspeyres price index against a base period.
  *
  * Scale shapes: every op aggregates the fact table ONCE on its
  * group key (partial-combining sums in DECIMAL so totals are exact
  * and order-independent), then finishes on the aggregated rows —
  * windows and ratio arithmetic run on (markets × firms)-sized or
  * digit-sized tables, never on facts. No broadcast hints; AQE picks
  * the join-back strategy from actual sizes. */
object Market {

  /** Per-market concentration: firm count, HHI (sum of squared
    * revenue shares) and CR`k` (top-k firms' revenue share).
    * HHI = Σ rev_i² / (Σ rev_i)² with both sums exact DECIMAL over
    * the firm-level table, so no share-rounding or float-sum-order
    * drift; ties in the CR ranking break on the firm key. Output:
    * (market, n_firms, hhi, crk) — hhi/crk rounded to 6. */
  def concentration(df: DataFrame, marketCol: String, firmCol: String,
      valueCol: String, k: Int): DataFrame = {
    val firm = df.groupBy(col(marketCol).as("market"), col(firmCol).as("firm"))
      .agg(sum(col(valueCol).cast("decimal(18,6)")).as("rev"))
    // the rank is only ever compared to k, so FILTER on it instead of
    // decorating: the rank-≤-k filter plans as WindowGroupLimit (per-
    // map-partition top-k pushdown), which bounds each market's window
    // input to k × #partitions — a full per-market rank would put every
    // firm of a segment on one task (markets are a handful-sized domain)
    val topk = firm.withColumn("rk",
        row_number().over(Window.partitionBy(col("market"))
          .orderBy(col("rev").desc, col("firm"))))
      .filter(col("rk") <= k)
      .groupBy(col("market")).agg(sum(col("rev")).as("topk"))
    firm.groupBy(col("market"))
      .agg(count(lit(1)).as("n_firms"),
        sum(col("rev") * col("rev")).as("ss"),
        sum(col("rev")).as("tot"))
      .join(topk, Seq("market")) // market-sized join, both sides tiny
      .select(col("market"), col("n_firms"),
        // divisions happen on doubles cast from EXACT decimals — decimal
        // division itself rounds differently per engine, IEEE doesn't
        round(col("ss").cast("double") / (col("tot") * col("tot")).cast("double"), 6).as("hhi"),
        round(col("topk").cast("double") / col("tot").cast("double"), 6).as("crk"))
  }

  /** Pareto ABC classification: items sorted by revenue desc (ties on
    * the item key), class A while the inclusive cumulative share is
    * ≤ 80 %, B while ≤ 95 %, C after. The share boundaries compare as
    * exact decimals (cum·5 ≤ tot·4, cum·20 ≤ tot·19 — no float share),
    * so the class cut is engine-exact. Output per class: item count and
    * revenue share (round 6).
    *
    * Scale shape: ONE fact aggregate to items, then
    * `Ranks.runningDecimalSums` over the ITEM table — items scale with
    * the catalog (`l_partkey`-class keys), so the revenue-ordered
    * cumulative runs as a range exchange + partition walk, never a
    * single-partition window; the grand total rides out of the same
    * partials collect as an exact decimal literal. Class-sized output. */
  def paretoAbc(df: DataFrame, itemCol: String, valueCol: String): DataFrame = {
    val item = df.groupBy(col(itemCol).as("item"))
      .agg(sum(col(valueCol).cast("decimal(18,6)")).as("rev"))
    val run = Ranks.runningDecimalSums(item, Seq("rev" -> "__cum"), None,
      col("rev").desc, col("item"))
    val tot = lit(run.totals("rev")).cast("decimal(28,6)")
    run.df
      .withColumn("clazz",
        when(col("__cum") * 5 <= tot * 4, "A")
          .when(col("__cum") * 20 <= tot * 19, "B")
          .otherwise("C"))
      .groupBy(col("clazz"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("rev")).cast("double") / tot.cast("double"), 6)
          .as("rev_share"))
  }

  /** Per-item price volatility: coefficient of variation of the monthly
    * unit price, population formula from exact fixed-point sums —
    *   cv = sqrt(n·Σp² − (Σp)²) / Σp
    * with p the 9-dp monthly unit price (DECIMAL), so Σp and Σp² are
    * exact and cv is bit-stable. Items with fewer than `minPeriods`
    * priced months are excluded (a 1-month item has no volatility).
    * Output: top-`topN` (item, n_periods, mean_price, cv), cv desc.
    *
    * Scale shape: ONE fact aggregate to (item, period), ONE item-keyed
    * partial-combining aggregate over the period rows, TakeOrdered. */
  def priceVolatility(df: DataFrame, itemCol: String, periodCol: String,
      qtyCol: String, valueCol: String, minPeriods: Int, topN: Int): DataFrame = {
    val ip = df.groupBy(col(itemCol).as("item"), col(periodCol).as("period"))
      .agg(sum(col(valueCol).cast("decimal(18,6)")).as("v"),
        sum(col(qtyCol).cast("decimal(18,6)")).as("q"))
      .where(col("q") > 0)
      .select(col("item"),
        round(col("v").cast("double") / col("q").cast("double"), 9)
          .cast("decimal(15,9)").as("p"))
    val agg = ip.groupBy(col("item")).agg(
      count(lit(1)).as("n_periods"),
      sum(col("p")).as("__sp"),
      sum(col("p") * col("p")).as("__spp"))
    val nD = col("n_periods").cast("double")
    agg.where(col("n_periods") >= minPeriods && col("__sp") > 0)
      .select(col("item"), col("n_periods"),
        round(col("__sp").cast("double") / nD, 6).as("mean_price"),
        // greatest(·, 0): the true variance is ≥ 0 but the double
        // rendering of the exact sums can land at −1e-18 → sqrt NaN
        round(sqrt(greatest(nD * col("__spp").cast("double") -
          col("__sp").cast("double") * col("__sp").cast("double"), lit(0.0))) /
          col("__sp").cast("double"), 6).as("cv"))
      .orderBy(col("cv").desc, col("item"))
      .limit(topN)
  }

  /** Per-group market-share trend: monthly revenue share of each group
    * (exact decimal revenue / exact month total, 9-dp fixed point),
    * then the OLS slope of share against the month INDEX (0-based rank
    * of the calendar month — exact integer x, exact decimal y, the
    * trendPerKey normal equations). The "who is gaining share"
    * table behind the reference's year-over-year key-player narrative.
    * Output: (group, n_months, mean_share, slope ← round 9).
    *
    * Scale shape: ONE fact aggregate to (group, month); the month-index
    * table derives from the aggregated months (tiny window); the slope
    * aggregate runs over group×month rows. */
  def shareTrend(df: DataFrame, groupCol: String, periodCol: String,
      valueCol: String): DataFrame = {
    val gm = df.groupBy(col(groupCol).as("grp"), col(periodCol).as("period"))
      .agg(sum(col(valueCol).cast("decimal(18,6)")).as("rev"))
      .localCheckpoint(false)
    val tot = gm.groupBy(col("period")).agg(sum(col("rev")).as("__tot"))
      .withColumn("__idx",
        (row_number().over(Window.orderBy(col("period"))) - 1).cast("long"))
    val sh = gm.join(tot, Seq("period"))
      .select(col("grp"), col("__idx"),
        round(col("rev").cast("double") / col("__tot").cast("double"), 9)
          .cast("decimal(12,9)").as("share"))
    val agg = sh.groupBy(col("grp")).agg(
      count(lit(1)).as("n_months"),
      sum(col("__idx")).as("__sx"),
      sum(col("share")).as("__sy"),
      sum(col("__idx").cast("decimal(12,0)") * col("share")).as("__sxy"),
      sum((col("__idx") * col("__idx")).cast("decimal(38,0)")).as("__sxx"))
    val nD = col("n_months").cast("double")
    def d(c: String) = col(c).cast("double")
    val den = nD * d("__sxx") - d("__sx") * d("__sx")
    agg.select(col("grp"), col("n_months"),
      round(d("__sy") / nD, 6).as("mean_share"),
      when(col("n_months") >= 2 && den =!= 0.0,
        round((nD * d("__sxy") - d("__sx") * d("__sy")) / den, 9)).as("slope"))
  }

  /** Gini coefficient of revenue inequality per market, from the exact
    * rank formula over ascending-sorted firm revenues:
    *   G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i),  x sorted asc, i = 1…n
    * Both sums are exact DECIMAL (rank · DECIMAL(18,6) products stay
    * inside precision 38), so G is bit-stable; ties sort on the firm
    * key. Zero total revenue yields NULL. Output: (market, n_firms,
    * gini ← round 6).
    *
    * Scale shape: the same ONE fact aggregate to (market, firm) as
    * `concentration`, then a market-keyed sort window over firm rows. */
  def gini(df: DataFrame, marketCol: String, firmCol: String,
      valueCol: String): DataFrame = {
    val firm = df.groupBy(col(marketCol).as("market"), col(firmCol).as("firm"))
      .agg(sum(col(valueCol).cast("decimal(18,6)")).as("rev"))
    // Gini needs the FULL ascending rank per market (not a top-k), and
    // markets are a handful-sized domain over customer-scaled firm rows
    // — the grouped row-number hatch keeps the rank distributed instead
    // of one task per market
    Ranks.withRowNumberBy(firm, Seq("market"), "__i",
        col("rev").asc, col("firm"))
      .groupBy(col("market"))
      .agg(count(lit(1)).as("n_firms"),
        sum(col("rev")).as("__s"),
        sum(col("__i").cast("decimal(12,0)") * col("rev")).as("__si"))
      .withColumn("gini",
        when(col("__s") > 0, round(
          (lit(2.0) * col("__si").cast("double") -
            (col("n_firms") + 1).cast("double") * col("__s").cast("double")) /
          (col("n_firms").cast("double") * col("__s").cast("double")), 6)))
      .drop("__s", "__si")
  }

  /** Benford first-significant-digit audit over a positive amount
    * column: per digit 1–9 the observed count, observed share,
    * Benford-expected share log10(1+1/d), and the χ² contribution
    * (obs − exp·N)²/(exp·N). The first digit is taken from the
    * DECIMAL(18,6) string rendering (plain notation in every engine —
    * a raw double cast can go scientific), so amounts down to 1e-6
    * resolve identically everywhere. Map-only + a 9-row aggregate. */
  def benford(df: DataFrame, amountCol: String): DataFrame = {
    val amounts = df
      .where(col(amountCol).isNotNull && col(amountCol) > 0)
      .select(regexp_extract(col(amountCol).cast("decimal(18,6)").cast("string"),
        "[1-9]", 0).cast("int").as("digit"))
      .where(col("digit").isNotNull)
    val n = amounts.count()
    amounts.groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
      .withColumn("share", round(col("n_obs").cast("double") / lit(n.toDouble), 6))
      .withColumn("expected", round(log(10.0, lit(1.0) + lit(1.0) / col("digit")), 6))
      .withColumn("chi2_term", round(
        pow(col("n_obs").cast("double") - col("expected") * lit(n.toDouble), 2)
          / (col("expected") * lit(n.toDouble)), 6))
      .orderBy(col("digit"))
  }

  /** Laspeyres price index per period against the globally earliest
    * period: index_t = Σ_i p_{i,t}·q_{i,0} / Σ_i p_{i,0}·q_{i,0},
    * over the items present in BOTH the base period and period t.
    * Unit price p = Σ value / Σ qty per (item, period), rounded to 9
    * decimals (fixed point) so the q0-weighted sums are exact DECIMAL
    * and order-independent. Output: (period, n_items, index).
    *
    * One fact-table aggregate to (item, period); the base-period
    * slice joins back item-keyed (AQE-broadcast at dimension scale);
    * the index aggregate runs over item×period rows. */
  def laspeyresIndex(df: DataFrame, itemCol: String, periodCol: String,
      qtyCol: String, valueCol: String): DataFrame = {
    val ip0 = df.groupBy(col(itemCol).as("item"), col(periodCol).as("period"))
      .agg(sum(col(valueCol).cast("decimal(18,6)")).as("v"),
        sum(col(qtyCol).cast("decimal(18,6)")).as("q"))
      .where(col("q") > 0)
      // DECIMAL(15,9): price ≤ 1e6 by domain, and 15+18-digit products
      // stay under Spark's 38-precision cap (DECIMAL(34,15)) — exact
      .select(col("item"), col("period"),
        round(col("v").cast("double") / col("q").cast("double"), 9)
          .cast("decimal(15,9)").as("p"),
        col("q"))
    // the (item, period) aggregate feeds three consumers (base-period
    // scalar, base slice, index join) — checkpoint it so the fact-table
    // aggregation runs once; the checkpoint is item×period-sized
    val ip = ip0.localCheckpoint(false)
    val basePeriod = ip.agg(min(col("period"))).head().get(0)
    val base = ip.where(col("period") === lit(basePeriod))
      .select(col("item"), col("p").as("p0"), col("q").as("q0"))
    ip.join(base, "item")
      .groupBy(col("period"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("p") * col("q0")).as("num"),
        sum(col("p0") * col("q0")).as("den"))
      .select(col("period"), col("n_items"),
        round(col("num").cast("double") / col("den").cast("double"), 6).as("price_index"))
  }

  /** Basket co-occurrence lift over (basket, item) pairs — the
    * market-basket association mining staple:
    *   lift(a,b) = N · n_ab / (n_a · n_b)
    * over DISTINCT item incidence per basket (a basket counts an item
    * once however many lines carry it). Count products go through
    * DOUBLE before dividing (hot items can't overflow int64); pairs
    * below `minPairs` support are dropped (the standard spurious-lift
    * guard).
    *
    * Scale shape: ONE distinct shuffle to (basket, item); the pair
    * self-join is keyed on the basket id with fanout ≤ items-per-basket²
    * — bounded by the ITEM-DOMAIN cardinality (a contract bound: brands
    * ≤ 25 here), never by basket count; pair/marginal counts are
    * partial-combining; output is item-pair-sized. */
  def copurchaseLift(baskets: DataFrame, basketCol: String, itemCol: String,
      minPairs: Long): DataFrame = {
    val bi = baskets.select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .distinct()
      .localCheckpoint(false) // 3 consumers: item counts, total, pair join
    val nBaskets = bi.agg(countDistinct(col("__bk")).as("__n"))
    val ic = bi.groupBy(col("__it")).agg(count(lit(1)).as("__ci"))
    val pairs = bi.join(
        bi.select(col("__bk"), col("__it").as("__it2")),
        Seq("__bk"))
      .where(col("__it") < col("__it2"))
      .groupBy(col("__it").as("item_a"), col("__it2").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairs)
    def d(c: String) = col(c).cast("double")
    pairs
      .join(ic.select(col("__it").as("item_a"), col("__ci").as("__ca")), "item_a")
      .join(ic.select(col("__it").as("item_b"), col("__ci").as("__cb")), "item_b")
      .crossJoin(nBaskets)
      .select(col("item_a"), col("item_b"), col("n_ab"),
        round(d("__n") * d("n_ab") / (d("__ca") * d("__cb")), 6).as("lift"))
  }

  /** Stratified (blocked) treatment-effect estimate: within each
    * stratum the treated−control mean difference, combined into an ATE
    * weighted by the stratum's population share — the standard
    * confounder-adjustment when treatment correlates with an observable
    * (the raw mean difference would mix effect with composition; the
    * q262 mix/within lesson applied to causal reads). Strata missing
    * either arm are reported with NULL effect and excluded from the
    * ATE, whose weights renormalize over the usable strata.
    *
    * Scale shape: ONE (stratum, treated) aggregate over the fact;
    * everything else is strata-sized (the 1-row ATE cross-joins back).
    * Output per stratum: (stratum, n_treat, n_ctrl, effect, ate). */
  def stratifiedEffect(df: DataFrame, strataCol: Column, treatedCol: Column,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("decimal(18,6)")
    val cells = df.groupBy(strataCol.as("stratum"))
      .agg(sum(when(treatedCol, 1L).otherwise(0L)).as("n_treat"),
        sum(when(treatedCol, v)).as("__st"),
        sum(when(!treatedCol, 1L).otherwise(0L)).as("n_ctrl"),
        sum(when(!treatedCol, v)).as("__sc"))
      .localCheckpoint(false) // per-stratum rows + the ATE aggregate
    val usable = col("n_treat") > 0 && col("n_ctrl") > 0
    val effect = col("__st").cast("double") / col("n_treat").cast("double") -
      col("__sc").cast("double") / col("n_ctrl").cast("double")
    // exact weighted sum: w as DECIMAL(13,0) (stratum sizes < 10^13 by
    // contract) × 9-dp effect → DECIMAL(32,9), order-free — a double
    // Σw·e over strata would be fold-order-dependent
    val wEff = cells.select(
      when(usable, (col("n_treat") + col("n_ctrl")).cast("decimal(13,0)"))
        .as("__w"),
      when(usable, round(effect, 9).cast("decimal(18,9)")).as("__e"))
    val ate = wEff.agg(
      (sum(col("__w") * col("__e")).cast("double") /
        sum(col("__w")).cast("double")).as("__ate"))
    cells.crossJoin(ate)
      .select(col("stratum"), col("n_treat"), col("n_ctrl"),
        when(usable, round(effect, 6)).as("effect"),
        round(col("__ate"), 6).as("ate"))
  }

  /** Difference-in-differences estimate over a 2×2 (treated × post)
    * design: DiD = (T̄post − T̄pre) − (C̄post − C̄pre) — the standard
    * "did the treatment move the metric beyond the secular trend"
    * read. Cell sums are exact DECIMAL; the four means and the
    * difference compute once on the 1-row aggregate; an EMPTY cell
    * yields NULL DiD (no silent zero).
    *
    * Scale shape: ONE conditional-sum aggregate over the fact — no
    * groupBy, no join. Output: 1 row (n, the 4 cell means, did). */
  def diffInDiff(df: DataFrame, treatedCol: Column, postCol: Column,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("decimal(18,6)")
    def cell(t: Boolean, p: Boolean, suffix: String) = Seq(
      sum(when(treatedCol === t && postCol === p, v)).as(s"__s$suffix"),
      sum(when(treatedCol === t && postCol === p, 1L).otherwise(0L))
        .as(s"__n$suffix"))
    val cells = cell(true, false, "tp0") ++ cell(true, true, "tp1") ++
      cell(false, false, "cp0") ++ cell(false, true, "cp1")
    val agg = df.agg(count(lit(1)).as("n"), cells: _*)
    def m(s: String) = col(s"__s$s").cast("double") / col(s"__n$s").cast("double")
    val allCells = col("__ntp0") > 0 && col("__ntp1") > 0 &&
      col("__ncp0") > 0 && col("__ncp1") > 0
    agg.select(col("n"),
      round(m("tp0"), 6).as("mean_treat_pre"),
      round(m("tp1"), 6).as("mean_treat_post"),
      round(m("cp0"), 6).as("mean_ctrl_pre"),
      round(m("cp1"), 6).as("mean_ctrl_post"),
      when(allCells,
        round((m("tp1") - m("tp0")) - (m("cp1") - m("cp0")), 6)).as("did"))
  }

  /** Log-log price elasticity per group: the OLS slope of ln(quantity)
    * on ln(unit price) across periods, where each period's unit price
    * is the value-weighted Σvalue/Σqty. The ln terms are 9-dp fixed
    * point (engine-exact transcendentals — the q42/q127 discipline), so
    * the OLS sums are EXACT decimals and the one slope division runs on
    * identical inputs. Degenerate price variance → NULL.
    *
    * Scale shape: ONE (group, period) aggregate over the fact; the
    * regression runs on the group×period table. Output:
    * (group, n_periods, elasticity). */
  def priceElasticity(df: DataFrame, groupCol: String, periodCol: Column,
      qtyCol: String, valueCol: String): DataFrame = {
    val gp = df.groupBy(col(groupCol).as("grp"), periodCol.as("__p"))
      .agg(sum(col(qtyCol).cast("decimal(18,6)")).as("__q"),
        sum(col(valueCol).cast("decimal(18,6)")).as("__r"))
      .where(col("__q") > 0 && col("__r") > 0)
      .select(col("grp"),
        round(log(col("__r").cast("double") / col("__q").cast("double")), 9)
          .cast("decimal(12,9)").as("__x"),
        round(log(col("__q").cast("double")), 9)
          .cast("decimal(12,9)").as("__y"))
      // the 9-dp value as an INTEGER (×10⁹): the degeneracy guard needs
      // variance == 0 decided EXACTLY — a double-arithmetic vx turns a
      // constant price column into ±1e-16 noise and a garbage slope
      .withColumn("__x9", (col("__x") * lit(1000000000L)).cast("long"))
    val agg = gp.groupBy(col("grp")).agg(count(lit(1)).as("n_periods"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__x9").cast("decimal(38,0)")).as("__sx9"),
      sum((col("__x9").cast("decimal(19,0)") *
        col("__x9").cast("decimal(19,0)"))).as("__sxx9"))
    def d(c: String) = col(c).cast("double")
    val nD = col("n_periods").cast("double")
    val vx = nD * d("__sxx") - d("__sx") * d("__sx")
    val vxExact = col("n_periods").cast("decimal(38,0)") * col("__sxx9") -
      col("__sx9") * col("__sx9")
    agg.select(col("grp"), col("n_periods"),
      when(col("n_periods") >= 2 && vxExact > 0,
        round((nD * d("__sxy") - d("__sx") * d("__sy")) / vx, 6))
        .as("elasticity"))
  }

  /** Mix-shift decomposition of the overall-mean change between two
    * periods: with w_g = group row share and m_g = group mean,
    *   M_B − M_A = Σ_g (w_gB − w_gA)·m_gA  +  Σ_g w_gB·(m_gB − m_gA)
    *               └── mix (composition) ──┘  └── within (rate) ──┘
    * — the "did revenue/quality move because the MIX changed or because
    * groups themselves changed?" ledger an analyst reads before blaming
    * a segment. Group sums are exact DECIMAL; the double share/mean
    * expressions run once per group on identical sums. Groups absent
    * from either period are dropped (inner join) — their contribution
    * belongs to an entry/exit line, not mix/within.
    *
    * Scale shape: ONE (period, group) aggregate over the fact filtered
    * to the two periods; everything after is group-table-sized. Output:
    * (group, w_a, w_b, m_a, m_b, mix_contrib, within_contrib). */
  def mixShift(df: DataFrame, groupCol: String, periodCol: Column,
      valueCol: String, periodA: String, periodB: String): DataFrame = {
    val pg = df.select(col(groupCol).as("grp"), periodCol.as("__p"),
        col(valueCol).cast("decimal(18,6)").as("__v"))
      .where(col("__p").isin(periodA, periodB))
      .groupBy(col("__p"), col("grp"))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"))
      .localCheckpoint(false) // consumers: period totals + both slices
    val tot = pg.groupBy(col("__p")).agg(sum(col("__n")).as("__tot"))
    val dec = pg.join(tot, "__p")
      .select(col("__p"), col("grp"),
        (col("__n").cast("double") / col("__tot").cast("double")).as("__w"),
        (col("__s").cast("double") / col("__n").cast("double")).as("__m"))
    val a = dec.where(col("__p") === periodA)
      .select(col("grp"), col("__w").as("__wa"), col("__m").as("__ma"))
    val b = dec.where(col("__p") === periodB)
      .select(col("grp"), col("__w").as("__wb"), col("__m").as("__mb"))
    a.join(b, "grp")
      .select(col("grp"),
        round(col("__wa"), 6).as("w_a"), round(col("__wb"), 6).as("w_b"),
        round(col("__ma"), 6).as("m_a"), round(col("__mb"), 6).as("m_b"),
        round((col("__wb") - col("__wa")) * col("__ma"), 6).as("mix_contrib"),
        round(col("__wb") * (col("__mb") - col("__ma")), 6).as("within_contrib"))
  }

  /** Elbow / knee point of the cumulative-share curve (the Kneedle
    * heuristic's exact discrete form: max vertical distance between the
    * normalized concentration curve and its chord): items rank by value
    * desc (ties on item), and the elbow is the rank maximizing
    * cum_share(i) − i/n — where returns start diminishing, i.e. THE
    * data-driven "how many top items matter" cut the fixed 80 % of
    * paretoAbc assumes. Output: 1 row
    * (n_items, elbow_rank, elbow_item, cum_share, max_gap).
    *
    * Scale shape: ONE fact aggregate to items, then ONE
    * `Ranks.runningDecimalSums` pass over the ITEM table emitting rank +
    * cumulative + total + count together (items scale with the catalog —
    * no single-partition window), and a TakeOrdered top-1 for the
    * arg-max; shares divide exact DECIMAL sums. */
  def elbowPoint(df: DataFrame, itemCol: String, valueCol: String): DataFrame = {
    val item = df.groupBy(col(itemCol).as("item"))
      .agg(sum(col(valueCol).cast("decimal(18,6)")).as("__v"))
    val run = Ranks.runningDecimalSums(item, Seq("__v" -> "__cum"),
      Some("__rk"), col("__v").desc, col("item"))
    def d(c: Column) = c.cast("double")
    val tot = lit(run.totals("__v")).cast("decimal(28,6)")
    val n = lit(run.rows)
    val gap = d(col("__cum")) / d(tot) - d(col("__rk")) / d(n)
    run.df.select(col("item"), col("__rk"),
        (d(col("__cum")) / d(tot)).as("__cs"), gap.as("__g"))
      .orderBy(col("__g").desc, col("__rk")).limit(1)
      .select(n.as("n_items"), col("__rk").as("elbow_rank"),
        col("item").as("elbow_item"), round(col("__cs"), 6).as("cum_share"),
        round(col("__g"), 6).as("max_gap"))
  }

  /** E-value sensitivity analysis (VanderWeele & Ding 2017): the
    * minimum strength of unmeasured confounding (on the risk-ratio
    * scale, with both confounder–treatment and confounder–outcome
    * associations) that could explain away an observed risk ratio:
    * E = RR* + √(RR*·(RR*−1)), RR* = max(RR, 1/RR). The one-line
    * robustness answer to "could a lurking variable have produced this
    * q374 effect". Output: 1 row
    * (n_treat, n_ctrl, rate_treat, rate_ctrl, rr, e_value).
    *
    * Scale shape: ONE 1-row conditional-count aggregate. */
  def eValue(df: DataFrame, treatPred: Column,
      outcomePred: Column): DataFrame = {
    val m = df.select(treatPred.as("__t"), outcomePred.as("__y"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("__nt"),
        sum(when(col("__t") && col("__y"), 1L).otherwise(0L)).as("__kt"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("__nc"),
        sum(when(!col("__t") && col("__y"), 1L).otherwise(0L)).as("__kc"))
    def d(c: Column) = c.cast("double")
    m.select({
      val rt = d(col("__kt")) / d(col("__nt"))
      val rc = d(col("__kc")) / d(col("__nc"))
      val rr = rt / rc
      val rrs = greatest(rr, lit(1.0) / rr)
      Seq(col("__nt").as("n_treat"), col("__nc").as("n_ctrl"),
        round(rt, 6).as("rate_treat"), round(rc, 6).as("rate_ctrl"),
        round(rr, 6).as("rr"),
        round(rrs + sqrt(rrs * (rrs - lit(1.0))), 6).as("e_value"))
    }: _*)
  }

  /** CUPED variance reduction (Deng et al. 2013 — the pre-experiment-
    * covariate adjustment every mature A/B platform applies): with
    * θ = cov(x, y)/var(x) over pre-period covariate x, the adjusted
    * metric y′ = y − θ(x − x̄) keeps the same expectation but sheds
    * cov²/var(x) of variance. Reports θ, the raw and adjusted metric
    * variances, the realized reduction, and the raw vs adjusted
    * arm-mean differences — all from ONE pass of exact DECIMAL moment
    * sums (overall + per-arm conditionals); doubles only in the final
    * ratios. Output: 1 row (n, theta, var_y, var_y_adj, var_reduction,
    * diff_raw, diff_adj). */
  def cuped(df: DataFrame, metricCol: Column, covariateCol: Column,
      armPred: Column): DataFrame = {
    def dec(c: Column) = c.cast("decimal(18,6)")
    def dec2(c: Column) = c.cast("decimal(38,12)")
    val m = df.select(dec(metricCol).as("__y"), dec(covariateCol).as("__x"),
        armPred.as("__a"))
      .agg(count(lit(1)).as("n"),
        sum(col("__y")).as("__sy"), sum(col("__x")).as("__sx"),
        sum(dec2(col("__x") * col("__y"))).as("__sxy"),
        sum(dec2(col("__x") * col("__x"))).as("__sxx"),
        sum(dec2(col("__y") * col("__y"))).as("__syy"),
        sum(when(col("__a"), 1L).otherwise(0L)).as("__na"),
        sum(when(col("__a"), col("__y"))).as("__sya"),
        sum(when(col("__a"), col("__x"))).as("__sxa"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("__nb"),
        sum(when(!col("__a"), col("__y"))).as("__syb"),
        sum(when(!col("__a"), col("__x"))).as("__sxb"))
    def d(c: Column) = c.cast("double")
    m.select({
      val nD = d(col("n"))
      val my = d(col("__sy")) / nD; val mx = d(col("__sx")) / nD
      val varY = d(col("__syy")) / nD - my * my
      val varX = d(col("__sxx")) / nD - mx * mx
      val covXY = d(col("__sxy")) / nD - mx * my
      val theta = covXY / varX
      val varAdj = varY - lit(2.0) * theta * covXY + theta * theta * varX
      val mya = d(col("__sya")) / d(col("__na"))
      val mxa = d(col("__sxa")) / d(col("__na"))
      val myb = d(col("__syb")) / d(col("__nb"))
      val mxb = d(col("__sxb")) / d(col("__nb"))
      Seq(col("n"), round(theta, 6).as("theta"),
        round(varY, 6).as("var_y"), round(varAdj, 6).as("var_y_adj"),
        round(lit(1.0) - varAdj / varY, 6).as("var_reduction"),
        round(mya - myb, 6).as("diff_raw"),
        round((mya - theta * mxa) - (myb - theta * mxb), 6).as("diff_adj"))
    }: _*)
  }

  /** Wald / two-stage-least-squares instrumental-variable estimate with
    * a single instrument (Angrist & Pischke, public literature):
    *   β_IV = cov(z, y) / cov(z, x)
    * plus the first-stage (cov(z,x)/var(z)) and reduced-form
    * (cov(z,y)/var(z)) slopes the estimate decomposes into. All three
    * moments come from exact DECIMAL sums of z, x, y, zx, zy, z² in ONE
    * aggregate — doubles only in the final ratios.
    *
    * Scale shape: one map-only moment projection + a 1-row aggregate.
    * Output: (n, first_stage, reduced_form, beta_iv) — rounded 6. */
  def ivEstimate(df: DataFrame, instrumentCol: Column, exposureCol: Column,
      outcomeCol: Column): DataFrame = {
    def dec(c: Column) = c.cast("decimal(18,6)")
    val m = df.select(dec(instrumentCol).as("__z"), dec(exposureCol).as("__x"),
        dec(outcomeCol).as("__y"))
      .agg(count(lit(1)).as("n"),
        sum(col("__z")).as("__sz"), sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum((col("__z") * col("__x")).cast("decimal(38,12)")).as("__szx"),
        sum((col("__z") * col("__y")).cast("decimal(38,12)")).as("__szy"),
        sum((col("__z") * col("__z")).cast("decimal(38,12)")).as("__szz"))
    def d(c: Column) = c.cast("double")
    m.select({
      val nD = d(col("n"))
      val czx = d(col("__szx")) / nD - (d(col("__sz")) / nD) * (d(col("__sx")) / nD)
      val czy = d(col("__szy")) / nD - (d(col("__sz")) / nD) * (d(col("__sy")) / nD)
      val vz = d(col("__szz")) / nD - (d(col("__sz")) / nD) * (d(col("__sz")) / nD)
      Seq(col("n"), round(czx / vz, 6).as("first_stage"),
        round(czy / vz, 6).as("reduced_form"),
        round(czy / czx, 6).as("beta_iv"))
    }: _*)
  }

  /** T-learner uplift deciles (Künzel et al. 2019's two-model scheme
    * with a categorical base learner; the heterogeneous-treatment-
    * effect step after the average effects of stratifiedEffect /
    * diffInDiff): per-stratum treated/control outcome rates fit on the
    * TRAIN split score every TEST row with û = r̂_t(s) − r̂_c(s); test
    * rows rank into `nBuckets` û-buckets (ties on id), and each bucket
    * reports its OBSERVED uplift — the honest-split check that high-û
    * buckets really do respond more.
    *
    * Scale shape: ONE (stratum × treated) train aggregate (model-sized),
    * test rows join it back (AQE broadcast), one ntile shuffle of test
    * rows, one bucket aggregate. Output: (bucket, n_treat, n_ctrl,
    * rate_treat, rate_ctrl, uplift_obs, mean_score) — rounded 6. */
  def upliftDeciles(df: DataFrame, idCol: String, stratumCol: String,
      treatPred: Column, outcomePred: Column, trainPred: Column,
      nBuckets: Int = 5): DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(stratumCol).as("__s"),
        treatPred.as("__t"), outcomePred.as("__y"), trainPred.as("__tr"))
      .localCheckpoint(false) // consumers: train rates + test scoring
    val rates = base.filter(col("__tr"))
      .groupBy(col("__s"), col("__t"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__k"))
      .select(col("__s"), col("__t"),
        (col("__k").cast("double") / col("__n").cast("double")).as("__r"))
    val rt = rates.filter(col("__t")).select(col("__s"), col("__r").as("__rt"))
    val rc = rates.filter(!col("__t")).select(col("__s"), col("__r").as("__rc"))
    val scored = base.filter(!col("__tr"))
      .join(rt, Seq("__s")).join(rc, Seq("__s"))
      .withColumn("__u", col("__rt") - col("__rc"))
    // fact-sized ntile via the range-partitioned exact-rank hatch —
    // never a single-partition window over the scored test rows
    val bucketed = Ranks.withNtile(scored, "bucket", nBuckets,
      col("__u").desc, col("__id"))
    bucketed.groupBy(col("bucket"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("n_treat"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("n_ctrl"),
        sum(when(col("__t") && col("__y"), 1L).otherwise(0L)).as("__kt"),
        sum(when(!col("__t") && col("__y"), 1L).otherwise(0L)).as("__kc"),
        sum(round(col("__u"), 9).cast("decimal(18,9)")).as("__su"),
        count(lit(1)).as("__n"))
      .select(col("bucket"), col("n_treat"), col("n_ctrl"),
        round(col("__kt").cast("double") / col("n_treat").cast("double"), 6)
          .as("rate_treat"),
        round(col("__kc").cast("double") / col("n_ctrl").cast("double"), 6)
          .as("rate_ctrl"),
        round(col("__kt").cast("double") / col("n_treat").cast("double") -
          col("__kc").cast("double") / col("n_ctrl").cast("double"), 6)
          .as("uplift_obs"),
        round(col("__su").cast("double") / col("__n").cast("double"), 6)
          .as("mean_score"))
  }

  /** Theil T inequality index with exact within/between-group
    * decomposition (Theil 1967) — the additive counterpart of [[gini]]:
    * T = Σᵢ (xᵢ/S)·ln(xᵢ/μ) splits as
    * T = Σ_g s_g·T_g  +  Σ_g s_g·ln(μ_g/μ)   (within + between),
    * with s_g the group's value share. Requires strictly positive
    * values (enforced by filter).
    *
    * Float discipline (the q151/mutualInformation contribution
    * pattern): per-row and per-group ln terms are rounded to 9 dp and
    * summed as DECIMAL, so both totals are partition-order-independent
    * and engine-exact; divisions run on doubles cast from exact
    * DECIMAL sums.
    *
    * Scale shape: ONE group aggregate for (n_g, S_g), one map-only
    * per-row term pass joined to the group table (AQE broadcast — the
    * group table is group-sized), ONE decimal term aggregate. Output:
    * 1 row (n, n_groups, theil_total, theil_within, theil_between). */
  def theilDecompose(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val rows = df.select(col(groupCol).as("__g"),
        col(valueCol).cast("decimal(18,6)").as("__x"))
      .where(col("__x") > 0)
    val grp = rows.groupBy(col("__g"))
      .agg(count(lit(1)).as("__ng"), sum(col("__x")).as("__sg"))
      .localCheckpoint(false) // consumers: totals, between terms, row join
    val tot = grp.agg(sum(col("__ng")).as("__n"), sum(col("__sg")).as("__s"))
    def d(c: Column) = c.cast("double")
    // Σ_g s_g·T_g = Σ_g s_g · Σ_{i∈g} (x/S_g)·ln(x·n_g/S_g)
    //             = Σ rows (x/S)·ln(x·n_g/S_g) — s_g folds into the row,
    // so the within AND total terms come out of ONE row-level pass.
    val rowSums = rows.join(grp, "__g").crossJoin(tot)
      .select(
        round((d(col("__x")) / d(col("__s"))) *
            log(d(col("__x")) * d(col("__ng")) / d(col("__sg"))), 9)
          .cast("decimal(18,9)").as("__tw"),
        round((d(col("__x")) / d(col("__s"))) *
            log(d(col("__x")) * d(col("__n")) / d(col("__s"))), 9)
          .cast("decimal(18,9)").as("__tt"))
      .agg(sum(col("__tw")).as("__w"), sum(col("__tt")).as("__t"))
    val between = grp.crossJoin(tot)
      .select(round((d(col("__sg")) / d(col("__s"))) *
          log((d(col("__sg")) / d(col("__ng"))) /
            (d(col("__s")) / d(col("__n")))), 9)
        .cast("decimal(18,9)").as("__t"))
      .agg(count(lit(1)).as("n_groups"), sum(col("__t")).as("__b"))
    tot.crossJoin(rowSums).crossJoin(between)
      .select(col("__n").as("n"), col("n_groups"),
        round(col("__t").cast("double"), 6).as("theil_total"),
        round(col("__w").cast("double"), 6).as("theil_within"),
        round(col("__b").cast("double"), 6).as("theil_between"))
  }
}
