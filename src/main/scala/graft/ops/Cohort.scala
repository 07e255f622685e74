package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-journey aggregates over an event stream: cohort retention and
  * Markov transition matrices — the product-analytics twins of the
  * reference's interval/key-player reports (its monthly import cohorts,
  * `data_analysis_program.ipynb` interval tables), re-expressed over the
  * generic `events` table.
  *
  * Both operators share the same 100 TB shape: ONE shuffle on the
  * md5-uniform user key (window functions ride it), then a re-aggregation
  * on a LOW-cardinality derived key ((cohort, week) / (src, dst)) whose
  * partial aggregation combines map-side; the per-key result tables are
  * O(weeks²) / O(event_types²) rows and broadcast back under AQE. The
  * fact table is never shuffled twice on the same key.
  */
object Cohort {

  /** Weekly cohort retention matrix: cohort = ISO week (Monday-truncated)
    * of the user's first event; a user is "active at offset w" when they
    * have any event in `[first_ts + w·7d, first_ts + (w+1)·7d)` (offsets
    * are anchored on the user's own first event, so a cohort's week-0
    * count is exactly its size). Emits one row per (cohort, week_offset)
    * with active count, cohort size and the retention ratio.
    *
    * Offsets are computed on epoch MICROseconds with integer division —
    * exact, engine-portable, and immune to DST/zone arithmetic (the
    * session zone only enters through the Monday truncation, pinned to
    * UTC by the session config). */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
    val weekUs = 7L * 86400L * 1000000L
    val active = events
      .withColumn("__first", min(col(tsCol)).over(w))
      .withColumn("__diff", unix_micros(col(tsCol)) - unix_micros(col("__first")))
      .select(
        date_format(date_trunc("week", col("__first")), "yyyy-MM-dd").as("cohort"),
        // integer DIV, not double '/': a diff just under a week boundary
        // must not round UP across it (DuckDB's // is exact integer too)
        expr(s"__diff DIV ${weekUs}L").as("week_offset"),
        col(userCol).as("__user"))
      .groupBy("cohort", "week_offset")
      .agg(countDistinct(col("__user")).as("active"))
    val sizes = active.filter(col("week_offset") === 0)
      .select(col("cohort"), col("active").as("cohort_size"))
    active.join(sizes, Seq("cohort"))
      .withColumn("retention",
        col("active").cast("double") / col("cohort_size").cast("double"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * for each observed (src → dst) adjacent pair (ordered by ts with the
    * event-id tie-break), the transition count and row-normalized
    * probability. The n/total division is two exact BIGINTs cast to
    * double — bit-identical across engines. */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(typeCol).as("src"),
        lead(col(typeCol), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("src").agg(sum(col("n")).as("__tot"))
    pairs.join(totals, Seq("src"))
      .withColumn("p", col("n").cast("double") / col("__tot").cast("double"))
      .drop("__tot")
  }

  /** Monthly active/new/churned entity accounting (supplier or customer
    * churn): per calendar month of activity,
    *   n_active  = distinct entities active that month,
    *   n_new     = entities whose FIRST-ever active month is this one,
    *   n_churned = entities active the previous month but not this one.
    * Months are reported for the months present in the data; the first
    * month churns 0 by construction.
    *
    * Scale shape: ONE distinct (entity, month) reduction of the fact
    * table, then every other step runs on entity×month rows — a min-agg
    * for first months, one shifted anti-join for churn, month-keyed
    * counts. Integers end to end. */
  def activeChurn(df: DataFrame, entityCol: String, tsCol: String): DataFrame = {
    val em = df.select(col(entityCol).as("__e"),
        date_trunc("month", col(tsCol)).cast("date").as("__m"))
      .distinct()
      .localCheckpoint(false) // four consumers; the fact-table distinct runs once
    val act = em.groupBy(col("__m")).agg(count(lit(1)).as("n_active"))
    val nw = em.groupBy(col("__e")).agg(min(col("__m")).as("__m"))
      .groupBy(col("__m")).agg(count(lit(1)).as("n_new"))
    val churn = em.select(col("__e"), add_months(col("__m"), 1).as("__m"))
      .join(em, Seq("__e", "__m"), "left_anti")
      .groupBy(col("__m")).agg(count(lit(1)).as("n_churned"))
    act.join(nw, Seq("__m"), "left").join(churn, Seq("__m"), "left")
      .select(date_format(col("__m"), "yyyy-MM").as("month"),
        col("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  /** Stationary distribution of the observed event-type Markov chain
    * (the q147 transition matrix) by `iters` fixed power iterations —
    * "where does user attention settle?" — in INTEGER fixed point (the
    * PageRank discipline): transition probabilities floor to
    * `scale`-ths, every iteration term is (π_s · p_sd) DIV scale, so
    * the result is bit-identical on any engine / partitioning. Mass
    * entering a state with no OUT-transitions drains on the next
    * iteration (the chain is over observed transitions only —
    * documented, and with event data every type has successors).
    *
    * Scale shape: the transition matrix is type²-sized (a CONTRACT
    * bound, ~tens of rows), so after the ONE user-keyed sort window +
    * (src, dst) count, the iteration runs on the DRIVER over a
    * model-sized collect — the `kmeansCentroids` precedent, never
    * data-scaled. Output: (state, pi ← round 6) for states reachable at
    * the final iteration. */
  /** Kaplan–Meier survival curve of entity lifetimes (first event →
    * last event, in whole days), right-censoring entities whose last
    * activity falls within `censorDays` of the observation edge (they
    * are "still alive", not churned):
    *   S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ)
    * computed as exp of the cumulative 9-dp fixed-point Σln(1 − d/n)
    * (the q42 transcendental discipline — a windowed double product
    * would be engine-ordered). A step where everyone at risk dies pins
    * S = 0 exactly instead of folding ln 0.
    *
    * Scale shape: ONE entity aggregate over the fact, then everything
    * runs on the LIFETIME-DAYS table (≤ observation-window days —
    * aggregated-table-sized). Output per death time:
    * (t_days, n_risk, n_deaths, survival). */
  def kaplanMeier(events: DataFrame, userCol: String, tsCol: String,
      censorDays: Int = 3): DataFrame = {
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val per = events.groupBy(col(userCol).as("__u"))
      .agg(min(us).as("__f"), max(us).as("__l"))
    val horizon = events.agg(max(us).as("__h"))
    val day = 86400000000L
    val lab = per.crossJoin(horizon)
      .select(((col("__l") - col("__f")) / lit(day)).cast("long").as("__t"),
        (col("__l") > col("__h") - lit(censorDays.toLong * day)).as("__cens"))
      .localCheckpoint(false) // by-time table + the total
    val byT = lab.groupBy(col("__t")).agg(count(lit(1)).as("__n_at"),
      sum(when(!col("__cens"), 1L).otherwise(0L)).as("__d"))
    val wLt = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wLe = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("__cum_lt",
        coalesce(sum(col("__n_at")).over(wLt), lit(0L)))
      .crossJoin(lab.agg(count(lit(1)).as("__N")))
      .withColumn("n_risk", col("__N") - col("__cum_lt"))
      .where(col("__d") > 0)
      .withColumn("__lnterm", when(col("__d") < col("n_risk"),
        round(log(lit(1.0) -
          col("__d").cast("double") / col("n_risk").cast("double")), 9)
          .cast("decimal(18,9)")))
      .withColumn("__dead_all",
        max(when(col("__d") === col("n_risk"), 1).otherwise(0)).over(wLe))
      .withColumn("__ln_s", sum(col("__lnterm")).over(wLe))
      .select(col("__t").as("t_days"), col("n_risk"),
        col("__d").as("n_deaths"),
        when(col("__dead_all") === 1, lit(0.0))
          .otherwise(round(exp(col("__ln_s").cast("double")), 6))
          .as("survival"))
  }

  /** Nelson–Aalen cumulative-hazard estimator — [[kaplanMeier]]'s
    * additive sibling on the SAME lifetime frame (first→last activity
    * per user, right-censored near the horizon): Ĥ(t) = Σ_{s≤t} d_s/n_s
    * with its standard variance Σ d_s/n_s². Where KM's survival curve
    * answers "what fraction is still alive", the hazard's SLOPE answers
    * "is churn accelerating" — flat increments = constant risk, a bend
    * = a regime change (the retention-diagnosis read).
    *
    * Float discipline: per-day hazard increments d/n and d/n² are
    * round-9 fixed point summed as DECIMAL over the day spine (the
    * kaplanMeier ln-term convention), headline rounds 6. Scale shape:
    * identical to kaplanMeier — one user-keyed lifetime aggregate, a
    * day-spine table (bounded by the horizon; its cumulative windows
    * are allowlisted exactly like q284's), event-day output:
    * (t_days, n_risk, n_deaths, cum_hazard, se). */
  def nelsonAalen(events: DataFrame, userCol: String, tsCol: String,
      censorDays: Int = 3): DataFrame = {
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val per = events.groupBy(col(userCol).as("__u"))
      .agg(min(us).as("__f"), max(us).as("__l"))
    val horizon = events.agg(max(us).as("__h"))
    val day = 86400000000L
    val lab = per.crossJoin(horizon)
      .select(((col("__l") - col("__f")) / lit(day)).cast("long").as("__t"),
        (col("__l") > col("__h") - lit(censorDays.toLong * day)).as("__cens"))
      .localCheckpoint(false) // by-time table + the total
    val byT = lab.groupBy(col("__t")).agg(count(lit(1)).as("__n_at"),
      sum(when(!col("__cens"), 1L).otherwise(0L)).as("__d"))
    val wLt = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wLe = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def d9(c: org.apache.spark.sql.Column) =
      round(c, 9).cast("decimal(18,9)")
    byT
      .withColumn("__cum_lt",
        coalesce(sum(col("__n_at")).over(wLt), lit(0L)))
      .crossJoin(lab.agg(count(lit(1)).as("__N")))
      .withColumn("n_risk", col("__N") - col("__cum_lt"))
      .where(col("__d") > 0)
      .withColumn("__hterm",
        d9(col("__d").cast("double") / col("n_risk").cast("double")))
      .withColumn("__vterm",
        d9(col("__d").cast("double") /
          (col("n_risk").cast("double") * col("n_risk").cast("double"))))
      .withColumn("__ch", sum(col("__hterm")).over(wLe))
      .withColumn("__cv", sum(col("__vterm")).over(wLe))
      .select(col("__t").as("t_days"), col("n_risk"),
        col("__d").as("n_deaths"),
        round(col("__ch").cast("double"), 6).as("cum_hazard"),
        round(sqrt(col("__cv").cast("double")), 6).as("se"))
  }

  /** First-touch vs last-touch revenue attribution: every `convType`
    * event's value is credited (a) to the user's FIRST event type ever
    * (first-touch) and (b) to the LAST non-conversion event type
    * strictly before it (last-touch; 'none' when the conversion is the
    * user's opening act). Two window reads over ONE user-keyed sort
    * (ts + tie total order); revenue sums are exact DECIMAL.
    *
    * Scale shape: ONE key shuffle + per-key sort window, then a
    * model×type-sized aggregate. Output:
    * (model, touch_type, n_conversions, revenue). */
  def touchAttribution(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, valueCol: String, tieCol: String,
      convType: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val decorated = events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol).as("__ty"),
        col(valueCol).cast("decimal(18,6)").as("__v"))
      .withColumn("__first", first(col("__ty")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__last", last(when(col("__ty") =!= convType, col("__ty")),
          ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .where(col("__ty") === convType)
      .localCheckpoint(false) // conversions-sized; both models read it
    def side(model: String, touch: Column) = decorated
      .groupBy(coalesce(touch, lit("none")).as("touch_type"))
      .agg(count(lit(1)).as("n_conversions"),
        round(sum(col("__v")).cast("double"), 6).as("revenue"))
      .select(lit(model).as("model"), col("touch_type"),
        col("n_conversions"), col("revenue"))
    side("first_touch", col("__first"))
      .unionByName(side("last_touch", col("__last")))
  }

  /** The signed Shapley coalition lattice over a literal channel
    * universe: rows (set_key, channel, ±w(|S|)) with
    * w(s) = (s−1)!(k−s)!/k! — one +w row for every S ∋ c keyed by S,
    * one −w row keyed by S∖{c}. Set keys are sorted comma-joins.
    * 2^(k−1)·2·k rows — model-sized (channels is a literal contract).
    * Public so the oracle generator shares EXACTLY these weights. */
  def shapleyLattice(channels: Seq[String]): Seq[(String, String, Double)] = {
    val cs = channels.sorted
    val k = cs.length
    def fact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)
    def w(s: Int): Double = fact(s - 1).toDouble * fact(k - s) / fact(k)
    def key(set: Seq[String]): String = set.sorted.mkString(",")
    for {
      c <- cs
      bits <- 0 until (1 << k)
      set = cs.zipWithIndex.collect { case (ch, i) if (bits & (1 << i)) != 0 => ch }
      if set.contains(c)
      row <- Seq((key(set), c, w(set.length)),
        (key(set.filterNot(_ == c)), c, -w(set.length)))
    } yield row
  }

  /** Exact Shapley-value channel attribution (Shapley 1953; the
    * data-driven attribution standard — the coalition-fair split that
    * first/last-touch (q273) and position weighting (q318) approximate):
    * users are characterized by the SET of non-conversion channels they
    * touched; v(S) = observed conversion rate of users with channel set
    * EXACTLY S (unobserved subsets contribute v = 0, the data-driven
    * convention); φ_c = Σ_{S ∋ c} w(|S|)·(v(S) − v(S∖c)).
    *
    * Float discipline: v(S) are doubles from exact counts; each lattice
    * term w·v rounds to 9 dp and sums as DECIMAL per channel, so φ is
    * partition-order-free; the factorial weights are driver-computed
    * literals shared verbatim with the oracle.
    *
    * Scale shape: ONE user-keyed aggregate (set + converted flag), one
    * subset-keyed aggregate (≤ 2^k rows by contract), then a join of
    * the LITERAL lattice against the subset table. Output:
    * (channel, phi). */
  def shapleyAttribution(events: DataFrame, userCol: String,
      typeCol: String, convType: String,
      channels: Seq[String]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val users = events.groupBy(col(userCol).as("__u"))
      .agg(sort_array(collect_set(
          when(col(typeCol) =!= convType, col(typeCol)))).as("__set"),
        max((col(typeCol) === convType).cast("int")).as("__conv"))
    val vS = users.groupBy(concat_ws(",", col("__set")).as("__key"))
      .agg(count(lit(1)).as("__n"), sum(col("__conv")).as("__k"))
      .select(col("__key"),
        (col("__k").cast("double") / col("__n").cast("double")).as("__v"))
    val lattice = shapleyLattice(channels).toDF("__key", "channel", "__w")
    lattice.join(vS, Seq("__key"), "left")
      .select(col("channel"),
        round(col("__w") * coalesce(col("__v"), lit(0.0)), 9)
          .cast("decimal(18,9)").as("__t"))
      .groupBy(col("channel"))
      .agg(round(sum(col("__t")).cast("double"), 6).as("phi"))
  }

  /** Markov-chain removal-effect attribution (Anderl et al. 2016 — the
    * data-driven attribution standard next to Shapley q363): user paths
    * START → events → first conversion (CONV) or exhaustion (NULL)
    * define a transition chain; each channel's credit is its REMOVAL
    * EFFECT — how much the START→CONV absorption probability drops when
    * every transition INTO the channel is redirected to NULL.
    *
    * Arithmetic contract: transition probabilities and absorption
    * iterations run in INTEGER fixed-point (scale 10^12, fixed `iters`
    * sweeps from p = 0 with p(CONV) = scale, p(NULL) = 0) — integer
    * sums are order-free and engine-exact, the markovStationary
    * discipline. Only the final effect ratios are doubles.
    *
    * Scale shape: ONE user-keyed sort window builds path transitions;
    * ONE (src,dst) count collapses them to the states²-bounded matrix;
    * every chain (full + one per channel) iterates on the DRIVER over
    * that model-sized matrix. Output per channel:
    * (channel, removal_effect, attribution_share, p_conv_full). */
  def markovRemovalAttribution(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, tieCol: String, convType: String,
      channels: Seq[String], iters: Int = 12,
      scale: Long = 1000000000000L): DataFrame = {
    val w = Window.partitionBy(col("__u")).orderBy(col("__ts"), col("__tie"))
    val seq0 = events
      .select(col(userCol).as("__u"), col(tsCol).as("__ts"),
        col(tieCol).as("__tie"), col(typeCol).as("__ty"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cv", min(when(col("__ty") === convType, col("__rn")))
        .over(Window.partitionBy(col("__u"))))
      .where(col("__cv").isNull || col("__rn") <= col("__cv"))
    val trans = seq0
      .withColumn("__prev", lag(col("__ty"), 1).over(
        Window.partitionBy(col("__u")).orderBy(col("__rn"))))
      .withColumn("__src", coalesce(col("__prev"), lit("START")))
      .withColumn("__isLast", col("__rn") === max(col("__rn")).over(
        Window.partitionBy(col("__u"))))
      .localCheckpoint(false) // consumers: edge rows + terminal rows
    val edges = trans.select(col("__src"), col("__ty").as("__dst"))
      .unionByName(trans
        .where(col("__isLast") && col("__ty") =!= convType)
        .select(col("__ty").as("__src"), lit("NULL").as("__dst")))
    val counts = edges.groupBy(col("__src"), col("__dst"))
      .agg(count(lit(1)).as("__n"))
      .collect() // states²-bounded by contract
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val spark = events.sparkSession
    import spark.implicits._
    val tot = counts.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._3).sum }
    // integer fixed-point transition weights
    def tfp(redirect: Option[String]) = counts.map { case (s, d0, n) =>
      val d = if (redirect.contains(d0)) "NULL" else d0
      ((s, d), BigInt(n) * scale / BigInt(tot(s)))
    }.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).sum }
    val transient = (counts.map(_._1) ++ counts.map(_._2)).distinct
      .filterNot(s => s == convType || s == "NULL").sorted
    def absorb(redirect: Option[String]): BigInt = {
      val t = tfp(redirect)
      var p: Map[String, BigInt] = transient.map(_ -> BigInt(0)).toMap
      (1 to iters).foreach { _ =>
        p = transient.map { s =>
          val mass = t.toSeq.filter(_._1._1 == s).sortBy(_._1._2)
            .foldLeft(BigInt(0)) { case (acc, ((_, d), w0)) =>
              val pd = if (d == convType) BigInt(scale)
                else if (d == "NULL") BigInt(0)
                else p.getOrElse(d, BigInt(0))
              acc + w0 * pd
            }
          s -> mass / scale
        }.toMap
      }
      p.getOrElse("START", BigInt(0))
    }
    val pFull = absorb(None)
    // fail fast instead of NaN removal effects when the corpus has no
    // conversion path at all (pFull = 0 -> 0/0 below)
    require(pFull > 0, "markovRemovalAttribution: no conversion paths")
    val effects = channels.sorted.map { c =>
      val pW = absorb(Some(c))
      val re = 1.0 - pW.toDouble / pFull.toDouble
      (c, re)
    }
    val reSum = effects.foldLeft(0.0)(_ + _._2)
    require(reSum != 0.0,
      "markovRemovalAttribution: zero total removal effect")
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    effects.map { case (c, re) =>
      (c, r6(re), r6(re / reSum), r6(pFull.toDouble / scale.toDouble)) }
      .toDF("channel", "removal_effect", "attribution_share", "p_conv_full")
  }

  def markovStationary(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, iters: Int = 25,
      scale: Long = 1000000000000L): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val counts = events
      .select(col(typeCol).as("src"), lead(col(typeCol), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("src").agg(sum(col("n")).as("tot"))
    val tr = counts.join(totals, "src")
      .select(col("src"), col("dst"), col("n"), col("tot"))
      .collect() // type²-sized by contract
      .map(r => (r.getString(0), r.getString(1),
        BigInt(r.getLong(2)) * scale / BigInt(r.getLong(3))))
    val states = tr.map(_._1).distinct.sorted
    var pi: Map[String, BigInt] =
      if (states.isEmpty) Map.empty
      else states.map(_ -> BigInt(scale) / states.length).toMap
    (1 to iters).foreach { _ =>
      val next = scala.collection.mutable.Map.empty[String, BigInt]
        .withDefaultValue(BigInt(0))
      tr.foreach { case (s, d2, pfp) =>
        next(d2) += pi.getOrElse(s, BigInt(0)) * pfp / scale
      }
      pi = next.toMap
    }
    val spark = events.sparkSession
    import spark.implicits._
    pi.toSeq.sortBy(_._1)
      .map { case (st, fp) => (st,
        BigDecimal(fp.toDouble / scale.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .toDF("state", "pi")
  }
}
