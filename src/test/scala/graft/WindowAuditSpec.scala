package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Automated guard for the single-partition-window trap: a window with
  * an EMPTY partition spec (`OVER (ORDER BY …)` / `OVER ()`) forces
  * every input row through ONE task — fine for provably bounded frames
  * (a ≤45-brand share table, a top-k-limited list, a day/month spine,
  * B bootstrap replicates), a straggler at 100 TB for anything that
  * scales with the data (documents, customers, parts, the value domain
  * of a continuous column, the vocab). The distributed hatches
  * (`Ranks.withRowNumber`/`withNtile`/`runningSums`/
  * `runningDecimalSums`/`runningMaxByValue`) exist for exactly those —
  * this spec fails any registry query that grows a NEW global window,
  * unless it is allowlisted here WITH the boundedness argument.
  *
  * (Global `Sort`s — `orderBy` for oracle determinism — are fine: Spark
  * plans them as a range exchange, distributed; only `Window` collapses
  * to SinglePartition.) */
class WindowAuditSpec extends SparkSpec {
  import spark.implicits._

  /** query name -> why its remaining global window(s) are bounded.
    * Every entry must argue a row bound that does NOT grow with the
    * data; "it's fast at sf0.1" is not an argument. */
  private val allowlist: Map[String, String] = Map(
    "q11_cumshare_others" -> "brand share table, ≤~45 rows (A5 frame)",
    "q36_key_players" -> "brand share table, ≤~45 rows (A5 frame)",
    "q53_interval_share" -> "brand/interval share table, ≤~45 rows",
    "q94_lang_balance" -> "per-language rows — bounded label domain",
    "q197_temperature_mix" -> "per-source weight rows — bounded source domain",
    "q199_freshness_decay" -> "per-age-bucket rows — fixed bucket count",
    "q201_rrf_fusion" -> "rank windows over top-20-limited retrieval lists",
    "q206_seasonal_ma" -> "monthly spine, ~84 rows",
    "q215_share_trend" -> "monthly period spine, ~84 rows",
    "q223_zipf_fit" -> "rank over the topN-LIMITED vocab head (TakeOrdered upstream)",
    "q233_cusum_changepoint" -> "monthly spine, ~84 rows",
    "q269_theil_sen" -> "median over month-PAIR slopes, ≤ months² ≈ 3.5k rows",
    "q274_bootstrap_ci" -> "B bootstrap replicate means, B fixed",
    "q284_kaplan_meier" -> "day-level survival spine — bounded by the horizon",
    "q482_nelson_aalen" -> "day-level survival spine — bounded by the horizon (q284's frame)",
    "q288_lorenz_curve" -> "10 decile rows (the deciling itself is hatched)",
    "q303_gains_chart" -> "10 decile rows (the deciling itself is hatched)",
    "q319_session_depth" -> "≤10 depth buckets",
    "q339_order_size_dist" -> "distinct lines-per-order values, ≤7 in TPC-H",
    "q343_discount_bands" -> "≤6 discount bands",
    "q346_hourly_profile" -> "24 hour-of-day rows",
    "q347_supplier_nations" -> "25 nation rows",
    "q349_neyman_allocation" -> "per-stratum rows — bounded stratum domain",
    "q362_scaling_curve" -> "3 scaling points",
    "q370_fairness_audit" -> "per-group fairness rows — bounded group domain",
    "q390_jackknife_ratio" -> "leave-one-bucket-out rows — fixed bucket count",
    "q392_bh_fdr" -> "per-hypothesis rows — bounded group domain",
    "q422_zipf_slope" -> "rank over the topR-LIMITED vocab head",
    "q445_doremi_weights" -> "EG weight normalization over per-domain rows — bounded domain count",
    "q452_unimax_allocation" -> "waterfill over per-language rows — bounded label domain")

  private def globalWindows(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case w: LWindow if w.partitionSpec.isEmpty =>
        w.windowExpressions.map(_.sql.take(90)).mkString("; ")
    }

  /** every registry query planned ONCE at sfTiny — both registry-wide
    * rules (global windows, measured low-card keys) read this shared
    * pass instead of re-planning 486 queries each (planning, not the
    * NDV counts, dominated the suite's wall time) */
  private lazy val plannedRegistry: Seq[(String, Either[String, DataFrame])] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> (try Right(fn(spark, sfTiny))
        catch { case e: Throwable => Left(s"failed to plan: ${e.getMessage}") })
    }

  test("the rule flags the pre-fix q366 shape (row_number window over a fact)") {
    val li = Tables.lineitem(spark, sfTiny)
    val bad = li.withColumn("__zone",
      floor((row_number().over(Window.orderBy($"l_shipdate", $"l_orderkey",
        $"l_linenumber")) - 1) / lit(4096)).cast("long"))
    assert(globalWindows(bad).nonEmpty, "pre-fix q366 shape not flagged")
  }

  test("the rule flags the pre-fix q320 shape (value-domain cumulative window)") {
    val vc = Tables.orders(spark, sfTiny)
      .select($"o_totalprice".cast("double").as("__v"))
      .groupBy($"__v").agg(count(lit(1)).as("__c"))
    val bad = vc.withColumn("__cum", sum($"__c").over(Window.orderBy($"__v")))
    assert(globalWindows(bad).nonEmpty, "pre-fix q320 shape not flagged")
  }

  test("the rule accepts the hatch forms (no Window node at all)") {
    val li = Tables.lineitem(spark, sfTiny).limit(200)
    val ranked = ops.Ranks.withRowNumber(li, "__rn",
      $"l_shipdate", $"l_orderkey", $"l_linenumber")
    assert(globalWindows(ranked).isEmpty)
    val vc = li.groupBy($"l_quantity".as("__v")).agg(count(lit(1)).as("__c"))
    val run = ops.Ranks.runningSums(vc, Seq("__c" -> "__cum"), None, $"__v")
    assert(globalWindows(run.df).isEmpty)
  }

  test("no unbounded global window anywhere in the registry") {
    val bad = plannedRegistry.flatMap {
      case (name, _) if allowlist.contains(name) => Nil
      case (name, Left(err)) => Seq(s"$name $err")
      case (name, Right(df)) => globalWindows(df).map(w => s"$name — $w")
    }
    assert(bad.isEmpty,
      "global (single-partition) windows outside the allowlist:\n" +
        bad.mkString("\n"))
  }

  test("the allowlist names only live queries") {
    val dead = allowlist.keySet -- SparkEntry.queries.keySet
    assert(dead.isEmpty, s"allowlisted queries no longer exist: $dead")
  }

  // ── the LOW-CARDINALITY partitionBy rule ─────────────────────────────
  // Window.partitionBy(k) is only distributed when k has enough
  // distinct values: keyed on a handful-sized domain (return flags,
  // priorities, event types, languages, sources) over a fact-scaled
  // frame, each key's whole slice lands on ONE task at 100 TB — the
  // q234/q260/q267/q380 class retired onto the grouped hatches
  // (runningSumsBy / runningDecimalSumsBy / runningLeadBy).
  // The rule is MEASURED, not name-based: for every keyed window in
  // the registry, project the window's OWN input onto its partition
  // keys and count the distinct tuples at sfTiny. NDV below the
  // threshold ⇒ a handful-sized key domain ⇒ flagged unless the query
  // argues (in the allowlist) that the window's input frame is itself
  // bounded. A name list can't see a NEW low-card key (or a literal
  // key, which has no column name at all); a measurement can.

  /** a key domain this small is a straggler at scale: each key's whole
    * slice is one task. sfTiny NDVs are small to begin with (~6k
    * lineitems), so a data-scaled key (order/doc/customer ids) clears
    * this by 1–2 orders of magnitude while label-sized domains
    * (flags 3, langs 5, sources 4, priorities 5) sit well under it. */
  private val ndvThreshold = 8L

  /** query -> why its low-card-keyed window's INPUT frame is bounded */
  private val lowCardAllowlist: Map[String, String] = Map(
    "q76_heavy_hitters" -> "rank ≤ 5 filter plans WindowGroupLimit — per-partition top-k pushdown bounds each key's window input to k × #map-partitions (plan-asserted below)",
    "q427_rbo" -> "rank ≤ k filter plans WindowGroupLimit — same bound (plan-asserted below)",
    "q430_sql_surface" -> "rank ≤ 3 filter plans WindowGroupLimit (plan-asserted below); the gate's purpose is VERBATIM-portable SQL, so the text stays standard",
    "q317_lead_time_sla" -> "cumulative over the (priority, lead-DAYS) value table — integer day domain, bounded by the order horizon",
    "q193_hhi" -> "rank ≤ k filter plans WindowGroupLimit — top-k revenue pushdown per market (plan-asserted below); HHI/total legs are windowless aggregates",
    "q238_retrieval_eval" -> "rank ≤ k filter plans WindowGroupLimit (plan-asserted below); first-rel rank counts rows above the best hit instead of ranking",
    "q239_recall_at_k" -> "same WindowGroupLimit-bounded top-k leg as q238 (plan-asserted below)",
    "q340_region_rollup" -> "window over the per-(region, nation) aggregate — ≤ 25 nation rows",
    "q345_repurchase_cycle" -> "cumulative over the (segment, gap-DAYS) value table — integer day domain bounded by the order horizon (the q317 class)",
    "q419_chi2_keywords" -> "rank ≤ topK filter plans WindowGroupLimit (plan-asserted below)")

  test("the WindowGroupLimit claims in the low-card allowlist hold in the physical plans") {
    Seq("q76_heavy_hitters", "q427_rbo", "q430_sql_surface", "q193_hhi",
        "q238_retrieval_eval", "q239_recall_at_k", "q419_chi2_keywords").foreach { q =>
      val p = SparkEntry.queries(q)(spark, sfTiny)
        .queryExecution.executedPlan.toString
      assert(p.contains("WindowGroupLimit"),
        s"$q lost the top-k window pushdown its allowlist entry claims:\n" +
          p.take(1000))
    }
  }

  /** measured distinct partition-key tuples over the window's own
    * input; memoized on the canonicalized projection so the hundreds
    * of shared shapes across the registry evaluate once */
  private val ndvCache = scala.collection.mutable.HashMap.empty[String, Long]
  private def keyNdv(w: LWindow): Long = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val proj = Project(w.partitionSpec.zipWithIndex.map { case (e, i) =>
      Alias(e, s"__k$i")() }, w.child)
    ndvCache.getOrElseUpdate(proj.canonicalized.toString,
      org.apache.spark.sql.GraftBridge.ofRows(spark, proj)
        .distinct().count())
  }

  private def lowCardWindows(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case w: LWindow if w.partitionSpec.nonEmpty => w
    }.flatMap { w =>
      val ndv = keyNdv(w)
      if (ndv >= ndvThreshold) Nil
      else Seq(w.partitionSpec.map(_.sql).mkString(", ") +
        s" (ndv=$ndv) ← " +
        w.windowExpressions.map(_.sql.take(70)).mkString("; "))
    }

  test("the low-card rule flags the pre-fix q267 shape (rank window keyed on l_returnflag)") {
    val li = Tables.lineitem(spark, sfTiny)
    val bad = li.withColumn("__rn", row_number().over(
      Window.partitionBy($"l_returnflag").orderBy($"l_extendedprice")))
    assert(lowCardWindows(bad).nonEmpty, "pre-fix q267 shape not flagged")
    // high-cardinality keys (user/order/doc ids) do NOT trip the rule
    val ok = li.withColumn("__rn", row_number().over(
      Window.partitionBy($"l_orderkey").orderBy($"l_linenumber")))
    assert(lowCardWindows(ok).isEmpty)
  }

  test("the low-card rule flags keys NO name list could catch") {
    val li = Tables.lineitem(spark, sfTiny)
    // a literal key — ndv 1, no column name at all (the global-window
    // trap wearing a partitionBy costume)
    val lit1 = li.withColumn("__rn", row_number().over(
      Window.partitionBy(lit("x")).orderBy($"l_extendedprice")))
    assert(lowCardWindows(lit1).nonEmpty, "partitionBy(lit) not flagged")
    // a NEW derived low-card key (year has ~7 values in TPC-H) — a
    // static column-name set would let this straggler ship unnamed
    val derived = li.withColumn("__rn", row_number().over(
      Window.partitionBy(year($"l_shipdate")).orderBy($"l_extendedprice")))
    assert(lowCardWindows(derived).nonEmpty, "derived low-card key not flagged")
  }

  test("no low-cardinality-keyed window over an unbounded frame in the registry") {
    val bad = plannedRegistry.flatMap {
      case (name, _) if lowCardAllowlist.contains(name) => Nil
      case (name, Left(err)) => Seq(s"$name $err")
      case (name, Right(df)) =>
        try lowCardWindows(df).map(w => s"$name — $w")
        catch { case e: Throwable =>
          Seq(s"$name failed to measure: ${e.getMessage}") }
    }
    assert(bad.isEmpty,
      "low-cardinality-keyed windows outside the allowlist:\n" +
        bad.mkString("\n"))
  }
}
