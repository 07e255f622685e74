package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The customs-analytics pipeline (SURVEY.md §3 E1): the reference's
  * notebook cells 4→83 re-expressed as one lazy DataFrame lineage.
  *
  * Input: the 27-column customs fact table (FIXTURES.md A1 schema, column
  * names as in the reference input sheet). Output adds the enrichment
  * columns of §1.3: description2, brand, model, type, capacity (nullable
  * double — sentinels only at export), remark (provenance), new/used,
  * unit weight in ton, capacity/type intervals, outliers, cny amounts.
  *
  * Every stage is a pure `DataFrame => DataFrame`; Catalyst sees the whole
  * tree, so filters push to the scan and all dimension joins broadcast.
  * Shuffles: only the outlier median groupBy+join — everything else is
  * map-side.
  */
object Pipeline {

  private val UNK = "UNKNOWN"

  /** Remark provenance vocabulary (reference py:102-275). */
  object Remark {
    val fully = "Fully match"
    val brandNoModel = "Brands existed but without models"
    val noMatch = "No match"
    val parts = "Parts"
    val uniqueRegex = "Unique model match with regex"
    val longestRegex = "Keep the longest from the multiple matched"
    val noBrandUniqueRegex = "No brand in description, and unique model match with regex"
    val noBrandLongestRegex = "No brand in description, and keep the longest from the multiple matched"
    val capacityInDesc = "Description contains working capacity"
    val inferredModel =
      "Description contains working capacity, and the model is inferenced with existed infomation"
    val qtyKeywords = "Description contains quantity keywords"
  }

  private def c(name: String): Column = col(s"`$name`")

  /** Stage 1 (cells 5-13): stable row id, normalized text columns, numeric
    * coercions, low-amount filter, derived unit metrics. */
  def prepare(df: DataFrame): DataFrame =
    df.withColumn("__row_id", monotonically_increasing_id())
      // lenient like pd.to_datetime: accept ISO or slash dates, null otherwise
      .withColumn("date", coalesce(
        try_to_timestamp(c("date")),
        try_to_timestamp(c("date"), lit("yyyy/MM/dd")),
        try_to_timestamp(c("date"), lit("MM/dd/yyyy"))))
      .withColumn("qty", expr("try_cast(qty AS DOUBLE)"))
      .withColumn("amount in usd", expr("try_cast(`amount in usd` AS DOUBLE)"))
      .withColumn("weight in kg", expr("try_cast(`weight in kg` AS DOUBLE)"))
      .filter(c("amount in usd") >= 10000)
      .withColumn("price in usd", c("amount in usd") / c("qty"))
      .filter(c("price in usd") >= 10000)
      .withColumn("unit weight in ton", c("weight in kg") / c("qty") / 1000)
      // preProcess already collapses+trims whitespace; a second collapseWs
      // would be a no-op regex pass over every row (measured on q40)
      // explicit null semantics: a null description becomes '' (like
      // supplier below), so downstream stages are total — the row survives
      // dropIrrelevant, matches nothing, and lands in remark = "No match"
      .withColumn("description2",
        Normalize.preProcess(
          Normalize.applyAliases(upper(coalesce(c("product description"), lit(""))),
            Normalize.customsAliases)))
      .withColumn("supplier_norm", supplierNorm(c("supplier")))

  /** Normalized supplier text for brand matching — shared by `prepare` and
    * Matching.rematchIndividual (which re-derives the column when a
    * pipeline-output row no longer carries it). */
  def supplierNorm(supplier: Column): Column =
    Normalize.preProcess(
      Normalize.applyAliases(upper(coalesce(supplier, lit(""))), Normalize.customsAliases))

  /** Stage 2 (J1+J2, py:61-115): brand containment match (first in KB
    * order), then model containment match (longest), remark provenance.
    *
    * Uses the shuffle-free literal-expression path (Matching §expr): the
    * model KB is driver-small (hundreds of rows — the same assumption a
    * broadcast join makes), so the whole match compiles to codegen'd
    * array expressions and the fact table is NEVER shuffled. For a KB too
    * big to collect, `matchKnowledgeBaseRelational` is the join+window
    * fallback with identical semantics. */
  def matchKnowledgeBase(df: DataFrame, modelKbRaw: DataFrame): DataFrame = {
    val kb = KnowledgeBase.prepareModelKb(modelKbRaw)
      .select("brand", "model", "model_ref", "capacity", "type", "hp").collect()
    val brandOrder: Seq[String] = kb.map(_.getString(0)).toSeq.distinct
    val modelsByBrand: Map[String, Seq[String]] =
      kb.groupBy(_.getString(0)).map { case (b, rows) => b -> rows.map(_.getString(2)).toSeq }
    val infoByKey: Map[String, (String, Option[Double], String, Option[Double])] =
      kb.map { r =>
        s"${r.getString(0)}|${r.getString(2)}" ->
          ((r.getString(1), Option(r.get(3)).map(_.toString.toDouble),
            r.getString(4), Option(r.get(5)).map(_.toString.toDouble)))
      }.toMap
    df.withColumn("brand",
        Matching.firstMatchAuto(Seq(c("description2"), col("supplier_norm")), brandOrder))
      .withColumn("__model_ref",
        Matching.literalKeyedLongestMatch(col("brand"), c("description2"), modelsByBrand))
      .withColumn("__info",
        try_element_at(typedLit(infoByKey), concat_ws("|", col("brand"), col("__model_ref"))))
      .withColumn("remark",
        when(col("brand").isNull, Remark.noMatch)
          .when(col("__model_ref").isNull, Remark.brandNoModel)
          .otherwise(Remark.fully))
      .withColumn("model", col("__info._1"))
      .withColumn("capacity", col("__info._2"))
      .withColumn("type", col("__info._3"))
      .withColumn("hp", col("__info._4"))
      .withColumn("brand", coalesce(col("brand"), lit(UNK)))
      .withColumn("model", coalesce(col("model"), lit(UNK)))
      .withColumn("type", coalesce(col("type"), lit(UNK)))
      .drop("__model_ref", "__info")
  }

  /** Relational variant of stage 2 for KBs too large to collect: broadcast
    * theta-joins + window tie-breaks (one fact shuffle per tie-break). */
  def matchKnowledgeBaseRelational(df: DataFrame, modelKbRaw: DataFrame): DataFrame = {
    val kb = KnowledgeBase.prepareModelKb(modelKbRaw)
    val brands = kb.select(col("brand").as("kb_brand"), col("ref_order"))
      .groupBy("kb_brand").agg(min("ref_order").as("brand_order"))
    val withBrand = Matching.firstMatchJoin(df, Seq("__row_id"), brands,
      c("description2").contains(col("kb_brand")) ||
        col("supplier_norm").contains(col("kb_brand")),
      "brand_order", Map("kb_brand" -> "brand"))
    val models = kb.select(col("brand").as("kb_brand"), col("model"),
      col("model_ref"), col("capacity").as("kb_capacity"),
      col("type").as("kb_type"), col("hp").as("kb_hp"))
    val withModel = Matching.longestMatchJoin(withBrand, Seq("__row_id"), models,
      col("brand") === col("kb_brand") && c("description2").contains(col("model_ref")),
      "model_ref",
      Map("model" -> "model", "kb_capacity" -> "capacity",
        "kb_type" -> "type", "kb_hp" -> "hp"))
    withModel
      .withColumn("remark",
        when(col("brand").isNull, Remark.noMatch)
          .when(col("model").isNull, Remark.brandNoModel)
          .otherwise(Remark.fully))
      .withColumn("brand", coalesce(col("brand"), lit(UNK)))
      .withColumn("model", coalesce(col("model"), lit(UNK)))
      .withColumn("type", coalesce(col("type"), lit(UNK)))
  }

  /** Irrelevant-keyword vocabulary (P3, py:119-125 — excerpt of the 32). */
  val irrelevantKeywords: Seq[String] = Seq(
    "CARRIER", "LOADER", "ROLLER", "TELESCOPLADER", "FORKLIFT", "BULLDOZER",
    "TRACTOR", "HARVESTER", "DRILLING", "PILING", "GRADER", "PAVER")

  /** Stage 3 (P3): anti-filter rows whose description matches any
    * irrelevant keyword (case-insensitive substring). Contains-any over
    * plain words → the Aho-Corasick expression (one O(text) automaton scan
    * instead of a backtracking alternation regex). */
  def dropIrrelevant(df: DataFrame): DataFrame =
    df.filter(graft.functions.MultiContains
      .multiContainsFirst(c("description2"), irrelevantKeywords).isNull)

  /** Stage 4 (P5, py:127-144): keyword type overrides. */
  def applyTypeRules(df: DataFrame): DataFrame =
    df.withColumn("type",
      when(c("description2").contains("WHEEL EXCAVATOR"), "WHEEL EXCAVATOR")
        .when(c("description2").contains("WHEELED CRANE"), "WHEELED CRANE")
        .when(c("description2").contains("ROUGH TERRAIN CRANE"), "ROUGH-TERRAIN CRANE")
        .when(c("description2").contains("CRAWLER CRANE"), "CRAWLER CRANE")
        .otherwise(col("type")))

  /** Stage 5 (B3, py:146-158): used/new with NEW/UNUSED override. */
  def markUsedNew(df: DataFrame): DataFrame =
    df.withColumn("new/used",
      Enrich.usedNew(c("description2"),
        Seq("USED", "SECONDHAND", "OLD", "REFURBISH", "SECOND", "2ND"),
        Seq("NEW", "UNUSED")))

  /** Stage 6 (py:161-162 + A7): parts marking. */
  def markParts(df: DataFrame): DataFrame =
    df.withColumn("remark",
      when(c("description2").rlike("PARTIAL|PARTY|\\bPARTS?\\b|ASSEMBLE|\\bSKD\\b|\\bCKD\\b"),
        Remark.parts).otherwise(col("remark")))

  /** Stage 7 (J3/J4 + F6, py:167-236): regex KB pass over still-unmatched
    * rows; brand-scoped when the brand is known, global otherwise; longest
    * findall match wins; capacity decoded per starting_point.
    *
    * Literal fast path: the regex KB is plan-time small, so every pattern
    * becomes a LITERAL regex (compiled once in codegen) and the winner is
    * picked with a `greatest` struct fold — zero joins, zero shuffles.
    * Only the winning pattern's capacity_regex is evaluated (lazy `when`
    * chain). `regexPassRelational` is the big-KB fallback. */
  def regexPass(df: DataFrame, regexKb: DataFrame,
      compat: CompatFlags = CompatFlags.intent): DataFrame = {
    val rows = regexKb.select("brand", "model_regex", "capacity_regex", "category", "starting_point")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getInt(4)))
      .sortBy { case (_, pat, _, _, _) => (-pat.length, pat) } // longer patterns first (O2)
    if (rows.isEmpty) return df // no regex KB → stage is a no-op
    // big pattern tables would explode the literal plan (O(patterns) nodes
    // re-analyzed per execution — see PERF.md round 2); the relational
    // broadcast-rlike join is the right shape past this size
    if (rows.length > 64) return regexPassRelational(df, regexKb, compat)
    val todoCond = col("remark").isin(Remark.brandNoModel, Remark.noMatch)
    val patterns = rows.map { case (b, pat, _, _, _) =>
      (pat, -pat.length, col("brand") === lit(UNK) || col("brand") === lit(b))
    }.toSeq
    val best = RegexMatch.literalRegexBest(c("description2"), patterns, findallLongest = true)
    val ord = col("__rx.ord")
    val matched = col("__rx.matched")
    def byOrd(vals: Seq[Column]): Column = get(array(vals: _*), ord)
    val rxBrand = byOrd(rows.map(r => lit(r._1)).toSeq)
    val rxCategory = byOrd(rows.map(r => lit(r._4)).toSeq)
    val rxSp = byOrd(rows.map(r => lit(r._5)).toSeq)
    // lazy per-winner capacity extraction: only the winning branch runs
    val rxCapNum = rows.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, ((_, _, capReg, _, _), i)) =>
        when(ord === i, get(regexp_extract_all(c("description2"), lit(capReg), lit(1)), lit(0)))
          .otherwise(acc)
    }
    df.withColumn("__rx", when(todoCond, best))
      .withColumn("remark",
        when(col("__rx").isNull, col("remark"))
          .when(col("brand") === UNK && col("__rx.n_matched") === 1, Remark.noBrandUniqueRegex)
          .when(col("brand") === UNK, Remark.noBrandLongestRegex)
          .when(col("__rx.n_matched") === 1, Remark.uniqueRegex)
          .otherwise(Remark.longestRegex))
      .withColumn("model",
        when(col("__rx").isNotNull, Normalize.stripSpaces(matched)).otherwise(col("model")))
      .withColumn("capacity",
        when(col("__rx").isNotNull && col("capacity").isNull,
          RegexMatch.decodeCapacity(rxCapNum, rxSp, compat)).otherwise(col("capacity")))
      .withColumn("type",
        when(col("__rx").isNotNull && col("type") === UNK, rxCategory).otherwise(col("type")))
      .withColumn("brand",
        when(col("__rx").isNotNull && col("brand") === UNK, rxBrand).otherwise(col("brand")))
      .drop("__rx")
  }

  /** Relational variant of stage 7 for pattern tables too large to
    * collect: broadcast rlike theta-join + window tie-break. */
  def regexPassRelational(df: DataFrame, regexKb: DataFrame,
      compat: CompatFlags = CompatFlags.intent): DataFrame = {
    val todo = df.filter(col("remark").isin(Remark.brandNoModel, Remark.noMatch))
    val done = df.filter(!col("remark").isin(Remark.brandNoModel, Remark.noMatch))
    val dim = regexKb.select(col("brand").as("rx_brand"), col("model_regex"),
      col("capacity_regex"), col("category"), col("starting_point"),
      (-length(col("model_regex"))).as("rx_priority"))
    val scope = col("brand") === lit(UNK) || col("brand") === col("rx_brand")
    val matched = RegexMatch.regexJoin(todo, Seq("__row_id"), "description2",
      dim, "model_regex", scope, Some("rx_priority"),
      Map("rx_brand" -> "rx_brand", "category" -> "rx_category",
        "capacity_regex" -> "rx_capreg", "starting_point" -> "rx_sp"))
    val decoded = matched
      .withColumn("rx_capnum",
        when(col("matched").isNotNull,
          get(regexp_extract_all(c("description2"), col("rx_capreg"), lit(1)), lit(0))))
      .withColumn("rx_capacity",
        RegexMatch.decodeCapacity(col("rx_capnum"), col("rx_sp"), compat))
    val applied = decoded
      .withColumn("remark",
        when(col("matched").isNull, col("remark"))
          .when(col("brand") === UNK, Remark.noBrandLongestRegex)
          .otherwise(Remark.longestRegex))
      .withColumn("model",
        when(col("matched").isNotNull, Normalize.stripSpaces(col("matched")))
          .otherwise(col("model")))
      .withColumn("brand",
        when(col("matched").isNotNull && col("brand") === UNK, col("rx_brand"))
          .otherwise(col("brand")))
      .withColumn("type",
        when(col("matched").isNotNull && col("type") === UNK, col("rx_category"))
          .otherwise(col("type")))
      .withColumn("capacity",
        when(col("matched").isNotNull && col("capacity").isNull, col("rx_capacity"))
          .otherwise(col("capacity")))
      .drop("matched", "rx_brand", "rx_category", "rx_capreg", "rx_sp",
        "rx_capnum", "rx_capacity")
    done.unionByName(applied)
  }

  /** Stage 8 (B4, py:239-252): capacity from "N TONS" in the description
    * for rows still lacking one. */
  def searchCapacity(df: DataFrame): DataFrame = {
    val cap = Enrich.extractDouble(c("description2"),
      "\\b(\\d+(?:\\.\\d+)?)\\s*(?:METRIC\\s*)?TONS?\\b")
    df.withColumn("remark",
        when(col("capacity").isNull && cap.isNotNull, Remark.capacityInDesc)
          .otherwise(col("remark")))
      .withColumn("capacity",
        when(col("capacity").isNull, cap).otherwise(col("capacity")))
  }

  /** Stage 9 (J6, py:255-276): backward tagging — rows with known
    * (brand, type, capacity) but UNKNOWN model borrow the model of a
    * labeled row of the same brand+type with capacity within ±5%. */
  def backwardTag(df: DataFrame): DataFrame = {
    val known = df
      .filter(col("model") =!= UNK && col("capacity").isNotNull)
      .select(col("brand").as("bt_brand"), col("type").as("bt_type"),
        col("capacity").as("bt_capacity"), col("model").as("bt_model"))
      .distinct()
    val todo = df.filter(
      col("model") === UNK && col("brand") =!= UNK && col("capacity").isNotNull)
    val done = df.filter(
      !(col("model") === UNK && col("brand") =!= UNK && col("capacity").isNotNull))
    val tagged = Matching.bestMatchJoin(todo, Seq("__row_id"), known,
      col("brand") === col("bt_brand") && col("type") === col("bt_type") &&
        col("bt_capacity").between(col("capacity") * 0.95, col("capacity") * 1.05),
      Seq(col("bt_model").asc_nulls_last), Map("bt_model" -> "bt_model"))
      .withColumn("remark",
        when(col("bt_model").isNotNull, Remark.inferredModel).otherwise(col("remark")))
      .withColumn("model", coalesce(col("bt_model"), col("model")))
      .drop("bt_model")
    done.unionByName(tagged)
  }

  /** Stage 10 (A2, py:287-316): ±20% of same-(brand, model) median price;
    * used or unlabeled rows are 'unknown'. */
  def markOutliers(df: DataFrame): DataFrame =
    Outliers.markOutliers(df, "price in usd", Seq("brand", "model"),
      col("model") === UNK || col("capacity").isNull || col("new/used") === "used")

  /** Stage 11 (B1/B2, py:343-431): intervals from capacity, falling back
    * to unit weight. */
  def markIntervals(df: DataFrame, loadInterval: Int = 10): DataFrame = {
    val basis = when(col("capacity").isNotNull && col("capacity") > 0, col("capacity"))
      .otherwise(c("unit weight in ton"))
    df.withColumn("capacity interval", Enrich.dynamicBuckets(basis, loadInterval))
      .withColumn("type interval", Enrich.fixedBuckets(basis))
  }

  /** Stage 12 (J5, py:320-340): USD→CNY per (year, month) of `date`. */
  def convertCurrency(df: DataFrame, rates: DataFrame): DataFrame =
    Rates.convert(df, "date", rates,
      Seq("price in usd" -> "price in cny", "amount in usd" -> "amount in cny"))

  /** Stage 13 (F5 + P6, cells 57/60): model whitespace cleanup + sentinel
    * rendering for export (capacity stays a nullable double internally). */
  def finalize(df: DataFrame): DataFrame =
    df.withColumn("model", Normalize.stripSpaces(col("model")))
      .withColumn("datasource", coalesce(c("datasource"), lit("pipeline")))
      .drop("supplier_norm", "__row_id")

  /** Cut the lineage before a stage that BRANCHES on its input
    * (backward tagging reads the df three ways, the outlier pass twice)
    * or that would push a filter back through the expensive normalize
    * projections. Without a cut every branch re-executes the whole
    * upstream plan, growing multiplicatively per branching stage.
    *
    * `localCheckpoint` stores raw rows in the block manager — for this
    * wide stringy schema ~10× cheaper than `persist`'s columnar
    * re-encoding. On a cluster this becomes `checkpoint` into durable
    * storage (reliable under executor loss; localCheckpoint is not). */
  private def materialize(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = false)

  /** Shared 13-stage chain; `intervals` is the only stage that differs
    * between the excavator (E1) and crane (E2) entry points. */
  private def runStages(fact: DataFrame, modelKb: DataFrame, regexKb: DataFrame,
      rates: DataFrame, intervals: DataFrame => DataFrame,
      compat: CompatFlags): DataFrame =
    fact.transform(prepare)
      .withColumn("datasource", lit("pipeline"))
      .transform(matchKnowledgeBase(_, modelKb))
      // supplier_norm exists only for brand matching — drop it BEFORE the
      // first cut so it isn't materialized (and re-read) three times
      .transform(_.drop("supplier_norm"))
      .transform(materialize)             // codegen cut: match block
      .transform(dropIrrelevant)
      .transform(applyTypeRules)
      .transform(markUsedNew)
      .transform(markParts)
      .transform(regexPass(_, regexKb, compat))
      .transform(searchCapacity)
      .transform(Lookups.refineCraneType) // B5: >300T crawler → lattice boom
      .transform(materialize)             // branch point: backwardTag
      .transform(backwardTag)
      .transform(materialize)             // branch point: outlier median
      .transform(markOutliers)
      .transform(intervals)
      .transform(convertCurrency(_, rates))
      .transform(finalize)

  /** The whole E1 (excavator) composition. */
  def run(fact: DataFrame, modelKb: DataFrame, regexKb: DataFrame,
      rates: DataFrame, compat: CompatFlags = CompatFlags.intent): DataFrame =
    runStages(fact, modelKb, regexKb, rates, markIntervals(_), compat)

  /** Crane-mode intervals (B1 crane branch): capacity ONLY — no unit-
    * weight fallback — with `<wT` + w-wide bands; the fixed working-
    * scenario buckets also read capacity alone. */
  def markIntervalsCrane(df: DataFrame, loadInterval: Int = 50): DataFrame =
    df.withColumn("capacity interval", Enrich.craneBuckets(col("capacity"), loadInterval))
      .withColumn("type interval", Enrich.fixedBuckets(col("capacity")))

  /** E2 (crane) entry point (SURVEY §3; reference cells 37/51-52/73):
    * the same 13 stages with crane interval rules and an optional EN↔CN
    * type-label translation merge (J8). `translations`: (key, translated). */
  def runCrane(fact: DataFrame, modelKb: DataFrame, regexKb: DataFrame,
      rates: DataFrame, translations: Option[DataFrame] = None,
      loadInterval: Int = 50,
      compat: CompatFlags = CompatFlags.intent): DataFrame = {
    val out = runStages(fact, modelKb, regexKb, rates,
      markIntervalsCrane(_, loadInterval), compat)
    translations.map(t => Lookups.translateLabels(out, "type", t, "type_translated"))
      .getOrElse(out)
  }
}
