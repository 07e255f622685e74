package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset mixing: replicate each document per its source's epoch weight
  * (how pre-training mixtures up/down-weight sources — a weight of 2.5
  * means every doc appears twice and half of them a third time).
  *
  * repeats = ⌊w⌋ + (uniform(id) < frac(w) ? 1 : 0), with the uniform draw
  * the same md5-derived one the sampling/split operators use — so the
  * mixture is reproducible across runs, engines and cluster layouts, and
  * the fractional part selects a STABLE subset rather than a fresh random
  * one per epoch. Map-only: one explode, no shuffle. Weight 0 drops the
  * source entirely.
  */
object Mixing {

  def epochWeightedRepeat(df: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double], default: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(default)).forall(_ >= 0), "weights must be >= 0")
    val w: Column = coalesce(
      try_element_at(typedLit(weights), col(sourceCol)), lit(default))
    val base = floor(w).cast("int")
    val extra = (TextStats.hashUniform(col(idCol)) < (w - floor(w))).cast("int")
    val repeats = base + extra
    df.withColumn("__copies",
        when(repeats >= 1, sequence(lit(1), repeats)).otherwise(array().cast("array<int>")))
      .withColumn("copy", explode(col("__copies")))
      .drop("__copies")
  }

  /** Balance strata (languages, sources) to EXACTLY equal size: every
    * stratum is downsampled to the size of the smallest one, keeping the
    * `n_min` rows with the lowest md5-uniform draw (ties by id) — the same
    * deterministic draw the split/sampling operators use, so the kept
    * subset is stable across runs and engines, and growing one stratum
    * never reshuffles which rows of another survive (their draws don't
    * change; only the target can shrink).
    *
    * Scale shape: the stratum sizes are one partial-combining aggregation
    * (tiny result — a window over the AGGREGATED table computes the
    * global min for free); the rank is ONE shuffle+sort per stratum key.
    * A stratum so large its sort spills is exactly the stratum about to
    * be cut hardest — for that regime, pre-filter with
    * `TextStats.stratifiedKeep(key, stratum, n_min/n_s + ε)` to shed the
    * bulk map-side, then rank only the ~n_min survivors. */
  def balancePerStratum(df: DataFrame, idCol: String, stratumCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // A null stratum is excluded UP FRONT: it would otherwise count toward
    // the global min target (distorting every real stratum's size) while
    // its own rows silently vanish in the null-unsafe equi-join below.
    val in = df.filter(col(stratumCol).isNotNull)
    val target = in.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__target", min(col("__n")).over(Window.partitionBy()))
      .select(col(stratumCol), col("__target"))
    // per-stratum rank through the grouped hatch: strata are
    // handful-sized label domains (lang/source) over a corpus-scaled
    // frame — a Window.partitionBy(stratum) puts each label's whole
    // slice on one task
    Ranks.withRowNumberBy(in, Seq(stratumCol), "__rk",
        TextStats.hashUniform(col(idCol)).asc, col(idCol).asc)
      .join(target, Seq(stratumCol))
      .filter(col("__rk") <= col("__target"))
      .select(df.columns.map(col): _*) // the using-join moved the key first
  }

  /** EXACT-proportion train/val/test split per stratum: rank rows by the
    * deterministic md5 draw (ties id asc) and cut at integer boundaries —
    * stratum counts land within 1 row of `num_k/den · n_s` by
    * construction, where the hash-threshold split (`TextStats
    * .assignSplit`, q83) only hits proportions in expectation. The price
    * is ONE shuffle+sort per stratum (the q94/q100 contract, same
    * oversized-stratum escape hatch); the hash split stays the scale
    * default, this is the exact-quota variant for small/critical strata
    * (eval sets, per-language floors). Boundaries are integer arithmetic:
    * rank ≤ (n_s·cum_num_k) DIV den → split k. Adding a document
    * reshuffles ranks, so unlike q83/q93 this split is NOT stable under
    * corpus growth — the documented trade for exactness. */
  def exactSplit(df: DataFrame, idCol: String, stratumCol: String,
      splits: Seq[(String, Int)], den: Int): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == den,
      s"split numerators must sum to den=$den: $splits")
    val cums = splits.scanLeft(0) { case (acc, (_, num)) => acc + num }.tail
    val assign = splits.zip(cums).dropRight(1)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), cum)) =>
        val cond = col("__rk") <= expr(s"(__n * $cum) DIV $den")
        Some(acc.fold(when(cond, lit(name)))(_.when(cond, lit(name))))
      }
      .fold(lit(splits.head._1))(_.otherwise(lit(splits.last._1)))
    // per-stratum rank through the grouped hatch (handful-sized label
    // domains over a corpus-scaled frame); stratum sizes join back from
    // a plain aggregate instead of a second keyed window
    val ns = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
    Ranks.withRowNumberBy(df, Seq(stratumCol), "__rk",
        TextStats.hashUniform(col(idCol)).asc, col(idCol).asc)
      .join(ns, Seq(stratumCol))
      .withColumn("split", assign)
      .select((df.columns :+ "split").map(col): _*)
  }

  /** Per-stratum QUANTILE CALIBRATION of a quality score: map each row's
    * score to its empirical quantile rank (rank−1)/(n−1) within its
    * stratum — the standard fix for mixing corpora whose raw scores
    * aren't comparable (one source's 0.7 is another's 0.3): after
    * calibration a single global threshold cuts every source at the same
    * quantile. Ordinal, deterministic (score asc, id asc); a singleton
    * stratum calibrates to 0.0. Adds column `calibrated`.
    *
    * Scale shape: ONE rank shuffle per stratum (the q94/q100/q118
    * contract, same oversized-stratum escape hatch — calibrate a sampled
    * score→quantile map and broadcast-join it when a stratum outgrows
    * its sort). */
  def quantileCalibrate(df: DataFrame, idCol: String, stratumCol: String,
      scoreCol: String): DataFrame = {
    // per-stratum rank through the grouped hatch (handful-sized label
    // domains over a corpus-scaled frame); stratum sizes join back from
    // a plain aggregate
    val ns = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
    Ranks.withRowNumberBy(df, Seq(stratumCol), "__rk",
        col(scoreCol).asc, col(idCol).asc)
      .join(ns, Seq(stratumCol))
      .withColumn("calibrated",
        when(col("__n") === 1, lit(0.0))
          .otherwise((col("__rk") - 1).cast("double") / (col("__n") - 1).cast("double")))
      .select((df.columns :+ "calibrated").map(col): _*)
  }

  /** Token-budget selection: per stratum (source, language), keep
    * documents in quality order (score desc, id asc) until the running
    * token total exceeds `budget` — how a mixture recipe's "N tokens of
    * source X" clause actually materializes. Deterministic: the cumulative
    * sum is over exact integer token counts along a total order. Returns
    * the kept rows with their `cum_tokens` running total.
    *
    * Scale shape: ONE shuffle+sort per stratum key for the running-sum
    * window. Like `balancePerStratum`, a stratum too big to sort is the
    * one being cut hardest — pre-filter with a score threshold from a
    * small sample (or `stratifiedKeep`) to shed the obvious tail map-side
    * before ranking when a single stratum approaches executor-sort size,
    * or switch to [[tokenBudgetSelectBy]], the same cut through the
    * distributed per-group prefix-sum hatch (few-huge-strata regime). */
  def tokenBudgetSelect(df: DataFrame, idCol: String, stratumCol: String,
      tokensCol: String, scoreCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** [[tokenBudgetSelect]] for the FEW-HUGE-STRATA regime: the same
    * quality-ordered running token total and budget cut, but through
    * `Ranks.runningSumsBy` (range exchange on (stratum, score desc, id)
    * + partition walk) instead of a per-stratum window — a mega-stratum
    * never lands on one task. Identical output (equality pinned in
    * MixingSpec); the window form stays the right tool when strata are
    * many and small. */
  def tokenBudgetSelectBy(df: DataFrame, idCol: String, stratumCol: String,
      tokensCol: String, scoreCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    Ranks.runningSumsBy(df, Seq(stratumCol),
        Seq(tokensCol -> "cum_tokens"),
        col(scoreCol).desc, col(idCol).asc)
      .filter(col("cum_tokens") <= budget)
  }

  /** The oversized-stratum escape hatch `quantileCalibrate` documents:
    * instead of rank-sorting every row of a stratum, calibrate against a
    * deterministic md5-SAMPLE of it. Each row's `calibrated` value is the
    * empirical-CDF estimate P(X < x) over its stratum's sample: the
    * fraction of sampled (score, id) pairs lexicographically below the
    * row's own (ties break by id, so the estimate is exact on ties).
    * A stratum with no sampled row calibrates to NULL — no information,
    * and silently emitting 0.5 would bias a downstream threshold.
    *
    * Scale shape: the sample is a map-side filter (fraction of the
    * corpus); per-stratum sorted sample arrays broadcast back (callers
    * size `fraction` so strata-samples fit a broadcast — that is the
    * contract that makes this the big-stratum path); each row then does
    * an O(sample) in-memory count — no rank shuffle anywhere. Estimate
    * error is the standard DKW ~1/√(sample size) bound. */
  def quantileCalibrateSampled(df: DataFrame, idCol: String,
      stratumCol: String, scoreCol: String, fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction in (0,1], got $fraction")
    val s = col(scoreCol).cast("double")
    val smp = df.filter(TextStats.hashUniform(col(idCol)) < fraction)
      .groupBy(col(stratumCol))
      .agg(sort_array(collect_list(
        struct(s.as("s"), col(idCol).as("i")))).as("__smp"))
    df.join(broadcast(smp), Seq(stratumCol), "left")
      .withColumn("calibrated",
        when(col("__smp").isNotNull,
          size(filter(col("__smp"), e =>
            e.getField("s") < s ||
              (e.getField("s") === s && e.getField("i") < col(idCol))))
            .cast("double") / size(col("__smp")).cast("double")))
      .drop("__smp")
  }

  /** Weighted sampling WITHOUT replacement, Efraimidis–Spirakis A-ES:
    * each row draws u = md5-uniform(id) ∈ (0, 1) and keeps the k largest
    * u^(1/w) — equivalently the k largest ln(u)/w, the form used here
    * (one ln, no pow; the transform is monotone so the selected set is
    * identical). Inclusion probability is proportional to weight in the
    * without-replacement sense of A-ES; the draw is the library's
    * standing md5 uniform, so the sample is reproducible across runs,
    * engines and cluster layouts. Rows with weight ≤ 0 or NULL never
    * sample. Returns the k rows with `es_key` (ln(u)/w rounded to 9
    * decimals — ln() differs by 1 ulp across libm implementations, the
    * proven q42 discipline; ordering uses the ROUNDED key with id as the
    * tie-break so both engines cut the same boundary).
    *
    * Scale shape: map-only key computation + TakeOrdered top-k (per-
    * partition heaps merged on the driver, O(k) state — never a global
    * sort); nothing data-sized moves. */
  def weightedSampleTopK(df: DataFrame, idCol: String, weightCol: Column,
      k: Int): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val u = TextStats.hashUniform(col(idCol))
    df.withColumn("weight", weightCol.cast("double"))
      .filter(col("weight") > 0)
      .withColumn("es_key", round(log(u) / col("weight"), 9))
      .orderBy(col("es_key").desc, col(idCol).asc)
      .limit(k)
  }

  /** Token-budget CURRICULUM phases: within each stratum, order docs
    * easiest-first (by `scoreCol` DESC, id ASC — pick a score where
    * higher = earlier) and cut the running token mass into `phases`
    * near-equal-budget phases: phase = ⌊tokens_before · P / total⌋,
    * clamped to P−1 — all integer arithmetic, so the cut points are
    * engine-exact. This is the curriculum-learning data layout (easy →
    * hard by TOKEN budget, not doc count — a phase of few long docs and
    * a phase of many short ones cost the same training compute).
    *
    * Scale shape: the per-stratum running token mass runs through
    * `Ranks.runningSumsBy` (range exchange on (stratum, score desc, id)
    * + partition walk — strata are handful-sized label domains over a
    * corpus-scaled frame, so a per-stratum window would put each
    * stratum on ONE task); totals join back from a plain aggregate.
    * Use an INTEGER score: a float score that differs by 1 ulp across
    * engines would reorder the cumsum. */
  def curriculumPhases(df: DataFrame, idCol: String, stratumCol: String,
      scoreCol: String, tokenCol: String, phases: Int): DataFrame = {
    require(phases >= 1, s"phases must be >= 1, got $phases")
    // the per-stratum running token mass rides the grouped prefix-sum
    // hatch (the mega-stratum note below is now the DEFAULT path);
    // exclusive-before = inclusive − own, totals join back from a plain
    // aggregate
    val tots = df.groupBy(col(stratumCol))
      .agg(sum(col(tokenCol)).cast("long").as("__tot"))
    Ranks.runningSumsBy(df.withColumn("__tk", col(tokenCol).cast("long")),
        Seq(stratumCol), Seq("__tk" -> "__cumi"),
        col(scoreCol).desc, col(idCol).asc)
      .withColumn("__cumb", col("__cumi") - col("__tk"))
      .join(tots, Seq(stratumCol))
      .withColumn("phase",
        least(lit(phases - 1),
          expr(s"(__cumb * $phases) DIV __tot")).cast("int"))
      .select((df.columns :+ "phase").map(col): _*)
  }

  /** Deterministic training-shard assignment + the per-shard RELEASE
    * MANIFEST a dataset ships with: shard = seeded md5 hash of the doc id
    * mod `nShards` (uniform, reproducible across engines/runs — adding
    * docs never moves an existing doc's shard), and per shard
    * (n_docs, n_tokens, content_fp) where `content_fp` folds every doc's
    * 60-bit content hash with an exact decimal SUM mod 2^60 —
    * ORDER-INDEPENDENT, so the fingerprint is bit-identical under any
    * partitioning or merge order, and two independently produced copies
    * of a shard set verify shard-by-shard without sorting anything.
    *
    * Scale shape: map-only hashing + ONE partial-combining aggregation
    * on the (uniform) shard key; output is nShards rows. The writer-side
    * twin is `df.withColumn("shard", …).write.partitionBy("shard")` —
    * this operator is the audit artifact for that layout. */
  def shardManifest(df: DataFrame, idCol: String, textCol: String,
      nShards: Int, seed: Int = 97): DataFrame = {
    require(nShards > 0, s"nShards must be > 0, got $nShards")
    df.select(
        pmod(Dedup.seededHash(seed, col(idCol).cast("string")), lit(nShards.toLong))
          .as("shard"),
        TextStats.wsTokenCount(col(textCol)).cast("long").as("__nt"),
        Dedup.baseHash(col(textCol)).as("__h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("n_tokens"),
        (sum(col("__h").cast("decimal(38,0)")) % lit(1152921504606846976L))
          .cast("long").as("content_fp"))
  }

  /** Temperature-scaled sampling shares (the multilingual-LM mixing
    * rule, Conneau & Lample '19): a stratum with count c gets
    * probability p ∝ c^α — α < 1 flattens the head and boosts the
    * tail. Output per stratum: (stratum, n, share_orig, share_temp,
    * boost = share_temp / share_orig), shares rounded to 6.
    *
    * Exactness: c^α is one pow() per STRATUM (identical doubles in any
    * engine), rounded to 9 and summed as DECIMAL so the normalizer
    * doesn't depend on stratum order. Scale shape: ONE partial-
    * combining count; everything else on the tiny stratum table. */
  def temperatureShares(df: DataFrame, stratumCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha in (0,1]")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__w",
        round(pow(col("n").cast("double"), alpha), 9).cast("decimal(28,9)"))
    val all = Window.partitionBy()
    counts
      .withColumn("__tn", sum(col("n")).over(all))
      .withColumn("__tw", sum(col("__w")).over(all))
      .select(col("stratum"), col("n"),
        round(col("n").cast("double") / col("__tn").cast("double"), 6).as("share_orig"),
        round(col("__w").cast("double") / col("__tw").cast("double"), 6).as("share_temp"))
      .withColumn("boost", round(col("share_temp") / col("share_orig"), 6))
  }

  /** DoReMi-style domain reweighting (Xie et al. 2023, arXiv
    * 2305.10429 — the public Group-DRO mixture recipe): ONE
    * exponentiated-gradient step over per-domain EXCESS loss, with a
    * self-contained, engine-exact excess: for every distinct (domain,
    * word), ln of the ratio between the domain's OWN unigram
    * probability and the corpus unigram probability (9-dp fixed point);
    * per doc the count-weighted mean over its tokens, per domain the
    * mean over its docs — the nats/token that domain-specific modeling
    * buys, i.e. the "learnability headroom" DoReMi's trained
    * proxy-vs-reference pair estimates. From uniform starting weights:
    * w_d ∝ exp(η · max(0, excess_d)), normalized, then uniform-smoothed
    * w ← (1−s)·w + s/k (the paper's step). Output per domain:
    * (domain, n_docs, excess_nats, weight), weights summing to 1.
    *
    * Determinism: all probabilities are ratios of exact counts; every
    * float enters a round-9 DECIMAL before any sum (the LM fixed-point
    * discipline), and exp() sees the round-6 domain excess, so the
    * weights are bit-identical in any engine.
    *
    * Scale shape: one (doc, word) count aggregation; the (domain, word)
    * model DERIVES from it by re-aggregation (never a second corpus
    * pass); the model joins back on the uniform word key UNHINTED (at
    * 100 TB the distinct-word table is vocab-scaled — AQE broadcasts it
    * only when it is actually small); the weight arithmetic runs on the
    * k-domain table (bounded — the q197 share-table discipline). */
  def doremiWeights(df: DataFrame, idCol: String, domainCol: String,
      textCol: String, eta: Double = 1.0,
      smoothing: Double = 0.2): DataFrame = {
    require(eta > 0, s"eta must be > 0, got $eta")
    require(smoothing >= 0 && smoothing < 1,
      s"smoothing must be in [0, 1), got $smoothing")
    val dw = df.select(col(idCol).as("__id"), col(domainCol).as("__dm"),
        explode(split(lower(col(textCol)), " ")).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy(col("__id"), col("__dm"), col("__w"))
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint(false) // model aggregation + the score join
    val cd = dw.groupBy(col("__dm"), col("__w")).agg(sum(col("__n")).as("__cd"))
      .localCheckpoint(false) // corpus model + domain totals + score join
    val cw = cd.groupBy(col("__w")).agg(sum(col("__cd")).as("__c"))
    val td = cd.groupBy(col("__dm")).agg(sum(col("__cd")).as("__td"))
    val tt = cw.agg(sum(col("__c")).as("__tt"))
    def d(c: Column) = c.cast("double")
    // nats(d, w) = ln( (cd/td) / (c/tt) ), 9-dp fixed point; per-doc
    // sum weights each distinct word by its in-doc count (exact decimal
    // × integer — no re-rounding)
    val term = round(log((d(col("__cd")) / d(col("__td"))) /
      (d(col("__c")) / d(col("__tt")))), 9).cast("decimal(28,9)")
    val perDoc = dw
      .join(cd, Seq("__dm", "__w"))
      .join(cw, Seq("__w"))
      .join(td, Seq("__dm"))
      .crossJoin(tt)
      .select(col("__id"), col("__dm"),
        (term * col("__n")).as("__t"), col("__n"))
      .groupBy(col("__id"), col("__dm"))
      .agg((sum(col("__t")).cast("double") / sum(col("__n")).cast("double"))
        .as("__ex"))
    val dom = perDoc.groupBy(col("__dm"))
      .agg(count(lit(1)).as("n_docs"),
        sum(round(col("__ex"), 9).cast("decimal(28,9)")).as("__sx"))
      .withColumn("excess_nats",
        round(col("__sx").cast("double") / col("n_docs").cast("double"), 6))
    // EG step on the k-domain table (bounded): uniform w0 cancels in
    // the normalization
    val u = round(exp(lit(eta) * greatest(col("excess_nats"), lit(0.0))), 9)
      .cast("decimal(28,9)")
    val all = Window.partitionBy()
    dom.withColumn("__u", u)
      .withColumn("__tu", sum(col("__u")).over(all))
      .withColumn("__k", count(lit(1)).over(all))
      .select(col("__dm").as(domainCol), col("n_docs"), col("excess_nats"),
        round(lit(1.0 - smoothing) *
          (col("__u").cast("double") / col("__tu").cast("double")) +
          lit(smoothing) / col("__k").cast("double"), 6).as("weight"))
  }

  /** Exponential freshness decay per source: each row contributes
    * weight e^(−λ · age_days) where age is measured against the
    * corpus's newest timestamp; output per source (source, n,
    * weight_sum, share) — the time-decayed mixing weight table.
    * Per-row weights are rounded to 9 and summed as DECIMAL (exact,
    * order-independent); age is an integer day difference, so the
    * exp() inputs are identical in any engine.
    *
    * Scale shape: one 1-row max-ts aggregate broadcast back, then ONE
    * partial-combining source-keyed sum; share is computed on the
    * source table with a partition-all window (tiny). */
  def freshnessWeights(df: DataFrame, sourceCol: String, tsCol: String,
      lambdaPerDay: Double): DataFrame = {
    require(lambdaPerDay > 0, "lambda must be positive")
    import org.apache.spark.sql.expressions.Window
    val maxDay = df.agg(max(to_date(col(tsCol))).as("__d1"))
    val w = df.crossJoin(broadcast(maxDay))
      .select(col(sourceCol).as("source"),
        round(exp(lit(-lambdaPerDay) *
          datediff(col("__d1"), to_date(col(tsCol))).cast("double")), 9)
          .cast("decimal(19,9)").as("__w"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("__w")).as("__ws"))
    w.withColumn("__tot", sum(col("__ws")).over(Window.partitionBy()))
      .select(col("source"), col("n"),
        round(col("__ws").cast("double"), 6).as("weight_sum"),
        round(col("__ws").cast("double") / col("__tot").cast("double"), 6).as("share"))
  }

  /** Deterministic uniform negative sampling for contrastive training:
    * for every anchor document, k pseudo-random corpus ids drawn
    * join-free as mixⱼ(md5(id)) mod N — the complement of the
    * hard-negative miner (q99): contrastive batches need mostly EASY
    * negatives, and at 100 TB a join-free draw (no shuffle at all —
    * one map pass) is the only shape that survives. REQUIRES the dense
    * 0..N−1 id contract (TESTDATA documents hold it; for sparse id
    * spaces, zip with a manifest row_number first — the q169 shard
    * discipline). Accidental self-draws are FLAGGED, not resampled
    * (resampling would make the draw count data-dependent); the
    * trainer drops them.
    *
    * Scale shape: ONE map-only pass (1 md5 + k rotate-xor mixes per
    * row), zero shuffles. Output: (doc_id, j, neg_id, is_self). */
  /** Reshard-movement plan: when the shard count changes kOld → kNew,
    * how many keys MOVE under (a) mod-hashing — nearly everything —
    * versus (b) rendezvous / highest-random-weight hashing — only
    * ≈ (kNew−kOld)/kNew, the minimum possible — the one-number argument
    * for HRW placement before a 100 TB re-layout. HRW shard =
    * argmax_j mixⱼ(md5(id)) over the shard seeds (ties are measure-zero
    * on 60-bit values); adding shards only ever STEALS keys whose new
    * seed wins.
    *
    * Scale shape: ONE map-only pass (1 md5 + kNew mixes per key) + a
    * 1-row aggregate. Output: (strategy, n_docs, n_moved, moved_frac)
    * × {mod, rendezvous}. */
  def reshardPlan(df: DataFrame, idCol: String, kOld: Int,
      kNew: Int): DataFrame = {
    require(kOld >= 1 && kNew > kOld && kNew <= 64, "1 <= kOld < kNew <= 64")
    def rendezvous(k: Int) = {
      val vals = array((0 until k).map(j => Dedup.mixHash(col("__h"), j)): _*)
      (array_position(vals, array_max(vals)) - 1).cast("int")
    }
    val lab = df
      .select(Dedup.seededHash(0, col(idCol).cast("string")).as("__h"))
      .select(
        (pmod(col("__h"), lit(kOld.toLong)) =!=
          pmod(col("__h"), lit(kNew.toLong))).as("__mvMod"),
        (rendezvous(kOld) =!= rendezvous(kNew)).as("__mvHrw"))
    val agg = lab.agg(count(lit(1)).as("__n"),
        sum(when(col("__mvMod"), 1L).otherwise(0L)).as("__m1"),
        sum(when(col("__mvHrw"), 1L).otherwise(0L)).as("__m2"))
      .localCheckpoint(false) // both strategy rows read it
    def row(name: String, m: String) = agg.select(lit(name).as("strategy"),
      col("__n").as("n_docs"), col(m).as("n_moved"),
      round(col(m).cast("double") / col("__n").cast("double"), 6)
        .as("moved_frac"))
    row("mod", "__m1").unionByName(row("rendezvous", "__m2"))
  }

  def negativeSample(df: DataFrame, idCol: String, k: Int,
      seed: Int): DataFrame = {
    require(k >= 1 && k <= 64, "k in [1, 64]")
    val n = df.count() // metadata-scale driver scalar (the kCore count class)
    val base = df.select(col(idCol).cast("long").as("doc_id"),
      Dedup.seededHash(seed, col(idCol).cast("string")).as("__h0"))
    base.select(col("doc_id"),
        posexplode(array((0 until k).map(j =>
          pmod(Dedup.mixHash(col("__h0"), j), lit(n))): _*))
          .as(Seq("j", "neg_id")))
      .withColumn("is_self", col("neg_id") === col("doc_id"))
  }

  /** Neyman-optimal stratified sample allocation (Neyman 1934; the
    * survey-sampling counterpart of proportional `stratifiedKeep`):
    * given a total budget `nTotal`, stratum h gets
    * n_h ∝ N_h·S_h (population size × population std dev), which
    * minimises the variance of the stratified mean estimator. Integer
    * totals are made exact by largest-remainder apportionment (floor
    * everything, then hand out the leftover units by fractional
    * remainder, ties on the stratum key) so Σ n_h == nTotal always.
    *
    * Scale shape: ONE partial-combining aggregate over the fact table
    * carrying exact DECIMAL (Σx, Σx²) per stratum — std dev is computed
    * from those on the stratum-sized table, as is the apportionment
    * window. Output: (stratum, n_pop, sd, n_alloc), sd rounded 6. */
  def neymanAllocation(df: DataFrame, stratumCol: String, valueCol: String,
      nTotal: Int): DataFrame = {
    val st = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_pop"),
        sum(col(valueCol).cast("decimal(18,6)")).as("__s1"),
        sum((col(valueCol).cast("decimal(18,6)") *
          col(valueCol).cast("decimal(18,6)")).cast("decimal(38,12)"))
          .as("__s2"))
      .select(col("stratum"), col("n_pop"),
        sqrt(greatest(lit(0.0),
          col("__s2").cast("double") / col("n_pop").cast("double") -
          (col("__s1").cast("double") / col("n_pop").cast("double")) *
          (col("__s1").cast("double") / col("n_pop").cast("double"))))
          .as("__sd"))
    val weighted = st.withColumn("__w",
        col("n_pop").cast("double") * col("__sd"))
      .withColumn("__wtot",
        sum(round(col("__w"), 6).cast("decimal(28,6)"))
          .over(Window.partitionBy()).cast("double"))
      .withColumn("__raw", lit(nTotal.toDouble) * col("__w") / col("__wtot"))
      .withColumn("__base", floor(col("__raw")).cast("long"))
      .withColumn("__left",
        lit(nTotal.toLong) - sum(col("__base")).over(Window.partitionBy()))
      .withColumn("__rk", row_number().over(Window.orderBy(
        (col("__raw") - col("__base").cast("double")).desc, col("stratum"))))
    weighted.select(col("stratum"), col("n_pop"),
      round(col("__sd"), 6).as("sd"),
      (col("__base") + when(col("__rk") <= col("__left"), 1L).otherwise(0L))
        .as("n_alloc"))
  }

  /** UniMax language-budget allocation (Chung et al. 2023): split a
    * total token budget across languages so every language gets an
    * EQUAL share — except that no language repeats more than
    * `maxEpochs` times (small languages hit their epoch cap; the
    * leftover redistributes equally among the rest). The closed-form
    * waterfill: sort caps ascending, find the capped prefix, level the
    * remainder —
    *
    *   alloc_c = min(cap_c, θ),  cap_c = tokens_c · maxEpochs,
    *   θ = (B − Σ_{capped} cap)/|uncapped|  (∞ when B ≥ Σcap)
    *
    * A row at sorted position i is capped iff cap_i·(n−i+1) ≤ B−S_{i−1}
    * (ascending caps make the capped set a prefix — proof: if row i
    * satisfies it, substituting cap_{i−1} ≤ cap_i shows row i−1 does).
    *
    * Scale shape: ONE partial-combining per-language token sum over the
    * corpus; the waterfill itself runs in windows over the BOUNDED
    * language table (label domain, not data-scaled). Output per
    * language: (lang, tokens, cap, alloc, epochs), epochs = alloc /
    * tokens ≤ maxEpochs. */
  def unimaxAllocation(df: DataFrame, langCol: String, tokensCol: Column,
      budgetTokens: Long, maxEpochs: Double): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    require(maxEpochs > 0, s"maxEpochs must be > 0, got $maxEpochs")
    def d(c: Column) = c.cast("double")
    val lt = df.groupBy(col(langCol).as("lang"))
      .agg(sum(tokensCol.cast("long")).as("tokens"))
      .filter(col("tokens") > 0)
      .withColumn("__cap", round(d(col("tokens")) * lit(maxEpochs), 9)
        .cast("decimal(28,9)"))
    // bounded-domain windows: |langs| rows — never data-scaled
    val w = Window.orderBy(col("__cap"), col("lang"))
    val all = Window.partitionBy()
    val ranked = lt
      .withColumn("__i", row_number().over(w).cast("long"))
      .withColumn("__s", sum(col("__cap")).over(w)) // inclusive prefix
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__capped",
        d(col("__cap")) * d(col("__n") - col("__i") + 1) <=
          lit(budgetTokens.toDouble) - d(col("__s") - col("__cap")))
      .withColumn("__k", sum(when(col("__capped"), 1L).otherwise(0L)).over(all))
      .withColumn("__sk",
        coalesce(max(when(col("__capped"), col("__s"))).over(all),
          lit(0).cast("decimal(38,9)")))
    val theta = when(col("__k") === col("__n"), lit(Double.MaxValue))
      .otherwise((lit(budgetTokens.toDouble) - d(col("__sk"))) /
        d(col("__n") - col("__k")))
    ranked
      .withColumn("__alloc", least(d(col("__cap")), theta))
      .select(col("lang"), col("tokens"),
        round(d(col("__cap")), 6).as("cap"),
        round(col("__alloc"), 6).as("alloc"),
        round(col("__alloc") / d(col("tokens")), 6).as("epochs"))
  }
}
