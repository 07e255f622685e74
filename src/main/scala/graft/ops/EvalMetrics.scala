package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generation-eval metrics over candidate/reference text pairs — the
  * measurement side of a training pipeline (benchmark scoring, distilled-
  * output QA, decode-diversity audits): ROUGE-n (Lin 2004), corpus-level
  * BLEU with brevity penalty (Papineni et al. 2002), and distinct-n
  * diversity (Li et al. 2016). All three are n-gram multiset arithmetic,
  * so they run as relational aggregates — no per-pair UDF loops.
  *
  * Scale shape: each metric reduces pairs to (pair, gram-hash, count)
  * rows via the ngramCoverage gram kernel (60-bit md5 hashes shuffle,
  * gram strings never do), then one equi-join on (pair, hash) for the
  * clipped overlap and partial-combining aggregates for the totals.
  * Corpus BLEU aggregates the clipped counts BEFORE the ratio (the
  * corpus-level definition — NOT a mean of sentence BLEUs), so the
  * output is a handful of scalar rows regardless of corpus size. */
object EvalMetrics {

  /** (pair key, gram hash, multiplicity) for word n-grams of `textCol`
    * — multiset counts, unlike ngramCoverage's distinct sets. Hashing
    * runs through the one-pass `md5Prefix60Array` kernel over the gram
    * STRING array (== `Dedup.baseHash` element-wise, the spec-pinned
    * library contract) instead of the hex-substring-conv expression per
    * gram — one digest per gram, no hex-string allocation. */
  /** The ONE word tokenizer every n-gram metric shares: lowercase,
    * split on single spaces, DROP empty tokens. Without the drop,
    * `split("")` yields `[""]` — an empty candidate would contribute
    * cand_len = 1 to BLEU's brevity penalty and a phantom 1-gram to
    * every overlap (the wer/goodTuring convention, now uniform across
    * the eval tier; each gate's oracle applies the same list_filter). */
  private def wordTokens(textCol: String): Column =
    filter(split(lower(col(textCol)), " "), t => length(t) > 0)

  /** BOTH sides' n-gram counts in ONE explode+shuffle: every gram is
    * tagged with its side (0 = cand, 1 = ref) before the flatten, and
    * the (key, gram) group carries one conditional count per side. A
    * (pid, gh) group missing from a side reads 0 — `least(c, 0) = 0`
    * reproduces the old clip inner-join semantics exactly, so the
    * overlap/clip consumers drop their join AND the second scan of the
    * pair frame (guide §2.4: two operations keyed the same way share
    * one exchange — here they share the scan too). */
  private def gramCountsBoth(df: DataFrame, keyCol: String, candCol: String,
      refCol: String, n: Int): DataFrame = {
    val tagged = graft.functions.Let.bindOnce(wordTokens(candCol)) { ct =>
      graft.functions.Let.bindOnce(wordTokens(refCol)) { rt =>
        def side(toks: Column, s: Int) = {
          val grams = when(size(toks) >= n, transform(
            sequence(lit(0), size(toks) - n),
            i => concat_ws(" ", (0 until n).map(j => get(toks, i + j)): _*)))
            .otherwise(array().cast("array<string>"))
          transform(graft.functions.HashOps.md5Prefix60Array(grams),
            h => struct(h.as("h"), lit(s).as("s")))
        }
        concat(side(ct, 0), side(rt, 1))
      }
    }
    df.select(col(keyCol).as("__pid"), explode(tagged).as("__g"))
      .groupBy(col("__pid"), col("__g").getField("h").as("__gh"))
      .agg(sum(when(col("__g").getField("s") === 0, 1L).otherwise(0L)).as("__c"),
        sum(when(col("__g").getField("s") === 1, 1L).otherwise(0L)).as("__cr"))
  }

  private def gramCounts(df: DataFrame, keyCol: String, textCol: String,
      n: Int): DataFrame = {
    // Let-bound: the token array must be a lambda VARIABLE before the
    // per-gram lambda reads it — otherwise `get(toks, i + j)` re-runs
    // the whole split per token slot (lambda bodies are CSE-exempt:
    // n re-splits per gram made q398/q399 top-of-bench)
    val ghs = graft.functions.Let.bindOnce(
        wordTokens(textCol)) { toks =>
      val grams = when(size(toks) >= n, transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => get(toks, i + j)): _*)))
        .otherwise(array().cast("array<string>"))
      graft.functions.HashOps.md5Prefix60Array(grams)
    }
    df.select(col(keyCol).as("__pid"), explode(ghs).as("__gh"))
      .groupBy(col("__pid"), col("__gh")).agg(count(lit(1)).as("__c"))
  }

  /** (__pid, __n, __gh, __c) for every level n = 1..maxN in ONE
    * scan+shuffle: per row, all levels' gram hashes flatten into one
    * tagged array before the explode. The per-level corpus metrics
    * (BLEU) read all levels from this single count table instead of
    * re-scanning the corpus per level. */
  private def gramCountsAllN(df: DataFrame, keyCol: String, textCol: String,
      maxN: Int): DataFrame = {
    val tagged = graft.functions.Let.bindOnce(
        wordTokens(textCol)) { toks =>
      flatten(array((1 to maxN).map { n =>
        val grams = when(size(toks) >= n, transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(j => get(toks, i + j)): _*)))
          .otherwise(array().cast("array<string>"))
        transform(graft.functions.HashOps.md5Prefix60Array(grams),
          h => struct(lit(n).as("n"), h.as("h")))
      }: _*))
    }
    df.select(col(keyCol).as("__pid"), explode(tagged).as("__g"))
      .select(col("__pid"), col("__g").getField("n").as("__n"),
        col("__g").getField("h").as("__gh"))
      .groupBy(col("__pid"), col("__n"), col("__gh"))
      .agg(count(lit(1)).as("__c"))
  }

  /** ROUGE-n per pair: clipped n-gram overlap Σ min(count_cand,
    * count_ref) with precision = overlap/|cand grams|, recall =
    * overlap/|ref grams|, F1. Pairs where a side has fewer than n tokens
    * carry zero grams: the affected ratio is NULL (0/0 is undefined, not
    * zero) and f1 is 0. Output: (pair, n_cand, n_ref, n_overlap,
    * precision, recall, f1 ← round 6). */
  def rougeN(pairs: DataFrame, pairCol: String, candCol: String,
      refCol: String, n: Int): DataFrame = {
    require(n >= 1, "n >= 1")
    // one fused explode+shuffle for both sides — least(c, 0) = 0 keeps
    // the old clip inner-join semantics for one-sided grams
    val ov = gramCountsBoth(pairs, pairCol, candCol, refCol, n)
      .groupBy(col("__pid"))
      .agg(sum(least(col("__c"), col("__cr"))).as("__ov"))
    // Per-pair gram TOTALS are a pure function of token count — a row
    // with L tokens carries exactly max(0, L−n+1) n-gram instances — so
    // they come from one shuffle-free length aggregate instead of a
    // second evaluation of the lazy gram explode+count per side (guide
    // §2.3 "aggregate before you shuffle": the totals never needed the
    // grams, only their number).
    def lenTotals(src: String, out: String) = pairs
      .select(col(pairCol).as("__pid"),
        greatest(lit(0L), size(wordTokens(src)).cast("long") - lit(n - 1L))
          .as("__l"))
      .groupBy(col("__pid")).agg(sum(col("__l")).as(out))
    val ct = lenTotals(candCol, "__nc")
    val rt = lenTotals(refCol, "__nr")
    def d(c: Column) = c.cast("double")
    pairs.select(col(pairCol).as("__pid"))
      .join(ct, Seq("__pid"), "left").join(rt, Seq("__pid"), "left")
      .join(ov, Seq("__pid"), "left")
      .select(col("__pid").as("pair"),
        coalesce(col("__nc"), lit(0L)).as("n_cand"),
        coalesce(col("__nr"), lit(0L)).as("n_ref"),
        coalesce(col("__ov"), lit(0L)).as("n_overlap"))
      .withColumn("precision",
        when(col("n_cand") > 0, round(d(col("n_overlap")) / d(col("n_cand")), 6)))
      .withColumn("recall",
        when(col("n_ref") > 0, round(d(col("n_overlap")) / d(col("n_ref")), 6)))
      .withColumn("f1",
        // parenthesization matches the oracle exactly — (2·(ov/nc))·(ov/nr)
        // — so both engines run the identical double-op sequence
        when(col("n_overlap") > 0, round(
          lit(2.0) * (d(col("n_overlap")) / d(col("n_cand"))) * (d(col("n_overlap")) / d(col("n_ref"))) /
            (d(col("n_overlap")) / d(col("n_cand")) + d(col("n_overlap")) / d(col("n_ref"))), 6))
          .otherwise(lit(0.0)))
  }

  /** ROUGE-L per pair (Lin 2004): LCS-based overlap — credit for tokens
    * appearing IN ORDER even when not contiguous, the sequence-aware
    * complement of [[rougeN]]'s fixed grams. precision = LCS/|cand|,
    * recall = LCS/|ref|, F1; a side capped to zero tokens yields a NULL
    * ratio (0/0 undefined, not zero) and f1 = 0, mirroring rougeN.
    * Output: (pair, n_cand, n_ref, lcs, precision, recall, f1 ← rnd 6).
    *
    * `maxTokens` caps BOTH sides (`slice`) and is part of the metric's
    * contract: LCS is inherently O(m·n) per pair, so the cap is what
    * bounds per-pair cost at corpus scale (and what any cross-engine
    * oracle must apply identically).
    *
    * Scale shape: map-only per pair — the DP runs inside the codegen'd
    * `lcs_length` expression (one O(cap²) loop per row, O(cap) state);
    * no join, no shuffle beyond what the caller's pair frame carries. */
  def rougeL(pairs: DataFrame, pairCol: String, candCol: String,
      refCol: String, maxTokens: Int = 24): DataFrame = {
    require(maxTokens >= 1 && maxTokens <= 256,
      s"maxTokens in [1, 256], got $maxTokens")
    def capped(c: String) = slice(wordTokens(c), 1, maxTokens)
    def d(c: Column) = c.cast("double")
    pairs.select(col(pairCol).as("pair"),
        capped(candCol).as("__c"), capped(refCol).as("__r"))
      .select(col("pair"),
        size(col("__c")).cast("long").as("n_cand"),
        size(col("__r")).cast("long").as("n_ref"),
        graft.functions.Lcs.lcsLength(col("__c"), col("__r")).as("lcs"))
      .withColumn("precision",
        when(col("n_cand") > 0, round(d(col("lcs")) / d(col("n_cand")), 6)))
      .withColumn("recall",
        when(col("n_ref") > 0, round(d(col("lcs")) / d(col("n_ref")), 6)))
      .withColumn("f1",
        when(col("lcs") > 0, round(
          lit(2.0) * (d(col("lcs")) / d(col("n_cand"))) * (d(col("lcs")) / d(col("n_ref"))) /
            (d(col("lcs")) / d(col("n_cand")) + d(col("lcs")) / d(col("n_ref"))), 6))
          .otherwise(lit(0.0)))
  }

  /** WER — word error rate (the ASR/seq2seq transcription metric):
    * token-level Levenshtein distance candidate→reference over the
    * first `maxTokens` lowercased whitespace tokens, per pair, with
    * `wer = edits / n_ref` (NULL when the capped reference is empty —
    * the conventional undefined case; WER > 1 is legal when the
    * candidate over-generates). Corpus WER is Σedits/Σn_ref — derivable
    * from these rows by the caller; the per-pair rows are the useful
    * artifact (error triage sorts by them).
    *
    * Scale shape: ONE codegen'd [[graft.functions.WordLev]] DP per
    * pair inside the scan projection — no join, no shuffle, no
    * per-pair driver work. The token cap bounds the quadratic DP
    * (same contract as [[rougeL]]). */
  def wer(pairs: DataFrame, pairCol: String, candCol: String,
      refCol: String, maxTokens: Int = 24): DataFrame = {
    require(maxTokens >= 1 && maxTokens <= 256,
      s"maxTokens in [1, 256], got $maxTokens")
    // empty tokens drop after the split (see [[wordTokens]]): without
    // this an empty or multi-space reference yields phantom tokens —
    // an empty ref would get n_ref = 1 and a defined WER instead of
    // the documented NULL undefined case
    def capped(c: String) = slice(wordTokens(c), 1, maxTokens)
    def d(c: Column) = c.cast("double")
    pairs.select(col(pairCol).as("pair"),
        capped(candCol).as("__c"), capped(refCol).as("__r"))
      .select(col("pair"),
        size(col("__c")).cast("long").as("n_cand"),
        size(col("__r")).cast("long").as("n_ref"),
        graft.functions.WordLev.wordLevenshtein(col("__c"), col("__r"))
          .as("edits"))
      .withColumn("wer",
        when(col("n_ref") > 0, round(d(col("edits")) / d(col("n_ref")), 6)))
  }

  /** Corpus-level BLEU-`maxN`: modified n-gram precisions p_n =
    * Σ_pairs clip_n / Σ_pairs cand_n (clipped counts SUMMED over the
    * corpus before the ratio), brevity penalty BP = min(1, e^(1−r/c))
    * over total lengths, BLEU = BP · exp(Σ_n ln p_n / maxN) — zero when
    * any p_n is zero (the standard convention; smoothing is a caller-side
    * variant). Ratios are round-9 before the ln/exp composition and the
    * headline is round-6 — the library's ln/exp determinism discipline.
    * Output: ONE row (bleu, bp, cand_len, ref_len, p_1..p_maxN). */
  def corpusBleu(pairsIn: DataFrame, pairCol: String, candCol: String,
      refCol: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, "maxN in [1, 8]")
    def d(c: Column) = c.cast("double")
    // The caller's pair frame often embeds a join (e.g. doc-successor
    // pairing); the four count-table evaluations below (clip join +
    // totals, per side) would re-run it each time. Cut it ONCE (eager,
    // pair-count-sized: two text payloads per row), release after the
    // scalar result materialises — the simhashDupPairs checkpoint
    // discipline (Dedup.scala:350).
    val pairs = pairsIn
      .select(col(pairCol), col(candCol), col(refCol))
      .localCheckpoint(eager = true)
    // ALL n levels in one scan+shuffle per side (was one gram pass per
    // side per level: 2·maxN scans + maxN clip joins — 8 scans and 4
    // joins at maxN=4; scan count is what survives a 100× scale-up).
    // The (pid, n, gh) grouping keys both sides identically, so the
    // clip join reuses the aggregate's partitioning — one shuffle.
    // (A single fused both-sides pass was MEASURED SLOWER here — 4.4 s
    // vs 3.2 s at sf0.1: the pair frame is already checkpointed, so the
    // saved scan was cheap, and the doubled per-row gram array costs
    // more than the partition-aligned clip join it removed.)
    val cg = gramCountsAllN(pairs, pairCol, candCol, maxN)
    val rg = gramCountsAllN(pairs, pairCol, refCol, maxN)
    def perLevel(src: DataFrame, value: Column, prefix: String) =
      src.agg(
        coalesce(sum(when(col("__n") === 1, value)), lit(0L))
          .as(s"${prefix}_1"),
        (2 to maxN).map(n =>
          coalesce(sum(when(col("__n") === n, value)), lit(0L))
            .as(s"${prefix}_$n")): _*)
    val clips = perLevel(
      cg.join(rg.withColumnRenamed("__c", "__cr"), Seq("__pid", "__n", "__gh")),
      least(col("__c"), col("__cr")), "__clip")
    // Corpus gram TOTALS per level are a pure function of token counts —
    // a row with L tokens carries exactly max(0, L−n+1) n-gram instances
    // — so each side's totals come from ONE shuffle-free length aggregate
    // over the checkpointed pairs instead of a second evaluation of the
    // whole gram explode+shuffle (guide §2.3: the totals never needed
    // the grams, only their number). Each gram pass now evaluates
    // exactly once (the clip join); the level-1 totals still double as
    // the corpus lengths.
    def lenTotals(src: String, prefix: String) = pairs
      .select(size(wordTokens(src)).cast("long").as("__l"))
      .agg(
        coalesce(sum(greatest(lit(0L), col("__l"))), lit(0L))
          .as(s"${prefix}_1"),
        (2 to maxN).map(n =>
          coalesce(sum(greatest(lit(0L), col("__l") - lit(n - 1L))), lit(0L))
            .as(s"${prefix}_$n")): _*)
    val tots = lenTotals(candCol, "__tot")
    val rtots = lenTotals(refCol, "__rt")
    val perN = clips.crossJoin(tots).crossJoin(rtots).select(
      (1 to maxN).map(n =>
        round(d(col(s"__clip_$n")) / d(col(s"__tot_$n")), 9).as(s"p_$n")) ++
      Seq(col("__tot_1").as("cand_len"), col("__rt_1").as("ref_len")): _*)
    val bp = least(lit(1.0), round(
      exp(lit(1.0) - d(col("ref_len")) / d(col("cand_len"))), 9))
    val logSum = (1 to maxN).map(n => log(col(s"p_$n"))).reduce(_ + _)
    val anyZero = (1 to maxN).map(n => col(s"p_$n") === 0.0).reduce(_ || _)
    val out = perN
      .withColumn("bp", bp)
      .withColumn("bleu", when(anyZero, lit(0.0))
        .otherwise(round(col("bp") * exp(logSum / maxN), 6)))
      .select(Seq(col("bleu"), col("bp"), col("cand_len"), col("ref_len")) ++
        (1 to maxN).map(n => col(s"p_$n")): _*)
      .localCheckpoint(eager = true) // ONE scalar row
    Dedup.unpersistCheckpoint(pairs)
    out
  }

  /** CIDEr-D (Vedantam et al. 2015, the COCO caption metric) per pair,
    * single-reference form — consensus as tf-idf-weighted n-gram cosine,
    * the missing sibling of [[corpusBleu]]/[[rougeN]]/[[chrF]]:
    *
    *   w_s(g) = tf_s(g)·(ln N − ln(max(1, df(g))))   (df over the
    *     REFERENCE corpus; candidate grams absent from every reference
    *     carry the FULL ln N weight — the coco-caption convention),
    *   score_n = Σ_g min(w_c, w_r)·w_r / (‖w_c‖·‖w_r‖)   (the -D
    *     candidate clipping, so gram stuffing can't inflate it),
    *   CIDEr-D = (10/maxN)·e^(−(l_c−l_r)²/(2σ²))·Σ_n score_n.
    *
    * Float discipline: idf weights are one mirrored double expression;
    * every per-gram product (numerator terms, squared norms) rounds to
    * 9 dp and sums as DECIMAL so per-pair reductions are gram-order
    * independent; the penalty exponential rounds 9; headline rounds 6.
    *
    * Scale shape: the [[corpusBleu]] kernel plan — ONE all-levels gram
    * count pass per side, a (n, gram)-keyed reference-df aggregate
    * (reference corpus vocab-sized), (pid, n, gram)-keyed weight joins
    * that reuse the count tables' partitioning, pair-sized output. The
    * only driver scalar is the pair count N for ln N. Output per pair:
    * (pair, n_cand, n_ref, cider_d). */
  def ciderD(pairsIn: DataFrame, pairCol: String, candCol: String,
      refCol: String, maxN: Int = 4, sigma: Double = 6.0): DataFrame = {
    require(maxN >= 1 && maxN <= 8 && sigma > 0, "maxN in [1, 8], sigma > 0")
    def d(c: Column) = c.cast("double")
    def dec9(c: Column) = round(c, 9).cast("decimal(28,9)")
    val pairs = pairsIn
      .select(col(pairCol), col(candCol), col(refCol))
      .localCheckpoint(eager = true)
    val lnN = math.log(math.max(1L, pairs.count()).toDouble)
    val cg = gramCountsAllN(pairs, pairCol, candCol, maxN)
      .localCheckpoint(false) // consumers: weights, numerator, lengths
    val rg = gramCountsAllN(pairs, pairCol, refCol, maxN)
      .localCheckpoint(false) // consumers: df, weights, numerator, lengths
    val dfTab = rg.groupBy(col("__n"), col("__gh"))
      .agg(count(lit(1)).as("__df")) // one row per pid by construction
    def w(dfCol: Column) =
      lit(lnN) - log(greatest(dfCol.cast("double"), lit(1.0)))
    val vc = cg.join(dfTab, Seq("__n", "__gh"), "left")
      .select(col("__pid"), col("__n"), col("__gh"),
        (d(col("__c")) * w(coalesce(col("__df"), lit(0L)))).as("__wc"))
    val vr = rg.join(dfTab, Seq("__n", "__gh"))
      .select(col("__pid"), col("__n"), col("__gh"),
        (d(col("__c")) * w(col("__df"))).as("__wr"))
    val normC = vc.groupBy(col("__pid"), col("__n"))
      .agg(sum(dec9(col("__wc") * col("__wc"))).as("__nc"))
    val normR = vr.groupBy(col("__pid"), col("__n"))
      .agg(sum(dec9(col("__wr") * col("__wr"))).as("__nr"))
    val num = vc.join(vr, Seq("__pid", "__n", "__gh"))
      .groupBy(col("__pid"), col("__n"))
      .agg(sum(dec9(least(col("__wc"), col("__wr")) * col("__wr")))
        .as("__num"))
    val perLevel = normC.join(normR, Seq("__pid", "__n"))
      .join(num, Seq("__pid", "__n"), "left")
      .select(col("__pid"),
        when(col("__nc") > 0 && col("__nr") > 0,
          coalesce(d(col("__num")), lit(0.0)) /
            (sqrt(d(col("__nc"))) * sqrt(d(col("__nr")))))
          .otherwise(lit(0.0)).as("__s"))
    val perPair = perLevel.groupBy(col("__pid"))
      .agg(sum(dec9(col("__s"))).as("__ss"))
    def len(src: DataFrame, out: String) =
      src.filter(col("__n") === 1).groupBy(col("__pid"))
        .agg(sum(col("__c")).as(out))
    pairs.select(col(pairCol).as("__pid"))
      .join(len(cg, "__lc"), Seq("__pid"), "left")
      .join(len(rg, "__lr"), Seq("__pid"), "left")
      .join(perPair, Seq("__pid"), "left")
      .select(col("__pid").as("pair"),
        coalesce(col("__lc"), lit(0L)).as("n_cand"),
        coalesce(col("__lr"), lit(0L)).as("n_ref"),
        col("__ss"))
      .withColumn("__pen", round(exp(
        (lit(0.0) - (d(col("n_cand")) - d(col("n_ref"))) *
          (d(col("n_cand")) - d(col("n_ref")))) /
          lit(2.0 * sigma * sigma)), 9))
      .withColumn("cider_d", round(
        col("__pen") * lit(10.0 / maxN) *
          coalesce(d(col("__ss")), lit(0.0)), 6))
      .drop("__pen", "__ss")
  }

  /** Corpus-level chrF (Popović 2015): character n-gram F-β score.
    * Whitespace is removed, char n-grams for n = 1..maxN are counted as
    * multisets per pair, clipped overlaps/totals are SUMMED over the
    * corpus per level, chrP/chrR are the MEANS of the per-level
    * precision/recall (levels with an empty candidate or reference side
    * contribute 0 — the sacreBLEU convention), and
    * chrF = (1+β²)·chrP·chrR / (β²·chrP + chrR) (0 when the denominator
    * is 0). β = 2 weights recall twice. Output: ONE row
    * (chrf, chr_p, chr_r ← round 6).
    *
    * Scale shape: identical to corpusBleu — ONE (pair, level, gram)
    * count pass per side covering every level, one clip join, scalar
    * output; the pair frame is lineage-cut once and released. */
  def chrF(pairsIn: DataFrame, pairCol: String, candCol: String,
      refCol: String, maxN: Int = 6, beta: Double = 2.0): DataFrame = {
    require(maxN >= 1 && maxN <= 8 && beta > 0, "maxN in [1, 8], beta > 0")
    def d(c: Column) = c.cast("double")
    val pairs = pairsIn
      .select(col(pairCol), col(candCol), col(refCol))
      .localCheckpoint(eager = true)
    // Char grams are <= maxN bytes — smaller than the md5 digest work
    // the word-gram kernel saves on long shingles — so they group by the
    // STRING itself (measured: the 60-bit hash pass made q400 2.5x
    // slower at sf0.1 for zero shuffle savings).
    // ALL char-gram levels in one scan+shuffle per side (was one pass
    // per side per level — 24 lazy gram-pass evaluations at maxN=6;
    // q400's cost was this scheduling, not the grams). A single fused
    // both-sides pass was MEASURED SLOWER (6.0 s vs 3.5 s at sf0.1) —
    // same finding as corpusBleu. Let-bound: `ch.substr(i, n)` inside
    // the lambda would otherwise re-run the regexp_replace+lower per
    // character position — O(len²) regex work per row (the q240 trap).
    def charGramCountsAll(textCol: String): DataFrame = {
      val tagged = graft.functions.Let.bindOnce(
          regexp_replace(lower(col(textCol)), "\\s+", "")) { ch =>
        flatten(array((1 to maxN).map { n =>
          val grams = when(length(ch) >= n, transform(
            sequence(lit(1), length(ch) - n + 1),
            i => ch.substr(i, lit(n))))
            .otherwise(array().cast("array<string>"))
          transform(grams, g => struct(lit(n).as("n"), g.as("g")))
        }: _*))
      }
      pairs.select(col(pairCol).as("__pid"), explode(tagged).as("__g"))
        .select(col("__pid"), col("__g").getField("n").as("__n"),
          col("__g").getField("g").as("__gh"))
        .groupBy(col("__pid"), col("__n"), col("__gh"))
        .agg(count(lit(1)).as("__c"))
    }
    val cg = charGramCountsAll(candCol)
    val rg = charGramCountsAll(refCol)
    def levelAgg(src: DataFrame, value: Column, prefix: String) =
      src.agg(
        coalesce(sum(when(col("__n") === 1, value)), lit(0L))
          .as(s"${prefix}_1"),
        (2 to maxN).map(n =>
          coalesce(sum(when(col("__n") === n, value)), lit(0L))
            .as(s"${prefix}_$n")): _*)
    val clips = levelAgg(
      cg.join(rg.withColumnRenamed("__c", "__cr"), Seq("__pid", "__n", "__gh")),
      least(col("__c"), col("__cr")), "__clip")
    // Same length identity as corpusBleu: a whitespace-stripped string of
    // C chars carries exactly max(0, C−n+1) char n-grams per level, so
    // the per-level totals are one shuffle-free length aggregate per
    // side instead of a second evaluation of the char-gram
    // explode+shuffle (guide §2.3).
    def lenTotals(src: String, prefix: String) = pairs
      .select(length(regexp_replace(lower(col(src)), "\\s+", ""))
        .cast("long").as("__l"))
      .agg(
        coalesce(sum(greatest(lit(0L), col("__l"))), lit(0L))
          .as(s"${prefix}_1"),
        (2 to maxN).map(n =>
          coalesce(sum(greatest(lit(0L), col("__l") - lit(n - 1L))), lit(0L))
            .as(s"${prefix}_$n")): _*)
    val cTots = lenTotals(candCol, "__ct")
    val rTots = lenTotals(refCol, "__rt")
    val perLevel = clips.crossJoin(cTots).crossJoin(rTots)
      .select((1 to maxN).flatMap(n => Seq(
        when(col(s"__ct_$n") > 0,
          round(d(col(s"__clip_$n")) / d(col(s"__ct_$n")), 9))
          .otherwise(lit(0.0)).as(s"__p_$n"),
        when(col(s"__rt_$n") > 0,
          round(d(col(s"__clip_$n")) / d(col(s"__rt_$n")), 9))
          .otherwise(lit(0.0)).as(s"__r_$n"))): _*)
    val chrP = (1 to maxN).map(n => col(s"__p_$n")).reduce(_ + _) / maxN
    val chrR = (1 to maxN).map(n => col(s"__r_$n")).reduce(_ + _) / maxN
    val b2 = beta * beta
    val out = perLevel
      .withColumn("chr_p", round(chrP, 6))
      .withColumn("chr_r", round(chrR, 6))
      .withColumn("chrf",
        when(col("chr_p") + col("chr_r") > 0, round(
          lit(1.0 + b2) * col("chr_p") * col("chr_r") /
            (lit(b2) * col("chr_p") + col("chr_r")), 6))
          .otherwise(lit(0.0)))
      .select(col("chrf"), col("chr_p"), col("chr_r"))
      .localCheckpoint(eager = true) // ONE scalar row
    Dedup.unpersistCheckpoint(pairs)
    out
  }

  /** Distinct-n decode-diversity per group: distinct word n-grams over
    * total n-gram instances (Li et al. 2016's distinct-1/2). Output:
    * (group, n_grams, n_distinct, distinct_ratio ← round 6).
    *
    * Scale shape: ONE (group, gram-hash) partial-combining aggregate;
    * count + count-distinct come from the same grouped table. */
  def distinctN(df: DataFrame, groupCol: String, textCol: String,
      n: Int): DataFrame = {
    gramCounts(df.select(col(groupCol), col(textCol)), groupCol, textCol, n)
      .groupBy(col("__pid").as("group"))
      .agg(sum(col("__c")).as("n_grams"),
        count(lit(1)).as("n_distinct"))
      .withColumn("distinct_ratio",
        round(col("n_distinct").cast("double") / col("n_grams").cast("double"), 6))
  }

  /** SQuAD-style extractive-QA eval (Rajpurkar et al. 2016): exact-match
    * rate over normalized strings (lower, trim, whitespace collapse —
    * the engine-portable core of the official normalizer; punctuation /
    * article stripping is a caller-side variant) and mean token-level F1
    * (clipped unigram multiset overlap == [[rougeN]] n=1 F1, the SQuAD
    * F1 definition).
    *
    * Determinism: per-pair F1 is the rougeN round-6 double, summed as
    * DECIMAL(18,6); the two headline ratios divide exact sums once and
    * round 6.
    *
    * Scale shape: the rougeN token pass (two (pair, gram) partial-
    * combining counts + one clip equi-join) plus ONE map-side EM
    * comparison — no extra shuffle beyond the rouge chain; output is a
    * single row (n_pairs, n_exact, em_rate, mean_f1). */
  def squadEval(pairs: DataFrame, pairCol: String, candCol: String,
      refCol: String): DataFrame = {
    def norm(c: String) =
      regexp_replace(trim(lower(col(c))), "\\s+", " ")
    val em = pairs.select(col(pairCol).as("pair"),
      when(norm(candCol) === norm(refCol), 1L).otherwise(0L).as("__em"))
    val f1 = rougeN(pairs, pairCol, candCol, refCol, n = 1)
      .select(col("pair"), col("f1"))
    em.join(f1, Seq("pair"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__em")).as("n_exact"),
        sum(col("f1").cast("decimal(18,6)")).as("__sf1"))
      .select(col("n_pairs"), col("n_exact"),
        round(col("n_exact").cast("double") / col("n_pairs").cast("double"), 6)
          .as("em_rate"),
        round(col("__sf1").cast("double") / col("n_pairs").cast("double"), 6)
          .as("mean_f1"))
  }

  /** Truncated Rank-Biased Overlap (Webber et al. 2010) between two
    * top-k rankings per key: RBO@k = (1−p)·Σ_{d=1..k} p^{d−1}·A_d with
    * A_d = |top_d(a) ∩ top_d(b)| / d — the retrieval-eval comparator
    * that weights agreement toward the TOP of the lists (Kendall/
    * Spearman treat rank 1 and rank 1000 alike). Inputs carry
    * (keyCol, itemCol, rankCol) with rank 1-based and deterministic.
    *
    * Float discipline: the p^{d−1} weights are DRIVER literals (both
    * engines read the same decimal text, not their own `pow`), and each
    * depth's contribution folds through 2^40 fixed-point before the
    * per-key sum. Scale shape: lists are top-k-bounded retrieval
    * outputs, so the intersection join and the k-way depth explode are
    * list-sized, never corpus-sized. Output: (keyCol, rbo). */
  def rboTruncated(a: DataFrame, b: DataFrame, keyCol: String,
      itemCol: String, rankCol: String, k: Int = 10,
      p: Double = 0.9): DataFrame = {
    require(k >= 1 && p > 0 && p < 1, "need k >= 1 and p in (0,1)")
    val fix = (1L << 40).toDouble
    def side(df: DataFrame, r: String) =
      df.select(col(keyCol).as("__k"), col(itemCol).as("__i"),
        col(rankCol).as(r)).filter(col(r) <= k)
    val ov = side(a, "__ra").join(side(b, "__rb"), Seq("__k", "__i"))
      .select(col("__k"), greatest(col("__ra"), col("__rb")).as("__m"))
      .withColumn("__d", explode(array((1 to k).map(lit): _*)))
      .filter(col("__m") <= col("__d"))
      .groupBy(col("__k"), col("__d")).agg(count(lit(1)).as("__ov"))
    val weights = array((1 to k).map(d =>
      lit((1.0 - p) * math.pow(p, d - 1))): _*)
    val grid = a.select(col(keyCol).as("__k")).distinct()
      .withColumn("__d", explode(array((1 to k).map(lit): _*)))
    grid.join(ov, Seq("__k", "__d"), "left")
      .na.fill(0L, Seq("__ov"))
      .withColumn("__t", round(element_at(weights, col("__d")) *
        (col("__ov").cast("double") / col("__d").cast("double")) * fix)
        .cast("long"))
      .groupBy(col("__k").as(keyCol))
      .agg(round(sum(col("__t")).cast("double") / fix, 6).as("rbo"))
      .orderBy(col(keyCol))
  }

  /** Unbiased pass@k (Chen et al. 2021, the Codex estimator) over
    * per-task sampled attempts: for a task with n attempts of which c
    * pass, pass@k = 1 − C(n−c, k)/C(n, k), computed as the
    * numerically-safe telescoped product 1 − ∏_{i<k} (n−c−i)/(n−i)
    * (exactly 0-factored when n−c < k, so the probability saturates at
    * 1 without a special case). Tasks with n < k are NOT estimable at
    * that k — they go NULL and drop from that k's mean (documented:
    * n_tasks is per-k).
    *
    * Float discipline: the ≤k-term product folds left in ascending i —
    * one fixed order the oracle replays literally — rounds 9, sums as
    * DECIMAL(18,9), divides once, rounds 6.
    *
    * Scale shape: ONE task-keyed partial-combining count, a |ks|-way
    * map-side explode of the k estimates, one tiny per-k aggregate. No
    * window, no join. Output: (k, n_tasks, pass_at_k), one row per k. */
  def passAtK(df: DataFrame, taskCol: String, passCol: Column,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks == ks.sorted && ks.distinct == ks &&
      ks.forall(k => k >= 1 && k <= 64), "ks: sorted distinct ints in [1, 64]")
    def d(c: Column) = c.cast("double")
    val per = df.select(col(taskCol).as("__t"), passCol.as("__p"))
      .filter(col("__p").isNotNull)
      .groupBy(col("__t"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__p"), 1L).otherwise(0L)).as("__c"))
    val entries = ks.map { k =>
      val prod = (0 until k).map(i =>
        (d(col("__n")) - d(col("__c")) - i) / (d(col("__n")) - i))
        .reduce(_ * _)
      struct(lit(k).as("k"),
        when(col("__n") >= k, lit(1.0) - round(prod, 9)).as("est"))
    }
    val perK = per.select(explode(array(entries: _*)).as("__e"))
      .select(col("__e").getField("k").as("k"),
        col("__e").getField("est").as("__est"))
      .groupBy(col("k"))
      .agg(count(col("__est")).as("__nt"),
        when(count(col("__est")) > 0, round(
          sum(col("__est").cast("decimal(18,9)")).cast("double") /
            count(col("__est")).cast("double"), 6)).as("pass_at_k"))
    // 'one row per k' holds even for an EMPTY input (zero estimable
    // tasks everywhere → the explode+groupBy alone would emit zero
    // rows): anchor the aggregate on a |ks| literal frame
    ksFrame(df, ks).join(perK, Seq("k"), "left")
      .select(col("k"), coalesce(col("__nt"), lit(0L)).as("n_tasks"),
        col("pass_at_k"))
  }

  /** |ks| literal rows (k) — the per-k anchor both estimator outputs
    * left-join onto so an empty input still yields one row per k. */
  private def ksFrame(df: DataFrame, ks: Seq[Int]): DataFrame = {
    import df.sparkSession.implicits._
    ks.toDF("k")
  }

  /** Unbiased best-of-k expected MAXIMUM score — the continuous sibling
    * of [[passAtK]] (the BoN/rerank-eval headline: "what reward does
    * picking the best of k samples buy?"). For a task with n scored
    * attempts, E[max of k] estimates without bias from the order
    * statistics: Σ_i C(i−1, k−1)/C(n, k) · s₍ᵢ₎ over the ASCENDING
    * sort (only i ≥ k weigh in). Tasks with n < k are not estimable →
    * NULL, excluded from that k's mean (the passAtK convention).
    *
    * The combinatorial weights are a PLAN-TIME literal array-of-arrays
    * (exact BigInt ratios narrowed to double once), so the whole
    * per-task estimate is one codegen-friendly zip_with+aggregate fold
    * in ascending-sort order — a fixed float order the oracle replays
    * with the same literals. Per-task attempt counts are bounded by
    * the `maxN` contract (loud raise_error beyond it — the weight
    * table is maxN² literals).
    *
    * Scale shape: ONE task-keyed collect_list (attempts-per-task
    * bounded by contract), map-side sort/fold, a |ks|-explode, one
    * tiny per-k aggregate. Output: (k, n_tasks, mean_best_of_k). */
  def bestOfK(df: DataFrame, taskCol: String, scoreCol: Column,
      ks: Seq[Int], maxN: Int = 16): DataFrame = {
    require(ks.nonEmpty && ks == ks.sorted && ks.distinct == ks &&
      ks.forall(k => k >= 1 && k <= maxN), "ks: sorted distinct in [1, maxN]")
    require(maxN >= 1 && maxN <= 64, s"maxN in [1, 64], got $maxN")
    def choose(n: Int, r: Int): BigInt =
      if (r < 0 || r > n) BigInt(0)
      else (0 until r).foldLeft(BigInt(1))((a, i) => a * (n - i) / (i + 1))
    // weights[n](i) = C(i−1, k−1)/C(n, k), exact rationals → one double
    def wLit(k: Int) = array((1 to maxN).map { n =>
      array((1 to n).map { i =>
        lit(if (n < k) 0.0
        else (BigDecimal(choose(i - 1, k - 1)) /
          BigDecimal(choose(n, k))).toDouble)
      }: _*)
    }: _*)
    val per = df.select(col(taskCol).as("__t"), scoreCol.cast("double").as("__s"))
      .filter(col("__s").isNotNull)
      .groupBy(col("__t"))
      .agg(array_sort(collect_list(col("__s"))).as("__ss"))
      .withColumn("__n", size(col("__ss")))
    val entries = ks.map { k =>
      // the contract check lives INSIDE the live expression (a separate
      // pruned-away column would be dead-code-eliminated with the
      // raise_error in it); CASE branches are lazy, so the element_at
      // below never sees an out-of-contract n
      val est = when(col("__n") > maxN, raise_error(concat(
          lit(s"bestOfK: a task has more than maxN=$maxN attempts ("),
          col("__n").cast("string"),
          lit(") — raise maxN or pre-sample"))).cast("double"))
        .when(col("__n") >= k, round(
          aggregate(
            zip_with(col("__ss"), element_at(wLit(k), col("__n")),
              (s, w) => s * w),
            lit(0.0), (acc, x) => acc + x), 9))
      struct(lit(k).as("k"), est.as("est"))
    }
    val perK = per.select(explode(array(entries: _*)).as("__e"))
      .select(col("__e").getField("k").as("k"),
        col("__e").getField("est").as("__est"))
      .groupBy(col("k"))
      .agg(count(col("__est")).as("__nt"),
        when(count(col("__est")) > 0, round(
          sum(col("__est").cast("decimal(28,9)")).cast("double") /
            count(col("__est")).cast("double"), 6)).as("mean_best_of_k"))
    // one row per k even on empty input — the passAtK anchor convention
    ksFrame(df, ks).join(perK, Seq("k"), "left")
      .select(col("k"), coalesce(col("__nt"), lit(0L)).as("n_tasks"),
        col("mean_best_of_k"))
  }
}
