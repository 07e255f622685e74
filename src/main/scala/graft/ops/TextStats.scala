package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: token counting,
  * quality scoring, language-ID heuristic, content fingerprinting.
  * All pure Column expressions (codegen'd, shuffle-free).
  */
object TextStats {

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(split(text, "\\s+"))

  /** BPE-ish token count: letter runs, digit runs, or single other chars. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Quality metrics: chars, tokens, mean token length, stopword ratio,
    * digit ratio, punctuation ratio. */
  def nChars(text: Column): Column = length(text)

  def meanTokenLen(text: Column): Column = {
    val toks = split(text, "\\s+")
    aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double") / size(toks)
  }

  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = split(lower(text), "\\s+")
    size(filter(toks, t => t.isin(stopwords.map(lit): _*))).cast("double") / size(toks)
  }

  def digitRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[0-9]"), lit(0))).cast("double") /
      greatest(length(text), lit(1))

  def punctRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double") /
      greatest(length(text), lit(1))

  /** Within-document word repetition (Gopher/C4-style quality signal):
    * 1 − distinct_tokens/tokens. Tokens are single-space splits — the
    * same tokenization the dedup shinglers use, so the two signal
    * families can't disagree on word boundaries. Consequence: empty text
    * is one empty token (repetition 0), and whitespace runs produce
    * repeated empty tokens that COUNT as repetition — a whitespace-padded
    * doc is flagged, by design. */
  def wordRepetition(text: Column): Column = {
    val toks = split(lower(text), " ")
    val total = size(toks)
    when(total > 0,
      lit(1.0) - size(array_distinct(toks)).cast("double") / total)
      .otherwise(lit(0.0))
  }

  /** Within-document k-gram repetition: 1 − distinct_shingles/shingles —
    * high values flag boilerplate/looped generations that per-corpus dedup
    * never sees. Distinct count via the fused shingle kernel (bit-identical
    * to the declarative slice/zip_with form). */
  def shingleRepetition(text: Column, k: Int = 3): Column = {
    val total = greatest(size(split(lower(text), " ")) - (k - 1), lit(0))
    when(total > 0,
      lit(1.0) - size(Dedup.shingles(text, k)).cast("double") / total)
      .otherwise(lit(0.0))
  }

  /** Overlapping token windows for sequence packing (training-data
    * chunking): window w covers tokens [w·stride, w·stride + chunk); the
    * last window clamps short so every token is covered. Returns an array
    * of (chunk_idx, chunk_text) structs — explode downstream. Pure per-row
    * expression: chunking 100 TB is a map-only stage, no shuffle. */
  def chunkTokens(text: Column, chunk: Int, stride: Int): Column = {
    require(chunk >= 1 && stride >= 1 && stride <= chunk)
    // Let-bound: `slice(toks, …)` in the per-window lambda would
    // otherwise re-run the split per window (lambda bodies are
    // CSE-exempt) — O(windows·len) per row
    graft.functions.Let.bindOnce(split(text, " ")) { toks =>
      val n = size(toks)
      val nChunks = when(n <= chunk, lit(1))
        .otherwise(ceil((n - chunk).cast("double") / stride).cast("int") + 1)
      transform(sequence(lit(0), nChunks - 1), w =>
        struct(w.as("chunk_idx"),
          array_join(slice(toks, w * stride + 1, lit(chunk)), " ")
            .as("chunk_text")))
    }
  }

  /** CONTENT-DEFINED chunking: chunk boundaries fall after token p
    * whenever the 60-bit hash of the k-gram ENDING at p is ≡ 0 (mod m) —
    * the rolling-boundary idea behind rsync/LBFS/restic chunking, applied
    * to token streams. Unlike fixed windows (`chunkTokens`), boundaries
    * are a pure function of LOCAL content: inserting a paragraph shifts
    * every fixed window after it (re-chunking the whole document and
    * defeating downstream chunk-level dedup), while content-defined
    * boundaries re-align within ~k tokens of the edit. Expected chunk
    * length ≈ m tokens; a doc with no boundary hash is one chunk.
    *
    * Returns one row per chunk (id, chunk_idx, chunk_text, n_toks).
    * Map-only — chunking 100 TB is an embarrassingly parallel scan; the
    * token array is MATERIALIZED before the per-position lambdas (lambda
    * bodies are exempt from subexpression elimination — an inlined split
    * would re-tokenize per position). */
  def contentDefinedChunks(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, m: Int = 8): DataFrame = {
    require(k >= 1 && m >= 1, s"need k >= 1 and m >= 1, got k=$k m=$m")
    val tk = col("__tk")
    val n = size(tk)
    val out = df
      .withColumn("__tk", split(col(textCol), " "))
      // candidate cut positions p ∈ [k, n-1] (1-based; never after the
      // last token — the end is an implicit boundary). sequence() counts
      // DOWN when start > stop, so the degenerate short-doc case must be
      // an explicit empty array, not sequence(k, n-1)
      .withColumn("__cuts",
        when(n - 1 >= k,
          filter(sequence(lit(k), n - 1), p =>
            graft.ops.Dedup.baseHash(
              array_join(slice(tk, p - (k - 1), lit(k)), " ")) % m === 0))
          .otherwise(array().cast("array<int>")))
      .withColumn("__starts",
        concat(array(lit(1)), transform(col("__cuts"), c => c + 1)))
      .withColumn("__ends", concat(col("__cuts"), array(n)))
      .select(col(idCol),
        posexplode(zip_with(col("__starts"), col("__ends"), (s, e) =>
          struct(array_join(slice(tk, s, e - s + 1), " ").as("chunk_text"),
            (e - s + 1).cast("long").as("n_toks"))))
          .as(Seq("chunk_idx", "__c")))
      .select(col(idCol), col("chunk_idx"),
        col("__c.chunk_text"), col("__c.n_toks"))
    out
  }

  /** Gopher-style composite quality gate: a document survives iff every
    * rule passes. Rules (each a published pre-training heuristic):
    *   - token count within [minTokens, maxTokens];
    *   - mean token length within [minMeanLen, maxMeanLen] (gibberish and
    *     char-soup documents fall outside);
    *   - stopword ratio ≥ minStopRatio (natural prose contains function
    *     words; tables/logs/code mostly don't);
    *   - word repetition ≤ maxWordRep (looped generations, boilerplate).
    * Pure per-row expression — the 100 TB quality pass is map-only. The
    * individual signals are the named functions above; this is the
    * decision combinator, so thresholds live in ONE place per pipeline. */
  def qualityKeep(text: Column, stopwords: Seq[String],
      minTokens: Int = 20, maxTokens: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minStopRatio: Double = 0.01, maxWordRep: Double = 0.6): Column = {
    val nt = wsTokenCount(text)
    nt.between(minTokens, maxTokens) &&
      meanTokenLen(text).between(minMeanLen, maxMeanLen) &&
      (stopwordRatio(text, stopwords) >= minStopRatio) &&
      (wordRepetition(text) <= maxWordRep)
  }

  /** Per-doc DROP-REASON audit — the explainability twin of
    * `qualityKeep`: evaluates the same four rules with the same
    * thresholds and returns struct(reason, fail_mask) where `reason` is
    * the FIRST failing rule's name in the fixed audit order
    * (n_tokens → mean_token_len → stopword_ratio → word_repetition;
    * "pass" if none fail) and `fail_mask` is the bitmask of ALL failing
    * rules (bit 0 = n_tokens … bit 3 = word_repetition). A pipeline
    * keeps `qualityKeep` in the hot path (one boolean) and runs this on
    * the rejects — attrition accounting per rule, not just per stage.
    * Pure per-row expression: the 100 TB audit pass is map-only. */
  def filterReasons(text: Column, stopwords: Seq[String],
      minTokens: Int = 20, maxTokens: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minStopRatio: Double = 0.01, maxWordRep: Double = 0.6): Column = {
    val fails: Seq[(String, Column)] = Seq(
      "n_tokens" -> !wsTokenCount(text).between(minTokens, maxTokens),
      "mean_token_len" -> !meanTokenLen(text).between(minMeanLen, maxMeanLen),
      "stopword_ratio" -> (stopwordRatio(text, stopwords) < minStopRatio),
      "word_repetition" -> (wordRepetition(text) > maxWordRep))
    val reason = fails.reverse.foldLeft(lit("pass")) {
      case (acc, (name, bad)) => when(bad, name).otherwise(acc)
    }
    val mask = fails.zipWithIndex
      .map { case ((_, bad), i) => when(bad, lit(1 << i)).otherwise(lit(0)) }
      .reduce(_ + _)
    struct(reason.as("reason"), mask.cast("int").as("fail_mask"))
  }

  /** PII occurrence counts on the RAW text: struct(n_email, n_ip,
    * n_num) for email addresses, dotted-quad IPv4 literals, and long
    * (10-15 digit) number runs — the C4/Dolma-style pre-release scrub
    * signals. Patterns are deliberately RE2-compatible (no lookaround,
    * no backrefs) so the same regex runs in Spark (java.util.regex),
    * DuckDB and any RE2-based scanner. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val LongNumRe = "\\b\\d{10,15}\\b"
  def piiCounts(text: Column): Column = struct(
    size(regexp_extract_all(text, lit(EmailRe), lit(0))).as("n_email"),
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0))).as("n_ip"),
    size(regexp_extract_all(text, lit(LongNumRe), lit(0))).as("n_num"))

  /** TYPED PII redaction (the release-grade sibling of the coarse
    * `redactPii` below): emails → `<EMAIL>`, IPv4 → `<IP>`, then
    * remaining long digit runs → `<NUM>` — in that fixed order (an IP's
    * octets must not be half-eaten by the number rule first; the rules
    * are applied to the output of the previous one, exactly like a
    * streaming scrubber). Map-only, three codegen'd regex passes. */
  def redactPiiTyped(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      LongNumRe, "<NUM>")

  /** One-row CORPUS CARD: the release-note summary a dataset ships with
    * — (n_docs, n_tokens, n_langs, n_sources, n_unique, dup_rate,
    * n_quality, quality_rate). Every number is exact and derived from
    * the same expressions the per-doc queries gate (wsTokenCount,
    * qualityKeep, the q24 normalized-md5 identity).
    *
    * Scale shape: ONE aggregation pass; the three exact countDistincts
    * take Spark's Expand (×4 on the projected narrow columns only — the
    * scan prunes to text/lang/source first). At 100 TB swap them for the
    * Profile melt or `approx_count_distinct` (the q121 contract); the
    * card's ratios don't need the 16th significant digit. */
  def corpusCard(df: DataFrame, textCol: String, langCol: String,
      sourceCol: String, stopwords: Seq[String] = Seq("the", "a")): DataFrame = {
    val t = col(textCol)
    df.select(t.as("__t"), col(langCol).as("__l"), col(sourceCol).as("__s"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(wsTokenCount(col("__t")).cast("long")).as("n_tokens"),
        countDistinct(col("__l")).as("n_langs"),
        countDistinct(col("__s")).as("n_sources"),
        countDistinct(md5(regexp_replace(trim(lower(col("__t"))), "\\s+", " ")))
          .as("n_unique"),
        sum(when(qualityKeep(col("__t"), stopwords), 1L).otherwise(0L))
          .as("n_quality"))
      .withColumn("dup_rate",
        (col("n_docs") - col("n_unique")).cast("double")
          / col("n_docs").cast("double"))
      .withColumn("quality_rate",
        col("n_quality").cast("double") / col("n_docs").cast("double"))
  }

  /** Stopword-overlap language-ID heuristic: argmax of per-language marker
    * hits; ties → lexicographically smallest language; zero hits → "und". */
  def langGuess(text: Column, markers: Map[String, Seq[String]]): Column = {
    val toks = split(lower(text), "\\s+")
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      (size(filter(toks, t => t.isin(words.map(lit): _*))), lang)
    }
    val bestScore = scored.map(_._1).reduce((a, b) => greatest(a, b))
    val pick = scored.reverse.foldLeft(lit("und")) { case (acc, (score, lang)) =>
      when(score === bestScore && score > 0, lang).otherwise(acc)
    }
    pick
  }

  /** `langGuess` + the CONFIDENCE MARGIN a CCNet-class pipeline
    * thresholds on: struct(lang_guess, hits, margin) where `hits` is the
    * winning language's marker count and `margin` = hits − the runner-up
    * language's count. All-integer marker arithmetic — engine-exact, no
    * rounding discipline needed. Ties (margin 0) and zero-hit docs
    * ("und") fall below any positive threshold, the conservative
    * keep-only-confident default. Map-only. */
  def langGuessMargin(text: Column, markers: Map[String, Seq[String]]): Column = {
    require(markers.size >= 2, "margin needs at least two candidate languages")
    val toks = split(lower(text), "\\s+")
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      (size(filter(toks, t => t.isin(words.map(lit): _*))), lang)
    }
    val best = scored.map(_._1).reduce((a, b) => greatest(a, b))
    val pick = scored.reverse.foldLeft(lit("und")) { case (acc, (score, lang)) =>
      when(score === best && score > 0, lang).otherwise(acc)
    }
    val second = scored.map { case (score, lang) =>
      when(lit(lang) === pick, lit(-1)).otherwise(score)
    }.reduce((a, b) => greatest(a, b))
    // zero-hit docs: pick = und, best = 0, margin pinned to 0
    struct(pick.as("lang_guess"), best.as("hits"),
      when(best > 0, best - greatest(second, lit(0))).otherwise(lit(0)).as("margin"))
  }

  /** Deterministic uniform [0,1) draw from a key column: md5-derived, so
    * the same row keeps the same draw across engines, runs, and cluster
    * layouts — unlike `df.sample`/TABLESAMPLE whose RNG is engine-private.
    * This is how a training-data pipeline takes reproducible stratified
    * splits at 100TB (per-stratum fraction filter, no shuffle). */
  def hashUniform(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("double") /
      lit((1L << 60).toDouble)

  /** Per-stratum reproducible sample: keep a row iff its uniform draw is
    * below its stratum's fraction (missing stratum → 0.0 → dropped). */
  def stratifiedKeep(key: Column, stratum: Column, fractions: Map[String, Double]): Column =
    hashUniform(key) < coalesce(try_element_at(typedLit(fractions), stratum), lit(0.0))

  /** Deterministic train/val/test split assignment from the same
    * md5-uniform draw: `splits` are (label, fraction) in order, fractions
    * summing to 1 (the last label absorbs any rounding residue). Because
    * the draw is a pure function of the key, the split is stable across
    * runs, engines, cluster layouts AND corpus growth — adding documents
    * never moves an existing document between splits, which is what keeps
    * a held-out set actually held out over the life of a corpus. */
  def assignSplit(key: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1: $splits")
    val u = hashUniform(key)
    // cumulative bounds via BigDecimal: 0.8 + 0.1 in binary doubles is
    // 0.9000000000000001, which would disagree with the decimal literal
    // 0.9 any caller (or the oracle SQL) writes for the same boundary
    val cum = splits.scanLeft(BigDecimal(0))((acc, s) => acc + BigDecimal(s._2))
      .tail.map(_.toDouble)
    splits.init.zip(cum.init).reverse.foldLeft(lit(splits.last._1)) {
      case (acc, ((label, _), c)) => when(u < c, label).otherwise(acc)
    }
  }

  /** Per-document top term by TF-IDF over a corpus. Shape: one explode +
    * two aggregations (term frequency per doc, document frequency per
    * term) + an unhinted join of the (term → df) model back — the fact
    * side shuffles once on (doc, term). Deterministic: smoothed idf
    * ln((N+1)/(df+1)), ties by term asc. */
  def topTfidfTerm(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, count => fcount}
    val toks = df.select(col(idCol).as("__id"),
      explode(split(lower(col(textCol)), "\\s+")).as("term"))
    val tf = toks.groupBy(col("__id"), col("term")).agg(fcount(lit(1)).as("tf"))
    // document frequency from tf's one-row-per-(doc, term) output — no
    // second explode over the corpus; the tf exchange is reused
    val dfreq = tf.groupBy(col("term")).agg(fcount(lit(1)).as("df"))
    // corpus size folded into the plan as a broadcast 1-row aggregate — a
    // driver-side df.count() here would run an EXTRA job at plan time
    // (a full scan whenever the input isn't bare parquet metadata)
    val corpusN = df.select(fcount(lit(1)).cast("double").as("__n"))
    // NO broadcast hint on dfreq: the term→df table is vocab-sized, and a
    // web-scale vocab (URLs, typos) exceeds any broadcast threshold — AQE
    // broadcasts it when it measures small, and the shuffled hash join on
    // the uniform term key is the correct fallback when it doesn't
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(corpusN))
      .withColumn("tfidf", col("tf") * log((col("__n") + 1.0) / (col("df") + lit(1.0))))
      .drop("__n")
    // arg-max via MIN(struct(-score, term)): highest score, ties → term asc
    scored.groupBy(col("__id").as(idCol))
      .agg(min(struct((lit(0.0) - col("tfidf")).as("neg"), col("term"))).as("__b"))
      .select(col(idCol), col("__b.term").as("top_term"),
        (lit(0.0) - col("__b.neg")).as("tfidf"))
  }

  /** Vocabulary coverage: learn the top-`vocabSize` tokens by corpus
    * frequency (ties broken token-ascending, so the vocabulary is
    * deterministic) and score every document's out-of-vocabulary token
    * fraction — the cheap proxy for "will the tokenizer shred this doc
    * into bytes". Returns (id, n_tokens, n_oov, oov_rate); token-less
    * docs are absent.
    *
    * Scale shape: ONE partial-combining count shuffle on the token key;
    * the vocabulary is a TakeOrdered top-K (per-partition heaps, O(K)
    * driver state — no global sort) and is broadcast back by CONTRACT
    * (K rows, caller-bounded — unlike the unbounded lmScore/tfidf model
    * tables, which must not carry the hint); the per-doc aggregation
    * partial-combines map-side. */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    val toks = df.select(col(idCol).as("__id"),
        explode(split(lower(col(textCol)), " ")).as("token"))
      .filter(col("token") =!= "")
    val voc = toks.groupBy(col("token")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("token")).limit(vocabSize)
      .select(col("token"), lit(1).as("__in"))
    toks.join(broadcast(voc), Seq("token"), "left")
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("__in").isNull, lit(1))).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }

  /** Per-document character-level Shannon entropy (bits/char) — the
    * classic gibberish/boilerplate screen: natural prose sits ~4 bits,
    * single-char spam near 0, uniform random base64 near 6. Returns
    * (id, n_chars, distinct_chars, entropy); empty/null docs are absent.
    * Character = Spark/DuckDB string position (code point; the corpus is
    * ASCII).
    *
    * Determinism: log2 differs by 1 ulp across engines, so each
    * character's contribution is rounded to 9 decimals BEFORE the fold
    * and the fold runs in character-sorted order (the q127/q137
    * discipline).
    *
    * Scale shape: one explode + ONE partial-combining (id, char) count
    * shuffle, one (id) collect shuffle; the per-doc char alphabet is
    * charset-bounded, so the collected array is O(alphabet) however
    * large the document — no join, and the fact table never shuffles a
    * third time. */
  /** Unicode-normalization audit per group: how much of the corpus is
    * NOT in NFC canonical-composed form — the pre-dedup hygiene gate
    * (decomposed é vs composed é hash as DIFFERENT docs until the
    * corpus normalizes to one form; see [[graft.functions.Nfc]]). Per
    * group: doc count, docs whose text changes under NFC, and the
    * total code-point shrink (canonical composition only ever merges
    * combining sequences, so the delta is the combining-mark count a
    * normalizing rewrite would fold).
    *
    * Scale shape: map-only probe (the codegen'd NFC kernel runs once
    * per row — Let-bound so the changed-flag and the length delta read
    * ONE normalization, not two) + one group aggregate. NULL text rows
    * count as unchanged. Output per group:
    * (group, n_docs, n_denormalized, chars_composed). */
  def nfcAudit(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val probe = graft.functions.Let.bindOnce(
        graft.functions.Nfc.nfc(col(textCol))) { t =>
      struct(when(t =!= col(textCol), 1L).otherwise(0L).as("chg"),
        coalesce(length(col(textCol)) - length(t), lit(0))
          .cast("long").as("delta"))
    }
    df.select(col(groupCol).as("group"), probe.as("__p"))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__p").getField("chg")).as("n_denormalized"),
        sum(col("__p").getField("delta")).as("chars_composed"))
  }

  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // MAP-ONLY: the per-doc char histogram never needs a shuffle — the
    // distinct chars come from one sorted char array and each char's
    // count is length(text) − length(replace(text, c)) (one native
    // string scan per distinct char, O(distinct·len) per row — beats
    // exploding len rows per doc through a (doc, char) aggregate plus a
    // collect_list re-aggregate, the old 2-exchange shape). Ascending
    // char order == the old array_sort(struct(c, n)) order (chars are
    // distinct), and counts are the same integers, so every double op
    // runs in the identical sequence — hash-identical output.
    df.filter(length(col(textCol)) > 0)
      .select(col(idCol),
        graft.functions.Let.bindOnce(col(textCol)) { t =>
          graft.functions.Let.bindOnce(length(t).cast("long")) { len =>
            graft.functions.Let.bindOnce(array_sort(array_distinct(
                transform(sequence(lit(1), length(t)),
                  i => t.substr(i, lit(1)))))) { dis =>
              struct(
                len.as("n_chars"),
                size(dis).cast("long").as("distinct_chars"),
                aggregate(dis, lit(0.0), (acc, c) => {
                  val n = len - length(replace(t, c))
                  val p = n.cast("double") / len.cast("double")
                  acc + round((lit(0.0) - p) * log2(p), 9)
                }).as("entropy"))
            }
          }
        }.as("__e"))
      .select(col(idCol), col("__e.n_chars").as("n_chars"),
        col("__e.distinct_chars").as("distinct_chars"),
        col("__e.entropy").as("entropy"))
  }

  /** Shingle novelty: per document, the fraction of its distinct k-gram
    * shingles that appear NOWHERE else in the corpus (document frequency
    * 1) — the informativeness/uniqueness twin of the dedup signals: a doc
    * that is all boilerplate scores ~0, fresh prose scores ~1. Returns
    * (id, n_shingles, n_unique, novelty); shingle-less docs are absent.
    *
    * Scale shape: one explode, one partial-combining df aggregation on
    * the md5-uniform shingle-hash key, one join back on the same key, one
    * per-doc partial agg. The df table is corpus-vocabulary-sized so it
    * carries NO broadcast hint (same contract as the lmScore model). */
  def noveltyScore(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, shingleK: Int = 3): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{count => fcount}
    val tok = df.select(col(idCol).as("__id"),
        explode(Dedup.shingles(col(textCol), shingleK)).as("__s"))
      .withColumn("__hs", Dedup.baseHash(col("__s"))).drop("__s")
    val dfreq = tok.groupBy(col("__hs")).agg(fcount(lit(1)).as("__df"))
    tok.join(dfreq, Seq("__hs"))
      .groupBy(col("__id").as(idCol))
      .agg(fcount(lit(1)).as("n_shingles"),
        sum(when(col("__df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty",
        col("n_unique").cast("double") / col("n_shingles").cast("double"))
  }

  /** Token co-occurrence LIFT (association mining): for token pairs
    * appearing together in ≥ `minSupport` documents,
    * lift = n_ab·N / (n_a·n_b) — >1 means the pair co-occurs more than
    * independence predicts. Top `topN` by (lift desc, a, b). All-rational
    * arithmetic: one integer product each side of a single division.
    *
    * Scale shape: the per-doc pair explode is ONE nested-transform
    * expression over the doc's sorted distinct tokens (map-only; bounded
    * by tokens²/doc, the association-mining contract — callers cap or
    * pre-filter pathological docs); pair counts and dfs are
    * partial-combining aggregations; the df join keys are tokens
    * (vocab-sized, un-hinted). N folds in as a broadcast 1-row agg. */
  def cooccurrenceLift(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minSupport: Long = 5L,
      topN: Int = 25): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, count => fcount}
    val tk = df.select(col(idCol).as("__id"),
      array_sort(array_distinct(split(lower(col(textCol)), " "))).as("__ts"))
    val tok = tk.select(col("__id"), explode(col("__ts")).as("__t"))
    val dft = tok.groupBy(col("__t")).agg(fcount(lit(1)).as("__df"))
    val n = size(col("__ts"))
    val pairs = flatten(transform(sequence(lit(0), n - 2), i =>
      transform(sequence(i + 1, n - 1), j =>
        struct(element_at(col("__ts"), i + 1).as("a"),
          element_at(col("__ts"), j + 1).as("b")))))
    val pc = tk.filter(size(col("__ts")) >= 2)
      .select(explode(pairs).as("__p"))
      .select(col("__p.a").as("a"), col("__p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(fcount(lit(1)).as("n_ab"))
    val corpusN = df.select(fcount(lit(1)).as("__n"))
    pc.join(dft.select(col("__t").as("a"), col("__df").as("__dfa")), Seq("a"))
      .join(dft.select(col("__t").as("b"), col("__df").as("__dfb")), Seq("b"))
      .crossJoin(broadcast(corpusN))
      .filter(col("n_ab") >= minSupport)
      .select(col("a"), col("b"), col("n_ab"),
        ((col("n_ab") * col("__n")).cast("double") /
          (col("__dfa") * col("__dfb")).cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("a"), col("b")).limit(topN)
  }

  /** BM25-family ranked keyword retrieval: score every document against a
    * fixed term list and return the top `topN` (score desc, id asc).
    *
    *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·len/avglen))
    *
    * with the RATIONAL Robertson–Sparck-Jones odds idf
    * (N − df + 0.5)/(df + 0.5), deliberately log-free: like `lmScore`,
    * every quantity is rational arithmetic on corpus counts, so the score
    * is bit-identical in any engine — a ln() would tie it to the host's
    * libm (JVM vs glibc disagree by 1 ulp on real inputs). The log is
    * monotone, so PER-TERM ranking is unchanged; a single-engine caller
    * who wants the textbook sum applies ln at the idf literal.
    *
    * Determinism of the sum: per-term contributions are pivoted into
    * FIXED-ORDER columns (one `sum(when(term=t))` each — a single row per
    * (doc, term) after the tf aggregation, so no order-dependent double
    * fold) and added left-to-right in the `terms` order.
    *
    * Scale shape: the explode filters to the query terms IMMEDIATELY
    * (tiny literal IN-list — rows drop from corpus-tokens to
    * matching-term occurrences before any shuffle); doc lengths are one
    * partial-combining aggregation; N/avglen are driver scalars (one
    * 1-row job) and the per-term dfs collect O(|terms|) rows — there is
    * no vocab-sized model table anywhere. */
  def bm25(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, terms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75, topN: Int = 20): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{count => fcount}
    require(terms.nonEmpty, "bm25 needs at least one query term")
    require(terms == terms.distinct, "bm25 query terms must be distinct")
    val toks = df.select(col(idCol).as("__id"),
      split(lower(col(textCol)), " ").as("__tk"))
    val lens = toks.select(col("__id"), size(col("__tk")).cast("long").as("__len"))
    val g = lens.agg(fcount(lit(1)).as("n"), sum(col("__len")).as("tl")).first()
    val n = g.getLong(0)
    val avgLen = g.getLong(1).toDouble / n.toDouble
    val tf = toks.select(col("__id"), explode(col("__tk")).as("__t"))
      .filter(col("__t").isin(terms: _*))
      .groupBy(col("__id"), col("__t")).agg(fcount(lit(1)).as("__tf"))
    val dfMap = tf.groupBy(col("__t")).agg(fcount(lit(1)).as("__df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val idfCol = {
      def idf(t: String): Double = {
        val d = dfMap.getOrElse(t, 0L)
        (n - d + 0.5) / (d + 0.5)
      }
      terms.tail.foldLeft(when(col("__t") === terms.head, lit(idf(terms.head)))) {
        (acc, t) => acc.when(col("__t") === t, lit(idf(t)))
      }
    }
    val tfD = col("__tf").cast("double")
    val contrib = idfCol * (tfD * lit(k1 + 1.0)) /
      (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * col("__len").cast("double") / lit(avgLen)))
    val scored = tf.join(lens, "__id").withColumn("__c", contrib)
    val aggs = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("__t") === t, col("__c"))).as(s"__c$i")
    }
    val perDoc = scored.groupBy(col("__id")).agg(aggs.head, aggs.tail: _*)
    val score = terms.indices.map(i => coalesce(col(s"__c$i"), lit(0.0)))
      .reduce(_ + _)
    perDoc.select(col("__id").as(idCol), score.as("score"))
      .orderBy(col("score").desc, col(idCol)).limit(topN)
  }

  /** Corpus-level bigram language-model quality score (the CCNet-style
    * signal): train add-α-smoothed bigram transition probabilities on the
    * corpus itself, then score each document by its mean P(wᵢ | wᵢ₋₁).
    * Low scores flag documents whose word transitions look nothing like
    * the corpus — gibberish, shuffled text, wrong-language fragments.
    *
    * Returns (id, n_bigrams, mean_p); documents with fewer than two
    * tokens have no bigram and are absent from the output.
    *
    * The score is the PROBABILITY-space mean, not log-perplexity, by
    * deliberate contract: every quantity here is rational arithmetic on
    * corpus counts (exact, identical in any engine), where a ln() makes
    * the result hostage to the host's libm — JVM Math.log and glibc log
    * disagree by 1 ulp on real inputs (observed on this corpus), which is
    * enough to fail a bit-exact cross-engine gate. A single-engine
    * production caller who wants log-perplexity applies ln at the
    * presentation edge. Per-bigram probabilities fold through 2^40
    * fixed-point (exact multiply, half-away rounding in every engine,
    * order-independent integer sum — same construction as
    * `Similarity.centroidSim`).
    *
    * Scale shape: one explode + two count aggregations build the model
    * (vocab- and vocab²-bounded tables); they join back by pair/unigram
    * key and the per-doc mean is a plain partial-combining sum — no
    * per-doc ordering state. The model joins carry NO broadcast hint: on
    * a 100 TB web corpus distinct bigrams run to billions of rows, so a
    * mandatory broadcast is a driver OOM — AQE broadcasts a genuinely
    * small model on its own, and the shuffled hash join on the uniform
    * pair key is the correct fallback.
    *
    * `topK` prunes the bigram model to the K most frequent successors per
    * w1 (ties: pair asc); a pruned-away bigram scores as UNSEEN —
    * P = α / (c1 + α·V) — i.e. its mass folds into the smoothing floor.
    * The prune is a window over the AGGREGATED bigram table (model-sized,
    * never the corpus), which is what bounds the model at scale. The
    * default keeps every bigram. */
  def lmScore(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, alpha: Double = 0.5,
      topK: Int = Int.MaxValue): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{count => fcount}
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val fix = (1L << 40).toDouble
    val toks = split(lower(col(textCol)), " ")
    val n = size(toks)
    // all bigram INSTANCES (not the distinct shingle set)
    val bigrams = zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
      (x, y) => struct(x.as("w1"), concat_ws(" ", x, y).as("pair")))
    val bg = df.select(col(idCol).as("__id"), explode(bigrams).as("b"))
      .select(col("__id"), col("b.w1").as("w1"), col("b.pair").as("pair"))
    val tokRows = df.select(explode(toks).as("w"))
    val uc = tokRows.groupBy(col("w")).agg(fcount(lit(1)).as("c1"))
    val bcAll = bg.groupBy(col("w1").as("__bw1"), col("pair"))
      .agg(fcount(lit(1)).as("c12"))
    val bc =
      if (topK == Int.MaxValue) bcAll.select(col("pair"), col("c12"))
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__bw1")).orderBy(col("c12").desc, col("pair").asc)
        bcAll.withColumn("__rk", row_number().over(w))
          .filter(col("__rk") <= topK).select(col("pair"), col("c12"))
      }
    val vocab = tokRows.agg(countDistinct(col("w")).as("__v"))
    val scored = bg
      .join(bc, Seq("pair"), "left") // pruned-away bigram → c12 null → unseen
      .join(uc, col("w1") === col("w"))
      .crossJoin(broadcast(vocab)) // 1-row aggregate: the one legitimate hint
      .withColumn("__pfix",
        round(((coalesce(col("c12"), lit(0L)) + alpha) /
            (col("c1") + lit(alpha) * col("__v"))) * fix)
          .cast("decimal(20,0)"))
    scored.groupBy(col("__id").as(idCol))
      .agg(fcount(lit(1)).as("n_bigrams"),
        (sum(col("__pfix")).cast("double") / fix / fcount(lit(1))).as("mean_p"))
  }

  /** STUPID-BACKOFF bigram scoring (Brants et al. 2007, "Large Language
    * Models in Machine Translation", public literature): the at-scale
    * smoothing choice — no discount mass bookkeeping, just
    *   S(w2|w1) = c12/c1           if the bigram is in the (pruned) model
    *            = backoff · c2/N   otherwise
    * Paired with a topK-per-history pruned model (the q90 pruning knob),
    * this is how a trillion-token LM actually scores: the model keeps
    * only frequent continuations and everything else backs off to the
    * unigram. Output: (id, n_bigrams, mean_s) with the q84 fixed-point
    * mean discipline (round(S·2^40) integer sums — order-independent).
    *
    * Scale shape: identical to `lmScore` — one bigram explode, vocab- and
    * bigram-model tables UN-hinted (corpus-vocab-sized, the r4 fix), the
    * 1-row token-total broadcast is the one legitimate hint. */
  def lmScoreBackoff(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, backoff: Double = 0.4,
      topK: Int = 2): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{count => fcount}
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val fix = (1L << 40).toDouble
    val toks = split(lower(col(textCol)), " ")
    val n = size(toks)
    val bigrams = zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
      (x, y) => struct(x.as("w1"), y.as("w2"), concat_ws(" ", x, y).as("pair")))
    val bg = df.select(col(idCol).as("__id"), explode(bigrams).as("b"))
      .select(col("__id"), col("b.w1").as("w1"), col("b.w2").as("w2"),
        col("b.pair").as("pair"))
    val tokRows = df.select(explode(toks).as("w"))
    val uc = tokRows.groupBy(col("w")).agg(fcount(lit(1)).as("c1"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bw1")).orderBy(col("c12").desc, col("pair").asc)
    val bc = bg.groupBy(col("w1").as("__bw1"), col("pair"))
      .agg(fcount(lit(1)).as("c12"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= topK).select(col("pair"), col("c12"))
    val tot = tokRows.agg(fcount(lit(1)).as("__n"))
    val scored = bg
      .join(bc, Seq("pair"), "left") // pruned away → null c12 → back off
      .join(uc.select(col("w").as("w1"), col("c1")), Seq("w1"))
      .join(uc.select(col("w").as("w2"), col("c1").as("c2")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .withColumn("__sfix",
        round(when(col("c12").isNotNull,
            col("c12").cast("double") / col("c1").cast("double"))
          .otherwise(lit(backoff) * col("c2").cast("double")
            / col("__n").cast("double")) * lit(fix))
          .cast("decimal(20,0)"))
    scored.groupBy(col("__id").as(idCol))
      .agg(fcount(lit(1)).as("n_bigrams"),
        (sum(col("__sfix")).cast("double") / fix / fcount(lit(1))).as("mean_s"))
  }

  /** MIXED-LANGUAGE / code-switching detector: language-ID the two
    * HALVES of a document independently with the same marker-argmax
    * `langGuess`; a doc whose halves disagree (both confidently non-und)
    * is likely code-switched or concatenated cross-lingual content —
    * the docs a document-level language label silently mistrains on.
    * Returns struct(lang_head, lang_tail, mixed). Pure expression,
    * map-only. */
  def langConsistency(text: Column,
      markers: Map[String, Seq[String]]): Column = {
    val toks = split(lower(text), "\\s+")
    val half = floor(size(toks) / 2).cast("int")
    val head = array_join(slice(toks, lit(1), half), " ")
    val tail = array_join(slice(toks, half + 1, size(toks)), " ")
    val lh = langGuess(head, markers)
    val lt = langGuess(tail, markers)
    struct(lh.as("lang_head"), lt.as("lang_tail"),
      (lh =!= lt && lh =!= "und" && lt =!= "und").as("mixed"))
  }

  /** VOCABULARY GROWTH curve (Heaps-law audit): per stratum, processing
    * docs in id order, how many never-before-seen tokens each doc
    * contributes and the running vocabulary size — the curve that sizes
    * a tokenizer's vocab budget and shows when a corpus stops teaching
    * new words. Returns (stratum, id, n_new, vocab_so_far).
    *
    * Scale shape: one (stratum, token) aggregation taking min-id (the
    * first-occurrence table, partial-combining), one doc-keyed count,
    * and the per-stratum cumsum through `Ranks.runningSumsBy` — strata
    * are handful-sized label domains over a corpus-scaled frame, so a
    * stratum-keyed window would put each stratum's whole doc spine on
    * one task. */
  def vocabGrowth(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, stratumCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{count => fcount}
    val t = df.select(col(stratumCol), col(idCol),
      explode(array_distinct(split(lower(col(textCol)), " "))).as("__w"))
    val firstSeen = t.groupBy(col(stratumCol), col("__w"))
      .agg(min(col(idCol)).as("__d0"))
    val perDoc = firstSeen.groupBy(col(stratumCol), col("__d0").as(idCol))
      .agg(fcount(lit(1)).as("__n_new"))
    val base = df.select(col(stratumCol), col(idCol))
      .join(perDoc, Seq(stratumCol.replace("`", ""), idCol.replace("`", "")), "left")
      .withColumn("n_new", coalesce(col("__n_new"), lit(0L)))
      .drop("__n_new")
    graft.ops.Ranks.runningSumsBy(base, Seq(stratumCol.replace("`", "")),
      Seq("n_new" -> "vocab_so_far"), col(idCol))
  }

  /** NUCLEUS (top-p) vocabulary cutoff: rank tokens by corpus frequency
    * (desc, ties token asc) and keep the smallest head covering ≥
    * `covNum/covDen` of total token mass — how a production tokenizer
    * vocab or a sampling nucleus is actually sized. keep(token) ⇔
    * cumulative count BEFORE it < covNum/covDen · total, so the first
    * token to cross the threshold is still kept and coverage of the
    * kept set is ≥ the target. ALL-integer arithmetic (cumb·covDen vs
    * total·covNum) — no float share ever compared. Returns
    * (rank, token, cnt, keep).
    *
    * Scale shape: one token-count aggregation, then ONE
    * `Ranks.runningSumsRanked` pass over the vocab table — the vocab
    * GROWS with the corpus (Heaps' law), so rank + cumulative + total
    * come from the distributed prefix-sum hatch (range exchange +
    * partition walk + its own partials collect), never a whole-vocab
    * single-partition window. */
  def nucleusVocab(df: org.apache.spark.sql.DataFrame, textCol: String,
      covNum: Int = 95, covDen: Int = 100): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{count => fcount}
    require(covNum > 0 && covDen > 0 && covNum <= covDen,
      s"coverage must be a rational in (0, 1]: $covNum/$covDen")
    val counts = df.select(explode(split(lower(col(textCol)), " ")).as("__w"))
      .groupBy(col("__w")).agg(fcount(lit(1)).as("cnt"))
    val run = Ranks.runningSumsRanked(counts, Seq("cnt" -> "__cum"), None,
      "rank", col("cnt").desc, col("__w").asc)
    run.df
      // exclusive cumulative = inclusive − own count; total rides out
      // of the partials collect as a literal
      .withColumn("keep",
        (col("__cum") - col("cnt")) * covDen < lit(run.totals("cnt")) * covNum)
      .select(col("rank"), col("__w").as("token"), col("cnt"), col("keep"))
  }

  /** TRIGRAM stupid backoff (the actual Brants et al. 2007 shape — the
    * production trillion-token LM is trigram-or-longer with the chain
    *   S(w3|w1w2) = c123/c12                if the trigram is in the model
    *              = α · S(w3|w2)            else, where
    *   S(w3|w2)   = c23/c2                  if the bigram is in the model
    *              = α · c3/N                else
    * and both model tables prune to topK continuations per history while
    * every DENOMINATOR (c12, c2, N) stays a full-corpus count — backoff
    * redistributes nothing, which is exactly why it scales). Output:
    * (id, n_trigrams, mean_s), q84 fixed-point discipline; docs with
    * < 3 tokens emit nothing.
    *
    * Scale shape: one trigram explode; trigram/bigram model tables and
    * the full bigram-history table are UN-hinted joins (r4 discipline);
    * the 1-row token total is the one legitimate broadcast. */
  def lmScoreBackoffTrigram(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, backoff: Double = 0.4,
      topK: Int = 2): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{count => fcount}
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val fix = (1L << 40).toDouble
    val toks = split(lower(col(textCol)), " ")
    val n = size(toks)
    val t12 = zip_with(slice(toks, lit(1), n - 2), slice(toks, lit(2), n - 2),
      (x, y) => struct(x.as("w1"), y.as("w2")))
    val tri = zip_with(t12, slice(toks, lit(3), n - 2), (p, z) => struct(
      concat_ws(" ", p.getField("w1"), p.getField("w2")).as("bi12"),
      concat_ws(" ", p.getField("w2"), z).as("bi23"),
      concat_ws(" ", p.getField("w1"), p.getField("w2"), z).as("tri"),
      p.getField("w2").as("w2"), z.as("w3")))
    val tg = df.select(col(idCol).as("__id"), explode(tri).as("t"))
      .select(col("__id"), col("t.bi12").as("bi12"), col("t.bi23").as("bi23"),
        col("t.tri").as("tri"), col("t.w2").as("w2"), col("t.w3").as("w3"))
    val tokRows = df.select(explode(toks).as("w"))
    val uc = tokRows.groupBy(col("w")).agg(fcount(lit(1)).as("c1"))
    val tot = tokRows.agg(fcount(lit(1)).as("__n"))
    // bigram INSTANCE counts over the whole corpus (not just trigram
    // contexts): the same table serves as trigram denominator (c12) and
    // backoff-bigram numerator (c23)
    val bigrams = zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
      (x, y) => struct(x.as("w1"), concat_ws(" ", x, y).as("pair")))
    val bgAll = df.select(explode(bigrams).as("b"))
      .select(col("b.w1").as("__bw1"), col("b.pair").as("pair"))
    val bcFull = bgAll.groupBy(col("__bw1"), col("pair"))
      .agg(fcount(lit(1)).as("cb"))
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bw1")).orderBy(col("cb").desc, col("pair").asc)
    val bcPruned = bcFull.withColumn("__rk", row_number().over(wB))
      .filter(col("__rk") <= topK).select(col("pair").as("bi23"), col("cb").as("c23"))
    val tcFull = tg.groupBy(col("bi12").as("__t12"), col("tri"))
      .agg(fcount(lit(1)).as("c123"))
    val wT = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__t12")).orderBy(col("c123").desc, col("tri").asc)
    val tcPruned = tcFull.withColumn("__rk", row_number().over(wT))
      .filter(col("__rk") <= topK).select(col("tri"), col("c123"))
    val scored = tg
      .join(tcPruned, Seq("tri"), "left")
      .join(bcFull.select(col("pair").as("bi12"), col("cb").as("c12")), Seq("bi12"))
      .join(bcPruned, Seq("bi23"), "left")
      .join(uc.select(col("w").as("w2"), col("c1").as("c2")), Seq("w2"))
      .join(uc.select(col("w").as("w3"), col("c1").as("c3")), Seq("w3"))
      .crossJoin(broadcast(tot)) // 1-row aggregate: the one legitimate hint
      .withColumn("__sfix", round(
        when(col("c123").isNotNull,
          col("c123").cast("double") / col("c12").cast("double"))
          .otherwise(lit(backoff) *
            when(col("c23").isNotNull,
              col("c23").cast("double") / col("c2").cast("double"))
              .otherwise(lit(backoff) *
                col("c3").cast("double") / col("__n").cast("double")))
          * fix).cast("decimal(20,0)"))
    scored.groupBy(col("__id").as(idCol))
      .agg(fcount(lit(1)).as("n_trigrams"),
        (sum(col("__sfix")).cast("double") / fix / fcount(lit(1))).as("mean_s"))
  }

  /** INTERPOLATED KNESER-NEY bigram scoring (Kneser & Ney 1995; the
    * smoothing every serious n-gram LM toolkit defaults to — public
    * literature), with absolute discount D fixed at 3/4 so every
    * intermediate is rational:
    *   P(w2|w1) = max(c12 − D, 0)/c1 + (D · N1+(w1·)/c1) · N1+(·w2)/B
    * where c1 = Σ_w2 c12 is w1's HISTORY count (so the full-model
    * distribution sums to exactly 1 over the seen vocabulary — the
    * normalization spec pins it), N1+(w1·) = distinct continuations of
    * w1, N1+(·w2) = distinct left contexts of w2 (the CONTINUATION
    * count — KN's insight: how many contexts a word follows, not how
    * often), and B = distinct bigram types. With `topK` pruning the c12
    * LOOKUP backs off to pure continuation mass (first term 0), while
    * the KN statistics (c1, N1+, B) always come from the FULL type
    * inventory — pruning the model must not change the smoothing
    * distribution, only which bigrams still carry their explicit
    * count.
    * Output: (id, n_bigrams, mean_p) with the q84 fixed-point mean
    * discipline (round(P·2^40) integer sums — order-independent).
    *
    * Scale shape: the lmScore plan family — one bigram explode; ONE
    * (w1, w2) type-table aggregation from which history counts,
    * continuation counts, context counts and B all derive as tiny
    * re-aggregations; all model joins UN-hinted (corpus-vocab-sized,
    * the r4 discipline); the 1-row B aggregate is the one legitimate
    * broadcast. */
  def lmScoreKneserNey(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, topK: Int = Int.MaxValue): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{count => fcount}
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val fix = (1L << 40).toDouble
    val toks = split(lower(col(textCol)), " ")
    val n = size(toks)
    val bigrams = zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
      (x, y) => struct(x.as("w1"), y.as("w2"), concat_ws(" ", x, y).as("pair")))
    val bg = df.select(col(idCol).as("__id"), explode(bigrams).as("b"))
      .select(col("__id"), col("b.w1").as("w1"), col("b.w2").as("w2"),
        col("b.pair").as("pair"))
    val bcFull = bg.groupBy(col("w1").as("__bw1"), col("w2").as("__bw2"),
        col("pair")).agg(fcount(lit(1)).as("c12"))
    // history count AND continuation count in one pass over the type table
    val cont = bcFull.groupBy(col("__bw1").as("__cw1"))
      .agg(fcount(lit(1)).as("n1plus"), sum(col("c12")).as("c1"))
    val ctx = bcFull.groupBy(col("__bw2").as("__xw2"))
      .agg(fcount(lit(1)).as("n2plus"))
    val btypes = bcFull.agg(fcount(lit(1)).as("__bN"))
    val bc =
      if (topK == Int.MaxValue) bcFull.select(col("pair"), col("c12"))
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__bw1")).orderBy(col("c12").desc, col("pair").asc)
        bcFull.withColumn("__rk", row_number().over(w))
          .filter(col("__rk") <= topK).select(col("pair"), col("c12"))
      }
    val scored = bg
      .join(bc, Seq("pair"), "left") // pruned away → c12 null → pure continuation
      .join(cont, col("w1") === col("__cw1"))
      .join(ctx, col("w2") === col("__xw2"))
      .crossJoin(broadcast(btypes)) // 1-row aggregate: the one legitimate hint
      .withColumn("__pfix",
        // denominators multiply as DOUBLE (IEEE-deterministic in both
        // engines) so c1·4·B can never overflow int64 at corpus scale
        round((greatest(coalesce(col("c12"), lit(0L)) * 4 - 3, lit(0L)).cast("double")
            / (col("c1").cast("double") * 4.0)
          + (col("n1plus").cast("double") * 3.0 * col("n2plus").cast("double"))
            / (col("c1").cast("double") * 4.0 * col("__bN").cast("double"))) * fix)
          .cast("decimal(20,0)"))
    scored.groupBy(col("__id").as(idCol))
      .agg(fcount(lit(1)).as("n_bigrams"),
        (sum(col("__pfix")).cast("double") / fix / fcount(lit(1))).as("mean_p"))
  }

  /** Blocklist screening — the C4-style banned-wordlist stage: first
    * blocklisted term (in LIST order) contained in the lowercased text,
    * null if clean. Reuses the ETL tier's Aho-Corasick expression
    * (`functions.MultiContains`, one automaton per executor, O(text) per
    * row regardless of list size — the 305-keyword ETL filter measured
    * 12.1 s → 0.33 s vs chained contains). Substring semantics on
    * purpose (a banned term inside a longer word still flags — the
    * conservative screening default); token-boundary variants compose by
    * padding terms with spaces. */
  def blocklistHit(text: Column, terms: Seq[String]): Column = {
    require(terms.nonEmpty, "blocklistHit needs at least one term")
    graft.functions.MultiContains.multiContainsFirst(lower(text), terms)
  }

  /** Corpus-cleaning redaction: masks email-shaped tokens then digit runs
    * with typed placeholders (emails first — they contain digits). Pure
    * regexp_replace chain; order of passes is part of the contract. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
      "[0-9]+", "<NUM>")

  /** Luhn mod-10 checksum validity of a fixed-length digit string — the
    * checksum that separates a REAL payment-card number from an arbitrary
    * 16-digit run, which is the difference between redacting credit cards
    * and redacting every phone number and order id in the corpus. Pure
    * integer expression (digit at i, doubled on alternate positions from
    * the right, 9-subtracted past 9, sum mod 10) — engine-exact, no
    * floating point anywhere. Non-digit characters make the ANSI cast
    * throw by design: validate shape with a regexp filter first. */
  def luhnValid(digits: Column, len: Int): Column = {
    require(len >= 2, s"luhn needs at least 2 digits, got $len")
    val total = aggregate(sequence(lit(0), lit(len - 1)), lit(0), (acc, i) => {
      val d = digits.substr(i + 1, lit(1)).cast("int")
      // double every second digit counting from the RIGHT; for even len
      // that is even i (0-based from the left)
      val parity = if (len % 2 == 0) 0 else 1
      acc + when(i % 2 === parity, when(d * 2 > 9, d * 2 - 9).otherwise(d * 2))
        .otherwise(d)
    })
    total % 10 === 0
  }

  /** Content fingerprint: md5 of the sorted distinct token set (order- and
    * repetition-insensitive), plus a 60-bit integer bucket of it. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(split(lower(text), "\\s+"))), " "))

  def fingerprintBucket(text: Column): Column =
    conv(substring(fingerprint(text), 1, 15), 16, 10).cast("long")

  /** Held-out n-gram coverage per group: of the EVAL side's distinct
    * word n-grams, what fraction also occurs on the TRAIN side of the
    * same group? The coverage number a tokenizer/LM trained on the
    * train split can hope for on the held-out split. `isTrain` is any
    * boolean row expression (id parity, a split column, …).
    * Output: (group, n_eval_grams, n_covered, coverage ← round 6).
    *
    * Scale shape: each side reduces to DISTINCT (group, gram-hash)
    * rows — one partial-combining distinct each on the md5-uniform
    * hash — then ONE left equi-join eval→train on that key and a
    * group-sized count. Gram strings never shuffle, only 60-bit
    * hashes. */
  def ngramCoverage(df: DataFrame, textCol: String, groupCol: String,
      isTrain: Column, n: Int): DataFrame = {
    require(n >= 1, "n >= 1")
    // Let-bound: `get(toks, i + j)` in the per-gram lambda would
    // otherwise re-run the split n times per gram (lambda bodies are
    // CSE-exempt)
    val grams = graft.functions.Let.bindOnce(
        split(lower(col(textCol)), " ")) { toks =>
      // sequence(0, k) DESCENDS for k < 0 — short docs need the empty guard
      when(size(toks) >= n, transform(
        sequence(lit(0), size(toks) - n),
        i => Dedup.baseHash(concat_ws(" ",
          (0 until n).map(j => get(toks, i + j)): _*))))
        .otherwise(array().cast("array<long>"))
    }
    val side = df.select(col(groupCol).as("grp"), isTrain.as("__train"),
        explode(grams).as("__gh"))
    val train = side.where(col("__train")).select(col("grp"), col("__gh")).distinct()
    val eval_ = side.where(!col("__train")).select(col("grp"), col("__gh")).distinct()
    eval_.join(train.withColumn("__hit", lit(1)), Seq("grp", "__gh"), "left")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_eval_grams"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_covered"))
      .withColumn("coverage",
        round(col("n_covered").cast("double") / col("n_eval_grams").cast("double"), 6))
  }

  /** EM-fitted interpolation weight λ for the two-component LM
    * p(w2|w1) = λ·p2(w2|w1) + (1−λ)·p1(w2): unigram/bigram MLE models
    * fit on the TRAIN side, λ fit on the HELD-OUT side by `iters` EM
    * steps — λ' = mean posterior λp2/(λp2+(1−λ)p1) over held-out bigram
    * instances (Jelinek-Mercer deleted interpolation). The on-engine
    * hyperparameter fit: the scored held-out frame (p1, p2 per bigram
    * instance) is built ONCE (two model joins, then a lineage cut), and
    * each EM step is one cheap aggregate with λ folded in as a literal.
    * Posteriors are 9-dp fixed point summed as DECIMAL, so every λ_t is
    * bit-identical in any engine and under any partitioning. Held-out
    * bigrams with p1 = p2 = 0 (both words unseen in train) carry no
    * gradient and are excluded by contract. Output: (iter, lambda ←
    * round 9; the chain itself iterates on the unrounded value). */
  def lmInterpEm(df: DataFrame, idCol: String, textCol: String,
      isTrain: Column, iters: Int = 3, lambda0: Double = 0.5): DataFrame = {
    require(iters >= 1 && lambda0 > 0 && lambda0 < 1, "need iters>=1, lambda0 in (0,1)")
    val toks = split(lower(col(textCol)), " ")
    val n = size(toks)
    val bigrams = zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
      (x, y) => struct(x.as("w1"), y.as("w2")))
    val side = df.select(isTrain.as("__train"), explode(bigrams).as("b"))
      .select(col("__train"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val trainToks = df.filter(isTrain).select(explode(toks).as("w"))
    val uc = trainToks.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val total = trainToks.count()
    val bc = side.filter(col("__train"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val held = side.filter(!col("__train")).select(col("w1"), col("w2"))
    val scored = held
      .join(uc.select(col("w").as("w2"), col("c1").as("__c1w2")), Seq("w2"), "left")
      .join(uc.select(col("w").as("w1"), col("c1").as("__c1w1")), Seq("w1"), "left")
      .join(bc, Seq("w1", "w2"), "left")
      .select(
        (coalesce(col("__c1w2"), lit(0L)).cast("double") / lit(total.toDouble)).as("p1"),
        when(col("__c1w1").isNotNull && col("c12").isNotNull,
          col("c12").cast("double") / col("__c1w1").cast("double"))
          .otherwise(lit(0.0)).as("p2"))
      .filter(col("p1") + col("p2") > 0.0)
      .localCheckpoint(false)
    var lam = lambda0
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    (1 to iters).foreach { i =>
      val post = lit(lam) * col("p2") /
        (lit(lam) * col("p2") + lit(1.0 - lam) * col("p1"))
      val r = scored.agg(
        sum(round(post, 9).cast("decimal(10,9)")).cast("double").as("s"),
        count(lit(1)).as("n")).head()
      lam = r.getDouble(0) / r.getLong(1).toDouble
      out += ((i, lam))
    }
    val spark = df.sparkSession
    import spark.implicits._
    out.toSeq.toDF("iter", "lambda")
      .withColumn("lambda", round(col("lambda"), 9))
  }

  /** Entropy rate of the corpus bigram model: H = −Σ_{w1,w2} p(w1,w2)·
    * ln p(w2|w1) with MLE probabilities (c12/T2 and c12/c1 from integer
    * counts). Per-pair terms are 9-dp fixed point summed as DECIMAL, so
    * H is bit-stable under any combine order. ONE bigram-count shuffle,
    * one unigram join, one aggregate. Output: (n_bigrams, n_pairs,
    * entropy_rate ← round 6). */
  def lmEntropyRate(df: DataFrame, textCol: String): DataFrame = {
    val toks = split(lower(col(textCol)), " ")
    val n = size(toks)
    val bigrams = zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
      (x, y) => struct(x.as("w1"), y.as("w2")))
    val bg = df.select(explode(bigrams).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val uc = df.select(explode(toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val bc = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val t2 = bc.agg(sum(col("c12")).as("__t2"))
    bc.join(uc.select(col("w").as("w1"), col("c1")), Seq("w1"))
      .crossJoin(broadcast(t2))
      .select(col("c12"), col("__t2"),
        round((col("c12").cast("double") / col("__t2").cast("double")) *
          log(col("c12").cast("double") / col("c1").cast("double")), 9)
          .cast("decimal(18,9)").as("__term"))
      .agg(max(col("__t2")).as("n_bigrams"),
        count(lit(1)).as("n_pairs"),
        round(-sum(col("__term")).cast("double"), 6).as("entropy_rate"))
  }

  /** Zipf's-law fit: OLS of ln(count) against ln(rank) over the top
    * `topN` vocabulary terms (rank by count desc, term asc). Log
    * coordinates are 9-dp fixed point so the normal-equation sums are
    * exact; a Zipfian corpus reads slope ≈ −1. ONE token-count
    * shuffle + a window over the VOCAB table. Output: (n_terms,
    * slope, intercept ← round 6). */
  def zipfFit(df: DataFrame, textCol: String, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(explode(split(lower(col(textCol)), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    // top-N via TakeOrdered (per-partition top-N, candidates-sized
    // merge), THEN rank the N-bounded result — the vocab table grows
    // with the corpus, so a whole-vocab row_number window would be a
    // single-partition sort of a fact-scaled frame
    val ranked = counts
      .orderBy(col("cnt").desc, col("w")).limit(topN)
      .withColumn("__r", row_number().over(Window.orderBy(col("cnt").desc, col("w"))))
      .select(round(log(col("__r").cast("double")), 9).cast("decimal(12,9)").as("x"),
        round(log(col("cnt").cast("double")), 9).cast("decimal(12,9)").as("y"))
    val agg = ranked.agg(count(lit(1)).as("n_terms"),
      sum(col("x")).as("__sx"), sum(col("y")).as("__sy"),
      sum(col("x") * col("y")).as("__sxy"), sum(col("x") * col("x")).as("__sxx"))
    val nD = col("n_terms").cast("double")
    def d(c: String) = col(c).cast("double")
    val den = nD * d("__sxx") - d("__sx") * d("__sx")
    val slope = (nD * d("__sxy") - d("__sx") * d("__sy")) / den
    agg.select(col("n_terms"),
      round(slope, 6).as("slope"),
      round((d("__sy") - slope * d("__sx")) / nD, 6).as("intercept"))
  }

  /** Term burstiness: variance-to-mean ratio of the per-document count
    * of each of the top-`topN` corpus terms (zeros included via the
    * corpus doc count — a bursty term clumps into few docs, VMR ≫ 1;
    * a uniformly sprinkled one reads ≈ 1). Integer Σc and Σc² per term,
    * one (doc, term) count + one term aggregate + a top-N window over
    * the TERM table. Output: (term, total, vmr ← round 6), count desc. */
  def burstiness(df: DataFrame, idCol: String, textCol: String,
      topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = df.count()
    val dt = df.select(col(idCol).as("__id"),
        explode(split(lower(col(textCol)), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("__id"), col("w")).agg(count(lit(1)).as("c"))
    // top-N terms via TakeOrdered — no whole-vocab window (the rank
    // value itself is unused downstream)
    val term = dt.groupBy(col("w").as("term"))
      .agg(sum(col("c")).as("total"),
        sum((col("c") * col("c")).cast("decimal(38,0)")).as("__ss"))
      .orderBy(col("total").desc, col("term")).limit(topN)
    val nD = lit(nDocs.toDouble)
    val mean = col("total").cast("double") / nD
    val ex2 = col("__ss").cast("double") / nD
    term.select(col("term"), col("total"),
        round((ex2 - mean * mean) / mean, 6).as("vmr"))
      .orderBy(col("total").desc, col("term"))
  }

  /** Feature-hashed document embedding: every token maps to one of
    * `buckets` md5 buckets; the doc vector is the L1-normalized bucket
    * count histogram, emitted SPARSE as (id, bucket, wt) rows — the
    * cheap trainable-model-free doc representation (hashing trick,
    * Weinberger et al. '09). One (doc, bucket) count + a doc-total
    * join; integer ratios rounded to 6. */
  def hashedDocEmbedding(df: DataFrame, idCol: String, textCol: String,
      buckets: Int, seed: Int = 31): DataFrame = {
    require(buckets >= 2, "buckets >= 2")
    val bc = df.select(col(idCol).as("__id"),
        explode(split(lower(col(textCol)), " ")).as("w"))
      .where(col("w") =!= "")
      .select(col("__id"),
        pmod(Dedup.seededHash(seed, col("w")), lit(buckets.toLong)).as("bucket"))
      .groupBy(col("__id"), col("bucket")).agg(count(lit(1)).as("c"))
    val totals = bc.groupBy(col("__id")).agg(sum(col("c")).as("__tot"))
    bc.join(totals, Seq("__id"))
      .select(col("__id").as(idCol), col("bucket"),
        round(col("c").cast("double") / col("__tot").cast("double"), 6).as("wt"))
  }

  /** Template (boilerplate) detection by SHAPE fingerprint: every token
    * maps to a length class (s ≤ 2, m ≤ 5, l otherwise) and the joined
    * class string hashes to a 60-bit bucket — docs sharing a shape are
    * template instances even when their words differ. Output: shapes
    * with ≥ `minDocs` members as (shape_fp, n_docs, min_doc_id),
    * n desc. Map-only classing + ONE fingerprint-keyed count. */
  def templateFingerprints(df: DataFrame, idCol: String, textCol: String,
      minDocs: Long): DataFrame = {
    val shape = array_join(transform(split(lower(col(textCol)), " "),
      t => when(length(t) <= 2, lit("s"))
        .when(length(t) <= 5, lit("m")).otherwise(lit("l"))), "")
    df.select(col(idCol).as("__id"), Dedup.baseHash(shape).as("shape_fp"))
      .groupBy(col("shape_fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("__id")).as("min_doc_id"))
      .where(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("shape_fp"))
  }

  /** Held-out comparison of two bigram smoothing schemes — add-0.5 vs
    * Jelinek-Mercer interpolation at a fixed λ — as mean held-out log
    * probability over the SAME evaluation set (bigrams where at least
    * one JM component is nonzero, the q210 support contract; add-0.5
    * is defined everywhere but is evaluated on the same set so the
    * comparison is apples to apples). Per-bigram log terms are 9-dp
    * fixed point summed as DECIMAL. One bigram pass, two model joins,
    * a 2-row output: (model, n_bigrams, mean_logprob). */
  def lmCompareHoldout(df: DataFrame, idCol: String, textCol: String,
      isTrain: Column, lambda: Double): DataFrame = {
    require(lambda > 0 && lambda < 1, "lambda in (0,1)")
    val toks = split(lower(col(textCol)), " ")
    val n = size(toks)
    val bigrams = zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
      (x, y) => struct(x.as("w1"), y.as("w2")))
    val side = df.select(isTrain.as("__train"), explode(bigrams).as("b"))
      .select(col("__train"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val trainToks = df.filter(isTrain).select(explode(toks).as("w"))
    val uc = trainToks.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val total = trainToks.count()
    val vocab = uc.count()
    val bc = side.filter(col("__train"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val held = side.filter(!col("__train")).select(col("w1"), col("w2"))
    val scored = held
      .join(uc.select(col("w").as("w2"), col("c1").as("__c1w2")), Seq("w2"), "left")
      .join(uc.select(col("w").as("w1"), col("c1").as("__c1w1")), Seq("w1"), "left")
      .join(bc, Seq("w1", "w2"), "left")
      .select(
        (coalesce(col("__c1w2"), lit(0L)).cast("double") / lit(total.toDouble)).as("p1"),
        when(col("__c1w1").isNotNull && col("c12").isNotNull,
          col("c12").cast("double") / col("__c1w1").cast("double"))
          .otherwise(lit(0.0)).as("p2"),
        coalesce(col("c12"), lit(0L)).cast("double").as("__c12d"),
        coalesce(col("__c1w1"), lit(0L)).cast("double").as("__c1d"))
      .filter(col("p1") + col("p2") > 0.0)
    val lpAdd = log((col("__c12d") + lit(0.5)) /
      (col("__c1d") + lit(0.5) * lit(vocab.toDouble)))
    val lpJm = log(lit(lambda) * col("p2") + lit(1.0 - lambda) * col("p1"))
    val agg = scored.agg(
        count(lit(1)).as("n_bigrams"),
        sum(round(lpAdd, 9).cast("decimal(18,9)")).as("__sa"),
        sum(round(lpJm, 9).cast("decimal(18,9)")).as("__sj"))
      .localCheckpoint(false) // 1 row; consumed once per output model row
    val a = agg.select(lit("add_0.5").as("model"), col("n_bigrams"),
      round(col("__sa").cast("double") / col("n_bigrams").cast("double"), 6)
        .as("mean_logprob"))
    val j = agg.select(lit("jm_interp").as("model"), col("n_bigrams"),
      round(col("__sj").cast("double") / col("n_bigrams").cast("double"), 6)
        .as("mean_logprob"))
    a.unionByName(j)
  }

  /** T5-style span-corruption PLAN: deterministically mask ~1/`modulus`
    * of each doc's token positions (seeded-md5 rule, reproducible in
    * any engine and across epochs), merge adjacent masked positions
    * into spans (gaps-and-islands), and report per doc: token count,
    * masked count, span count and the realized mask ratio. This is the
    * objective-preprocessing ledger a span-corruption dataloader
    * consumes — the masking decision and its span structure, not the
    * corrupted text itself.
    *
    * Scale shape: one position explode filtered to masked positions
    * (~N/modulus rows), ONE doc-keyed sort window for the island key,
    * and doc-sized aggregates; integers only until the final ratio. */
  def spanCorruption(df: DataFrame, idCol: String, textCol: String,
      modulus: Int = 5, seed: Int = 5): DataFrame = {
    require(modulus >= 2, "modulus >= 2")
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("__id"),
      posexplode(split(lower(col(textCol)), " ")).as(Seq("__p", "__t")))
    val masked = toks.filter(pmod(Dedup.seededHash(seed,
      concat(col("__id").cast("string"), lit(":"), col("__p").cast("string"))),
      lit(modulus.toLong)) === 0)
    val w = Window.partitionBy(col("__id")).orderBy(col("__p"))
    val spans = masked
      .withColumn("__grp", col("__p") - row_number().over(w))
      .groupBy(col("__id"), col("__grp")).agg(count(lit(1)).as("__len"))
    val per = spans.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("__len")).as("n_masked"))
    df.select(col(idCol).as("__id"),
        size(split(lower(col(textCol)), " ")).cast("long").as("n_tokens"))
      .join(per, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"))
      .withColumn("mask_ratio",
        round(col("n_masked").cast("double") / col("n_tokens").cast("double"), 6))
  }

  /** Pairwise vocabulary Jaccard between corpus slices (per `groupCol`):
    * |V_a ∩ V_b| / |V_a ∪ V_b| over each slice's DISTINCT token set —
    * the "how much do these sources share a vocabulary" audit a mixing
    * plan reads next to per-slice OOV (q150) and lang entropy.
    *
    * Scale shape: ONE distinct shuffle to (group, token); the
    * intersection self-join is keyed on the TOKEN with per-token fanout
    * ≤ |groups|² — bounded by the slice-domain cardinality (a contract
    * bound, 20 sources here), never by corpus size; sizes and
    * intersections are partial-combining counts; output is
    * group-pair-sized. Output: (group_a, group_b, n_inter, jaccard) —
    * pairs with EMPTY intersection are absent (inner token join), not
    * emitted as 0-rows. */
  /** Distinctive terms per slice by log-odds ratio with an informative
    * Dirichlet prior (Monroe, Colaresi & Quinn 2008 "Fightin' Words"):
    *   δ_st = ln((y_st+α)/(n_s+α₀−y_st−α)) − ln((y_t+α)/(n+α₀−y_t−α)),
    *   z_st = δ_st / √(1/(y_st+α) + 1/(y_t+α))
    * — the statistically-sound "what words characterize this source"
    * read (raw tf-ratio top-terms just surface rare noise; the prior
    * shrinks them). Top `topK` per slice by z.
    *
    * Scale shape: ONE (slice, term) count; corpus totals derive from
    * it; the decorating joins are term-keyed and UN-HINTED (the q84
    * model-join discipline); top-k is a slice-partitioned window over
    * the slice×vocab table. Output: (group, term, z_score). */
  def distinctiveTerms(df: DataFrame, groupCol: String, textCol: String,
      topK: Int = 3, alpha: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val st = df.select(col(groupCol).as("group"),
        explode(split(lower(col(textCol)), " ")).as("term"))
      .where(col("term") =!= "")
      .groupBy(col("group"), col("term")).agg(count(lit(1)).as("__y"))
      .localCheckpoint(false) // slice totals + corpus totals + the z pass
    val ns = st.groupBy(col("group")).agg(sum(col("__y")).as("__ns"))
    val ct = st.groupBy(col("term")).agg(sum(col("__y")).as("__yt"))
    val vocab = ct.agg(count(lit(1)).as("__v"), sum(col("__yt")).as("__n"))
    def d(c: String) = col(c).cast("double")
    val a0 = lit(alpha) * d("__v")
    val dlt = log((d("__y") + alpha) / (d("__ns") + a0 - d("__y") - alpha)) -
      log((d("__yt") + alpha) / (d("__n") + a0 - d("__yt") - alpha))
    val z = dlt / sqrt(lit(1.0) / (d("__y") + alpha) +
      lit(1.0) / (d("__yt") + alpha))
    val scored = st.join(ns, "group").join(ct, "term").crossJoin(vocab)
      .select(col("group"), col("term"), round(z, 6).as("z_score"))
    val w = Window.partitionBy(col("group"))
      .orderBy(col("z_score").desc, col("term"))
    scored.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= topK)
      .drop("__rk")
  }

  /** Per-slice vocabulary health: vocab size, hapax/dis legomena counts
    * (terms occurring exactly once/twice IN THE SLICE), hapax fraction,
    * and type-token ratio — the lexical-diversity panel a corpus card
    * reads next to Zipf fit (q223) and OOV rate (q150): a
    * template-generated slice shows an abnormally LOW hapax fraction,
    * scraped spam an abnormally high one.
    *
    * Scale shape: ONE (slice, token) partial-combining count, then a
    * slice-keyed aggregate over the VOCAB table. Output per slice:
    * (group, n_tokens, vocab_size, n_hapax, n_dis, hapax_frac, ttr). */
  def vocabHealth(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val tc = df.select(col(groupCol).as("group"),
        explode(split(lower(col(textCol)), " ")).as("__t"))
      .where(col("__t") =!= "")
      .groupBy(col("group"), col("__t")).agg(count(lit(1)).as("__c"))
    tc.groupBy(col("group"))
      .agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("vocab_size"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(when(col("__c") === 2, 1L).otherwise(0L)).as("n_dis"))
      .select(col("group"), col("n_tokens").cast("long").as("n_tokens"),
        col("vocab_size"), col("n_hapax"), col("n_dis"),
        round(col("n_hapax").cast("double") / col("vocab_size").cast("double"), 6)
          .as("hapax_frac"),
        round(col("vocab_size").cast("double") / col("n_tokens").cast("double"), 6)
          .as("ttr"))
  }

  /** Sketch-path twin of [[vocabJaccard]] + its own accuracy audit:
    * per-slice token MinHash signatures (k mergeable mins — the q38
    * corpus-signature aggregate), pairwise signature-agreement Jaccard
    * estimates, joined against the EXACT pair table. At 100 TB the
    * sketch column replaces the exact token self-join outright: the
    * estimate needs ONE map-side-combining aggregate to k longs per
    * slice and a |groups|²-row comparison — no token-keyed shuffle at
    * all; the exact side here is the AUDIT baseline (the q136/q125
    * sampled-audit discipline). Sketch hashes every raw split token
    * (no empty-token filter — the estimate's unit need not match the
    * exact op's, only its own oracle). Output: (group_a, group_b,
    * jaccard [exact, 6-dp], jac_est [multiples of 1/k — binary-exact],
    * abs_err). */
  def vocabJaccardSketch(df: DataFrame, groupCol: String, textCol: String,
      numHashes: Int = 64): DataFrame = {
    val hashed = df.select(col(groupCol).as("__g"),
      explode(graft.functions.HashOps.md5Prefix60Array(
        split(lower(col(textCol)), " "))).as("__h"))
    val sigs = hashed.groupBy(col("__g"))
      .agg(Sketches.minhashSig(col("__h"), numHashes).as("__sig"))
      .localCheckpoint(false) // both sides of the pair comparison
    val est = sigs.join(
        sigs.select(col("__g").as("__g2"), col("__sig").as("__sig2")),
        col("__g") < col("__g2"))
      .select(col("__g").as("group_a"), col("__g2").as("group_b"),
        Sketches.sigJaccard(col("__sig"), col("__sig2")).as("__est"))
    vocabJaccard(df, groupCol, textCol)
      .select(col("group_a"), col("group_b"), col("jaccard"))
      .join(est, Seq("group_a", "group_b"))
      .select(col("group_a"), col("group_b"), col("jaccard"),
        col("__est").as("jac_est"),
        round(abs(col("__est") - col("jaccard")), 6).as("abs_err"))
  }

  def vocabJaccard(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val vt = df.select(col(groupCol).as("__g"),
        explode(split(lower(col(textCol)), " ")).as("__t"))
      .where(col("__t") =!= "")
      .distinct()
      .localCheckpoint(false) // 3 consumers: sizes + both pair-join sides
    val sizes = vt.groupBy(col("__g")).agg(count(lit(1)).as("__vs"))
    vt.join(vt.select(col("__g").as("__g2"), col("__t")), Seq("__t"))
      .where(col("__g") < col("__g2"))
      .groupBy(col("__g").as("group_a"), col("__g2").as("group_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.select(col("__g").as("group_a"), col("__vs").as("__sa")), "group_a")
      .join(sizes.select(col("__g").as("group_b"), col("__vs").as("__sb")), "group_b")
      .select(col("group_a"), col("group_b"), col("n_inter"),
        round(col("n_inter").cast("double") /
          (col("__sa") + col("__sb") - col("n_inter")).cast("double"), 6)
          .as("jaccard"))
  }

  /** RAKE keyphrase extraction (Rose et al. 2010, public literature):
    * candidate phrases are maximal stopword-free token runs; each word
    * scores degree/freq (degree = Σ phrase-length over its occurrences
    * — freq plus co-occurrence credit), and a phrase scores the sum of
    * its member word scores. The content-phrase counterpart of the
    * single-term tf-idf/BM25 rankers (q42/q107) and the PMI collocation
    * pairs (q311): multi-word, corpus-wide, no supervision.
    *
    * Float discipline: word scores are doubles from exact counts,
    * rounded to 9 dp before the per-phrase DECIMAL sum, so phrase
    * scores are partition-order-free.
    *
    * Scale shape: one position explode with a doc-keyed running
    * stopword count (gaps-and-islands, the q73/q141 shape) → phrase
    * ids; ONE word aggregate for freq/degree; phrase scoring joins the
    * word table back (vocab-sized, un-hinted) and aggregates per
    * phrase text. Output: top-`topK` phrases by (score desc, phrase):
    * (phrase, n_words, n_occ, score). */
  def rakeKeyphrases(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String], topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("__id"),
      posexplode(split(lower(col(textCol)), " ")).as(Seq("__p", "__t")))
      .where(col("__t") =!= "")
      .withColumn("__stop", col("__t").isin(stopwords: _*))
    val w = Window.partitionBy(col("__id")).orderBy(col("__p"))
    val grouped = toks
      .withColumn("__grp", sum(when(col("__stop"), 1L).otherwise(0L)).over(w))
      .where(!col("__stop"))
      .localCheckpoint(false) // consumers: word stats + phrase scoring
    val phrases = grouped.groupBy(col("__id"), col("__grp"))
      .agg(count(lit(1)).as("__len"))
    val members = grouped.join(phrases, Seq("__id", "__grp"))
    val words = members.groupBy(col("__t"))
      .agg(count(lit(1)).as("__freq"), sum(col("__len")).as("__deg"))
      .select(col("__t"),
        (col("__deg").cast("double") / col("__freq").cast("double"))
          .as("__score"))
    val phraseRows = members.join(words, Seq("__t"))
      .groupBy(col("__id"), col("__grp"))
      .agg(concat_ws(" ", array_sort(collect_list(
          struct(col("__p"), col("__t")))).getField("__t")).as("phrase"),
        count(lit(1)).as("n_words"),
        sum(round(col("__score"), 9).cast("decimal(18,9)")).as("__ps"))
    phraseRows.groupBy(col("phrase"))
      .agg(max(col("n_words")).as("n_words"), count(lit(1)).as("n_occ"),
        round(max(col("__ps")).cast("double"), 6).as("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(topK)
  }

  /** Data-scaling curve for the add-α bigram LM (the Kaplan/Hestness
    * scaling-law measurement shape, public literature): train the model
    * on NESTED corpus fractions (doc_id % d == 0 for each d in
    * `fracDenoms` — larger d ⊂ smaller d), score each against the SAME
    * fixed holdout (doc_id % holdoutMod == holdoutRes, disjoint from
    * every training set), and fit the log–log OLS slope of holdout NLL
    * vs training-set size — the "is more data still buying loss?"
    * answer before anyone trains anything.
    *
    * Float discipline: per-bigram log-probs are 9-dp decimal sums
    * (the lmCompareHoldout convention, unseen → the α-floor via
    * coalesce); the 3-point OLS products round to 9 dp and sum as
    * DECIMAL so the slope is partition-order-free. Output one row per
    * fraction: (frac_denom, n_train_docs, n_bigrams, mean_nll,
    * loglog_slope) — slope repeated on every row.
    *
    * Scale shape: one lmScore-shaped pass per fraction (model tables
    * un-hinted, 1-row vocab broadcast); the OLS runs on the
    * |fracDenoms|-row result. */
  def scalingCurve(df: DataFrame, idCol: String, textCol: String,
      fracDenoms: Seq[Int] = Seq(8, 4, 2), holdoutMod: Int = 8,
      holdoutRes: Int = 7, alpha: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(fracDenoms.nonEmpty && fracDenoms.forall(_ >= 2), "bad denoms")
    val toks = split(lower(col(textCol)), " ")
    val n = size(toks)
    val bigrams = zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
      (x, y) => struct(x.as("w1"), concat_ws(" ", x, y).as("pair")))
    val hold = df.filter(col(idCol) % holdoutMod === holdoutRes)
      .select(explode(bigrams).as("b"))
      .select(col("b.w1").as("w1"), col("b.pair").as("pair"))
      .localCheckpoint(false) // scored once per fraction
    val points = fracDenoms.map { d =>
      val sub = df.filter(col(idCol) % d === 0)
      val tokRows = sub.select(explode(toks).as("w"))
      val uc = tokRows.groupBy(col("w")).agg(count(lit(1)).as("c1"))
      val bc = sub.select(explode(bigrams).as("b"))
        .groupBy(col("b.pair").as("pair")).agg(count(lit(1)).as("c12"))
      val v = tokRows.agg(countDistinct(col("w")).as("v"))
      val nTrain = sub.agg(count(lit(1)).as("n_train_docs"))
      val lp = log((coalesce(col("c12"), lit(0L)) + lit(alpha)) /
        (coalesce(col("c1"), lit(0L)) + lit(alpha) * col("v")))
      hold
        .join(bc, Seq("pair"), "left")
        .join(uc.select(col("w").as("w1"), col("c1")), Seq("w1"), "left")
        .crossJoin(broadcast(v))
        .select(round(-lp, 9).cast("decimal(18,9)").as("__nll"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("__nll")).as("__s"))
        .crossJoin(broadcast(nTrain))
        .select(lit(d.toLong).as("frac_denom"), col("n_train_docs"),
          col("n_bigrams"),
          (col("__s").cast("double") / col("n_bigrams").cast("double"))
            .as("__nll"))
    }.reduce(_.unionByName(_))
    // 3-point log–log OLS on the fraction table (model-sized)
    val pts = points
      .withColumn("__x", log(col("n_train_docs").cast("double")))
      .withColumn("__y", log(col("__nll")))
    val w = Window.partitionBy()
    def dsum(c: Column) = sum(round(c, 9).cast("decimal(28,9)")).over(w)
      .cast("double")
    val kN = count(lit(1)).over(w).cast("double")
    val slope = (dsum(col("__x") * col("__y")) -
        dsum(col("__x")) * dsum(col("__y")) / kN) /
      (dsum(col("__x") * col("__x")) -
        dsum(col("__x")) * dsum(col("__x")) / kN)
    pts.select(col("frac_denom"), col("n_train_docs"), col("n_bigrams"),
      round(col("__nll"), 6).as("mean_nll"),
      round(slope, 6).as("loglog_slope"))
  }

  /** Burrows' Delta stylometric distance between sources (Burrows 2002;
    * the authorship-attribution standard): over the corpus's `topK`
    * most frequent words, each source's relative frequencies become
    * z-scores against the across-source mean/std per word, and
    * Δ(a, b) = mean |z_a − z_b|. Two sources with tiny Δ share a
    * "stylistic fingerprint" — the source-level near-duplication signal
    * document-level MinHash can't see (template farms, mirrors with
    * rewording). Output: the `topPairs` closest source pairs
    * (source_a, source_b, delta).
    *
    * Float discipline: frequencies divide exact counts; per-word stats
    * and z-scores are source-table-sized; the Δ fold sums 9-dp decimal
    * |z−z| terms per pair.
    *
    * Scale shape: ONE (source, word) count; the word panel is a
    * corpus-wide top-K (model-sized by contract); everything after runs
    * on sources × K rows — the pair join is source²-bounded, never
    * document-scaled. */
  def burrowsDelta(df: DataFrame, sourceCol: String, textCol: String,
      topK: Int = 20, topPairs: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(sourceCol).as("__s"),
        explode(split(lower(col(textCol)), " ")).as("__w"))
      .where(col("__w") =!= "")
      .localCheckpoint(false) // consumers: panel + per-source counts
    // panel = top-K corpus words via TakeOrdered — no whole-vocab window
    val panel = toks.groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w")).limit(topK)
      .select(col("__w"))
    val srcTot = toks.groupBy(col("__s")).agg(count(lit(1)).as("__nt"))
    val freq = toks.join(panel, Seq("__w"))
      .groupBy(col("__s"), col("__w")).agg(count(lit(1)).as("__c"))
      .join(srcTot, Seq("__s"))
      .select(col("__s"), col("__w"),
        (col("__c").cast("double") / col("__nt").cast("double")).as("__f"))
    // a source missing a panel word has f = 0 — densify via cross
    val dense = srcTot.select(col("__s")).crossJoin(panel)
      .join(freq, Seq("__s", "__w"), "left")
      .withColumn("__f", coalesce(col("__f"), lit(0.0)))
    val fix = (1L << 40).toDouble
    val stats = dense.groupBy(col("__w"))
      .agg((sum(round(col("__f") * fix).cast("decimal(20,0)")).cast("double")
          / fix / count(lit(1))).as("__mu"),
        (sum(round(col("__f") * col("__f") * fix).cast("decimal(20,0)"))
          .cast("double") / fix / count(lit(1))).as("__m2"))
      .withColumn("__sd", sqrt(col("__m2") - col("__mu") * col("__mu")))
    val z = dense.join(stats, Seq("__w"))
      .select(col("__s"), col("__w"),
        when(col("__sd") > 0, (col("__f") - col("__mu")) / col("__sd"))
          .otherwise(lit(0.0)).as("__z"))
      .localCheckpoint(false) // both pair sides
    z.join(z.select(col("__s").as("__s2"), col("__w"),
        col("__z").as("__z2")), Seq("__w"))
      .where(col("__s") < col("__s2"))
      .select(col("__s"), col("__s2"),
        round(abs(col("__z") - col("__z2")), 9).cast("decimal(18,9)")
          .as("__t"))
      .groupBy(col("__s").as("source_a"), col("__s2").as("source_b"))
      .agg(round(sum(col("__t")).cast("double") /
        count(lit(1)).cast("double"), 6).as("delta"))
      .orderBy(col("delta"), col("source_a"), col("source_b"))
      .limit(topPairs)
  }

  /** Divergence attribution: WHICH tokens drive the Jensen–Shannon
    * divergence between two corpus halves — the per-token JS
    * contributions the scalar drift gate (q294) rolls up, ranked so a
    * drift alarm comes with its explanation. m = (p+q)/2;
    * contrib(t) = (p·log2(p/m) + q·log2(q/m))/2, zero-count sides
    * contribute only their partner term. Output: top-`topK` tokens by
    * contribution: (token, p_ref, p_cur, js_contrib).
    *
    * Scale shape: ONE (side, token) count; contributions and the
    * ranking run on the vocab-sized table (TakeOrdered). */
  def divergenceTokens(ref: DataFrame, cur: DataFrame, tokCol: String,
      topK: Int = 15): DataFrame = {
    val both = ref.select(col(tokCol).as("__t"), lit(true).as("__r"))
      .unionByName(cur.select(col(tokCol).as("__t"), lit(false).as("__r")))
      .groupBy(col("__t"))
      .agg(sum(when(col("__r"), 1L).otherwise(0L)).as("__cr"),
        sum(when(!col("__r"), 1L).otherwise(0L)).as("__cc"))
      .localCheckpoint(false) // totals + term pass
    val tot = both.agg(sum(col("__cr")).as("__nr"), sum(col("__cc")).as("__nc"))
    def d(c: Column) = c.cast("double")
    val dec = both.crossJoin(tot)
      .select(col("__t"),
        (d(col("__cr")) / d(col("__nr"))).as("__p"),
        (d(col("__cc")) / d(col("__nc"))).as("__q"))
      .withColumn("__m", (col("__p") + col("__q")) / lit(2.0))
      .withColumn("__contrib",
        (when(col("__p") > 0, col("__p") * log2(col("__p") / col("__m")))
          .otherwise(lit(0.0)) +
          when(col("__q") > 0, col("__q") * log2(col("__q") / col("__m")))
            .otherwise(lit(0.0))) / lit(2.0))
    dec.select(col("__t").as("token"),
        round(col("__p"), 6).as("p_ref"), round(col("__q"), 6).as("p_cur"),
        round(col("__contrib"), 6).as("js_contrib"))
      .orderBy(col("js_contrib").desc, col("token"))
      .limit(topK)
  }

  /** Chao1 species-richness estimate of the vocabulary (Chao 1984,
    * public literature) with Good–Turing coverage: per group,
    *   chao1 = D + f1·(f1−1) / (2·(f2+1))   (bias-corrected form)
    *   coverage = 1 − f1/N                   (Good–Turing)
    * where D = observed distinct tokens, f1/f2 = singleton/doubleton
    * counts, N = token instances. The "how much vocabulary have we NOT
    * seen yet" gauge that tells a crawl whether more data still buys
    * new tokens — the forward-looking sibling of the Heaps-law fit
    * (q335) and vocab-health ledger (q283).
    *
    * Scale shape: ONE (group, token) partial-combining count, then a
    * group-sized counts-of-counts aggregate; integers until the final
    * two ratios. Output: (group, n_tokens, d_obs, f1, f2, chao1,
    * coverage) — chao1/coverage rounded 6. */
  def chao1Richness(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val tc = df.select(col(groupCol).as("group"),
        explode(split(lower(col(textCol)), " ")).as("__t"))
      .where(col("__t") =!= "")
      .groupBy(col("group"), col("__t")).agg(count(lit(1)).as("__c"))
    tc.groupBy(col("group"))
      .agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("d_obs"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("__c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("group"), col("n_tokens"), col("d_obs"), col("f1"), col("f2"),
        round(col("d_obs").cast("double") +
          col("f1").cast("double") * (col("f1") - 1).cast("double") /
            (lit(2.0) * (col("f2") + 1).cast("double")), 6).as("chao1"),
        round(lit(1.0) -
          col("f1").cast("double") / col("n_tokens").cast("double"), 6)
          .as("coverage"))
  }

  /** Excess-loss (RHO-loss-style; Mindermann et al. 2022, public
    * literature) data prioritisation: train TWO add-α bigram LMs on
    * disjoint splits — a proxy model on `trainPred` rows and a reference
    * model on `refPred` rows — then score every POOL doc (neither
    * predicate) under both. ρ = mean_p_ref − mean_p_proxy: high means
    * the reference (clean holdout) model finds the doc likely while the
    * proxy does not — i.e. LEARNABLE, not noise — which is the
    * selection signal. Output: pool docs bucketed into `nBuckets`
    * ρ-deciles (ntile over ρ desc, ties on doc id):
    * (bucket, n_docs, mean_rho, min_rho, max_rho).
    *
    * Float discipline: per-bigram probabilities go through the q84
    * fixed-point mean (round(P·2^40) integer-decimal sums), ρ deciles
    * order on the resulting exact-quotient doubles, and mean_rho sums
    * 9-dp decimal contributions — all partition-order-free. Unseen
    * bigrams score the smoothing floor α/(c1+α·V) via coalesce(0).
    *
    * Scale shape: identical to `lmScore` twice over — one bigram
    * explode per model + one for the pool, model tables UN-hinted
    * (corpus-vocab-sized), the two 1-row vocab aggregates are the only
    * broadcast hints; the decile window runs on the pool-DOC table
    * keyed by a single ntile (one shuffle of doc-level rows). */
  def excessLossDeciles(df: DataFrame, idCol: String, textCol: String,
      trainPred: Column, refPred: Column, alpha: Double = 0.5,
      nBuckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fix = (1L << 40).toDouble
    val toks = split(lower(col(textCol)), " ")
    val n = size(toks)
    val bigrams = zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
      (x, y) => struct(x.as("w1"), concat_ws(" ", x, y).as("pair")))
    def model(pred: Column) = {
      val sub = df.filter(pred)
      val tokRows = sub.select(explode(toks).as("w"))
      val uc = tokRows.groupBy(col("w")).agg(count(lit(1)).as("c1"))
      val bc = sub.select(explode(bigrams).as("b"))
        .groupBy(col("b.pair").as("pair")).agg(count(lit(1)).as("c12"))
      val v = tokRows.agg(countDistinct(col("w")).as("v"))
      (uc, bc, v)
    }
    val (ucT, bcT, vT) = model(trainPred)
    val (ucR, bcR, vR) = model(refPred)
    val pool = df.filter(!(trainPred || refPred))
      .select(col(idCol).as("__id"), explode(bigrams).as("b"))
      .select(col("__id"), col("b.w1").as("w1"), col("b.pair").as("pair"))
    def pfix(c12: Column, c1: Column, v: Column) =
      round(((coalesce(c12, lit(0L)) + lit(alpha)) /
        (coalesce(c1, lit(0L)) + lit(alpha) * v)) * lit(fix))
        .cast("decimal(20,0)")
    val scored = pool
      .join(bcT.select(col("pair"), col("c12").as("__cT")), Seq("pair"), "left")
      .join(bcR.select(col("pair"), col("c12").as("__cR")), Seq("pair"), "left")
      .join(ucT.select(col("w").as("w1"), col("c1").as("__uT")), Seq("w1"), "left")
      .join(ucR.select(col("w").as("w1"), col("c1").as("__uR")), Seq("w1"), "left")
      .crossJoin(broadcast(vT.select(col("v").as("__vT"))))
      .crossJoin(broadcast(vR.select(col("v").as("__vR"))))
      .select(col("__id"),
        pfix(col("__cT"), col("__uT"), col("__vT")).as("__pT"),
        pfix(col("__cR"), col("__uR"), col("__vR")).as("__pR"))
    val perDoc = scored.groupBy(col("__id"))
      .agg(count(lit(1)).as("__nb"),
        sum(col("__pT")).as("__sT"), sum(col("__pR")).as("__sR"))
      .select(col("__id"),
        ((col("__sR").cast("double") - col("__sT").cast("double")) / lit(fix) /
          col("__nb").cast("double")).as("__rho"))
    // fact-sized ntile via the range-partitioned exact-rank hatch —
    // never a single-partition window over the per-doc scores
    val bucketed = Ranks.withNtile(perDoc, "bucket", nBuckets,
      col("__rho").desc, col("__id"))
    bucketed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(round(col("__rho"), 9).cast("decimal(18,9)")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_rho"),
        round(min(col("__rho")), 6).as("min_rho"),
        round(max(col("__rho")), 6).as("max_rho"))
  }

  /** Flesch reading ease per document (Flesch '48): 206.835 −
    * 1.015·(words/sentences) − 84.6·(syllables/words). Sentences are
    * non-blank `[.!?]+` splits (min 1); syllables use the vowel-group
    * heuristic (runs of `[aeiouy]` in the lowercased text, with
    * vowel-less words contributing 1 — "rhythm-less" tokens still get
    * one beat). Pure per-row Column arithmetic — map-only, codegen'd,
    * no shuffle; integer counts make the double formula engine-exact.
    * Output: (idCol, n_sentences, n_words, n_syllables, flesch). */
  def fleschStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = filter(split(lower(col(textCol)), "\\s+"),
      w => length(w) > 0)
    val nWords = size(toks).cast("long")
    val nSent = greatest(lit(1L),
      size(filter(split(col(textCol), "[.!?]+"),
        x => length(trim(x)) > 0)).cast("long"))
    val vowelGroups =
      size(regexp_extract_all(lower(col(textCol)), lit("[aeiouy]+"), lit(0)))
        .cast("long")
    val voweless =
      size(filter(toks, w => !w.rlike("[aeiouy]"))).cast("long")
    val nSyll = vowelGroups + voweless
    df.select(col(idCol), nSent.as("n_sentences"), nWords.as("n_words"),
        nSyll.as("n_syllables"),
        when(nWords > 0, round(
            lit(206.835) -
              lit(1.015) * (nWords.cast("double") / nSent.cast("double")) -
              lit(84.6) * (nSyll.cast("double") / nWords.cast("double")), 6))
          .otherwise(lit(0.0)).as("flesch"))
      .orderBy(col(idCol))
  }

  /** Term burstiness for the `topK` most frequent terms (Church &
    * Gale '95's variance-based dispersion): over ALL N documents
    * (absent = 0), VMR = Var/Mean of the per-doc count — VMR ≈ 1 is
    * Poisson scatter, ≫ 1 means the term clumps into few documents.
    * Population variance from INTEGER power sums (S1 = Σc, S2 = Σc²),
    * so the doubles divide identically in any engine:
    * mean = S1/N, var = S2/N − mean². One token-count shuffle + one
    * per-term aggregate; the N scalar is a driver count.
    * Output: (term, freq, n_docs, vmr). */
  def termBurstiness(df: DataFrame, idCol: String, textCol: String,
      topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val n = df.count()
    require(n > 0, "termBurstiness needs a non-empty corpus")
    val counts = df.select(col(idCol).as("__id"),
        explode(split(lower(col(textCol)), " ")).as("__t"))
      .filter(length(col("__t")) > 0)
      .groupBy(col("__t"), col("__id")).agg(count(lit(1)).as("__c"))
    val stats = counts.groupBy(col("__t").as("term"))
      .agg(sum(col("__c")).as("freq"),
        count(lit(1)).as("n_docs"),
        sum(col("__c") * col("__c")).as("__s2"))
    val nD = n.toDouble
    stats
      .withColumn("__mean", col("freq").cast("double") / lit(nD))
      .withColumn("vmr", round(
        (col("__s2").cast("double") / lit(nD) - col("__mean") * col("__mean")) /
          col("__mean"), 6))
      .select(col("term"), col("freq"), col("n_docs"), col("vmr"))
      .orderBy(col("freq").desc, col("term"))
      .limit(topK)
  }

  /** Commutative per-group dataset digest — the version id a release
    * manifest records: per doc, a 60-bit md5 of the normalized text;
    * per group, the SUM mod 2^60 plus the count. Order-independent by
    * construction (integer sums commute), so it map-side combines and
    * never needs the single-reducer sorted concatenation a naive
    * "md5 of concatenated md5s" digest would force at 100 TB. Any
    * added/removed/edited doc moves the digest (collisions need
    * engineered 60-bit cancellation). Output: (group, n_docs, digest). */
  def datasetDigest(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val h = graft.ops.Dedup.baseHash(
      regexp_replace(trim(lower(col(textCol))), "\\s+", " "))
    df.select(col(groupCol).as("group"), h.as("__h"))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n_docs"),
        // sum through DECIMAL — 60-bit terms overflow a Long sum at
        // just 8 rows; operands are non-negative so % == mod
        (sum(col("__h").cast("decimal(38,0)")) % lit(1L << 60))
          .cast("long").as("digest"))
      .orderBy(col("group"))
  }

  /** Deterministic MLM masking plan (the BERT 15 % discipline, made
    * replayable): token (doc, pos) is masked iff
    * md5("doc:pos") mod 100 < pct. Selection is a pure hash — no RNG
    * state, identical on any partitioning/retry, and the oracle can
    * recompute it. Output per doc: (idCol, n_tokens, n_masked,
    * masked_sum ← Σ masked positions, mask_rate). */
  def mlmMaskPlan(df: DataFrame, idCol: String, textCol: String,
      pct: Int = 15): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100], got $pct")
    val toks = df.select(col(idCol).as("__id"),
        posexplode(split(lower(col(textCol)), " ")).as(Seq("__pos", "__w")))
      .filter(length(col("__w")) > 0)
    val masked = pmod(graft.ops.Dedup.baseHash(
      concat(col("__id").cast("string"), lit(":"), col("__pos").cast("string"))),
      lit(100L)) < pct
    toks.groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(masked, 1L).otherwise(0L)).as("n_masked"),
        sum(when(masked, col("__pos").cast("long")).otherwise(0L))
          .as("masked_sum"))
      .withColumn("mask_rate", round(col("n_masked").cast("double") /
        col("n_tokens").cast("double"), 6))
      .orderBy(col(idCol))
  }

  /** Zipf rank–frequency slope over the top-`topR` terms: OLS of ln f
    * on ln r — the corpus-health scaling audit next to the Heaps curve
    * (q183): natural text sits near −1; a synthetic or boilerplate-
    * heavy corpus drifts shallow. Per-term ln's and their products fold
    * through 2^40 fixed-point BEFORE the sums (the q80 construction);
    * the closing OLS divides identical doubles in any engine.
    *
    * Scale shape: one term-count shuffle; ranking happens on the
    * topR-bounded frame (topR is a contract constant — the one global
    * window runs on ≤ topR rows). Output: one row (n_terms, slope). */
  def zipfSlope(df: DataFrame, textCol: String, topR: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topR >= 3, s"topR must be >= 3, got $topR")
    val fix = (1L << 40).toDouble
    val tf = df.select(explode(split(lower(col(textCol)), " ")).as("t"))
      .filter(length(col("t")) > 0)
      .groupBy(col("t")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("t")).limit(topR)
    val ranked = tf.withColumn("r",
      row_number().over(Window.orderBy(col("f").desc, col("t"))))
    val terms = ranked.select(
        round(log(col("r").cast("double")) * fix).cast("long").as("__xf"),
        round(log(col("f").cast("double")) * fix).cast("long").as("__yf"))
      .withColumn("__x", col("__xf").cast("double") / fix)
      .withColumn("__y", col("__yf").cast("double") / fix)
      .withColumn("__xy", round(col("__x") * col("__y") * fix).cast("long"))
      .withColumn("__xx", round(col("__x") * col("__x") * fix).cast("long"))
    val n = col("n_terms").cast("double")
    def s(c: String) = col(c).cast("double") / fix
    terms.agg(count(lit(1)).as("n_terms"), sum(col("__xf")).as("__sx"),
        sum(col("__yf")).as("__sy"), sum(col("__xy")).as("__sxy"),
        sum(col("__xx")).as("__sxx"))
      .select(col("n_terms"),
        round((n * s("__sxy") - s("__sx") * s("__sy")) /
          (n * s("__sxx") - s("__sx") * s("__sx")), 6).as("slope"))
  }

  /** χ² token–label association (the feature-selection audit behind
    * "which tokens give the language/domain away" — Yang & Pedersen '97
    * ranked χ² top among selection criteria): per (label, term), the
    * 2×2 document-presence contingency {in-label, out-label} ×
    * {contains, doesn't}, χ² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)), top-K
    * terms per label. Terms present in < `minDf` or ALL documents are
    * excluded (the latter also keeps the (c+d) factor > 0).
    *
    * Scale shape: one (label, term) presence-count shuffle + a
    * term-keyed df rollup; label counts are a label-cardinality
    * aggregate; the final window ranks per label. All counts integer —
    * the double χ² divides identically in any engine.
    * Output: (label, term, df_in, df_out, chi2). */
  def chi2Keywords(df: DataFrame, idCol: String, labelCol: String,
      textCol: String, minDf: Int = 5, topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minDf >= 1 && topK >= 1, "minDf >= 1, topK >= 1")
    val n = df.count()
    require(n > 0, "chi2Keywords needs a non-empty corpus")
    val pres = df.select(col(labelCol).as("label"),
      explode(array_distinct(filter(split(lower(col(textCol)), " "),
        t => length(t) > 0))).as("term"))
    val tf = pres.groupBy(col("label"), col("term")).agg(count(lit(1)).as("a"))
    val nl = df.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("__nl"))
    val tdf = tf.groupBy(col("term")).agg(sum(col("a")).as("__dft"))
    // tdf is vocab-sized — term-keyed equi-join, no broadcast hint (AQE
    // may still pick one at small SFs); nl is label-cardinality, hinted
    val x = tf.join(tdf.filter(col("__dft") >= minDf && col("__dft") < n),
        Seq("term"))
      .join(broadcast(nl), Seq("label"))
      .select(col("label"), col("term"), col("a"),
        (col("__dft") - col("a")).as("b"),
        (col("__nl") - col("a")).as("c"),
        (lit(n) - col("__nl") - (col("__dft") - col("a"))).as("d"))
    val diff = col("a").cast("double") * col("d").cast("double") -
      col("b").cast("double") * col("c").cast("double")
    val chi = x.select(col("label"), col("term"),
      col("a").as("df_in"), col("b").as("df_out"),
      round(lit(n.toDouble) * diff * diff /
        ((col("a") + col("b")).cast("double") *
          (col("c") + col("d")).cast("double") *
          (col("a") + col("c")).cast("double") *
          (col("b") + col("d")).cast("double")), 6).as("chi2"))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("chi2").desc, col("term").asc)
    chi.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= topK).drop("__rn")
      .orderBy(col("label"), col("chi2").desc, col("term"))
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): build the
    * word co-occurrence graph — an undirected edge between candidate
    * words appearing within `window` positions of each other in a
    * document — and rank vertices with [[Graph.pageRank]]'s integer
    * fixed-point recursion. Candidates are words of length ≥ `minLen`
    * (the length heuristic standing in for the paper's POS filter —
    * deterministic and language-agnostic); edges are DISTINCT pairs
    * (unweighted, the paper's base formulation) canonicalized
    * (least, greatest) then symmetrized.
    *
    * Scale shape: each window offset d ∈ [1, window] is an EQUI-join of
    * the position-indexed token table with itself on (doc, pos + d) —
    * no theta join, no per-doc explosion; the distinct is one shuffle
    * on the edge key; PageRank's per-iteration cost is the documented
    * one-join-one-agg shape. Top-`topK` by (rank desc, word asc).
    * Output: (word, rank_fp). */
  def textRankKeywords(df: DataFrame, idCol: String, textCol: String,
      minLen: Int = 4, window: Int = 2, iters: Int = 3,
      topK: Int = 20): DataFrame = {
    require(window >= 1 && topK >= 1, "window >= 1, topK >= 1")
    val t = df.select(col(idCol).as("__doc"),
        posexplode(split(lower(col(textCol)), " ")).as(Seq("__pos", "__w")))
      .filter(length(col("__w")) >= minLen)
      .localCheckpoint(eager = true) // read by window self-joins + vertices
    val edges = (1 to window).map { d =>
        t.select(col("__doc"), col("__pos"), col("__w").as("__wa"))
          .join(t.select(col("__doc"), (col("__pos") - d).as("__pos"),
            col("__w").as("__wb")), Seq("__doc", "__pos"))
          .filter(col("__wa") =!= col("__wb"))
          .select(least(col("__wa"), col("__wb")).as("src"),
            greatest(col("__wa"), col("__wb")).as("dst"))
      }.reduce(_ unionByName _).distinct()
    val sym = edges.unionByName(
      edges.select(col("dst").as("src"), col("src").as("dst")))
    val verts = t.select(col("__w").as("word")).distinct()
    val ranked = Graph.pageRank(verts, "word", sym, iters = iters)
      .orderBy(col("rank_fp").desc, col("word")).limit(topK)
      .localCheckpoint(eager = true) // topK rows; lets t's blocks go
    graft.ops.Dedup.unpersistCheckpoint(t)
    ranked
  }

  /** Simple Good–Turing unseen-mass estimate (Gale & Sampson 1995, the
    * LGT log-linear variant): from the frequency-of-frequencies table
    * N_r, the probability mass of UNSEEN vocabulary is p₀ = N₁/N, and
    * the smoothing line log Z_r = a + b·log r (Z_r = N_r averaged over
    * its empty neighborhood, Z_r = 2N_r/(r₊ − r₋)) gives adjusted
    * counts r* = (r+1)(1+1/r)^b. The vocabulary-side complement to
    * q335's Heaps fit and q355's Chao1: those extrapolate vocab SIZE,
    * this prices the unseen TAIL for an LM (b < −1 is the Gale–Sampson
    * validity condition, emitted as `valid_smoothing`).
    *
    * Float discipline: N, V, N₁ are exact longs; per-row regression
    * terms (ln r, ln Z and their products) are 9-dp fixed point summed
    * as decimals, so the least-squares line is order-independent; the
    * final divisions/exps are double, round-6, with ln 2 / ln 1.5 as
    * explicit double literals (no cross-engine libm constant drift).
    *
    * Scale shape: one token-count shuffle, one (count → N_r) aggregate
    * over the vocab, then ONE [[Ranks.runningSumsRanked]] pass over
    * the COUNT DOMAIN (it grows with the corpus — no single-partition
    * lead/lag window); the r₋ neighbor is a rank self-join on the same
    * small table. Everything after runs on 1-row aggregates. Output,
    * 1 row: (n_tokens, vocab, n1, p0, intercept, slope, rstar_1,
    * rstar_2, valid_smoothing). */
  def goodTuring(df: DataFrame, textCol: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    def dec9(c: Column) = round(c, 9).cast("decimal(28,9)")
    val wc = df.select(explode(split(lower(col(textCol)), " ")).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy(col("__w")).agg(count(lit(1)).as("__r"))
    val ff = wc.groupBy(col("__r")).agg(count(lit(1)).as("__nr"))
      .localCheckpoint(false) // consumers: the ranked walk + totals
    val run = Ranks.runningSumsRanked(ff, Seq("__nr" -> "__cum"),
      Some("__r" -> "__rnext"), "__rn", col("__r"))
    val prev = run.df.select((col("__rn") + 1).as("__rn"),
      col("__r").as("__rprev"))
    val z = run.df.join(prev, Seq("__rn"), "left")
      .withColumn("__lo", coalesce(col("__rprev"), lit(0L)))
      .withColumn("__hi",
        coalesce(col("__rnext"), lit(2) * col("__r") - col("__lo")))
      .withColumn("__z", d(col("__nr")) * 2.0 / d(col("__hi") - col("__lo")))
    val lx = log(d(col("__r")))
    val ly = log(col("__z"))
    val reg = z.agg(count(lit(1)).as("__k"),
      sum(dec9(lx)).as("__sx"), sum(dec9(ly)).as("__sy"),
      sum(dec9(lx * lx)).as("__sxx"), sum(dec9(lx * ly)).as("__sxy"))
    val tot = ff.agg(sum(col("__r") * col("__nr")).as("n_tokens"),
      sum(col("__nr")).as("vocab"),
      sum(when(col("__r") === 1, col("__nr")).otherwise(0L)).as("n1"))
    val ln2 = 0.6931471805599453
    val ln15 = 0.4054651081081644
    val slope = (d(col("__sxy")) - d(col("__sx")) * d(col("__sy")) / d(col("__k"))) /
      (d(col("__sxx")) - d(col("__sx")) * d(col("__sx")) / d(col("__k")))
    tot.crossJoin(reg)
      .withColumn("__b", slope)
      .withColumn("__a",
        d(col("__sy")) / d(col("__k")) - col("__b") * d(col("__sx")) / d(col("__k")))
      .select(col("n_tokens"), col("vocab"), col("n1"),
        round(d(col("n1")) / d(col("n_tokens")), 6).as("p0"),
        round(col("__a"), 6).as("intercept"),
        round(col("__b"), 6).as("slope"),
        round(lit(2.0) * exp(col("__b") * lit(ln2)), 6).as("rstar_1"),
        round(lit(3.0) * exp(col("__b") * lit(ln15)), 6).as("rstar_2"),
        (col("__b") < -1.0).as("valid_smoothing"))
  }
}
