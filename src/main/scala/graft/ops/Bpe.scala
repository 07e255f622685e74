package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE-style merge learning over a tokenized corpus — the distributed
  * half of tokenizer training (Sennrich et al. 2016): repeatedly count
  * all adjacent token pairs corpus-wide, pick the most frequent pair
  * (ties broken lexicographically, so the learned vocabulary is
  * deterministic), fuse its occurrences greedily left-to-right, repeat.
  * Tokens here are whitespace words (the same merge machinery applies
  * to character sequences; word-level merges learn a phrase vocabulary).
  *
  * Scale shape: each iteration is ONE pair-count shuffle (map-side
  * partial combine on (a, b)) + a 1-row arg-max collect (driver-small,
  * the k-means-fit contract) + a MAP-ONLY merge pass — the merge rule is
  * two string literals baked into the fold expression, so nothing is
  * broadcast and the token re-write never shuffles. Per-iteration
  * persist + materialize caps lineage (the CC-loop discipline);
  * `unpersist` releases the previous generation's blocks. Iterations are
  * inherently sequential — that's the algorithm, not the plan.
  *
  * The greedy fold: scan tokens left-to-right, fusing the pair wherever
  * the PREVIOUS emitted token equals `a` and the current token equals
  * `b`. Because a fused token is `a⊕sep⊕b` (≠ `a` unless `sep` appears
  * in the input vocabulary — it's U+0001 precisely so it doesn't), a
  * token consumed by one merge can't seed an overlapping one:
  * `a a a → [a⊕a, a]`, exactly reference-BPE's non-overlapping greedy. */
object Bpe {

  val DefaultSep = "\u0001"

  /** Greedy left-to-right merge of adjacent (a, b) into one token.
    *
    * Two exact LINEAR implementations, picked by the pair's shape:
    *  - a ≠ b (the overwhelmingly common case): matches can never sit at
    *    ADJACENT positions (position i+1 matching would need
    *    tok[i+1] = a = b), so greedy = "fuse every match, drop every
    *    position after a match" — two O(L) array transforms, no fold.
    *  - a = b: runs of equal tokens make matches overlap and greedy
    *    becomes stateful (fuse every other pair in a run). A
    *    left-to-right NON-OVERLAPPING regex replace over the
    *    space-joined token string IS that statefulness: java.util.regex
    *    resumes scanning after each consumed match, so a run `a a a a`
    *    fuses pairs (1,2) and (3,4) and `a a a` leaves the trailing `a`
    *    — exactly reference-BPE greedy. One codegen'd O(L) pass
    *    (replaces a round-4 accumulator fold whose per-element array
    *    copy was O(L²): 196 s → sub-second on the sf0.1 bench).
    *    Tokens are space-free by construction (they come from a
    *    space-split; fused tokens use `sep` = U+0001), so the
    *    join/split string round-trip is lossless; BpeSpec pins both
    *    paths against each other. */
  private[ops] def mergeExpr(toks: Column, a: String, b: String,
      sep: String): Column =
    if (a == b) mergeRunParity(toks, a, sep) else mergeLinear(toks, a, b, sep)

  private def mergeRunParity(toks: Column, a: String, sep: String): Column =
    when(toks.isNull || size(toks) === 0, toks).otherwise(
      split(mergeString(concat_ws(" ", toks), a, a, sep), " "))

  /** One merge rule over the space-joined token string: a single
    * non-overlapping left-to-right regex replace (= greedy BPE, see
    * `mergeExpr`). Boundaries are the LITERAL join space, not \s — a
    * token may contain \n/\t (split only cuts on ' '), and \s would
    * false-match inside it. (^| ) instead of a lookbehind:
    * variable-length lookbehind is invalid in java.util.regex once `a`
    * is a fused multi-token (contains sep). */
  private def mergeString(s: Column, a: String, b: String,
      sep: String): Column = {
    // \z (end-of-INPUT), not $: without MULTILINE $ also matches before a
    // final line terminator, which would falsely merge when the last
    // token ends in \n — \z exactly matches the space-split boundary.
    val pattern = s"(^| )${java.util.regex.Pattern.quote(a)} " +
      s"${java.util.regex.Pattern.quote(b)}(?= |\\z)"
    val replacement =
      "$1" + java.util.regex.Matcher.quoteReplacement(a + sep + b)
    regexp_replace(s, pattern, replacement)
  }

  private def mergeLinear(toks: Column, a: String, b: String,
      sep: String): Column =
    // Because a ≠ b, "position i−1 matched" is decidable from the RAW
    // neighbors (tok[i−1], tok[i]) alone — no materialized match mask,
    // every lookup O(1) via null-OOB-safe get()
    filter(
      transform(toks, (x, i) =>
        when(coalesce(x === lit(a) && get(toks, i + 1) === lit(b),
            lit(false)), lit(a + sep + b))
          .when(coalesce(get(toks, i - 1) === lit(a) && x === lit(b),
            lit(false)), lit(null).cast("string"))
          .otherwise(x)),
      x => x.isNotNull)

  /** Adjacent-pair counts of the current token arrays (overlaps counted,
    * as reference BPE does). */
  private def pairCounts(toks: DataFrame): DataFrame =
    toks.filter(size(col("__tk")) > 1)
      .select(explode(transform(
        slice(col("__tk"), lit(1), size(col("__tk")) - 1),
        (x, j) => struct(x.as("a"),
          element_at(col("__tk"), j + 2).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n"))

  /** Learn `iters` merges → (iter, tok_a, tok_b, n_pairs), one row per
    * learned merge in order. Stops early if the corpus runs out of
    * repeated pairs. */
  def learnMerges(df: DataFrame, idCol: String, textCol: String,
      iters: Int, sep: String = DefaultSep): DataFrame = {
    require(iters > 0, "learnMerges needs at least one iteration")
    val spark = df.sparkSession
    import spark.implicits._
    var cur = df.select(col(idCol).as("__id"),
        split(lower(col(textCol)), " ").as("__tk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // previous generation, released only once `cur` has materialized (the
    // arg-max collect below is the materializing action — no dedicated
    // count() pass per iteration)
    var prev: Option[DataFrame] = None
    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var i = 0
    var done = false
    while (i < iters && !done) {
      val best = pairCounts(cur)
        .orderBy(col("n").desc, col("a"), col("b")).limit(1).collect()
      prev.foreach(_.unpersist())
      prev = None
      if (best.isEmpty) done = true
      else {
        val r = best(0)
        val (a, b, n) = (r.getString(0), r.getString(1), r.getLong(2))
        merges += ((i, a, b, n))
        val next = cur.withColumn("__tk", mergeExpr(col("__tk"), a, b, sep))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        prev = Some(cur)
        cur = next
        i += 1
      }
    }
    cur.unpersist()
    prev.foreach(_.unpersist())
    merges.toSeq.toDF("iter", "tok_a", "tok_b", "n_pairs")
  }

  /** Apply an ordered merge list to a corpus → (id, tokens) — the
    * inference half: map-only, ONE codegen'd regexp pass per rule over
    * the space-joined token STRING, split once at the end.
    *
    * String-level on purpose: an array-level rule chain references its
    * input array several times, and Catalyst's CollapseProject inlines
    * the previous rule's whole expression into EVERY reference — the
    * tree grows ~6× per rule and three rules pushed q145 out of
    * whole-stage codegen (196 s at sf0.1; sub-second here). Each
    * regexp_replace references its input exactly once, so nesting stays
    * linear in the rule count no matter how Catalyst collapses it.
    * Semantics are identical (BpeSpec pins string vs array paths):
    * java.util.regex's non-overlapping left-to-right replace IS greedy
    * BPE for both the a ≠ b and the a = b run-parity case. */
  def applyMerges(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], sep: String = DefaultSep): DataFrame = {
    val merged = merges.foldLeft(lower(col(textCol))) {
      case (acc, (a, b)) => mergeString(acc, a, b, sep)
    }
    df.select(col(idCol), split(merged, " ").as("tokens"))
  }

  /** Inverse of `applyMerges`: a fused token carries the original join
    * space as `sep` (U+0001, absent from any space-split vocabulary by
    * construction), so decoding is join-with-space + a 1:1 `translate`
    * of sep back to space. decode ∘ applyMerges == lower — for ANY merge
    * list — is hash-gated corpus-wide by q152 (the tokenizer-training
    * losslessness contract). Map-only, codegen'd. */
  def decode(tokens: Column, sep: String = DefaultSep): Column =
    translate(concat_ws(" ", tokens), sep, " ")

  /** Tokenizer compression curve: learn `iters` merges, then measure the
    * corpus token count after applying each prefix in `ks` of the merge
    * list — the vocab-size-sweep diagnostic that decides how many merges
    * a tokenizer is worth (tokens_per_word flattens once frequent pairs
    * are exhausted). Output per k: (n_merges, n_docs, n_tokens, n_words,
    * tokens_per_word rounded 6).
    *
    * Scale shape: learning is the gated q124 loop (ONE pair-count
    * shuffle + a 1-row argmax per iteration); each curve point is one
    * MAP-ONLY encode pass + a 1-row count aggregate. The merge list is
    * model-sized driver state by construction. */
  def compressionCurve(df: DataFrame, idCol: String, textCol: String,
      iters: Int, ks: Seq[Int], sep: String = DefaultSep): DataFrame = {
    require(ks.nonEmpty && ks.forall(k => k >= 0 && k <= iters), "bad ks")
    val merges = learnMerges(df, idCol, textCol, iters, sep)
      .orderBy(col("iter")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val words = df.select(size(split(lower(col(textCol)), " "))
        .cast("long").as("__w"))
      .agg(sum(col("__w")).as("n_words"))
      .localCheckpoint(false) // one row, read once per curve point
    ks.map { k =>
      applyMerges(df, idCol, textCol, merges.take(k), sep)
        .select(size(col("tokens")).cast("long").as("__t"))
        .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("n_tokens"))
        .crossJoin(words)
        .select(lit(k.toLong).as("n_merges"), col("n_docs"),
          col("n_tokens"), col("n_words"),
          round(col("n_tokens").cast("double") /
            col("n_words").cast("double"), 6).as("tokens_per_word"))
    }.reduce(_.unionByName(_))
  }
}
