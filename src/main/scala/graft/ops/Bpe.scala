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
    * Two exact implementations, picked by the pair's shape:
    *  - a ≠ b (the overwhelmingly common case): matches can never sit at
    *    ADJACENT positions (position i+1 matching would need
    *    tok[i+1] = a = b), so greedy = "fuse every match, drop every
    *    position after a match" — two O(L) array transforms, no fold.
    *  - a = b: runs of equal tokens make matches overlap and greedy
    *    becomes stateful (fuse every other position in a run); the O(L²)
    *    accumulator fold handles it. Word-level pairs with a = b are a
    *    vanishing fraction of real corpora, so the quadratic path almost
    *    never runs — and the cutover is semantics-equivalent either way
    *    (BpeSpec pins both). */
  private[ops] def mergeExpr(toks: Column, a: String, b: String,
      sep: String): Column =
    if (a == b) mergeFold(toks, a, b, sep) else mergeLinear(toks, a, b, sep)

  private def mergeFold(toks: Column, a: String, b: String,
      sep: String): Column =
    aggregate(toks, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, size(acc)) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(lit(a + sep + b))))
          .otherwise(concat(acc, array(x))))

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
    * inference half: map-only, one fold per merge rule. */
  def applyMerges(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], sep: String = DefaultSep): DataFrame =
    merges.foldLeft(
      df.select(col(idCol), split(lower(col(textCol)), " ").as("tokens"))) {
      case (acc, (a, b)) =>
        acc.withColumn("tokens", mergeExpr(col("tokens"), a, b, sep))
    }
}
