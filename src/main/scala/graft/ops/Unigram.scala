package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword segmentation (the SentencePiece unigram model's
  * inference step; Kudo 2018, public literature): given a piece vocab
  * scored p(piece) = cnt/total, segment every distinct word into the
  * minimum-cost piece sequence (cost = −ln p) by Viterbi DP over word
  * positions. The BPE family (q124/q145) grows a vocab bottom-up by
  * merges; the unigram model goes the other way — score pieces, let DP
  * pick the best cover — and is the second of the two tokenizer
  * paradigms an LLM-data engine must speak.
  *
  * Vocab construction here is the deterministic corpus rule: every
  * substring of length 1..`maxPieceLen` of every token INSTANCE,
  * kept when cnt ≥ `minCount` — with ALL single characters kept
  * unconditionally so every word is segmentable (the DP can always
  * fall back to chars).
  *
  * Float discipline: piece costs are doubles from exact integer
  * counts; the per-word DP folds edges in (end, start) order with a
  * FIXED left-associated path sum, and IEEE addition is weakly
  * monotone, so the DP minimum equals the full-enumeration minimum
  * bit-for-bit — the oracle can enumerate paths and min them.
  *
  * Scale shape: piece counting is ONE (piece)-keyed partial-combining
  * aggregate over a ≤ len·maxPieceLen-per-token explode; segmentation
  * runs per DISTINCT word (vocabulary-sized, not corpus-sized) — one
  * substring-candidate explode, one equi-join to the vocab table
  * (un-hinted; AQE broadcasts a genuinely small vocab), one collect
  * into a word-length-bounded edge array, and a map-only `aggregate`
  * fold. The total (Σcnt) is the one legitimate 1-row broadcast. */
object Unigram {

  /** Piece vocab with costs: (piece, cnt, cost = −ln(cnt/total)).
    * `total` sums cnt over KEPT pieces only. */
  def pieceVocab(df: DataFrame, textCol: String, maxPieceLen: Int = 4,
      minCount: Int = 3): DataFrame = {
    val inst = df.select(explode(split(lower(col(textCol)), " ")).as("__w"))
      .where(col("__w") =!= "")
    val starts = inst.select(col("__w"),
      posexplode(split(col("__w"), "")).as(Seq("__s", "__c")))
    val pieces = starts.select(col("__w"), col("__s"),
        explode(array((1 to maxPieceLen).map(lit): _*)).as("__l"))
      .where(col("__s") + col("__l") <= length(col("__w")))
      .select(col("__w").substr(col("__s") + 1, col("__l")).as("piece"))
    val pc = pieces.groupBy(col("piece")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount || length(col("piece")) === 1)
      .localCheckpoint(false) // consumers: total + cost rows
    val tot = pc.agg(sum(col("cnt")).as("__tot"))
    pc.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        (-log(col("cnt").cast("double") / col("__tot").cast("double")))
          .as("cost"))
  }

  /** Viterbi-segment every distinct word of the corpus against
    * [[pieceVocab]]'s pieces. Output per distinct word:
    * (word, n_occ, best_cost) — best_cost rounded 6. */
  def viterbiSegment(df: DataFrame, textCol: String, maxPieceLen: Int = 4,
      minCount: Int = 3): DataFrame = {
    val vocab = pieceVocab(df, textCol, maxPieceLen, minCount)
      .select(col("piece"), col("cost"))
    val words = df.select(explode(split(lower(col(textCol)), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n_occ"))
    val cand = words.select(col("word"),
        posexplode(split(col("word"), "")).as(Seq("__s", "__c")))
      .select(col("word"), col("__s"),
        explode(array((1 to maxPieceLen).map(lit): _*)).as("__l"))
      .where(col("__s") + col("__l") <= length(col("word")))
      .select(col("word"), col("__s"),
        col("word").substr(col("__s") + 1, col("__l")).as("piece"))
    // (word, start, end, cost) DP edges — sorted so every edge's start
    // node is final before any edge ENDING there is folded
    val edges = cand.join(vocab, "piece")
      .groupBy(col("word"))
      .agg(sort_array(collect_list(struct(
        (col("__s") + length(col("piece"))).cast("int").as("e"),
        col("__s").cast("int").as("s"),
        col("cost").as("c")))).as("__edges"))
    val inf = lit(Double.MaxValue)
    val init = concat(array(lit(0.0)),
      transform(sequence(lit(1), length(col("word"))), _ => inf))
    val folded = aggregate(col("__edges"), init,
      (best, e) => transform(best, (v, i) =>
        when(i === e.getField("e"),
          least(v, element_at(best, e.getField("s") + 1) + e.getField("c")))
          .otherwise(v)))
    words.join(edges, "word")
      .select(col("word"), col("n_occ"),
        round(element_at(folded, length(col("word")) + 1), 6).as("best_cost"))
  }
}
