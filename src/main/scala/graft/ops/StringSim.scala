package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** String-similarity joins beyond the set-overlap family (Dedup.scala):
  * character-level edit distance and weighted (TF-IDF) cosine.
  *
  * The reference's KB matching is containment/regex (SURVEY §2.5); these
  * are the fuzzy-matching staples a customs-entity-resolution or
  * training-data pipeline adds on top: near-identical supplier/importer
  * names that differ by one typo, and weighted-token similarity where
  * raw Jaccard is too coarse.
  *
  * Scale shapes:
  *  - `editPairsD1` is FastSS / symmetric-delete blocking (Boitsov's
  *    deletion neighborhood, public literature): a string of length L
  *    emits L+1 keys (itself + each single-character deletion), and any
  *    pair at edit distance ≤ 1 provably shares a key — substitution at
  *    position p ⇒ both sides' p-deletions coincide; insertion/deletion
  *    ⇒ the longer side's deletion equals the shorter side verbatim.
  *    ONE equi-join on the 60-bit md5 of the variant (strings never
  *    shuffle), candidates deduped per pair, then the exact
  *    `levenshtein` verify. No cross join at any scale; key fan-out is
  *    L+1 per distinct string and bucket population is bounded by the
  *    number of strings within distance 1 of a variant.
  *  - `tfidfCosinePairs` is the sparse-vector similarity join: one
  *    token-keyed equi-join of (token, doc, weight) postings, partial
  *    products combined map-side. The document-frequency cap `maxDf`
  *    is the contract's stopword guard — a token in more than `maxDf`
  *    docs is dropped from the representation BEFORE the join, so the
  *    worst bucket is maxDf², never corpus². Weights are 9-decimal
  *    rounded and summed as DECIMAL so the dot product is exact and
  *    engine-stable regardless of combine order.
  */
object StringSim {

  /** All distinct-value pairs of `strCol` at edit distance ≤ 1
    * (`dist` ∈ {0 is impossible over distinct values, 1}), found by
    * deletion-neighborhood blocking + exact levenshtein verify.
    * Output: (name_a, name_b, dist), name_a < name_b.
    *
    * Pairs are emitted over DISTINCT strings (the standard trick: a
    * value appearing k times must not produce k² identical pairs —
    * join duplicate rows back by string afterwards if row-level pairs
    * are needed). */
  def editPairsD1(df: DataFrame, strCol: String): DataFrame = {
    val names = df.select(col(strCol).as("name")).where(col("name").isNotNull).distinct()
    // name itself (i = length sentinel) + each single-character deletion;
    // 1-based deletion position p: left(p-1) ++ substring from p+1.
    val variants = array_distinct(expr(
      "transform(sequence(0, length(name)), " +
        "i -> IF(i = length(name), name, " +
        "concat(substring(name, 1, i), substring(name, i + 2, length(name)))))"))
    val keyed = names
      .select(col("name"), explode(variants).as("v"))
      .select(col("name"), Dedup.baseHash(col("v")).as("k"))
      .distinct() // a name can reach the same variant twice (e.g. "aa")
    val cand = keyed.as("a").join(keyed.as("b"),
        col("a.k") === col("b.k") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()
    cand
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= 1)
  }

  /** Top-`topN` document pairs by TF-IDF cosine similarity over the
    * df-capped vocabulary. Tokens with document frequency > `maxDf`
    * are excluded from the representation (stopword guard — part of
    * the operator contract, not an approximation of some other
    * result). Weight = round(tf · ln(N/df), 9); dot products and
    * norms are exact DECIMAL sums of those fixed-point weights, so
    * the cosine is bit-stable across engines and partitionings.
    * Output: (id_a, id_b, cos) ordered by cos desc. */
  def tfidfCosinePairs(df: DataFrame, idCol: String, textCol: String,
      maxDf: Long, minCos: Double, topN: Int): DataFrame = {
    val n = df.count()
    val tf = df
      .select(col(idCol).as("id"), explode(split(lower(col(textCol)), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("id"), col("w")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
    // fixed-point weight: exact decimal, so downstream sums commute.
    // DECIMAL(14,9) (weight < 1e5 by tf·ln bound) keeps the pairwise
    // product at DECIMAL(29,18) — inside Spark's 38-precision cap, so
    // the multiply and the sum both stay exact.
    val post = tf.join(dfreq, "w")
      .select(col("w"), col("id"),
        round(col("tf") * log(lit(n.toDouble) / col("df")), 9)
          .cast("decimal(14,9)").as("wt"))
    val norms = post.groupBy(col("id"))
      .agg(sum(col("wt") * col("wt")).as("n2"))
      .select(col("id"), sqrt(col("n2").cast("double")).as("nrm"))
    val dots = post.as("a").join(post.as("b"),
        col("a.w") === col("b.w") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(sum(col("a.wt") * col("b.wt")).as("dot"))
    dots
      .join(norms.select(col("id").as("id_a"), col("nrm").as("nrm_a")), "id_a")
      .join(norms.select(col("id").as("id_b"), col("nrm").as("nrm_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("dot").cast("double") / (col("nrm_a") * col("nrm_b")), 6).as("cos"))
      .where(col("cos") >= minCos)
      .orderBy(col("cos").desc, col("id_a"), col("id_b"))
      .limit(topN)
  }
}
