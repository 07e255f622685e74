package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling", public literature):
  * score every document by the log-likelihood ratio of its hashed
  * n-gram features under a TARGET distribution (the data you want more
  * of — here a predicate over the corpus, e.g. one language or source)
  * versus the RAW corpus distribution, then resample by weight. The
  * classic recipe for "make 100 TB of crawl look like Wikipedia".
  *
  * Feature model: each adjacent lowercase-token bigram hashes into one
  * of `buckets` bins via the corpus-wide 60-bit md5 idiom
  * (`Dedup.baseHash`); bucket unigram counts + add-one smoothing give
  * the two categorical distributions. A document's importance weight is
  * Σ over its bigram occurrences of ln(p_target[b] / p_raw[b]).
  *
  * Determinism: each bucket's log-ratio is computed ONCE in the
  * B-bounded model table, scaled to integer nano-nats
  * (round(ln(·)·1e9) — the q127/q151 9-decimal discipline for
  * engine-dependent ln), and per-document weights are INTEGER sums of
  * those nano-nats — order-independent across engines and partitions;
  * the single final /1e9 division is IEEE-exact.
  *
  * Scale shape: bigram explode is map-only; the model table is
  * `buckets`-bounded (a CONTRACT constant, not data-scaled — the
  * oovRate K-bounded-broadcast discipline), so the fact-side join back
  * is a broadcast and the only fact-scale shuffles are the bucket-count
  * aggregation (partial-combining on the md5-uniform bucket key) and
  * the per-doc weight aggregation. The two-long totals collect is
  * model-sized (the k-means-fit contract). At 100 TB the exploded
  * bigram frame is scanned twice (model pass + weight pass) — persist
  * it if the cluster has the memory; both passes are stateless maps of
  * the input either way. */
object Dsir {

  /** (id, is-target flag, bucket) — one row per bigram occurrence.
    * The token array is MATERIALIZED in its own projection before the
    * generator (the q141 discipline): lambda bodies are exempt from
    * Catalyst CSE, so a transform referencing the split() expression
    * directly re-splits the text per element — O(tokens²) per doc. */
  private[ops] def bigramBuckets(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int): DataFrame = {
    val tk = col("__tk")
    docs
      .withColumn("__t", targetPred)
      .withColumn("__tk", split(lower(col(textCol)), " "))
      .select(col(idCol), col("__t"),
        explode(when(size(tk) >= 2,
          transform(sequence(lit(0), size(tk) - 2),
            i => pmod(Dedup.baseHash(concat_ws(" ", get(tk, i), get(tk, i + 1))),
              lit(buckets.toLong))))
          .otherwise(array().cast("array<long>"))).as("__b"))
  }

  /** (id, n_bigrams, weight): per-document DSIR importance weight in
    * nats. Documents with < 2 tokens carry weight 0.0 (no features —
    * the ratio estimator has nothing to say about them).
    *
    * The bucket model is COLLECTED (`buckets` rows — contract-bounded,
    * not data-scaled) and the nano-nat log-ratios fold back in as an
    * array LITERAL (the IVF-centroid discipline): the weight pass is
    * then a map-only explode + get() with ZERO joins — one model scan +
    * one fact scan total, vs three scans when the model stayed
    * relational (with the materialized token array: q153 3.6 s → 0.95 s,
    * q154 10.6 s → 1.7 s steady-state at sf0.1). Driver arithmetic
    * replicates the engine exactly: Math.log (what Spark's log()
    * evaluates) and `GramFixExpr.roundHalfAway` (spec-pinned equal to
    * SQL round). */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    val b = bigramBuckets(docs, idCol, textCol, targetPred, buckets)
    val model = b.groupBy(col("__b"))
      .agg(count(lit(1)).as("__cr"),
        count(when(col("__t"), lit(1))).as("__ct"))
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2)))
    val nr = model.map(_._2).sum
    val nt = model.map(_._3).sum
    val lr9 = Array.ofDim[Long](buckets) // unseen buckets keep 0 (never referenced)
    model.foreach { case (bk, cr, ct) =>
      val ratio = ((ct + 1).toDouble / (nt + buckets).toDouble) /
        ((cr + 1).toDouble / (nr + buckets).toDouble)
      lr9(bk) = graft.functions.GramFixExpr.roundHalfAway(math.log(ratio) * 1e9)
    }
    val lrLit = array(lr9.map(lit(_)): _*)
    val perDoc = b
      .withColumn("__lr9", get(lrLit, col("__b").cast("int")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__lr9")).as("__w9"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        (coalesce(col("__w9"), lit(0L)).cast("double") / lit(1e9)).as("weight"))
  }

  /** Gumbel-top-k resample over LOG-space weights: key = weight +
    * Gumbel(0,1), take the k largest — equivalent to sampling k items
    * without replacement with probability ∝ exp(weight), without ever
    * exponentiating (exp overflows for corpus-scale log-ratios; the
    * Gumbel trick stays in log space). The Gumbel draw is md5-derived
    * from the id — a pure function of the corpus, reproducible across
    * engines/runs/layouts — strictly interior ((h+0.5)/2^60 ∈ (0,1), so
    * neither ln can hit ±∞) and 9-decimal-rounded (two nested ln are
    * engine-dependent at an ulp; `weight` itself is exact, and the one
    * final add is IEEE-exact).
    *
    * Scale shape: map-only key + TakeOrderedAndProject (per-partition
    * top-k heaps, O(k) driver state — no global sort), the
    * weightedSampleTopK plan. */
  def resampleTopK(weights: DataFrame, idCol: String, weightCol: Column,
      k: Int): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("double") + lit(0.5)) / lit((1L << 60).toDouble)
    weights
      .withColumn("weight", weightCol.cast("double"))
      .withColumn("g_key", col("weight") + round(-log(-log(u)), 9))
      .orderBy(col("g_key").desc, col(idCol).asc)
      .limit(k)
  }
}
