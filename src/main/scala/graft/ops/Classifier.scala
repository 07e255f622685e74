package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** On-engine quality-classifier training: logistic regression over
  * hashed-bigram presence features by full-batch gradient descent — the
  * fastText-style linear filter (Joulin et al. 2016) that CCNet-class
  * pipelines (Wenzek et al. 2020) train to score web text against a
  * high-quality target. Shares `Dsir.bigramBuckets`' 64-bucket md5
  * feature hash, so the generative (DSIR) and discriminative selectors
  * score the same feature space.
  *
  * Determinism (the oracle replays every iteration):
  *  - a doc's margin is an ORDERED fold (bucket-ascending, bias last,
  *    seed 0.0) over weight literals — bit-identical across engines;
  *  - the sigmoid is the only engine-dependent step (exp at 1 ulp), so
  *    each doc's gradient contribution is immediately quantized to an
  *    INTEGER nano-unit (round((p − y)·1e9), half-away both engines) and
  *    per-bucket gradients are integer sums — order-independent;
  *  - the weight update replays the same IEEE chain driver-side
  *    (w − rate·(g/1e9)/n, left-associated) that the oracle computes in
  *    SQL.
  *
  * Scale shape: the feature frame (id, y, sorted distinct buckets +
  * bias) builds with ONE distinct-shuffle and persists across
  * iterations; each iteration is one map-only margin/gradient pass +
  * one (buckets+1)-keyed partial-combining aggregation collected as
  * ≤ 65 rows (the k-means-fit contract — model-sized, not data-scaled).
  * Weights fold back in as array LITERALS (the IVF-centroid
  * discipline): zero model-table joins anywhere. */
object Classifier {

  /** Sorted-distinct hashed-bigram features + the bias index appended
    * last: (id, y, feats array<long>). Every doc has ≥ 1 feature (the
    * bias), so featureless short docs still train the intercept. */
  private def featureFrame(docs: DataFrame, idCol: String, textCol: String,
      labelPred: Column, buckets: Int): DataFrame = {
    val bg = Dsir.bigramBuckets(docs, idCol, textCol, labelPred, buckets)
    val feats = bg.groupBy(col(idCol))
      .agg(sort_array(collect_set(col("__b"))).as("__f"))
    docs.select(col(idCol), labelPred.cast("double").as("__y"))
      .join(feats, Seq(idCol), "left")
      .withColumn("__f", concat(
        coalesce(col("__f"), array().cast("array<long>")),
        array(lit(buckets.toLong))))
  }

  /** margin = fold(0.0, w[b] for b in feats ascending) — feats carry the
    * bias index last, so the intercept is the final addend. */
  private def marginCol(w: Array[Double]): Column = {
    val wLit = array(w.map(lit(_)): _*)
    aggregate(transform(col("__f"), b => get(wLit, b.cast("int"))),
      lit(0.0), (a, x) => a + x)
  }

  /** Full-batch GD fit → (bucket, weight), `buckets` feature weights +
    * the bias at index `buckets`. */
  def logregFit(docs: DataFrame, idCol: String, textCol: String,
      labelPred: Column, buckets: Int = 64, iters: Int = 3,
      rate: Double = 0.02): Seq[(Int, Double)] = {
    require(buckets > 0 && iters >= 0, s"bad buckets=$buckets iters=$iters")
    val base = featureFrame(docs, idCol, textCol, labelPred, buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = base.count()
    var w = Array.fill(buckets + 1)(0.0)
    for (_ <- 0 until iters) {
      val g9 = round(((lit(1.0) / (lit(1.0) + exp(-marginCol(w)))) - col("__y"))
        * lit(1e9)).cast("long")
      // one map-only pass + one (buckets+1)-keyed agg → ≤ 65-row collect
      val grads = base.select(g9.as("__g9"), explode(col("__f")).as("__b"))
        .groupBy(col("__b")).agg(sum(col("__g9")).as("__gs"))
        .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
      w = w.zipWithIndex.map { case (wv, b) =>
        wv - rate * (grads.getOrElse(b, 0L).toDouble / 1e9) / n
      }
    }
    base.unpersist()
    w.zipWithIndex.map { case (wv, b) => (b, wv) }.toSeq
  }

  /** Score every doc with a fitted weight vector: (id, margin, p, pred,
    * is_target). `margin` is engine-exact (ordered fold of literals);
    * `p` is the sigmoid rounded to 9 decimals (the ln/exp discipline);
    * `pred` thresholds the ROUNDED p so both engines decide alike. */
  def logregScore(docs: DataFrame, idCol: String, textCol: String,
      labelPred: Column, weights: Seq[(Int, Double)]): DataFrame = {
    val buckets = weights.length - 1
    val w = Array.ofDim[Double](weights.length)
    weights.foreach { case (b, wv) => w(b) = wv }
    val m = marginCol(w)
    featureFrame(docs, idCol, textCol, labelPred, buckets)
      .withColumn("margin", m)
      .withColumn("p", round(lit(1.0) / (lit(1.0) + exp(-col("margin"))), 9))
      .select(col(idCol), col("margin"), col("p"),
        (col("p") >= 0.5).as("pred"), (col("__y") === 1.0).as("is_target"))
  }
}
