package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entropic-regularised optimal transport via Sinkhorn–Knopp scaling
  * (Cuturi 2013, public literature): the drift metric that, unlike
  * KL/JS/chi² (q127/q137/q294), charges by how FAR mass moved across an
  * ordered category axis, and unlike the exact 1-D EMD (q271) also
  * produces the transport PLAN — which categories drained into which.
  *
  * Determinism contract (what makes it oracle-checkable): the kernel
  * K_ij = exp(−|i−j|/ε) is quantised to 9 dp at construction — exp is
  * the one libm call whose last ulp differs across engines; after that
  * every Sinkhorn update is plain IEEE ×,/,+ folded in ASCENDING index
  * order from 0.0 (foldLeft here, list_reduce(list_prepend(0.0, …)) in
  * the oracle), so u, v, the plan and the cost are bit-identical
  * everywhere.
  *
  * Scale shape: the two marginal histograms are ONE (side, category)
  * partial-combining count over the fact; the k×k Sinkhorn runs on the
  * DRIVER over category-sized vectors (the markovStationary /
  * PCA-eigen driver-math contract — k is a category-cardinality bound,
  * never data-scaled). Output: k² plan cells + the OT cost repeated. */
object Transport {

  /** Sinkhorn plan between the category distributions of side A
    * (`isA` true) and side B. Categories order by their string sort;
    * ground cost = |rank_i − rank_j|. Output:
    * (cat_a, cat_b, mass, ot_cost) — mass/cost rounded 6. */
  def sinkhornPlan(df: DataFrame, catCol: String, isA: Column,
      epsilon: Double = 1.0, iters: Int = 10): DataFrame = {
    require(epsilon > 0 && iters >= 1, "bad epsilon/iters")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.groupBy(col(catCol).cast("string").as("__c"),
        isA.as("__a"))
      .agg(count(lit(1)).as("__n"))
      .collect() // category-sized by contract
      .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
    // fail fast instead of 0/0 -> all-NaN marginals when a side is empty
    require(counts.exists(_._2) && counts.exists(!_._2),
      "sinkhornPlan needs rows on BOTH sides of isA")
    val cats = counts.map(_._1).distinct.sorted
    val k = cats.length
    val idx = cats.zipWithIndex.toMap
    def marginal(side: Boolean): Array[Double] = {
      val m = Array.fill(k)(0L)
      counts.filter(_._2 == side).foreach { case (c, _, n) => m(idx(c)) = n }
      val tot = m.sum.toDouble
      m.map(_ / tot)
    }
    val a = marginal(true)
    val b = marginal(false)
    // 9-dp-quantised kernel — the determinism contract
    def q9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val km = Array.tabulate(k, k)((i, j) =>
      q9(math.exp(-math.abs(i - j) / epsilon)))
    var u = Array.fill(k)(1.0)
    var v = Array.fill(k)(1.0)
    (1 to iters).foreach { _ =>
      u = Array.tabulate(k)(i =>
        a(i) / (0 until k).foldLeft(0.0)((s, j) => s + km(i)(j) * v(j)))
      v = Array.tabulate(k)(j =>
        b(j) / (0 until k).foldLeft(0.0)((s, i) => s + km(i)(j) * u(i)))
    }
    val plan = for (i <- 0 until k; j <- 0 until k)
      yield (cats(i), cats(j), u(i) * km(i)(j) * v(j), math.abs(i - j))
    val cost = plan.foldLeft(0.0) { case (s, (_, _, m, c)) => s + m * c }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    plan.map { case (ca, cb, m, _) => (ca, cb, r6(m), r6(cost)) }
      .toDF("cat_a", "cat_b", "mass", "ot_cost")
  }
}
