package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TransportSpec extends SparkSpec {
  import spark.implicits._

  test("sinkhornPlan: identical marginals → near-diagonal plan, cost ≈ 0") {
    val df = (Seq.fill(10)(("a", true)) ++ Seq.fill(10)(("a", false)) ++
      Seq.fill(5)(("b", true)) ++ Seq.fill(5)(("b", false)))
      .toDF("cat", "side")
    val out = Transport.sinkhornPlan(df, "cat", col("side"),
        epsilon = 0.1, iters = 30)
      .as[(String, String, Double, Double)].collect()
    val cost = out.head._4
    assert(cost < 0.01) // ε-entropy keeps it slightly above exact 0
    // diagonal cells carry (almost) the marginal mass
    val diag = out.filter(r => r._1 == r._2).map(_._3).sum
    assert(diag > 0.98)
  }

  test("sinkhornPlan: marginal conservation after convergence") {
    val df = (Seq.fill(8)(("a", true)) ++ Seq.fill(2)(("b", true)) ++
      Seq.fill(2)(("a", false)) ++ Seq.fill(8)(("b", false)))
      .toDF("cat", "side")
    val out = Transport.sinkhornPlan(df, "cat", col("side"),
        epsilon = 0.5, iters = 50)
      .as[(String, String, Double, Double)].collect()
    val rowSum = out.groupBy(_._1).map { case (c, rs) => c -> rs.map(_._3).sum }
    val colSum = out.groupBy(_._2).map { case (c, rs) => c -> rs.map(_._3).sum }
    assert(math.abs(rowSum("a") - 0.8) < 1e-3) // side-A marginal
    assert(math.abs(colSum("b") - 0.8) < 1e-3) // side-B marginal
    // mass must MOVE a→b: the off-diagonal a→b cell carries ~0.6
    val ab = out.find(r => r._1 == "a" && r._2 == "b").get._3
    assert(ab > 0.55)
    assert(out.head._4 > 0.5) // cost ≈ moved mass × distance 1
  }
}
