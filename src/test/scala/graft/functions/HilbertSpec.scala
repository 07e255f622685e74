package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `HilbertKernel` / `Hilbert.hilbertKey` contracts: the order-1 cell
  * walk, bijectivity over a full grid, the defining unit-step adjacency
  * property, and codegen'd-expression == kernel. */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  test("order-1 quadrant walk and bijectivity at order 4") {
    // the canonical first-order curve: (0,0)→0, (0,1)→1, (1,1)→2, (1,0)→3
    assert(HilbertKernel.xy2d(1, 0, 0) === 0L)
    assert(HilbertKernel.xy2d(1, 0, 1) === 1L)
    assert(HilbertKernel.xy2d(1, 1, 1) === 2L)
    assert(HilbertKernel.xy2d(1, 1, 0) === 3L)
    // bijective over the full 16x16 grid
    val ds = for (x <- 0 until 16; y <- 0 until 16)
      yield HilbertKernel.xy2d(4, x, y)
    assert(ds.toSet === (0 until 256).map(_.toLong).toSet)
  }

  test("unit-step adjacency: consecutive d are grid neighbors") {
    // THE Hilbert property (and what Morton lacks): d and d+1 always
    // differ by exactly one grid step
    val byD = (for (x <- 0 until 32; y <- 0 until 32)
      yield HilbertKernel.xy2d(5, x, y) -> ((x, y))).toMap
    for (d <- 0L until 1023L) {
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"jump between d=$d ($x1,$y1) and d+1 ($x2,$y2)")
    }
  }

  test("the codegen'd expression matches the kernel on a real column") {
    val df = graft.Tables.orders(spark, sfTiny)
      .select($"o_custkey", ($"o_orderkey" % 1024).as("k"))
    val got = df.select($"o_custkey", $"k",
        Hilbert.hilbertKey($"o_custkey" % 1024, $"k", order = 10).as("h"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) ===
        HilbertKernel.xy2d(10, r.getLong(0) % 1024, r.getLong(1)))
    }
  }
}
