package graft.ops

import graft.SparkSpec

/** The distributed Knight inversion count must equal the O(n²) pair
  * definition — exactly, including every tie category — on data that
  * exercises cross-partition pairs and tie groups straddling the
  * x-exchange (4 shuffle partitions in the test session, so a 400-row
  * input crosses boundaries everywhere). */
class RankCorrSpec extends SparkSpec {
  import spark.implicits._

  /** O(n²) reference: raw pair counts + the same τ-b arithmetic. */
  private def brute(pts: Seq[(Double, Double)])
      : (Long, BigInt, BigInt, BigInt, BigInt, BigInt, BigInt, Option[Double]) = {
    var c = BigInt(0); var d = BigInt(0)
    var t1 = BigInt(0); var t2 = BigInt(0); var t3 = BigInt(0)
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val (xa, ya) = pts(i); val (xb, yb) = pts(j)
      if (xa == xb && ya == yb) { t1 += 1; t2 += 1; t3 += 1 }
      else if (xa == xb) t1 += 1
      else if (ya == yb) t2 += 1
      else if ((xa < xb) == (ya < yb)) c += 1
      else d += 1
    }
    val n = pts.length.toLong
    val n0 = BigInt(n) * BigInt(n - 1) / 2
    val den = (n0 - t1).toDouble * (n0 - t2).toDouble
    val tau = if (den <= 0.0) None
      else Some(BigDecimal((c - d).toDouble / math.sqrt(den))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    (n, n0, t1, t2, t3, c, d, tau)
  }

  private def run(pts: Seq[(Double, Double)])
      : (Long, BigInt, BigInt, BigInt, BigInt, BigInt, BigInt, Option[Double]) = {
    val r = RankCorr.kendallTauB(pts.toDF("x", "y"), $"x", $"y").collect()(0)
    def b(i: Int) = BigInt(r.getLong(i))
    (r.getLong(0), b(1), b(2), b(3), b(4), b(5), b(6),
      if (r.isNullAt(7)) None else Some(r.getDouble(7)))
  }

  test("kendallTauB == the O(n²) definition on a tie-heavy 400-row set") {
    val pts = (1 to 400).map(i =>
      (((i * 7) % 23).toDouble, ((i * 13) % 19).toDouble))
    assert(run(pts) == brute(pts))
  }

  test("kendallTauB == brute on skewed data (one dominant x value)") {
    // 3/4 of the mass on one x value spreads a single tie group across
    // multiple x-range partitions' WORTH of rows
    val pts = (1 to 300).map { i =>
      val x = if (i % 4 != 0) 5.0 else (i % 11).toDouble
      (x, ((i * 17) % 13).toDouble)
    }
    assert(run(pts) == brute(pts))
  }

  test("perfect / inverted / constant margins pin tau to 1, -1, NULL") {
    val up = (1 to 100).map(i => (i.toDouble, (i * 2).toDouble))
    assert(run(up)._8.contains(1.0))
    val down = (1 to 100).map(i => (i.toDouble, -i.toDouble))
    assert(run(down)._8.contains(-1.0))
    val flat = (1 to 100).map(i => (1.0, i.toDouble))
    assert(run(flat)._8.isEmpty, "constant x margin must yield NULL tau")
  }

  test("mergeInversions counts strict inversions only") {
    assert(RankCorr.mergeInversions(Array(3.0, 1.0, 2.0)) == 2L)
    assert(RankCorr.mergeInversions(Array(2.0, 2.0, 1.0)) == 2L,
      "equal values never invert against each other")
    assert(RankCorr.mergeInversions(Array(1.0, 2.0, 3.0)) == 0L)
    assert(RankCorr.mergeInversions(Array(4.0, 3.0, 2.0, 1.0)) == 6L)
    assert(RankCorr.mergeInversions(Array.empty[Double]) == 0L)
  }
}
