package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `Layout.zOrderKey` / `zoneMapAudit` contracts: hand-computed Morton
  * interleave, bit-position coverage, and the pruning win the audit is
  * supposed to measure. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zOrderKey: hand-computed interleave and bit positions") {
    // x = 0b101 (5), y = 0b011 (3):
    // z bits: x0→b0=1, y0→b1=1, x1→b2=0, y1→b3=1, x2→b4=1, y2→b5=0
    // → z = 0b011011 = 27
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zOrderKey($"x", $"y", bits = 3).as("z"))
      .as[Long].head()
    assert(got === 27L)
    // x alone fills even bits, y alone fills odd bits
    val xo = Seq((7L, 0L)).toDF("x", "y")
      .select(Layout.zOrderKey($"x", $"y", bits = 3)).as[Long].head()
    assert(xo === 21L) // 0b010101
    val yo = Seq((0L, 7L)).toDF("x", "y")
      .select(Layout.zOrderKey($"x", $"y", bits = 3)).as[Long].head()
    assert(yo === 42L) // 0b101010
    // 31-bit inputs stay positive
    val big = Seq(((1L << 31) - 1, (1L << 31) - 1)).toDF("x", "y")
      .select(Layout.zOrderKey($"x", $"y", bits = 31)).as[Long].head()
    assert(big === (1L << 62) - 1 && big > 0)
  }

  test("zoneMapAudit: z-order prunes a cross-column probe, 1-col sort can't") {
    // grid data: id-ordered rows cycle p fast while k rises slowly —
    // sorting by k alone leaves every file spanning all of p
    val df = (0 until 1024).map(i => (i.toLong, (i % 32).toLong, (i / 32).toLong))
      .toDF("id", "p", "k")
    val out = Layout.zoneMapAudit(df, "id",
        Seq("k_sort" -> $"k", "zorder" -> Layout.zOrderKey($"p", $"k", 6)),
        "p", probeValue = 7L, nBuckets = 16)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val (kf, zf) = (out("k_sort"), out("zorder"))
    assert(kf._1 === 16L && zf._1 === 16L)
    assert(zf._2 < kf._2, s"zorder should overlap fewer files: $out")
    assert(zf._3 < kf._3, s"zorder should shrink per-file spans: $out")
  }
}
