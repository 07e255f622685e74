package graft.ops

import scala.math.BigDecimal.RoundingMode.HALF_UP

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bradley–Terry MM must match a driver-side reference that replays the
  * identical arithmetic (double divisions, 9-dp HALF_UP fixed-point
  * sums, Σw = N rescale) — exactly, not approximately. */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  /** reference MM with the op's exact float discipline */
  private def refBt(comparisons: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Long, Double)] = {
    val valid = comparisons.filter { case (w, l) => w != l }
    val wins = valid.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val comps = valid.map { case (w, l) => (math.min(w, l), math.max(w, l)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ids = comps.keys.flatMap(p => Seq(p._1, p._2)).toSeq.distinct.sorted
    def dec9(x: Double) = BigDecimal(x).setScale(9, HALF_UP)
    var s = ids.map(_ -> BigDecimal(1).setScale(9)).toMap
    for (_ <- 1 to iters) {
      val d = ids.map { i =>
        val terms = comps.toSeq.collect {
          case ((a, b), n) if a == i || b == i =>
            dec9(n.toDouble / (s(a) + s(b)).toDouble)
        }
        i -> terms.sum
      }.toMap
      val raw = ids.map(i =>
        i -> wins.getOrElse(i, 0L).toDouble / d(i).toDouble).toMap
      val tot = ids.map(i => dec9(raw(i))).sum
      s = ids.map(i =>
        i -> dec9(raw(i) * ids.size.toDouble / tot.toDouble)).toMap
    }
    ids.map(i => i -> (wins.getOrElse(i, 0L),
      BigDecimal(s(i).toDouble).setScale(6, HALF_UP).toDouble)).toMap
  }

  test("bradleyTerry == the reference MM replay, exactly") {
    // deterministic tournament with skew, ties in win counts, and one
    // entity that never wins
    val cmp = (1 to 300).map { i =>
      val a = (i * 7 % 5).toLong; val b = ((i * 11 + 1) % 5).toLong
      if (a == b) (a, (b + 1) % 5)
      else if ((a * 3 + b + i) % 4 != 0) (math.min(a, b), math.max(a, b))
      else (math.max(a, b), math.min(a, b))
    }
    val got = Preference.bradleyTerry(cmp.toDF("w", "l"), $"w", $"l", iters = 3)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val want = refBt(cmp, iters = 3)
    assert(got == want, s"got $got\nwant $want")
    // rescale pins the strength sum near N
    assert(math.abs(got.values.map(_._2).sum - got.size) < 1e-4)
  }

  /** reference Plackett–Luce MM with the op's exact float discipline */
  private def refPl(rk: Seq[(Long, Long, Double)], iters: Int)
      : Map[Long, (Long, Double)] = {
    def dec9(x: Double) = BigDecimal(x).setScale(9, HALF_UP)
    val groups = rk.groupBy(_._1).map { case (g, rows) =>
      g -> rows.sortBy(r => (r._3, r._2)).map(_._2)
    }.filter(_._2.size >= 2)
    val wins = groups.values.flatMap(_.dropRight(1)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val ids = groups.values.flatten.toSeq.distinct.sorted
    var s = ids.map(_ -> BigDecimal(1).setScale(9)).toMap
    for (_ <- 1 to iters) {
      val d = collection.mutable.Map(ids.map(_ -> BigDecimal(0)): _*)
      groups.values.foreach { items =>
        val m = items.size
        // suf(j) = Σ_{k ≥ j} s (decimal-exact, like the window sum)
        val suf = items.scanRight(BigDecimal(0))((it, acc) => acc + s(it)).init
        var pref = BigDecimal(0)
        for (j <- 0 until m) {
          if (j < m - 1) pref = pref + dec9(1.0 / suf(j).toDouble)
          d(items(j)) += pref
        }
      }
      val raw = ids.map(i =>
        i -> wins.getOrElse(i, 0L).toDouble / d(i).toDouble).toMap
      val tot = ids.map(i => dec9(raw(i))).sum
      s = ids.map(i =>
        i -> dec9(raw(i) * ids.size.toDouble / tot.toDouble)).toMap
    }
    ids.map(i => i -> (wins.getOrElse(i, 0L),
      BigDecimal(s(i).toDouble).setScale(6, HALF_UP).toDouble)).toMap
  }

  test("plackettLuce == the reference MM replay, exactly") {
    // 30 rankings of 2..5 items over a 7-item universe, pos ties inside
    // groups (broken by item id), plus one singleton group that must drop
    val rows = (for {
      g <- 0L until 30L
      sz = (g % 4 + 2).toInt
      j <- 0 until sz
    } yield (g, (g * 3 + j * 5) % 7, ((j * 11 + g) % 3).toDouble)) :+
      ((99L, 6L, 0.0))
    val got = Preference.plackettLuce(rows.toDF("g", "it", "p"),
        $"g", $"it", $"p", iters = 3)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val want = refPl(rows.filter(_._1 != 99L), iters = 3)
    assert(got == want, s"got $got\nwant $want")
    assert(math.abs(got.values.map(_._2).sum - got.size) < 1e-4,
      "rescale pins the strength sum near N")
  }

  test("plackettLuce: an always-first item dominates; an always-last pins to 0") {
    // three rankings, item 1 always first, item 3 always last
    val rows = Seq(
      (10L, 1L, 1.0), (10L, 2L, 2.0), (10L, 3L, 3.0),
      (11L, 1L, 1.0), (11L, 3L, 2.0),
      (12L, 1L, 1.0), (12L, 2L, 2.0), (12L, 3L, 3.0))
    val got = Preference.plackettLuce(rows.toDF("g", "it", "p"),
        $"g", $"it", $"p", iters = 4)
      .orderBy($"id").as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(got.map(_._2) == Seq(3L, 2L, 0L),
      "choice counts: item 2 is chosen at stage 2 of the 3-item rankings")
    assert(got(0)._3 > got(1)._3 && got(1)._3 > got(2)._3,
      s"strengths not ordered by dominance: $got")
    assert(got(2)._3 == 0.0, "never-chosen item must pin to strength 0")
  }

  test("rankAggregation: hand-worked Borda + Copeland with positional ties") {
    // g10: 1>2>3   g11: 1>3   g12: 2>1   g13: {1,2} tied > 3
    // Borda: it1 = 2+1+0+1.5 = 4.5, it2 = 1+1+1.5 = 3.5, it3 = 0
    // Copeland: 1v2 majority tied (1-1) -> ½ each; 1 beats 3 (3-0),
    // 2 beats 3 (2-0) -> it1 = it2 = 1.5, it3 = 0
    val rows = Seq(
      (10L, 1L, 1.0), (10L, 2L, 2.0), (10L, 3L, 3.0),
      (11L, 1L, 1.0), (11L, 3L, 2.0),
      (12L, 2L, 1.0), (12L, 1L, 2.0),
      (13L, 1L, 1.0), (13L, 2L, 1.0), (13L, 3L, 2.0))
    val got = Preference.rankAggregation(rows.toDF("g", "it", "p"),
        $"g", $"it", $"p")
      .orderBy($"id").as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 4.5, 1.5),
      (2L, 3L, 3.5, 1.5),
      (3L, 3L, 0.0, 0.0)), got.toString)
  }

  test("rankAggregation: singleton rankings score 0 and pair with no one") {
    val rows = Seq((1L, 7L, 1.0), (2L, 7L, 1.0), (3L, 8L, 1.0))
    val got = Preference.rankAggregation(rows.toDF("g", "it", "p"),
        $"g", $"it", $"p")
      .orderBy($"id").as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq((7L, 2L, 0.0, 0.0), (8L, 1L, 0.0, 0.0)), got.toString)
  }

  test("a dominant entity ranks above a winless one; self-pairs drop") {
    val cmp = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 3L), (3L, 3L))
    val got = Preference.bradleyTerry(cmp.toDF("w", "l"), $"w", $"l", iters = 4)
      .orderBy($"id").as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(got.map(_._2) == Seq(3L, 1L, 0L), "win counts (self-pair must drop)")
    assert(got(0)._3 > got(1)._3 && got(1)._3 > got(2)._3,
      s"strengths not ordered by dominance: $got")
    assert(got(2)._3 == 0.0, "winless entity must pin to strength 0")
  }
}
