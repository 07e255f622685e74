package graft.ops

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions.{date_format, to_date}

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("trailing window includes exactly the last-hour events per entity") {
    val df = Seq(
      (1L, ts(0), 1.0), (1L, ts(1800), 2.0), (1L, ts(3600), 4.0),
      (1L, ts(7201), 8.0), // 3601s after the second event: only sees itself + t=3600
      (2L, ts(0), 100.0)   // other entity, never mixed in
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries.trailing(df, "user_id", "ts", "value",
        windowMicros = 3600L * 1000000L)
      .select($"user_id", $"value", $"n_win", $"sum_win")
      .as[(Long, Double, Long, Double)].collect()
      .map { case (u, v, n, s) => (u, v) -> ((n, s)) }.toMap
    assert(out((1L, 1.0)) == ((1L, 1.0)))
    assert(out((1L, 2.0)) == ((2L, 3.0)))
    // t=3600 is exactly windowMicros after t=0: inclusive lower bound
    assert(out((1L, 4.0)) == ((3L, 7.0)))
    assert(out((1L, 8.0)) == ((1L, 8.0)))
    assert(out((2L, 100.0)) == ((1L, 100.0)))
  }

  test("same-instant events are frame peers (both included in both rows)") {
    val df = Seq((1L, ts(10), 1.0), (1L, ts(10), 2.0))
      .toDF("user_id", "ts", "value")
    val out = TimeSeries.trailing(df, "user_id", "ts", "value", 1000000L)
      .select($"n_win", $"sum_win").as[(Long, Double)].collect()
    assert(out.toSet == Set((2L, 3.0)))
  }

  test("resampleDailyFfill builds a dense per-entity spine and carries sums forward") {
    val day = 86400L
    val df = Seq(
      (1L, ts(0), 2.0), (1L, ts(100), 3.0), // day 0: sum 5
      (1L, ts(3 * day), 7.0),               // day 3; days 1-2 are gaps
      (2L, ts(day), 1.0))                   // single-day entity: 1-row spine
      .toDF("user_id", "ts", "value")
    val out = TimeSeries.resampleDailyFfill(df, "user_id", "ts", "value")
      .select($"user_id", date_format($"day", "yyyy-MM-dd").as("d"),
        $"v_sum", $"v_filled", $"observed")
      .as[(Long, String, Option[Double], Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out.size == 5) // 4 days for entity 1, 1 day for entity 2
    assert(out((1L, "1970-01-01")) == ((Some(5.0), 5.0, true)))
    assert(out((1L, "1970-01-02")) == ((None, 5.0, false)))
    assert(out((1L, "1970-01-03")) == ((None, 5.0, false)))
    assert(out((1L, "1970-01-04")) == ((Some(7.0), 7.0, true)))
    assert(out((2L, "1970-01-02")) == ((Some(1.0), 1.0, true)))
  }

  test("trendPerKey recovers an exact line and degenerates to NULL correctly") {
    val day = 86400L
    val df = Seq(
      // entity 1: y = 2x + 1 over days 0..3 → slope 2, intercept 1
      (1L, ts(0), 1.0), (1L, ts(day), 3.0), (1L, ts(2 * day), 5.0),
      (1L, ts(3 * day), 7.0),
      // entity 2: single point → NULL slope/intercept
      (2L, ts(day), 9.0),
      // entity 3: two points same day → zero x-variance → NULL
      (3L, ts(0), 1.0), (3L, ts(1000), 2.0))
      .toDF("user_id", "ts", "value")
    val out = TimeSeries.trendPerKey(df, "user_id", "ts", "value")
      .select($"user_id", $"n", $"slope", $"intercept")
      .as[(Long, Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((4L, Some(2.0), Some(1.0))))
    assert(out(2L) == ((1L, None, None)))
    assert(out(3L) == ((2L, None, None)))
  }

  test("ewmaFir: constant series is a fixpoint; head renormalizes; FIR matches hand fold") {
    val df = Seq(
      (1L, ts(0), 10L, 5.0), (1L, ts(1), 11L, 5.0), (1L, ts(2), 12L, 5.0),
      (2L, ts(0), 20L, 0.0), (2L, ts(1), 21L, 1.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeries.ewmaFir(df, "user_id", "ts", "event_id", "value",
        alpha = 0.5, taps = 4)
      .select($"event_id", $"ewma").as[(Long, Double)].collect().toMap
    // constant series: weighted average of 5s = 5 at every position
    assert(out(10L) == 5.0 && out(11L) == 5.0 && out(12L) == 5.0)
    // entity 2, second row: (0.5·1 + 0.25·0) / (0.5 + 0.25) = 2/3
    assert(out(21L) == math.round(0.5 / 0.75 * 1e6) / 1e6)
    // first row of each entity: only tap 0 present → the raw value
    assert(out(20L) == 0.0)
  }

  test("ewmaFir same-timestamp rows order by the tiebreak column") {
    val df = Seq(
      (1L, ts(5), 2L, 100.0), (1L, ts(5), 1L, 0.0)) // event 1 precedes event 2
      .toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeries.ewmaFir(df, "user_id", "ts", "event_id", "value",
        alpha = 0.5, taps = 2)
      .select($"event_id", $"ewma").as[(Long, Double)].collect().toMap
    assert(out(1L) == 0.0)
    // event 2 sees event 1 as its lag-1: (0.5·100 + 0.25·0)/0.75
    assert(out(2L) == math.round(50.0 / 0.75 * 1e6) / 1e6)
  }

  test("cusumChangepoint flags the level-shift month") {
    def t(m: Int) = Timestamp.valueOf(f"2024-$m%02d-15 00:00:00")
    // level 10 for 4 months then 50 for 4 months: |CUSUM| peaks at the
    // last low month (month 4)
    val df = ((1 to 4).map(m => (t(m), 10.0)) ++ (5 to 8).map(m => (t(m), 50.0)))
      .toDF("ts", "v")
    val out = TimeSeries.cusumChangepoint(df, "ts", "v")
      .as[(String, Double, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out("2024-04")._4, "peak not at the shift point")
    assert(out.values.count(_._4) == 1)
    // mean 30: cusum at month 4 = 40 - 4·30... = -80
    assert(out("2024-04")._3 == -80.0)
  }

  test("trendStrength: noiseless linear trend scores 1") {
    def t(m: Int) = Timestamp.valueOf(f"2024-$m%02d-15 00:00:00")
    val df = (1 to 6).map(m => (t(m), m * 100.0)).toDF("ts", "v")
    val out = TimeSeries.trendStrength(df, "ts", "v")
      .as[(Long, Double, Double, Double)].head()
    assert(out._1 == 4L)         // 6 months, 4 interior
    assert(out._3 == 0.0)        // MA(3) of a line is the line: resid 0
    assert(out._4 == 1.0)
  }

  test("monthlyMaDecompose: edges have NULL trend, interior trend is the MA(3)") {
    def t(m: Int) = Timestamp.valueOf(f"2024-$m%02d-15 00:00:00")
    val df = Seq(
      (t(1), 30.0), (t(2), 60.0), (t(2), 0.0), (t(3), 90.0), (t(4), 120.0))
      .toDF("ts", "v")
    val out = TimeSeries.monthlyMaDecompose(df, "ts", "v")
      .as[(String, Double, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("2024-01")._3.isEmpty && out("2024-04")._3.isEmpty)
    assert(out("2024-02") == (("2024-02", 60.0, Some(60.0), Some(0.0))))
    assert(out("2024-03") == (("2024-03", 90.0, Some(90.0), Some(0.0))))
  }

  test("acf: alternating daily series has acf(1) = -0.75, acf(2) = 0.5") {
    // days 1..4 with values 1,2,1,2 (one split across two rows: the
    // daily aggregate must sum before deviating): x̄=1.5,
    // e=(-.5,.5,-.5,.5), Σe²=1; lag1 terms -.25·3 → -0.75; lag2 .25·2 → 0.5
    val df = Seq(
      ("2024-01-01", 1.0), ("2024-01-02", 1.5), ("2024-01-02", 0.5),
      ("2024-01-03", 1.0), ("2024-01-04", 2.0)).toDF("d", "v")
      .select(to_date($"d").as("d"), $"v")
    val out = TimeSeries.acf(df, "d", "v", maxLag = 2)
      .as[(Int, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1) == ((3L, -0.75)))
    assert(out(2) == ((2L, 0.5)))
  }

  test("crossCorrelation: Y = X shifted one day later peaks at lag 1") {
    def series(days: Seq[Int], vals: Seq[Double]) =
      days.zip(vals).map { case (d, v) => (f"2024-01-$d%02d", v) }
        .toDF("d", "v").select(to_date($"d").as("d"), $"v")
    val x = series(Seq(1, 2, 3, 4), Seq(1.0, 2.0, 1.0, 2.0))
    val y = series(Seq(2, 3, 4, 5), Seq(1.0, 2.0, 1.0, 2.0)) // X delayed 1d
    val out = TimeSeries.crossCorrelation(x, "d", "v", y, "d", "v", maxLag = 1)
      .as[(Int, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1) == ((4L, 1.0)))    // perfect alignment: X leads by 1
    assert(out(0) == ((3L, -0.75)))  // same-day overlap anti-phase
    assert(out(-1) == ((2L, 0.5)))
  }

  test("theilSen + mannKendall on a hand-computed 4-month series") {
    def d(m: Int) = java.sql.Date.valueOf(f"2024-$m%02d-15")
    val df = Seq((d(1), 1.0), (d(2), 2.0), (d(3), 4.0), (d(4), 8.0))
      .toDF("d", "v")
    // slopes {1, 1.5, 7/3, 2, 3, 4} → median (2 + 7/3)/2 = 13/6
    val ts2 = TimeSeries.theilSen(df, "d", "v")
      .as[(Long, Long, Double)].head()
    assert(ts2 == ((4L, 6L, 2.166667)))
    // strictly increasing → S = 6, tau = 1
    val mk = TimeSeries.mannKendall(df, "d", "v")
      .as[(Long, Long, Double)].head()
    assert(mk == ((4L, 6L, 1.0)))
    // one inversion: 1,3,2 → S = 1, tau = 1/3
    val df2 = Seq((d(1), 1.0), (d(2), 3.0), (d(3), 2.0)).toDF("d", "v")
    assert(TimeSeries.mannKendall(df2, "d", "v")
      .as[(Long, Long, Double)].head() == ((3L, 1L, 0.333333)))
  }

  test("interArrivalKs: gaps 1,2,3 s vs exponential MLE fit") {
    val base = Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = Seq(0L, 1L, 3L, 6L).map(sec =>
      ("a", new Timestamp(base.getTime + sec * 1000)))
    val out = TimeSeries.interArrivalKs(rows.toDF("ty", "ts"), "ty", "ts")
      .as[(String, Long, Double, Double)].head()
    // n=3, Σ=6 s → λ = 0.5/s = 1800/h; sup dev at g=1's lower step:
    // |0 − (1−e^{−0.5})| = 0.393469
    assert(out == (("a", 3L, 1800.0, 0.393469)))
  }

  test("holtLinear: hand-rolled recursion on a 3-month series") {
    val df = Seq(
      ("X", Date.valueOf("2020-01-15"), 4.0), ("X", Date.valueOf("2020-01-20"), 6.0),
      ("X", Date.valueOf("2020-02-15"), 14.0),
      ("X", Date.valueOf("2020-03-15"), 20.0))
      .toDF("k", "d", "v")
    val out = TimeSeries.holtLinear(df, "k", "d", "v",
        alpha = 0.5, beta = 0.5, horizon = 2)
      .as[(String, Long, Double, Double, Double)].head()
    // monthly y = [10, 14, 20]; init l₂=14, b₂=4;
    // t=3: l = .5·20 + .5·18 = 19, b = .5·5 + .5·4 = 4.5 → fc 19+2·4.5
    assert(out == (("X", 3L, 19.0, 4.5, 28.0)))
  }

  test("holtWinters: 13-month hand recursion with seasonal init") {
    // y₁..y₁₂ = 1..12 → l=6.5, sᵢ = i−6.5, b=0; y₁₃=20 hits slot 0:
    // l' = .5(20−(−5.5)) + .5·6.5 = 16, b' = 4.75, next season slot 1 =
    // −4.5 → forecast 16 + 4.75 − 4.5 = 16.25
    val df = (1 to 13).map { m =>
      val ym = 2020 + (m - 1) / 12
      val mm = (m - 1) % 12 + 1
      ("K", Date.valueOf(f"$ym%04d-$mm%02d-15"),
        if (m <= 12) m.toDouble else 20.0)
    }.toDF("k", "d", "v")
    val out = TimeSeries.holtWinters(df, "k", "d", "v")
      .as[(String, Long, Double, Double, Double, Double)].head()
    assert(out == (("K", 13L, 16.0, 4.75, -4.5, 16.25)))
  }

  test("holtWinters: keys with ≤ 12 months are dropped") {
    val df = (1 to 12).map(m => ("S", Date.valueOf(f"2020-$m%02d-01"), 1.0))
      .toDF("k", "d", "v")
    assert(TimeSeries.holtWinters(df, "k", "d", "v").count() == 0)
  }
}
