package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class CohortSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("retention anchors offsets on each user's own first event") {
    // u1 first 2024-01-10 (Wed, ISO week of Mon 2024-01-08); active again
    // 6d23h later (same offset-0 week-from-first) and 7d later (offset 1).
    // u2 first the same ISO week; never returns.
    val ev = Seq(
      (1L, ts("2024-01-10 12:00:00")),
      (1L, ts("2024-01-17 11:59:59")), // +6d23h59m59s → offset 0
      (1L, ts("2024-01-17 12:00:00")), // exactly +7d → offset 1
      (2L, ts("2024-01-12 08:00:00"))
    ).toDF("user_id", "ts")
    val r = Cohort.retention(ev, "user_id", "ts")
      .orderBy($"cohort", $"week_offset")
      .select($"cohort", $"week_offset", $"active", $"cohort_size", $"retention")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(r == Seq(
      ("2024-01-08", 0L, 2L, 2L, 1.0),
      ("2024-01-08", 1L, 1L, 2L, 0.5)))
  }

  test("retention separates cohorts by first-event week") {
    val ev = Seq(
      (1L, ts("2024-01-10 12:00:00")),
      (2L, ts("2024-01-16 12:00:00")) // next ISO week → its own cohort
    ).toDF("user_id", "ts")
    val r = Cohort.retention(ev, "user_id", "ts")
      .select($"cohort").as[String].collect().toSet
    assert(r == Set("2024-01-08", "2024-01-15"))
  }

  test("transitions count adjacent pairs per user with tie-break ordering") {
    val ev = Seq(
      // u1: a → b → a  (ties on ts broken by event_id: 2 before 3)
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 00:00:01"), 2L, "b"),
      (1L, ts("2024-01-01 00:00:01"), 3L, "a"),
      // u2: a → b
      (2L, ts("2024-01-01 00:00:00"), 4L, "a"),
      (2L, ts("2024-01-01 00:00:05"), 5L, "b")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = Cohort.transitions(ev, "user_id", "ts", "event_type", "event_id")
      .orderBy($"src", $"dst")
      .select($"src", $"dst", $"n", $"p")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(r == Seq(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("transitions never cross users") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 00:00:01"), 2L, "b")
    ).toDF("user_id", "ts", "event_id", "event_type")
    assert(Cohort.transitions(ev, "user_id", "ts", "event_type", "event_id")
      .count() == 0)
  }

  test("activeChurn: new counts first months, churn counts month-over-month exits") {
    val ev = Seq(
      (1L, ts("2024-01-05 00:00:00")), (1L, ts("2024-02-10 00:00:00")), // stays Jan→Feb, gone Mar
      (2L, ts("2024-01-20 00:00:00")),                                  // churns after Jan
      (3L, ts("2024-02-01 00:00:00")), (3L, ts("2024-03-01 00:00:00")), // new in Feb, stays
      (1L, ts("2024-01-09 00:00:00"))                                   // dup month row: distinct
    ).toDF("e", "ts")
    val out = Cohort.activeChurn(ev, "e", "ts")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("2024-01") == ((2L, 2L, 0L)))
    assert(out("2024-02") == ((2L, 1L, 1L))) // entity 2 churned, 3 is new
    assert(out("2024-03") == ((1L, 0L, 1L))) // entity 1 churned
    assert(out.size == 3) // no phantom month for entity 3's future churn
  }

  test("timeToConvert: anchors on first signup, ignores purchases before it") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "signup"),
      (1L, ts("2024-01-01 00:00:10"), "purchase"),   // 10 s
      (2L, ts("2024-01-02 00:00:00"), "purchase"),   // BEFORE signup: ignored
      (2L, ts("2024-01-03 00:00:00"), "signup"),
      (2L, ts("2024-01-03 00:00:30"), "purchase"),   // 30 s
      (3L, ts("2024-01-04 00:00:00"), "signup")      // never converts
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.timeToConvert(ev, "user_id", "ts", "event_type",
        "signup", "purchase")
      .as[(String, Long, Long, Option[Double], Option[Double])].head()
    assert(out._1 == "2024-01" && out._2 == 3L && out._3 == 2L)
    assert(out._4.contains(20e6)) // median of 10 s / 30 s in micros
  }

  test("kaplanMeier: product-limit steps, S=0 when the last cohort dies") {
    // lifetimes 1,1,2,3 days, censorDays=0 → nobody censors:
    // S(1)=1·(1−2/4)=0.5, S(2)=0.5·(1−1/2)=0.25, S(3): d=n_risk → 0
    def e(u: Long, day: Int) = (u, ts(f"2024-01-${day + 1}%02d 00:00:00"))
    val ev = Seq(e(1, 0), e(1, 1), e(2, 0), e(2, 1), e(3, 0), e(3, 2),
      e(4, 0), e(4, 3)).toDF("u", "ts")
    val out = Cohort.kaplanMeier(ev, "u", "ts", censorDays = 0)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 4L, 2L, 0.5)))
    assert(out(2L) == ((2L, 2L, 1L, 0.25)))
    assert(out(3L) == ((3L, 1L, 1L, 0.0)))
    // censoring: the t=3 user still active → at-risk but no death row
    val c = Cohort.kaplanMeier(ev, "u", "ts", censorDays = 1)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(!c.contains(3L) && c(1L) == ((1L, 4L, 2L, 0.5)))
  }

  test("nelsonAalen: additive hazard + se on the kaplanMeier fixture") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // lifetimes 1,1,2,3, no censoring: increments 2/4, 1/2, 1/1 →
    // H = 0.5, 1.0, 2.0; Var increments 2/16, 1/4, 1/1
    def e(u: Long, day: Int) = (u, ts(f"2024-01-${day + 1}%02d 00:00:00"))
    val ev = Seq(e(1, 0), e(1, 1), e(2, 0), e(2, 1), e(3, 0), e(3, 2),
      e(4, 0), e(4, 3)).toDF("u", "ts")
    val out = Cohort.nelsonAalen(ev, "u", "ts", censorDays = 0)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 4L, 2L, 0.5, r6(math.sqrt(0.125)))))
    assert(out(2L) == ((2L, 2L, 1L, 1.0, r6(math.sqrt(0.375)))))
    assert(out(3L) == ((3L, 1L, 1L, 2.0, r6(math.sqrt(1.375)))))
    // censored last user: at-risk in the denominators, no death row
    val c = Cohort.nelsonAalen(ev, "u", "ts", censorDays = 1)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(!c.contains(3L) && c(1L)._4 == 0.5)
  }

  test("touchAttribution: first vs last-touch credit, 'none' fallback") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:01"), "view", 0.0, 1L),
      (1L, ts("2024-01-01 00:00:02"), "click", 0.0, 2L),
      (1L, ts("2024-01-01 00:00:03"), "purchase", 10.0, 3L),
      (1L, ts("2024-01-01 00:00:04"), "purchase", 5.0, 4L),
      (2L, ts("2024-01-01 00:00:05"), "purchase", 7.0, 5L))
      .toDF("u", "ts", "ty", "v", "id")
    val out = Cohort.touchAttribution(ev, "u", "ts", "ty", "v", "id", "purchase")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out(("first_touch", "view")) == ((2L, 15.0)))
    assert(out(("first_touch", "purchase")) == ((1L, 7.0))) // opening act
    assert(out(("last_touch", "click")) == ((2L, 15.0)))
    assert(out(("last_touch", "none")) == ((1L, 7.0)))
    assert(out.size == 4)
  }

  test("markovStationary: 2-cycle stays uniform; self-loop absorbs to 1") {
    def ev(rows: (Long, String, String, Long)*) =
      rows.map { case (u, t, ty, id) => (u, ts(t), ty, id) }
        .toDF("u", "ts", "ty", "id")
    // a→b→a→b→a: doubly stochastic swap chain → π = (1/2, 1/2) exactly
    val cyc = ev((1L, "2024-01-01 00:00:01", "a", 1L),
      (1L, "2024-01-01 00:00:02", "b", 2L),
      (1L, "2024-01-01 00:00:03", "a", 3L),
      (1L, "2024-01-01 00:00:04", "b", 4L),
      (1L, "2024-01-01 00:00:05", "a", 5L))
    val pi = Cohort.markovStationary(cyc, "u", "ts", "ty", "id")
      .as[(String, Double)].collect().toMap
    assert(pi == Map("a" -> 0.5, "b" -> 0.5))
    // single self-looping state keeps all mass
    val loop = ev((1L, "2024-01-01 00:00:01", "a", 1L),
      (1L, "2024-01-01 00:00:02", "a", 2L),
      (1L, "2024-01-01 00:00:03", "a", 3L))
    val p2 = Cohort.markovStationary(loop, "u", "ts", "ty", "id")
      .as[(String, Double)].collect().toMap
    assert(p2 == Map("a" -> 1.0))
  }

  test("markovRemovalAttribution: hand-solvable 2-channel chain") {
    // u1: view → purchase; u2: click → (exhausts). Full chain converts
    // with p = 0.5 entirely through view → RE(view)=1, RE(click)=0.
    val df = Seq(
      (1L, "2024-01-01 00:00:01", "view", 1L),
      (1L, "2024-01-01 00:00:02", "purchase", 2L),
      (2L, "2024-01-01 00:00:01", "click", 3L))
      .toDF("u", "ts", "ty", "id")
    val out = Cohort.markovRemovalAttribution(df, "u", "ts", "ty", "id",
        convType = "purchase", channels = Seq("view", "click"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("view") == (("view", 1.0, 1.0, 0.5)))
    assert(out("click") == (("click", 0.0, 0.0, 0.5)))
  }

  test("shapleyLattice: factorial weights, signed-pair structure") {
    val lat = Cohort.shapleyLattice(Seq("x", "y"))
    // k=2 → w(1) = w(2) = 0.5; each channel: 2 subsets × 2 signed rows
    assert(lat.length == 8)
    assert(lat.forall(r => math.abs(r._3) == 0.5))
    // the +S and −S∖c rows pair up
    assert(lat.count(_._3 > 0) == 4 && lat.count(_._3 < 0) == 4)
  }

  test("shapleyAttribution: hand-computed φ over a 2-channel lattice") {
    // v({x})=1, v({y})=0, v({x,y})=1, v(∅)=0
    // φ_x = .5·(1−0) + .5·(1−0) = 1;  φ_y = .5·(0−0) + .5·(1−1) = 0
    val df = Seq(
      (1L, "x"), (1L, "purchase"),
      (2L, "y"),
      (3L, "x"), (3L, "y"), (3L, "purchase"))
      .toDF("user_id", "event_type")
    val out = Cohort.shapleyAttribution(df, "user_id", "event_type",
        "purchase", Seq("x", "y"))
      .as[(String, Double)].collect().toMap
    assert(out("x") == 1.0 && out("y") == 0.0)
  }
}
