package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts nulls, distincts, typed min/max in one pass") {
    val df = Seq(
      (Some(3), Some("b")), (Some(1), None), (None, Some("a")),
      (Some(3), Some("a"))).toDF("x", "s")
    val p = Profile.profile(df, Seq("x", "s"))
      .orderBy($"column").collect()
    val x = p(1) // 'x' sorts after 's'
    assert(x.getString(0) == "x" && x.getLong(1) == 4 &&
      x.getLong(2) == 1 && x.getLong(3) == 2 &&
      x.getDouble(4) == 1.0 && x.getDouble(5) == 3.0 && x.isNullAt(6))
    val s = p(0)
    assert(s.getString(0) == "s" && s.getLong(2) == 1 &&
      s.getLong(3) == 2 && s.isNullAt(4) &&
      s.getString(6) == "a" && s.getString(7) == "b" &&
      s.getDouble(8) == 1.0)
  }

  test("profile plan shape: stats scan + melt scan, never an Expand") {
    val df = graft.Tables.lineitem(spark, sfTiny)
    val exact = Profile.profile(df,
      Seq("l_orderkey", "l_quantity", "l_returnflag"))
    // two scans (stats + narrow distinct melt), NOT per-column scans
    val scans = exact.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(scans.size == 2)
    // the multi-distinct Expand rewrite (rows × columns blowup) must not
    // appear — the melt replaces it
    val expands = exact.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.ExpandExec => e
    }
    assert(expands.isEmpty, "exact profile must not use the Expand rewrite")
  }

  test("approxDistinct path drops the Expand and stays within HLL error") {
    val df = graft.Tables.lineitem(spark, sfTiny)
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey")
    val exact = Profile.profile(df, cols).orderBy($"column")
      .select($"n_distinct").as[Long].collect()
    val approxPlan = Profile.profile(df, cols, approxDistinct = true)
    val approx = approxPlan.orderBy($"column")
      .select($"n_distinct").as[Long].collect()
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(a - e).toDouble / e < 0.1, s"approx $a vs exact $e")
    }
    val hasExpand = approxPlan.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.ExpandExec => e
    }.nonEmpty
    assert(!hasExpand, "approx profile must not Expand the scan")
  }

  test("audit counts violations per expectation kind") {
    val child = Seq((1, "a"), (1, "a"), (2, null), (3, "zz")).toDF("k", "v")
    val parent = Seq(1, 2).toDF("pk")
    val out = Profile.audit(Seq(
        Profile.Unique("uniq", child, Seq("k")),
        Profile.Complete("complete", child, "v"),
        Profile.SubsetOf("fk", child, "k", parent, "pk"),
        Profile.Satisfies("short", child, length($"v") <= 1)))
      .as[(String, Long, Boolean)].collect()
      .map { case (k, v, p) => k -> ((v, p)) }.toMap
    assert(out("uniq") == ((1L, false)))     // duplicated k=1
    assert(out("complete") == ((1L, false))) // one null v
    assert(out("fk") == ((1L, false)))       // k=3 has no parent
    // null v fails the predicate too (unknown is not a pass): v=null + "zz"
    assert(out("short") == ((2L, false)))
  }

  test("audit passes on clean data") {
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val out = Profile.audit(Seq(
        Profile.Unique("u", df, Seq("k")),
        Profile.Complete("c", df, "v")))
      .as[(String, Long, Boolean)].collect()
    assert(out.forall { case (_, v, p) => v == 0L && p })
  }
}
