package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("aggregator signature == expression-path signature on one group") {
    val docs = graft.Tables.documents(spark, sfTiny)
    // expression path: distinct shingles of the whole corpus → signature
    val allSh = docs.select(explode(Dedup.shingles($"text", 3)).as("sh"))
    val viaAgg = allSh.select(Dedup.baseHash($"sh").as("h"))
      .agg(Sketches.minhashSig($"h", 16)).as[Seq[Long]].head()
    val viaExpr = allSh.agg(collect_set($"sh").as("s"))
      .select(Dedup.minhashSignature($"s", 16)).as[Seq[Long]].head()
    assert(viaAgg == viaExpr)
  }

  test("mixLong is the JVM twin of the Column mixHash") {
    val hs = Seq(0L, 1L, (1L << 59) + 12345L, 987654321L)
    val viaCol = hs.toDF("h")
      .select(array((0 until 4).map(i => Dedup.mixHash($"h", i)): _*))
      .as[Seq[Long]].collect()
    hs.zip(viaCol).foreach { case (h, row) =>
      (0 until 4).foreach(i => assert(row(i) == Sketches.mixLong(h, i)))
    }
  }

  test("CMS: partition-invariant, overestimate-only, exact without collisions") {
    val d = 4; val w = 64
    // zipf-ish multiset: item i appears (50 - i) times
    val items = (0 until 50).flatMap(i => Seq.fill(50 - i)(s"item_$i"))
    val df = items.toDF("term").withColumn("h", Dedup.baseHash($"term"))
    val sk1 = df.repartition(1).agg(Sketches.cmsSketch($"h", d, w)).as[Seq[Long]].head()
    val sk13 = df.repartition(13).agg(Sketches.cmsSketch($"h", d, w)).as[Seq[Long]].head()
    assert(sk1 == sk13) // merge order cannot matter: elementwise sums
    assert(sk1.sum == items.size.toLong * d) // every item lands in d rows

    val est = df.groupBy($"term", $"h").agg(count(lit(1)).as("freq"))
      .crossJoin(df.agg(Sketches.cmsSketch($"h", d, w).as("cms")))
      .select($"term", $"freq", Sketches.cmsEstimate($"cms", $"h", d, w).as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    est.foreach { case (t, freq, e) => assert(e >= freq, s"underestimate on $t") }
    // 50 items into 64 buckets × 4 rows: at least one item should dodge
    // collisions in some row and estimate exactly
    assert(est.exists { case (_, freq, e) => e == freq })
  }

  test("sigJaccard: identical=1, disjoint≈0, partial in between") {
    val df = Seq((Seq(1L,2L,3L,4L), Seq(1L,2L,3L,4L)),
                 (Seq(1L,2L,3L,4L), Seq(9L,8L,7L,6L)),
                 (Seq(1L,2L,3L,4L), Seq(1L,2L,9L,9L))).toDF("a", "b")
    val got = df.select(Sketches.sigJaccard($"a", $"b")).as[Double].collect()
    assert(got.toSeq == Seq(1.0, 0.0, 0.5))
  }

  test("HLL sketch (approx_count_distinct) lands within 5% of exact at corpus scale") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sfTiny)
    val both = li.agg(
      countDistinct($"l_orderkey").cast("double").as("exact"),
      approx_count_distinct($"l_orderkey", 0.02).cast("double").as("approx"))
      .as[(Double, Double)].head()
    assert(math.abs(both._2 - both._1) / both._1 < 0.05,
      s"exact=${both._1} approx=${both._2}")
  }

  test("rolling HLL: window-merged registers equal the sketch of the unioned keys") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sfTiny)
    // spanning window over ALL days → last day's rolling estimate must
    // equal the single-day sketch of every key collapsed onto one day
    // (HLL union is register-wise max, which is what the window takes)
    val rolled = Sketches.rollingHll(ev, "ts", "user_id", windowDays = 3650)
      .orderBy(desc("day")).select($"est").as[Double].head()
    val collapsed = Sketches.rollingHll(
        ev.withColumn("ts", lit("2024-01-01").cast("timestamp")),
        "ts", "user_id", windowDays = 1)
      .select($"est").as[Double].head()
    assert(rolled == collapsed, s"$rolled vs $collapsed")
  }

  test("rolling HLL estimate (with the caller-side correction) lands near exact") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sfTiny)
    val (zeroRegs, raw) = Sketches.rollingHll(ev, "ts", "user_id", windowDays = 3650)
      .orderBy(desc("day")).select($"zero_regs", $"est")
      .as[(Long, Double)].head()
    val exact = ev.agg(countDistinct($"user_id")).as[Long].head().toDouble
    // the op emits the RAW estimator + zero_regs by contract; apply the
    // documented caller-side linear-counting correction here (ln is fine
    // JVM-side — it is only banned from oracle-gated engine arithmetic)
    val m = 64.0
    val est = if (raw <= 2.5 * m && zeroRegs > 0) m * math.log(m / zeroRegs) else raw
    // m=64 → rsd ≈ 1.04/sqrt(64) ≈ 13 %; allow 3·rsd
    assert(math.abs(est - exact) / exact < 0.4, s"est=$est exact=$exact raw=$raw")
  }

  test("lang consistency flags a stitched bilingual doc, not a pure one") {
    import org.apache.spark.sql.functions._
    import graft.ops.TextStats
    val markers = Map("en" -> Seq("the", "a"), "fr" -> Seq("le", "et"))
    val docs = Seq(
      (1L, "the cat sat on the mat with a hat and the bat"),
      (2L, "the dog saw the cat go le chien et le chat et"),
      (3L, "zz yy xx ww vv uu tt ss rr qq")) // no markers at all → und/und
      .toDF("doc_id", "text")
    val out = docs.select($"doc_id",
        TextStats.langConsistency($"text", markers).as("lc"))
      .select($"doc_id", $"lc.lang_head", $"lc.lang_tail", $"lc.mixed")
      .as[(Long, String, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == (("en", "en", false)))
    assert(out(2L) == (("en", "fr", true)))
    assert(out(3L) == (("und", "und", false)))
  }
}
