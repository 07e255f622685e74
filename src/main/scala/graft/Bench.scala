package graft

import org.apache.spark.sql.SparkSession

object Bench {
  /** Small fixed subset printed inline in the stdout JSON line so the
    * driver's `queries` schema stays populated without the line growing
    * with the registry (393 queries x ~12 bytes blew past the driver's
    * ~2 KB stdout tail window in round 7 -> parsed:null). One per major
    * family; the full per-query map lives in bench_detail.json. */
  private val headline = Seq(
    "q01", "q25", "q28", "q30", "q36", "q40", "q68", "q103", "q124",
    "q153", "q156", "q360", "q369", "q382")

  def main(args: Array[String]): Unit = {
    val tStart = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Whole-stage-codegen compilation cache: Spark's default (100
      // entries) is sized for a handful of repeated queries; a 488-query
      // registry generates thousands of distinct codegen units, so every
      // pass evicts and Janino-recompiles the lot. Scale-neutral (the
      // cache is per-JVM source-keyed compilation, identical benefit on
      // any cluster executor); env-overridable for A/B.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "10000"))
      .getOrCreate()
    // ERROR, not WARN: cache/checkpoint WARN spam after the JSON line is
    // exactly what pushed round-5's artifact out of the driver's ~2 KB
    // stdout tail window
    spark.sparkContext.setLogLevel("ERROR")
    LogHygiene.suppressAccumulatorReleaseNoise()
    // Optional shard "i/n" (e.g. "0/4"): time only every n-th query by
    // sorted index — lets ad-hoc sweeps at bigger SFs run in bounded
    // chunks. The driver never sets it, so the official artifact always
    // covers the full registry.
    val shard = sys.env.get("SPARK_GRAFT_BENCH_SHARD").flatMap { v =>
      val p = v.split("/")
      scala.util.Try((p(0).trim.toInt, p(1).trim.toInt)).toOption
    }
    // a renamed headline query must fail LOUDLY here, not silently thin
    // the driver-visible `queries` field (jsonLine flatMaps over prefixes)
    val prefixes = SparkEntry.queries.keySet.map(_.takeWhile(_ != '_'))
    require(headline.forall(prefixes.contains),
      s"headline queries missing from registry: " +
        headline.filterNot(prefixes.contains).mkString(", "))
    val all = SparkEntry.queries.toSeq.sortBy(_._1)
    val names = shard match {
      case Some((i, n)) => all.zipWithIndex.collect { case (q, j) if j % n == i => q }
      case None => all
    }
    // Untimed warm pass at the smallest SF: pays JVM/codegen/parquet-footer
    // session overhead without pre-computing any timed work; the cache is
    // cleared so persisted intermediates don't leak into the timed pass.
    val warmDir = "/root/testdata/sf0.001"
    names.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    // Median of n timed passes per query: a single pass is hostage to host
    // load (round-2's driver capture read 46.6s for a 26s suite); medians
    // over 3 passes keep the artifact within ~15% of steady state.
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .getOrElse(3).max(1)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // Kill-robustness measures (round 5's driver capture had NO JSON line —
    // consistent with a timeout kill mid-run; round 7's 420s budget fell
    // below ONE 393-query pass (~480s) and silently degraded 3-pass medians
    // to a single contended pass; round 11's contended host stretched pass 1
    // to 1090s — under the 1500s budget, so pass 2 STARTED and the driver's
    // wall-clock timeout killed it mid-pass, rc=124):
    //  - a wall-clock budget measured from JVM start (warm pass included,
    //    since the driver's timeout clock sees it too);
    //  - PREDICTIVE pass scheduling: pass k+1 starts only if the budget has
    //    room for another pass at the last pass's observed cost (+10%), so a
    //    degraded host degrades the artifact to fewer runs instead of dying;
    //  - an interim JSON line (medians over completed passes) printed after
    //    EVERY pass, plus rolling PARTIAL lines during pass 1 (n_queries
    //    marks the partial coverage) — whenever the driver kills the
    //    process anyway, the stdout tail still holds a parseable line.
    val budgetSec = sys.env.get("SPARK_GRAFT_BENCH_BUDGET")
      .flatMap(v => scala.util.Try(v.trim.toDouble).toOption).getOrElse(1500.0)
    def elapsed(): Double = (System.nanoTime() - tStart) / 1e9
    val samples = scala.collection.mutable.ListBuffer.empty[Map[String, Double]]
    var pass = 0
    var lastPassSec = 0.0
    while (pass < runs &&
        (pass == 0 || elapsed() + lastPassSec * 1.1 < budgetSec)) {
      spark.catalog.clearCache()
      val tp = System.nanoTime()
      val sofar = scala.collection.mutable.ListBuffer.empty[(String, Double)]
      samples += names.zipWithIndex.map { case ((name, fn), j) =>
        val tq = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val sec = (System.nanoTime() - tq) / 1e9
        if (pass == 0) {
          sofar += (name -> sec)
          if ((j + 1) % 60 == 0 && j + 1 < names.size) {
            println(jsonLine(sofar.toSeq, sfDir, 1, partial = true))
            System.out.flush()
          }
        }
        name -> sec
      }.toMap
      lastPassSec = (System.nanoTime() - tp) / 1e9
      pass += 1
      if (pass < runs) {
        val meds = names.map { case (n, _) => n -> median(samples.toSeq.map(_(n))) }
        println(jsonLine(meds, sfDir, samples.size))
        System.out.flush()
      }
    }
    val results = names.map { case (name, _) => name -> median(samples.toSeq.map(_(name))) }
    try {
      val detail = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
      val w = new java.io.PrintWriter("bench_detail.json", "UTF-8")
      try w.println(s"""{"total":${fmt(total)},"n_queries":${results.size},"n_runs":${samples.size},"queries":$detail,"sf":"$sfDir"}""")
      finally w.close()
    } catch { case _: Throwable => () } // detail file is best-effort
    spark.stop()
    // Print the JSON line LAST, after spark.stop(), so no executor/shutdown
    // log noise can interleave after it — the driver parses this line.
    println(jsonLine(results, sfDir, samples.size))
    System.out.flush()
  }

  // Locale.ROOT pins '.' as the decimal separator regardless of host locale.
  private def fmt(v: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, v)

  /** The driver-parsed one-line artifact. The driver stores only the TAIL
    * of stdout and its capture window is ~2 KB: rounds 3/4 overflowed it
    * with full names, and round 7 overflowed it AGAIN at 393 queries even
    * with 3-byte qNN keys (393 x ~12 bytes = 4.7 KB) — summary-first key
    * order doesn't help because the driver keeps the TAIL, so the summary
    * got truncated and the artifact read parsed:null. Fix: the stdout line
    * is SUMMARY-ONLY (~350 bytes — immune to the tail window at any
    * registry size) plus a fixed 14-query headline subset so the `queries`
    * field stays schema-compatible; the full per-query map lives in
    * bench_detail.json. */
  private def jsonLine(results: Seq[(String, Double)], sfDir: String,
      nRuns: Int, partial: Boolean = false): String = {
    val byPrefix = results.map { case (k, v) => k.takeWhile(_ != '_') -> v }.toMap
    val qs = headline.flatMap(p => byPrefix.get(p).map(v => "\"" + p + "\":" + fmt(v)))
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // "partial":true marks an incomplete-coverage rolling line — a
    // consumer parsing the stdout tail can detect a mid-pass total
    // without knowing the registry size (full-coverage lines omit it)
    val p = if (partial) """"partial":true,""" else ""
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$p"n_queries":${results.size},"n_runs":$nRuns,"queries":$qs,"sf":"$sfDir"}"""
  }
}
