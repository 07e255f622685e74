package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Timeout-proof by construction: oracle_sql.json is written BEFORE any
  * query runs, and every completed query immediately appends one flushed
  * JSON line to outDir/progress.jsonl — a mid-run kill leaves the oracle
  * map plus N parseable per-query records (name, ok, rows, sec) on disk,
  * never an empty artifact. Queries run on a small thread pool
  * (SPARK_GRAFT_VERIFY_PAR, default 8): they are independent reads, the
  * shared logreg fit cache is a ConcurrentHashMap.computeIfAbsent, and
  * overlapping driver-side planning with execution is most of the wall
  * saving at sf0.01 where per-query runtime is dominated by fixed cost. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated name-prefix filter for fast local
    // iteration (the driver always calls with two args = full dump)
    val keep: String => Boolean = args.lift(2) match {
      case Some(pfx) => { val ps = pfx.split(","); n => ps.exists(n.startsWith) }
      case None => _ => true
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same rationale as Bench: the 488-query registry thrashes the
      // default 100-entry codegen compile cache
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "10000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    LogHygiene.suppressAccumulatorReleaseNoise()
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

    // oracle map FIRST: a timeout after this point still leaves the
    // driver everything it needs to grade whatever parquet landed.
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    val progress = Paths.get(s"$outDir/progress.jsonl")
    Files.deleteIfExists(progress)
    def record(line: String): Unit = synchronized {
      Files.writeString(progress, line + "\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      System.err.println(s"[verify] $line")
    }

    val par = sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "8").toInt
    val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
    val t0 = System.nanoTime()
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      pool.submit(new Runnable { def run(): Unit = {
        val s0 = System.nanoTime()
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          val rows = spark.read.parquet(s"$outDir/$name").count()
          record(f"""{"name": ${q(name)}, "ok": true, "rows": $rows, "sec": ${(System.nanoTime() - s0) / 1e9}%.3f}""")
        } catch { case e: Throwable =>
          record(f"""{"name": ${q(name)}, "ok": false, "error": ${q(String.valueOf(e.getMessage).take(400))}, "sec": ${(System.nanoTime() - s0) / 1e9}%.3f}""")
        }
      }})
    }
    pool.shutdown()
    pool.awaitTermination(24, java.util.concurrent.TimeUnit.HOURS)
    System.err.println(f"[verify] total ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
