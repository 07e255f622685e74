package graft

/** Targeted suppression of one known-benign ERROR spam source.
  *
  * The checkpoint-release discipline (localCheckpoint a branch point,
  * unpersist its blocks once the consuming action finishes —
  * `Dedup.unpersistCheckpoint`) makes the DAGScheduler log
  * `ERROR DAGScheduler: Failed to update accumulator …` /
  * `attempted to access non-existent accumulator` stack traces when a
  * task-end event from the releasing job reports its SQL metrics after
  * the checkpointed plan's accumulators are already gone. The results
  * are unaffected (the job is complete; only the metric update is
  * dropped), but ~2,000 trace lines per test run bury real errors and
  * sit one log-routing change away from polluting the bench artifact's
  * stdout tail window.
  *
  * Scope: ONLY the `DAGScheduler` logger, ONLY the TWO known release
  * messages (`Failed to update accumulator` / `non-existent
  * accumulator`) — a genuine accumulator-update failure in a LIVE job
  * logs under a different message and still surfaces, as do job
  * failures / stage aborts (which additionally raise driver
  * exceptions, propagated by Bench/Verify/tests). Idempotent: repeated
  * calls in one JVM (TestSession then Bench) install the filter once
  * instead of stacking duplicates. Best-effort: any log4j-core API
  * drift degrades to a no-op rather than failing the run. */
object LogHygiene {
  // anchored to the two benign post-release messages, nothing broader
  private val ReleasePattern =
    ".*(Failed to update accumulator|non-existent accumulator).*"
  @volatile private var installed = false

  def suppressAccumulatorReleaseNoise(): Unit = synchronized {
    if (installed) return
    try {
      import org.apache.logging.log4j.LogManager
      import org.apache.logging.log4j.core.LoggerContext
      import org.apache.logging.log4j.core.Filter
      import org.apache.logging.log4j.core.config.LoggerConfig
      import org.apache.logging.log4j.core.filter.RegexFilter
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      val cfg = ctx.getConfiguration
      val name = "org.apache.spark.scheduler.DAGScheduler"
      val lc = cfg.getLoggerConfig(name) match {
        case own if own.getName == name => own
        case ancestor => // nearest ancestor came back: scope a new config
          // inherit the ancestor's level — this config exists ONLY to
          // host the regex filter, not to change what severity logs
          val own = new LoggerConfig(name, ancestor.getLevel, true)
          cfg.addLogger(name, own)
          own
      }
      lc.addFilter(RegexFilter.createFilter(
        ReleasePattern, null, java.lang.Boolean.FALSE,
        Filter.Result.DENY, Filter.Result.NEUTRAL))
      ctx.updateLoggers()
      installed = true
    } catch { case _: Throwable => () }
  }
}
