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
  * Scope: ONLY the `DAGScheduler` logger, ONLY messages mentioning
  * "accumulator" — genuine DAGScheduler errors (job failures, stage
  * aborts) still log, and job failures additionally surface as driver
  * exceptions, which Bench/Verify/tests already propagate. Best-effort:
  * any log4j-core API drift degrades to a no-op rather than failing the
  * run. */
object LogHygiene {
  def suppressAccumulatorReleaseNoise(): Unit =
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
        ".*[Aa]ccumulator.*", null, java.lang.Boolean.FALSE,
        Filter.Result.DENY, Filter.Result.NEUTRAL))
      ctx.updateLoggers()
    } catch { case _: Throwable => () }
}
