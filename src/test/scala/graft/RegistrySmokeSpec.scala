package graft

/** Executes EVERY registry query at the smallest SF — `sbt test` alone
  * then catches a query that throws or plans wrong, without waiting for
  * the external Verify/DuckDB gate. (Hash correctness still comes from
  * the oracle gate; this is the cheap always-on layer under it.) */
class RegistrySmokeSpec extends SparkSpec {

  test("every registry query executes at sf0.001 and every oracle is non-empty SQL") {
    val queries = SparkEntry.queries
    val oracles = SparkEntry.oracleSql
    assert(queries.nonEmpty)
    assert(oracles.keySet == queries.keySet,
      s"queries without oracle: ${queries.keySet -- oracles.keySet}")
    oracles.values.foreach(sql => assert(sql.trim.nonEmpty))
    // Bench keys the stdout JSON by the qNN prefix; a shared prefix would
    // silently drop one timing on parse. Enforce here so `sbt test` catches
    // a colliding name before the driver's bench run does.
    val prefixes = queries.keySet.toSeq.map(_.takeWhile(_ != '_'))
    assert(prefixes.distinct.size == prefixes.size,
      s"duplicate qNN prefixes: ${prefixes.groupBy(identity).collect { case (p, g) if g.size > 1 => p }.mkString(",")}")
    val failures = queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sfTiny).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
