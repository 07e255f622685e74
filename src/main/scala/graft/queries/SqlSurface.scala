package graft.queries

/** SQL-TEXT queries that run VERBATIM on both Spark SQL and DuckDB —
  * the q430 gate feeds the same string to `spark.sql(...)` and to the
  * oracle, so any dialect drift (window frames, decimal promotion,
  * cast semantics) fails the hash gate instead of hiding behind two
  * hand-kept variants. Portability rules baked in: money through
  * `CAST(sum(CAST(… AS DECIMAL(18,6))) AS DOUBLE)` (the q01
  * discipline), `row_number` cast to BIGINT (Spark yields INT, DuckDB
  * BIGINT), every ORDER BY total. */
object SqlSurface {

  /** Top-3 orders by discounted revenue per market segment:
    * CTE → aggregate → two joins → ranking window → filter. */
  val topRevenuePerSegment: String =
    """WITH rev AS (
      |  SELECT l_orderkey,
      |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
      |      AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |  FROM lineitem GROUP BY l_orderkey),
      |j AS (
      |  SELECT c.c_mktsegment, o.o_orderkey, r.revenue
      |  FROM rev r JOIN orders o ON o.o_orderkey = r.l_orderkey
      |  JOIN customer c ON c.c_custkey = o.o_custkey),
      |rk AS (
      |  SELECT c_mktsegment, o_orderkey, revenue,
      |    CAST(row_number() OVER (PARTITION BY c_mktsegment
      |      ORDER BY revenue DESC, o_orderkey) AS BIGINT) AS rn
      |  FROM j)
      |SELECT c_mktsegment, o_orderkey, revenue, rn
      |FROM rk WHERE rn <= 3
      |ORDER BY c_mktsegment, rn""".stripMargin
}
