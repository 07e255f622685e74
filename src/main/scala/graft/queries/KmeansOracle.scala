package graft.queries

/** Generated DuckDB oracle for `q89_kmeans_fit` — replays
  * `Similarity.kmeansCentroids` (reference notebook's KB-free clustering
  * has no counterpart; this fit exists for the IVF family, SURVEY.md §2
  * similarity-search line) iteration by iteration as CTEs, the same way
  * `Q40Oracle` assembles the 13-stage pipeline:
  *
  *  - `c0` = the k lowest-id vectors widened to double (Spark's init);
  *  - per iteration i: `s_i` scores every (vector, centroid) pair with the
  *    IDENTICAL left-to-right cosine q39/q71 already gate, `a_i` takes
  *    argmax (sim desc, cell asc), `u_i` re-derives per-dimension means
  *    over 2^40 fixed-point integer sums (the q80 construction — exact
  *    exponent shift, order-independent integer adds, round half-away
  *    matching Spark's HALF_UP on positives and negatives alike), `c_i`
  *    casts through REAL (float) exactly as Spark stores centroids, and
  *    keeps the previous centroid for empty cells;
  *  - the final SELECT emits every centroid dimension re-quantized to
  *    2^40 fixed-point plus the final assignment counts.
  */
object KmeansOracle {

  private def cos(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a, $b), x -> x[1]::DOUBLE * x[2]::DOUBLE), (p,q) -> p+q) /
       |  (sqrt(list_reduce(list_transform($a, v -> v::DOUBLE * v::DOUBLE), (p,q) -> p+q)) *
       |   sqrt(list_reduce(list_transform($b, v -> v::DOUBLE * v::DOUBLE), (p,q) -> p+q)))""".stripMargin

  private val Fx = "1099511627776::DOUBLE" // 2^40

  def sql(k: Int, iters: Int, dim: Int): String = {
    val fin =
      s"""sz AS (SELECT cell, count(*) AS n FROM afin GROUP BY cell),
         |fdim AS (SELECT c.cell, CAST(t.i AS INTEGER) AS pos,
         |    CAST(round(c.cvec[t.i + 1] * $Fx) AS BIGINT) AS cq
         |  FROM c$iters c CROSS JOIN range($dim) t(i))
         |SELECT fdim.cell, fdim.pos, fdim.cq, CAST(COALESCE(sz.n, 0) AS BIGINT) AS n_assigned
         |FROM fdim LEFT JOIN sz USING (cell)
         |ORDER BY cell, pos""".stripMargin
    (Seq("WITH " + ctes(k, iters, dim)) :+ fin).mkString(",\n")
  }

  /** The fit + FINAL ASSIGNMENT chain (`c0`…`c<iters>`, `sfin`, `afin`
    * with (vec_id, cell)), comma-joined without the WITH keyword — shared
    * by the q89 fit audit and every oracle that consumes the fitted cells
    * (q105 semantic dedup), so the replayed fit can't drift between them. */
  def ctes(k: Int, iters: Int, dim: Int): String = {
    val init =
      s"""c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell,
         |  list_transform(embedding, v -> CAST(v AS DOUBLE)) AS cvec
         |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $k))""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""s$i AS (SELECT e.vec_id, e.embedding, c.cell, ${cos("e.embedding", "c.cvec")} AS csim
         |  FROM embeddings e CROSS JOIN c${i - 1} c),
         |a$i AS (SELECT vec_id, embedding, cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn
         |    FROM s$i) WHERE rn = 1),
         |u$i AS (SELECT cell, CAST(t.i AS INTEGER) AS pos,
         |    CAST(sum(CAST(round(embedding[t.i + 1]::DOUBLE * $Fx) AS BIGINT)) AS DOUBLE)
         |      / ($Fx) / count(*) AS cd
         |  FROM a$i CROSS JOIN range($dim) t(i) GROUP BY 1, 2),
         |c$i AS (SELECT p.cell, COALESCE(u.cvec, p.cvec) AS cvec FROM c${i - 1} p
         |  LEFT JOIN (SELECT cell, list(CAST(CAST(cd AS REAL) AS DOUBLE) ORDER BY pos) AS cvec
         |             FROM u$i GROUP BY cell) u USING (cell))""".stripMargin
    }
    val assign =
      s"""sfin AS (SELECT e.vec_id, c.cell, ${cos("e.embedding", "c.cvec")} AS csim
         |  FROM embeddings e CROSS JOIN c$iters c),
         |afin AS (SELECT vec_id, cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn
         |    FROM sfin) WHERE rn = 1)""".stripMargin
    (Seq(init) ++ steps :+ assign).mkString(",\n")
  }
}
