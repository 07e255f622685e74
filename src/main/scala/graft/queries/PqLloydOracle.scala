package graft.queries

/** Generated DuckDB oracle for `q155_pq_lloyd` — replays
  * `Similarity.pqLloydCodebook` (per-subspace Lloyd refinement of the
  * product-quantization codebook, Jégou et al. 2011) iteration by
  * iteration as CTEs, the `KmeansOracle` pattern:
  *
  *  - `cb0` = the k lowest-id vectors widened to double (Spark's init);
  *  - per iteration i: `d$i` scores every (vector, subspace, code) with
  *    the IDENTICAL slice-L2 the q112/q114 oracles use, `b$i` takes the
  *    argmin (d2 asc, cid asc — `least` over (d, cid) structs on the
  *    Spark side), `u$i` re-derives each (subspace, code, local-dim)
  *    centroid coordinate as a 2^40 fixed-point mean (integer sums,
  *    order-independent; round half-away == Spark HALF_UP), cast through
  *    REAL exactly as the Float codebook stores it, and `cb$i` rebuilds
  *    the full-dim codebook keeping the previous slice for empty cells;
  *  - the final SELECT re-encodes the corpus with `cb$iters` in the
  *    exploded q112 row shape: (vec_id, s, cid, recon_err).
  */
object PqLloydOracle {

  private val Fx = "1099511627776::DOUBLE" // 2^40

  private def sliceD2(vec: String, cvec: String, subDim: Int): String =
    s"""list_reduce(list_transform(list_zip(
       |    list_slice($vec, t.s*$subDim + 1, t.s*$subDim + $subDim),
       |    list_slice($cvec, t.s*$subDim + 1, t.s*$subDim + $subDim)),
       |  x -> (x[1]::DOUBLE - x[2]::DOUBLE) * (x[1]::DOUBLE - x[2]::DOUBLE)),
       |  (a,b) -> a+b)""".stripMargin

  def sql(k: Int, subspaces: Int, dim: Int, iters: Int): String = {
    val subDim = dim / subspaces
    val init =
      s"""cb0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
         |          list_transform(embedding, v -> CAST(v AS DOUBLE)) AS cvec
         |        FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $k))""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""d$i AS (SELECT e.vec_id, t.s, cb.cid,
         |        ${sliceD2("e.embedding", "cb.cvec", subDim)} AS d2
         |      FROM embeddings e CROSS JOIN range($subspaces) t(s) CROSS JOIN cb${i - 1} cb),
         |b$i AS (SELECT vec_id, s, cid FROM (
         |          SELECT *, row_number() OVER (PARTITION BY vec_id, s
         |            ORDER BY d2 ASC, cid ASC) AS rn FROM d$i) WHERE rn = 1),
         |u$i AS (SELECT b.s, b.cid, t.j AS lj,
         |          CAST(CAST(CAST(sum(CAST(round(e.embedding[b.s*$subDim + t.j + 1]::DOUBLE * $Fx) AS BIGINT)) AS DOUBLE)
         |            / ($Fx) / count(*) AS REAL) AS DOUBLE) AS cd
         |        FROM b$i b JOIN embeddings e USING (vec_id) CROSS JOIN range($subDim) t(j)
         |        GROUP BY 1, 2, 3),
         |cbd$i AS (SELECT p.cid, t.jj,
         |            COALESCE(u.cd, p.cvec[t.jj + 1]) AS v
         |          FROM cb${i - 1} p CROSS JOIN range($dim) t(jj)
         |          LEFT JOIN u$i u ON u.cid = p.cid AND u.s = t.jj // $subDim
         |              AND u.lj = t.jj % $subDim),
         |cb$i AS (SELECT cid, list(v ORDER BY jj) AS cvec FROM cbd$i GROUP BY cid)""".stripMargin
    }
    val fin =
      s"""fd AS (SELECT e.vec_id, t.s, cb.cid,
         |        ${sliceD2("e.embedding", "cb.cvec", subDim)} AS d2
         |      FROM embeddings e CROSS JOIN range($subspaces) t(s) CROSS JOIN cb$iters cb),
         |fb AS (SELECT vec_id, s, cid, d2 FROM (
         |          SELECT *, row_number() OVER (PARTITION BY vec_id, s
         |            ORDER BY d2 ASC, cid ASC) AS rn FROM fd) WHERE rn = 1),
         |fre AS (SELECT vec_id, list_reduce(list(d2 ORDER BY s), (a,b) -> a+b) AS recon_err
         |        FROM fb GROUP BY vec_id)
         |SELECT fb.vec_id, CAST(fb.s AS INTEGER) AS s, fb.cid, fre.recon_err
         |FROM fb JOIN fre USING (vec_id) ORDER BY vec_id, s""".stripMargin
    "WITH " + (Seq(init) ++ steps :+ fin).mkString(",\n")
  }
}
