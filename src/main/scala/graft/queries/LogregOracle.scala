package graft.queries

/** Generated DuckDB oracle for `q156_logreg_fit` / `q157_logreg_score` —
  * replays `Classifier.logregFit` iteration by iteration as CTEs (the
  * KmeansOracle pattern):
  *
  *  - `lf` = sorted-distinct hashed-bigram features per doc (the q153
  *    64-bucket md5 idiom) + a bias row (b = buckets) for EVERY doc;
  *  - `w0` = zeros; per iteration i: `m$i` folds the margin in
  *    bucket-ascending order seeded 0.0 (list_prepend + list_reduce ==
  *    Spark's ordered aggregate() fold), `g$i` quantizes each doc's
  *    sigmoid residual to INTEGER nano-units (the only engine-dependent
  *    step, rounded half-away both engines), `gb$i` integer-sums per
  *    bucket, `w${i+1}` replays the identical left-associated IEEE
  *    update w − rate·(g/1e9)/n;
  *  - fit output: (b, w) rows; score output: per-doc margin (exact),
  *    9-decimal sigmoid, thresholded prediction, true label.
  */
object LogregOracle {

  /** The shared fit chain `ltk`/`lf`/`ln_`/`w0`…`w$iters`, WITHOUT the
    * WITH keyword — shared by the fit gate and the score gate so the
    * replayed training can't drift between them. `label` is a SQL
    * boolean predicate over `documents` columns. */
  def ctes(label: String, buckets: Int, iters: Int, rate: String): String = {
    val init =
      s"""ltk AS (SELECT doc_id, CASE WHEN $label THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS y,
         |          string_split(lower(text), ' ') AS t FROM documents),
         |lbg AS (SELECT DISTINCT doc_id,
         |          (('0x'||substr(md5(t[x+1]||' '||t[x+2]),1,15))::BIGINT % $buckets) AS b
         |        FROM (SELECT doc_id, t, unnest(range(len(t)-1)) AS x
         |              FROM ltk WHERE len(t) >= 2)),
         |lf AS (SELECT doc_id, b FROM lbg
         |       UNION ALL SELECT doc_id, $buckets AS b FROM ltk),
         |ln_ AS (SELECT count(*)::DOUBLE AS nd FROM ltk),
         |w0 AS (SELECT CAST(t.b AS INTEGER) AS b, 0.0::DOUBLE AS w
         |       FROM range(${buckets + 1}) t(b))""".stripMargin
    val steps = (0 until iters).map { i =>
      s"""m$i AS (SELECT f.doc_id,
         |          list_reduce(list_prepend(0.0::DOUBLE, list(w.w ORDER BY w.b)),
         |            (a, c) -> a + c) AS m
         |        FROM lf f JOIN w$i w USING (b) GROUP BY f.doc_id),
         |g$i AS (SELECT m.doc_id,
         |          CAST(round((1.0::DOUBLE / (1.0::DOUBLE + exp(-m.m)) - ltk.y)
         |            * 1000000000::DOUBLE) AS BIGINT) AS g9
         |        FROM m$i m JOIN ltk USING (doc_id)),
         |gb$i AS (SELECT f.b, sum(g.g9)::BIGINT AS gs
         |         FROM lf f JOIN g$i g USING (doc_id) GROUP BY f.b),
         |w${i + 1} AS (SELECT w.b,
         |          w.w - $rate * (COALESCE(gb.gs, 0)::DOUBLE / 1000000000::DOUBLE)
         |            / (SELECT nd FROM ln_) AS w
         |        FROM w$i w LEFT JOIN gb$i gb USING (b))""".stripMargin
    }
    (Seq(init) ++ steps).mkString(",\n")
  }

  def fitSql(label: String, buckets: Int, iters: Int, rate: String): String =
    s"""WITH ${ctes(label, buckets, iters, rate)}
       |SELECT b, w FROM w$iters ORDER BY b""".stripMargin

  def scoreSql(label: String, buckets: Int, iters: Int, rate: String): String =
    s"""WITH ${ctes(label, buckets, iters, rate)},
       |fm AS (SELECT f.doc_id,
       |         list_reduce(list_prepend(0.0::DOUBLE, list(w.w ORDER BY w.b)),
       |           (a, c) -> a + c) AS margin
       |       FROM lf f JOIN w$iters w USING (b) GROUP BY f.doc_id)
       |SELECT ltk.doc_id, fm.margin,
       |  round(1.0::DOUBLE / (1.0::DOUBLE + exp(-fm.margin)), 9) AS p,
       |  round(1.0::DOUBLE / (1.0::DOUBLE + exp(-fm.margin)), 9) >= 0.5::DOUBLE AS pred,
       |  ltk.y = 1.0::DOUBLE AS is_target
       |FROM fm JOIN ltk USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Per-language Brier score oracle: mean 9-dp-fixed (p − y)² over the
    * scored docs, language from the documents table. */
  def brierSql(label: String, buckets: Int, iters: Int, rate: String): String =
    s"""WITH ${ctes(label, buckets, iters, rate)},
       |fm AS (SELECT f.doc_id,
       |         list_reduce(list_prepend(0.0::DOUBLE, list(w.w ORDER BY w.b)),
       |           (a, c) -> a + c) AS margin
       |       FROM lf f JOIN w$iters w USING (b) GROUP BY f.doc_id),
       |sp AS (SELECT ltk.doc_id,
       |         round(1.0::DOUBLE / (1.0::DOUBLE + exp(-fm.margin)), 9) AS p,
       |         ltk.y AS y
       |       FROM fm JOIN ltk USING (doc_id))
       |SELECT d.lang, count(*) AS n,
       |  round(CAST(sum(CAST(round((sp.p - sp.y) * (sp.p - sp.y), 9) AS DECIMAL(12,9))) AS DOUBLE)
       |    / count(*), 6) AS brier
       |FROM sp JOIN documents d USING (doc_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Reliability-diagram oracle: the scored docs binned into ten
    * fixed-width probability bins (p is 9-dp fixed point, so the
    * binning boundary arithmetic is engine-exact). */
  def calibrationSql(label: String, buckets: Int, iters: Int, rate: String): String =
    s"""WITH ${ctes(label, buckets, iters, rate)},
       |fm AS (SELECT f.doc_id,
       |         list_reduce(list_prepend(0.0::DOUBLE, list(w.w ORDER BY w.b)),
       |           (a, c) -> a + c) AS margin
       |       FROM lf f JOIN w$iters w USING (b) GROUP BY f.doc_id),
       |sp AS (SELECT ltk.doc_id,
       |         round(1.0::DOUBLE / (1.0::DOUBLE + exp(-fm.margin)), 9) AS p,
       |         ltk.y = 1.0::DOUBLE AS is_target
       |       FROM fm JOIN ltk USING (doc_id)),
       |bk AS (SELECT CAST(least(CAST(floor(p * 10) AS INTEGER), 9) AS INTEGER) AS bin,
       |         p, is_target FROM sp)
       |SELECT CAST(bin AS INTEGER) AS bin, count(*) AS n,
       |  round(CAST(sum(CAST(p AS DECIMAL(10,9))) AS DOUBLE) / count(*), 6) AS mean_p,
       |  CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |  round(sum(CASE WHEN is_target THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS frac_pos
       |FROM bk GROUP BY 1 ORDER BY 1""".stripMargin

  /** Murphy-decomposition oracle (`Classifier.brierDecomposition` over
    * the replayed classifier): ten fixed-width probability bins →
    * reliability / resolution / uncertainty and the binned-Brier
    * identity, every float op in the same order as the Spark side. */
  def brierDecompSql(label: String, buckets: Int, iters: Int, rate: String): String =
    s"""WITH ${ctes(label, buckets, iters, rate)},
       |fm AS (SELECT f.doc_id,
       |         list_reduce(list_prepend(0.0::DOUBLE, list(w.w ORDER BY w.b)),
       |           (a, c) -> a + c) AS margin
       |       FROM lf f JOIN w$iters w USING (b) GROUP BY f.doc_id),
       |sp AS (SELECT ltk.doc_id,
       |         round(1.0::DOUBLE / (1.0::DOUBLE + exp(-fm.margin)), 9) AS p,
       |         ltk.y = 1.0::DOUBLE AS is_target
       |       FROM fm JOIN ltk USING (doc_id)),
       |bk AS (SELECT CAST(least(CAST(floor(p * 10) AS INTEGER), 9) AS INTEGER) AS b,
       |         CAST(p AS DECIMAL(10,9)) AS p, is_target FROM sp),
       |g AS (SELECT b, count(*) AS n, sum(p) AS sp2,
       |        sum(CASE WHEN is_target THEN 1 ELSE 0 END)::BIGINT AS k
       |      FROM bk GROUP BY 1),
       |t AS (SELECT sum(n)::BIGINT AS nt, sum(k)::BIGINT AS kt FROM g),
       |terms AS (SELECT nt, kt,
       |    CAST(round(CAST(n AS DOUBLE) *
       |      (CAST(sp2 AS DOUBLE) / CAST(n AS DOUBLE) -
       |       CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) *
       |      (CAST(sp2 AS DOUBLE) / CAST(n AS DOUBLE) -
       |       CAST(k AS DOUBLE) / CAST(n AS DOUBLE)), 9) AS DECIMAL(28,9)) AS rel,
       |    CAST(round(CAST(n AS DOUBLE) *
       |      (CAST(k AS DOUBLE) / CAST(n AS DOUBLE) -
       |       CAST(kt AS DOUBLE) / CAST(nt AS DOUBLE)) *
       |      (CAST(k AS DOUBLE) / CAST(n AS DOUBLE) -
       |       CAST(kt AS DOUBLE) / CAST(nt AS DOUBLE)), 9) AS DECIMAL(28,9)) AS res
       |  FROM g CROSS JOIN t),
       |agg AS (SELECT nt, kt, count(*) AS n_bins,
       |    CAST(sum(rel) AS DOUBLE) / CAST(nt AS DOUBLE) AS relr,
       |    CAST(sum(res) AS DOUBLE) / CAST(nt AS DOUBLE) AS resr,
       |    (CAST(kt AS DOUBLE) / CAST(nt AS DOUBLE)) *
       |      (1.0 - CAST(kt AS DOUBLE) / CAST(nt AS DOUBLE)) AS uncr
       |  FROM terms GROUP BY 1, 2)
       |SELECT nt AS n, n_bins, round(relr, 6) AS reliability,
       |  round(resr, 6) AS resolution, round(uncr, 6) AS uncertainty,
       |  round(relr - resr + uncr, 6) AS brier_binned
       |FROM agg""".stripMargin

  /** Isotonic-calibration oracle (`Classifier.isotonicCalibrate` over
    * the replayed classifier): the PAV fit expressed through its
    * min-max identity ŷᵢ = max_{j≤i} min_{k≥i} avg(j..k) over integer
    * bin prefix sums — pool bounds select the same sums the Spark-side
    * PAV divides, so the doubles agree exactly. */
  def isotonicSql(label: String, buckets: Int, iters: Int, rate: String,
      bins: Int): String =
    s"""WITH ${ctes(label, buckets, iters, rate)},
       |fm AS (SELECT f.doc_id,
       |         list_reduce(list_prepend(0.0::DOUBLE, list(w.w ORDER BY w.b)),
       |           (a, c) -> a + c) AS margin
       |       FROM lf f JOIN w$iters w USING (b) GROUP BY f.doc_id),
       |sp AS (SELECT ltk.doc_id,
       |         round(1.0::DOUBLE / (1.0::DOUBLE + exp(-fm.margin)), 9) AS p,
       |         ltk.y = 1.0::DOUBLE AS is_target
       |       FROM fm JOIN ltk USING (doc_id)),
       |ibg AS (SELECT CAST(least(CAST(floor(p * $bins) AS INTEGER),
       |          ${bins - 1}) AS INTEGER) AS bin,
       |        count(*)::BIGINT AS n,
       |        sum(CASE WHEN is_target THEN 1 ELSE 0 END)::BIGINT AS k
       |      FROM sp GROUP BY 1),
       |ibr AS (SELECT bin, n, k, row_number() OVER (ORDER BY bin) AS rn
       |      FROM ibg),
       |ibp AS (SELECT rn, sum(n) OVER (ORDER BY rn)::BIGINT AS pn,
       |        sum(k) OVER (ORDER BY rn)::BIGINT AS pk FROM ibr),
       |ib0 AS (SELECT rn, pn, pk FROM ibp
       |       UNION ALL SELECT 0, 0::BIGINT, 0::BIGINT),
       |iba AS (SELECT lo.rn + 1 AS j, hi.rn AS k2,
       |        CAST(hi.pk - lo.pk AS DOUBLE) / CAST(hi.pn - lo.pn AS DOUBLE) AS av
       |      FROM ib0 lo JOIN ibp hi ON hi.rn > lo.rn),
       |ibm AS (SELECT iba.j, i.rn AS rn, min(av) AS mv
       |      FROM iba JOIN ibr i ON iba.j <= i.rn AND iba.k2 >= i.rn
       |      GROUP BY 1, 2),
       |ibi AS (SELECT rn, max(mv) AS iso FROM ibm GROUP BY 1)
       |SELECT ibr.bin AS bin, ibr.n AS n,
       |  round(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate_raw,
       |  round(iso, 6) AS rate_iso
       |FROM ibr JOIN ibi USING (rn) ORDER BY bin""".stripMargin

  /** McNemar oracle (`Classifier.mcnemar`): classifier A = replayed
    * logreg thresholded at `thr`, classifier B = the SQL predicate
    * `predB` over the joined documents row. */
  def mcnemarSql(label: String, buckets: Int, iters: Int, rate: String,
      thr: String, predB: String): String =
    s"""WITH ${ctes(label, buckets, iters, rate)},
       |fm AS (SELECT f.doc_id,
       |         list_reduce(list_prepend(0.0::DOUBLE, list(w.w ORDER BY w.b)),
       |           (a, c) -> a + c) AS margin
       |       FROM lf f JOIN w$iters w USING (b) GROUP BY f.doc_id),
       |sp AS (SELECT ltk.doc_id,
       |         round(1.0::DOUBLE / (1.0::DOUBLE + exp(-fm.margin)), 9) AS p,
       |         ltk.y = 1.0::DOUBLE AS is_target
       |       FROM fm JOIN ltk USING (doc_id)),
       |jj AS (SELECT (sp.p >= $thr) = sp.is_target AS a,
       |         ($predB) = sp.is_target AS b
       |       FROM sp JOIN documents d ON sp.doc_id = d.doc_id),
       |ag AS (SELECT count(*)::BIGINT AS n,
       |    sum(CASE WHEN a AND b THEN 1 ELSE 0 END)::BIGINT AS both_right,
       |    sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)::BIGINT AS both_wrong,
       |    sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)::BIGINT AS only_a,
       |    sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)::BIGINT AS only_b
       |  FROM jj)
       |SELECT n, both_right, both_wrong, only_a, only_b,
       |  CASE WHEN only_a + only_b > 0 THEN round(
       |    (abs(CAST(only_a AS DOUBLE) - CAST(only_b AS DOUBLE)) - 1.0) *
       |    (abs(CAST(only_a AS DOUBLE) - CAST(only_b AS DOUBLE)) - 1.0) /
       |    (CAST(only_a AS DOUBLE) + CAST(only_b AS DOUBLE)), 6) END AS chi2
       |FROM ag""".stripMargin

  /** Cochran's Q oracle (`Classifier.cochranQ`) for the 3-classifier
    * gate: replayed-logreg threshold + two SQL heuristics. */
  def cochranQSql(label: String, buckets: Int, iters: Int, rate: String,
      thr: String, pred2: String, pred3: String): String =
    s"""WITH ${ctes(label, buckets, iters, rate)},
       |fm AS (SELECT f.doc_id,
       |         list_reduce(list_prepend(0.0::DOUBLE, list(w.w ORDER BY w.b)),
       |           (a, c) -> a + c) AS margin
       |       FROM lf f JOIN w$iters w USING (b) GROUP BY f.doc_id),
       |sp AS (SELECT ltk.doc_id,
       |         round(1.0::DOUBLE / (1.0::DOUBLE + exp(-fm.margin)), 9) AS p,
       |         ltk.y = 1.0::DOUBLE AS is_target
       |       FROM fm JOIN ltk USING (doc_id)),
       |jj AS (SELECT
       |    CASE WHEN (sp.p >= $thr) = sp.is_target THEN 1 ELSE 0 END AS c0,
       |    CASE WHEN ($pred2) = sp.is_target THEN 1 ELSE 0 END AS c1,
       |    CASE WHEN ($pred3) = sp.is_target THEN 1 ELSE 0 END AS c2
       |  FROM sp JOIN documents d ON sp.doc_id = d.doc_id),
       |ag AS (SELECT count(*)::BIGINT AS n_items,
       |    sum(c0 + c1 + c2)::BIGINT AS nn,
       |    sum((c0 + c1 + c2) * (c0 + c1 + c2))::BIGINT AS r2,
       |    sum(c0)::BIGINT AS cc0, sum(c1)::BIGINT AS cc1,
       |    sum(c2)::BIGINT AS cc2
       |  FROM jj)
       |SELECT 3 AS k, n_items,
       |  CASE WHEN 3.0::DOUBLE * CAST(nn AS DOUBLE) - CAST(r2 AS DOUBLE) > 0
       |    THEN round(2.0::DOUBLE * (3.0::DOUBLE *
       |      (CAST(cc0 AS DOUBLE) * CAST(cc0 AS DOUBLE) +
       |       CAST(cc1 AS DOUBLE) * CAST(cc1 AS DOUBLE) +
       |       CAST(cc2 AS DOUBLE) * CAST(cc2 AS DOUBLE)) -
       |      CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)) /
       |      (3.0::DOUBLE * CAST(nn AS DOUBLE) - CAST(r2 AS DOUBLE)), 6)
       |  END AS q, 2 AS df
       |FROM ag""".stripMargin

  /** Group-fairness oracle (`Classifier.fairnessAudit` over the
    * replayed classifier): per `documents.lang`, selection rate, TPR,
    * FPR (NULL on empty denominators) and the max−min selection gap. */
  def fairnessSql(label: String, buckets: Int, iters: Int,
      rate: String): String =
    s"""WITH ${ctes(label, buckets, iters, rate)},
       |fm AS (SELECT f.doc_id,
       |         list_reduce(list_prepend(0.0::DOUBLE, list(w.w ORDER BY w.b)),
       |           (a, c) -> a + c) AS margin
       |       FROM lf f JOIN w$iters w USING (b) GROUP BY f.doc_id),
       |sp AS (SELECT ltk.doc_id,
       |         round(1.0::DOUBLE / (1.0::DOUBLE + exp(-fm.margin)), 9)
       |           >= 0.5::DOUBLE AS p,
       |         ltk.y = 1.0::DOUBLE AS y
       |       FROM fm JOIN ltk USING (doc_id)),
       |j AS (SELECT d.lang AS grp, sp.p, sp.y
       |      FROM sp JOIN documents d USING (doc_id)),
       |g AS (SELECT grp, count(*) AS n,
       |        CAST(sum(CASE WHEN p THEN 1 ELSE 0 END) AS BIGINT) AS np,
       |        CAST(sum(CASE WHEN p AND y THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |        CAST(sum(CASE WHEN p AND NOT y THEN 1 ELSE 0 END) AS BIGINT)
       |          AS fp,
       |        CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pos
       |      FROM j GROUP BY 1),
       |dec AS (SELECT grp, n, CAST(np AS DOUBLE) / CAST(n AS DOUBLE) AS sel,
       |        tp, fp, pos FROM g),
       |mm AS (SELECT max(sel) AS mx, min(sel) AS mn FROM dec)
       |SELECT grp AS lang, n, round(sel, 6) AS sel_rate,
       |  round(CASE WHEN pos > 0
       |    THEN CAST(tp AS DOUBLE) / CAST(pos AS DOUBLE) END, 6) AS tpr,
       |  round(CASE WHEN n - pos > 0
       |    THEN CAST(fp AS DOUBLE) / CAST(n - pos AS DOUBLE) END, 6) AS fpr,
       |  round(mx - mn, 6) AS dp_gap
       |FROM dec CROSS JOIN mm ORDER BY lang""".stripMargin

  /** AIPW oracle (`Classifier.aipwEffect` with per-`documents.lang`
    * stratum outcome rates as m̂₁/m̂₀ and the replayed propensity):
    * per-unit ψ terms 9-dp-decimal summed, exactly as the op. */
  def aipwSql(label: String, buckets: Int, iters: Int, rate: String,
      outcome: String, clipLo: String = "0.05::DOUBLE",
      clipHi: String = "0.95::DOUBLE"): String =
    s"""WITH ${ctes(label, buckets, iters, rate)},
       |fm AS (SELECT f.doc_id,
       |         list_reduce(list_prepend(0.0::DOUBLE, list(w.w ORDER BY w.b)),
       |           (a, c) -> a + c) AS margin
       |       FROM lf f JOIN w$iters w USING (b) GROUP BY f.doc_id),
       |sp AS (SELECT ltk.doc_id,
       |         round(1.0::DOUBLE / (1.0::DOUBLE + exp(-fm.margin)), 9) AS p,
       |         ltk.y AS t
       |       FROM fm JOIN ltk USING (doc_id)),
       |om AS (SELECT d.lang,
       |        CAST(sum(CASE WHEN sp.t = 1.0::DOUBLE AND ($outcome)
       |          THEN 1 ELSE 0 END) AS DOUBLE) /
       |          CAST(sum(CASE WHEN sp.t = 1.0::DOUBLE THEN 1 ELSE 0 END)
       |          AS DOUBLE) AS m1,
       |        CAST(sum(CASE WHEN sp.t = 0.0::DOUBLE AND ($outcome)
       |          THEN 1 ELSE 0 END) AS DOUBLE) /
       |          CAST(sum(CASE WHEN sp.t = 0.0::DOUBLE THEN 1 ELSE 0 END)
       |          AS DOUBLE) AS m0
       |      FROM sp JOIN documents d USING (doc_id) GROUP BY 1),
       |u AS (SELECT sp.t,
       |        least(greatest(sp.p, $clipLo), $clipHi) AS pc,
       |        CASE WHEN $outcome THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS yv,
       |        om.m1, om.m0
       |      FROM sp JOIN documents d USING (doc_id)
       |      JOIN om ON om.lang = d.lang),
       |ps AS (SELECT
       |        CAST(round((m1 - m0) + t * (yv - m1) / pc -
       |          (1.0::DOUBLE - t) * (yv - m0) / (1.0::DOUBLE - pc), 9)
       |          AS DECIMAL(28,9)) AS psi,
       |        CAST(round(m1 - m0, 9) AS DECIMAL(28,9)) AS dm
       |      FROM u)
       |SELECT count(*) AS n,
       |  round(CAST(sum(dm) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
       |    AS ate_outcome_model,
       |  round(CAST(sum(psi) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
       |    AS ate_aipw
       |FROM ps""".stripMargin

  /** Positivity/overlap oracle (`Classifier.propensityOverlap`): per
    * arm, propensity range + share inside the [0.1, 0.9] band. */
  def overlapSql(label: String, buckets: Int, iters: Int,
      rate: String): String =
    s"""WITH ${ctes(label, buckets, iters, rate)},
       |fm AS (SELECT f.doc_id,
       |         list_reduce(list_prepend(0.0::DOUBLE, list(w.w ORDER BY w.b)),
       |           (a, c) -> a + c) AS margin
       |       FROM lf f JOIN w$iters w USING (b) GROUP BY f.doc_id),
       |sp AS (SELECT ltk.doc_id,
       |         round(1.0::DOUBLE / (1.0::DOUBLE + exp(-fm.margin)), 9) AS p,
       |         ltk.y = 1.0::DOUBLE AS t
       |       FROM fm JOIN ltk USING (doc_id))
       |SELECT t AS treated, count(*) AS n,
       |  round(min(p), 6) AS p_min, round(max(p), 6) AS p_max,
       |  round(CAST(sum(CASE WHEN p >= 0.1 AND p <= 0.9 THEN 1 ELSE 0 END)
       |    AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS overlap_share
       |FROM sp GROUP BY 1 ORDER BY 1""".stripMargin

  /** Expected-calibration-error oracle: the calibration bins rolled up
    * to Σ (n_b/n)·|acc_b − conf_b| with 9-dp decimal term sums. */
  def eceSql(label: String, buckets: Int, iters: Int,
      rate: String): String =
    s"""WITH ${ctes(label, buckets, iters, rate)},
       |fm AS (SELECT f.doc_id,
       |         list_reduce(list_prepend(0.0::DOUBLE, list(w.w ORDER BY w.b)),
       |           (a, c) -> a + c) AS margin
       |       FROM lf f JOIN w$iters w USING (b) GROUP BY f.doc_id),
       |sp AS (SELECT ltk.doc_id,
       |         round(1.0::DOUBLE / (1.0::DOUBLE + exp(-fm.margin)), 9) AS p,
       |         ltk.y = 1.0::DOUBLE AS is_target
       |       FROM fm JOIN ltk USING (doc_id)),
       |bk AS (SELECT least(CAST(floor(p * 10) AS INTEGER), 9) AS b,
       |         count(*) AS n, sum(CAST(p AS DECIMAL(10,9))) AS spp,
       |         CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT)
       |           AS k
       |       FROM sp GROUP BY 1),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM bk),
       |tm AS (SELECT t.nt,
       |         CAST(round((CAST(n AS DOUBLE) / CAST(nt AS DOUBLE)) *
       |           abs(CAST(k AS DOUBLE) / CAST(n AS DOUBLE) -
       |               CAST(spp AS DOUBLE) / CAST(n AS DOUBLE)), 9)
       |           AS DECIMAL(18,9)) AS term
       |       FROM bk CROSS JOIN t)
       |SELECT nt AS n, count(*) AS n_bins,
       |  round(CAST(sum(term) AS DOUBLE), 6) AS ece
       |FROM tm GROUP BY 1""".stripMargin

  /** IPW ATE oracle (`Classifier.ipwEffect` over the replayed
    * propensity): label doubles as the TREATMENT indicator; `outcome`
    * is a SQL boolean over `documents` columns. Weight terms round to
    * 9 dp and sum as DECIMAL exactly like the Spark op. */
  def ipwSql(label: String, buckets: Int, iters: Int, rate: String,
      outcome: String, clipLo: String = "0.05::DOUBLE",
      clipHi: String = "0.95::DOUBLE"): String =
    s"""WITH ${ctes(label, buckets, iters, rate)},
       |fm AS (SELECT f.doc_id,
       |         list_reduce(list_prepend(0.0::DOUBLE, list(w.w ORDER BY w.b)),
       |           (a, c) -> a + c) AS margin
       |       FROM lf f JOIN w$iters w USING (b) GROUP BY f.doc_id),
       |sp AS (SELECT ltk.doc_id,
       |         round(1.0::DOUBLE / (1.0::DOUBLE + exp(-fm.margin)), 9) AS p,
       |         ltk.y AS t
       |       FROM fm JOIN ltk USING (doc_id)),
       |iw AS (SELECT sp.t,
       |         least(greatest(sp.p, $clipLo), $clipHi) AS pc,
       |         CASE WHEN $outcome THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS yv
       |       FROM sp JOIN documents d USING (doc_id)),
       |ag AS (SELECT count(*) AS n,
       |         CAST(sum(CASE WHEN t = 1.0::DOUBLE THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_treat,
       |         sum(CAST(round(t / pc * yv, 9) AS DECIMAL(28,9))) AS sy1,
       |         sum(CAST(round(t / pc, 9) AS DECIMAL(28,9))) AS sw1,
       |         sum(CAST(round((1.0::DOUBLE - t) / (1.0::DOUBLE - pc) * yv, 9)
       |           AS DECIMAL(28,9))) AS sy0,
       |         sum(CAST(round((1.0::DOUBLE - t) / (1.0::DOUBLE - pc), 9)
       |           AS DECIMAL(28,9))) AS sw0
       |       FROM iw)
       |SELECT n, n_treat,
       |  round(CAST(sy1 AS DOUBLE) / CAST(sw1 AS DOUBLE), 6) AS mean_y_treat,
       |  round(CAST(sy0 AS DOUBLE) / CAST(sw0 AS DOUBLE), 6) AS mean_y_ctrl,
       |  round(CAST(sy1 AS DOUBLE) / CAST(sw1 AS DOUBLE) -
       |        CAST(sy0 AS DOUBLE) / CAST(sw0 AS DOUBLE), 6) AS ate
       |FROM ag""".stripMargin
}
