package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Dedup.seededHash

/** Embedding similarity search over an `Array[Float]` column.
  *
  * Brute-force cosine top-k is the correctness baseline (a single
  * map + TakeOrdered — no shuffle, no global sort); the sign-random-
  * projection LSH bucketing is the scale path: candidates come from one
  * hash bucket, so the per-query cost drops from O(N·d) to
  * O(N/2^planes·d) at the cost of recall.
  *
  * All arithmetic is elementwise double (float widened exactly) with
  * left-to-right folds, so results are bit-identical across engines.
  */
object Similarity {

  /** Σ a[i]·b[i] as a sequential left-to-right double fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))

  /** cosine = dot / (sqrt(|a|²) * sqrt(|b|²)) — primitive-loop Catalyst
    * expression (graft.functions.VectorOps), bit-identical to the
    * declarative `cosineLambda` formulation but ~10× faster on float
    * vectors (no per-element boxing). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorOps.cosineSim(a, b)

  /** The declarative formulation (kept for the equivalence spec). */
  def cosineLambda(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Brute-force top-k by cosine against one query vector (as a 1-row
    * DataFrame with column `qvec`). Deterministic: sim desc, then id. */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, k: Int): DataFrame =
    emb.crossJoin(broadcast(query))
      .withColumn("sim", cosine(col(vecCol), col("qvec")))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("sim"))

  /** Deterministic pseudo-random hyperplane weight for (plane j, dim i):
    * integer in [-500, 500] derived from md5 — reproducible in any engine. */
  def planeWeight(j: Int, i: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j,$i".getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16) % 1001 - 500
  }

  /** Sign-LSH bucket id from `planes` fixed hyperplanes over a `dim`-dim
    * vector: bit j = (Σ_i v[i]·w[j][i] > 0). Pure per-row expression.
    * Each projection is ONE loop expression (VectorOps.dotLiteral), not an
    * unrolled O(dim) node tree — the unrolled form made Catalyst re-analyze
    * a 384-node plan on every execution, costing more than the data pass. */
  def lshBucket(vec: Column, dim: Int, planes: Int): Column = {
    require(planes >= 1, s"lshBucket needs >= 1 plane, got $planes")
    (0 until planes).map { j =>
      val w = Array.tabulate(dim)(i => planeWeight(j, i).toDouble)
      val proj = graft.functions.VectorOps.dotLiteral(vec, w)
      when(proj > 0, shiftleft(lit(1), j)).otherwise(0)
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Per-vector nearest neighbor within its LSH bucket (the all-pairs ANN
    * / embedding-near-dup building block): instead of the quadratic
    * all-pairs product, vectors are compared only to their bucket-mates —
    * the self-join shuffles on the bucket id, so the pair count drops to
    * Σ bucket² ≈ N²/2^planes. Returns (id, nn_id, sim), sim desc ties by
    * nn_id. */
  def nearestInBucket(emb: DataFrame, idCol: String, vecCol: String,
      dim: Int, planes: Int): DataFrame =
    bucketArgMax(emb, idCol, vecCol, dim, planes, labelCol = None)
      .select(col(idCol), col("__best.nn").as("nn_id"), col("__best.sim").as("sim"))

  /** The ONE bucketed arg-max body behind `nearestInBucket` (q37) and
    * `hardNegatives` (q99), so the bucketing convention and the
    * (sim desc, id asc) tie-break can't drift between them.
    * Arg-max aggregation, not a window: partial (map-side) max per group
    * means the shuffle carries ONE candidate per (id, partition) instead
    * of sorting every pair group — the scalable per-group top-1 shape.
    * With `labelCol` set, only cross-label pairs are scored (the
    * predicate runs BEFORE any cosine) and the struct carries the
    * neighbor's label out. */
  private def bucketArgMax(emb: DataFrame, idCol: String, vecCol: String,
      dim: Int, planes: Int, labelCol: Option[String]): DataFrame = {
    val b = emb.withColumn("__bucket", lshBucket(col(vecCol), dim, planes))
    val l = b.select(Seq(col(idCol).as("__id"), col(vecCol).as("__va"), col("__bucket")) ++
      labelCol.map(c => col(c).as("__la")): _*)
    val r = b.select(Seq(col(idCol).as("__nn"), col(vecCol).as("__vb"), col("__bucket")) ++
      labelCol.map(c => col(c).as("__lb")): _*)
    val pairs = l.join(r, Seq("__bucket")).filter(col("__id") =!= col("__nn"))
    val eligible = labelCol.fold(pairs)(_ => pairs.filter(col("__la") =!= col("__lb")))
    val best = Seq(col("sim"), (-col("__nn")).as("negnn"), col("__nn").as("nn")) ++
      labelCol.map(_ => col("__lb").as("nl"))
    eligible.withColumn("sim", cosine(col("__va"), col("__vb")))
      .groupBy(col("__id").as(idCol))
      .agg(max(struct(best: _*)).as("__best"))
  }

  /** Hard-negative mining for contrastive/embedding training: each
    * vector's most-similar neighbor with a DIFFERENT label — the
    * confusable example a trainer wants in the batch. Same LSH-bucketed
    * arg-max shape as `nearestInBucket` (candidates only from the
    * vector's own bucket, map-side max per group), with the cross-label
    * predicate applied before scoring so same-label pairs never even
    * compute a cosine. Vectors whose bucket holds no other-label
    * neighbor drop out (no negative found at this recall). */
  def hardNegatives(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, dim: Int, planes: Int): DataFrame =
    bucketArgMax(emb, idCol, vecCol, dim, planes, labelCol = Some(labelCol))
      .select(col(idCol), col("__best.nn").as("neg_id"),
        col("__best.nl").as("neg_label"), col("__best.sim").as("sim"))

  /** Matryoshka truncation: keep the first `dims` components and
    * re-normalize to unit length (MRL-style embeddings are trained so
    * prefixes remain usable — truncation is how a 100 TB index trades
    * recall for 4× less storage/bandwidth). Map-only expression; a
    * zero-norm prefix yields NaN components (0.0/0.0 — filter with
    * isnan; NaN sorts ABOVE every double in Spark's orderings, so an
    * unfiltered degenerate vector becomes everyone's nearest neighbor).
    * Arithmetic: double divide, cast to
    * float at the edge — the same widen/narrow convention the
    * quantizer uses. */
  def matryoshka(vec: Column, dims: Int): Column = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    val t = slice(vec, 1, dims)
    // the prefix norm is LET-BOUND: referenced directly inside the
    // transform lambda it would re-fold the prefix per element (lambda
    // bodies are CSE-exempt) — O(d²)/row, the LambdaAuditSpec class
    val scaled = graft.functions.Let.bindOnce(sqrt(norm2(t))) { n =>
      transform(t, v => (v.cast("double") / n).cast("float"))
    }
    // a vector SHORTER than dims would silently pass through un-truncated
    // (slice clamps) and poison a fixed-width index — fail the row loudly
    when(size(vec) >= dims, scaled)
      .otherwise(raise_error(concat(
        lit(s"matryoshka: vector shorter than dims=$dims: len="),
        size(vec).cast("string"))))
  }

  /** IVF-style ANN: assign every vector to its nearest of `centroids`
    * (collected driver-side, e.g. a fixed sample — a k-means fit would
    * slot in unchanged), search only the query's cell. The assignment is a
    * literal `greatest()` struct fold over per-centroid cosines — zero
    * shuffle; the cell filter then cuts the scored set to ~N/K.
    * `centroids`: (cid, vector) pairs. */
  /** Per-centroid (sim, negcid) structs — the ONE place the cell-scoring
    * arithmetic lives, shared by assignment (ivfCell) and probing
    * (ivfCellsTop) so the two can't drift. */
  private def cellStructs(vec: Column, centroids: Seq[(Int, Array[Float])]): Seq[Column] = {
    import graft.functions.VectorOps
    centroids.map { case (cid, cv) =>
      val dotQ = VectorOps.dotLiteral(vec, cv.map(_.toDouble))
      val nq = math.sqrt(cv.map(v => v.toDouble * v.toDouble).sum)
      struct((dotQ / (sqrt(VectorOps.norm2Fast(vec)) * lit(nq))).as("sim"),
        lit(-cid).as("negcid"))
    }
  }

  def ivfCell(vec: Column, centroids: Seq[(Int, Array[Float])]): Column = {
    val ss = cellStructs(vec, centroids)
    val best = if (ss.sizeIs == 1) ss.head else greatest(ss: _*)
    (lit(0) - best.getField("negcid")).as("cid")
  }

  /** IVF top-k: nearest-cell search for one query vector. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String, query: DataFrame,
      centroids: Seq[(Int, Array[Float])], k: Int): DataFrame = {
    val assigned = emb.withColumn("__cell", ivfCell(col(vecCol), centroids))
    val q = query.withColumn("__qcell", ivfCell(col("qvec"), centroids))
    assigned.crossJoin(broadcast(q))
      .filter(col("__cell") === col("__qcell"))
      .withColumn("sim", cosine(col(vecCol), col("qvec")))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("sim"))
  }

  /** The query's `nprobe` nearest cells (cosine desc, cid asc on ties) as
    * an array column — multi-probe IVF's recall lever: searching p cells
    * multiplies the candidate set to ~p·N/K while recovering neighbors
    * that fell just across a cell boundary. Same literal-expression
    * arithmetic as `ivfCell`, so cell assignment and probing can't drift. */
  def ivfCellsTop(vec: Column, centroids: Seq[(Int, Array[Float])],
      nprobe: Int): Column = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val cands = array(cellStructs(vec, centroids): _*)
    // ascending struct sort + reverse = sim desc, then negcid desc = cid asc
    transform(slice(reverse(array_sort(cands)), 1, nprobe),
      s => lit(0) - s.getField("negcid"))
  }

  /** Multi-probe IVF top-k: search the query's `nprobe` nearest cells. */
  def ivfTopKProbed(emb: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, centroids: Seq[(Int, Array[Float])], k: Int,
      nprobe: Int): DataFrame = {
    val assigned = emb.withColumn("__cell", ivfCell(col(vecCol), centroids))
    val q = query.withColumn("__qcells", ivfCellsTop(col("qvec"), centroids, nprobe))
    assigned.crossJoin(broadcast(q))
      .filter(array_contains(col("__qcells"), col("__cell")))
      .withColumn("sim", cosine(col(vecCol), col("qvec")))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("sim"))
  }

  /** Recall@k AUDIT of the single-probe IVF path against brute-force
    * ground truth, per query → (qid, n_hits, recall). The audit that
    * justifies an index's nprobe/K settings before a corpus-wide ANN run:
    * recall is measured, not assumed.
    *
    * Scale shape: the ground-truth side is brute force over |queries|×N
    * BY CONTRACT — queries are a SAMPLED audit set (q27's bounded-input
    * discipline), broadcast-small against the one big scan; both rankings
    * reuse the SAME scored pass (one cross join, two windows on the same
    * qid shuffle), so the audit costs one brute-force sweep, not two. */
  def recallAtK(emb: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      centroids: Seq[(Int, Array[Float])], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__cell", ivfCell(col("__v"), centroids))
    val q = queries.select(col(qidCol).as("__qid"), col(qvecCol).as("__qv"))
      .withColumn("__qcell", ivfCell(col("__qv"), centroids))
    val scored = e.crossJoin(q)
      .withColumn("__sim", cosine(col("__v"), col("__qv")))
    val wq = Window.partitionBy(col("__qid"))
      .orderBy(col("__sim").desc, col("__id"))
    val truth = scored.withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") <= k).select(col("__qid"), col("__id"))
    val approx = scored.filter(col("__cell") === col("__qcell"))
      .withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") <= k)
      .select(col("__qid"), col("__id"), lit(1).as("__hit"))
    truth.join(approx, Seq("__qid", "__id"), "left")
      .groupBy(col("__qid").as(qidCol))
      .agg(count(col("__hit")).as("n_hits"))
      .withColumn("recall", col("n_hits").cast("double") / lit(k.toDouble))
  }

  /** Deterministic Lloyd's k-means over an embedding column, for IVF
    * centroids (`ivfTopK` takes the result unchanged).
    *
    * Determinism guarantees (same result on any partitioning / retry):
    *  - init = the k lowest-id vectors;
    *  - assignment = the same literal-expression cosine argmax `ivfCell`
    *    uses at query time (zero shuffle);
    *  - update = per-dimension mean over 2^40 FIXED-POINT sums (double
    *    sums are shuffle-order dependent; v·2^40 is an exact exponent
    *    shift and integer sums commute — the same construction
    *    `centroidSim` gates through q80), carried as decimal(38,0) so
    *    ~10^26-row cells can't overflow (per-row terms reach ~1.1×10^12;
    *    DuckDB's HUGEINT sum has the same ~10^38 headroom), cast to float
    *    at the edge;
    *  - empty cells keep their previous centroid.
    *
    * Each iteration is one job: explode to (cell, dim, value), partial-
    * aggregating groupBy, collect k×dim rows (driver-small). */
  def kmeansCentroids(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): Seq[(Int, Array[Float])] = {
    var centroids: Seq[(Int, Array[Float])] = emb
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray).zipWithIndex.map(_.swap).toSeq
    for (_ <- 0 until iters) {
      val assigned = emb.withColumn("__cell", ivfCell(col(vecCol), centroids))
      val sums = assigned
        .select(col("__cell"), posexplode(col(vecCol)).as(Seq("__d", "__v")))
        .groupBy(col("__cell"), col("__d"))
        .agg(sum(round(col("__v").cast("double") * lit(1099511627776.0))
            .cast("decimal(38,0)")).as("__s"),
          count(lit(1)).as("__n"))
        .collect()
      val byCell = sums.groupBy(_.getInt(0))
      centroids = centroids.map { case (cid, prev) =>
        byCell.get(cid) match {
          case Some(rows) =>
            val next = prev.clone()
            rows.foreach { r =>
              next(r.getInt(1)) =
                (r.getDecimal(2).doubleValue() / 1099511627776.0 / r.getLong(3)).toFloat
            }
            cid -> next
          case None => cid -> prev // empty cell: keep previous centroid
        }
      }
    }
    centroids
  }

  /** Deterministic random projection to `outDim` dimensions: out[j] =
    * Σ_i v[i]·w(seedBase+j, i), with the same md5-derived integer weights
    * as the LSH hyperplanes (seed-offset so the two never share a plane).
    * Johnson-Lindenstrauss-style distance sketching as a map-only literal
    * expression — one codegen'd loop per output dim, no shuffle, no model
    * table. */
  def projectLiteral(vec: Column, dim: Int, outDim: Int,
      seedBase: Int = 100): Column = {
    require(outDim >= 1, s"outDim must be >= 1, got $outDim")
    array((0 until outDim).map { j =>
      graft.functions.VectorOps.dotLiteral(vec,
        Array.tabulate(dim)(i => planeWeight(seedBase + j, i).toDouble))
    }: _*)
  }

  /** Two-stage ANN: rank ALL vectors by cosine in the `outDim`-projected
    * space (cheap: outDim ≪ dim multiplies per row), keep the top
    * `candidates`, then re-rank only those by EXACT cosine and return the
    * top `k` — the classic retrieve-then-rerank shape. At 100 TB the
    * stage-1 scan reads a precomputed projection column (outDim/dim of
    * the vector bytes) and TakeOrdered carries `candidates` rows per
    * partition; stage 2 touches `candidates` full vectors only. Recall <
    * 1 by design (the projection can demote a true neighbor out of the
    * candidate set); determinism: both stages tie-break (score desc, id). */
  def twoStageTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, dim: Int, outDim: Int, candidates: Int,
      k: Int): DataFrame = {
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    val p = emb.withColumn("__p", projectLiteral(col(vecCol), dim, outDim))
    val q = query.withColumn("__qp", projectLiteral(col("qvec"), dim, outDim))
    p.crossJoin(broadcast(q))
      .withColumn("__psim", cosineLambda(col("__p"), col("__qp")))
      .orderBy(col("__psim").desc, col(idCol))
      .limit(candidates)
      .withColumn("sim", cosine(col(vecCol), col("qvec")))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("sim"))
  }

  /** LSH-bucketed cosine top-k: score only vectors sharing the query's
    * bucket. Recall < 1 by design; the oracle checks the deterministic
    * result, the bucket narrowing is the 100TB scale story. */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, dim: Int, planes: Int, k: Int): DataFrame = {
    val bucketed = emb.withColumn("__bucket", lshBucket(col(vecCol), dim, planes))
    val q = query.withColumn("__qbucket", lshBucket(col("qvec"), dim, planes))
    bucketed.crossJoin(broadcast(q))
      .filter(col("__bucket") === col("__qbucket"))
      .withColumn("sim", cosine(col(vecCol), col("qvec")))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("sim"))
  }

  /** Product-quantization ENCODE (Jégou et al. 2011, public method): split
    * the vector into `subspaces` contiguous subvectors and store, per
    * subspace, the id of the nearest codebook entry (L2, ties lowest id) —
    * a dim-floats vector compresses to `subspaces` small ints, the
    * storage/bandwidth lever for a 100 TB ANN index (recon_err is the
    * quantization distortion, Σ per-subspace squared distance).
    *
    * `codebook` = (cid, FULL vector) pairs; subspace s uses each entry's
    * s-th slice. Here the static init-only codebook (e.g. the k lowest-id
    * vectors) keeps the fit trivially deterministic; a Lloyd-refined
    * codebook from `kmeansCentroids` run per subspace slots in unchanged.
    *
    * Map-only literal expressions end to end: per row, subspaces·k
    * codegen'd folds over subDim elements — zero shuffle, no model-table
    * join (the codebook is k×dim driver-side floats, the IVF contract). */
  /** The codebook as a positional array — the PQ kernels index entries
    * by cid, so the cids must be exactly 0..k-1 (both fit paths build
    * them that way). */
  private def cbArray(codebook: Seq[(Int, Array[Float])]): Array[Array[Float]] = {
    require(codebook.nonEmpty, "PQ needs a non-empty codebook")
    require(codebook.map(_._1).sorted == codebook.indices,
      "codebook cids must be 0..k-1")
    codebook.sortBy(_._1).map(_._2).toArray
  }

  /** Per-subspace (argmin cid, min d2) expression pair — the DECLARATIVE
    * twin of `PqEncodeExpr` (kept as the equivalence-spec baseline: the
    * unrolled least(struct) chain is ~2,500 Catalyst nodes at k=16×8 and
    * per-execution planning dominated q112/q155, the round-2
    * DotLiteralExpr lesson — but its semantics ARE the assignment
    * definition the kernel must match). */
  private[ops] def pqPerSub(vecCol: String,
      codebook: Seq[(Int, Array[Float])], subspaces: Int): Seq[(Column, Column)] = {
    require(codebook.nonEmpty, "PQ needs a non-empty codebook")
    val dim = codebook.head._2.length
    require(dim % subspaces == 0,
      s"dim $dim must divide evenly into $subspaces subspaces")
    val subDim = dim / subspaces
    (0 until subspaces).map { s =>
      val sub = slice(col(vecCol), s * subDim + 1, subDim)
      val best = least(codebook.map { case (cid, cvec) =>
        val cArr = array(cvec.slice(s * subDim, (s + 1) * subDim)
          .map(x => lit(x.toDouble)): _*)
        val d2 = aggregate(
          zip_with(sub, cArr, (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
          lit(0.0), (a, x) => a + x)
        struct(d2.as("d"), lit(cid).as("cid"))
      }: _*)
      (best.getField("cid"), best.getField("d"))
    }
  }

  def pqEncode(emb: DataFrame, idCol: String, vecCol: String,
      codebook: Seq[(Int, Array[Float])], subspaces: Int): DataFrame = {
    val enc = graft.functions.VectorOps.pqEncodeFast(col(vecCol),
      cbArray(codebook), subspaces)
    emb.select(col(idCol),
      enc.getField("codes").as("codes"),
      enc.getField("recon_err").as("recon_err"))
  }

  /** Per-subspace LLOYD refinement of a PQ codebook — the training half
    * of Jégou et al.'s product quantizer (each subspace runs its own
    * k-means in L2 on the subvector slices). Init = the k lowest-id
    * vectors (the q89/q112 deterministic-init discipline); each
    * iteration assigns every (vector, subspace) to its nearest codebook
    * slice with the SAME argmin expression `pqEncode` uses, then
    * re-derives every (subspace, code, local-dim) centroid coordinate as
    * a 2^40 fixed-point mean (integer sums — order-independent, the
    * kmeansCentroids construction), cast through Float exactly as the
    * codebook stores them. Empty (subspace, code) cells keep their
    * previous slice.
    *
    * Scale shape: ONE job per iteration — a map-only code assignment +
    * posexplode and a single (dim, cid)-keyed partial-combining
    * aggregation whose result is k×dim fixed-point partials (the
    * model-sized driver collect of the k-means-fit contract). All
    * subspaces refine in the same pass: a dimension's group key is the
    * code its OWN subspace assigned, read from the per-row codes array. */
  def pqLloydCodebook(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, subspaces: Int, iters: Int): Seq[(Int, Array[Float])] = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0; got k=$k iters=$iters")
    var cb: Seq[(Int, Array[Float])] = emb.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray).zipWithIndex.map(_.swap).toSeq
    val dim = cb.head._2.length
    val subDim = dim / subspaces
    for (_ <- 0 until iters) {
      val codes = graft.functions.VectorOps.pqEncodeFast(col(vecCol),
        cbArray(cb), subspaces).getField("codes")
      // two-step select keeps the Generator out of the projection that
      // computes the codes (struct-field resolution + CSE discipline)
      val sums = emb
        .select(codes.as("__codes"), col(vecCol).as("__vec"))
        .select(col("__codes"), posexplode(col("__vec")).as(Seq("__d", "__v")))
        .withColumn("__cid", get(col("__codes"),
          floor(col("__d") / lit(subDim)).cast("int")))
        .groupBy(col("__d"), col("__cid"))
        .agg(sum(round(col("__v").cast("double") * lit(1099511627776.0))
            .cast("decimal(38,0)")).as("__s"),
          count(lit(1)).as("__n"))
        .collect()
      val byKey = sums.map(r =>
        (r.getInt(0), r.getInt(1)) -> ((r.getDecimal(2), r.getLong(3)))).toMap
      cb = cb.map { case (cid, prev) =>
        val next = prev.clone()
        (0 until dim).foreach { d =>
          byKey.get((d, cid)).foreach { case (sfix, n) =>
            next(d) = (sfix.doubleValue() / 1099511627776.0 / n).toFloat
          }
        }
        cid -> next
      }
    }
    cb
  }

  /** PQ ASYMMETRIC-DISTANCE search (the ADC of Jégou et al.): approximate
    * each vector's squared L2 distance to one query as Σ_s T[s][code_s],
    * where T is the query's per-subspace distance table to every codebook
    * entry (subspaces×k doubles, computed once per query driver-side).
    * Top-k nearest (adc asc, id asc).
    *
    * This is the payoff of `pqEncode`: the scan reads only the
    * `subspaces` small-int codes per vector (not the vector) and does
    * `subspaces` array lookups + adds per row — at 100 TB the index is
    * ~dim·4/subspaces× smaller than the raw vectors and the query is
    * memory-bandwidth-bound on bytes that fit in cache. Map-only +
    * TakeOrdered; zero shuffle, zero joins. */
  def pqAdcTopK(emb: DataFrame, idCol: String, vecCol: String,
      codebook: Seq[(Int, Array[Float])], subspaces: Int,
      query: Array[Float], k: Int): DataFrame = {
    require(codebook.map(_._1) == codebook.indices,
      "codebook cids must be 0..k-1 in order")
    val dim = codebook.head._2.length
    val subDim = dim / subspaces
    // per-subspace distance table: T(s)(cid) with the SAME ascending fold
    // as the encode/verify arithmetic
    val table = (0 until subspaces).map { s =>
      codebook.map { case (_, cvec) =>
        var acc = 0.0; var i = 0
        while (i < subDim) {
          val d = query(s * subDim + i).toDouble - cvec(s * subDim + i).toDouble
          acc += d * d; i += 1
        }
        acc
      }
    }
    val encoded = pqEncode(emb, idCol, vecCol, codebook, subspaces)
    val adc = (0 until subspaces).map { s =>
      element_at(array(table(s).map(lit): _*), col("codes").getItem(s) + 1)
    }.reduce(_ + _)
    encoded.withColumn("adc", adc)
      .orderBy(col("adc").asc, col(idCol))
      .limit(k)
      .select(col(idCol), col("adc"))
  }

  /** Per-group centroid + each vector's cosine to its OWN group centroid
    * (column `centroid_sim`) — the embedding-space outlier / label-noise
    * signal: low similarity to your cluster's center means you probably
    * don't belong to it.
    *
    * Determinism: per-dimension sums run in 2^40 FIXED-POINT — v·2^40 is
    * an EXACT double operation (pure exponent shift), `round` breaks the
    * rare residual tie half-away-from-zero in Spark and DuckDB alike, and
    * integer sums are order-independent. (A DECIMAL(p, s) cast instead
    * hits engine-divergent rounding: a float that is a dyadic rational
    * with exactly s+1 decimal digits — e.g. 0.1983642578125 at s=12 — is
    * a tie that Spark rounds HALF_UP and DuckDB half-even.) The sum runs
    * as decimal so ~10^18-row groups can't overflow int64 on the way to
    * the double mean. Scale shape: the explode is
    * map-only and the (group, dim) aggregation partial-combines, so the
    * shuffle carries ~groups × dims × partitions partial sums — never the
    * exploded corpus; the centroid table (groups × dims values) broadcasts
    * back. The cosine here is the lambda form, not `CosineSimExpr`: the
    * centroid is array<double> and the loop kernel is float-specialized. */
  /** Per-DIMENSION standardization of an embedding column: each dimension
    * is shifted/scaled to corpus mean 0, std 1 — the preprocessing that
    * keeps one high-variance dimension from dominating L2/cosine
    * neighborhoods (and the whitening step before PQ/IVF training).
    * Returns the input plus `norm_vec` (array<double>). A zero-variance
    * dimension standardizes to 0.0 (it carries no information; ±∞ would
    * poison every downstream distance).
    *
    * Determinism: the per-dimension Σv and Σv² run in 2^40 FIXED-POINT
    * decimal (the q80 centroid discipline — exact exponent shift, integer
    * sums order-independent); mean/std/normalized values then derive
    * through the same left-to-right IEEE chain in any engine (sqrt is
    * correctly rounded by the standard, so it is cross-engine exact).
    *
    * Scale shape: the posexplode is map-only and the per-dim aggregation
    * partial-combines (shuffle carries dims × partitions partial sums);
    * the dims-row stats table folds to ONE row (means/stds arrays) and
    * broadcasts back — the vector side never shuffles. */
  def standardizeDims(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val fix = (1L << 40).toDouble
    val v = col("__v").cast("double")
    val perDim = emb.select(posexplode(col(vecCol)).as(Seq("__pos", "__v")))
      .groupBy(col("__pos"))
      .agg(
        (sum(round(v * fix).cast("decimal(20,0)")).cast("double") / fix
          / count(lit(1))).as("__mean"),
        (sum(round(v * v * fix).cast("decimal(20,0)")).cast("double") / fix
          / count(lit(1))).as("__m2"))
      .withColumn("__std", sqrt(col("__m2") - col("__mean") * col("__mean")))
    val stats = perDim.agg(
      transform(sort_array(collect_list(struct(col("__pos"), col("__mean")))),
        s => s.getField("__mean")).as("__means"),
      transform(sort_array(collect_list(struct(col("__pos"), col("__std")))),
        s => s.getField("__std")).as("__stds"))
    emb.crossJoin(broadcast(stats))
      .withColumn("norm_vec", zip_with(col(vecCol),
        zip_with(col("__means"), col("__stds"), (m, sd) => struct(m.as("m"), sd.as("sd"))),
        (x, ms) => when(ms.getField("sd") > 0,
          (x.cast("double") - ms.getField("m")) / ms.getField("sd"))
          .otherwise(lit(0.0))))
      .drop("__means", "__stds")
  }

  /** Diagonal-covariance Mahalanobis outlier scores — the multivariate
    * upgrade of the per-dimension z-score (q140): score(x) =
    * Σ_d ((x_d − μ_d)/σ_d)², the squared Mahalanobis distance under an
    * independence (diagonal Σ) assumption — the cheap first-pass
    * embedding-space anomaly flag before anything quadratic (LOF,
    * full-Σ) runs. Zero-variance dimensions contribute 0.
    *
    * Float discipline: per-dim stats use the q140 2^40 fixed-point
    * sums; per-vector scores sum 9-dp-rounded per-dim terms exploded to
    * (id, pos) rows and re-aggregated as DECIMAL — partition-order-free
    * and oracle-portable. Output: top-`topK` (vec_id, score) by
    * (score desc, id).
    *
    * Scale shape: ONE (pos)-keyed stats aggregate, one map-only explode
    * joined back to the dim-sized stats table (un-hinted), ONE id-keyed
    * partial-combining sum, TakeOrdered top-k. */
  def mahalanobisDiag(emb: DataFrame, idCol: String, vecCol: String,
      topK: Int = 20): DataFrame = {
    val fix = (1L << 40).toDouble
    val v = col("__v").cast("double")
    val perDim = emb.select(posexplode(col(vecCol)).as(Seq("__pos", "__v")))
      .groupBy(col("__pos"))
      .agg(
        (sum(round(v * fix).cast("decimal(20,0)")).cast("double") / fix
          / count(lit(1))).as("__mean"),
        (sum(round(v * v * fix).cast("decimal(20,0)")).cast("double") / fix
          / count(lit(1))).as("__m2"))
      .withColumn("__std", sqrt(col("__m2") - col("__mean") * col("__mean")))
    val terms = emb.select(col(idCol).as("vec_id"),
        posexplode(col(vecCol)).as(Seq("__pos", "__v")))
      .join(perDim, Seq("__pos"))
      .select(col("vec_id"),
        round(when(col("__std") > 0, {
          val z = (col("__v").cast("double") - col("__mean")) / col("__std")
          z * z
        }).otherwise(lit(0.0)), 9).cast("decimal(18,9)").as("__t"))
    terms.groupBy(col("vec_id"))
      .agg(round(sum(col("__t")).cast("double"), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(topK)
  }

  /** IVF-PQ retrieval — the FAISS IVFPQ composition, built from this
    * library's two gated halves: the query probes its `nprobe` nearest
    * IVF cells (`ivfCellsTop`, the q71 recall lever), and within those
    * cells ranks by PQ ASYMMETRIC distance over the CODES
    * (`pqAdcTopK`, q114) — the float vectors are never read at search
    * time. Candidate set ≈ nprobe·N/K rows of `subspaces` small ints:
    * the memory-bandwidth shape that makes billion-vector search
    * feasible, searched here with exactly the arithmetic both member
    * gates pin.
    *
    * Scale shape: map-only literal cell assignment (zero shuffle — the
    * centroid and codebook tables fold in as literals, the IVF-centroid
    * discipline) + TakeOrdered top-k. */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Float])], codebook: Seq[(Int, Array[Float])],
      subspaces: Int, query: Array[Float], k: Int, nprobe: Int = 1): DataFrame = {
    val qArr = array(query.map(v => lit(v)): _*)
    val cand = emb
      .withColumn("__cell", ivfCell(col(vecCol), centroids))
      .filter(array_contains(ivfCellsTop(qArr, centroids, nprobe), col("__cell")))
      .drop("__cell")
    pqAdcTopK(cand, idCol, vecCol, codebook, subspaces, query, k)
  }

  /** BINARY (sign) quantization: pack the embedding's sign bits into
    * ⌈dim/32⌉ 32-bit words (held in longs — bit 31 never reaches a sign
    * bit, so the packed values are identical non-negative integers in
    * every engine; a 64-bit pack would shift into int64's sign bit,
    * where engines disagree about overflow). 64× smaller than float32
    * and Hamming distance becomes a handful of xor+popcount ops — the
    * standard binary-embedding retrieval trick. Map-only. */
  def signPack32(vec: Column, dim: Int): Column = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val nWords = (dim + 31) / 32
    array((0 until nWords).map { w =>
      val hi = math.min(31, dim - 1 - 32 * w)
      (0 to hi).map { j =>
        when(get(vec, lit(32 * w + j)) > 0f, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
  }

  /** Hamming distance between two packed sign arrays: Σ popcount(xor). */
  def hammingDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, d) => acc + d)

  /** Hamming top-k over the sign-packed corpus for one query vector:
    * the brute binary-retrieval baseline — but "brute" here is xor+
    * popcount over 8-byte words, ~64× less data than the float scan,
    * which is the point of binary quantization. Ties break by id.
    *
    * Scale shape: map-only pack+distance, then TakeOrdered (per-
    * partition top-k heaps merged on the driver, O(k) state — never a
    * global sort). The query's packed words fold in as literals. */
  def hammingTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryWords: Seq[Long], dim: Int, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val q = array(queryWords.map(lit): _*)
    emb.select(col(idCol),
        hammingDist(signPack32(col(vecCol), dim), q).as("hamming"))
      .orderBy(col("hamming").asc, col(idCol).asc)
      .limit(k)
  }

  def centroidSim(emb: DataFrame, idCol: String, vecCol: String,
      groupCol: String): DataFrame = {
    val fix = (1L << 40).toDouble
    val x = emb.select(col(groupCol), posexplode(col(vecCol)).as(Seq("__pos", "__v")))
    val perDim = x.groupBy(col(groupCol), col("__pos"))
      .agg((sum(round(col("__v").cast("double") * fix).cast("decimal(20,0)"))
        .cast("double") / fix / count(lit(1))).as("__cd"))
    val cent = perDim.groupBy(col(groupCol))
      .agg(transform(sort_array(collect_list(struct(col("__pos"), col("__cd")))),
        s => s.getField("__cd")).as("__cvec"))
    emb.join(broadcast(cent), Seq(groupCol))
      .withColumn("centroid_sim", cosineLambda(col(vecCol), col("__cvec")))
      .drop("__cvec")
  }

  /** Pairwise cosine between GROUP centroids — the inter-class
    * separation matrix an embedding-space eval reads next to the
    * intra-class view (q80's doc-to-own-centroid similarity): high
    * off-diagonal cosine = two labels the encoder cannot distinguish.
    * Centroids use the same 2^40 fixed-point mean as `centroidSim`
    * (bit-stable under any partitioning); the pair join runs on the
    * GROUP-count-sized centroid table.
    * Output: (label_a, label_b, cosine) for a < b. */
  def centroidDistanceMatrix(emb: DataFrame, vecCol: String,
      groupCol: String): DataFrame = {
    val fix = (1L << 40).toDouble
    val x = emb.select(col(groupCol).as("__g"),
      posexplode(col(vecCol)).as(Seq("__pos", "__v")))
    val perDim = x.groupBy(col("__g"), col("__pos"))
      .agg((sum(round(col("__v").cast("double") * fix).cast("decimal(20,0)"))
        .cast("double") / fix / count(lit(1))).as("__cd"))
    val cent = perDim.groupBy(col("__g"))
      .agg(transform(sort_array(collect_list(struct(col("__pos"), col("__cd")))),
        s => s.getField("__cd")).as("__cvec"))
      .localCheckpoint(false) // both sides of the pair join
    cent.select(col("__g").as("label_a"), col("__cvec").as("__va"))
      .join(cent.select(col("__g").as("label_b"), col("__cvec").as("__vb")),
        col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"),
        round(cosineLambda(col("__va"), col("__vb")), 6).as("cosine"))
  }

  /** Maximal Marginal Relevance re-rank (Carbonell & Goldstein '98):
    * retrieve the top-`candK` candidates by cosine to the query
    * DISTRIBUTED (the same scan/TakeOrdered shape as `cosineTopK`),
    * then greedily pick `k` of them maximizing
    *   λ·sim(c, q) − (1−λ)·max_{s∈selected} sim(c, s)
    * (max over the empty set = 0, so pick 1 scores λ·sim(c,q)).
    *
    * The greedy loop runs on the DRIVER over the candK-bounded
    * candidate set — candK is a contract bound like the PQ codebook
    * or k-means k (hundreds, never data-scaled); the distributed part
    * is the retrieval. Driver cosine is the same ascending-index
    * double fold as the Column expression, so scores replay exactly
    * in any engine. Ties break on the lower id at every step.
    * Output: (rank, vec_id, score) — score rounded to 6, HALF_UP. */
  def mmrRerank(emb: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, candK: Int, k: Int, lambda: Double): DataFrame = {
    require(lambda > 0 && lambda <= 1, "lambda in (0,1]")
    val cand = emb.crossJoin(broadcast(query))
      .withColumn("simq", cosine(col(vecCol), col("qvec")))
      .orderBy(col("simq").desc, col(idCol))
      .limit(candK)
      .select(col(idCol), col("simq"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Float](2).toArray))
    def dotD(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cosD(a: Array[Float], b: Array[Float]): Double =
      dotD(a, b) / (math.sqrt(dotD(a, a)) * math.sqrt(dotD(b, b)))
    val oneMinus = 1.0 - lambda
    val remaining = scala.collection.mutable.ArrayBuffer(cand: _*)
    val pickedVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double)]
    while (out.size < k && remaining.nonEmpty) {
      val scored = remaining.map { case (id, simq, v) =>
        val mx = if (pickedVecs.isEmpty) 0.0
          else pickedVecs.map(pv => cosD(v, pv)).max
        (id, lambda * simq - oneMinus * mx, v)
      }
      val best = scored.min(Ordering.by((t: (Long, Double, Array[Float])) => (-t._2, t._1)))
      out += ((out.size, best._1,
        BigDecimal(best._2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      pickedVecs += best._3
      val bi = remaining.indexWhere(_._1 == best._1)
      remaining.remove(bi)
    }
    val spark = emb.sparkSession
    import spark.implicits._
    out.toSeq.toDF("rank", "vec_id", "score")
  }

  /** cos(vec, literal center) in the cellStructs shape: codegen'd dot +
    * norm against a driver-held vector; the center's norm is a Scala
    * ascending fold, matching the SQL list_reduce. */
  private def cosLiteral(vec: Column, c: Array[Float]): Column = {
    import graft.functions.VectorOps
    val nq = math.sqrt(c.map(v => v.toDouble * v.toDouble).sum)
    VectorOps.dotLiteral(vec, c.map(_.toDouble)) /
      (sqrt(VectorOps.norm2Fast(vec)) * lit(nq))
  }

  /** Greedy k-center (Gonzalez '85) coreset over cosine distance
    * 1 − cos: start from `seedId`, then `k−1` times pick the vector
    * farthest from its nearest already-picked center (ties → lowest
    * id). The 2-approximation data-selection / coverage primitive for
    * training-data curation.
    *
    * Scale shape: k map-only passes — each round folds the selected
    * centers in as LITERALS (`least` over codegen'd cosines, no join,
    * no growing lineage) and takes one distributed argmax
    * (TakeOrdered). k is a contract bound like k-means' k. Output:
    * (rank, vec_id, dist) where dist is the covering radius at
    * selection time (round 6; 0 for the seed). */
  def kcenterCoreset(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, seedId: Long): DataFrame = {
    require(k >= 1, "k >= 1")
    val seedVec = emb.filter(col(idCol) === seedId)
      .select(col(vecCol)).head().getSeq[Float](0).toArray
    var centers = Vector((seedId, seedVec))
    val out = scala.collection.mutable.ArrayBuffer((0, seedId, 0.0))
    while (centers.size < k) {
      val mind = centers.map { case (_, cv) => lit(1.0) - cosLiteral(col(vecCol), cv) }
      val mindCol = if (mind.size == 1) mind.head else least(mind: _*)
      val next = emb.filter(!col(idCol).isin(centers.map(_._1): _*))
        .select(col(idCol), col(vecCol), mindCol.as("__mind"))
        .orderBy(col("__mind").desc, col(idCol))
        .limit(1).head()
      val id = next.getLong(0)
      val cv = next.getSeq[Float](1).toArray
      out += ((centers.size,
        id, BigDecimal(next.getDouble(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      centers = centers :+ ((id, cv))
    }
    val spark = emb.sparkSession
    import spark.implicits._
    out.toSeq.toDF("rank", "vec_id", "dist")
  }

  /** Label-relevance retrieval eval: for each query vector (the
    * `nQueries` lowest ids), rank ALL other vectors by cosine (sim
    * desc, id) and report the rank of the first SAME-LABEL neighbor
    * (first-relevant rank), its reciprocal, and NDCG@`k` with binary
    * label-match gains — DCG terms are 9-dp fixed point summed as
    * DECIMAL, and the ideal DCG normalizer folds the same literal way.
    *
    * Scale shape: ONE scored pass of (nQueries × N) rows (nQueries a
    * contract bound). The ranks never fully materialize: the top-k leg
    * FILTERS rank ≤ k, which plans as WindowGroupLimit (per-map-
    * partition top-k pushdown, so no query's whole score list lands on
    * one task), and the first-relevant rank falls out of counting the
    * rows scored strictly above each query's best relevant hit —
    * rank = 1 + |{rows with a greater (sim, −id) key}| — instead of a
    * full per-query rank decoration. All joins after the scored pass
    * are query-sized broadcasts. Output: (query_id, first_rel_rank,
    * rr, ndcg). */
  def labelRetrievalEval(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, nQueries: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = emb.filter(col(idCol) < nQueries)
      .select(col(idCol).as("__qid"), col(vecCol).as("__qv"),
        col(labelCol).as("__ql"))
    val scored = emb.as("e").join(broadcast(q), col(idCol) =!= col("__qid"))
      .select(col("__qid"), col("__ql"), col(idCol).as("__id"),
        col(labelCol).as("__l"), cosine(col(vecCol), col("__qv")).as("__sim"))
      // consumers below: the all-rows aggregate, the top-k leg, the
      // best-relevant probe and its count — cut the cosine pass once
      .localCheckpoint(eager = false)
    val rel = (col("__l") === col("__ql")).cast("int")
    // all-rows leg: relevant count per query (no rank needed)
    val allAgg = scored.groupBy(col("__qid"))
      .agg(sum(rel).cast("long").as("n_rel"))
    // top-k leg: the rank-≤-k FILTER plans WindowGroupLimit
    val wq = Window.partitionBy(col("__qid"))
      .orderBy(col("__sim").desc, col("__id"))
    val topAgg = scored.withColumn("__rk", row_number().over(wq))
      .filter(col("__rk") <= k)
      .groupBy(col("__qid"))
      .agg(
        sum(rel).cast("long").as("n_rel_topk"),
        sum(when(rel === 1,
          round(lit(1.0) / (log(col("__rk") + 1.0) / lit(math.log(2.0))), 9))
          .otherwise(lit(0.0)).cast("decimal(12,9)")).as("__dcg"))
    // first-relevant rank: the best relevant hit per query (max on the
    // (sim, −id) rank key), then 1 + the count of rows strictly above
    // it — identical to the row_number the old full decoration produced
    val best = scored.filter(col("__l") === col("__ql"))
      .groupBy(col("__qid"))
      .agg(max(struct(col("__sim"), (-col("__id")).as("__nid"))).as("__b"))
      .select(col("__qid"), col("__b").getField("__sim").as("__bs"),
        (-col("__b").getField("__nid")).as("__bid"))
    val frr = scored.join(broadcast(best), Seq("__qid"))
      .groupBy(col("__qid"))
      .agg((sum(when(col("__sim") > col("__bs") ||
          (col("__sim") === col("__bs") && col("__id") < col("__bid")), 1L)
        .otherwise(0L)) + 1L).cast("int").as("first_rel_rank"))
    val idealDen = (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0))).sum
    allAgg.join(topAgg, Seq("__qid"))
      .join(frr, Seq("__qid"), "left") // no-relevant queries: NULL rank
      .select(col("__qid").as("query_id"), col("first_rel_rank"),
        col("n_rel"), col("n_rel_topk"),
        round(lit(1.0) / col("first_rel_rank"), 6).as("rr"),
        round(col("__dcg").cast("double") / lit(idealDen), 6).as("ndcg"),
        when(col("n_rel") > 0, round(col("n_rel_topk").cast("double") /
          least(lit(k.toLong), col("n_rel")).cast("double"), 6)).as("recall_at_k"))
  }

  /** Mean pairwise cosine of the L2-normalized corpus — the isotropy
    * audit — WITHOUT forming pairs, via ‖Σu‖² = Σᵢⱼ uᵢ·uⱼ:
    *   mean = (‖Σu‖² − N) / (N(N−1))   (u unit vectors, so Σ‖u‖² = N).
    * Per-dimension sums of the normalized components go through the
    * 2^40 fixed-point trick (the centroid machinery), so Σu is exact
    * and the final norm/ratio is one mirrored double expression. Near
    * 0 ⇒ isotropic directions; near 1 ⇒ collapsed (anisotropic)
    * embedding space. Map + ONE dim-keyed aggregate. Output:
    * (n_vectors, mean_pair_cos). */
  def isotropyAudit(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val fix = (1L << 40).toDouble
    // norm hoisted OUT of the element lambda: lambda bodies are exempt
    // from Catalyst CSE (the q25 shingler lesson), so an inline
    // sqrt(norm2(vec)) would recompute the full-vector norm per ELEMENT
    // — O(d²)/row instead of O(d)
    val unit = emb.select(col(idCol), col(vecCol).as("__vec"))
      .withColumn("__nrm", sqrt(norm2(col("__vec"))))
      .select(col(idCol),
        transform(col("__vec"), v => v.cast("double") / col("__nrm")).as("__u"))
    val perDim = unit.select(posexplode(col("__u")).as(Seq("__pos", "__v")))
      .groupBy(col("__pos"))
      .agg((sum(round(col("__v") * fix).cast("decimal(20,0)")).cast("double") / fix)
        .as("__s"))
    val n = emb.count()
    val nD = n.toDouble
    perDim.agg(sum(round(col("__s") * col("__s"), 9).cast("decimal(28,9)"))
        .as("__norm2"))
      .select(lit(n).as("n_vectors"),
        round((col("__norm2").cast("double") - lit(nD)) / lit(nD * (nD - 1.0)), 6)
          .as("mean_pair_cos"))
  }

  /** Reciprocal Rank Fusion (Cormack et al. '09) of ranked retrieval
    * lists: score(d) = Σ_lists 1/(kConst + rank_list(d)), absent-from-
    * list contributes 0. Each input frame carries (idCol, rank) with
    * rank 1-based. The lists are topN-bounded retrieval outputs, so
    * the fusion join is list-sized, never corpus-sized; contributions
    * fold in list order so the double sum is engine-stable. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, kConst: Int = 60,
      topN: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one list")
    val renamed = lists.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol), col("rank").as(s"__r$i"))
    }
    val joined = renamed.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = renamed.indices.map(i =>
        coalesce(lit(1.0) / (lit(kConst) + col(s"__r$i")), lit(0.0)))
      .reduce(_ + _)
    joined.withColumn("rrf", round(score, 6))
      .select(col(idCol), col("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topN)
  }

  /** Simplified silhouette per cluster (Hruschka et al. 2004's
    * centroid form of Rousseeuw '87): for each vector, a = cosine
    * distance to its OWN centroid, b = distance to the nearest OTHER
    * centroid, s = (b − a) / max(a, b) — the clustering-quality audit
    * that closes the k-means family (fit q89 → assignment → quality).
    * The centroid form is the 100 TB formulation: the classic pairwise
    * silhouette is O(n²) per cluster; against k literal centroids it is
    * a map-only pass (the `ivfCell` expression, extended to keep the
    * runner-up) plus ONE k-row aggregation.
    *
    * Determinism: per-cell sims are the same literal-centroid cosine
    * `ivfCell`/q89's oracle replays; the per-cell mean folds s through
    * 2^40 fixed-point sums (the q80 construction) so partitioning
    * can't reorder double adds. max(a,b) = 0 (vector identical to two
    * centroids) scores s = 0.
    * Output: (cell, n, mean_silhouette) per non-empty cell. */
  def silhouette(emb: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Float])]): DataFrame = {
    require(centroids.sizeIs >= 2, "silhouette needs k >= 2 centroids")
    val fix = (1L << 40).toDouble
    val sorted = reverse(array_sort(array(cellStructs(col(vecCol), centroids): _*)))
    val top = element_at(sorted, 1)
    val second = element_at(sorted, 2)
    val a = lit(1.0) - top.getField("sim")
    val b = lit(1.0) - second.getField("sim")
    val s = when(greatest(a, b) > 0, (b - a) / greatest(a, b))
      .otherwise(lit(0.0))
    emb.select((lit(0) - top.getField("negcid")).as("cell"), s.as("__s"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        round(sum(round(col("__s") * fix).cast("decimal(20,0)"))
          .cast("double") / fix / count(lit(1)), 6).as("mean_silhouette"))
      .orderBy(col("cell"))
  }

  /** Davies–Bouldin index per cluster (Davies & Bouldin '79, cosine-
    * distance form): S_i = mean distance of cell members to their
    * centroid, M_ij = distance between centroids, R_i = max_{j≠i}
    * (S_i + S_j) / M_ij — low R_i = compact and well-separated. The
    * companion audit to [[silhouette]] that reads separation from the
    * CENTROID geometry (k² driver-small pairs) instead of the runner-up
    * assignment.
    *
    * Scale shape: one map-only assignment pass + one k-row aggregation;
    * the M matrix is computed on the DRIVER from the k literal centroids
    * (k² doubles — model-sized by construction, the mmrRerank driver-
    * fold discipline: ascending-index double ops replay exactly in any
    * engine) and folds back in as a literal k²-row frame. Coincident
    * centroids (M_ij = 0) are excluded from the max — documented, both
    * engines alike; cells left empty by the fit don't appear (no S).
    * Output: (cell, n, s_intra, r_db) per non-empty cell. */
  def daviesBouldin(emb: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Float])]): DataFrame = {
    require(centroids.sizeIs >= 2, "daviesBouldin needs k >= 2 centroids")
    val fix = (1L << 40).toDouble
    val sorted = reverse(array_sort(array(cellStructs(col(vecCol), centroids): _*)))
    val top = element_at(sorted, 1)
    val sIntra = emb
      .select((lit(0) - top.getField("negcid")).as("cell"),
        (lit(1.0) - top.getField("sim")).as("__d"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("__d") * fix).cast("decimal(20,0)"))
          .cast("double") / fix / count(lit(1))).as("__s"))
      .localCheckpoint(false) // read by the pair join twice
    def cosD(x: Array[Float], y: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) {
        dot += x(i).toDouble * y(i).toDouble
        nx += x(i).toDouble * x(i).toDouble
        ny += y(i).toDouble * y(i).toDouble
        i += 1
      }
      1.0 - dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val m = for {
      (i, ci) <- centroids; (j, cj) <- centroids if i != j
    } yield (i, j, cosD(ci, cj))
    val mDf = broadcast(emb.sparkSession.createDataFrame(m)
      .toDF("cell", "__j", "__m").filter(col("__m") > 0))
    val r = sIntra.join(mDf, Seq("cell"))
      .join(sIntra.select(col("cell").as("__j"), col("__s").as("__sj")), Seq("__j"))
      .groupBy(col("cell"))
      .agg(max((col("__s") + col("__sj")) / col("__m")).as("__r"))
    sIntra.join(r, Seq("cell"))
      .select(col("cell"), col("n"), round(col("__s"), 6).as("s_intra"),
        round(col("__r"), 6).as("r_db"))
      .orderBy(col("cell"))
  }

  /** MAUVE (Pillutla et al. 2021, arXiv 2102.01454) in its exact
    * discrete quantized form — THE open-ended-generation distribution
    * metric: both embedding sets quantize to the SAME fixed centroid
    * cells (the `ivfCell` literal cosine argmax, ties to the smaller
    * cell id — identical to the q39 assignment its oracle replays),
    * giving two k-cell histograms P (rows where `refPred`) and Q (the
    * rest). The divergence frontier is traced over mixtures
    * R_λ = λ·P + (1−λ)·Q at λ = i/(lGrid+1), i = 1..lGrid, PLUS the two
    * exact mixture endpoints λ=0 and λ=1 (a support mismatch makes the
    * endpoint KL infinite → that coordinate is exactly 0); each point is
    *   ( exp(−c·KL(Q ‖ R_λ)), exp(−c·KL(P ‖ R_λ)) ).
    * MAUVE = trapezoid area under the x-sorted polyline, extended
    * horizontally from the leftmost point to the y-axis — which makes
    * the convention exact at both extremes: MAUVE(P, P) = 1 (every
    * point is (1,1); the extension closes the unit square) and
    * disjoint supports → the (1−λ)^c vs λ^c bow → → 0 as c grows.
    *
    * Determinism: P, Q, R are exact count ratios; each per-cell KL term
    * is 9-dp fixed point summed as exact decimal; exp sees the
    * double-cast sum; coordinates and per-trapezoid areas re-round to
    * 9 before the exact final sum — every float op has one fixed order,
    * mirrored literally by the oracle SQL.
    *
    * Scale shape: ONE partial-combining (cell × set) count over the
    * embeddings (the assignment is a zero-shuffle literal expression);
    * the collected state is the ≤|centroids|-row histogram (the k-means
    * driver-state contract), on which the λ-grid arithmetic is
    * driver-side closed form. Output: 1 row
    * (n_ref, n_cur, n_cells, mauve ← round 6). */
  def mauve(emb: DataFrame, idCol: String, vecCol: String, refPred: Column,
      centroids: Seq[(Int, Array[Float])], lGrid: Int = 9,
      c: Double = 5.0): DataFrame = {
    require(lGrid >= 1 && c > 0, s"need lGrid >= 1 and c > 0")
    val h = emb
      .select(refPred.as("__ref"), ivfCell(col(vecCol), centroids).as("__cell"))
      .groupBy(col("__cell"))
      .agg(sum(when(col("__ref"), 1L).otherwise(0L)).as("__pc"),
        sum(when(!col("__ref"), 1L).otherwise(0L)).as("__qc"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val np = h.map(_._1).sum
    val nq = h.map(_._2).sum
    require(np > 0 && nq > 0,
      s"mauve needs rows on both sides of refPred: ref=$np, cur=$nq")
    def r9(v: Double): Double =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // KL(A‖M_λ) with A's histogram `a` over total `na`, M_λ = λP+(1−λ)Q;
    // exact-decimal sum of round-9 per-cell terms, as the oracle does
    def kl(aOf: ((Long, Long)) => Long, na: Long, l: Double): Double =
      h.filter(aOf(_) > 0).map { cell =>
        val a = aOf(cell).toDouble / na.toDouble
        val p = cell._1.toDouble / np.toDouble
        val q = cell._2.toDouble / nq.toDouble
        BigDecimal(r9(a * math.log(a / (l * p + (1.0 - l) * q))))
      }.sum.toDouble
    val mismatchPQ = h.exists(cell => cell._1 > 0 && cell._2 == 0) // KL(P‖Q)=∞
    val mismatchQP = h.exists(cell => cell._2 > 0 && cell._1 == 0) // KL(Q‖P)=∞
    val grid = (1 to lGrid).map(i => i.toDouble / (lGrid + 1).toDouble)
    val pts =
      grid.map { l =>
        (r9(math.exp(-c * kl(_._2, nq, l))), r9(math.exp(-c * kl(_._1, np, l))))
      } ++ Seq(
        // λ=0: R=Q → x=1 exactly; y = exp(−c·KL(P‖Q)), 0 on mismatch
        (1.0, if (mismatchPQ) 0.0 else r9(math.exp(-c * kl(_._1, np, 0.0)))),
        // λ=1: R=P → y=1 exactly; x = exp(−c·KL(Q‖P)), 0 on mismatch
        (if (mismatchQP) 0.0 else r9(math.exp(-c * kl(_._2, nq, 1.0))), 1.0))
    val sorted = pts.sortBy(identity)
    val closed = (0.0, sorted.head._2) +: sorted
    val auc = closed.sliding(2).map {
      case Seq((x1, y1), (x2, y2)) => BigDecimal(r9((x2 - x1) * (y1 + y2) / 2.0))
      case _ => BigDecimal(0)
    }.sum.toDouble
    val spark = emb.sparkSession
    import spark.implicits._
    Seq((np, nq, h.length.toLong,
        BigDecimal(auc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("n_ref", "n_cur", "n_cells", "mauve")
  }

  /** Pair-sample budget contract for [[alignmentUniformity]] and
    * [[mmd]]: the bucket count is DERIVED from the input size as
    * B = max(1, ⌈n²/pairBudget⌉), so the materialized within-bucket
    * pair count stays ≈ pairBudget/2 in expectation (and ≤ pairBudget
    * with overwhelming margin under the md5-uniform hash) at ANY n —
    * the estimator cost is flat from a 500-row fixture (B=1, exact
    * statistic) to a 10¹⁰-row corpus (B≈10¹⁴, still ~budget/2 pairs).
    * A fixed B would instead carry an n²/B quadratic term to scale.
    * The oracle SQL derives the same B from the same count, so the
    * sample (and hence the hash gate) is replayable. */
  val PairSampleBudget = 1000000L

  private def derivedBuckets(n: Long, pairBudget: Long): Long = {
    require(pairBudget >= 1, s"pairBudget must be >= 1, got $pairBudget")
    math.max(1L, math.ceil(n.toDouble * n.toDouble / pairBudget).toLong)
  }

  /** Alignment & uniformity of an embedding space (Wang & Isola 2020)
    * — the two-number health check for contrastive/retrieval
    * embeddings: positives should be CLOSE (alignment, lower better)
    * while the whole cloud should spread over the sphere (uniformity,
    * more negative better; collapse → 0). On unit vectors
    * ‖x̂−ŷ̂‖² = 2(1−cos), so both reduce to the codegen'd cosine
    * kernel:
    *
    *   alignment  = E_{pos pairs} 2(1−cos)
    *   uniformity = ln E_{pairs} exp(−2·2(1−cos))
    *
    * Positive pairs are (2k, 2k+1) id pairs (the q447 even/odd
    * convention). The uniformity expectation is over a DETERMINISTIC
    * md5-bucket pair sample: ids hash into B groups and only
    * within-bucket pairs materialize, with B derived from the frame's
    * count under the [[PairSampleBudget]] contract (B=1 ⇒ the exact
    * statistic, which is what gate-scale inputs get). Per-pair terms
    * are 9-dp fixed point so both expectations are order-independent.
    *
    * Scale shape: one count on the checkpointed projection (prices B),
    * then one id-keyed self-join per statistic (the positive join
    * keyed by pair id; the uniformity join keyed by bucket with
    * ~budget/2 total fanout by construction) + partial-combining
    * sums. Output, 1 row: (n_pos, alignment, n_pairs, uniformity). */
  /** MMD² — maximum mean discrepancy (Gretton et al. 2012) with an RBF
    * kernel between two embedding sets on one frame: the kernel
    * two-sample test for "did the embedding distribution drift?" that
    * sees what per-dimension KS tests (q271) and cell histograms
    * (q447 MAUVE) can miss — full-joint, smooth sensitivity.
    *
    *   MMD² = E k(x,x′) + E k(y,y′) − 2·E k(x,y),
    *   k(a,b) = exp(−γ‖a−b‖²)
    *
    * Pair expectations run over the SAME deterministic md5-bucket pair
    * sample as [[alignmentUniformity]] (budget-derived B per the
    * [[PairSampleBudget]] contract; B=1 ⇒ exact), every squared
    * distance recovered from the codegen'd cosine/norm kernels
    * in one fixed float order, per-pair kernel values 9-dp fixed point
    * — order-independent and oracle-replayable. Can be (slightly)
    * negative — it's the biased-less U-ish estimator over sampled
    * pairs; NULL when any pair class is empty. Output, 1 row: (n_ref,
    * n_cur, pairs_xx, pairs_yy, pairs_xy, mmd2). */
  def mmd(emb: DataFrame, idCol: String, vecCol: String, isRef: Column,
      gamma: Double, pairBudget: Long = PairSampleBudget): DataFrame = {
    require(gamma > 0, s"gamma must be > 0, got $gamma")
    def d(c: Column) = c.cast("double")
    def dec9(c: Column) = round(c, 9).cast("decimal(28,9)")
    val e0 = emb.select(col(idCol).cast("long").as("__id"),
        col(vecCol).as("__v"), isRef.as("__x"))
      .filter(col("__id").isNotNull && col("__x").isNotNull)
      .localCheckpoint(false) // consumers: count + side counts + pair join
    val e = e0.withColumn("__b",
      pmod(Dedup.baseHash(col("__id").cast("string")),
        lit(derivedBuckets(e0.count(), pairBudget))))
    val sides = e.agg(
      sum(when(col("__x"), 1L).otherwise(0L)).as("n_ref"),
      sum(when(!col("__x"), 1L).otherwise(0L)).as("n_cur"))
    val l = e.select(col("__b"), col("__id").as("__i"),
      col("__v").as("__va"), col("__x").as("__xa"))
    val r = e.select(col("__b"), col("__id").as("__j"),
      col("__v").as("__vb"), col("__x").as("__xb"))
    val na = graft.functions.VectorOps.norm2Fast(col("__va"))
    val nb = graft.functions.VectorOps.norm2Fast(col("__vb"))
    val d2 = na + nb - lit(2.0) *
      (cosine(col("__va"), col("__vb")) * sqrt(na) * sqrt(nb))
    val pr = l.join(r, Seq("__b")).filter(col("__i") < col("__j"))
      .select(col("__xa"), col("__xb"),
        dec9(exp(lit(-gamma) * d2)).as("__k"))
    val zero = lit(0).cast("decimal(28,9)")
    val agg = pr.agg(
      sum(when(col("__xa") && col("__xb"), 1L).otherwise(0L)).as("pairs_xx"),
      sum(when(!col("__xa") && !col("__xb"), 1L).otherwise(0L)).as("pairs_yy"),
      sum(when(col("__xa") =!= col("__xb"), 1L).otherwise(0L)).as("pairs_xy"),
      sum(when(col("__xa") && col("__xb"), col("__k")).otherwise(zero)).as("__sxx"),
      sum(when(!col("__xa") && !col("__xb"), col("__k")).otherwise(zero)).as("__syy"),
      sum(when(col("__xa") =!= col("__xb"), col("__k")).otherwise(zero)).as("__sxy"))
    sides.crossJoin(agg).select(col("n_ref"), col("n_cur"),
      col("pairs_xx"), col("pairs_yy"), col("pairs_xy"),
      when(col("pairs_xx") > 0 && col("pairs_yy") > 0 && col("pairs_xy") > 0,
        round(d(col("__sxx")) / d(col("pairs_xx")) +
          d(col("__syy")) / d(col("pairs_yy")) -
          lit(2.0) * (d(col("__sxy")) / d(col("pairs_xy"))), 6)).as("mmd2"))
  }

  def alignmentUniformity(emb: DataFrame, idCol: String, vecCol: String,
      pairBudget: Long = PairSampleBudget): DataFrame = {
    def d(c: Column) = c.cast("double")
    def dec9(c: Column) = round(c, 9).cast("decimal(28,9)")
    val e = emb.select(col(idCol).cast("long").as("__id"),
        col(vecCol).as("__v"))
      .localCheckpoint(false) // consumers: count + positive + bucket pairs
    val x = e.filter(col("__id") % 2 === 0)
      .select((col("__id") / 2).as("__p"), col("__v").as("__x"))
    val y = e.filter(col("__id") % 2 === 1)
      .select(((col("__id") - 1) / 2).as("__p"), col("__v").as("__y"))
    val al = x.join(y, "__p")
      .select(dec9(lit(2.0) * (lit(1.0) -
        cosine(col("__x"), col("__y")))).as("__d2"))
      .agg(count(lit(1)).as("n_pos"), sum(col("__d2")).as("__sa"))
    val bkt = e.withColumn("__b",
      pmod(Dedup.baseHash(col("__id").cast("string")),
        lit(derivedBuckets(e.count(), pairBudget))))
    val l = bkt.select(col("__b"), col("__id").as("__i"), col("__v").as("__x"))
    val r = bkt.select(col("__b"), col("__id").as("__j"), col("__v").as("__y"))
    val un = l.join(r, Seq("__b")).filter(col("__i") < col("__j"))
      .select(dec9(exp(lit(-4.0) * (lit(1.0) -
        cosine(col("__x"), col("__y"))))).as("__e"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("__e")).as("__su"))
    al.crossJoin(un).select(col("n_pos"),
      round(d(col("__sa")) / d(col("n_pos")), 6).as("alignment"),
      col("n_pairs"),
      round(log(d(col("__su")) / d(col("n_pairs"))), 6).as("uniformity"))
  }
}
