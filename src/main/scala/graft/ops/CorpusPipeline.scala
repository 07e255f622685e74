package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end LLM training-data preparation pipeline — the
  * corpus-side counterpart of the customs ETL's 13-stage `etl.Pipeline`:
  *
  *   1. quality gate (`TextStats.qualityKeep`) — map-only;
  *   2. exact dedup, canonical = MIN id per normalized content hash
  *      (deterministic, unlike dropDuplicates' arbitrary row) — one
  *      shuffle on the hash;
  *   3. near-dup clusters on the survivors (MinHash LSH pairs →
  *      connected components) and keep each cluster's canonical doc;
  *   4. token-window chunking (`TextStats.chunkTokens`) — map-only;
  *   5. next-fit packing of the chunks into fixed-capacity context
  *      windows per stratum (`Packing.packNextFit`).
  *
  * Returns one row per packed chunk:
  * (stratum, id, chunk_idx, n_tokens, bin).
  *
  * Every stage is the registry-proven operator — this object only
  * composes them, so the oracle for the whole chain (q81) is assembled
  * from the same CTE pieces that gate each stage individually.
  */
object CorpusPipeline {

  /** Stage 2: exact dedup with MIN-id canonical — one shuffle on the
    * normalized content hash; lineage cut at the branch point (shared by
    * `run` and `attrition` so the two cannot drift). */
  private def exactDedup(q: DataFrame, idCol: String,
      textCol: String): DataFrame =
    q.withColumn("__h", md5(regexp_replace(trim(lower(col(textCol))), "\\s+", " ")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__h")).orderBy(col(idCol).asc)))
      .filter(col("__rn") === 1).drop("__h", "__rn")
      .localCheckpoint(eager = false)

  /** Per-stage ATTRITION accounting of the document-level pipeline —
    * (stage_idx, stage, n_docs, n_dropped, drop_rate), the release-report
    * table that says WHERE the corpus went ("quality ate 12 %, near-dup
    * another 9 %"). Stages are the literal `run` constructions (the
    * shared `exactDedup` helper and the same registry-proven operators),
    * so the accounting cannot drift from the pipeline it describes.
    *
    * Scale shape: four distributed counts (1-row aggregates) over the
    * staged frames; the dedup/cluster stages carry the same one-shuffle /
    * edge-touched-iteration contracts they are gated under individually.
    * The O(#stages) result rows assemble driver-side (the Funnel-counts
    * contract). */
  def attrition(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", stopwords: Seq[String] = Seq("the", "a"),
      jaccardThreshold: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val n0 = docs.count()
    val q = docs.filter(TextStats.qualityKeep(col(textCol), stopwords))
    val exd = exactDedup(q, idCol, textCol)
    val n1 = q.count()
    val n2 = exd.count()
    val pairs = Dedup.minhashPairs(exd, idCol, textCol,
      threshold = jaccardThreshold)
    val clusters = Dedup.connectedComponents(
      exd.select(col(idCol)), idCol, pairs)
    val n3 = Dedup.keepCanonical(exd, idCol, clusters).count()
    val stages = Seq((0, "input", n0), (1, "quality", n1),
      (2, "exact_dedup", n2), (3, "near_dedup", n3))
    stages.zip(-1L +: stages.map(_._3).init).map {
      case ((i, name, n), prev) =>
        val dropped = if (prev < 0) 0L else prev - n
        val rate = if (prev <= 0) 0.0 else dropped.toDouble / prev.toDouble
        (i, name, n, dropped, rate)
    }.toDF("stage_idx", "stage", "n_docs", "n_dropped", "drop_rate")
  }

  def run(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      stratumCol: String = "lang", stopwords: Seq[String] = Seq("the", "a"),
      chunk: Int = 32, stride: Int = 24, capacity: Long = 256L,
      jaccardThreshold: Double = 0.5, starCc: Boolean = false): DataFrame = {
    // 1. quality gate
    val q = docs.filter(TextStats.qualityKeep(col(textCol), stopwords))
    // 2. exact dedup, min-id canonical
    // branch point: exd feeds the pair generation, the cluster vertex
    // set, the canonical keep AND (via kept) the chunker — cut the
    // lineage once so the quality expressions + dedup window don't
    // re-execute per branch (same rationale as etl.Pipeline's cuts;
    // `checkpoint` on a real cluster)
    val exd = exactDedup(q, idCol, textCol)
    // 3. near-dup clusters → canonical only. `starCc` swaps in the
    // large-star/small-star contraction (q101) for corpora whose dup
    // chains outrun min-label propagation's O(diameter) bound — both
    // produce identical (id, min-label) tables, so everything downstream
    // (and the q81 oracle) is unchanged.
    val pairs = Dedup.minhashPairs(exd, idCol, textCol, threshold = jaccardThreshold)
    val vertices = exd.select(col(idCol))
    val clusters =
      if (starCc) Dedup.connectedComponentsStar(vertices, idCol, pairs)
      else Dedup.connectedComponents(vertices, idCol, pairs)
    val kept = Dedup.keepCanonical(exd, idCol, clusters)
    // 4. chunk; per-chunk token count via the same single-space convention
    val chunks = kept.select(col(stratumCol), col(idCol),
        explode(TextStats.chunkTokens(col(textCol), chunk, stride)).as("__c"))
      .select(col(stratumCol), col(idCol),
        col("__c.chunk_idx").as("chunk_idx"),
        size(split(col("__c.chunk_text"), " ")).cast("long").as("n_tokens"))
    // 5. pack chunks in (doc, chunk) order per stratum; the packing item
    // id encodes that order in one sortable long.
    // ENCODING CONTRACT: 0 <= doc_id <= (Long.MaxValue − 999999)/10^6
    // (= 9 223 372 036 853 — the bound must leave room for the LARGEST
    // admissible chunk_idx: Long.MaxValue/10^6 would overflow at
    // chunk_idx ≥ 775 808) and 0 <= chunk_idx < 10^6 — outside that,
    // id·10^6 + chunk overflows or the DIV/% decode truncates toward zero
    // and mis-orders (negative ids). 10^6 chunks at stride 24 is a
    // ~24M-token document, and 9×10^12 ids is 90 docs per human alive —
    // roomy, but data-dependent, so the guard is a distributed
    // assert_true (a codegen'd comparison per row, not a driver-side
    // sample) that fails the job rather than silently corrupting the
    // packing order. Tested at both boundary edges in
    // CorpusPipelineContractSpec.
    val maxDoc = (Long.MaxValue - 999999L) / 1000000L
    val items = chunks
      .withColumn("__guard", assert_true(
        col(idCol).cast("long").between(0L, maxDoc) &&
          col("chunk_idx") >= 0 && col("chunk_idx") < 1000000,
        concat(lit(s"CorpusPipeline item encoding needs 0 <= $idCol <= " +
            s"$maxDoc and 0 <= chunk_idx < 1000000; got " +
            s"$idCol="), col(idCol), lit(" chunk_idx="), col("chunk_idx"))))
      .filter(col("__guard").isNull).drop("__guard")
      .withColumn("__item",
        col(idCol).cast("long") * 1000000L + col("chunk_idx"))
    Packing.packNextFit(items, "__item", stratumCol, "n_tokens", capacity)
      .select(col(stratumCol),
        expr("__item DIV 1000000").as(idCol),
        (col("__item") % 1000000L).cast("int").as("chunk_idx"),
        col("n_tokens"), col("bin"))
  }

  /** Pipeline V2 — the round-7-continuation stages composed end to end:
    *
    *   1. blocklist screen (`TextStats.blocklistHit`, Aho-Corasick) —
    *      map-only;
    *   2. quality gate (`TextStats.qualityKeep`) — map-only;
    *   3. exact dedup, MIN-id canonical — one hash shuffle;
    *   4. EXACT substring dedup (`Dedup.dedupSpans`, Lee et al.
    *      keep-first): every surviving doc loses its non-canonical
    *      duplicated regions; docs scrubbed to nothing drop out;
    *   5. next-fit packing WITH offsets of the CLEANED token counts per
    *      stratum (`Packing.packWithOffsets`).
    *
    * Returns one row per packed doc: (stratum, id, n_clean, bin,
    * off_start, off_end, cleaned_hash) — the md5 of the cleaned text
    * rides along so the packed corpus is content-addressable.
    *
    * Every stage is the registry-proven operator (q162/q75/q24/q166/
    * q163); this only composes them, and the q181 oracle assembles from
    * the same CTE pieces. Scale shape = the union of the member
    * contracts; the only additions are the lineage cut at the dedup
    * branch point and one join to carry (stratum, cleaned_hash). */
  def runV2(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", stratumCol: String = "lang",
      blocklist: Seq[String], stopwords: Seq[String] = Seq("the", "a"),
      spanK: Int = 5, capacity: Long = 256L): DataFrame = {
    val screened = docs.filter(
      TextStats.blocklistHit(col(textCol), blocklist).isNull)
    val q = screened.filter(TextStats.qualityKeep(col(textCol), stopwords))
    val exd = exactDedup(q, idCol, textCol)
    val cleaned = Dedup.dedupSpans(
      exd.select(col(idCol), col(textCol)), idCol, textCol, spanK)
    // branch point: d feeds both the packing fold and the hash join-back
    // — cut the lineage once so the span-dedup chain runs once
    val d = exd.select(col(idCol), col(stratumCol))
      .join(cleaned, Seq(idCol.replace("`", "")))
      .withColumn("n_clean", col("n_tokens") - col("n_removed"))
      .filter(col("n_clean") > 0)
      .localCheckpoint(eager = false)
    // packNextFit's fold keeps only (stratum, id, size, bin): join the
    // content hash back on the unique id (hash-keyed, no skew)
    Packing.packWithOffsets(
        d.select(col(idCol), col(stratumCol), col("n_clean")),
        idCol, stratumCol, "n_clean", capacity)
      .join(d.select(col(idCol), col("cleaned_hash")), Seq(idCol.replace("`", "")))
      .select(col(stratumCol), col(idCol), col("n_clean"), col("bin"),
        col("off_start"), col("off_end"), col("cleaned_hash"))
  }
}
