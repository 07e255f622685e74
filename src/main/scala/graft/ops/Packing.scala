package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: assign variable-length documents to
  * fixed-capacity context windows ("bins") with the deterministic NEXT-FIT
  * rule — walk the stratum's docs in id order, keep filling the current
  * bin while the doc fits, otherwise open a new bin. A doc longer than the
  * capacity gets a bin of its own (it overflows any bin by definition;
  * chunk such docs first — see `TextStats.chunkTokens`).
  *
  * Determinism is the point: the same corpus packs to the same bins on any
  * cluster layout, so a resumed training run reads identical sequences.
  *
  * Scale shape: packing is sequential WITHIN a stratum but embarrassingly
  * parallel ACROSS strata — one shuffle on the stratum key, then a
  * per-group fold. Strata must be bounded (a language, a source, a
  * hash-salted sub-stratum at 100 TB: `stratum || hash(id) % B` keeps
  * every group at a few thousand docs); the fold is a collect_list +
  * `aggregate` over that bounded group, never over the whole corpus.
  */
object Packing {

  /** (id, stratum, size) → (stratum, id, size, bin) with bin numbering
    * starting at 1 per stratum, next-fit in ascending-id order. */
  def packNextFit(df: DataFrame, idCol: String, stratumCol: String,
      sizeCol: String, capacity: Long): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    // state: (fill of current bin, current bin, packed items so far);
    // sort_array orders the collected structs by id (first field), which
    // makes the fold order — and therefore every bin id — deterministic.
    val items = sort_array(collect_list(struct(
      col(idCol).cast("long").as("id"), col(sizeCol).cast("long").as("sz"))))
    val zero = struct(lit(0L).as("fill"), lit(0L).as("bin"),
      array().cast("array<struct<id:bigint,sz:bigint,bin:bigint>>").as("out"))
    val packed = aggregate(items, zero,
      (st, x) => {
        val fits = st.getField("fill") + x.getField("sz") <= capacity &&
          st.getField("bin") >= 1L
        val bin = when(fits, st.getField("bin")).otherwise(st.getField("bin") + 1L)
        val fill = when(fits, st.getField("fill") + x.getField("sz"))
          .otherwise(x.getField("sz"))
        struct(fill.as("fill"), bin.as("bin"),
          concat(st.getField("out"), array(struct(
            x.getField("id").as("id"), x.getField("sz").as("sz"),
            bin.as("bin")))).as("out"))
      },
      st => st.getField("out"))
    df.groupBy(col(stratumCol))
      .agg(packed.as("__packed"))
      .select(col(stratumCol), explode(col("__packed")).as("__p"))
      .select(col(stratumCol), col("__p.id").as(idCol),
        col("__p.sz").as(sizeCol), col("__p.bin").as("bin"))
  }

  /** `packNextFit` + the token offsets a dataloader actually consumes:
    * each doc's [off_start, off_end) within its packed training
    * sequence (id-ascending within the bin, the fold order), so
    * cross-document attention masks and position ids can be built
    * without re-scanning the text. One extra window cumsum over the
    * already-packed rows — the partition key (stratum, bin) is
    * bin-sized, no skew by construction (bins hold ≤ capacity tokens). */
  def packWithOffsets(df: DataFrame, idCol: String, stratumCol: String,
      sizeCol: String, capacity: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol), col("bin"))
      .orderBy(col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    packNextFit(df, idCol, stratumCol, sizeCol, capacity)
      .withColumn("off_start", coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .withColumn("off_end", col("off_start") + col(sizeCol))
  }
}
