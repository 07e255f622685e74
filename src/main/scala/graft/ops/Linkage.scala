package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — Fellegi–Sunter pair scoring (Fellegi &
  * Sunter, JASA 1969; the model behind Splink/dedupe-style entity
  * resolution). The reference resolves near-duplicate machine listings by
  * containment/regex matching (SURVEY §2.5); this is the statistical
  * generalisation a 100 TB curation pipeline uses when no single field is
  * authoritative: candidate pairs from a blocking key, per-field
  * agreement weights log2(m/u) (agree) / log2((1-m)/(1-u)) (disagree),
  * summed to a match score.
  *
  * Scale shape: pair generation is ONE self-equi-join on the blocking
  * key (never a cross join); everything after runs on the candidate-pair
  * table, whose size the blocking key controls. m/u parameters are
  * model-sized literals baked into codegen'd `when` chains — no lookup
  * join, no UDF. Skewed blocks are the operator's documented knob: pick
  * blocking columns with bounded fan-out (or salt them) exactly as the
  * LSH band join does. */
object Linkage {

  /** Per-field comparison spec: equality on `field` with assumed
    * m = P(agree | match) and u = P(agree | non-match). */
  final case class FieldSpec(field: String, m: Double, u: Double) {
    /** log2 agreement / disagreement weights — computed once on the
      * driver so both engines see identical double literals. */
    val agreeW: Double = math.log(m / u) / math.log(2.0)
    val disagreeW: Double = math.log((1.0 - m) / (1.0 - u)) / math.log(2.0)
  }

  /** Candidate pairs (id_a < id_b sharing `blockCol`) scored by the
    * Fellegi–Sunter log-odds sum over `fields`, in declaration order so
    * the float sum is order-fixed and engine-exact. Output:
    * (id_a, id_b, score) with score rounded to 6. */
  def fellegiSunterPairs(df: DataFrame, idCol: String, blockCol: Column,
      fields: Seq[FieldSpec]): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), blockCol.as("__blk"),
      struct(fields.map(f => col(f.field)): _*).as("__fa"))
    val b = df.select(col(idCol).as("id_b"), blockCol.as("__blk"),
      struct(fields.map(f => col(f.field)): _*).as("__fb"))
    val score = fields.zipWithIndex.map { case (f, i) =>
      when(col("__fa").getField(f.field) === col("__fb").getField(f.field),
        lit(f.agreeW)).otherwise(lit(f.disagreeW))
    }.reduce(_ + _)
    a.join(b, Seq("__blk")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(score, 6).as("score"))
  }

  /** Score-band triage of the scored pairs: band = floor(score),
    * decision by the (reviewLo, matchHi] thresholds. Output per
    * (band, decision): pair count — the linkage-quality histogram a
    * clerical-review queue is sized from. */
  def fellegiSunterBands(pairs: DataFrame, reviewLo: Double,
      matchHi: Double): DataFrame =
    pairs.select(floor(col("score")).cast("long").as("band"),
        when(col("score") > matchHi, lit("match"))
          .when(col("score") <= reviewLo, lit("nonmatch"))
          .otherwise(lit("review")).as("decision"))
      .groupBy(col("band"), col("decision"))
      .agg(count(lit(1)).as("n_pairs"))
}
