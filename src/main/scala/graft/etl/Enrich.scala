package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Enrichment expressions: interval bucketing, token classifiers, quantity
  * extraction (SURVEY.md §2.9 B1-B4, §2.3 F7/F8). All pure Column trees —
  * they stay in whole-stage codegen and need no shuffle.
  */
object Enrich {

  /** Fixed working-scenario buckets (reference
    * `define_excavator_load_type_interval`, py:406-431). */
  def fixedBuckets(v: Column): Column =
    when(v.isNull || v <= 0, "UNKNOWN")
      .when(v < 5, "<5T")
      .when(v < 10, "5-10T")
      .when(v < 30, "10-30T")
      .when(v < 70, "30-70T")
      .when(v < 90, "70-90T")
      .otherwise("≥90T")

  /** Dynamic width-`w` buckets above the fixed low end (reference
    * `define_load_interval`, py:343-402): 0/null → UNKNOWN, <5 → "<5T",
    * 5-10 → "5-10T", else "[i·w, (i+1)·w)" labels like "20-30T". */
  def dynamicBuckets(v: Column, w: Int): Column = {
    val lo = (floor(v / w) * w).cast("int")
    when(v.isNull || v <= 0, "UNKNOWN")
      .when(v < 5, "<5T")
      .when(v < 10, "5-10T")
      .otherwise(concat(lo.cast("string"), lit("-"), (lo + w).cast("string"), lit("T")))
  }

  /** Crane-mode buckets (reference `define_load_interval` crane branch,
    * py:381-402): only known capacities are labeled — no unit-weight
    * fallback, no fixed 5/10T low end; `<w` → "<wT", then w-wide bands. */
  def craneBuckets(v: Column, w: Int): Column = {
    val lo = (floor(v / w) * w).cast("int")
    when(v.isNull || v <= 0, "UNKNOWN")
      .when(v < w, s"<${w}T")
      .otherwise(concat(lo.cast("string"), lit("-"), (lo + w).cast("string"), lit("T")))
  }

  /** Used/new classifier (reference py:146-158, `new_or_used` py:533-546):
    * token-EQUALITY (not substring) against used markers ∪ year tokens
    * 1950-2018, then an override to "new" when NEW/UNUSED appears. */
  def usedNew(
      text: Column,
      usedMarkers: Seq[String],
      newMarkers: Seq[String],
      yearLo: Int = 1950,
      yearHi: Int = 2018): Column =
    // fused single token-scan expression; `usedNewDeclarative` is the
    // spec-equivalent 3-pass form the oracles mirror
    graft.functions.UsedNew.fused(text, usedMarkers, newMarkers, yearLo, yearHi)

  /** Declarative form (split + overlaps + per-token year regex), kept for
    * the equivalence property test and oracle documentation. */
  def usedNewDeclarative(
      text: Column,
      usedMarkers: Seq[String],
      newMarkers: Seq[String],
      yearLo: Int = 1950,
      yearHi: Int = 2018): Column = {
    val toks = split(text, " ")
    // year test via string compare (lexicographic == numeric for 4-digit
    // tokens) — no cast, so ANSI mode can't error on non-numeric tokens
    val usedHit =
      arrays_overlap(toks, lit(usedMarkers.toArray)) ||
        exists(toks, t =>
          t.rlike("^\\d{4}$") && t >= lit(yearLo.toString) && t <= lit(yearHi.toString))
    val newHit = arrays_overlap(toks, lit(newMarkers.toArray))
    when(newHit, "new").when(usedHit, "used").otherwise("new")
  }

  /** Number-word → digit extraction (reference `extract_number_word`,
    * py:582-607): first number word found in `text` mapped through `words`. */
  def numberWord(text: Column, words: Map[String, Int]): Column = {
    val pat = "\\b(" + words.keys.toSeq.sorted.mkString("|") + ")\\b"
    val hit = regexp_extract(text, pat, 1)
    val m = typedLit(words)
    try_element_at(m, hit) // null on miss (ANSI element_at would error)
  }

  /** "<n> UNITS"-style count extraction (reference `extract_units` py:550-558):
    * first integer captured by `pat` group 1, null when absent. */
  def extractInt(text: Column, pat: String): Column = {
    val s = regexp_extract(text, pat, 1)
    when(s === "", lit(null)).otherwise(s).cast("int")
  }

  /** Decimal capacity from free text (reference `search_capacity` py:239-252):
    * e.g. pattern "(\\d+(?:\\.\\d+)?)\\s*(?:METRIC\\s*)?TONS?\\b". */
  def extractDouble(text: Column, pat: String): Column = {
    val s = regexp_extract(text, pat, 1)
    when(s === "", lit(null)).otherwise(s).cast("double")
  }
}
