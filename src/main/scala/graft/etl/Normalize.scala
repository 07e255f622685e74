package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-normalization column library (pure Catalyst expressions, zero UDFs).
  *
  * Re-expresses the reference's string pre-processing surface
  * (`/root/reference/data_processing_program_20240520.py:1-58` — F1-F5 in
  * SURVEY.md §2.3) as composable `Column => Column` functions so they stay
  * inside whole-stage codegen and scale linearly with no shuffle.
  */
object Normalize {

  /** Collapse any whitespace run to a single space.
    * (reference: `re.sub(r'\s+', ' ', x)` at py:52-58) */
  def collapseWs(c: Column): Column = regexp_replace(c, "\\s+", " ")

  /** Replace the punctuation class `,()[]:;` with spaces, delete `/` and `*`,
    * collapse whitespace, trim, uppercase — the reference's
    * `pre_processing` (py:22-37). Runs as ONE fused character-pass
    * expression (graft.functions.PreProcessExpr); `preProcessDeclarative`
    * is the 4-pass translate/regex chain it is property-tested
    * bit-identical to (and the form the DuckDB oracles mirror). */
  def preProcess(c: Column): Column = graft.functions.PreProcess.fused(c)

  /** The declarative chain (kept for the equivalence property test and as
    * oracle documentation). One `translate` does both the space-mapping AND
    * the deletions (chars in `from` beyond `to`'s length are removed — in
    * Spark and DuckDB alike). */
  def preProcessDeclarative(c: Column): Column =
    upper(trim(collapseWs(translate(c, ",()[]:;/*", "       "))))

  /** Remove every space (reference model-key cleanup, notebook cells 60/82).
    * `translate` with an empty to-string deletes — no regex engine. */
  def stripSpaces(c: Column): Column = translate(c, " ", "")

  /** One alias rule: if `matchToken` is true match on whole tokens of the text
    * (reference: `'CAT' in text.split(' ')`), else substring containment. */
  final case class AliasRule(needle: String, prefix: String, matchToken: Boolean = false)

  /** Supplier-alias → brand prefixing (reference `deal_special_brand`, py:1-18).
    * Applies the FIRST matching rule (the reference's if/elif chain). */
  def applyAliases(c: Column, rules: Seq[AliasRule]): Column =
    rules.foldRight(c) { (r, acc) =>
      val hit =
        if (r.matchToken) array_contains(split(c, " "), r.needle)
        else c.contains(r.needle)
      when(hit, concat_ws(" ", lit(r.prefix), c)).otherwise(acc)
    }

  /** The reference's concrete alias table (py:1-18). */
  val customsAliases: Seq[AliasRule] = Seq(
    AliasRule("XUZHOU CONSTRUCTION MACHINERY", "XCMG"),
    AliasRule("CAT", "CATERPILLAR", matchToken = true),
    AliasRule("MANITOWOC", "GROVE"),
    AliasRule("MARUBENI", "KOMATSU"),
    AliasRule("TOYOTA TSUSHO", "TAKEUCHI"),
    AliasRule("SHANDONG LINGONG", "SDLG"),
    AliasRule("HIDROMEK", "HIDROMEK"))
}
