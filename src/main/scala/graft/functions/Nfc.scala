package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical composition as a native codegen'd expression —
  * the text-normalization step every multi-source ingest needs before
  * hashing, deduplication, or tokenization: the SAME visible string can
  * arrive precomposed (é = U+00E9) from one crawler and decomposed
  * (e + U+0301) from another, and every downstream equality (exact-dup
  * md5 keys, shingle hashes, vocab counts) silently treats them as
  * different documents until the corpus is normalized to one form.
  *
  * Cross-engine contract: Unicode normalization is a versioned but
  * fully-specified algorithm (UAX #15) — the JVM's `java.text
  * .Normalizer` and DuckDB's `nfc_normalize` implement the same
  * canonical composition, so an oracle replays it exactly. The kernel
  * takes the `isNormalized` quick-check fast path first: NFC is the
  * identity on pure-ASCII (and most already-composed) text, so the
  * common case costs one scan of the bytes, no string rebuild. */
object Nfc {

  def nfc(c: Column): Column =
    GraftBridge.column(NfcExpr(GraftBridge.expression(c)))

  case class NfcExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "nfc_normalize"

    override def nullSafeEval(s: Any): Any =
      NfcKernel.normalize(s.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s =>
        // top-level object → static forwarder Janino can resolve
        s"${ev.value} = graft.functions.NfcKernel.normalize($s);")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }
}

/** Shared by NfcExpr's interpreted eval and generated code. Top level
  * so generated Java sees a static method. */
object NfcKernel {
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
