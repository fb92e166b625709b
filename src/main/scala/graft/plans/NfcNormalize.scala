package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical-composition pass a dedup
  * pipeline runs BEFORE hashing: 'e' + COMBINING ACUTE and the
  * precomposed 'é' are the same text but different bytes, so without
  * it every hash-based dedup (exact, MinHash, SimHash) silently treats
  * them as distinct documents. Compatibility characters (ligatures,
  * fullwidth forms) are deliberately preserved — that's NFKC, a lossy
  * choice a pipeline must opt into.
  *
  * Thin codegen'd wrapper over `java.text.Normalizer` (the work is the
  * library call either way; the wrapper keeps the expression inside
  * whole-stage codegen with no fallback row boxing). Oracle engines
  * with utf8proc (`nfc_normalize`) produce identical output — NFC is
  * stabilized across Unicode versions for assigned codepoints.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes = org.apache.spark.sql.graft.TypeShim.oneString
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.NfcNormalize.normalize($a)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan and almost
    // all real text (all of ASCII) is already NFC — skip the rebuild
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfc_normalize(c: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      NfcNormalize(org.apache.spark.sql.graft.ColumnShim.expression(c)))
}
