package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression — the first step of
  * text canonicalization in a training-data pipeline: composed and
  * decomposed encodings of the same glyph ("é" vs "e"+U+0301) must hash,
  * dedup, and shingle identically, or every byte-level operator silently
  * treats them as different documents.
  *
  * Spark has no built-in normalization function; this wraps the JDK's
  * `java.text.Normalizer` (Unicode 15 NFC) behind codegen so the
  * projection stays inside whole-stage codegen — no UDF serialization,
  * no interpreted fallback. The DuckDB oracle twin is its built-in
  * `nfc_normalize`; both implement the same Unicode normalization
  * algorithm, and the fixture corpus is ASCII (NFC-invariant), so oracle
  * rows verify the plumbing while the spec pins the non-ASCII semantics.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize requires a string input, got $t")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcUtil.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcUtil.nfc($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcUtil {
  /** NFC-normalize; skips the (quick-check) allocation for strings that
    * are already NFC — the overwhelmingly common case for clean corpora.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }
}
