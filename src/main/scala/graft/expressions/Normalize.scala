package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Text dedup/fingerprinting is wrong without it: "Café" composed
  * (U+00E9) and decomposed (U+0065 U+0301) are byte-different, hash to
  * different fingerprints, and defeat exact dedup — canonical
  * equivalence must be collapsed BEFORE hashing. Spark has no built-in
  * for it (the ICU collation machinery is disabled on this build — see
  * the verify skill); `java.text.Normalizer` behind a codegen'd unary
  * expression keeps the hot path inside whole-stage codegen, and DuckDB's
  * `nfc_normalize` (utf8proc) computes the identical canonical form, so
  * the oracle mirrors it exactly.
  */
object NormalizeImpl {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: real-world text is overwhelmingly already NFC, and
    // isNormalized is a cheap quick-check scan
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** nfc_normalize(text) → text in Unicode Normalization Form C. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  }

  override def nullSafeEval(t: Any): Any =
    NormalizeImpl.nfc(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expressions.NormalizeImpl.nfc($t);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
