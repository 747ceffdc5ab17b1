package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization — the
  * first step of the standard pretraining text-cleanup pass (decomposed
  * accents, compatibility ligatures typed by different tools all map
  * to one canonical byte sequence, so dedup/shingling/tokenization see
  * one spelling).
  *
  * Why an Expression over a UDF: it stays inside whole-stage codegen,
  * and the kernel has a zero-allocation fast path — `isNormalized`
  * (a quick-check scan over the chars) returns the INPUT UTF8String
  * untouched when the text is already NFC, which at corpus scale is
  * almost every row; only the rare decomposed row pays the
  * String materialization + renormalize.
  *
  * Null in → null out (standard null-propagating unary).
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val kernel = "graft.expressions.NfcNormalize$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$kernel.normalize($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** Fast path: already-NFC text (the overwhelming case) is returned
    * as the same UTF8String — no String round-trip, no copy.
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
