package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression with
  * whole-stage codegen (VERDICT r12 #8) — Spark ships no NFC function,
  * and the preference order for extensions is a native `Expression`
  * over any UDF (SURVEY.md §2.9). Semantics are exactly
  * `java.text.Normalizer.normalize(s, Form.NFC)`: canonical
  * decomposition followed by canonical composition — the idempotent
  * canonical form every downstream text operator should see. DuckDB's
  * `nfc_normalize` implements the same Unicode algorithm, which is
  * what makes the `text_normalize` oracle possible.
  *
  * The common ASCII fast path skips the Normalizer call entirely: NFC
  * is the identity on ASCII, and `Normalizer.isNormalized` is a cheap
  * scan — web-scale corpora are overwhelmingly already-NFC. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFKC normalization — the COMPATIBILITY-folding sibling of
  * [[NfcNormalize]] (VERDICT r13 #5): compatibility decomposition then
  * canonical composition, so presentation variants collapse to their
  * plain forms (ﬁ → fi, ² → 2, full-width Ａ → A, ℕ → N). The right
  * canonical form when downstream matching should ignore presentation
  * (dedup shingling, search keys); NFC remains the default inside
  * [[graft.ext.TextOps.normalizeText]] because NFKC is LOSSY (it
  * erases typographic intent). Same ASCII/isNormalized fast path and
  * codegen shape as NFC. Registered as `graft_nfkc`. */
case class NfkcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfkc requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfkc"

  override def nullSafeEval(input: Any): Any =
    NfkcNormalize.nfkc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfkcNormalize.nfkc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfkcNormalize =
    copy(child = newChild)
}

object NfkcNormalize {
  /** Shared by interpreted eval and generated code. */
  def nfkc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFKC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFKC))
  }
}
