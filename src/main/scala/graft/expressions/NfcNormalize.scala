package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the text
  * hygiene pass a multilingual corpus needs BEFORE any byte-level dedup
  * or hashing: "é" arrives both precomposed (U+00E9) and decomposed
  * (e + U+0301) in real crawls, and every downstream exact-dedup key,
  * MinHash shingle, and blocklist match treats those as different
  * documents unless someone canonicalizes. NFC (UAX #15) is the
  * composition form — decomposed sequences collapse to their canonical
  * precomposed characters (Latin accents, Hangul jamo → syllables),
  * already-composed text is untouched, and the transform is idempotent.
  *
  * Spark ships no normalization builtin, so this wraps the JDK's
  * `java.text.Normalizer` (ICU-independent, pure JVM) behind the same
  * UnaryExpression shape as the other ten native expressions: codegen'd
  * (no UDF serialization wall), null-intolerant, string → string.
  *
  * Cross-engine contract: DuckDB's `nfc_normalize` implements the same
  * UAX #15 algorithm via utf8proc — an INDEPENDENT implementation — so
  * the q155 oracle is a genuine two-way check of the normalization
  * itself, not a replay of this code.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    NfcNormalizeEval.eval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalizeEval.eval($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

object NfcNormalizeEval {
  def eval(s: UTF8String): UTF8String = {
    val raw = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan for already-NFC
    // text (the overwhelming majority of real corpora) — skip the
    // allocation when nothing would change
    if (java.text.Normalizer.isNormalized(raw, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(raw, java.text.Normalizer.Form.NFC))
  }
}

object NfcNormalizeFn {
  def apply(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
