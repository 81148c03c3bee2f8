package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass UTF-8 validation statistics over a BINARY column — the
  * encoding-hygiene pass a crawled corpus needs before any text op:
  * crawl payloads routinely carry Latin-1 mixed into UTF-8, truncated
  * multi-byte sequences at chunk boundaries, and CESU/surrogate junk,
  * and every downstream tokenizer either throws or silently corrupts
  * (mojibake) unless the pipeline measures and gates encoding validity
  * first.
  *
  * Returns struct<n_bytes int, n_ascii int, n_seq2 int, n_seq3 int,
  * n_seq4 int, n_bad_lead int, n_stray_cont int, is_valid boolean>.
  *
  * Semantics: the RFC 3629 well-formedness table applied by a
  * sequential scanner with SKIP-1 error recovery — a visited byte that
  * begins a well-formed sequence consumes it (counted by length:
  * ascii/seq2/seq3/seq4, with overlongs, surrogates U+D800–DFFF, and
  * code points above U+10FFFF all rejected via the constrained-second-
  * byte rules for E0/ED/F0/F4); any other visited byte counts as ONE
  * error (bad_lead for C0/C1/F5–FF and malformed-follower leads,
  * stray_cont for an uncovered continuation byte) and the scan advances
  * one byte. Because continuation bytes can never begin a sequence,
  * UTF-8 self-synchronizes: the scanner provably visits EVERY
  * non-continuation position, so the result is also expressible as a
  * position-local classification (each position classified from at most
  * 3 following and 3 preceding bytes) — which is exactly how the q159
  * DuckDB oracle replays it with window functions, no recursion. The
  * equivalence of the two formulations is pinned by Utf8StatsSpec's
  * fuzz cross-check.
  */
case class Utf8Stats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("n_ascii", IntegerType, nullable = false),
    StructField("n_seq2", IntegerType, nullable = false),
    StructField("n_seq3", IntegerType, nullable = false),
    StructField("n_seq4", IntegerType, nullable = false),
    StructField("n_bad_lead", IntegerType, nullable = false),
    StructField("n_stray_cont", IntegerType, nullable = false),
    StructField("is_valid", BooleanType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"utf8_stats requires binary, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Utf8StatsEval.eval(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Utf8StatsEval.eval($c)")
  override protected def withNewChildInternal(newChild: Expression): Utf8Stats =
    copy(child = newChild)
  override def prettyName: String = "utf8_stats"
}

object Utf8StatsEval {
  def eval(bytes: Array[Byte]): InternalRow = {
    val n = bytes.length
    var ascii = 0; var s2 = 0; var s3 = 0; var s4 = 0
    var bad = 0; var stray = 0
    @inline def cont(k: Int): Boolean = k < n && (bytes(k) & 0xc0) == 0x80
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xff
      if (b < 0x80) { ascii += 1; i += 1 }
      else if (b < 0xc0) { stray += 1; i += 1 }
      else if (b >= 0xc2 && b <= 0xdf) {
        if (cont(i + 1)) { s2 += 1; i += 2 } else { bad += 1; i += 1 }
      } else if (b == 0xe0) {
        // second byte A0..BF: rejects overlong 3-byte forms
        if (i + 2 < n && (bytes(i + 1) & 0xff) >= 0xa0 &&
          (bytes(i + 1) & 0xff) <= 0xbf && cont(i + 2)) { s3 += 1; i += 3 }
        else { bad += 1; i += 1 }
      } else if (b == 0xed) {
        // second byte 80..9F: rejects UTF-16 surrogates U+D800..DFFF
        if (i + 2 < n && (bytes(i + 1) & 0xff) >= 0x80 &&
          (bytes(i + 1) & 0xff) <= 0x9f && cont(i + 2)) { s3 += 1; i += 3 }
        else { bad += 1; i += 1 }
      } else if (b >= 0xe1 && b <= 0xef) { // E1..EC, EE..EF
        if (cont(i + 1) && cont(i + 2)) { s3 += 1; i += 3 }
        else { bad += 1; i += 1 }
      } else if (b == 0xf0) {
        // second byte 90..BF: rejects overlong 4-byte forms
        if (i + 3 < n && (bytes(i + 1) & 0xff) >= 0x90 &&
          (bytes(i + 1) & 0xff) <= 0xbf && cont(i + 2) && cont(i + 3)) {
          s4 += 1; i += 4
        } else { bad += 1; i += 1 }
      } else if (b >= 0xf1 && b <= 0xf3) {
        if (cont(i + 1) && cont(i + 2) && cont(i + 3)) { s4 += 1; i += 4 }
        else { bad += 1; i += 1 }
      } else if (b == 0xf4) {
        // second byte 80..8F: rejects code points above U+10FFFF
        if (i + 3 < n && (bytes(i + 1) & 0xff) >= 0x80 &&
          (bytes(i + 1) & 0xff) <= 0x8f && cont(i + 2) && cont(i + 3)) {
          s4 += 1; i += 4
        } else { bad += 1; i += 1 }
      } else { bad += 1; i += 1 } // C0, C1, F5..FF: never valid in UTF-8
    }
    new GenericInternalRow(Array[Any](n, ascii, s2, s3, s4, bad, stray,
      bad == 0 && stray == 0))
  }
}

object Utf8StatsFn {
  def apply(c: Column): Column =
    ColumnBridge.column(Utf8Stats(ColumnBridge.expression(c)))
}
