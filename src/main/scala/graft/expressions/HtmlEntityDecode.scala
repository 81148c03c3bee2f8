package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML character-reference decoding (13th native expression) — the
  * markup-stripping companion: crawled text arrives with `&amp;`,
  * `&#233;`, `&#x41;` baked in, and a corpus that tokenizes them as-is
  * learns `&amp;` as a word. Returns struct<decoded string,
  * n_decoded int>.
  *
  * Semantics — one LEFT-TO-RIGHT pass, decoded output is never
  * re-scanned (so `&amp;amp;` decodes exactly once, to `&amp;`):
  *  - `&#D;` (1-7 decimal digits) and `&#xH;`/`&#XH;` (1-6 hex digits)
  *    decode to the code point when it is a Unicode scalar value
  *    (rejects surrogates and > U+10FFFF — left verbatim);
  *  - `&name;` decodes for the documented named subset (the HTML4
  *    Latin-1/punctuation core: amp lt gt quot apos nbsp copy reg trade
  *    mdash ndash hellip ldquo rdquo lsquo rsquo laquo raquo deg middot
  *    eacute egrave agrave ccedil auml ouml uuml szlig);
  *  - anything else after `&` (unknown name, missing `;`, bare `&`) is
  *    preserved verbatim — the lossless default for text that only
  *    looks like markup ("AT&T", "R&D;(sic)").
  */
case class HtmlEntityDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("decoded", StringType, nullable = false),
    StructField("n_decoded", IntegerType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_entity_decode requires string, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    HtmlEntityDecodeEval.eval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HtmlEntityDecodeEval.eval($c)")
  override protected def withNewChildInternal(newChild: Expression): HtmlEntityDecode =
    copy(child = newChild)
  override def prettyName: String = "html_entity_decode"
}

object HtmlEntityDecodeEval {
  private val named: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    Seq(
      "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
      "apos" -> "'", "nbsp" -> "\u00A0", "copy" -> "©",
      "reg" -> "®", "trade" -> "™", "mdash" -> "—",
      "ndash" -> "–", "hellip" -> "…", "ldquo" -> "“",
      "rdquo" -> "”", "lsquo" -> "‘", "rsquo" -> "’",
      "laquo" -> "«", "raquo" -> "»", "deg" -> "°",
      "middot" -> "·", "eacute" -> "é", "egrave" -> "è",
      "agrave" -> "à", "ccedil" -> "ç", "auml" -> "ä",
      "ouml" -> "ö", "uuml" -> "ü", "szlig" -> "ß",
    ).foreach { case (k, v) => m.put(k, v) }
    m
  }

  private def isScalar(cp: Int): Boolean =
    cp >= 0 && cp <= 0x10ffff && !(cp >= 0xd800 && cp <= 0xdfff)

  def eval(s: UTF8String): InternalRow = {
    val raw = s.toString
    val n = raw.length
    val sb = new java.lang.StringBuilder(n)
    var decoded = 0
    var i = 0
    while (i < n) {
      val c = raw.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        var handled = false
        if (i + 2 < n && raw.charAt(i + 1) == '#') {
          val hex = raw.charAt(i + 2) == 'x' || raw.charAt(i + 2) == 'X'
          val ds = if (hex) i + 3 else i + 2
          var j = ds
          val maxLen = if (hex) 6 else 7
          while (j < n && j - ds < maxLen &&
            (if (hex) Character.digit(raw.charAt(j), 16) >= 0
             else raw.charAt(j) >= '0' && raw.charAt(j) <= '9')) j += 1
          if (j > ds && j < n && raw.charAt(j) == ';') {
            val cp = Integer.parseInt(raw.substring(ds, j), if (hex) 16 else 10)
            if (isScalar(cp)) {
              sb.appendCodePoint(cp); decoded += 1; i = j + 1; handled = true
            }
          }
        } else if (i + 1 < n) {
          var j = i + 1
          while (j < n && j - i <= 8 && {
            val ch = raw.charAt(j)
            (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z')
          }) j += 1
          if (j > i + 1 && j < n && raw.charAt(j) == ';') {
            val rep = named.get(raw.substring(i + 1, j))
            if (rep != null) {
              sb.append(rep); decoded += 1; i = j + 1; handled = true
            }
          }
        }
        if (!handled) { sb.append('&'); i += 1 }
      }
    }
    new GenericInternalRow(Array[Any](UTF8String.fromString(sb.toString), decoded))
  }
}

object HtmlEntityDecodeFn {
  def apply(c: Column): Column =
    ColumnBridge.column(HtmlEntityDecode(ColumnBridge.expression(c)))
}
