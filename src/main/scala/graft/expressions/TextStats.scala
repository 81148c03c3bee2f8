package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text statistics: language ID + quality score + BPE-ish token
  * count as a single native expression returning
  * struct<lang_pred string, quality double, n_bpe int>.
  *
  * Semantics replicate `graft.operators.TextAnalysis`'s declarative
  * formulations exactly (equivalence is pinned by tests): language ID is
  * the stopword profile with the most DISTINCT hits (ascending language
  * code breaks ties, "und" when nothing hits); quality combines length
  * band, punctuation density, mean word length and stopword ratio with
  * the documented weights, rounded like Spark's round(x, 4).
  *
  * The declarative versions traverse the text ~6× through interpreted
  * higher-order functions; this runs once per row under codegen.
  */
case class TextStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("lang_pred", StringType, nullable = false),
    StructField("quality", DoubleType, nullable = false),
    StructField("n_bpe", IntegerType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_stats requires string, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    TextStatsEval.eval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextStatsEval.eval($c)")
  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
  override def prettyName: String = "text_stats"
}

object TextStatsEval {
  import graft.operators.TextAnalysis.stopwordProfiles

  private val langs: Array[String] = stopwordProfiles.keys.toArray.sorted
  private val profiles: Array[java.util.HashSet[String]] = langs.map { l =>
    val s = new java.util.HashSet[String]()
    stopwordProfiles(l).foreach(s.add)
    s
  }
  private val allStopwords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwordProfiles.values.flatten.foreach(s.add)
    s
  }
  // same classes the declarative regexes use
  private val punctPattern = java.util.regex.Pattern.compile("[\\p{Punct}]")
  private val bpePattern =
    java.util.regex.Pattern.compile("[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]")

  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  def eval(s: UTF8String): InternalRow = {
    val raw = s.toString
    // normalizeWs: lowercase + collapse whitespace runs + trim
    val norm = raw.toLowerCase.replaceAll("\\s+", " ").trim

    // single tokenization pass over norm
    var nToks = 0
    var stopHits = 0
    // distinct profile hits per language
    val langHits = new Array[java.util.HashSet[String]](langs.length)
    var li = 0
    while (li < langs.length) { langHits(li) = new java.util.HashSet[String](); li += 1 }
    val len = norm.length
    var i = 0
    while (i < len) {
      while (i < len && norm.charAt(i) == ' ') i += 1
      val start = i
      while (i < len && norm.charAt(i) != ' ') i += 1
      if (i > start) {
        val w = norm.substring(start, i)
        nToks += 1
        if (allStopwords.contains(w)) stopHits += 1
        var l = 0
        while (l < langs.length) {
          if (profiles(l).contains(w)) langHits(l).add(w)
          l += 1
        }
      }
    }

    // language: max distinct hits, first (ascending code) wins ties, und if 0
    var best = 0
    var l = 0
    while (l < langs.length) {
      if (langHits(l).size > best) best = langHits(l).size
      l += 1
    }
    var lang = "und"
    if (best > 0) {
      var found = false
      l = 0
      while (l < langs.length && !found) {
        if (langHits(l).size == best) { lang = langs(l); found = true }
        l += 1
      }
    }

    // quality components (identical formulas to TextAnalysis.qualityScore)
    val nChars = len.toDouble
    var punct = 0
    val pm = punctPattern.matcher(norm)
    while (pm.find()) punct += 1
    val stopRatio = if (nToks == 0) 0.0 else stopHits.toDouble / nToks
    val meanWordLen = if (nToks == 0) 0.0 else (nChars - (nToks - 1)) / nToks
    val lengthOk = if (nChars >= 50 && nChars <= 20000) 1.0 else 0.3
    val punctOk = if (nChars == 0) 0.0
      else if (punct / nChars < 0.2) 1.0 else 0.4
    val wordLenOk = if (meanWordLen >= 2.5 && meanWordLen <= 12.0) 1.0 else 0.4
    val stopOk = if (stopRatio > 0.05) 1.0 else 0.6
    val quality = round4(
      lengthOk * 0.3 + punctOk * 0.25 + wordLenOk * 0.25 + stopOk * 0.2)

    // BPE-ish count on the RAW text (matches TextFunctions.bpeTokenCount)
    var nBpe = 0
    val bm = bpePattern.matcher(raw)
    while (bm.find()) nBpe += 1

    new GenericInternalRow(Array[Any](UTF8String.fromString(lang), quality, nBpe))
  }
}

object TextStats {
  def apply(c: Column): Column =
    ColumnBridge.column(TextStats(ColumnBridge.expression(c)))
}
