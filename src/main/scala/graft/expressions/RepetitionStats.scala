package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass repetition statistics (Gopher-style repetition filters):
  * struct<n_tok long, n_uniq_tok long, ttr double, uniq_2gram_frac double>.
  *
  * Semantics replicate `TextAnalysis.repetitionStatsDeclarative` exactly
  * (equivalence pinned by tests): whitespace tokens of the lowercased
  * text, type-token ratio and distinct fraction of adjacent 2-grams, both
  * rounded with the engine-stable floor(x*1e4 + 0.5)/1e4 formula, 0.0 for
  * empty inputs.
  *
  * The declarative version walks the token array through four interpreted
  * higher-order functions (split, two array_distinct, zip_with); this is
  * one tokenization pass under whole-stage codegen.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("n_uniq_tok", LongType, nullable = false),
    StructField("ttr", DoubleType, nullable = false),
    StructField("uniq_2gram_frac", DoubleType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires string, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    RepetitionStatsEval.eval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.RepetitionStatsEval.eval($c)")
  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
  override def prettyName: String = "repetition_stats"
}

// standalone object: companion-object methods don't get reliable static
// forwarders for Janino (see SimHashEval)
object RepetitionStatsEval {

  private def r4(x: Double): Double = Math.floor(x * 10000.0 + 0.5) / 10000.0

  /** Exactly Java regex `\s` = [ \t\n\x0B\f\r] — the class the declarative
    * split uses. Character.isWhitespace is WIDER (U+2028 etc.) and would
    * diverge on exotic whitespace. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def eval(s: UTF8String): InternalRow = {
    // normalizeWs semantics: lowercase; tokenization on whitespace runs
    // makes the collapse/trim redundant. UTF8String.toLowerCase is the
    // locale-independent routine Spark's lower() uses — String.toLowerCase
    // would diverge under e.g. a Turkish JVM locale (I → dotless ı).
    val norm = s.toLowerCase.toString
    val len = norm.length

    var nTok = 0L
    var nGram = 0L
    val uniqTok = new java.util.HashSet[String]()
    val uniqGram = new java.util.HashSet[String]()
    var prev: String = null
    var i = 0
    while (i < len) {
      while (i < len && isWs(norm.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(norm.charAt(i))) i += 1
      if (i > start) {
        val w = norm.substring(start, i)
        nTok += 1
        uniqTok.add(w)
        if (prev != null) {
          nGram += 1
          uniqGram.add(prev + " " + w)
        }
        prev = w
      }
    }

    val ttr = if (nTok == 0L) 0.0 else r4(uniqTok.size.toDouble / nTok.toDouble)
    val gramFrac =
      if (nGram == 0L) 0.0 else r4(uniqGram.size.toDouble / nGram.toDouble)
    new GenericInternalRow(
      Array[Any](nTok, uniqTok.size.toLong, ttr, gramFrac))
  }
}

object RepetitionStats {
  def apply(c: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(c)))
}
