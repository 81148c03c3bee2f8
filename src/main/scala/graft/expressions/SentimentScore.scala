package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native sentiment scorer (SURVEY.md §7.2 step 6 — the upgrade from the
  * declarative formulation): tokenize + lexicon lookup + mean in one
  * primitive pass with a static hash map, under whole-stage codegen.
  * Semantics are identical to `graft.functions.Sentiment.sentiment`
  * (equivalence is pinned by a test); that declarative version remains
  * as the executable reference implementation.
  *
  * Returns struct<polarity:double, subjectivity:double>; (0.0, 0.0) when
  * no token matches the lexicon (TextBlob's neutral default).
  */
case class SentimentScore(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("polarity", DoubleType, nullable = false),
    StructField("subjectivity", DoubleType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sentiment_score requires string, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    SentimentEval.eval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SentimentEval.eval($c)")
  override protected def withNewChildInternal(newChild: Expression): SentimentScore =
    copy(child = newChild)
  override def prettyName: String = "sentiment_score"
}

object SentimentEval {
  // immutable maps built once per JVM from the canonical lexicon
  private val pol = new java.util.HashMap[String, java.lang.Double]()
  private val sub = new java.util.HashMap[String, java.lang.Double]()
  graft.functions.Sentiment.lexicon.foreach { case (w, (p, s)) =>
    pol.put(w, p); sub.put(w, s)
  }

  def eval(s: UTF8String): InternalRow = {
    val str = s.toString.toLowerCase
    var sumP = 0.0
    var sumS = 0.0
    var n = 0
    var i = 0
    val len = str.length
    while (i < len) {
      // skip whitespace
      while (i < len && Character.isWhitespace(str.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(str.charAt(i))) i += 1
      if (i > start) {
        val w = str.substring(start, i)
        val p = pol.get(w)
        if (p != null) {
          sumP += p
          sumS += sub.get(w)
          n += 1
        }
      }
    }
    if (n == 0) new GenericInternalRow(Array[Any](0.0, 0.0))
    else new GenericInternalRow(Array[Any](sumP / n, sumS / n))
  }
}

object SentimentScore {
  def apply(c: Column): Column =
    ColumnBridge.column(SentimentScore(ColumnBridge.expression(c)))
}
