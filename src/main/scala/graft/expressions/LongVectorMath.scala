package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Integer vector kernels as native expressions (optimization r13,
  * guide §4/§1.2 "per-task work": prefer codegen expressions over
  * interpreted higher-order-function chains in hot loops) — the
  * [[CosineSimilarity]] precedent applied to the INTEGER lanes:
  * quantized k-means / PQ assignment distances, PQ ADC lookups, DBSCAN
  * sign projections, and semantic-dedup integer cosine gates all run
  * `aggregate(zip_with(a, b, ...))` over `array<long>` pairs, three
  * interpreted passes per pair. One fused primitive-long pass with
  * whole-stage codegen replaces each.
  *
  * Overflow semantics: plain JVM long arithmetic (wraps), NOT
  * ANSI-checked — callers must bound their operands, which every call
  * site already does structurally (2^20-quantized unit-norm vectors:
  * |a_i·b_i| < 2^42, dim ≤ 64 keeps sums < 2^48; semDedup additionally
  * guards with its loud n2Cap raise). Mismatched lengths combine the
  * common prefix (callers guarantee equal dims); null inputs yield
  * null. */
object LongVectorEval {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  def sqDist(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }
}

/** Σ aᵢ·bᵢ over two array<long> columns — one fused codegen pass. */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"long_dot requires (array<bigint>, array<bigint>), got $other")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    LongVectorEval.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.LongVectorEval.dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "long_dot"
}

object LongDot {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(LongDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Σ (aᵢ−bᵢ)² over two array<long> columns — one fused codegen pass. */
case class LongSqDist(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"long_sq_dist requires (array<bigint>, array<bigint>), got $other")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    LongVectorEval.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.LongVectorEval.sqDist($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongSqDist =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "long_sq_dist"
}

object LongSqDist {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(LongSqDist(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
