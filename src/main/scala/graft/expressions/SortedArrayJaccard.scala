package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Exact Jaccard similarity of two SORTED DISTINCT array<bigint> columns
  * (the shape [[HashedCharShingles]] produces) via a single merge pass —
  * O(n+m) primitive comparisons, no hash sets, no boxing. Used to verify
  * LSH candidate pairs, where it replaces
  * size(array_intersect)/size(array_union) in the inner loop of
  * corpus-dedup verification.
  *
  * Jaccard of two empty sets is defined as 0.0.
  */
case class SortedArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sorted_array_jaccard requires (array<bigint>, array<bigint>), got $other")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardEval.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.JaccardEval.jaccard($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedArrayJaccard =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_array_jaccard"
}

object JaccardEval {
  /** Intersection size of two SORTED DISTINCT long arrays — one merge
    * pass, shared by [[SortedArrayJaccard]] and [[SortedArrayOverlap]]. */
  def overlap(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var common = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { common += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    common
  }

  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0
    var j = 0
    var common = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { common += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    common.toDouble / (na + nb - common)
  }
}

object SortedArrayJaccard {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(SortedArrayJaccard(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Intersection COUNT of two sorted distinct array<bigint> columns — the
  * integer numerator the containment join (q135) compares as
  * tauDen·overlap ≥ tauNum·|x| with no float anywhere in the decision. */
case class SortedArrayOverlap(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sorted_array_overlap requires (array<bigint>, array<bigint>), got $other")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardEval.overlap(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.JaccardEval.overlap($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedArrayOverlap =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_array_overlap"
}

object SortedArrayOverlap {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(SortedArrayOverlap(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
