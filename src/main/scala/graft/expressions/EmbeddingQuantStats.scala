package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass embedding hygiene bundle: L2 norm, symmetric int8
  * quantization and its max dequantization error for an embedding
  * column, as a single native expression —
  * struct<norm double, scale double, q array<int>, max_err double>.
  *
  * Semantics replicate the declarative recipe in
  * [[graft.operators.Embeddings]] bit-for-bit on well-formed inputs
  * (equivalence pinned by tests): doubles accumulate in element order,
  * floats widen exactly, q_i = floor(x_i / scale * 127 + 0.5) (half-up —
  * reproducible across engines, unlike rint's half-even), the zero
  * vector quantizes to zeros with scale 0 and err 0. Degenerate inputs
  * DIVERGE from the declarative chain by design, trading its
  * null-poisoning for totality: an EMPTY array yields
  * (0, 0, [], 0) where array_max-based recipes yield nulls, and a null
  * SLOT reads as 0.0 where the declarative chain nulls the row — both
  * shapes are pinned in EmbeddingsSpec; embedding columns are expected
  * non-empty and null-free.
  *
  * The declarative formulation pays for itself four times over: Catalyst
  * collapses the projection so the `transform`/`zip_with`/`aggregate`
  * chain (interpreted — higher-order functions never enter whole-stage
  * codegen) is re-evaluated per consuming column, ~0.5 ms per 64-dim
  * row. This expression is one codegen'd pass, and the struct is
  * computed once however many fields the projection reads.
  */
case class EmbeddingQuantStats(child: Expression) extends UnaryExpression {
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def dataType: DataType = StructType(Seq(
    StructField("norm", DoubleType, nullable = false),
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("max_err", DoubleType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"embedding_quant_stats requires array<float|double>, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    EmbeddingQuantStatsEval.eval(input.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.EmbeddingQuantStatsEval.eval($c, $isFloat)")
  override protected def withNewChildInternal(newChild: Expression): EmbeddingQuantStats =
    copy(child = newChild)
  override def prettyName: String = "embedding_quant_stats"
}

// standalone object: companion-object methods don't get reliable static
// forwarders for Janino (see SimHashEval)
object EmbeddingQuantStatsEval {
  def eval(arr: ArrayData, isFloat: Boolean): InternalRow = {
    val n = arr.numElements()
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      // null slots read as 0.0 (ArrayData.getFloat on a null slot is
      // undefined); embedding arrays are expected null-free
      x(i) =
        if (arr.isNullAt(i)) 0.0
        else if (isFloat) arr.getFloat(i).toDouble
        else arr.getDouble(i)
      i += 1
    }
    // pass 1: norm (sequential element-order sum, like the declarative
    // aggregate fold) and scale = max |x_i|
    var sumSq = 0.0
    var scale = 0.0
    i = 0
    while (i < n) {
      sumSq += x(i) * x(i)
      val a = math.abs(x(i))
      if (a > scale) scale = a
      i += 1
    }
    val norm = math.sqrt(sumSq)
    // pass 2: quantize + max dequantization error
    val q = new Array[Int](n)
    var maxErr = 0.0
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        val qi = Math.floor(x(i) / scale * 127.0 + 0.5).toInt
        q(i) = qi
        val err = math.abs(x(i) - (qi.toDouble * scale) / 127.0)
        if (err > maxErr) maxErr = err
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](norm, scale, new GenericArrayData(q), maxErr))
  }
}

object EmbeddingQuantStats {
  def apply(c: Column): Column =
    ColumnBridge.column(EmbeddingQuantStats(ColumnBridge.expression(c)))
}
