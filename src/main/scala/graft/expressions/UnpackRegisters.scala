package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** Unpack an m-byte packed register vector (each byte an UNSIGNED small
  * counter, the [[graft.functions.HllBytesAggregator]] wire format) into
  * array<int> for the declarative estimator math
  * ([[graft.functions.Hll.harmonicS]] et al.).
  *
  * Exists so iterated-sketch algorithms (HyperBall, q145) can carry
  * PACKED BINARY counters through their per-round join/aggregate
  * exchanges — m bytes per row instead of array<int>'s 4m + offsets —
  * and unpack only at the per-round 1-row summary. Native expression
  * with codegen: the unpack itself must not cost more than the shuffle
  * bytes it saves. */
case class UnpackRegisters(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unpack_registers requires binary, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    UnpackRegistersEval.eval(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.UnpackRegistersEval.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): UnpackRegisters =
    copy(child = newChild)

  override def prettyName: String = "unpack_registers"
}

object UnpackRegisters {
  def unpackRegisters(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(UnpackRegisters(ColumnBridge.expression(c)))
  }
}

/** Static eval target shared by interpreted mode and generated code
  * (the SimHashEval convention: a plain object gets a static forwarder
  * Janino can resolve). */
object UnpackRegistersEval {
  def eval(bytes: Array[Byte]): ArrayData = {
    val out = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i) & 0xff; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}
