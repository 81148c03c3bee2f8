package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array (near-duplicate fingerprint).
  *
  * For each token we take a 64-bit hash; each hash bit votes +1/-1 into a
  * 64-slot tally; the result's bit i is set iff tally(i) > 0. Documents
  * whose SimHashes are within a small Hamming distance are near-duplicates
  * (Charikar 2002, "Similarity estimation techniques from rounding
  * algorithms" — public algorithm).
  *
  * Implemented as a native Catalyst expression (single pass over the token
  * array, primitive long math, with codegen) rather than 64 aggregate
  * higher-order-function expressions or a Scala UDF: this sits in the hot
  * path of corpus-scale dedup, where per-row cost dominates.
  *
  * Null tokens inside the array are ignored; a null array yields null.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires array<string>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHashEval.eval(arr)
  }

  // SimHashEval is a top-level object with no companion class, so scalac
  // emits a static forwarder Janino can resolve from generated code.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHashEval.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  def simhash64(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
  }
}

/** Static entry point shared by interpreted eval and generated code.
  * Deliberately NOT the case-class companion: a companion of a class does
  * not reliably get static forwarders, and codegen needs a plain static
  * call target. */
object SimHashEval {
  def eval(arr: ArrayData): Long = {
    val tally = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        val h = hash64(t)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (tally(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** xxHash64-seeded token hash via Spark's own UTF8String hashing,
    * avalanched so low bits are usable as independent votes. */
  private def hash64(s: UTF8String): Long = {
    var h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes(), 42).toLong
    // splitmix64 finalizer to spread 32-bit murmur into 64 well-mixed bits
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }
}
