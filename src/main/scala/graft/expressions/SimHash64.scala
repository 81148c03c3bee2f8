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
/** @param shaHash token-hash selector: false = murmur+splitmix (fast,
  *        the corpus-scale default), true = first 8 bytes of
  *        SHA-256(token) big-endian — ~10x slower per token but
  *        bit-replicable by any engine with a sha256 function, which is
  *        what lets the q28 oracle replay the whole pipeline in SQL. The
  *        voting/banding/Hamming machinery is identical in both modes. */
case class SimHash64(child: Expression, shaHash: Boolean = false)
    extends UnaryExpression {
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
    SimHashEval.eval(arr, shaHash)
  }

  // SimHashEval is a top-level object with no companion class, so scalac
  // emits a static forwarder Janino can resolve from generated code.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHashEval.eval($c, $shaHash)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  def simhash64(c: Column, shaHash: Boolean = false): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c), shaHash))
  }
}

/** Static entry point shared by interpreted eval and generated code.
  * Deliberately NOT the case-class companion: a companion of a class does
  * not reliably get static forwarders, and codegen needs a plain static
  * call target. */
object SimHashEval {
  def eval(arr: ArrayData, shaHash: Boolean): Long = {
    val tally = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        val h = if (shaHash) shaHash64(t) else hash64(t)
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
  private val shaDigest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }

  /** First 8 bytes of SHA-256(token), big-endian — the SQL-replicable
    * token hash (engines agree on sha256 of the UTF-8 bytes; bit b here
    * is bit (b % 4) of hex digit (15 - b/4) of the hex form). */
  private def shaHash64(s: UTF8String): Long = {
    val d = shaDigest.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (bytes(i) & 0xFFL); i += 1 }
    h
  }

  private def hash64(s: UTF8String): Long = {
    var h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes(), 42).toLong
    // splitmix64 finalizer to spread 32-bit murmur into 64 well-mixed bits
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }
}
