package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Random-hyperplane LSH band values over an `array<double>` vector, in
  * one fused pass: each element is 2^20 fixed-point quantized ONCE
  * (floor(v_i·2^20 + 0.5) — IEEE-identical on every engine), every
  * plane's integer sign-bit dot accumulates simultaneously, and the bits
  * pack into `bands` longs of `bitsPerBand` bits.
  *
  * Semantically identical to the declarative reference
  * ([[graft.operators.Similarity.lshSignature]] over
  * [[graft.operators.Similarity.quantize]] — SimilaritySpec pins the
  * equivalence) but one native loop instead of bands×bitsPerBand
  * aggregate-over-zip_with trees, each of which re-evaluates the
  * quantize transform and materializes an intermediate array after
  * CollapseProject inlines the shared projection. Candidate generation
  * is the hot loop of every ANN/near-dup variant here — the same reason
  * [[SimHash64]] and [[CosineSimilarity]] are native.
  *
  * Plane weights are sha256-derived integers ([[LshBandsEval.weights]]),
  * the q106/q107 oracle contract. Dimensions beyond the vector's length
  * contribute 0; a null vector yields null; a null ELEMENT inside the
  * first `dim` entries poisons every dot (the zip_with null semantics of
  * the declarative form), yielding all-zero bits.
  */
case class LshBands(child: Expression, bands: Int, bitsPerBand: Int, dim: Int)
    extends UnaryExpression {
  require(bands > 0 && bitsPerBand > 0 && bitsPerBand <= 63)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_bands requires array<double>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any =
    LshBandsEval.eval(input.asInstanceOf[ArrayData], bands, bitsPerBand, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.LshBandsEval.eval($c, $bands, $bitsPerBand, $dim)")

  override protected def withNewChildInternal(newChild: Expression): LshBands =
    copy(child = newChild)

  override def prettyName: String = "lsh_bands"
}

object LshBands {
  def lshBands(c: Column, bands: Int, bitsPerBand: Int, dim: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(LshBands(ColumnBridge.expression(c), bands, bitsPerBand, dim))
  }
}

/** Static entry point shared by interpreted eval and generated code (the
  * [[SimHashEval]] forwarder rationale). */
object LshBandsEval {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Long]]]

  /** weight(p, d) = (first byte of sha256("p:d:lshp")) - 128, an integer
    * in [-128, 127] — replayable by any engine with sha256 (the q106
    * oracle rebuilds the set with two strpos lookups per weight).
    * Computed once per (planes, dim) per JVM. */
  def weights(planes: Int, dim: Int): Array[Array[Long]] =
    cache.computeIfAbsent((planes, dim), { key =>
      val (np, nd) = key
      val md = java.security.MessageDigest.getInstance("SHA-256")
      Array.tabulate(np) { p =>
        Array.tabulate(nd) { d =>
          ((md.digest(s"$p:$d:lshp".getBytes("UTF-8"))(0) & 0xff) - 128).toLong
        }
      }
    })

  def eval(arr: ArrayData, bands: Int, bitsPerBand: Int, dim: Int): ArrayData = {
    val nPlanes = bands * bitsPerBand
    val w = weights(nPlanes, dim)
    val n = math.min(arr.numElements(), dim)
    // quantize once; a null element inside [0, dim) poisons every dot
    // (declarative zip_with semantics), so all bits fall to 0
    val q = new Array[Long](n)
    var poisoned = false
    var d = 0
    while (d < n && !poisoned) {
      if (arr.isNullAt(d)) poisoned = true
      else q(d) = math.floor(arr.getDouble(d) * 1048576.0 + 0.5).toLong
      d += 1
    }
    val out = new Array[Long](bands)
    if (!poisoned) {
      var p = 0
      while (p < nPlanes) {
        val wp = w(p)
        var dot = 0L
        var i = 0
        while (i < n) { dot += q(i) * wp(i); i += 1 }
        if (dot >= 0) out(p / bitsPerBand) |= 1L << (p % bitsPerBand)
        p += 1
      }
    }
    new GenericArrayData(out)
  }
}
