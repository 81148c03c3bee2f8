package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the MinHash dedup hot path (SURVEY.md §7.7 /
  * north-star dedup). The declarative formulation (transform/aggregate
  * higher-order functions) is correct but interpreted per element — at
  * k=128 hash functions × hundreds of shingles × billions of docs that
  * dominates the stage. These two expressions run the same math as tight
  * primitive JVM loops with whole-stage codegen glue:
  *
  *  - [[HashedCharShingles]]: string → sorted distinct array<bigint> of
  *    character n-gram hashes, skipping the intermediate array<string>
  *    entirely (no per-shingle UTF8String allocation).
  *  - [[MinHashSignature]]: array<bigint> shingle hashes → array<bigint>
  *    signature of k universal-hash minima.
  *
  * JVM long arithmetic wraps silently, so none of the ANSI-mode overflow
  * constraints that shape the declarative version apply here.
  */
case class HashedCharShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "shingle size must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_char_shingles requires string, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    MinHashEval.shingleHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.MinHashEval.shingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): HashedCharShingles =
    copy(child = newChild)
  override def prettyName: String = "hashed_char_shingles"
}

case class MinHashSignature(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {
  require(k > 0, "signature length must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<bigint>, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    MinHashEval.signature(input.asInstanceOf[ArrayData], k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.MinHashEval.signature($c, $k, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

/** Static eval targets (top-level object → static forwarders for Janino). */
object MinHashEval {
  /** 2^31-1, NOT 2^61-1: with coefficients a,b < 2^31 and x < 2^31 the
    * product a*x+b < 2^62 wraps a 61-bit modulus at most once, leaving
    * (a*x+b) mod p monotone in x for most a — every hash function then
    * elects the globally-smallest shingle and the signature stops being
    * min-wise (a near-dup pair whose one unshared shingle holds that
    * minimum disagrees on almost every slot, at any band geometry). With
    * the 31-bit Mersenne prime the same product wraps ~2^31 times —
    * proper universal hashing — and every intermediate still fits ANSI
    * long arithmetic in the declarative twin (Dedup.minhashSignature). */
  val MersennePrime: Long = (1L << 31) - 1

  /** Deterministic per-(k,seed) coefficient pairs, cached. Matches
    * graft.operators.Dedup.coeffs: a in [1, 2^31-1), b in [0, 2^31-1) —
    * nextInt's bounds keep a strictly inside (0, p) so a mod p != 0. */
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()

  def coefficients(k: Int, seed: Long): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent((k, seed), { case (kk, ss) =>
      val rnd = new scala.util.Random(ss)
      val as = new Array[Long](kk)
      val bs = new Array[Long](kk)
      var i = 0
      while (i < kk) {
        as(i) = rnd.nextInt(Int.MaxValue - 1).toLong + 1
        bs(i) = rnd.nextInt(Int.MaxValue).toLong
        i += 1
      }
      (as, bs)
    })

  /** Sorted distinct hashes of all length-n char windows of s. */
  def shingleHashes(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    if (len < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val m = len - n + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 1125899906842597L
      var j = i
      val end = i + n
      while (j < end) { h = h * 31 + str.charAt(j); j += 1 }
      // splitmix64 finalizer: decorrelate nearby windows
      h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
      h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
      hs(i) = h ^ (h >>> 31)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted array
    var w = 1
    i = 1
    while (i < m) {
      if (hs(i) != hs(i - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == m) hs else java.util.Arrays.copyOf(hs, w))
  }

  /** k universal-hash minima over the shingle-hash array. Empty input →
    * all-MersennePrime sentinel signature (matches the declarative path). */
  def signature(xs: ArrayData, k: Int, seed: Long): ArrayData = {
    val (as, bs) = coefficients(k, seed)
    val sig = new Array[Long](k)
    val n = xs.numElements()
    if (n == 0) {
      java.util.Arrays.fill(sig, MersennePrime)
      return UnsafeArrayData.fromPrimitiveArray(sig)
    }
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      // fold to [0, 2^31) exactly like pmod(h, 2^31) in the declarative path
      val x = {
        val r = xs.getLong(i) % (1L << 31)
        if (r < 0) r + (1L << 31) else r
      }
      var f = 0
      while (f < k) {
        val h = (as(f) * x + bs(f)) % MersennePrime
        if (h < sig(f)) sig(f) = h
        f += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }
}

object MinHash {
  def hashedCharShingles(c: Column, n: Int): Column =
    ColumnBridge.column(HashedCharShingles(ColumnBridge.expression(c), n))
  def minhashSignature(c: Column, k: Int, seed: Long = 42L): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(c), k, seed))
}
