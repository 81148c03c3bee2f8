package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** HyperLogLog with REPLAYABLE registers — the third distinct-counting
  * surface next to exact `countDistinct` and the KMV sketch
  * ([[KmvAggregator]], q102):
  *
  *   - `approx_count_distinct` (q35) is Spark's HLL++ — mergeable, but
  *     its register encoding is engine-internal, so only a tolerance
  *     contract is testable against another engine.
  *   - KMV (q102) replays exactly everywhere, but its state is k hash
  *     VALUES (k×8 bytes) and its merge is a sorted merge.
  *   - THIS class is a register-vector HLL over the same deterministic
  *     sha256-prefix hash ([[KmvAggregator.kmvHash]]): per-group state
  *     is a FIXED m = 2^p BYTE vector, merge is elementwise max (the
  *     cheapest merge of any mergeable sketch — associative, commutative,
  *     idempotent), and because bucket index, rank, and the harmonic sum
  *     are integer arithmetic end to end, ANY ANSI engine replays the
  *     registers AND the raw estimate bit-for-bit. That is what puts
  *     q116's estimates under the DuckDB value hash rather than a
  *     tolerance gate.
  *
  * 100 TB shape: the partial (map-side) aggregate bounds per-group state
  * at m bytes; the exchange carries one m-byte row per (task, group); a
  * day×group partial-sketch table supports rolling windows by register
  * max (the q113 pattern with an even cheaper merge). Idempotence of max
  * additionally makes replayed partials collapse for free in a streaming
  * sink (the KmvStream argument, stronger here: max-merge absorbs exact
  * duplicates AND subset re-aggregations).
  *
  * Estimator (Flajolet et al. 2007): raw E = alpha_m * m^2 / sum_j
  * 2^{-reg_j}. The harmonic denominator is computed in EXACT fixed point:
  * with R = 48 - p + 1 the maximum possible rank, sum_j 2^{-reg_j} =
  * S / 2^R where S = sum_j 2^{R - reg_j} is an integer ≤ m * 2^R < 2^63
  * for every supported p — so S replays exactly, and the one floating
  * division happens on bit-identical operands in any IEEE engine. The
  * small-range linear-counting correction (E ≤ 2.5m with empty
  * registers) needs `ln`, which is NOT correctly rounded across libm
  * implementations; [[Hll.linearCount]] provides it for in-engine use and
  * the HllSpec tolerance tests cover it, but gated queries stay on the
  * raw estimator in its operating range (n ≥ 2.5m).
  */
class HllAggregator(p: Int) extends Aggregator[Long, Array[Byte], Seq[Int]] {
  require(p >= 4 && p <= 14, s"precision out of range (4..14): $p")
  private val m = 1 << p
  /** Max rank: the 48-bit hash leaves 48-p rank bits; an all-zero
    * remainder ranks 48-p+1 (the "ran off the end" convention). */
  private val maxRank = 48 - p + 1

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(buf: Array[Byte], h: Long): Array[Byte] = {
    val bucket = (h & (m - 1)).toInt
    val w = h >>> p
    val rank =
      if (w == 0L) maxRank
      else maxRank - (64 - java.lang.Long.numberOfLeadingZeros(w))
    if (rank > buf(bucket)) buf(bucket) = rank.toByte
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def finish(buf: Array[Byte]): Seq[Int] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(buf.map(_.toInt))

  override def bufferEncoder: Encoder[Array[Byte]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Int]] = ExpressionEncoder()
}

/** Merge aggregator over FINISHED register vectors (the [[Hll.hll]]
  * output type): elementwise max of m-entry Seq[Int] rows. This is the
  * sketch-table side of the HLL family — rolling windows over per-day
  * partials (the q113 KMV pattern) and iterated-union algorithms like
  * HyperBall, where each round re-aggregates counter vectors rather
  * than raw hashes. */
class HllMergeAggregator(p: Int) extends Aggregator[Seq[Int], Array[Byte], Seq[Int]] {
  require(p >= 4 && p <= 14, s"precision out of range (4..14): $p")
  private val m = 1 << p

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(buf: Array[Byte], regs: Seq[Int]): Array[Byte] = {
    require(regs.size == m, s"register vector size ${regs.size} != $m")
    var i = 0
    while (i < m) {
      val r = regs(i)
      if (r > buf(i)) buf(i) = r.toByte
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def finish(buf: Array[Byte]): Seq[Int] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(buf.map(_.toInt))

  override def bufferEncoder: Encoder[Array[Byte]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Int]] = ExpressionEncoder()
}

/** [[HllAggregator]] with PACKED output: the finished value IS the
  * m-byte register buffer (one unsigned rank byte per bucket) instead of
  * array<int>. For iterated-sketch algorithms (HyperBall) whose counter
  * rows cross a join exchange EVERY round — m bytes per row beats
  * array<int>'s 4m-plus-offsets wire size 4-5x at m = 64. Register
  * VALUES are bit-identical to [[HllAggregator]]'s (same hash, bucket,
  * rank); only the container differs, so estimates and replays agree. */
class HllBytesAggregator(p: Int)
    extends Aggregator[Long, Array[Byte], Array[Byte]] {
  private val inner = new HllAggregator(p)
  override def zero: Array[Byte] = inner.zero
  override def reduce(buf: Array[Byte], h: Long): Array[Byte] =
    inner.reduce(buf, h)
  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
    inner.merge(b1, b2)
  override def finish(buf: Array[Byte]): Array[Byte] = buf
  override def bufferEncoder: Encoder[Array[Byte]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder()
}

/** Packed-input twin of [[HllMergeAggregator]]: max-merges m-byte packed
  * register vectors ([[HllBytesAggregator]] outputs) with a binary
  * buffer — input, partial-aggregate state, AND output all stay m bytes,
  * so nothing wider than the packed form ever crosses an exchange. */
class HllMergeBytesAggregator(p: Int)
    extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
  require(p >= 4 && p <= 14, s"precision out of range (4..14): $p")
  private val m = 1 << p

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(buf: Array[Byte], regs: Array[Byte]): Array[Byte] = {
    require(regs.length == m, s"register vector size ${regs.length} != $m")
    merge(buf, regs)
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def finish(buf: Array[Byte]): Array[Byte] = buf
  override def bufferEncoder: Encoder[Array[Byte]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder()
}

object Hll {
  /** Column form: `hll(6)(hashCol)` usable in `agg(...)`; input is a
    * [[KmvAggregator.kmvHash]] long (non-null). Output is the full
    * m-entry register vector (0 = empty bucket). */
  def hll(p: Int): Column => Column = {
    val fn = udaf(new HllAggregator(p))
    (c: Column) => fn(c)
  }

  /** Column form of [[HllMergeAggregator]]: `hllMerge(6)(regsCol)`
    * max-merges finished register vectors in `agg(...)`. */
  def hllMerge(p: Int): Column => Column = {
    val fn = udaf(new HllMergeAggregator(p))
    (c: Column) => fn(c)
  }

  /** Column form of [[HllBytesAggregator]]: packed m-byte registers. */
  def hllBytes(p: Int): Column => Column = {
    val fn = udaf(new HllBytesAggregator(p))
    (c: Column) => fn(c)
  }

  /** Column form of [[HllMergeBytesAggregator]]: max-merge over packed
    * m-byte register vectors. */
  def hllMergeBytes(p: Int): Column => Column = {
    val fn = udaf(new HllMergeBytesAggregator(p))
    (c: Column) => fn(c)
  }

  /** Packed binary registers → array<int> for the estimator math. */
  def unpackRegs(c: Column): Column =
    graft.expressions.UnpackRegisters.unpackRegisters(c)

  /** Number of empty registers (the linear-counting input). */
  def zeros(regs: Column): Column =
    size(filter(regs, r => r === 0)).cast("long")

  /** Exact-integer harmonic denominator S = sum_j 2^(maxRank - reg_j).
    * Every term is a power of two ≤ 2^maxRank and the sum stays below
    * 2^53, so the double-typed `pow` arithmetic is EXACT (no rounding at
    * any step, any summation order) before the final long cast. */
  def harmonicS(regs: Column, p: Int): Column = {
    val maxRank = 48 - p + 1
    aggregate(regs, lit(0L),
      (acc, r) => acc + pow(lit(2.0), lit(maxRank) - r).cast("long"))
  }

  /** alpha_m from the HLL paper (m ≥ 128 uses the asymptotic formula).
    * These exact literals must be mirrored in any oracle replay. */
  def alpha(p: Int): Double = (1 << p) match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case m => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Raw HLL estimate from [[harmonicS]]: alpha_m * m^2 * 2^maxRank / S.
    * The numerator is a product of exact literals folded left-to-right
    * (correctly-rounded IEEE at each step — replays bit-identically from
    * the same literals in any engine); the single division then operates
    * on bit-identical operands. */
  def rawEstimate(s: Column, p: Int): Column = {
    val m = 1 << p
    val maxRank = 48 - p + 1
    lit((alpha(p) * (m.toDouble * m.toDouble)) * math.pow(2.0, maxRank)) /
      s.cast("double")
  }

  /** Linear counting for the small range (E ≤ 2.5m, zeros > 0):
    * m * ln(m / zeros). `ln` is not correctly rounded across libms, so
    * this is an IN-ENGINE correction (T-gated with tolerance in HllSpec),
    * not an oracle-replayable value. */
  def linearCount(zeros: Column, p: Int): Column = {
    val m = (1 << p).toDouble
    lit(m) * log(lit(m) / zeros.cast("double"))
  }
}
