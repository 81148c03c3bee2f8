package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct sketch: the per-group state is the k
  * SMALLEST DISTINCT hash values seen, so the partial (map-side)
  * aggregate is bounded at k longs per group and merge is a sorted
  * merge — the same mergeable-sketch scale shape as HLL
  * (`approx_count_distinct`, q35), with one property HLL lacks: fed a
  * deterministic public hash (sha256 prefix, see [[KmvAggregator.kmvHash]])
  * the whole sketch is REPLAYABLE by any ANSI engine — distinct hashes,
  * k-th order statistic, estimate arithmetic — which is what puts the
  * q102 gate's approximate distinct count under the DuckDB value hash
  * while q35's HLL internals stay engine-specific by construction.
  *
  * Estimator: with fewer than k distinct hashes the sketch IS the
  * distinct set (exact count); at capacity, E[distinct] = (k-1)/v_k
  * where v_k is the k-th smallest hash normalized to [0,1)
  * (Bar-Yossef et al. 2002, the standard KMV estimator).
  */
class KmvAggregator(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(k > 0, s"k must be positive: $k")

  override def zero: Array[Long] = Array.emptyLongArray

  /** The buffer is a sorted ascending primitive array of ≤ k distinct
    * values. The hot path is O(1): once the sketch is saturated, any
    * value at or beyond the current k-th smallest is rejected before the
    * binary search — on a stream with d distinct values only ~k/d of
    * rows ever probe further, so per-row cost is a compare, not an O(k)
    * scan. */
  override def reduce(buf: Array[Long], v: Long): Array[Long] =
    if (buf.length == k && v >= buf(k - 1)) buf
    else {
      val i = java.util.Arrays.binarySearch(buf, v)
      if (i >= 0) buf // already present
      else {
        val at = -i - 1
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, at)
        out(at) = v
        System.arraycopy(buf, at, out, at + 1, n - at - 1)
        out
      }
    }

  /** Single-pass two-pointer merge of the two sorted-distinct buffers,
    * keeping the k smallest distinct values: one allocation per merge
    * (element-wise reduce would re-copy a fresh ≤k array per inserted
    * element — O(k²) in the map-side-combine path this class exists to
    * keep cheap). */
  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else {
      val out = new Array[Long](math.min(b1.length + b2.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < b1.length || j < b2.length)) {
        val v =
          if (j >= b2.length || (i < b1.length && b1(i) <= b2(j))) {
            val x = b1(i); i += 1; x
          } else { val x = b2(j); j += 1; x }
        if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

  override def finish(buf: Array[Long]): Seq[Long] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(buf)

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object KmvAggregator {
  /** Column form: `kmv(256)(hashCol)` usable in `agg(...)`; input must be
    * non-null (filter or coalesce first — [[kmvHash]] of a non-null
    * column is non-null). */
  def kmv(k: Int): Column => Column = {
    val fn = udaf(new KmvAggregator(k))
    (c: Column) => fn(c)
  }

  /** Deterministic 48-bit uniform hash for the sketch: value of the
    * first 12 hex digits of sha256(value-as-string). 48 bits keeps every
    * hash (and every downstream double) exactly representable, and the
    * construction replays in ANSI SQL via per-digit strpos arithmetic —
    * the same trick the IVF/media/Z-order oracles use.
    *
    * Hash integer/string keys only: string-casting floating-point values
    * is ENGINE-SPECIFIC formatting ("1.0" vs "1.0E0" vs "1"), so a
    * double-typed key would hash differently across engines and silently
    * break oracle replay — normalize such keys to a canonical string (or
    * scaled integer) first. */
  def kmvHash(c: Column): Column =
    conv(substring(sha2(c.cast("string"), 256), 1, 12), 16, 10).cast("long")

  /** The KMV estimate from a finished sketch column: exact size below
    * capacity, (k-1)/v_k above it. Pure double arithmetic — one
    * division per group — identical in any IEEE engine. */
  def kmvEstimate(mins: Column, k: Int): Column = {
    val vk = element_at(mins, k).cast("double") / lit(281474976710656.0) // 2^48
    when(size(mins) < k, size(mins).cast("double"))
      .otherwise(lit((k - 1).toDouble) / vk)
  }
}
