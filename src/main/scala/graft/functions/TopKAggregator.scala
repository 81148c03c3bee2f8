package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** UDAF surface exemplar (SURVEY.md §2.10): per-group top-K values via a
  * typed `Aggregator[IN, BUF, OUT]` with a bounded buffer — the partial
  * (map-side) aggregate keeps at most k doubles, so the shuffle carries
  * O(k) per group instead of the full group. Values-only semantics:
  * deterministic under ties (equal values are equal), unlike row_number.
  */
class TopKAggregator(k: Int) extends Aggregator[Double, List[Double], Seq[Double]] {
  require(k > 0)

  override def zero: List[Double] = Nil

  override def reduce(buf: List[Double], v: Double): List[Double] =
    bound(insertDesc(buf, v))

  override def merge(b1: List[Double], b2: List[Double]): List[Double] =
    bound(b2.foldLeft(b1)((acc, v) => insertDesc(acc, v)))

  override def finish(buf: List[Double]): Seq[Double] = buf

  private def insertDesc(sorted: List[Double], v: Double): List[Double] =
    sorted match {
      case h :: t if h >= v => h :: insertDesc(t, v)
      case rest => v :: rest
    }

  private def bound(l: List[Double]): List[Double] = l.take(k)

  override def bufferEncoder: Encoder[List[Double]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}

object TopKAggregator {
  /** Column form: `topK(3)(col)` usable in `agg(...)`. */
  def topK(k: Int): Column => Column = {
    val fn = udaf(new TopKAggregator(k))
    (c: Column) => fn(c)
  }
}
