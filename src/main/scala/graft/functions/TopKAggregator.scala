package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (the `Aggregator` extension surface from
  * SURVEY.md §7.1): per-group top-k (value, id) pairs with a bounded
  * buffer — a mergeable, spill-friendly alternative to sort+limit when k
  * is small and groups are many (the classic "top products per
  * category" at scale: no per-group global sort, partial buffers merge
  * associatively on the map side). */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), List[(Double, Long)], Seq[Long]] {

  override def zero: List[(Double, Long)] = Nil

  private def trim(xs: List[(Double, Long)]): List[(Double, Long)] =
    xs.sortBy { case (v, id) => (-v, id) }.take(k)

  override def reduce(buf: List[(Double, Long)], in: (Long, Double))
      : List[(Double, Long)] = trim((in._2, in._1) :: buf)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)])
      : List[(Double, Long)] = trim(a ++ b)

  override def finish(buf: List[(Double, Long)]): Seq[Long] =
    buf.map(_._2)

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
