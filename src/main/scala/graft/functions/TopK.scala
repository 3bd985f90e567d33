package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bounded top-k aggregator: keeps the k best (score desc, id asc as the
  * deterministic tie-break) pairs per group.
  *
  * Why not `row_number().over(partitionBy(group))`? The window shuffles
  * EVERY candidate row (N·M for a KNN self-join) to sort whole groups.
  * As an Aggregator, Catalyst runs it partial+final: each map task
  * reduces its rows to ≤k per group before the exchange, so the shuffle
  * carries k rows per group instead of the full candidate set — the
  * difference between shuffling 4M and 6k rows on the 2000-vector KNN,
  * and between shuffling 10¹² and 10⁷ at 100 TB.
  */
class TopKByScore(k: Int)
  extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Nil

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.length == k && !better(in, buf.last)) buf
    else ((buf :+ in).sortWith(better)).take(k)
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sortWith(better).take(k)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
