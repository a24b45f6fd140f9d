package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-buffer per-group top-k as a typed Catalyst aggregate — the scale
  * alternative to the window-function formulation. `row_number() OVER
  * (PARTITION BY g ORDER BY v DESC) <= k` shuffles EVERY row of every group
  * to its reducer and sorts there; this aggregator keeps at most k (value,
  * id) pairs per group per map task and merges partials, so only
  * partitions × groups × k rows cross the exchange — the same partial-
  * aggregate economics count/sum enjoy, applied to ranking. At 100 TB the
  * difference is shuffling the corpus vs shuffling a few rows per group.
  *
  * Determinism: ordered by (value DESC, id ASC), so ties resolve identically
  * to the oracle's window formulation. The per-row trim is an O(k) insert
  * into a small sorted buffer (k is single digits in the query surface).
  */
case class TopKByValue(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k >= 1, s"TopKByValue: k must be >= 1, got $k")

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def trim(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sortWith(better).take(k)

  override def zero: Seq[(Double, Long)] = Nil
  override def reduce(buf: Seq[(Double, Long)], row: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size == k && better(buf.last, row)) buf else trim(buf :+ row)
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)
  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(buf)
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}
