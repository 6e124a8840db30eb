package graft.functions

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k state for q97: keeps the k best (price desc, id asc)
  * entries per group as a sorted list. The point vs a window
  * row_number(): state is O(k) per group and MERGEABLE, so Spark
  * partial-aggregates map-side and the exchange carries at most k rows
  * per (group, mapper) — a window sort shuffles and sorts EVERY row of
  * the group. k is tiny by contract (top-3 here), so the sort-insert
  * is effectively constant work per row.
  */
final case class PricedRow(price: Double, id: Long)

/** Product wrapper: Seq alone has no product encoder. */
final case class TopBuf(items: Seq[PricedRow])

final class TopKOrders(k: Int) extends Aggregator[PricedRow, TopBuf, TopBuf] {

  private def rank(e: PricedRow): (Double, Long) = (-e.price, e.id)

  override def zero: TopBuf = TopBuf(Nil)

  override def reduce(buf: TopBuf, x: PricedRow): TopBuf =
    TopBuf((buf.items :+ x).sortBy(rank).take(k))

  override def merge(a: TopBuf, b: TopBuf): TopBuf =
    TopBuf((a.items ++ b.items).sortBy(rank).take(k))

  override def finish(r: TopBuf): TopBuf = r

  override def bufferEncoder = Encoders.product[TopBuf]
  override def outputEncoder = Encoders.product[TopBuf]
}
