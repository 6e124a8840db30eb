package graft.functions

import scala.collection.mutable

/** Misra-Gries frequent-items summary (public algorithm, 1982): one
  * pass, at most `capacity` counters. Guarantee used by q96: any item
  * whose true count in the summarized stream exceeds n/capacity is
  * GUARANTEED to survive in the summary (counts may be underestimates;
  * survival is what matters — the exact-confirm pass restores true
  * counts). Applied per partition, the guarantee lifts to the global
  * stream by averaging: a global >N/capacity item exceeds the
  * threshold in at least one partition.
  */
object MisraGries {

  /** Summarize one iterator; returns surviving candidate items. */
  def candidates[T](items: Iterator[T], capacity: Int): Iterator[T] = {
    require(capacity > 0)
    val counters = mutable.HashMap.empty[T, Long]
    items.foreach { x =>
      counters.get(x) match {
        case Some(c) => counters.update(x, c + 1)
        case None if counters.size < capacity => counters.update(x, 1L)
        case None =>
          // decrement-all step; drop zeroed counters
          val dead = mutable.ArrayBuffer.empty[T]
          counters.mapValuesInPlace((_, c) => c - 1)
          counters.foreach { case (k, c) => if (c <= 0) dead += k }
          dead.foreach(counters.remove)
      }
    }
    counters.keysIterator
  }
}
