package graft.operators

import scala.collection.mutable

/** Bounded-state frequency sketches.
  *
  * The distributed heavy-hitter shape (SURVEY §2 LLM-pipeline surplus): a
  * groupBy over ALL distinct keys shuffles the full key distribution — at
  * 100 TB that is the token/entity vocabulary, which can itself be huge and
  * skewed. The sketch route never shuffles the distribution: each partition
  * folds its rows into an O(k) Misra-Gries summary, the union of per-partition
  * candidate keys (≤ partitions × k rows) broadcasts back, and one exact
  * recount touches only candidate rows. The output is EXACT (not approximate):
  * any key with global frequency > n/k must exceed n_p/k in at least one
  * partition (averaging argument), so the candidate union is a superset of the
  * true frequent items and the recount-then-threshold equals the plain
  * groupBy-HAVING answer — which is what the DuckDB oracle runs.
  */
object Sketches {

  /** Misra-Gries frequent-items summary (Misra & Gries 1982): at most k
    * counters; an arriving key either increments its counter, claims a free
    * slot, or decrements ALL counters (dropping zeros). Guarantees on a
    * stream of n items: every key with frequency > n/(k+1) retains a counter,
    * and each counter undercounts its key by at most n/(k+1).
    */
  def misraGries(items: Iterator[Long], k: Int): Map[Long, Long] = {
    require(k >= 1, s"misraGries: k must be >= 1, got $k")
    val m = mutable.LongMap.empty[Long]
    items.foreach { x =>
      if (m.contains(x)) m(x) += 1L
      else if (m.size < k) m(x) = 1L
      else {
        // decrement-all step; amortized O(1) per item (each decrement pass
        // cancels k+1 arrivals)
        val dead = mutable.ArrayBuffer.empty[Long]
        m.foreachEntry { (key, c) =>
          if (c == 1L) dead += key else m(key) = c - 1L
        }
        dead.foreach(m.remove)
      }
    }
    m.toMap
  }

  /** Merge two MG summaries into one of at most k counters (Agarwal et al.
    * 2013: sum counters, then subtract the (k+1)-th largest count and drop
    * non-positives). The merged summary keeps the additive-error guarantee,
    * which is what makes MG a valid partial-aggregate state.
    */
  def mergeMisraGries(a: Map[Long, Long], b: Map[Long, Long], k: Int): Map[Long, Long] = {
    val sum = mutable.LongMap.empty[Long]
    a.foreach { case (key, c) => sum(key) = sum.getOrElse(key, 0L) + c }
    b.foreach { case (key, c) => sum(key) = sum.getOrElse(key, 0L) + c }
    if (sum.size <= k) sum.toMap
    else {
      val counts = sum.values.toArray.sorted(Ordering.Long.reverse)
      val cut = counts(k) // (k+1)-th largest
      sum.iterator.collect { case (key, c) if c > cut => key -> (c - cut) }.toMap
    }
  }
}
