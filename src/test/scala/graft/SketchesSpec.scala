package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

/** Misra-Gries bounded-state frequent-items sketch: the classical guarantees
  * behind q_agg_heavy_hitters' exactness argument. */
class SketchesSpec extends AnyFunSuite {

  // deterministic skewed stream: key i appears 2^(10 - i) times for i in 0..9,
  // plus a long uniform tail of singletons
  private def skewedStream: Seq[Long] = {
    val head = (0 until 10).flatMap(i => Seq.fill(1 << (10 - i))(i.toLong))
    val tail = (100L until 600L)
    head ++ tail
  }

  test("MG retains every key with frequency > n/(k+1)") {
    val xs = skewedStream
    val n = xs.size.toLong
    val k = 16
    val mg = Sketches.misraGries(xs.iterator, k)
    val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mustKeep = exact.filter { case (_, c) => c * (k + 1) > n }.keySet
    assert(mustKeep.nonEmpty, "test corpus must actually have frequent items")
    assert(mustKeep.subsetOf(mg.keySet),
      s"lost frequent keys: ${mustKeep -- mg.keySet}")
  }

  test("MG counters undercount by at most n/(k+1), never overcount") {
    val xs = skewedStream
    val n = xs.size.toLong
    val k = 16
    val mg = Sketches.misraGries(xs.iterator, k)
    val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    mg.foreach { case (key, c) =>
      val ex = exact(key)
      assert(c <= ex, s"key $key overcounted: mg=$c exact=$ex")
      assert(ex - c <= n / (k + 1), s"key $key undercounted past bound: mg=$c exact=$ex")
    }
    assert(mg.size <= k)
  }

  test("MG order-insensitive candidate guarantee + merge keeps the bound") {
    val xs = skewedStream
    val n = xs.size.toLong
    val k = 16
    // split as a partitioner would, summarize each, merge the summaries
    val (p1, p2) = xs.splitAt(xs.size / 3)
    val merged = Sketches.mergeMisraGries(
      Sketches.misraGries(p1.iterator, k),
      Sketches.misraGries(p2.iterator, k), k)
    assert(merged.size <= k)
    val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    merged.foreach { case (key, c) => assert(c <= exact(key)) }
    // the two-phase query relies on a weaker union property: a globally
    // frequent key survives in at least ONE per-partition sketch
    val mustKeep = exact.filter { case (_, c) => c * (k + 1) > n }.keySet
    val union = Sketches.misraGries(p1.iterator, k).keySet ++
      Sketches.misraGries(p2.iterator, k).keySet
    assert(mustKeep.subsetOf(union))
  }

  test("MG degenerate cases: k=1 majority, empty stream") {
    assert(Sketches.misraGries(Iterator.empty, 4) === Map.empty)
    // majority element survives k=1 (Boyer-Moore reduction)
    val xs = Seq(7L, 7L, 1L, 7L, 2L, 7L, 7L)
    val mg = Sketches.misraGries(xs.iterator, 1)
    assert(mg.keySet === Set(7L))
  }
}
