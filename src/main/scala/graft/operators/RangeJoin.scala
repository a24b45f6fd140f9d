package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-interval range join: pairs (a, b) on equal keys with
  * `b.time` in `(a.time, a.time + maxGap]` — "what followed within N
  * minutes" (click -> purchase attribution, alert -> remediation, message
  * threading).
  *
  * Spark's native plan for `a.t < b.t AND b.t <= a.t + g` on top of a key
  * equi-join is fine (the range lands in the sort-merge join's residual
  * filter), but when the KEY is hot or absent the range predicate alone
  * degrades to BroadcastNestedLoopJoin — O(n*m). This operator makes the
  * time dimension itself a join key via interval binning:
  *
  *   bin(t) = floor(t / maxGap); any qualifying b has
  *   bin(b) ∈ { bin(a), bin(a)+1 }
  *
  * so side a is exploded into its two candidate bins and the join becomes a
  * pure EQUI-join on (keys..., bin) with the exact range as a post-join
  * residual. The plan is a hash/sort-merge equi-join — never BNLJ, never
  * cartesian (pinned in PlansSpec). Shuffle volume is 2|a| + |b| rows on
  * (keys, bin): at 100 TB both sides partition on time bins, so a day of
  * data joins against a day, not against the whole corpus; candidate
  * fan-out per row is bounded by the real event density inside 2*maxGap.
  *
  * Both time columns must be the SAME integral unit (e.g. epoch micros).
  * Output: key columns, then a's payload as `a_<name>`, b's as `b_<name>`.
  */
object RangeJoin {

  def pairsWithin(
      a: DataFrame,
      b: DataFrame,
      keys: Seq[String],
      aTime: String,
      bTime: String,
      maxGap: Long): DataFrame = {
    require(maxGap > 0, s"maxGap must be positive, got $maxGap")
    val binC = "__range_bin"
    val aPayload = a.columns.toSeq.filterNot(keys.contains)
    val bPayload = b.columns.toSeq.filterNot(keys.contains)

    // `div` is exact integer division (a `/` on long Columns is DOUBLE
    // division — lossy for large epoch values); times must be non-negative
    // so that truncation == floor and bin adjacency holds
    val aSide = a
      .select(keys.map(col) ++ aPayload.map(c => col(c).as(s"a_$c")): _*)
      .withColumn(
        binC,
        explode(array(
          expr(s"a_$aTime div $maxGap"),
          expr(s"a_$aTime div $maxGap") + 1)))
    val bSide = b
      .select(keys.map(col) ++ bPayload.map(c => col(c).as(s"b_$c")): _*)
      .withColumn(binC, expr(s"b_$bTime div $maxGap"))

    aSide
      .join(bSide, keys :+ binC)
      .filter(
        col(s"b_$bTime") > col(s"a_$aTime") &&
          col(s"b_$bTime") <= col(s"a_$aTime") + maxGap)
      .drop(binC)
  }
}
