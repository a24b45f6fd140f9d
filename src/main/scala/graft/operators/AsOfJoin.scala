package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the single latest right row with
  * `right.time <= left.time` on the same keys ("state as of the event" —
  * latest prior click for a purchase, latest config before an alert).
  *
  * The reference has no as-of operator — its ad-hoc Presto surface
  * (reference README.md:112-116) would need a correlated subquery per row.
  * Spark has no built-in either, and the naive formulations are a range
  * join (BroadcastNestedLoopJoin, O(n*m)) or a groupBy over an exploded
  * match list. This operator instead rewrites the join away entirely:
  *
  *   union(right tagged 0, left tagged 1)
  *     -> ONE hash Exchange on the keys
  *     -> sort within partitions by (time, tag)
  *     -> running `last(right-row struct, ignoreNulls)` window
  *     -> keep left rows, unpack the matched struct
  *
  * The physical plan contains NO Join node at all (pinned in PlansSpec):
  * total cost is one shuffle of |left|+|right| rows, each key group then
  * streams once through a sorted window — the optimal distributed as-of at
  * 100 TB (a sort-merge range join would shuffle the same rows AND pay a
  * per-row binary search; a BNLJ would not finish). Skew on hot keys is
  * handled like any windowed aggregation.
  *
  * Semantics notes:
  *  - equal timestamps are INCLUSIVE (`l.t >= r.t`): at a tie the right row
  *    sorts first (tag 0 < tag 1) and is therefore visible to the left row;
  *  - the right payload travels as ONE struct per right row, so a matched
  *    row with NULL payload fields yields those NULLs verbatim (a per-column
  *    `last(ignoreNulls)` would wrongly reach further back per column);
  *  - left rows with no prior right row get a NULL struct -> NULL columns
  *    (LEFT-join semantics, matching DuckDB `ASOF LEFT JOIN`);
  *  - among right rows with identical (keys, time) the last by union order
  *    wins — callers needing determinism there must ensure time uniqueness
  *    per key (true for the event corpus, asserted in AsOfJoinSpec).
  */
object AsOfJoin {

  /** @param rightCols right columns to carry onto matched left rows; each is
    *                  emitted as `prefix + name`.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val tagC = "__asof_tag"
    val timeC = "__asof_t"
    val rowC = "__asof_row"
    val leftPayload = left.columns.toSeq.filterNot(keys.contains)
    val rStruct = struct(rightCols.map(col): _*)
    val rStructType = {
      // null literal of the exact matched-row struct type for the left side
      val fields = rightCols.map(c => right.schema(c))
      org.apache.spark.sql.types.StructType(fields)
    }

    val rSide = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as(timeC), lit(0).as(tagC), rStruct.as(rowC)) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lSide = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as(timeC), lit(1).as(tagC), lit(null).cast(rStructType).as(rowC)) ++
        leftPayload.map(col): _*)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(timeC).asc, col(tagC).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rSide
      .unionByName(lSide)
      .withColumn(rowC, last(col(rowC), ignoreNulls = true).over(w))
      .filter(col(tagC) === 1)
      .select(
        keys.map(col) ++ leftPayload.map(col) ++
          rightCols.map(c => col(s"$rowC.$c").as(prefix + c)): _*)
  }

  /** Forward as-of join: for each left row, the single EARLIEST right row
    * with `right.time >= left.time` on the same keys ("next state after
    * the event" — time-to-next-action, forward attribution). Same
    * join-free union + ONE key shuffle + window shape as [[backward]],
    * mirrored: left rows tag 0 so a tied right row sorts AFTER them and
    * stays visible (inclusive ties, matching DuckDB
    * `ASOF LEFT JOIN ... ON l.t <= r.t`), and the running aggregate is
    * `first(ignoreNulls)` over the FOLLOWING frame. Among right rows with
    * identical (keys, time) the first by union order wins — the same
    * time-uniqueness caveat as backward. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val tagC = "__asof_tag"
    val timeC = "__asof_t"
    val rowC = "__asof_row"
    val leftPayload = left.columns.toSeq.filterNot(keys.contains)
    val rStruct = struct(rightCols.map(col): _*)
    val rStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))

    val rSide = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as(timeC), lit(1).as(tagC), rStruct.as(rowC)) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lSide = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as(timeC), lit(0).as(tagC), lit(null).cast(rStructType).as(rowC)) ++
        leftPayload.map(col): _*)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(timeC).asc, col(tagC).asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    rSide
      .unionByName(lSide)
      .withColumn(rowC, first(col(rowC), ignoreNulls = true).over(w))
      .filter(col(tagC) === 0)
      .select(
        keys.map(col) ++ leftPayload.map(col) ++
          rightCols.map(c => col(s"$rowC.$c").as(prefix + c)): _*)
  }
}
