package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected-component canonicalization for the dedup keep-lists: every node
  * receives the MINIMUM id reachable through the near-dup pair graph, so a
  * chain A~B~C collapses to one canonical even when A,C are not directly
  * adjacent (the single-pass min-direct-neighbor shortcut documented in
  * round 2 split such chains).
  *
  * Algorithm: bounded min-label propagation. Each round takes, per node, the
  * minimum of its own label and its neighbors' labels — a join on the edge
  * list plus a groupBy, both plain shuffles on the node id. `rounds` rounds
  * reach the minimum over everything within `rounds` hops, so the result is
  * the true transitive closure for every component whose diameter is at most
  * `rounds`. Near-dup components are shallow by construction (members all
  * resemble a shared ancestor), so a small fixed bound covers them; the
  * DuckDB oracle twin computes the UNBOUNDED closure with a recursive CTE,
  * so the correctness gate itself would catch a too-small bound.
  *
  * 100 TB note: cost is `rounds` x (1 join + 1 agg) over the EDGE list only
  * (nodes without dup edges drop out of the propagation joins and keep their
  * own id), and the label frame is referenced twice per round, so the plan
  * tree doubles per round — callers must pass a cached/materialized `edges`.
  * At cluster scale you would checkpoint the label frame every few rounds
  * and switch to alternating large-star/small-star (O(log d) rounds); the
  * bounded-propagation shape here keeps the whole thing a single lazy plan
  * with no driver-side loop-until-converged action.
  */
object Closure {

  /** @param nodes one column `id` (bigint), every node, unique
    * @param edges two columns `src`,`dst` — SYMMETRIC pair list (both
    *              directions present); caller caches it
    * @param rounds propagation bound; final labels equal the component min
    *               for every component with diameter <= rounds
    * @return (`id`, `lbl`) with lbl = min id within `rounds` hops
    */
  def minLabel(nodes: DataFrame, edges: DataFrame, rounds: Int): DataFrame = {
    var lab = nodes.select(col("id"), col("id").as("lbl"))
    for (_ <- 1 to rounds) {
      val nbMin = edges
        .join(lab.withColumnRenamed("id", "dst").withColumnRenamed("lbl", "nlbl"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("nlbl").as("nbmin"))
      lab = lab
        .join(nbMin, Seq("id"), "left")
        .select(col("id"), least(col("lbl"), coalesce(col("nbmin"), col("lbl"))).as("lbl"))
    }
    lab
  }
}
