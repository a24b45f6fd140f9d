package graft.queries

import org.apache.spark.sql.functions._
import Tables.t

/** Iterative graph analytics — the classic engine workload the rest of the
  * corpus doesn't exercise: a fixed-point computation whose per-step shape
  * is join + aggregate, unrolled a bounded number of rounds (the Pregel
  * pattern as plain DataFrames). The graph is the part↔supplier bipartite
  * relation mined from lineitem (~2k parts, 100 suppliers, ~52k distinct
  * edges at sf0.01), and the computation is PageRank held INTEGER-EXACT:
  * ranks live in parts-per-1e9 units and every step is integer
  * multiply/divide, so five rounds produce bit-identical tables in Spark
  * and DuckDB — no float mass drift, no tolerance compare.
  */
object GraphQueries {

  private val Iters = 5
  private val Mass = 1000000000L // total rank mass (ppb units)

  /** PageRank (d=0.85, 5 unrolled rounds) over the undirected
    * part↔supplier graph. Scale shape: the distinct edge list is built
    * once and cached — the standard iterative-graph tradeoff (every round
    * re-reads it; at 100 TB this is the persisted adjacency the cluster
    * pays for once, partitioned by src so each round is ONE shuffle on dst
    * for the contribution sums plus a broadcast of the one-row node
    * count). Rounds unroll lineage five deep — within Spark's comfort
    * zone; a big-k deployment checkpoints every ~8 rounds exactly like the
    * BPE trainer. The final top-20 is TakeOrderedAndProject under a total
    * order (rank desc, node), never a global sort. The DuckDB oracle is
    * GENERATED from the same Scala loop, so the two engines necessarily
    * run the identical recurrence. */
  /** The distributed pagerank pipeline: (top-20 frame, the cached frames
    * the caller must unpersist once the result is materialized). Exposed
    * for PlansSpec, which pins the distributed plan's shape. */
  private[graft] def pagerankFrames(
      s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, Seq[org.apache.spark.sql.DataFrame]) = {
    val half = t(s, d, "lineitem")
      .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    // hash-partition the adjacency on src ONCE, sorted within partitions,
    // and cache that layout: every round's contribution join then reuses
    // the cached partitioning (the InMemoryRelation reports it, so no
    // per-round edge exchange) and only the small changing ranks side
    // moves — the Pregel economics. Deliberately NOT a broadcast: the
    // node/rank table is corpus-sized at web scale; co-partitioned
    // shuffle joins are the shape that survives 100x.
    val edges = half.unionAll(half.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .sortWithinPartitions("src")
      .cache()
    // vertex state persists beside the adjacency (the Pregel split):
    // without the cache every round re-aggregates degrees from the edge
    // cache — 5 redundant passes
    val nodes = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
      .cache()
    val nF = broadcast(nodes.agg(count(lit(1)).as("n")))
    var ranks = nodes.crossJoin(nF)
      .select(col("node"), col("deg"), col("n"), expr(s"$Mass div n").as("rank"))
    (1 to Iters).foreach { _ =>
      val contrib = edges
        .join(ranks.select(col("node"), expr("rank div deg").as("c")),
          col("src") === col("node"))
        .groupBy("dst").agg(sum("c").as("in_sum"))
      ranks = nodes.crossJoin(nF)
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"), col("deg"), col("n"),
          (expr(s"(15 * ($Mass div n)) div 100") +
            expr("(85 * coalesce(in_sum, 0)) div 100")).as("rank"))
    }
    val out = ranks
      .select(col("node"), (col("node") % 2).as("is_supplier"), col("rank"))
      .orderBy(col("rank").desc, col("node"))
      .limit(20)
    (out, Seq(edges, nodes))
  }

  private val pagerank = Q(
    "q_graph_pagerank",
    (s, d) => {
      // materialize the bounded top-20 and release both cached frames in a
      // finally — repeated bench/probe invocations in a shared session must
      // not accumulate InMemoryRelations in the storage pool
      val (out, cached) = pagerankFrames(s, d)
      try {
        val rows = java.util.Arrays.asList(out.collect(): _*)
        s.createDataFrame(rows, out.schema)
      } finally cached.foreach(_.unpersist(false))
    },
    Some {
      val iterCtes = (1 to Iters).map { k =>
        s"""r$k AS (
           SELECT nd.node, nd.deg,
             (15 * ($Mass // nn.n)) // 100 + (85 * COALESCE(sm.in_sum, 0)) // 100 AS rank
           FROM nodes nd CROSS JOIN nn
           LEFT JOIN (SELECT e.dst AS node, sum(p.rank // p.deg) AS in_sum
                      FROM edges e JOIN r${k - 1} p ON e.src = p.node
                      GROUP BY e.dst) sm
           ON nd.node = sm.node)"""
      }.mkString(",\n")
      s"""WITH half AS (
          SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem),
        edges AS (SELECT src, dst FROM half UNION ALL SELECT dst, src FROM half),
        nodes AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
        nn AS (SELECT count(*) AS n FROM nodes),
        r0 AS (SELECT node, deg, $Mass // nn.n AS rank FROM nodes CROSS JOIN nn),
        $iterCtes
        SELECT node, node % 2 AS is_supplier, CAST(rank AS BIGINT) AS rank
        FROM r$Iters ORDER BY rank DESC, node LIMIT 20"""
    })

  val all: Seq[Q] = Seq(pagerank)
}
