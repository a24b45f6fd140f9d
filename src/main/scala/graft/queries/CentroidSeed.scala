package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic, corpus-independent coarse-quantizer seeding shared by the
  * IVF family (`q_sim_ivf_ann`, `q_sim_kmeans`, `q_sim_ivf_trained`).
  *
  * The codebook is a FIXED number of cells ([[NCells]]) drawn as the top-N
  * vectors under a Knuth multiplicative hash of `vec_id` — a bounded
  * deterministic sample, NOT a corpus-proportional rule. That keeps both
  * sides of the scale equation flat as the corpus grows: assignment work is
  * O(n · NCells) (one broadcast pass), and the broadcast centroid table is
  * O(NCells) bytes regardless of n. At 100 TB a deployment would raise
  * NCells toward √n as a tuning dial (FAISS guidance); the invariant this
  * module pins is that the dial is set by the OPERATOR, never by the data
  * volume. The hash is pure integer math — `((vec_id % 1000003) ·
  * 2654435761) % 2^32` — with an inner mod bounding the product well inside
  * int64, so DuckDB replays it verbatim and the sample cannot drift between
  * engines. Top-N-by-hash compiles to TakeOrderedAndProject (a per-partition
  * heap + tiny driver merge), not a full sort.
  */
object CentroidSeed {

  /** Fixed codebook size — corpus-independent by construction. */
  val NCells = 8

  /** The √n dial (FAISS guidance), floored at [[NCells]]: cell population
    * stays ~√n, so per-cell pair work is ~n and TOTAL in-cell pair work is
    * ~n^1.5 — sub-quadratic, where any fixed cell count k degenerates to
    * (n/k)² per cell (the round-8 scale-killer). A deployment wanting fully
    * linear pair work sets cells ∝ n/target-cell-size instead; the point
    * the live dial pins is that cell count grows WITH the corpus. Both
    * engines compute it identically — IEEE-754 sqrt is correctly rounded,
    * so Spark's driver-side `Math.sqrt` and DuckDB's `sqrt` agree
    * bit-for-bit and `floor` of the shared double cannot drift. */
  def sqrtCells(n: Long): Int =
    math.max(NCells, math.floor(math.sqrt(n.toDouble)).toInt)

  /** DuckDB twin of [[sqrtCells]] as a scalar-subquery LIMIT expression. */
  def sqlSqrtCellsLimit(from: String): String =
    s"(SELECT greatest($NCells, CAST(floor(sqrt(count(*))) AS BIGINT)) FROM $from)"

  /** The seed sample: (cent_id, cemb) from an embeddings frame with
    * (vec_id, emb) columns. */
  def seeds(e: DataFrame, cells: Int = NCells): DataFrame =
    e.select(col("vec_id").as("cent_id"), col("emb").as("cemb"),
        (col("vec_id") % lit(1000003L) * lit(2654435761L) % lit(4294967296L)).as("h"))
      .orderBy(asc("h"), asc("cent_id"))
      .limit(cells)
      .select("cent_id", "cemb")

  /** DuckDB twin of [[seeds]] as a CTE body; `from` names the source CTE
    * with (vec_id, emb) columns (default the normalized corpus `e`);
    * `limitSql` is the codebook-size expression (a literal by default, or
    * [[sqlSqrtCellsLimit]] for the live √n dial). */
  def sqlSeedCte(name: String, from: String = "e",
      limitSql: String = NCells.toString): String =
    s"""$name AS (SELECT vec_id AS cent_id, emb AS cemb FROM $from
       ORDER BY ((vec_id % 1000003) * 2654435761) % 4294967296, vec_id LIMIT $limitSql)"""
}
