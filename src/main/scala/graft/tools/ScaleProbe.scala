package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe: time representative shapes (scan-agg, shuffle join,
  * window) at 1x and Nx the sf0.1 data (Nx = the same parquet unioned N
  * times — same value distributions, N times the rows) and report per-row
  * throughput. Near-constant ns/row across the scale step is the evidence
  * that the plans are data-parallel (no driver bottleneck, no quadratic
  * term) — the local stand-in for the 100 TB claim, where more rows are
  * met with more executors instead of more wall-clock.
  *
  * Run: sbt 'runMain graft.tools.ScaleProbe [sfDir] [replication]'
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(df: DataFrame, k: Int): DataFrame =
      Iterator.fill(k)(df).reduce(_ union _)

    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")

    def shapes(li: DataFrame, o: DataFrame): Seq[(String, () => Unit)] = Seq(
      "scan_agg" -> (() => li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), count(lit(1)))
        .write.format("noop").mode("overwrite").save()),
      "shuffle_join" -> (() => o.join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority").agg(round(sum("l_extendedprice"), 2))
        .write.format("noop").mode("overwrite").save()),
      "window" -> (() => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey").orderBy("o_orderkey")
        o.select(col("o_custkey"), sum("o_totalprice").over(w))
          .write.format("noop").mode("overwrite").save()
      }))

    def time(f: () => Unit): Double = {
      f() // warm
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }

    val liRows = lineitem.count().toDouble
    val oRows = orders.count().toDouble
    println(f"""{"probe":"scale","replication":$n,"rows_1x":${liRows.toLong},"shapes":[""")
    val lines = shapes(lineitem, orders).zip(shapes(replicate(lineitem, n), replicate(orders, n)))
      .map { case ((name, f1), (_, fn)) =>
        val t1 = time(f1)
        val tn = time(fn)
        val rows1 = if (name == "scan_agg") liRows else if (name == "window") oRows else liRows + oRows
        val ns1 = t1 * 1e9 / rows1
        val nsN = tn * 1e9 / (rows1 * n)
        f"""{"shape":"$name","sec_1x":$t1%.2f,"sec_${n}x":$tn%.2f,"ns_per_row_1x":$ns1%.1f,"ns_per_row_${n}x":$nsN%.1f,"scaling_ratio":${tn / t1 / n}%.2f}"""
      }
    println(lines.mkString(",\n"))
    println("]}")
    spark.stop()
  }
}
