package graft.tools

import java.util.concurrent.{Executors, TimeUnit}
import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** Multi-tenant concurrency probe — the measurement axis the per-query
  * bench cannot see: a 1000-executor cluster never runs ONE query at a
  * time, so a plan that is fast alone but serializes on shared driver
  * state (catalog locks, a hot cache, a driver-side collect) taxes every
  * co-tenant. This probe runs a fixed cross-family query set twice per
  * scheduler mode: serial (the bench's shape) and K-way concurrent from
  * a thread pool against ONE SparkSession (Spark's documented
  * multi-tenancy model — jobs from concurrent threads interleave at
  * stage granularity). `spark.scheduler.mode` is a session-startup
  * config, so FIFO and FAIR each get their own session, each with its
  * own warmup and serial control.
  *
  * What good looks like: concurrent wall well under the serial total
  * (idle-core recovery — local[32] rarely saturates on one small query),
  * with per-query inflation bounded (no query's wall explodes because a
  * co-tenant holds the driver). A query whose concurrent wall balloons
  * past the suite total is the local signature of a driver bottleneck —
  * exactly what SURVEY §2's "no collect/driver-side loops" rule exists
  * to prevent.
  *
  * Run: sbt 'runMain graft.tools.ConcurrencyProbe [sfDir] [K]'
  */
object ConcurrencyProbe {

  /** Cross-family medium-cost set: every major operator class, none of
    * the multi-second head (the probe measures SCHEDULING, not the head
    * queries' own cost — a 6 s minhash would drown the interleaving
    * signal in its own construct time). */
  private val Set12 = Seq(
    "q_agg_group", "q_join_star", "q_window_frames", "q_agg_histogram",
    "q_text_bm25", "q_dedup_ngram", "q_sim_ivf_trained", "q_events_markov",
    "q_text_topics", "q_join_fuzzy", "q_text_perplexity3", "q_graph_triangles")

  private def runOne(spark: SparkSession, sfDir: String, name: String): Double = {
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  private def session(mode: String): SparkSession = {
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.scheduler.mode", mode)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** (serial_total, serial_per, concurrent_total, concurrent_per). */
  private def phases(mode: String, sfDir: String, k: Int)
      : (Double, Map[String, Double], Double, Map[String, Double]) = {
    val spark = session(mode)
    try {
      // JIT/scan warmup, untimed (the bench's discipline — without it the
      // first phase pays all codegen compilation and the compare is noise)
      Set12.foreach(runOne(spark, sfDir, _))

      val serialPer = mutable.LinkedHashMap[String, Double]()
      val t0 = System.nanoTime()
      Set12.foreach(n => serialPer(n) = runOne(spark, sfDir, n))
      val serialTotal = (System.nanoTime() - t0) / 1e9

      val pool = Executors.newFixedThreadPool(k)
      val per = new java.util.concurrent.ConcurrentHashMap[String, Double]()
      val t1 = System.nanoTime()
      Set12.foreach { n =>
        pool.submit(new Runnable {
          override def run(): Unit =
            // a swallowed exception would leave `per` missing this key and
            // crash the report AFTER all the work (r15 review finding) —
            // record the failure as NaN and say so
            try per.put(n, runOne(spark, sfDir, n))
            catch {
              case e: Throwable =>
                System.err.println(s"[concprobe] $n FAILED: ${e.getMessage}")
                per.put(n, Double.NaN)
            }
        })
      }
      pool.shutdown()
      if (!pool.awaitTermination(30, TimeUnit.MINUTES)) {
        pool.shutdownNow()
        System.err.println("[concprobe] concurrent phase TIMED OUT at 30 min")
      }
      val concTotal = (System.nanoTime() - t1) / 1e9
      import scala.jdk.CollectionConverters._
      val concPer = Set12.map(n =>
        n -> per.asScala.getOrElse(n, Double.NaN)).toMap
      (serialTotal, serialPer.toMap, concTotal, concPer)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(4)

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def fmtPer(per: Map[String, Double]): String =
      Set12.map(n => s""""$n":${f"${per(n)}%.2f"}""").mkString("{", ",", "}")

    val out = Seq("FIFO", "FAIR").map { mode =>
      val (sTot, sPer, cTot, cPer) = phases(mode, sfDir, k)
      val inf = Set12.map(n => n -> (cPer(n) / sPer(n))).sortBy(-_._2)
      f""""${mode.toLowerCase}":{"serial_total_sec":$sTot%.2f,""" +
        f""""concurrent_total_sec":$cTot%.2f,"speedup":${sTot / cTot}%.2f,""" +
        f""""inflation_median":${med(inf.map(_._2))}%.2f,""" +
        f""""inflation_max":"${inf.head._1}:${inf.head._2}%.2f",""" +
        s""""serial_per":${fmtPer(sPer)},"concurrent_per":${fmtPer(cPer)}}"""
    }
    println(
      s"""{"probe":"concurrency","k":$k,"sf":"$sfDir","n_queries":${Set12.size},""" +
        out.mkString(",") + "}")
  }
}
