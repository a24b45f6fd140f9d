package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.AtomicLong

/** Memory-pressure / spill certification (r13 verdict task 1 — the
  * highest-leverage untested axis of the 100 TB story).
  *
  * Every number to date was collected with a 32 GiB heap over <= 156 MB
  * corpora, so NO plan had ever been forced to spill: hash-build sizes,
  * window-partition state, and the dense-verify kernel's budget guard were
  * spill-untested — exactly the bug class the oracle gate (answers) and the
  * wall-clock gates (throughput) cannot see. This probe runs the heavy
  * family on a gate corpus under a CONSTRAINED heap
  * (`SPARK_DRIVER_MEM=3g sbt 'runMain graft.tools.SpillProbe <corpus> <queries>'`)
  * with a SparkListener folding every task's spill metrics, and reports one
  * JSON line per query: completed-or-failed, wall, memory/disk bytes
  * spilled, peak single-task execution memory. The 100 TB reading: an
  * executor is ALWAYS memory-starved relative to its data slice; an
  * operator that OOMs instead of spilling under pressure is a scale-killer
  * no green oracle row can excuse, while one that completes by spilling is
  * exhibiting exactly the graceful degradation Tungsten promises.
  *
  * Spark-facing knobs stay at the bench defaults (32 threads, 32 shuffle
  * partitions, default spark.memory.fraction) — the probe varies ONLY the
  * heap, so a pass/fail diff against the 32 GiB bench isolates memory
  * pressure as the cause.
  */
object SpillProbe {

  private class SpillListener extends SparkListener {
    val memSpilled = new AtomicLong(0L)
    val diskSpilled = new AtomicLong(0L)
    val peakExecMem = new AtomicLong(0L)
    val tasksFailed = new AtomicLong(0L)
    val tasksDone = new AtomicLong(0L)
    def reset(): Unit = {
      memSpilled.set(0); diskSpilled.set(0); peakExecMem.set(0)
      tasksFailed.set(0); tasksDone.set(0)
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasksDone.incrementAndGet()
      if (t.reason != org.apache.spark.Success) tasksFailed.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) {
        memSpilled.addAndGet(m.memoryBytesSpilled)
        diskSpilled.addAndGet(m.diskBytesSpilled)
        peakExecMem.accumulateAndGet(m.peakExecutionMemory, math.max(_, _))
      }
    }
  }

  /** The listener bus is async: poll until the done-task counter is stable
    * so a query's tail metrics never leak into the next row. */
  private def settle(l: SpillListener): Unit = {
    var prev = -1L
    var same = 0
    while (same < 3) {
      val now = l.tasksDone.get()
      if (now == prev) same += 1 else { same = 0; prev = now }
      Thread.sleep(200)
    }
  }

  def main(args: Array[String]): Unit = {
    val corpus = args.headOption.getOrElse("/tmp/graft_gate10x")
    val queries = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq(
      "q_dedup_minhash", "q_dedup_cluster_stats", "q_dedup_ngram",
      "q_dedup_embed", "q_dedup_incremental", "q_text_dup_ngrams",
      "q_graph_pagerank", "q_graph_components", "q_graph_triangles",
      "q_sim_ivfpq", "q_sim_ivfpq_rerank", "q_sim_ivfpq_residual",
      "q_text_packing", "q_join_star", "q_join_fuzzy",
      "q_window_frames", "q_window_dist", "q_agg_collect",
      "q_agg_approx_percentile", "q_text_perplexity5"))
    val heap = Runtime.getRuntime.maxMemory()
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new SpillListener
    spark.sparkContext.addSparkListener(listener)
    println(s"""{"probe":"spill","corpus":"$corpus","heap_bytes":$heap,"queries":[""")
    val lines = queries.map { q =>
      spark.catalog.clearCache()
      System.gc()
      listener.reset()
      val t0 = System.nanoTime()
      val outcome =
        try {
          graft.SparkEntry.queries(q)(spark, corpus)
            .write.format("noop").mode("overwrite").save()
          "completed"
        } catch {
          case e: Throwable =>
            val root = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
              .toSeq.last
            s"FAILED ${root.getClass.getSimpleName}"
        }
      val wall = (System.nanoTime() - t0) / 1e9
      settle(listener)
      val line =
        f"""{"query":"$q","outcome":"$outcome","wall_sec":$wall%.1f,""" +
          s""""mem_spilled_mb":${listener.memSpilled.get / 1024 / 1024},""" +
          s""""disk_spilled_mb":${listener.diskSpilled.get / 1024 / 1024},""" +
          s""""peak_task_exec_mb":${listener.peakExecMem.get / 1024 / 1024},""" +
          s""""tasks":${listener.tasksDone.get},"task_failures":${listener.tasksFailed.get}}"""
      System.err.println(s"[spillprobe] $line")
      line
    }
    println(lines.mkString(",\n"))
    println("]}")
    spark.stop()
  }
}
