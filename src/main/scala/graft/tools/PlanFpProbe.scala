package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: print Bench's plan fingerprint for named queries, applying the
  * same planProxy discipline as the bench warmup pass (proxy frame +
  * AQEPropagateEmptyRelation exclusion — r17 verdict task 2), so a
  * signature seen here is the signature BENCH_PLANS.json will carry.
  * Usage: sbt "runMain graft.tools.PlanFpProbe q_a,q_b /root/testdata/sf0.01"
  */
object PlanFpProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val proxies = graft.SparkEntry.planProxies
    val emptyRule = "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation"
    names.foreach { n =>
      spark.catalog.clearCache()
      val (fn, mode) = proxies.get(n) match {
        case Some(p) => (p, "proxy")
        case None    => (graft.SparkEntry.queries(n), "direct")
      }
      if (mode == "proxy")
        spark.conf.set("spark.sql.adaptive.optimizer.excludedRules", emptyRule)
      try {
        val qe = fn(spark, sfDir).queryExecution
        qe.executedPlan.execute().count()
        val fp = graft.Bench.fingerprintOf(qe.executedPlan)
        println(s"[fpprobe] $n ($mode) ${fp.sig} spill=${fp.spillBytes}")
      } finally if (mode == "proxy")
        spark.conf.unset("spark.sql.adaptive.optimizer.excludedRules")
    }
    spark.stop()
  }
}
