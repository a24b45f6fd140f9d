package graft.tools

/** Ad-hoc plan-shape audit for named declared queries: executes each (so
  * AQE finalizes) and prints the same fingerprint signature BENCH_PLANS.json
  * records (x=exchanges s=sorts b=broadcasts m=smj h=shj j=bhj n=nested/
  * cartesian), plus the formatted plan when `-v` is passed — the
  * `.explain("formatted")`-and-iterate loop as a one-liner.
  *
  * Run: `sbt 'runMain graft.tools.PlanAudit [-v] <sfDir> <name>[,<name>...]'`
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val verbose = args.contains("-v")
    val rest = args.filterNot(_ == "-v")
    val sfDir = if (rest.length > 0) rest(0) else "/root/testdata/sf0.01"
    val names =
      if (rest.length > 1) rest(1).split(",").toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.Engine.createSession("graft-plan-audit", s"local[$cpus]")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      spark.catalog.clearCache()
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val qe = df.queryExecution
      qe.executedPlan.execute().count()
      println(s"$n -> ${graft.Bench.fingerprintOf(qe.executedPlan).sig}")
      if (verbose)
        println(qe.explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
