package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession

/** Guard the guard (r16 verdict task 6): `plan_regressed` had only ever been
  * EMPTY in the artifacts, so nothing proved the flag CAN fire. This spec
  * injects a real regression — the same query planned with its broadcast
  * (the committed shape) and then degraded to a sort-merge join (the classic
  * silent regression: a dropped hint, a threshold change) — through the
  * exact fingerprint + diff functions Bench runs, and asserts both the
  * exchange-growth branch and the new-spill branch fire, then clear when
  * reverted. */
class BenchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    // AQE off: the test pins exact plan shapes (broadcast vs hinted SMJ);
    // Bench's production path runs WITH AQE and fingerprintOf unwraps the
    // adaptive nodes — that leg is exercised by every BENCH_PLANS.json row
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("plan_regressed fires on a broadcast->SMJ regression and on new same-sf spill, then clears") {
    import org.apache.spark.sql.functions._
    val a = spark.range(0, 10000L).toDF("id")
    val b = spark.range(0, 100L).toDF("id")
    def fpOf(df: org.apache.spark.sql.DataFrame): Bench.PlanFp = {
      val qe = df.queryExecution
      qe.executedPlan.execute().count()
      Bench.fingerprintOf(qe.executedPlan)
    }
    val fpBroadcast = fpOf(a.join(broadcast(b), "id"))
    val fpSmj = fpOf(a.join(b.hint("merge"), "id"))
    assert(fpBroadcast.bhj == 1 && fpBroadcast.exchanges == 0 && fpBroadcast.sorts == 0,
      s"broadcast shape expected, got ${fpBroadcast.sig}")
    assert(fpSmj.smj == 1 && fpSmj.exchanges >= 2 && fpSmj.sorts >= 2,
      s"sort-merge shape expected, got ${fpSmj.sig}")
    // the committed artifact recorded the broadcast shape; this round's
    // tree lost the broadcast -> MUST land in plan_regressed
    val prev = Map("q_probe" -> (fpBroadcast.exchanges, fpBroadcast.sorts))
    assert(Bench.planRegressed(Map("q_probe" -> fpSmj), prev, Set.empty, prevSameSf = true)
      == Seq("q_probe"), "exchange/sort growth must flag")
    // reverted (same shape as committed) -> clears
    assert(Bench.planRegressed(Map("q_probe" -> fpBroadcast), prev, Set.empty, true).isEmpty)
    // NEW spill at the SAME corpus flags even with an unchanged plan tree;
    // at a different corpus it must not (bigger corpora legitimately spill)
    val spilled = fpBroadcast.copy(spillBytes = 1L << 20)
    assert(Bench.planRegressed(Map("q_probe" -> spilled), prev, Set.empty, true)
      == Seq("q_probe"), "new same-sf spill must flag")
    assert(Bench.planRegressed(Map("q_probe" -> spilled), prev, Set.empty, false).isEmpty,
      "cross-sf spill must not flag")
    assert(Bench.planRegressed(Map("q_probe" -> spilled), prev, Set("q_probe"), true).isEmpty,
      "a query that already spilled last round is not NEW spill")
    // a query with no committed baseline never flags (first appearance)
    assert(Bench.planRegressed(Map("q_new" -> fpSmj), prev, Set.empty, true).isEmpty)
    // spill accounting is byte-typed only (r16 ADVICE): a healthy in-memory
    // join reports zero even though its nodes expose count/time-valued
    // spill metrics alongside the SIZE-typed ones
    assert(fpSmj.spillBytes == 0 && fpBroadcast.spillBytes == 0)
  }

  test("isolation promotion unions the committed artifact with the driver lineage (r16 task 5)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_bench_prior").toFile
    // committed compact artifact: one slow median, one fast, one promotion
    Files.writeString(dir.toPath.resolve("BENCH.json"),
      """{"metric":"total","queries":{"q_a":3.50,"q_b":0.50},""" +
        """"queries_isolated":{"q_a":3.1},"isolate_next_run":["q_c"]}""")
    // driver artifacts are PRETTY-PRINTED wrappers; the newest (r3) must
    // win over an older one (r2) whose promotion list must NOT leak in
    Files.writeString(dir.toPath.resolve("BENCH_r2.json"),
      "{\n \"parsed\": {\n  \"queries\": {},\n  \"isolate_next_run\": [\n   \"q_stale\"\n  ]\n }\n}")
    Files.writeString(dir.toPath.resolve("BENCH_r3.json"),
      "{\n \"parsed\": {\n  \"queries\": {\n   \"q_d\": 2.75,\n   \"q_b\": 0.40\n  },\n" +
        "  \"isolate_next_run\": [\n   \"q_e\",\n   \"q_f\"\n  ]\n }\n}")
    val got = Bench.isolationCandidates(dir)
    assert(got == Seq("q_a", "q_c", "q_d", "q_e", "q_f"),
      s"expected the union of both lineages minus sub-threshold medians, got $got")
    // and on the REAL repo artifacts: every name the last driver round
    // asked to promote must be in this round's quiet pre-suite set — the
    // exact propagation r16 caught broken
    val repo = new java.io.File(".")
    val re = """BENCH_r(\d+)\.json""".r
    val latest = Option(repo.listFiles()).toSeq.flatten.flatMap(f => f.getName match {
      case re(n) => Some((n.toInt, f.toPath)); case _ => None
    }).sortBy(-_._1).headOption
    latest.foreach { case (_, p) =>
      val txt = Files.readString(p)
      val nextSection = """"isolate_next_run"\s*:\s*\[([^\]]*)\]""".r
        .findFirstMatchIn(txt).map(_.group(1)).getOrElse("")
      val promoted = """"(q_[a-z0-9_]+)"""".r.findAllMatchIn(nextSection)
        .map(_.group(1)).toSet
      val candidates = Bench.isolationCandidates(repo).toSet
      assert(promoted.subsetOf(candidates),
        s"driver-promoted names missing from the quiet set: ${promoted -- candidates}")
    }
  }
}
