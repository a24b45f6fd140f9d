package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import graft.operators.StoreCommit

/** Direct pins for the shared persisted-store commit discipline — the
  * swap/recover/readableRoot/cursor contract every store builds on
  * (previously exercised only through the stores themselves). */
class StoreCommitSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var base: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    base = java.nio.file.Files.createTempDirectory("graft_storecommit").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def writeDir(p: Path, marker: String): Unit = {
    val fs = StoreCommit.fsOf(spark, p)
    fs.mkdirs(p)
    val out = fs.create(new Path(p, marker), true)
    try out.write("x".getBytes) finally out.close()
  }

  private def has(p: Path, marker: String): Boolean = {
    val fs = StoreCommit.fsOf(spark, p)
    fs.exists(new Path(p, marker))
  }

  test("swap publishes the staged dir and leaves no aside behind") {
    val dir = new Path(s"$base/s1/store")
    val tmp = new Path(s"$base/s1/.store.building")
    val fs = StoreCommit.fsOf(spark, dir)
    writeDir(dir, "v1")
    writeDir(tmp, "v2")
    StoreCommit.swap(fs, dir, tmp)
    assert(has(dir, "v2") && !has(dir, "v1"), "new version must be live")
    assert(!fs.exists(new Path(s"$base/s1/.store.previous")), "aside must be cleaned")
    assert(!fs.exists(tmp), "staging dir must be consumed")
  }

  test("readableRoot serves the crash aside WITHOUT mutating; recover restores; committedBatch survives") {
    val dir = new Path(s"$base/s2/store")
    val tmp = new Path(s"$base/s2/.store.building")
    val fs = StoreCommit.fsOf(spark, dir)
    writeDir(tmp, "v1")
    StoreCommit.writeMeta(fs, tmp, 7L)
    StoreCommit.swap(fs, dir, tmp)
    assert(StoreCommit.committedBatch(fs, dir) == 7L)
    // simulate the crash window: dir moved aside, new version never arrived
    val aside = new Path(s"$base/s2/.store.previous")
    assert(fs.rename(dir, aside))
    // reader: sees the committed content in place, renames NOTHING
    val root = StoreCommit.readableRoot(fs, dir)
    assert(root == aside && has(root, "v1"))
    assert(!fs.exists(dir), "readableRoot must not mutate the store")
    // writer: restores the main dir, cursor intact
    assert(StoreCommit.committedBatch(fs, dir) == 7L) // committedBatch recovers
    assert(fs.exists(dir) && has(dir, "v1"))
    // recover tolerates racing itself / the dir reappearing
    StoreCommit.recover(fs, dir)
    assert(fs.exists(dir))
  }

  test("cursor: -1 before any commit; readableRoot falls back to the (absent) dir") {
    val dir = new Path(s"$base/s3/store")
    val fs = StoreCommit.fsOf(spark, dir)
    assert(StoreCommit.committedBatch(fs, dir) == -1L)
    assert(StoreCommit.readableRoot(fs, dir) == dir)
  }

  test("committedBatchReadable serves the cursor from a crash aside WITHOUT mutating (r15 review)") {
    val dir = new Path(s"$base/s4/store")
    val fs = StoreCommit.fsOf(spark, dir)
    writeDir(dir, "v1")
    StoreCommit.writeMeta(fs, dir, 11L)
    // simulate the writer's swap window: main dir moved aside
    val aside = new Path(dir.getParent, s".${dir.getName}.previous")
    assert(fs.rename(dir, aside))
    // the read-side cursor resolves through the aside AND renames nothing —
    // a reader-side recover here could corrupt a live writer's swap
    assert(StoreCommit.committedBatchReadable(fs, dir) == 11L)
    assert(!fs.exists(dir) && fs.exists(aside),
      "read-side cursor lookup mutated the store (renamed the aside back)")
    // absent store: -1, still no mutation
    assert(StoreCommit.committedBatchReadable(fs, new Path(s"$base/s4/nope")) == -1L)
  }

  test("reader WHILE writer: every successful concurrent read equals a committed prefix (r15 verdict task 6)") {
    // the probe's own kernel at a spec-sized horizon: 14 batches of 800
    // rows drives the signature store through multiple delta publishes AND
    // (CompactAt=16 per bucket is not reached at this size — publish
    // windows are the target here; the 60-batch probe covers compaction
    // windows) with a reader thread racing committedBatch/read the whole
    // way. Violations = a read that matched NO committed prefix — the
    // torn-read and uncommitted-leak bug classes; transient vanished-file
    // retries are the documented compaction-window contract, tolerated.
    val dir = s"$base/rw/signature"
    val (reads, retries, violations) =
      graft.tools.StoreProbe.readerWriterRun(spark, dir, batches = 14, delta = 800)
    assert(violations.isEmpty,
      s"non-committed-prefix reads: ${violations.take(3).mkString("; ")}")
    assert(reads >= 2, s"reader landed only $reads reads — the race never ran")
    // after the dust settles, the final prefix is all 14 batches
    assert(graft.operators.SignatureStore.read(spark, dir).count() == 14L * 800)
    assert(retries < reads + 10, "reader mostly failed - not a transient-window pattern")
  }
}
