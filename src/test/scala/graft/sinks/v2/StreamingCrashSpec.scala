package graft.sinks.v2

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

/**
 * Streaming crash recovery END-TO-END: the composition KvCrashSpec (batch
 * API crash contracts) and KvMultiWriterSpec (simulated replays) each
 * prove piecewise, experienced the way a production user does. A
 * failpoint is armed under a REAL running `StreamingQuery` — the
 * native two-phase `graft-kv` sink and the foreachBatch CDC-apply
 * (tagged upsert) — the query dies mid-commit exactly as if the driver
 * was killed, a NEW query restarts from the same checkpoint, Structured
 * Streaming replays the failed batch, and the store must come out
 * exactly-once:
 *
 *  - a crash BEFORE the manifest CAS leaves the pre-batch state visible
 *    (staged/published-but-unlisted files are invisible); the replay
 *    re-runs the mutation to completion;
 *  - a crash AFTER the CAS leaves the batch committed; the replay is
 *    absorbed by its `stream:`/`stream-upsert:` tag as a no-op;
 *  - either way the restarted stream keeps processing new batches, every
 *    row appears exactly once in the raw (pre-resolution) read, and
 *    `vacuum` reclaims the crash's orphans without changing state.
 */
class StreamingCrashSpec extends AnyFunSuite with BeforeAndAfterEach {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  override def afterEach(): Unit = Failpoints.disarmAll()

  private def tmp(): String =
    Files.createTempDirectory("graft_scrash_").toString + "/store"

  private def visible(p: String): Map[Long, Long] =
    KvStore.readCurrent(spark, p, Seq("id"))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** exactly-once at the ROW level: raw (pre-resolution) read has one row
   * per key — a double-committed replay would show two */
  private def assertRawExactlyOnce(p: String): Unit = {
    val dup = KvStore.read(spark, p).groupBy("id").count()
      .where(org.apache.spark.sql.functions.col("count") > 1L).collect()
    assert(dup.isEmpty, s"duplicate raw rows — a replay double-committed: ${dup.toSeq}")
  }

  private def causeChain(e: Throwable): Seq[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(20).toSeq

  /** drives one crash × restart cycle through the native graft-kv sink */
  private def sinkCrashCase(point: String, committedAtCrash: Boolean): Unit = {
    val p = tmp()
    val ckpt = Files.createTempDirectory("graft_scrash_ckpt_").toString
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    def start() = mem.toDF().toDF("id", "v").writeStream
      .format("graft-kv").option("path", p)
      .option("checkpointLocation", ckpt).start()

    val q = start()
    val batch0 = Map(0L -> 10L, 1L -> 11L)
    try {
      mem.addData(0L -> 10L, 1L -> 11L)
      q.processAllAvailable() // batch 0 commits clean
      assert(visible(p) === batch0)

      Failpoints.reset() // points repeat across scenarios — witness THIS firing
      Failpoints.arm(point)
      mem.addData(2L -> 12L, 3L -> 13L)
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(causeChain(e).exists(_.isInstanceOf[Failpoints.InjectedFailure]),
        s"query must die OF the injection, got: $e")
      assert(Failpoints.hasFired(point), s"armed hook '$point' never fired")
      assert(!q.isActive, "the injected crash must terminate the query")
    } finally if (q.isActive) q.stop()

    // crash contract on the dead store: pre-CAS points show batch 0 only,
    // post-CAS points show batch 1 already committed
    val batch01 = batch0 ++ Map(2L -> 12L, 3L -> 13L)
    assert(visible(p) === (if (committedAtCrash) batch01 else batch0),
      s"$point: wrong mid-crash visibility")
    assertRawExactlyOnce(p)

    // restart from the SAME checkpoint: batch 1 replays — absorbed by its
    // stream:<queryId>:<epoch> tag when already committed, completed when
    // not — then the stream keeps going
    val q2 = start()
    try {
      q2.processAllAvailable() // replay of batch 1
      assert(visible(p) === batch01, s"$point: replay not exactly-once")
      mem.addData(4L -> 14L)
      q2.processAllAvailable() // liveness: the next batch lands
      assert(visible(p) === batch01 + (4L -> 14L))
      assertRawExactlyOnce(p)
    } finally q2.stop()

    // the crash's orphans (staged / published-but-unlisted files) are
    // vacuum's to reclaim — and reclaiming them changes nothing visible
    KvStore.vacuum(p, graceMs = 0L)
    assert(visible(p) === batch01 + (4L -> 14L), s"$point: vacuum changed state")
    assertRawExactlyOnce(p)
  }

  // two-phase epoch commit: one case per step boundary a real driver
  // could die at (staged → published → manifest tmp → CAS → cleanup)
  Seq(
    "commit:begin" -> false,
    "commit:after-publish" -> false,
    "manifest:after-tmp" -> false,
    "manifest:after-cas" -> true,
    "commit:after-cas" -> true
  ).foreach { case (point, committed) =>
    test(s"kv sink under a live query: crash at $point, checkpoint restart is exactly-once") {
      sinkCrashCase(point, committed)
    }
  }

  /** drives one crash × restart cycle through the foreachBatch CDC-apply
   * (tagged upsert) — the StreamBench/production merge shape */
  private def cdcCrashCase(point: String, committedAtCrash: Boolean): Unit = {
    val p = tmp()
    val ckpt = Files.createTempDirectory("graft_scrash_ckpt_").toString
    // pre-seed the store: the upsert must REPLACE these via the dv swap
    Seq(0L -> 0L, 1L -> 1L, 2L -> 2L).toDF("id", "v").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    def start() = mem.toDF().toDF("id", "v").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        KvStore.upsert(spark, p, df.dropDuplicates("id"), Seq("id"),
          tag = Some(s"stream-upsert:cdc:$id"))
      }
      .option("checkpointLocation", ckpt).start()

    val q = start()
    val afterB0 = Map(0L -> 100L, 1L -> 1L, 2L -> 2L, 5L -> 105L)
    try {
      mem.addData(0L -> 100L, 5L -> 105L) // replace 0, insert 5
      q.processAllAvailable()
      assert(visible(p) === afterB0)

      Failpoints.reset() // points repeat across scenarios — witness THIS firing
      Failpoints.arm(point)
      mem.addData(1L -> 201L, 6L -> 206L) // replace 1, insert 6
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(causeChain(e).exists(_.isInstanceOf[Failpoints.InjectedFailure]),
        s"query must die OF the injection, got: $e")
      assert(Failpoints.hasFired(point), s"armed hook '$point' never fired")
      assert(!q.isActive)
    } finally if (q.isActive) q.stop()

    val afterB1 = afterB0 ++ Map(1L -> 201L, 6L -> 206L)
    assert(visible(p) === (if (committedAtCrash) afterB1 else afterB0),
      s"$point: wrong mid-crash visibility — the merge must be atomic")
    assertRawExactlyOnce(p)

    val q2 = start()
    try {
      q2.processAllAvailable() // batch 1 replays through the tagged upsert
      assert(visible(p) === afterB1, s"$point: CDC replay not exactly-once")
      mem.addData(2L -> 302L) // liveness: next merge replaces key 2
      q2.processAllAvailable()
      assert(visible(p) === afterB1 + (2L -> 302L))
      assertRawExactlyOnce(p)
    } finally q2.stop()

    KvStore.vacuum(p, graceMs = 0L)
    assert(visible(p) === afterB1 + (2L -> 302L), s"$point: vacuum changed state")
    assertRawExactlyOnce(p)
  }

  // OCC upsert (CDC-apply): staging → publish → dv write → manifest tmp →
  // CAS, each a kill point a production merge actually passes through
  Seq(
    "upsert:after-stage" -> false,
    "upsert:after-publish" -> false,
    "upsert:after-dv-write" -> false,
    "manifest:after-tmp" -> false,
    "upsert:after-cas" -> true
  ).foreach { case (point, committed) =>
    test(s"foreachBatch CDC-apply under a live query: crash at $point, checkpoint restart is exactly-once") {
      cdcCrashCase(point, committed)
    }
  }

  test("back-to-back crashes: sink crash, restart, CDC crash on the same store, restart — state converges") {
    // a second composition: the SAME store takes an append-path crash and
    // an upsert-path crash in sequence, each from a different live query
    val p = tmp()
    val ckptA = Files.createTempDirectory("graft_scrash_ckpt_").toString
    val ckptB = Files.createTempDirectory("graft_scrash_ckpt_").toString
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    val memA = MemoryStream[(Long, Long)]
    def startA() = memA.toDF().toDF("id", "v").writeStream
      .format("graft-kv").option("path", p)
      .option("checkpointLocation", ckptA).start()
    val qA = startA()
    try {
      memA.addData(0L -> 0L, 1L -> 1L)
      qA.processAllAvailable()
      Failpoints.arm("commit:after-publish")
      memA.addData(2L -> 2L)
      intercept[StreamingQueryException] { qA.processAllAvailable() }
    } finally if (qA.isActive) qA.stop()
    val qA2 = startA()
    try { qA2.processAllAvailable() } finally qA2.stop()
    assert(visible(p) === Map(0L -> 0L, 1L -> 1L, 2L -> 2L))

    val memB = MemoryStream[(Long, Long)]
    def startB() = memB.toDF().toDF("id", "v").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        KvStore.upsert(spark, p, df.dropDuplicates("id"), Seq("id"),
          tag = Some(s"stream-upsert:cdc2:$id"))
      }
      .option("checkpointLocation", ckptB).start()
    val qB = startB()
    try {
      Failpoints.arm("upsert:after-dv-write")
      memB.addData(1L -> 11L, 3L -> 13L)
      intercept[StreamingQueryException] { qB.processAllAvailable() }
    } finally if (qB.isActive) qB.stop()
    assert(visible(p) === Map(0L -> 0L, 1L -> 1L, 2L -> 2L),
      "dv files on disk but CAS not attempted: nothing may be visible")
    val qB2 = startB()
    try { qB2.processAllAvailable() } finally qB2.stop()
    assert(visible(p) === Map(0L -> 0L, 1L -> 11L, 2L -> 2L, 3L -> 13L))
    assertRawExactlyOnce(p)
    KvStore.vacuum(p, graceMs = 0L)
    assert(visible(p) === Map(0L -> 0L, 1L -> 11L, 2L -> 2L, 3L -> 13L))
  }
}
