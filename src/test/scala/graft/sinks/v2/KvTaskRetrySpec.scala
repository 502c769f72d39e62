package graft.sinks.v2

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * Executor-side duplicate-attempt pressure: a real cluster retries failed
 * tasks (and clones stragglers via speculation), so every write path must
 * tolerate a task attempt that dies AFTER staging bytes on disk. The
 * `kvwriter:mid-write` failpoint kills ONE task attempt mid-row inside
 * [[KvDataWriter.write]]; Spark aborts that writer (its partial staged file
 * must vanish) and re-attempts the task under `local[4, 2]`
 * (maxFailures = 2 — see [[graft.TestSpark]]). The published store must be
 * byte-identical to a clean run: exactly-once rows, no partial-attempt
 * leftovers for readers, zero staging orphans for vacuum.
 *
 * (True speculative TWINS cannot launch on a single host — the scheduler
 * requires a speculative attempt to run on a different host than the
 * original — so task retry is the strongest duplicate-attempt stress a
 * one-machine harness can apply; the abort/commit machinery is the same.)
 */
class KvTaskRetrySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-kv-retry").resolve("store").toString

  /** every file under _staging/ (abort leftovers would show up here) */
  private def stagedFiles(p: String): Seq[String] = {
    val dir = KvStore.stagingDir(p)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).map(_.getPath.getName).toSeq
  }

  test("batch append survives a mid-write task failure exactly-once") {
    val p = tmp()
    val df = spark.range(0, 400).repartition(4)
      .select(col("id"), concat(lit("v"), col("id")).as("s"))
    Failpoints.reset() // forget prior tests' fire history — the hasFired
    // guard below must witness THIS test's injection, not a sticky flag
    Failpoints.arm("kvwriter:mid-write")
    try {
      df.write.format("graft-kv").option("path", p).mode("append").save()
      assert(Failpoints.hasFired("kvwriter:mid-write"),
        "failpoint never fired — the axis tested nothing")
      val back = KvStore.read(spark, p)
      assert(back.count() === 400)
      assert(back.agg(sum("id")).head.getLong(0) === 399L * 400 / 2)
      // no duplicate keys from the failed attempt's partial file
      assert(back.select("id").distinct().count() === 400)
      // abort() deleted the partial staged file; commit renamed the rest —
      // nothing for vacuum to find even with the grace window disabled
      assert(stagedFiles(p).isEmpty, s"staging orphans: ${stagedFiles(p)}")
      assert(KvStore.vacuum(p, graceMs = -5000) === 0L)
    } finally Failpoints.disarmAll()
  }

  test("upsert survives a mid-write task failure exactly-once") {
    val p = tmp()
    spark.range(0, 100).select(col("id"), lit(0L).as("n"))
      .write.format("graft-kv").option("path", p).mode("append").save()
    Failpoints.reset() // forget prior tests' fire history — the hasFired
    // guard below must witness THIS test's injection, not a sticky flag
    Failpoints.arm("kvwriter:mid-write")
    try {
      val src = spark.range(50, 150).repartition(3)
        .select(col("id"), lit(7L).as("n"))
      KvStore.upsert(spark, p, src, Seq("id"))
      assert(Failpoints.hasFired("kvwriter:mid-write"))
      val cur = KvStore.readCurrent(spark, p, Seq("id"))
      assert(cur.count() === 150)
      // ids 50..149 carry the upserted value, 0..49 the original
      assert(cur.where(col("n") === 7L).count() === 100)
      assert(cur.where(col("n") === 0L).count() === 50)
      assert(stagedFiles(p).isEmpty, s"staging orphans: ${stagedFiles(p)}")
    } finally Failpoints.disarmAll()
  }

  test("compact survives a mid-write task failure; store content unchanged") {
    val p = tmp()
    spark.range(0, 200).select(col("id"), (col("id") * 2).as("n"))
      .write.format("graft-kv").option("path", p).mode("append").save()
    spark.range(200, 300).select(col("id"), (col("id") * 2).as("n"))
      .write.format("graft-kv").option("path", p).mode("append").save()
    Failpoints.reset() // forget prior tests' fire history — the hasFired
    // guard below must witness THIS test's injection, not a sticky flag
    Failpoints.arm("kvwriter:mid-write")
    try {
      KvStore.compact(spark, p, Seq("id"))
      assert(Failpoints.hasFired("kvwriter:mid-write"))
      val cur = KvStore.readCurrent(spark, p, Seq("id"))
      assert(cur.count() === 300)
      assert(cur.agg(sum("n")).head.getLong(0) === 299L * 300)
      assert(stagedFiles(p).isEmpty, s"staging orphans: ${stagedFiles(p)}")
    } finally Failpoints.disarmAll()
  }

  test("streaming epoch write survives a mid-write task failure exactly-once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val p = tmp()
    val mem = MemoryStream[Long]
    mem.addData(0L until 300L: _*)
    Failpoints.reset() // forget prior tests' fire history — the hasFired
    // guard below must witness THIS test's injection, not a sticky flag
    Failpoints.arm("kvwriter:mid-write")
    try {
      val q = mem.toDF().repartition(3).select(col("value").as("id"))
        .writeStream.format("graft-kv").option("path", p)
        .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      assert(Failpoints.hasFired("kvwriter:mid-write"))
      val back = KvStore.read(spark, p)
      assert(back.count() === 300)
      assert(back.select("id").distinct().count() === 300)
      assert(stagedFiles(p).isEmpty, s"staging orphans: ${stagedFiles(p)}")
    } finally Failpoints.disarmAll()
  }
}
