package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sinks.v2.KvStore

/**
 * OCC multi-writer × executor-churn harness (r16): ≥2 concurrent WRITER
 * THREADS share one `graft-kv` store — interleaved appends, tagged
 * upserts, and a competing compactor — designed to run under
 * `local-cluster` while `tools/chaos.sh occ` SIGKILLs executors mid-run.
 * This is the cross product the r15 matrix left untested: the commit
 * log's CAS + retry under BOTH writer-vs-writer contention AND
 * task-retry/duplicate-attempt pressure from dying executors.
 *
 * Determinism by construction, so the final store has ONE correct answer
 * regardless of interleaving:
 *   - writer w owns the disjoint id range [w·RANGE, (w+1)·RANGE): appends
 *     never collide across writers, and each id is appended exactly once
 *     (first-write-wins resolution can never pick a "wrong" row);
 *   - upserts stay inside the owner's range and are serialized IN-THREAD,
 *     so the last stamp per slice is the thread-order last — a per-writer
 *     serial model, independent of cross-writer scheduling;
 *   - the compactor is state-preserving by contract; on an OCC conflict
 *     it aborts store-unchanged and retries.
 *
 * Exit 0 and `"match":true` iff readCurrent equals the serial model.
 */
object OccChaos {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val writers = sys.env.getOrElse("SPARK_GRAFT_OCC_WRITERS", "3").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_OCC_ROUNDS", "12").toInt
    val rowsPerRound = sys.env.getOrElse("SPARK_GRAFT_OCC_ROWS", "20000").toInt
    require(writers >= 2 && rounds >= 1 && rowsPerRound >= 2)
    val spark = ClusterMode.configure(SparkSession.builder(), cpus)
      .appName("graft-occ-chaos")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    val path = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-occ").toString + "/store")
    val range = 10000000L
    val t0 = System.nanoTime()

    def appendRound(w: Int, b: Int): Unit = {
      val lo = w * range + b.toLong * rowsPerRound
      spark.range(lo, lo + rowsPerRound, 1, 4)
        .select(col("id"), (col("id") * 2).as("v"))
        .write.format("graft-kv").option("path", path).mode("append").save()
    }
    // upsert the owner's FIRST slice with the round stamp; in-thread order
    // makes the final stamp the largest upserting round. upsert's OCC
    // contract is abort-store-unchanged after its internal attempts when
    // concurrent commits keep landing — the CALLER owns the retry policy
    // (safe here: the tag makes a retried statement idempotent), so retry
    // until it lands; under 4 writers + chaos a round can lose several
    // races back to back.
    def upsertRound(w: Int, b: Int): Unit = {
      val lo = w * range
      var attempts = 0
      var done = false
      while (!done) {
        try {
          KvStore.upsert(spark, path,
            spark.range(lo, lo + rowsPerRound / 2, 1, 2)
              .select(col("id"), lit(-b.toLong).as("v")),
            Seq("id"), tag = Some(s"occ-upsert:$w:$b"))
          done = true
        } catch {
          case e: java.io.IOException
              if e.getMessage != null && e.getMessage.contains("retry") &&
                attempts < 50 =>
            attempts += 1
            Thread.sleep(100L + scala.util.Random.nextInt(200))
        }
      }
    }

    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writerThreads = (0 until writers).map { w =>
      new Thread(() => {
        try {
          (0 until rounds).foreach { b =>
            appendRound(w, b)
            if (b % 3 == 2) upsertRound(w, b)
          }
        } catch { case e: Throwable => errs.add(e) }
      }, s"occ-writer-$w")
    }
    val stopCompactor = new java.util.concurrent.atomic.AtomicBoolean(false)
    var compactions = 0
    var compactConflicts = 0
    val compactor = new Thread(() => {
      while (!stopCompactor.get()) {
        try { KvStore.compact(spark, path, Seq("id")); compactions += 1 }
        catch {
          case _: java.io.IOException => compactConflicts += 1 // OCC race lost — store unchanged
          case e: Throwable => errs.add(e); stopCompactor.set(true)
        }
        Thread.sleep(1500L)
      }
    }, "occ-compactor")
    writerThreads.foreach(_.start())
    compactor.start()
    writerThreads.foreach(_.join())
    stopCompactor.set(true)
    compactor.join()

    if (!errs.isEmpty) {
      errs.forEach(e => e.printStackTrace())
      println(s"""{"mode":"occ","match":false,"error":"${errs.peek().getClass.getSimpleName}"}""")
      spark.stop(); sys.exit(2)
    }
    // serial model: every appended id once at v = 2·id, except each
    // writer's first slice, stamped by its LAST upserting round
    val lastStamp = (0 until rounds).filter(_ % 3 == 2).lastOption
    val expected = (0 until writers).map { w =>
      val appended = spark.range(w * range, w * range + rounds.toLong * rowsPerRound)
        .select(col("id"), (col("id") * 2).as("v"))
      lastStamp match {
        case Some(b) =>
          appended.withColumn("v",
            when(col("id") < w * range + rowsPerRound / 2, lit(-b.toLong))
              .otherwise(col("v")))
        case None => appended
      }
    }.reduce(_ unionAll _)
    val got = KvStore.readCurrent(spark, path, Seq("id")).select("id", "v")
    val missing = expected.except(got).count()
    val extra = got.except(expected).count()
    val nGot = got.count()
    val ok = missing == 0 && extra == 0
    val sec = Fmt.num("%.1f", (System.nanoTime() - t0) / 1e9)
    println(s"""{"mode":"occ","writers":$writers,"rounds":$rounds,"rows_per_round":$rowsPerRound,""" +
      s""""store_rows":$nGot,"missing":$missing,"extra":$extra,""" +
      s""""compactions":$compactions,"compact_conflicts":$compactConflicts,""" +
      s""""sec":$sec,"match":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
