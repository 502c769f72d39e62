package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.IncrementalView

/**
 * Late/duplicate arrival × executor-churn harness (r17): the cross product
 * the r16 matrix left untested. `LateCorpusStatefulSpec` proved the
 * incremental view and the streaming CDC snapshot survive adversarial
 * ARRIVAL (out-of-order + duplicate delivery); `tools/chaos.sh` proved the
 * batch/stream paths survive executor SIGKILLs. This main composes them:
 * feed an adversarial late corpus through BOTH stateful views under
 * `local-cluster` while `tools/chaos.sh late` kills executors mid-run.
 *
 * Corpus and expectations are DETERMINISTIC by construction, so the final
 * stores have one correct answer regardless of interleaving, retries, or
 * duplicate task attempts:
 *   - events are generated in event order (global seq = version id), then
 *     delivered in REVERSED batch order (newest events first — every later
 *     batch is "late"), with every third batch redelivered verbatim
 *     (at-least-once upstream);
 *   - the incremental view's contract is "aggregate of the FED multiset"
 *     (redeliveries included), so expected (count, sum) per key is closed-
 *     form over generated + duplicated batches;
 *   - the CDC view's latest-per-key max is idempotent, so redeliveries
 *     change nothing and the expected snapshot is each key's max-seq event
 *     (absent when that event is a tombstone);
 *   - mid-run compactions (every `compactEvery` batches, on both stores)
 *     exercise fold-during-append under churn, as the spec did quietly.
 *
 * MemoryStream keeps the SOURCE on the driver — kills can only hit the
 * delta-append/compact executors, which is exactly the surface under test
 * (the store's commit markers + replay idempotence, not source recovery;
 * `LogsSourceSpec` owns source-side restart).
 *
 * Exit 0 and `"match":true` iff both views equal their models.
 */
object LateChaos {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nKeys = sys.env.getOrElse("SPARK_GRAFT_LATE_KEYS", "400").toInt
    val batches = sys.env.getOrElse("SPARK_GRAFT_LATE_BATCHES", "30").toInt
    val rowsPerBatch = sys.env.getOrElse("SPARK_GRAFT_LATE_ROWS", "6000").toInt
    val compactEvery = sys.env.getOrElse("SPARK_GRAFT_LATE_COMPACT_EVERY", "5").toInt
    require(nKeys >= 2 && batches >= 3 && rowsPerBatch >= nKeys)
    val spark = ClusterMode.configure(SparkSession.builder(), cpus)
      .appName("graft-late-chaos")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val t0 = System.nanoTime()

    val root = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-late").toString)
    val ivmStore = s"$root/ivm-store"
    val cdcStore = s"$root/cdc-store"
    val keys = Seq("k")

    // event (seq): key = seq % nKeys, value = deterministic, tombstone on
    // every 11th seq. seq doubles as the CDC version (unique, increasing).
    val total = batches.toLong * rowsPerBatch
    def keyOf(seq: Long) = "k%04d".format(seq % nKeys)
    def valOf(seq: Long): Double = (seq % 97).toDouble + 0.5
    def delOf(seq: Long): Boolean = seq % 11 == 10
    // batch b (0-based) carries the REVERSED slice: the LAST rowsPerBatch
    // seqs arrive first — every subsequent batch is entirely "late".
    def batchRows(b: Int): Seq[(String, Long, Double, Boolean)] = {
      val hi = total - b.toLong * rowsPerBatch
      (hi - rowsPerBatch until hi).map(s => (keyOf(s), s, valOf(s), delOf(s)))
    }
    // duplicate redelivery: every third batch is fed twice back to back
    def dup(b: Int): Boolean = b % 3 == 2

    val ivmIn = MemoryStream[(String, Double)](spark)
    val cdcIn = MemoryStream[(String, Long, Double, Boolean)](spark)
    val cdcAgg = graft.operators.Cdc.latestAgg(Seq("cid"), Seq("v"), "del")
    val ivmQ = IncrementalView.start(ivmIn.toDF().toDF("k", "value"),
      keys, "value", ivmStore, s"$root/ivm-ckpt")
    val cdcQ = IncrementalView.start(cdcIn.toDF().toDF("k", "cid", "v", "del"),
      keys, cdcAgg, cdcStore, s"$root/cdc-ckpt")
    var fedBatches = 0
    try {
      (0 until batches).foreach { b =>
        val rows = batchRows(b)
        val feeds = if (dup(b)) Seq(rows, rows) else Seq(rows)
        feeds.foreach { r =>
          ivmIn.addData(r.map(e => (e._1, e._3)))
          cdcIn.addData(r)
          ivmQ.processAllAvailable()
          cdcQ.processAllAvailable()
          fedBatches += 1
        }
        if ((b + 1) % compactEvery == 0) {
          IncrementalView.compact(spark, ivmStore, keys)
          IncrementalView.compact(spark, cdcStore, keys, agg = cdcAgg)
        }
      }
    } finally { ivmQ.stop(); cdcQ.stop() }

    // ---- models (driver-side closed form, no Spark involved) ----
    // fed multiset = every batch once + the dup'd batches again
    val dupFactor: Long => Long = seq => {
      val b = (batches - 1 - (seq / rowsPerBatch)).toInt // batch that carried seq
      if (dup(b)) 2L else 1L
    }
    val expIvm = (0L until total).groupBy(keyOf)
      .map { case (k, seqs) =>
        k -> ((seqs.map(dupFactor).sum,
          seqs.map(s => valOf(s) * dupFactor(s)).sum))
      }
    val expCdc = (0L until total).groupBy(keyOf)
      .flatMap { case (k, seqs) =>
        val last = seqs.max
        if (delOf(last)) None else Some(k -> ((last, valOf(last))))
      }

    val gotIvm = IncrementalView.read(spark, ivmStore, keys).collect()
      .map(r => r.getAs[String]("k") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Double]("sum_value")))).toMap
    val gotCdc = graft.operators.Cdc.snapshotOf(
        IncrementalView.read(spark, cdcStore, keys, cdcAgg),
        keys, Seq("cid"), Seq("v"), "del")
      .collect()
      .map(r => r.getAs[String]("k") ->
        ((r.getAs[Long]("cid"), r.getAs[Double]("v")))).toMap

    // plain equality is sound: values are exact binary halves well below
    // 2^52, so the double sums carry no fp drift in either engine order
    val ivmOk = gotIvm == expIvm
    val cdcOk = gotCdc == expCdc
    val ok = ivmOk && cdcOk
    val sec = Fmt.num("%.1f", (System.nanoTime() - t0) / 1e9)
    println(s"""{"mode":"late","keys":$nKeys,"batches":$batches,""" +
      s""""fed_batches":$fedBatches,"rows_per_batch":$rowsPerBatch,""" +
      s""""fed_rows":${fedBatches.toLong * rowsPerBatch},""" +
      s""""ivm_keys":${gotIvm.size},"cdc_keys":${gotCdc.size},""" +
      s""""ivm_match":$ivmOk,"cdc_match":$cdcOk,"sec":$sec,"match":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
