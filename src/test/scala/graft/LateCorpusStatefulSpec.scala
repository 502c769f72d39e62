package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{IncrementalView, KvEnrich, StreamingCuration}

/**
 * Late / out-of-order / duplicate arrival for the stateful streaming
 * operators the r15 watermark matrix did NOT cover (it exercised the
 * A1–A7 windowed/state family only): the incremental view, the streaming
 * CDC latest-per-key view, kv stream-static enrichment, the drift
 * monitors, and the per-key admission cap. Each test feeds an
 * adversarial arrival order — events delivered out of event-time order
 * across micro-batches, with exact-duplicate redeliveries — and pins the
 * operator's documented semantics deterministically.
 */
class LateCorpusStatefulSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val keys = Seq("k")

  test("incremental view: arrival order and mid-stream compaction never change the monoid") {
    // corpus in EVENT order: (key, value, event_seq). Arrival order is
    // adversarial: batch 1 gets the LAST events, batch 2 the first, batch 3
    // redelivers two rows that are genuine corpus duplicates (at-least-once
    // upstream) — count/sum must aggregate the fed multiset regardless.
    val store = tmp("late-ivm") + "/store"
    val b1 = Seq(("a", 30.0), ("b", 300.0))           // latest events first
    val b2 = Seq(("a", 10.0), ("a", 20.0), ("b", 100.0)) // older events later
    val b3 = Seq(("a", 10.0), ("b", 300.0))           // duplicate corpus rows
    val input = MemoryStream[(String, Double)](spark)
    val q = IncrementalView.start(input.toDF().toDF("k", "value"),
      keys, "value", store, tmp("late-ivm-ckpt"))
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      // compact BETWEEN late arrivals: folding deltas must not lose or
      // double any not-yet-arrived or already-folded contribution
      IncrementalView.compact(spark, store, keys)
      input.addData(b3); q.processAllAvailable()
    } finally q.stop()
    val got = IncrementalView.read(spark, store, keys).collect()
      .map(r => r.getAs[String]("k") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Double]("sum_value")))).toMap
    val fed = b1 ++ b2 ++ b3
    val want = fed.groupBy(_._1).map { case (k, vs) =>
      k -> ((vs.size.toLong, vs.map(_._2).sum)) }
    assert(got === want,
      "view must equal the batch aggregate of the fed multiset, any arrival order")
  }

  test("streaming CDC view: late old upserts lose to newer versions AND tombstones; redelivery is idempotent") {
    val store = tmp("late-cdc") + "/store"
    val cdcAgg = graft.operators.Cdc.latestAgg(Seq("cid"), Seq("v"), "del")
    def snapshot(): Map[String, Double] =
      graft.operators.Cdc.snapshotOf(
          IncrementalView.read(spark, store, keys, cdcAgg),
          keys, Seq("cid"), Seq("v"), "del")
        .collect().map(r => r.getAs[String]("k") -> r.getAs[Double]("v")).toMap
    val input = MemoryStream[(String, Long, Double, Boolean)](spark)
    val q = IncrementalView.start(input.toDF().toDF("k", "cid", "v", "del"),
      keys, cdcAgg, store, tmp("late-cdc-ckpt"))
    try {
      // batch 1 (arrives first, but NEWER changes): a@5, tombstone b@10
      input.addData(("a", 5L, 5.0, false), ("b", 10L, 0.0, true))
      q.processAllAvailable()
      assert(snapshot() === Map("a" -> 5.0))
      // batch 2: LATE OLD changes — a@3 must lose to a@5; b@7 must stay
      // dead under the @10 tombstone (the batch-spec scenario, streamed)
      input.addData(("a", 3L, 3.0, false), ("b", 7L, 7.0, false))
      q.processAllAvailable()
      assert(snapshot() === Map("a" -> 5.0),
        "a late old upsert must never override a newer version or tombstone")
      // batch 3: exact duplicate redelivery of a@5 (idempotent max) plus a
      // genuinely newer b@12 — resurrection wins
      input.addData(("a", 5L, 5.0, false), ("b", 12L, 12.0, false))
      q.processAllAvailable()
      assert(snapshot() === Map("a" -> 5.0, "b" -> 12.0))
    } finally q.stop()
  }

  test("kv enrichment: duplicates enrich identically; a late redelivery joins the CURRENT epoch") {
    val kvPath = tmp("late-kv") + "/dim"
    val outDir = tmp("late-kv-out")
    // dimension epoch 0
    Seq((1L, "US"), (2L, "DE")).toDF("id", "region")
      .write.format("graft-kv").option("path", kvPath).mode("append").save()
    val input = MemoryStream[(Long, String)](spark)
    val q = KvEnrich.enrichedSink(input.toDF().toDF("id", "ev"),
      kvPath, Seq("id"), outDir, tmp("late-kv-ckpt"))
    try {
      // batch 1 carries an exact duplicate event — both rows must enrich
      // identically under ONE pinned epoch
      input.addData((1L, "x"), (1L, "x"), (2L, "y"))
      q.processAllAvailable()
      // dimension moves between batches (epoch 1): region of id 1 changes —
      // UPSERT, because the store's current view is first-write-wins on
      // plain appends
      graft.sinks.v2.KvStore.upsert(spark, kvPath,
        Seq((1L, "FR")).toDF("id", "region"), Seq("id"))
      // batch 2 redelivers the OLD event (1, "x"): enrichment is pinned to
      // the epoch current AT ARRIVAL (documented semantics), so it now
      // carries the new region, distinguishable via _dim_epoch
      input.addData((1L, "x"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(outDir)
      .select("id", "ev", "region", "_dim_epoch").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val b1 = out.filter(_._4 == 0L)
    val b2 = out.filter(_._4 != 0L)
    assert(b1.count(t => t._1 == 1L && t._3 == "US") === 2,
      s"duplicate events must enrich identically in their batch: ${out.toSeq}")
    assert(b1.exists(t => t._1 == 2L && t._3 == "DE"))
    assert(b2.toSeq.map(t => (t._1, t._2, t._3)) === Seq((1L, "x", "FR")),
      s"late redelivery must join the epoch current at arrival: ${out.toSeq}")
    // every row of a batch carries exactly one epoch (no torn view)
    assert(out.map(_._4).distinct.length === 2)
  }

  test("drift monitor rows are pure functions of batch content: permuted redelivery is bit-identical") {
    val ref = Seq("a", "a", "b", "b").toDF("cat")
    val outDir = tmp("late-drift-out")
    val input = MemoryStream[String](spark)
    val q = graft.streaming.StreamingDrift.startJsDriftMonitor(
      input.toDF().toDF("cat"), ref, "cat", threshold = 0.25,
      outDir, tmp("late-drift-ckpt"))
    try {
      // the same multiset arrives twice, in different orders (an upstream
      // replay of a reordered partition) — the audit rows must agree on
      // every column except batch_id, so downstream max(batch_id)/dedup
      // reads one truthful verdict
      input.addData("a", "c", "b", "a"); q.processAllAvailable()
      input.addData("b", "a", "a", "c"); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(outDir)
      .select("batch_id", "n_rows", "n_cats", "jsd", "drifted").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).sortBy(_._1)
    assert(rows.length === 2)
    assert(rows(0)._1 !== rows(1)._1)
    assert((rows(0)._2, rows(0)._3, rows(0)._4, rows(0)._5) ===
      ((rows(1)._2, rows(1)._3, rows(1)._4, rows(1)._5)),
      s"permuted redelivery must produce a bit-identical audit row: ${rows.toSeq}")
  }

  test("per-key cap: exact duplicate redelivery consumes admission (arrival-order contract)") {
    val outDir = tmp("late-cap-out")
    val input = MemoryStream[(String, Long)](spark)
    val q = StreamingCuration.perKeyCapGate(
        input.toDF().toDF("source", "doc_id"), "source", "doc_id", maxPerKey = 2)
      .toDF("source", "doc_id")
      .writeStream.outputMode("append")
      .option("checkpointLocation", tmp("late-cap-ckpt"))
      .format("parquet").option("path", outDir).start()
    try {
      input.addData(("s", 1L)); q.processAllAvailable()
      // the SAME (key, id) redelivered: arrival-order admission state is a
      // count, so the duplicate takes the second slot — at-least-once
      // upstreams must dedup BEFORE the cap if they want distinct-id caps
      input.addData(("s", 1L)); q.processAllAvailable()
      input.addData(("s", 2L)); q.processAllAvailable() // cap full — rejected
    } finally q.stop()
    val admitted = spark.read.parquet(outDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(admitted.sortBy(_._2) === Seq(("s", 1L), ("s", 1L)),
      s"cap must admit exactly the first two arrivals (including the duplicate): $admitted")
  }
}
