package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.IncrementalView

class IncrementalViewSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/store"

  private val keys = Seq("k")

  private def viewAsMap(store: String): Map[String, (Long, Double)] =
    IncrementalView.read(spark, store, keys).collect()
      .map(r => r.getAs[String]("k") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Double]("sum_value")))).toMap

  test("incremental result equals full recompute after several batches") {
    val store = tmp("ivm")
    val batches = Seq(
      Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)),
      Seq(("b", 4.0), ("c", 5.0)),
      Seq(("a", 6.0)))
    batches.zipWithIndex.foreach { case (rows, i) =>
      IncrementalView.applyBatch(rows.toDF("k", "value"), i.toLong, keys, "value", store)
    }
    val expected = batches.flatten.groupBy(_._1)
      .map { case (k, vs) => k -> ((vs.size.toLong, vs.map(_._2).sum)) }
    assert(viewAsMap(store) === expected)
  }

  test("replayed batch ids are no-ops; compaction preserves the view") {
    val store = tmp("ivm-replay")
    val b0 = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "value")
    IncrementalView.applyBatch(b0, 0L, keys, "value", store)
    IncrementalView.applyBatch(b0, 0L, keys, "value", store) // replay: no double count
    assert(viewAsMap(store) === Map("a" -> ((1L, 1.0)), "b" -> ((1L, 2.0))))
    IncrementalView.applyBatch(Seq(("a", 9.0)).toDF("k", "value"), 1L, keys, "value", store)
    val before = viewAsMap(store)
    IncrementalView.compact(spark, store, keys)
    assert(viewAsMap(store) === before)
    // folded deltas stay skippable even if their dirs linger: compact again
    IncrementalView.compact(spark, store, keys)
    assert(viewAsMap(store) === before)
    // post-compaction increments keep merging on top of the new base
    IncrementalView.applyBatch(Seq(("c", 7.0)).toDF("k", "value"), 2L, keys, "value", store)
    assert(viewAsMap(store) === before + ("c" -> ((1L, 7.0))))
  }

  test("compact on an empty store is a no-op, not a crash") {
    val store = tmp("ivm-empty")
    IncrementalView.compact(spark, store, keys) // must not throw
    intercept[IllegalStateException] { // still no data
      IncrementalView.read(spark, store, keys).collect()
    }
  }

  /** Recreate a committed delta dir by hand (the crash simulations need a
   * dir that applyBatch — which consults the manifest — would refuse to
   * rewrite). */
  private def plantDelta(store: String, name: String, rows: Seq[(String, Double)]): Unit = {
    val dir = java.nio.file.Paths.get(store, name)
    rows.toDF("k", "value")
      .groupBy("k").agg(count(lit(1)).as("n_rows"), sum("value").as("sum_value"))
      .write.mode("overwrite").parquet(dir.toString)
    java.nio.file.Files.createFile(dir.resolve("_GRAFT_COMMIT"))
  }

  test("lingering folded deltas stay excluded across LATER compactions (cumulative manifest)") {
    val store = tmp("ivm-linger")
    IncrementalView.applyBatch(Seq(("a", 1.0)).toDF("k", "value"), 0L, keys, "value", store)
    IncrementalView.compact(spark, store, keys) // folds delta_0 into base_0
    val expected = Map("a" -> ((1L, 1.0)))
    assert(viewAsMap(store) === expected)
    // simulate a crash between repoint and delete: delta_0 reappears on disk
    // with the same name (its content was already absorbed into the base)
    plantDelta(store, f"delta_${0L}%020d", Seq(("a", 1.0)))
    assert(viewAsMap(store) === expected, "manifest-listed delta must stay skipped")
    // a LATER compaction (new delta present) must keep skipping it — the
    // new base's manifest has to carry the lingering name forward
    IncrementalView.applyBatch(Seq(("b", 2.0)).toDF("k", "value"), 1L, keys, "value", store)
    IncrementalView.compact(spark, store, keys)
    assert(viewAsMap(store) === expected + ("b" -> ((1L, 2.0))),
      "cumulative manifest: absorbed deltas never re-enter the view")
  }

  test("a batch replayed AFTER its delta was compacted away is still a no-op") {
    val store = tmp("ivm-replay-compact")
    val b0 = Seq(("a", 1.0)).toDF("k", "value")
    IncrementalView.applyBatch(b0, 0L, keys, "value", store)
    IncrementalView.compact(spark, store, keys) // delta_0 folded AND deleted
    // crash-before-offsets-commit: the stream replays batch 0 — the dir is
    // gone, but the manifest knows it was absorbed
    IncrementalView.applyBatch(b0, 0L, keys, "value", store)
    assert(viewAsMap(store) === Map("a" -> ((1L, 1.0))),
      "replay after compaction must not double-count")
  }

  test("a batch replayed after TWO compactions is still a no-op (manifest retention)") {
    val store = tmp("ivm-replay-2compact")
    val b0 = Seq(("a", 1.0)).toDF("k", "value")
    // lineage-tagged writer (as the streaming wiring uses): folded before
    // the stream commits its offsets
    IncrementalView.applyBatch(b0, 0L, keys, "value", store, lineage = "aaaa1111")
    IncrementalView.compact(spark, store, keys) // fold #1: delta dir deleted
    // a SECOND lineage (offline backfill sharing the store) appends and a
    // second compaction runs before the first stream ever restarts — the
    // new base's manifest must still remember the first lineage's batch 0
    // even though its dir is long gone
    IncrementalView.applyBatch(Seq(("b", 2.0)).toDF("k", "value"), 0L, keys, "value",
      store, lineage = "bbbb2222")
    IncrementalView.compact(spark, store, keys) // fold #2
    // now the first stream restarts and replays its batch 0
    IncrementalView.applyBatch(b0, 0L, keys, "value", store, lineage = "aaaa1111")
    assert(viewAsMap(store) === Map("a" -> ((1L, 1.0)), "b" -> ((1L, 2.0))),
      "replay after two compactions must not double-count")
  }

  test("manifest retention bounds per-lineage entries but keeps lingering dirs listed") {
    val store = tmp("ivm-retention")
    (0 until 5).foreach { i =>
      IncrementalView.applyBatch(Seq(("a", 1.0)).toDF("k", "value"), i.toLong,
        keys, "value", store, lineage = "cccc3333")
      IncrementalView.compact(spark, store, keys, manifestRetention = 2)
    }
    // view is correct throughout retention pruning
    assert(viewAsMap(store) === Map("a" -> ((5L, 5.0))))
    // replay of a RECENT batch (inside the retention window) still no-ops
    IncrementalView.applyBatch(Seq(("a", 1.0)).toDF("k", "value"), 4L,
      keys, "value", store, lineage = "cccc3333")
    assert(viewAsMap(store) === Map("a" -> ((5L, 5.0))))
    // the manifest holds at most the retention bound for the lineage
    val base = IncrementalView.currentBaseName(spark, store).get
    val manifest = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(store, base, "_FOLDED")).toArray.mkString("\n")
    assert(manifest.split("\n").count(_.nonEmpty) <= 2)
  }

  test("torn (uncommitted) deltas are invisible to read until rewritten") {
    val store = tmp("ivm-torn")
    IncrementalView.applyBatch(Seq(("a", 1.0)).toDF("k", "value"), 0L, keys, "value", store)
    // simulate a mid-write crash of delta_1: dir + part files but no
    // _GRAFT_COMMIT marker (the module's own commit record, so the check
    // works even where the output committer's _SUCCESS is disabled)
    val torn = java.nio.file.Paths.get(store, f"delta_${1L}%020d")
    java.nio.file.Files.createDirectories(torn)
    Seq(("zz", 99.0)).toDF("k", "value")
      .groupBy("k").agg(count(lit(1)).as("n_rows"), sum("value").as("sum_value"))
      .write.mode("overwrite").parquet(torn.toString + "/.tmp-part")
    assert(viewAsMap(store) === Map("a" -> ((1L, 1.0))), "torn delta must not be read")
    // the restarted stream replays batch 1: torn dir is rewritten, not skipped
    IncrementalView.applyBatch(Seq(("b", 2.0)).toDF("k", "value"), 1L, keys, "value", store)
    assert(viewAsMap(store) === Map("a" -> ((1L, 1.0)), "b" -> ((1L, 2.0))))
  }

  test("sharded view: only shards with deltas compact; cold shards are never rewritten") {
    import graft.streaming.ShardedIncrementalView
    val store = tmp("ivm-shard")
    val shards = 4
    // batch 0 touches many keys (spread over shards), batch 1 only key "a"
    val b0 = Seq("a", "b", "c", "d", "e", "f", "g", "h").zipWithIndex
      .map { case (k, i) => (k, i.toDouble) }.toDF("k", "value")
    ShardedIncrementalView.applyBatch(b0, 0L, keys, "value", store, shards)
    val folded0 = ShardedIncrementalView.compactTouched(spark, store, keys, shards)
    assert(folded0.nonEmpty)
    val gensAfter0 = (0 until shards).map(s =>
      ShardedIncrementalView.baseGeneration(spark, f"$store/shard=$s%05d"))
    // a delta touching ONE key compacts exactly that key's shard
    ShardedIncrementalView.applyBatch(Seq(("a", 100.0)).toDF("k", "value"),
      1L, keys, "value", store, shards)
    val folded1 = ShardedIncrementalView.compactTouched(spark, store, keys, shards)
    assert(folded1.size === 1, s"only a's shard should fold, got $folded1")
    val gensAfter1 = (0 until shards).map(s =>
      ShardedIncrementalView.baseGeneration(spark, f"$store/shard=$s%05d"))
    assert(gensAfter0.zip(gensAfter1).zipWithIndex.count { case ((g0, g1), _) => g0 != g1 } === 1,
      "cold shards' base generations must be untouched")
    // and the merged view is still exactly right
    val got = ShardedIncrementalView.read(spark, store, keys, shards)
      .collect().map(r => r.getAs[String]("k") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Double]("sum_value")))).toMap
    val expected = Map("a" -> ((2L, 100.0)), "b" -> ((1L, 1.0)), "c" -> ((1L, 2.0)),
      "d" -> ((1L, 3.0)), "e" -> ((1L, 4.0)), "f" -> ((1L, 5.0)),
      "g" -> ((1L, 6.0)), "h" -> ((1L, 7.0)))
    assert(got === expected)
  }

  test("streaming wiring maintains the view across micro-batches") {
    val store = tmp("ivm-stream")
    val input = MemoryStream[(String, Double)](spark)
    val q = IncrementalView.start(input.toDF().toDF("k", "value"),
      keys, "value", store, tmp("ivm-ckpt"))
    try {
      input.addData(("a", 1.0), ("b", 2.0))
      q.processAllAvailable()
      input.addData(("a", 3.0))
      q.processAllAvailable()
      assert(viewAsMap(store) === Map("a" -> ((2L, 4.0)), "b" -> ((1L, 2.0))))
    } finally q.stop()
  }

  test("restart from checkpoint resumes maintenance without double counting") {
    val store = tmp("ivm-restart")
    val ckpt = tmp("ivm-restart-ckpt")
    val input1 = MemoryStream[(String, Double)](spark)
    val q1 = IncrementalView.start(input1.toDF().toDF("k", "value"),
      keys, "value", store, ckpt)
    try {
      input1.addData(("a", 1.0), ("b", 2.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // second incarnation: same checkpoint + store, fresh source. MemoryStream
    // can't replay across restarts, so pre-populate the replacement source
    // with data the NEW query's batch 0 will process — the store-side delta
    // for the restarted query's batch ids must still merge correctly with
    // the first incarnation's.
    val input2 = MemoryStream[(String, Double)](spark)
    input2.addData(("a", 5.0))
    val q2 = IncrementalView.start(input2.toDF().toDF("k", "value"),
      keys, "value", store, tmp("ivm-restart-ckpt2"))
    try {
      q2.processAllAvailable()
      // batch ids restart at 0 per query: idempotence is scoped by the
      // checkpoint-derived lineage tag, so the second query's batch 0 must
      // NOT be swallowed by the first incarnation's delta_0
      assert(viewAsMap(store) === Map("a" -> ((2L, 6.0)), "b" -> ((1L, 2.0))))
    } finally q2.stop()
  }

  // ------------------------------------------------ CDC latest-per-key view

  private val cdcAgg = graft.operators.Cdc.latestAgg(Seq("cid"), Seq("v"), "del")

  private def cdcSnapshot(store: String): Map[String, Double] =
    graft.operators.Cdc.snapshotOf(
        IncrementalView.read(spark, store, keys, cdcAgg),
        keys, Seq("cid"), Seq("v"), "del")
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Double]("v")).toMap

  test("streaming CDC view: latest wins across micro-batches, tombstones filtered") {
    val store = tmp("cdc-stream")
    val input = MemoryStream[(String, Long, Double, Boolean)](spark)
    val q = IncrementalView.start(input.toDF().toDF("k", "cid", "v", "del"),
      keys, cdcAgg, store, tmp("cdc-ckpt"))
    try {
      input.addData(("a", 1L, 1.0, false), ("b", 1L, 5.0, false))
      q.processAllAvailable()
      input.addData(("a", 2L, 2.0, false), ("b", 2L, 0.0, true)) // b deleted
      q.processAllAvailable()
      assert(cdcSnapshot(store) === Map("a" -> 2.0))
      input.addData(("b", 3L, 9.0, false)) // resurrect
      q.processAllAvailable()
      assert(cdcSnapshot(store) === Map("a" -> 2.0, "b" -> 9.0))
    } finally q.stop()
  }

  test("CDC view survives compaction; a late-replayed old upsert loses to a tombstone") {
    val store = tmp("cdc-compact")
    def apply(id: Long, rows: (String, Long, Double, Boolean)*): Unit =
      IncrementalView.applyBatch(rows.toDF("k", "cid", "v", "del"),
        id, keys, cdcAgg, store, "")
    apply(0L, ("a", 1L, 1.0, false), ("b", 1L, 5.0, false))
    apply(1L, ("b", 2L, 0.0, true)) // tombstone
    assert(cdcSnapshot(store) === Map("a" -> 1.0))
    IncrementalView.compact(spark, store, keys, agg = cdcAgg)
    // the tombstone must survive the fold: a LATE delta carrying an OLD
    // version of b (cid 1, an upsert) merges in and must still lose
    assert(cdcSnapshot(store) === Map("a" -> 1.0))
    apply(2L, ("b", 1L, 5.0, false))
    assert(cdcSnapshot(store) === Map("a" -> 1.0),
      "an old upsert replayed after the delete must not resurrect the key")
    // second compaction folds the late delta into the base; still correct
    IncrementalView.compact(spark, store, keys, agg = cdcAgg)
    assert(cdcSnapshot(store) === Map("a" -> 1.0))
  }

  test("sharded CDC view: per-shard deltas, snapshot equals batch apply") {
    import graft.streaming.ShardedIncrementalView
    val store = tmp("cdc-sharded")
    val log = Seq(
      ("a", 1L, 1.0, false), ("b", 1L, 2.0, false), ("c", 1L, 3.0, false),
      ("a", 2L, 10.0, false), ("c", 2L, 0.0, true))
    log.grouped(2).zipWithIndex.foreach { case (rows, i) =>
      ShardedIncrementalView.applyBatch(rows.toDF("k", "cid", "v", "del"),
        i.toLong, keys, cdcAgg, store, shards = 4, lineage = "")
    }
    val snap = graft.operators.Cdc.snapshotOf(
        ShardedIncrementalView.read(spark, store, keys, 4, cdcAgg),
        keys, Seq("cid"), Seq("v"), "del")
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Double]("v")).toMap
    assert(snap === Map("a" -> 10.0, "b" -> 2.0))
    ShardedIncrementalView.compactTouched(spark, store, keys, 4, cdcAgg)
    val after = graft.operators.Cdc.snapshotOf(
        ShardedIncrementalView.read(spark, store, keys, 4, cdcAgg),
        keys, Seq("cid"), Seq("v"), "del")
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Double]("v")).toMap
    assert(after === snap)
  }

  test("corpus-health monoid: incremental view matches the batch rollup") {
    import graft.streaming.CorpusHealthAgg
    val store = tmp("health")
    val srcKeys = Seq("source")
    val agg = CorpusHealthAgg()
    def docs(rows: (Long, String, String, String, Long)*) =
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    // three batches; source A gets an exact dup across batches 0 and 2
    val b0 = docs((1L, "aa bb", "en", "A", 10L), (2L, "cc dd", "de", "A", 20L),
      (5L, "solo", "fr", "B", 7L))
    val b1 = docs((3L, "ee ff gg", "en", "A", 30L))
    val b2 = docs((4L, "cc dd", "en", "A", 20L), (6L, "duo xx", "fr", "B", 7L))
    IncrementalView.applyBatch(b0, 0L, srcKeys, agg, store, "")
    IncrementalView.applyBatch(b1, 1L, srcKeys, agg, store, "")
    IncrementalView.applyBatch(b2, 2L, srcKeys, agg, store, "")
    def healthMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getLong(7)))).toMap
    val inc = healthMap(CorpusHealthAgg.finish(
      IncrementalView.read(spark, store, srcKeys, agg)))
    // at this cardinality every sketch is in its exact regime: the
    // incremental estimates must EQUAL the one-shot exact rollup (the
    // fixture keeps each source's two middle lengths equal, where the KLL
    // inclusive-rank quantile and the interpolated percentile coincide)
    val exact = graft.operators.DataQuality
      .corpusHealth(b0.unionByName(b1).unionByName(b2)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getLong(7)))).toMap
    assert(inc === exact)
    assert(inc("A") === ((4L, 1L, 2L, 80L, 20L, 20.0, 9L)))
    // compaction folds the three deltas without changing the dashboard
    IncrementalView.compact(spark, store, srcKeys, agg = agg)
    val afterCompact = healthMap(CorpusHealthAgg.finish(
      IncrementalView.read(spark, store, srcKeys, agg)))
    assert(afterCompact === inc)
  }
}
