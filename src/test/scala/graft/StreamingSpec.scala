package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BotConfig
import graft.fixtures.Fixtures
import graft.model.LogRecord
import graft.operators.BotDetection
import graft.sinks.Sinks
import graft.sources.{BotGen, Ingest}
import graft.streaming.StreamingBotDetection

class StreamingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("MemoryStream run of the verdict plan equals the batch run") {
    import spark.implicits._
    val rows = Fixtures.requestsPerInterval("bot", 1001) ++
      Fixtures.requestsPerInterval("hum", 999)

    val input = MemoryStream[LogRecord](spark)
    input.addData(rows)
    val stream = StreamingBotDetection.verdictStream(
      input.toDF(), BotDetection.referenceWindowing, BotConfig())
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("verdicts_mem").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("verdicts_mem")
      .select("ip", "window_start_s", "clicks", "views", "n_categories", "reason")
      .collect().map(_.toSeq).toSet
    val batch = BotDetection.filterBotsStreaming(BotDetection.classify(
        BotDetection.slidingAggregate(rows.toDF(), BotDetection.referenceWindowing),
        BotConfig()))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming session_window aggregation equals the batch sessionization") {
    import spark.implicits._
    val rows = Fixtures.requestsPerInterval("s1", 300) ++
      Fixtures.requestsPerInterval("s2", 42)
    val input = MemoryStream[LogRecord](spark)
    // session windows stream append-only: sessions emit once the watermark
    // passes last-event + gap, so a far-future sentinel (whose own session
    // never closes) flushes every fixture session
    val sentinel = LogRecord("zz-sentinel",
      new java.sql.Timestamp(rows.map(_.time.getTime).max + 86400L * 1000), 0L, 0L, "cat0")
    val stream = BotDetection.sessionAggregate(
      input.toDF().withWatermark("time", "1 minute"), "30 seconds")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("sess_mem").start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      input.addData(Seq(sentinel))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sess_mem").collect().map(_.toSeq).toSet
    val batch = BotDetection.sessionAggregate(rows.toDF(), "30 seconds")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("config-switched verdict sink: external branch writes via a runtime format") {
    import spark.implicits._
    val input = MemoryStream[LogRecord](spark)
    input.addData(Fixtures.requestsPerInterval("bot", 1001))
    val verdicts = StreamingBotDetection.verdictStream(
      input.toDS().toDF(), BotDetection.referenceWindowing, BotConfig())
    // `external` resolves the writer by FORMAT NAME at runtime — parquet
    // stands in offline for the Cassandra/Ignite connectors a cluster ships
    val out = tmp("ext-sink")
    val q = Sinks.verdictSink(verdicts, Map(
      "sink" -> "external", "format" -> "parquet",
      "option.path" -> out, "checkpoint" -> tmp("ext-ckpt"),
      "trigger" -> "1 seconds"))
    try q.processAllAvailable() finally q.stop()
    val rows = spark.read.parquet(out)
    assert(rows.count() > 0)
    assert(rows.columns.contains("batch_id"), "external writes are batch-stamped")
    intercept[IllegalArgumentException] {
      Sinks.verdictSink(verdicts, Map("sink" -> "carrier-pigeon"))
    }
  }

  test("json-dir file source end-to-end: botgen traffic, bots flagged, users not") {
    val dir = tmp("botgen")
    // 600 s of traffic: each bot does 300 actions (75% clicks, 20 cats) →
    // categories/ratio/requests rules fire; 200 users share 1 action/s →
    // ~3 actions each, stay clear.
    BotGen.writeJsonDir(dir, BotGen.events(nUsers = 200, nBots = 2, durationS = 600))

    val stream = StreamingBotDetection.verdictStream(
      Ingest.toLogRecords(Ingest.jsonDirStream(spark, dir)),
      BotDetection.referenceWindowing, BotConfig())
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("verdicts_dir").start()
    try q.processAllAvailable() finally q.stop()

    val verdicts = spark.table("verdicts_dir").select("ip", "reason").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val flagged = verdicts.map(_._1).toSet
    // every bot is caught
    assert(Set(BotGen.botIp(0), BotGen.botIp(1)).subsetOf(flagged))
    // the volume rule can only ever fire for bots (users share 1 action/s)
    assert(verdicts.filter(_._2 == "requests").forall(_._1.startsWith("172.20.")))
    // a user occasionally trips the category rule (6+ samples in one window
    // over 10 categories) — rule-correct, so only require bots dominate
    assert(flagged.count(_.startsWith("172.20.")) === 2)
    assert(flagged.count(_.startsWith("172.10.")) <= 5, s"too many users flagged: $flagged")
  }

  test("streaming equals batch on the same generated files") {
    import spark.implicits._
    val dir = tmp("replay")
    BotGen.writeJsonDir(dir, BotGen.events(nUsers = 100, nBots = 2, durationS = 300))
    val w = BotDetection.referenceWindowing

    val q = StreamingBotDetection.verdictStream(
        Ingest.toLogRecords(Ingest.jsonDirStream(spark, dir, maxFilesPerTrigger = 1)),
        w, BotConfig())
      .writeStream.outputMode("update").format("memory").queryName("replay_mem").start()
    try q.processAllAvailable() finally q.stop()
    // update mode re-emits growing windows across micro-batches: the LAST
    // emission per (ip, window) must equal the batch result
    val lastPerKey = spark.table("replay_mem")
      .groupBy("ip", "window_start_s")
      .agg(max(struct(col("clicks"), col("views"), col("n_categories"), col("reason"))).as("s"))
      .select(col("ip"), col("window_start_s"), col("s.clicks"), col("s.views"),
        col("s.n_categories"), col("s.reason"))
      .collect().map(_.toSeq).toSet

    val batch = BotDetection.filterBotsStreaming(BotDetection.classify(
        BotDetection.slidingAggregate(
          Ingest.toLogRecords(Ingest.jsonDirBatch(spark, dir)), w), BotConfig()))
      .collect().map(_.toSeq).toSet
    assert(batch.subsetOf(lastPerKey))
    // every batch verdict key appears, and its final streamed values match
    assert(lastPerKey.map(s => (s(0), s(1))) === batch.map(s => (s(0), s(1))))
  }

  test("deterministic rate source drives the pipeline without files (S6 continuous)") {
    // users draw from only 4 categories and can't reach the other limits in
    // the few batches this test runs — only bots (20-category domain) fire
    val stream = StreamingBotDetection.verdictStream(
      Ingest.syntheticRateStream(spark, rowsPerBatch = 2000, userCategories = 4),
      BotDetection.referenceWindowing,
      graft.functions.BotConfig(requestLimit = 500, categoryLimit = 5, clicksToViewsLimit = 5))
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("rate_mem").start()
    try {
      // rate-micro-batch emits rowsPerBatch rows per trigger; poll until the
      // first verdicts land (generous cap — first batch pays state-store and
      // codegen init, which can be slow on a loaded machine)
      var waited = 0
      while (spark.table("rate_mem").isEmpty && waited < 240) {
        Thread.sleep(500); waited += 1
      }
    } finally q.stop()
    val flagged = spark.table("rate_mem").select("ip").distinct()
      .collect().map(_.getString(0))
    assert(flagged.nonEmpty)
    assert(flagged.forall(_.startsWith("172.20.")), s"unexpected: ${flagged.toSeq}")
  }

  test("SMT-parity keyed wire path equals the direct normalization (S5/P1)") {
    import spark.implicits._
    val dir = tmp("keyed")
    BotGen.writeJsonDir(dir, BotGen.events(nUsers = 20, nBots = 1, durationS = 60))
    val wire = Ingest.jsonDirBatch(spark, dir)
    val keyed = Ingest.toKeyedRecords(wire).as[graft.model.KeyedRecord]
    val viaKeyed = BotDetection.parseActions(keyed.toDF()).collect().map(_.toSeq).toSet
    val direct = Ingest.toLogRecords(wire).collect().map(_.toSeq).toSet
    assert(viaKeyed.nonEmpty)
    assert(viaKeyed === direct)
  }

  test("malformed json lines are dropped, valid lines survive (S4 parity)") {
    val dir = tmp("badlines")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "mixed.log.json"),
      """{"time": 1767225600, "categoryId": "c1", "ip": "1.1.1.1", "action": "click"}
        |this is not json at all
        |{"time": "not-a-number", "categoryId": "c2", "ip": "2.2.2.2", "action": "view"}
        |{"unrelated": true}
        |{"time": 1767225601, "categoryId": "c3", "ip": "3.3.3.3", "action": "view"}
        |""".stripMargin)
    val out = Ingest.toLogRecords(Ingest.jsonDirBatch(spark, dir)).collect()
    assert(out.map(_.getString(0)).toSet === Set("1.1.1.1", "3.3.3.3"))
  }

  test("streaming dedup within watermark drops redelivered events") {
    import spark.implicits._
    val rows = Fixtures.categoriesPerInterval("ip1", 20, 4)
    val input = MemoryStream[LogRecord](spark)
    val q = StreamingBotDetection.dedupStream(
        input.toDS().toDF(), Seq("ip", "time", "category"))
      .writeStream.outputMode("append").format("memory").queryName("dedup_mem").start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      input.addData(rows.take(10)) // at-least-once redelivery inside watermark
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("dedup_mem")
    assert(out.count() === out.dropDuplicates("ip", "time", "category").count())
    assert(out.count() === rows.map(r => (r.ip, r.time, r.category)).distinct.size)
  }

  // ---- late / out-of-order / duplicate scenario matrix (r15 verdict
  // task 6): the zipf axis stressed key skew; these stress EVENT TIME.
  // Contracts pinned: (1) late-but-within-watermark events are absorbed
  // and the finalized result equals the batch aggregate over everything;
  // (2) late-BEYOND-watermark events are dropped deterministically — the
  // result equals the batch aggregate over the on-time subset, twice;
  // (3) within-watermark duplicate redelivery never survives dedup even
  // when interleaved out of order across keys.

  private def lr(ip: String, sec: Long, clicks: Long = 1L): LogRecord =
    LogRecord(ip, new java.sql.Timestamp(sec * 1000L), clicks, 1L, "cat" + (sec % 3))

  /** 1-minute tumbling count/sum per ip with a 10-minute watermark,
   * append mode (only finalized windows emit — the strictest contract) */
  private def windowedAgg(df: org.apache.spark.sql.DataFrame) =
    df.withWatermark("time", "10 minutes")
      .groupBy(window(col("time"), "1 minute"), col("ip"))
      .agg(count(lit(1)).as("n"), sum(col("clicks")).as("c"))
      .select(col("window.start").cast("long").as("w_s"), col("ip"),
        col("n"), col("c"))

  private def batchAgg(rows: Seq[LogRecord]): Set[Seq[Any]] = {
    import spark.implicits._
    windowedAgg(rows.toDF()).collect().map(_.toSeq).toSet
  }

  test("late within watermark is absorbed: streamed result equals batch over everything") {
    import spark.implicits._
    val onTime = (0L until 240L by 20L).map(s => lr("u1", s)) ++
      Seq(lr("u2", 30L), lr("u2", 150L))
    // arrive AFTER rows up to t=240 were seen, with event times 1-4 min
    // earlier — inside the 10-minute delay, so they must still count
    val lateOk = Seq(lr("u1", 45L, clicks = 7L), lr("u2", 100L, clicks = 5L))
    val flush = Seq(lr("zz-flush", 7200L))
    val input = MemoryStream[LogRecord](spark)
    val q = windowedAgg(input.toDF()).writeStream.outputMode("append")
      .format("memory").queryName("late_ok_mem").start()
    try {
      input.addData(onTime); q.processAllAvailable()
      input.addData(lateOk); q.processAllAvailable()
      input.addData(flush);  q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("late_ok_mem").collect().map(_.toSeq).toSet
    // the flush sentinel's own window never finalizes (nothing advances
    // the watermark past it), so the reference is batch over the REAL rows
    assert(streamed === batchAgg(onTime ++ lateOk))
    assert(streamed.nonEmpty)
  }

  test("late beyond watermark is dropped deterministically: equals batch on the on-time subset, twice") {
    import spark.implicits._
    val onTime = (0L until 180L by 30L).map(s => lr("u1", s)) :+ lr("u2", 90L)
    // watermark-advancer: max event time 7200 → watermark 6600 after batch 1
    val advance = Seq(lr("zz-adv", 7200L))
    // beyond-watermark stragglers: an update to a FINALIZED window and a
    // whole NEW window far below the watermark — both must vanish
    val lateDropped = Seq(lr("u1", 45L, clicks = 99L), lr("u3", 400L, clicks = 99L))
    def run(name: String): Set[Seq[Any]] = {
      val input = MemoryStream[LogRecord](spark)
      val q = windowedAgg(input.toDF()).writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        input.addData(onTime ++ advance); q.processAllAvailable()
        input.addData(lateDropped);       q.processAllAvailable()
        input.addData(Seq(lr("zz-flush", 14400L))); q.processAllAvailable()
      } finally q.stop()
      spark.table(name).collect().map(_.toSeq).toSet
    }
    val first = run("late_drop_mem1")
    assert(first === batchAgg(onTime ++ advance),
      "beyond-watermark rows must not reach the aggregate")
    assert(!first.exists(r => r(2) == 99L || r(3) == 99L))
    assert(run("late_drop_mem2") === first, "late-drop must be deterministic")
  }

  test("within-watermark duplicate redelivery never survives dedup, even out of order") {
    import spark.implicits._
    // disorder engineered per key: u1's events arrive time-reversed, u2's
    // interleave between them; 3 exact duplicates redeliver in batch 2.
    // Times sit OFF epoch 0: the initial watermark is 1970-01-01T00:00:00
    // and dropDuplicatesWithinWatermark treats eventTime <= watermark as
    // late, so an epoch-0 event vanishes in the very first batch
    val b = 9000L
    val uniq = Seq(lr("u1", b + 120L), lr("u2", b + 10L), lr("u1", b + 60L),
      lr("u2", b + 200L), lr("u1", b), lr("u2", b + 110L))
    val input = MemoryStream[LogRecord](spark)
    val q = StreamingBotDetection.dedupStream(
        input.toDF(), Seq("ip", "time", "category"))
      .writeStream.outputMode("append").format("memory")
      .queryName("late_dedup_mem").start()
    try {
      input.addData(uniq); q.processAllAvailable()
      input.addData(Seq(uniq(4), uniq(1), uniq(3))) // dup redelivery, reordered
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("late_dedup_mem").select("ip", "time", "clicks")
      .collect().map(_.toSeq)
    assert(out.length === out.distinct.length, "a redelivered duplicate survived")
    assert(out.toSet === uniq.toDF().select("ip", "time", "clicks")
      .collect().map(_.toSeq).toSet, "streamed dedup must equal batch dedup")
  }

  test("raw-event mirror sink: keyed append with expiry (K3/K4 parity)") {
    val dir = tmp("mirror-in")
    val out = tmp("mirror-out") + "/cache"
    val ckpt = tmp("mirror-ckpt")
    BotGen.writeJsonDir(dir, BotGen.events(nUsers = 20, nBots = 1, durationS = 120))
    val q = Sinks.startMirrorSink(
      Ingest.toLogRecords(Ingest.jsonDirStream(spark, dir)), out, ckpt,
      expirySeconds = 60L, triggerInterval = "1 seconds")
    try q.processAllAvailable() finally q.stop()

    val base = graft.fixtures.Fixtures.baseEpochS
    val all = Sinks.readMirror(spark, out, nowS = 0L)
    val everything = all.count()
    assert(everything > 0)
    // entries expire 60 s after event time: at now = base+120 only the last
    // minute of traffic survives
    val live = Sinks.readMirror(spark, out, nowS = base + 120L)
    assert(live.count() > 0 && live.count() < everything)
    assert(live.select(min(col("time").cast("long"))).head().getLong(0) > base + 60L)
  }

  test("parquet sink upsert: first write per key wins, TTL filters on read") {
    import spark.implicits._
    val path = tmp("sink") + "/verdicts"
    val b0 = Seq(("1.2.3.4", 100L, "requests", 1000L)).toDF("ip", "window_start_s", "reason", "expires_at_s")
    val b1 = Seq(
      ("1.2.3.4", 100L, "categories", 1000L),  // duplicate key → ignored
      ("5.6.7.8", 100L, "requests", 500L)      // expires before "now"
    ).toDF("ip", "window_start_s", "reason", "expires_at_s")
    Sinks.parquetAppend(path)(b0, 0L)
    Sinks.parquetAppend(path)(b1, 1L)

    val all = Sinks.readVerdicts(spark, path, Seq("ip", "window_start_s"))
      .select("ip", "reason").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(all === Set(("1.2.3.4", "requests"), ("5.6.7.8", "requests")))

    val live = Sinks.readVerdicts(spark, path, Seq("ip", "window_start_s"), nowS = Some(600L))
      .select("ip").collect().map(_.getString(0)).toSet
    assert(live === Set("1.2.3.4"))
  }

  test("checkpointed restart resumes state: two runs equal one uninterrupted run") {
    import spark.implicits._
    val dir = tmp("restart-src")
    val ckpt = tmp("restart-ckpt")
    val outDir = tmp("restart-out") + "/verdicts"
    val w = BotDetection.referenceWindowing
    val all = BotGen.events(nUsers = 50, nBots = 2, durationS = 400)
    val cut = all.map(_.time).min + 200
    val (first, second) = all.partition(_.time < cut)

    // memory sink can't recover from a checkpoint — use foreachBatch
    // (the production sink shape), appending every emission to parquet
    def startQuery() = StreamingBotDetection.verdictStream(
        Ingest.toLogRecords(Ingest.jsonDirStream(spark, dir, maxFilesPerTrigger = 2)),
        w, BotConfig())
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(outDir)
      }.start()

    // run 1: first half of the traffic, then a hard stop
    BotGen.writeJsonDir(dir, first)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // run 2: same checkpoint, second half arrived while the query was down
    BotGen.writeJsonDir(dir, second, startIndex = 1000)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    // update-mode emissions only grow per (ip, window); the max-struct per
    // key across BOTH runs must equal the batch answer over ALL events —
    // i.e. partial-window state survived the restart and run-1 files were
    // not reprocessed (offsets come from the checkpoint)
    val resumed = spark.read.parquet(outDir)
      .groupBy("ip", "window_start_s")
      .agg(max(struct(col("clicks"), col("views"), col("n_categories"), col("reason"))).as("s"))
      .select(col("ip"), col("window_start_s"), col("s.clicks"), col("s.views"),
        col("s.n_categories"), col("s.reason"))
      .collect().map(_.toSeq).toSet
    val batch = BotDetection.filterBotsStreaming(BotDetection.classify(
        BotDetection.slidingAggregate(
          Ingest.toLogRecords(Ingest.jsonDirBatch(spark, dir)), w), BotConfig()))
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty)
    batch.foreach { b =>
      assert(resumed.contains(b), s"batch verdict $b missing after restart")
    }
    // containment, not equality: the clicks/views ratio rule is non-monotone
    // within a window, so update mode can legitimately emit a transient
    // verdict for a key the final batch answer lacks
    assert(batch.map(s => (s(0), s(1))).subsetOf(resumed.map(s => (s(0), s(1)))))
  }

  test("kv enrichment pins one committed epoch: no torn view under concurrent INSERT") {
    import spark.implicits._
    import graft.sinks.v2.KvStore
    val p = java.nio.file.Files.createTempDirectory("graft_enrich_kv_").toString
    Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "v")
      .write.format("graft-kv").option("path", p).mode("append").save() // epoch 0
    // readCurrent pins the epoch at CONSTRUCTION: a commit landing after
    // the plan is built but before it materializes must be invisible —
    // lazy materialization is exactly when a torn view would sneak in
    val pinned = KvStore.readCurrent(spark, p, Seq("k"))
    Seq((4L, "four"), (5L, "five")).toDF("k", "v")
      .write.format("graft-kv").option("path", p).mode("append").save() // epoch 1
    assert(pinned.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L),
      "post-pin commit leaked into a pinned current view")
    // and a fresh view sees the new epoch
    assert(KvStore.readCurrent(spark, p, Seq("k")).count() === 5)
  }

  test("kv stream-static enrichment refreshes per micro-batch, one epoch per batch") {
    import spark.implicits._
    import graft.sinks.v2.KvStore
    import graft.streaming.KvEnrich
    val dim = java.nio.file.Files.createTempDirectory("graft_enrich_dim_").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_enrich_out_").toString + "/out"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_enrich_ck_").toString
    Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "v")
      .write.format("graft-kv").option("path", dim).mode("append").save() // epoch 0
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val q = KvEnrich.enrichedSink(mem.toDF().toDF("k"), dim, Seq("k"), outDir, ckpt)
    try {
      mem.addData(1L, 2L, 3L, 4L, 5L, 6L)
      q.processAllAvailable()
      // dimension grows BETWEEN batches — the stream must pick it up
      Seq((4L, "four"), (5L, "five"), (6L, "six")).toDF("k", "v")
        .write.format("graft-kv").option("path", dim).mode("append").save() // epoch 1
      mem.addData(1L, 2L, 3L, 4L, 5L, 6L)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(outDir)
    // batch 1 saw epoch 0: keys 1-3 enriched, 4-6 left-join nulls
    val b0 = out.filter(col("_dim_epoch") === 0L).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(b0 === Map(1L -> Some("one"), 2L -> Some("two"), 3L -> Some("three"),
      4L -> None, 5L -> None, 6L -> None))
    // batch 2 saw epoch 1: everything enriched
    val b1 = out.filter(col("_dim_epoch") === 1L).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(b1 === Map(1L -> Some("one"), 2L -> Some("two"), 3L -> Some("three"),
      4L -> Some("four"), 5L -> Some("five"), 6L -> Some("six")))
    // epoch audit column partitions the output cleanly: one epoch per batch
    assert(out.select("_dim_epoch").distinct().collect().map(_.getLong(0)).sorted
      .toSeq === Seq(0L, 1L))
    // pre-first-commit shape check: an empty store enriches to nulls with a
    // schema identical to the joined output (no downstream schema flip)
    val empty = java.nio.file.Files.createTempDirectory("graft_enrich_e_").toString
    Seq((9L, "z")).toDF("k", "v").write.format("graft-kv").option("path", empty)
      .mode("append").save()
    val shaped = KvEnrich.enrichBatch(Seq(9L).toDF("k"), empty, Seq("k"), None)
    assert(shaped.columns.toSeq ===
      KvEnrich.enrichBatch(Seq(9L).toDF("k"), empty, Seq("k"), Some(0L)).columns.toSeq)
    assert(shaped.collect().head.isNullAt(1))
  }
}
