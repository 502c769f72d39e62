package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.fixtures.Fixtures
import graft.model.LogRecord
import graft.streaming.TrackListState

/**
 * DStream-parity scenario tests (`DStreamBotDetectionTest.scala:6-43`): same
 * three rules, asserting the verdict REASON strings, via the keyed
 * track-list state instead of `mapWithState`.
 */
class TrackListStateSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def runStream(rows: Seq[LogRecord], batches: Int = 1): Map[String, (Boolean, String)] = {
    import spark.implicits._
    val input = MemoryStream[LogRecord](spark)
    val q = TrackListState.verdicts(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName(s"track_${math.abs(rows.hashCode)}").start()
    try {
      rows.grouped(math.max(1, rows.size / batches)).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(s"track_${math.abs(rows.hashCode)}")
      .collect()
      .groupBy(_.getAs[String]("ip"))
      .map { case (ip, rs) =>
        val last = rs.last
        ip -> (last.getAs[Boolean]("isBot"), last.getAs[String]("reason"))
      }
  }

  test("requests rule: (bot, requests) emitted, hum clear") {
    val out = runStream(
      Fixtures.requestsPerInterval("bot", 1001) ++ Fixtures.requestsPerInterval("hum", 999))
    assert(out("bot") === (true, "requests"))
    assert(out("hum")._1 === false)
  }

  test("categories rule: (bot, categories) emitted, hum clear") {
    val out = runStream(
      Fixtures.categoriesPerInterval("bot", 30, 6) ++ Fixtures.categoriesPerInterval("hum", 30, 4))
    assert(out("bot") === (true, "categories"))
    assert(out("hum") === (false, "clear"))
  }

  test("clicks/views rule: (bot, clicks/views) emitted, hum clear") {
    val out = runStream(
      Fixtures.clicksToViewsPerInterval("bot", 70, 6) ++ Fixtures.clicksToViewsPerInterval("hum", 70, 4))
    assert(out("bot") === (true, "clicks/views"))
    assert(out("hum") === (false, "clear"))
  }

  test("state accumulates across micro-batches (track horizon holds recent buckets)") {
    val rows = Fixtures.requestsPerInterval("bot", 1001)
    // 600 s of data split into 3 batches: the final verdict must still see
    // all 1001 requests because every bucket is within the 600 s horizon
    val out = runStream(rows, batches = 3)
    assert(out("bot") === (true, "requests"))
  }

  test("old buckets are evicted beyond the track horizon") {
    import spark.implicits._
    // two bursts 20 minutes apart, each individually below the request limit
    val early = Fixtures.requestsPerInterval("x", 600, intervalS = 100)
    val late = early.map(r => r.copy(time =
      new java.sql.Timestamp(r.time.getTime + 1200L * 1000L)))
    val input = MemoryStream[LogRecord](spark)
    val q = TrackListState.verdicts(input.toDS())
      .writeStream.outputMode("update").format("memory").queryName("evict_mem").start()
    try {
      input.addData(early); q.processAllAvailable()
      input.addData(late); q.processAllAvailable()
    } finally q.stop()
    val verdicts = spark.table("evict_mem").collect().map(r =>
      (r.getAs[Long]("clicks") + r.getAs[Long]("views"), r.getAs[Boolean]("isBot")))
    // without eviction the second burst would see 1200 > 1000 requests
    assert(verdicts.forall(!_._2), s"eviction failed: $verdicts")
    assert(verdicts.forall(_._1 <= 600))
  }

  /** Run `impl` over `rows` in `batches` micro-batches; final verdict row
   * per ip, ALL fields (the cross-impl equality needs full rows, not just
   * the verdict bit). */
  private def runFullVerdicts(
      impl: org.apache.spark.sql.Dataset[LogRecord] =>
        org.apache.spark.sql.Dataset[graft.streaming.TrackListState.IpVerdict],
      rows: Seq[LogRecord], batches: Int,
      name: String): Map[String, (Long, Long, Long, Boolean, String)] = {
    import spark.implicits._
    val input = MemoryStream[LogRecord](spark)
    val q = impl(input.toDS())
      .writeStream.outputMode("update").format("memory").queryName(name).start()
    try {
      rows.grouped(math.max(1, rows.size / batches)).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).collect()
      .groupBy(_.getAs[String]("ip"))
      .map { case (ip, rs) =>
        val l = rs.last
        ip -> ((l.getAs[Long]("clicks"), l.getAs[Long]("views"),
          l.getAs[Long]("nCategories"), l.getAs[Boolean]("isBot"),
          l.getAs[String]("reason")))
      }
  }

  private def withRocksDB[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState is row-equal to flatMapGroupsWithState across the scenario matrix") {
    val twoBursts = {
      val early = Fixtures.requestsPerInterval("x", 600, intervalS = 100)
      early ++ early.map(r => r.copy(time =
        new java.sql.Timestamp(r.time.getTime + 1200L * 1000L)))
    }
    val scenarios: Seq[(String, Seq[LogRecord], Int)] = Seq(
      ("requests", Fixtures.requestsPerInterval("bot", 1001) ++
        Fixtures.requestsPerInterval("hum", 999), 1),
      ("categories", Fixtures.categoriesPerInterval("bot", 30, 6) ++
        Fixtures.categoriesPerInterval("hum", 30, 4), 1),
      ("clicksviews", Fixtures.clicksToViewsPerInterval("bot", 70, 6) ++
        Fixtures.clicksToViewsPerInterval("hum", 70, 4), 1),
      ("multibatch", Fixtures.requestsPerInterval("bot", 1001), 3),
      ("eviction", twoBursts, 2))
    for ((nm, rows, batches) <- scenarios) {
      val fm = runFullVerdicts(ds => TrackListState.verdicts(ds), rows, batches, s"xfm_$nm")
      val tws = withRocksDB {
        runFullVerdicts(ds => graft.streaming.TrackListProcessor.verdicts(ds),
          rows, batches, s"xtws_$nm")
      }
      assert(tws === fm, s"scenario $nm: transformWithState diverged")
      assert(fm.nonEmpty, s"scenario $nm produced no verdicts")
    }
  }

  test("batch-replayable: same verdicts when run as a plain Dataset") {
    import spark.implicits._
    val rows = Fixtures.categoriesPerInterval("bot", 30, 6) ++
      Fixtures.categoriesPerInterval("hum", 30, 4)
    val out = TrackListState.verdicts(rows.toDS()).collect()
      .map(v => v.ip -> (v.isBot, v.reason)).toMap
    assert(out("bot") === (true, "categories"))
    assert(out("hum") === (false, "clear"))
  }
}
