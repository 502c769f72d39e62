package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BotConfig
import graft.fixtures.Fixtures
import graft.model.LogRecord
import graft.operators.BotDetection
import graft.operators.BotDetection.Windowing

/**
 * Ports of the reference's three scenario tests
 * (`StructuredBotDetectionTest.scala:5-54`): one bot ip above each rule's
 * threshold paired with one human below, run through the batch pipeline
 * (the reference's own streaming query is batch-replayable, SURVEY.md §3 E3).
 */
class BotDetectionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val w = BotDetection.referenceWindowing // 10 min / 40 s
  private val cfg = BotConfig()                   // reference thresholds

  private def detect(records: Seq[LogRecord]): Array[(String, String)] = {
    import spark.implicits._
    BotDetection.transformAndFilterBots(records.toDF(), w, cfg)
      .select("ip", "reason").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
  }

  test("detects bots by request count (limit 1000)") {
    val rows = Fixtures.requestsPerInterval("bot", 1001) ++
      Fixtures.requestsPerInterval("hum", 999)
    val verdicts = detect(rows)
    assert(verdicts.map(_._1).distinct.toSeq === Seq("bot"))
    assert(verdicts.exists(_._2 === "requests"))
  }

  test("detects bots by clicks/views ratio (limit 5, integer division)") {
    // NOTE: asserted on FULL windows (all 70 rows present). The reference's
    // equivalent test sees only full windows because its seconds-as-millis
    // bug compresses 600 s of data into 0.6 s; with correct event time a
    // partial window over a click-heavy slice legitimately exceeds the ratio
    // even for the below-threshold ip, so full windows carry the intent.
    import spark.implicits._
    val rows = Fixtures.clicksToViewsPerInterval("bot", 70, 6) ++
      Fixtures.clicksToViewsPerInterval("hum", 70, 4)
    val agg = BotDetection.slidingAggregate(rows.toDF(), w)
      .filter($"clicks" + $"views" === 70)
    val full = BotDetection.classify(agg, cfg)
      .select("ip", "is_bot", "reason").distinct().collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
    assert(full.nonEmpty)
    assert(full.filter(_._1 == "bot").forall(v => v._2 && v._3 == "clicks/views"))
    assert(full.filter(_._1 == "hum").forall(v => !v._2 && v._3 == "clear"))
    // and the end-to-end pipeline does flag the bot
    assert(detect(rows).exists(v => v._1 == "bot" && v._2 == "clicks/views"))
  }

  test("detects bots by distinct categories (limit 5)") {
    val rows = Fixtures.categoriesPerInterval("bot", 30, 6) ++
      Fixtures.categoriesPerInterval("hum", 30, 4)
    val verdicts = detect(rows)
    assert(verdicts.map(_._1).distinct.toSeq === Seq("bot"))
    assert(verdicts.exists(_._2 === "categories"))
  }

  test("sliding windows place each row in duration/slide windows") {
    import spark.implicits._
    // one record → 10min/40s windowing puts it in exactly 15 windows
    val one = Seq(LogRecord("ip1", java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(Fixtures.baseEpochS)), 1L, 0L, "c"))
    val agg = BotDetection.slidingAggregate(one.toDF(), w)
    assert(agg.count() === 15)
  }

  test("session windows merge within the gap and split at it") {
    import spark.implicits._
    def rec(ip: String, t: Long) = LogRecord(ip,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(t)), 1L, 0L, "c")
    val base = Fixtures.baseEpochS
    val rows = Seq(
      rec("a", base), rec("a", base + 50), rec("a", base + 99),   // one session (gap 60 > diffs)
      rec("a", base + 200),                                        // new session (101 s > 60)
      rec("b", base))
    val out = BotDetection.sessionAggregate(rows.toDF(), "60 seconds")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set(("a", base, 3L), ("a", base + 200, 1L), ("b", base, 1L)))
  }

  test("approximate distinct path stays within HLL error on the fixtures") {
    import spark.implicits._
    val rows = Fixtures.categoriesPerInterval("bot", 100, 20)
    val exact = BotDetection.slidingAggregate(rows.toDF(), w, exact = true)
      .select("n_categories").collect().map(_.getLong(0)).max
    val approx = BotDetection.slidingAggregate(rows.toDF(), w, exact = false)
      .select("n_categories").collect().map(_.getLong(0)).max
    assert(math.abs(exact - approx) <= math.ceil(exact * 0.05))
  }
}
