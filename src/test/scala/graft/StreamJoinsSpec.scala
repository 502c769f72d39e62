package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamJoins

class StreamJoinsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  // (event_id, ts, user_id, event_type): user 1 clicks then buys twice
  // (one inside, one outside the horizon); user 2 buys with no click;
  // user 3 clicks and never buys
  private val fixture = Seq(
    (1L, ts(100), 1L, "click"),
    (2L, ts(200), 1L, "purchase"),   // 100 s after click → joined
    (3L, ts(5000), 1L, "purchase"),  // 4900 s after click → outside the 1 h horizon
    (4L, ts(150), 2L, "purchase"),
    (5L, ts(300), 3L, "click"),
    (6L, ts(90), 1L, "purchase"))    // before the click → not joined

  private def asDf(rows: Seq[(Long, java.sql.Timestamp, Long, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type")

  test("batch semantics: joins within [0, horizon] after the click only") {
    val out = StreamJoins.clickToPurchase(asDf(fixture), horizon = "1 hour")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out === Set((1L, 2L, 100L)))
  }

  test("left-outer join: unmatched clicks null-pad only after the watermark passes") {
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)](spark)
    val joined = StreamJoins.clickToPurchaseOuter(
      input.toDF().toDF("event_id", "ts", "user_id", "event_type"), horizon = "1 hour")
    val q = joined.writeStream.format("memory").queryName("sjo_out")
      .outputMode("append").start()
    def rows() = spark.table("sjo_out").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    try {
      input.addData(fixture: _*)
      q.processAllAvailable()
      // matched row can emit now; the unmatched click (user 3) CANNOT —
      // the watermark hasn't proven its horizon empty yet
      assert(rows() === Set((1L, 2L)))
      // push the watermark past click+horizon+lateness → null-padded row
      input.addData((99L, ts(100000), 9L, "click"))
      q.processAllAvailable()
      assert(rows() === Set((1L, 2L), (5L, -1L)))
    } finally q.stop()
    // batch replay of the same plan: same rows, no trailing delay (the
    // late sentinel click 99 is itself unmatched in batch)
    val batch = StreamJoins.clickToPurchaseOuter(
        asDf(fixture :+ ((99L, ts(100000), 9L, "click"))), horizon = "1 hour")
      .collect().map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(batch === Set((1L, 2L), (5L, -1L), (99L, -1L)))
  }

  test("stream-stream interval join equals the batch run") {
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)](spark)
    val joined = StreamJoins.clickToPurchase(
      input.toDF().toDF("event_id", "ts", "user_id", "event_type"), horizon = "1 hour")
    val q = joined.writeStream.format("memory").queryName("sj_out")
      .outputMode("append").start()
    try {
      input.addData(fixture: _*)
      q.processAllAvailable()
      // advance the watermark far enough to emit everything joinable
      input.addData((99L, ts(100000), 9L, "click"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sj_out")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = StreamJoins.clickToPurchase(asDf(fixture), horizon = "1 hour")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed === batch)
  }
}
