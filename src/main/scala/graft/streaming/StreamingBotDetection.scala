package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BotConfig
import graft.operators.BotDetection
import graft.operators.BotDetection.Windowing

/**
 * Structured-streaming assembly of the bot-detection query (SURVEY.md §3 E1):
 * the SAME transform functions as the batch path wrapped around a streaming
 * source — batch-replayability is a design invariant (the reference's own
 * test runs the streaming plan as batch, `StructuredBotDetectionTest.scala:15-17`).
 *
 * Reference constants preserved: watermark 2 min (`ImplStructured.scala:11`),
 * window 10 min / slide 40 s (`:12-13`), update output mode + 40 s trigger
 * (`:60,66`).
 */
object StreamingBotDetection {

  val watermark: String = "2 minutes"

  /**
   * Streaming verdict plan over normalized LogRecords.
   *
   * Streaming-vs-batch delta (SURVEY.md §7d): the reference's unbounded
   * `dropDuplicates()` (P7) is illegal in a stream (unbounded state); update
   * mode re-emits a (ip, window) row whenever its counts grow, and the sink
   * upserts idempotently (`Sinks.readVerdicts` keeps the first write per
   * key) — the Cassandra-ifNotExists parity the reference relied on.
   */
  def verdictStream(records: DataFrame, w: Windowing, cfg: BotConfig): DataFrame =
    BotDetection.filterBotsStreaming(
      BotDetection.classify(
        BotDetection.slidingAggregate(records.withWatermark("time", watermark), w),
        cfg))

  /**
   * Streaming-legal exact dedup (SURVEY.md §7d): `dropDuplicatesWithinWatermark`
   * keeps per-key state only until the watermark passes — bounded state, vs
   * the reference's unbounded `dropDuplicates()` which is illegal in a
   * stream. Dedups repeated deliveries of the same event (at-least-once
   * sources) by the given key columns.
   */
  def dedupStream(records: DataFrame, keys: Seq[String],
      watermarkDelay: String = watermark): DataFrame =
    records.withWatermark("time", watermarkDelay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
}
