package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

import graft.functions.{BotClassifier, BotConfig}
import graft.model.{EvaluatedStat, IpStat, LogRecord}
import graft.streaming.TrackListState.{bucketOf, IpVerdict, TrackedStat}

/**
 * Spark-4-native twin of [[TrackListState]] on the `transformWithState` API
 * (SURVEY.md §2c A5 mapping): per-ip `ListState[TrackedStat]`, idle keys
 * cleared by an event-time timer at (newest bucket + horizon) — the modern
 * replacement for the reference's `StateSpec...timeout`
 * (`ImplDStreams.scala:121`).
 *
 * Time mode is EVENT time on purpose: TTLConfig/processing-time mode makes
 * `shouldRunAnotherBatch` true unconditionally (same endless-empty-batch
 * trap as ProcessingTimeTimeout in flatMapGroupsWithState — measured, not
 * theorized), while event-time timers advance only with the watermark.
 *
 * Requires the RocksDB state store provider
 * (`spark.sql.streaming.stateStore.providerClass =
 * ...state.RocksDBStateStoreProvider`) — transformWithState is
 * RocksDB-only in Spark 4. The flatMapGroupsWithState port remains the
 * default because it also runs in batch mode; this processor is the
 * streaming-native scale path (RocksDB spills state off-heap, so per-key
 * lists survive executor-memory pressure).
 */
class TrackListProcessor(cfg: BotConfig, slideS: Long, trackS: Long, maxCategories: Int)
    extends StatefulProcessor[String, LogRecord, IpVerdict] {

  @transient private var track: ListState[TrackedStat] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    track = getHandle.getListState[TrackedStat](
      "track", Encoders.product[TrackedStat], TTLConfig.NONE)

  override def handleExpiredTimer(ip: String, timers: TimerValues,
      info: ExpiredTimerInfo): Iterator[IpVerdict] = {
    // idle-key GC: the newest data is older than the horizon — drop the key
    track.clear()
    Iterator.empty
  }

  override def handleInputRows(ip: String, rows: Iterator[LogRecord],
      timers: TimerValues): Iterator[IpVerdict] = {
    val incoming = rows.toSeq
    if (incoming.isEmpty) return Iterator.empty
    val byBucket = incoming.groupBy(r => bucketOf(r.time, slideS)).map {
      case (bucket, rs) =>
        val merged = rs.map(IpStat.fromRecord).reduce(_ + _)
        TrackedStat(merged.clicks, merged.views, merged.categories.take(maxCategories), bucket)
    }
    val mergedList = (track.get().toSeq ++ byBucket)
      .groupBy(_.bucketS).map { case (bucket, ts) =>
        TrackedStat(ts.map(_.clicks).sum, ts.map(_.views).sum,
          ts.flatMap(_.categories).toSet.take(maxCategories), bucket)
      }.toList
    val horizon = mergedList.map(_.bucketS).max - trackS
    val kept = mergedList.filter(_.bucketS > horizon).sortBy(_.bucketS)
    track.clear()
    kept.foreach(track.appendValue)
    // re-arm the idle-key timer at (newest bucket + horizon) in event time
    getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
    getHandle.registerTimer((kept.map(_.bucketS).max + trackS) * 1000L)

    val total = kept.map(t => IpStat(t.clicks, t.views, t.categories)).reduce(_ + _)
    val (isBot, reason) = BotClassifier.classifyScalar(
      total.clicks, total.views, total.categories.size.toLong, cfg)
    Iterator.single(EvaluatedStat(ip, total.clicks, total.views,
      total.categories.size.toLong, isBot, reason))
  }
}

object TrackListProcessor {

  /** Streaming verdicts via transformWithState (RocksDB state store),
   * event-time mode with a watermark driving the idle-key timers. */
  def verdicts(records: Dataset[LogRecord], cfg: BotConfig = BotConfig(),
      slideS: Long = 30L, trackS: Long = 600L,
      maxCategories: Int = 10000,
      watermarkDelay: String = "2 minutes"): Dataset[IpVerdict] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.withWatermark("time", watermarkDelay)
      .groupByKey(_.ip)
      .transformWithState(
        new TrackListProcessor(cfg, slideS, trackS, maxCategories),
        TimeMode.EventTime(), OutputMode.Update())
  }

  /** Bot-only projection matching the DStream sink rows `(bot_ip, reason)` —
   * the transformWithState twin of [[TrackListState.botVerdicts]]. */
  def botVerdicts(records: Dataset[LogRecord],
      cfg: BotConfig = BotConfig()): Dataset[(String, String)] = {
    val spark = records.sparkSession
    import spark.implicits._
    verdicts(records, cfg).filter(_.isBot).map(v => (v.ip, v.reason))
  }
}
