package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Stream-stream joins (a capability the reference lacks entirely — its only
 * stateful op is the windowed aggregate): Structured Streaming buffers both
 * sides in the state store and the event-time interval condition + watermark
 * bound that state.
 *
 * Scale: state per key is only the rows inside `horizon` + watermark slack;
 * the join shuffles both streams by the key (same hash partitioning on both
 * sides, so the join itself is co-partitioned). No unbounded buffering:
 * rows age out as the watermark passes `ts + horizon`.
 */
object StreamJoins {

  /**
   * Click→purchase attribution: every click paired with the same user's
   * purchases within `horizon` after it. Works identically on batch frames
   * (watermark is a no-op in batch) — the spec asserts stream == batch.
   */
  def clickToPurchase(events: DataFrame, horizon: String = "1 hour",
      watermark: String = "2 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", watermark)
    clicks.join(purchases,
        expr(s"c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval $horizon"))
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        (col("p_ts").cast("long") - col("c_ts").cast("long")).as("lag_s"))
  }

  /**
   * LEFT OUTER attribution: every click emitted exactly once — matched
   * clicks with their purchase, unmatched clicks null-padded. The outer
   * semantics are watermark-driven: Structured Streaming can only emit the
   * null-padded row once the watermark proves no matching purchase can
   * still arrive (c_ts + horizon < watermark), so unmatched results trail
   * the stream by horizon + allowed lateness — the inherent
   * completeness/latency trade of outer joins on unbounded inputs. State
   * stays bounded exactly as in the inner join (rows age out past
   * horizon + slack).
   *
   * Batch replay of the same plan emits unmatched rows immediately
   * (watermark is a no-op) — same rows, no trailing delay.
   */
  def clickToPurchaseOuter(events: DataFrame, horizon: String = "1 hour",
      watermark: String = "2 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", watermark)
    clicks.join(purchases,
        expr(s"c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval $horizon"),
        "left_outer")
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        (col("p_ts").cast("long") - col("c_ts").cast("long")).as("lag_s"))
  }
}
