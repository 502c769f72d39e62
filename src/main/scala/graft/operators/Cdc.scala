package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Change-data-capture apply: collapse a changelog (an append-only stream of
 * upserts and deletes keyed by a business key) into the current snapshot —
 * the batch core of `MERGE INTO` / Delta-style CDC materialization, and the
 * read side of the reference's idempotent-upsert sink semantics
 * (`ImplStructured.scala:22-36` writes verdicts keyed by ip with
 * last-write-wins visibility; here the "last write" is picked relationally).
 *
 * Scale shape: latest-per-key is ONE partial-aggregatable `max_by` over a
 * total (orderCols) tie-broken order — hot keys (an entity updated millions
 * of times) collapse map-side before the exchange, unlike the textbook
 * `row_number() OVER (PARTITION BY key ORDER BY ts DESC)` formulation,
 * which funnels every version of a hot key through one window task. The
 * delete filter runs after the aggregate on one row per key.
 */
object Cdc {

  /**
   * Latest row per key by `ordCols` (later wins; make the order total —
   * e.g. (ts, change_id) — or ties resolve by the struct's remaining
   * fields). Rows whose LATEST version satisfies `deletePred` (evaluated
   * on the surviving row) are dropped — a delete tombstone erases the key
   * unless a later upsert resurrects it. Output: `keyCol` + `payloadCols`
   * of the surviving version, aliased as given.
   */
  def applyChangelog(df: DataFrame, keyCol: Column, keyName: String,
      ordCols: Seq[Column], payloadCols: Seq[(Column, String)],
      deletePred: Column): DataFrame = {
    require(ordCols.nonEmpty, "applyChangelog: ordCols must be non-empty")
    require(payloadCols.nonEmpty, "applyChangelog: payloadCols must be non-empty")
    val payload = struct(
      payloadCols.map { case (c, name) => c.as(name) } :+
        deletePred.as("__cdc_del"): _*)
    df.groupBy(keyCol.as("__cdc_key"))
      .agg(max_by(payload, struct(ordCols: _*)).as("__cdc_last"))
      .filter(!col("__cdc_last.__cdc_del"))
      .select(col("__cdc_key").as(keyName) +:
        payloadCols.map { case (_, name) => col(s"__cdc_last.$name").as(name) }: _*)
  }

  /**
   * Streaming twin: maintain the snapshot as an O(delta)-per-batch
   * [[graft.streaming.IncrementalView]] (latest-per-key is a commutative
   * monoid — max over the (ord, payload) struct — so it slots into the
   * same crash-safe LSM store: partial deltas per micro-batch, merge-on-
   * read, manifest-idempotent replay, per-shard compaction). Column
   * REQUIREMENTS: the changelog frame must already carry `ordCols` then
   * `payloadCols` plus a boolean `deleteCol`; tombstones stay IN the store
   * (a late-replayed upsert must still lose to a newer delete) and are
   * dropped only by [[snapshotOf]] at read time.
   */
  def latestAgg(ordCols: Seq[String], payloadCols: Seq[String],
      deleteCol: String): graft.streaming.LatestAgg =
    graft.streaming.LatestAgg(ordCols, payloadCols :+ deleteCol)

  /** Expand a [[latestAgg]] view read into the current snapshot: drop
   * tombstoned keys, flatten the latest payload. */
  def snapshotOf(view: DataFrame, keyCols: Seq[String], ordCols: Seq[String],
      payloadCols: Seq[String], deleteCol: String): DataFrame =
    view.filter(!col(s"__latest.$deleteCol"))
      .select(keyCols.map(col) ++
        (ordCols ++ payloadCols).map(n => col(s"__latest.$n").as(n)): _*)
}
