package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sinks.v2.KvStore

/**
 * Stream-static enrichment against a `graft-kv` table — the canonical
 * serving pattern the kv catalog enables: a streaming pipeline joins each
 * event against the keyed store's CURRENT view (first-write-wins resolved),
 * picking up dimension rows that land while the stream runs.
 *
 * Epoch consistency is the point. A naive `stream.join(kvDf)` fixes the
 * static plan once at query start (never refreshes), while a naive
 * per-batch re-read can TEAR: the current-view resolution scans the store
 * twice (min-epoch aggregate + semi-join probe), and a concurrent INSERT
 * landing between those two scans would yield a view no committed epoch
 * ever described. Here each micro-batch:
 *
 *   1. resolves the latest committed epoch E from the manifest — ONCE, on
 *      the driver, before any scan plans;
 *   2. joins the batch against `readCurrent(..., atEpoch = Some(E))`, so
 *      every scan in the join is pinned to E no matter when it
 *      materializes relative to concurrent writers;
 *   3. tags output rows with `_dim_epoch = E` — the audit column that
 *      makes the consistency property CHECKABLE downstream (all rows of a
 *      batch carry one epoch).
 *
 * 100 TB shape: the dimension side is a keyed store, usually MB–GB — the
 * join broadcasts (the kv scan reports post-pruning sizeInBytes, so
 * Catalyst makes that call from real numbers, and key filters pushed by
 * the join prune segments). The stream side never shuffles for the join
 * itself. Refresh cost is one manifest read per micro-batch plus the
 * dimension scan, independent of stream volume.
 */
object KvEnrich {

  /** One micro-batch's enrichment: left join against the store's current
   * view pinned at `epoch` (None = store not yet written → dimension
   * columns come back null, `_dim_epoch` = -1). */
  def enrichBatch(batch: DataFrame, kvPath: String, keyCols: Seq[String],
      epoch: Option[Long]): DataFrame = epoch match {
    case Some(e) =>
      val dim = KvStore.readCurrent(batch.sparkSession, kvPath, keyCols,
        atEpoch = Some(e))
      batch.join(dim, keyCols, "left").withColumn("_dim_epoch", lit(e))
    case None =>
      // schema-stable empty-dimension shape: same columns as the joined
      // output, so downstream consumers never see a schema flip when the
      // first dimension epoch lands mid-stream
      KvStore.schemaOf(kvPath) match {
        case Some(schema) =>
          schema.fields.filterNot(f => keyCols.contains(f.name))
            .foldLeft(batch)((df, f) =>
              df.withColumn(f.name, lit(null).cast(f.dataType)))
            .withColumn("_dim_epoch", lit(-1L))
        case None => batch.withColumn("_dim_epoch", lit(-1L))
      }
  }

  /** Start the enrichment stream: each micro-batch is joined against one
   * committed epoch of the kv table and appended to `outPath` parquet.
   * At-least-once on the parquet append (micro-batch retry may re-append);
   * the `_dim_epoch` + event key columns make downstream dedup trivial. */
  def enrichedSink(stream: DataFrame, kvPath: String, keyCols: Seq[String],
      outPath: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        enrichBatch(batch, kvPath, keyCols, KvStore.latestEpoch(kvPath))
          .write.mode("append").parquet(outPath)
      }
      .start()
}
