package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.model.{IpStat, LogRecord}

/**
 * Single-pass typed aggregator over the IpStat monoid (SURVEY.md §2c A3
 * alternative; monoid at reference `Common.scala:52-61`): one buffer holds
 * (clicks, views, category set), merged associatively — Spark runs it as a
 * partial (map-side) + final aggregation, so the shuffle carries one buffer
 * per key per partition, not raw rows.
 *
 * The expression path (`sum/sum/collect_set`) stays the default — it is
 * codegen'd and column-prunable; this typed twin exists for Dataset-API
 * parity with the reference and for callers that already hold
 * `Dataset[LogRecord]`.
 */
object IpStatAggregator extends Aggregator[LogRecord, IpStat, IpStat] {
  override def zero: IpStat = IpStat.empty
  override def reduce(b: IpStat, a: LogRecord): IpStat = b + IpStat.fromRecord(a)
  override def merge(b1: IpStat, b2: IpStat): IpStat = b1 + b2
  override def finish(r: IpStat): IpStat = r
  override def bufferEncoder: Encoder[IpStat] = Encoders.product[IpStat]
  override def outputEncoder: Encoder[IpStat] = Encoders.product[IpStat]
}
