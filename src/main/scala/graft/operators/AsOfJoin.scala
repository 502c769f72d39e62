package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Point-in-time ("as-of") join: for every left row, attach the payload of
 * the latest right row with the same key whose time is ≤ (or <, when
 * `inclusive = false`) the left row's time. The classic trading/feature-store
 * operator (DuckDB ships it as `ASOF JOIN`; Spark has no built-in).
 *
 * Spark-first plan: instead of a range join (pair blow-up, O(L×R) worst
 * case), both sides are union-tagged and sorted per key, and a running
 * `last(payload, ignoreNulls)` window carries the newest right payload
 * forward into each left row — ONE shuffle of L+R rows on the key, linear
 * work per partition, AQE-friendly. At 100 TB this is the only shape that
 * survives: shuffle volume is the data itself (no candidate pairs), state
 * per key is one payload struct, and skewed keys degrade to a per-key sort
 * rather than a quadratic join.
 */
object AsOfJoin {

  /**
   * @param payload right-side columns to carry onto left rows (must not
   *                collide with left column names)
   * @param inclusive when true, a right row at exactly the left row's time
   *                  matches (`>=` semantics, DuckDB ASOF default)
   *
   * Determinism: the right side must be unique per (key, time) — with
   * duplicates the carried payload depends on sort ties. Callers dedup first
   * (e.g. `groupBy(key, t).agg(max_by(...))`).
   *
   * Left rows with no matching right row keep NULL payload (left-join
   * semantics).
   */
  def asOfBackward(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payload: Seq[String], inclusive: Boolean = true): DataFrame = {
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val payStruct = struct(payload.map(col): _*)
    // at equal times the ordering tag decides whether the right row is
    // visible to the left row: right-before-left = inclusive (>=)
    val (rightTag, leftTag) = if (inclusive) (0, 1) else (1, 0)
    val l = left.select(col(leftKey).as("__k"), col(leftTime).as("__t"),
      lit(leftTag).as("__tag"), leftStruct.as("__l"),
      lit(null).cast(right.select(payStruct).schema.head.dataType).as("__r"))
    // a NULL right time can match nothing under `t <= left.t` (ASOF
    // semantics), but asc-nulls-first ordering would place it at the frame
    // start and carry its payload onto every left row — filter it out
    val r = right.filter(col(rightTime).isNotNull)
      .select(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(rightTag).as("__tag"),
        lit(null).cast(left.select(leftStruct).schema.head.dataType).as("__l"),
        payStruct.as("__r"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === leftTag)
      .select(col("__l.*") +: payload.map(p => col("__m").getField(p).as(p)): _*)
  }
}
