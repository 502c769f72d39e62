package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/**
 * Batch table loader for the driver's parquet tables.
 *
 * Timestamp normalization, both driver schema generations:
 *  - `ts` as parquet INT64 TIMESTAMP(NANOS): Spark 4 refuses it outright
 *    ([PARQUET_TYPE_ILLEGAL]), so we read nanos as Long
 *    (`spark.sql.legacy.parquet.nanosAsLong`) and floor-convert to a
 *    microsecond TimestampType — the same truncation DuckDB applies.
 *  - naive `timestamp[us]` (isAdjustedToUTC=false): Spark reads
 *    TIMESTAMP_NTZ, which refuses numeric casts (`cast(ts AS BIGINT)`)
 *    that the whole query catalog relies on. Every session here pins
 *    `spark.sql.session.timeZone=UTC`, so casting NTZ → TimestampType is a
 *    no-op reinterpretation that matches DuckDB's naive-as-UTC `epoch()`.
 */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case LongType if f.name == "ts" =>
          // `div` keeps the whole computation in Long arithmetic: `/` on
          // longs is DOUBLE division, and at ~1.7e18 nanos doubles only
          // resolve ~256 ns, so floor(double) can be off by 1 µs vs
          // DuckDB's integer truncation on sub-microsecond components.
          acc.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          acc.withColumn(f.name, col(f.name).cast(TimestampType))
        case _ => acc
      }
    }
  }
}
