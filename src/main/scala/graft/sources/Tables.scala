package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Batch table loader for the driver's parquet tables.
 *
 * The `events` table stores `ts` as parquet INT64 TIMESTAMP(NANOS), which
 * Spark 4 refuses outright ([PARQUET_TYPE_ILLEGAL]). We read nanos as Long
 * (`spark.sql.legacy.parquet.nanosAsLong`) and floor-convert to a microsecond
 * TimestampType column — the same truncation DuckDB applies reading the same
 * file, so oracle comparisons agree.
 */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) =>
        // `div` keeps the whole computation in Long arithmetic: `/` on longs
        // is DOUBLE division, and at ~1.7e18 nanos doubles only resolve
        // ~256 ns, so floor(double) can be off by 1 µs vs DuckDB's integer
        // truncation whenever ts has sub-microsecond components.
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }
}
