package graft.sources

import org.apache.spark.sql.DataFrame

/**
 * Bucketed-table co-location: pre-shuffle a fact table ONCE at write time so
 * every subsequent equi-join/aggregation on the bucket key runs shuffle-free.
 *
 * At 100 TB this is the difference between re-shuffling the biggest table on
 * every query and paying the shuffle once at ingest: two tables bucketed by
 * the same key into the same bucket count sort-merge-join with ZERO Exchange
 * nodes (BucketingSpec asserts exactly that on the physical plan), and
 * `sortBy` within buckets removes the per-task sort too.
 *
 * Buckets also bound partition size deterministically (`buckets` splits of
 * the key hash space), which is what you tune so a 100 TB table's per-bucket
 * files stay in the executor-memory sweet spot.
 */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed (and sorted) by `key`.
   * Same `buckets` count on both join sides is required for co-location. */
  def writeBucketed(df: DataFrame, tableName: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(tableName)

  /** Read back a bucketed table (bucket metadata comes from the catalog —
   * a raw `spark.read.parquet` of the same files would NOT be co-located). */
  def table(spark: org.apache.spark.sql.SparkSession, name: String): DataFrame =
    spark.table(name)
}
