package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/**
 * Incremental (streaming) near-dedup of a document stream: every micro-batch
 * is LSH-checked against a persistent signature store and only novel
 * documents — no near-duplicate in the store OR earlier in the same batch —
 * are emitted; their signatures join the store.
 *
 * This is the micro-batch shape production training-data pipelines use
 * (state = a compacted signature table, not executor memory):
 *
 *   - per-doc state is a fixed k-long MinHash signature (k·8 bytes
 *     regardless of document length), stored as parquet partitioned-by-band
 *     LSH buckets at scale — the lookup for a batch is a bucket equi-join
 *     against the store, shuffle ∝ batch size, never store size;
 *   - duplicate verdicts use the MinHash ESTIMATED Jaccard (fraction of
 *     agreeing signature components — unbiased estimator of the true
 *     Jaccard, stderr ≈ 1/√k ≈ 0.125 at k=64) so the store never needs the
 *     original text or shingle sets;
 *   - in-batch near-dups collapse to the min doc_id (same canonical-survivor
 *     rule as the batch `Dedup` family).
 *
 * Exactly-once: `foreachBatch` + idempotent overwrite-per-batch-id output
 * would harden replays; here the store append is the at-least-once baseline
 * and replays can re-admit a doc (documented trade-off, as in any
 * non-transactional sink).
 */
object IncrementalDedup {

  /** Fraction of agreeing components between two equal-length signatures —
   * the MinHash Jaccard estimator. Interpreted higher-order expression, but
   * it only ever runs on bucket-collision candidate pairs (a vanishing
   * fraction of batch × store). */
  private def sigAgreement(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / size(a)

  /**
   * One micro-batch step, also usable standalone for batch-incremental runs.
   * Reads the signature store (if it exists), appends novel docs' signatures
   * to it, and returns the novel (doc_id, text) rows.
   */
  def processBatch(batch: DataFrame, sigStore: String, threshold: Double,
      n: Int = 3, k: Int = 64, bands: Int = 16): DataFrame = {
    val spark = batch.sparkSession
    val signed = graft.Materialize(
      Dedup.withMinhash(batch, "doc_id", "text", n, k))
    val buckets = Dedup.lshBuckets(signed, k, bands)

    // --- in-batch near-dups: bucket-colliding pairs, estimated jaccard
    val pairs = buckets.as("a").join(buckets.as("b"), Seq("band", "bucket"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")).distinct()
      .join(signed.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(signed.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .filter(sigAgreement(col("sig_a"), col("sig_b")) >= threshold)
      .select(col("id_a"), col("id_b"))
    // survivors of in-batch dedup: docs that are not the larger id of any pair
    val inBatchDups = pairs.select(col("id_b").as("doc_id")).distinct()
    val batchSurvivors = signed.join(inBatchDups, Seq("doc_id"), "left_anti")

    // --- store check: bucket equi-join against previously seen signatures
    val novel = if (storeExists(spark, sigStore)) {
      val store = spark.read.parquet(sigStore)
      val storeBuckets = Dedup.lshBuckets(store, k, bands)
      val survivorBuckets = Dedup.lshBuckets(batchSurvivors, k, bands)
      val dupOfStore = survivorBuckets.as("a")
        .join(storeBuckets.as("b"), Seq("band", "bucket"))
        .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("seen_id")).distinct()
        .join(batchSurvivors.select(col("doc_id"), col("sig").as("sig_a")), "doc_id")
        .join(store.select(col("doc_id").as("seen_id"), col("sig").as("sig_b")), "seen_id")
        .filter(sigAgreement(col("sig_a"), col("sig_b")) >= threshold)
        .select(col("doc_id")).distinct()
      batchSurvivors.join(dupOfStore, Seq("doc_id"), "left_anti")
    } else batchSurvivors
    val out = graft.Materialize(novel.select(col("doc_id"), col("sig")))

    // new signatures join the store (at scale: a Delta/iceberg table
    // partitioned by band bucket; plain parquet append here)
    out.write.mode("append").parquet(sigStore)
    batch.join(out.select("doc_id"), Seq("doc_id"), "left_semi")
  }

  private def storeExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** Wire the incremental step into a streaming query: novel docs append to
   * `outDir`, signatures accumulate in `sigStore`. */
  def start(docs: DataFrame, sigStore: String, outDir: String, checkpoint: String,
      threshold: Double, n: Int = 3, k: Int = 64, bands: Int = 16): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, sigStore, threshold, n, k, bands)
          .write.mode("append").parquet(outDir)
      }
      .start()
}
