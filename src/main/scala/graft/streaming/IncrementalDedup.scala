package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
 *     rule as the batch `Dedup` family);
 *   - documents too short to shingle (fewer than n words) carry no MinHash
 *     evidence — they are passed through as novel rather than silently
 *     dropped, and nothing is stored for them.
 *
 * Delivery: the streaming wiring writes the NOVEL OUTPUT before appending
 * signatures to the store, so a crash between the two writes re-admits the
 * batch on replay (duplicates possible = at-least-once output). The reverse
 * order would lose documents on replay (store says "seen", output missing).
 */
object IncrementalDedup {

  /** Fraction of agreeing components between two equal-length signatures —
   * the MinHash Jaccard estimator. Interpreted higher-order expression, but
   * it only ever runs on bucket-collision candidate pairs (a vanishing
   * fraction of batch × store). */
  private def sigAgreement(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / size(a)

  /** Verified near-dup pairs between two (band, bucket, doc_id) keyings:
   * bucket-colliding pairs whose estimated Jaccard clears the threshold.
   * Shared by the in-batch and against-store checks so the estimator and
   * threshold can never diverge between them. */
  private def dupPairs(bucketsA: DataFrame, sigsA: DataFrame,
      bucketsB: DataFrame, sigsB: DataFrame, threshold: Double,
      pairFilter: Column): DataFrame =
    bucketsA.as("a").join(bucketsB.as("b"), Seq("band", "bucket"))
      .filter(pairFilter)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")).distinct()
      .join(sigsA.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigsB.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .filter(sigAgreement(col("sig_a"), col("sig_b")) >= threshold)
      .select(col("id_a"), col("id_b"))

  /**
   * Compute the batch's novel signatures WITHOUT side effects: (doc_id, sig)
   * of docs that near-duplicate nothing in the store and nothing earlier in
   * the batch. Materialized, so callers can sequence writes around it.
   */
  def novelSignatures(batch: DataFrame, sigStore: String, threshold: Double,
      n: Int = 3, k: Int = 64, bands: Int = 16): DataFrame = {
    val spark = batch.sparkSession
    val signed = graft.Materialize(Dedup.withMinhash(batch, "doc_id", "text", n, k))
    val buckets = Dedup.lshBuckets(signed, k, bands)

    // in-batch near-dups: the larger id of each verified pair drops
    val inBatchDups = dupPairs(buckets, signed, buckets, signed, threshold,
        col("a.doc_id") < col("b.doc_id"))
      .select(col("id_b").as("doc_id")).distinct()
    val batchSurvivors = signed.join(inBatchDups, Seq("doc_id"), "left_anti")
    val survivorBuckets = buckets.join(inBatchDups, Seq("doc_id"), "left_anti")

    // store check: bucket equi-join against previously seen signatures.
    // The store can exist yet hold zero rows (a first batch of only
    // unshingleable docs still appends its empty novel set, leaving empty
    // part files) — an empty store has no k to check and nothing to dup
    // against, so treat it as absent rather than head()-ing into a throw.
    val maybeStore =
      if (storeExists(spark, sigStore)) {
        val store = spark.read.parquet(sigStore)
        store.select(size(col("sig"))).limit(1).collect().headOption.map { row =>
          val storeK = row.getInt(0)
          require(storeK == k,
            s"signature store at $sigStore was built with k=$storeK, caller passed k=$k — " +
              "estimated Jaccard would be silently wrong")
          store
        }
      } else None
    val novel = maybeStore match {
      case Some(store) =>
        val dupOfStore = dupPairs(survivorBuckets, batchSurvivors,
            Dedup.lshBuckets(store, k, bands), store, threshold, lit(true))
          .select(col("id_a").as("doc_id")).distinct()
        batchSurvivors.join(dupOfStore, Seq("doc_id"), "left_anti")
      case None => batchSurvivors
    }
    graft.Materialize(novel.select(col("doc_id"), col("sig")))
  }

  /** Batch rows with no shingle evidence (text shorter than the shingle
   * width): pass-through novels — MinHash cannot judge them. */
  private def unshingled(batch: DataFrame, n: Int): DataFrame =
    batch.filter(size(array_distinct(
      graft.functions.HashExpressions.wordShingleHashes(col("text"), n))) === 0)

  /**
   * One micro-batch step, usable standalone for batch-incremental runs:
   * appends novel signatures to the store and returns the novel rows
   * (judged novels + unshingleable pass-throughs). NB for standalone use
   * the store append precedes the caller consuming the result — if the
   * caller's own write can fail independently, sequence writes yourself via
   * [[novelSignatures]] (see [[start]]).
   */
  def processBatch(batch: DataFrame, sigStore: String, threshold: Double,
      n: Int = 3, k: Int = 64, bands: Int = 16): DataFrame = {
    val novel = novelSignatures(batch, sigStore, threshold, n, k, bands)
    novel.write.mode("append").parquet(sigStore)
    batch.join(novel.select("doc_id"), Seq("doc_id"), "left_semi")
      .unionByName(unshingled(batch, n))
  }

  private def storeExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** Wire the incremental step into a streaming query: novel docs append to
   * `outDir`, signatures accumulate in `sigStore`. Output is written BEFORE
   * the store append (see the delivery note above). */
  def start(docs: DataFrame, sigStore: String, outDir: String, checkpoint: String,
      threshold: Double, n: Int = 3, k: Int = 64, bands: Int = 16): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val novel = novelSignatures(batch, sigStore, threshold, n, k, bands)
        batch.join(novel.select("doc_id"), Seq("doc_id"), "left_semi")
          .unionByName(unshingled(batch, n))
          .write.mode("append").parquet(outDir)
        novel.write.mode("append").parquet(sigStore)
      }
      .start()
}
