package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The production IVF-PQ lifecycle: build the index ONCE, persist the three
 * artifacts as plain parquet, search the reloaded artifacts — results must
 * be identical to searching the in-memory build. Pins that the artifact
 * schemas (binary-free: ids, float arrays, int codes) survive a parquet
 * round-trip, which is what lets a 100 TB deployment amortize the build. */
class IvfPqIndexSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("persisted index artifacts search identically to the in-memory build") {
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val (centroids, codebooks, corpusCodes) =
      Similarity.ivfPqBuild(e, "vec_id", "embedding", dim = 64, nCells = 4)
    val direct = Similarity.ivfPqSearch(centroids, codebooks, corpusCodes,
        e, "vec_id", "embedding", dim = 64, col("vec_id") < 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    try {
      centroids.write.parquet(s"$dir/centroids")
      codebooks.write.parquet(s"$dir/codebooks")
      corpusCodes.write.parquet(s"$dir/codes")
      val reloaded = Similarity.ivfPqSearch(
          spark.read.parquet(s"$dir/centroids"),
          spark.read.parquet(s"$dir/codebooks"),
          spark.read.parquet(s"$dir/codes"),
          e, "vec_id", "embedding", dim = 64, col("vec_id") < 10, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(reloaded === direct,
        "search over parquet-reloaded artifacts must equal the in-memory search")
      assert(direct.size === 50) // 10 queries × k=5, full top-k everywhere
    } finally {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(java.nio.file.Paths.get(dir))) { s =>
        s.iterator().asScala.toSeq.sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }

  test("ivfPqEncode is streaming-legal: stream-encoded codes equal batch codes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (centroids, codebooks, batchCodes) =
      Similarity.ivfPqBuild(e, "vec_id", "embedding", dim = 64, nCells = 4)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet

    val input = MemoryStream[(Long, Seq[Float])](spark)
    val streamed = Similarity.ivfPqEncode(
      input.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", dim = 64, centroids, codebooks)
    assert(streamed.isStreaming, "the encode plan must stay a streaming plan")
    val q = streamed.writeStream.format("memory").queryName("ivfpq_stream_codes")
      .outputMode("append").start()
    try {
      val rows = e.select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect().toSeq
      // two batches: the index must absorb increments, not just one load
      val (first, second) = rows.splitAt(rows.length / 2)
      input.addData(first: _*)
      q.processAllAvailable()
      input.addData(second: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(asSet(spark.table("ivfpq_stream_codes")) === asSet(batchCodes),
      "stream-appended codes must equal the batch encode of the same vectors")
  }

  test("the index absorbs streamed increments: searches see post-stream rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // index built when only half the corpus existed; the rest arrives later
    val base = e.filter(col("vec_id") < 250)
    val arriving = e.filter(col("vec_id") >= 250)
    val (centroids, codebooks, baseCodes) =
      Similarity.ivfPqBuild(base, "vec_id", "embedding", dim = 64, nCells = 4)

    val input = MemoryStream[(Long, Seq[Float])](spark)
    val q = Similarity.ivfPqEncode(input.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding", dim = 64, centroids, codebooks)
      .writeStream.format("memory").queryName("ivfpq_increment_codes")
      .outputMode("append").start()
    try {
      input.addData(arriving.select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect().toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    def search(codes: org.apache.spark.sql.DataFrame) =
      Similarity.ivfPqSearch(centroids, codebooks, codes, e,
          "vec_id", "embedding", dim = 64, col("vec_id") < 10, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    val maintained = search(
      baseCodes.unionByName(spark.table("ivfpq_increment_codes")))
    assert(maintained.size === 50)
    assert(maintained.exists(_._2 >= 250L),
      "searched results must include post-stream neighbors")
    // the maintained code table is indistinguishable from a from-scratch
    // batch encode of the full corpus against the same artifacts
    val fromScratch = search(Similarity.ivfPqEncode(
      e, "vec_id", "embedding", dim = 64, centroids, codebooks))
    assert(maintained === fromScratch)
  }
}
