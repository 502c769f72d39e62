package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class PqSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private lazy val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("codebooks have one entry per (subspace, code); codes are compact") {
    val cb = Similarity.pqTrain(e, "vec_id", "embedding", dim = 64)
    val rows = cb.collect()
    assert(rows.map(r => (r.getInt(0), r.getLong(1))).distinct.length === rows.length)
    assert(rows.map(_.getInt(0)).distinct.sorted.toSeq === (0 until 8))
    assert(rows.forall(_.getSeq[Float](2).length === 8))
  }

  test("encoding is total and within the code range") {
    val cb = Similarity.pqTrain(e, "vec_id", "embedding", 64)
    val enc = Similarity.pqEncode(e, "vec_id", "embedding", 64, cb)
    // every vector gets exactly one code per subspace
    assert(enc.count() === 500L * 8L)
    assert(enc.groupBy("vec_id").count().filter(col("count") =!= 8).count() === 0)
    assert(enc.agg(min("code"), max("code")).head().getLong(1) <= 15L)
  }

  test("seeding is a bounded aggregate + broadcast join, not a per-subspace window") {
    // Window.partitionBy("s") has only `subspaces` distinct keys, so a
    // row_number seeding would funnel corpus × subspaces rows through
    // `subspaces` tasks — the same hot-key shape as the old paragraph dedup.
    // With integral ids the seed pick must be the bounded TopN ordered-set
    // aggregate (partial-aggregatable map-side) + a broadcast semi-join; the
    // only Window left is the relabel over the ≤ subspaces × codes centroid
    // table.
    val p = Similarity.pqTrain(e, "vec_id", "embedding", dim = 64, iterations = 0)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    def count(node: String) = ("""(?m)^\s*[^(]*\(\d+\) """ + node + "\\b").r.findAllIn(p).length
    assert(!p.contains("WindowGroupLimit"), "no rank-filter window over the corpus")
    assert(count("Window") === 1, "only the bounded centroid-relabel window: " + p.take(400))
    assert(p.contains("BroadcastHashJoin"), "seed ids must broadcast back to the corpus")
  }

  test("seed order follows signed numeric ids (sign-flip hex key handles negatives)") {
    import spark.implicits._
    val df = Seq(
      (-5L, Seq(1f, 0f)), (-1L, Seq(0f, 1f)), (3L, Seq(1f, 1f)), (10L, Seq(2f, 0f)))
      .toDF("vec_id", "embedding")
    val cb = Similarity.pqTrain(df, "vec_id", "embedding", dim = 2,
      subspaces = 1, codes = 2, iterations = 0)
    val byCode = cb.collect().map(r => r.getLong(1) -> r.getSeq[Float](2)).toMap
    // codes relabel in seed-id order: -5 then -1
    assert(byCode(0L) === Seq(1f, 0f))
    assert(byCode(1L) === Seq(0f, 1f))
  }

  test("ADC + exact rerank recovers a solid share of true neighbors") {
    val truth = Similarity.bruteForceTopK(e, "vec_id", "embedding", col("vec_id") < 20, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(e, "vec_id", "embedding", 64, col("vec_id") < 20, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq & truth).size.toDouble / truth.size
    info(s"pq recall@10 (rerank=50 of 500): $recall")
    assert(recall >= 0.3, s"pq recall too low: $recall")
    // rerank guarantees precision of scores: every returned pair is exactly
    // ranked, so shared pairs carry identical ranks in both results
    assert(pq.size === truth.size)
  }

  test("sample-trained quantizers keep recall (FAISS train-on-sample shape)") {
    val truth = Similarity.bruteForceTopK(e, "vec_id", "embedding", col("vec_id") < 20, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(e, "vec_id", "embedding", 64, col("vec_id") < 20,
        k = 10, trainSampleMod = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq & truth).size.toDouble / truth.size
    info(s"half-sample pq recall@10: $recall")
    assert(recall >= 0.3, s"sample-trained pq recall too low: $recall")

    val (cents, books, codes) = Similarity.ivfPqBuild(
      e, "vec_id", "embedding", dim = 64, nCells = 4, trainSampleMod = 2)
    val truth5 = Similarity.bruteForceTopK(e, "vec_id", "embedding", col("vec_id") < 20, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = Similarity.ivfPqSearch(cents, books, codes, e,
        "vec_id", "embedding", dim = 64, col("vec_id") < 20, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfRecall = (ivfpq & truth5).size.toDouble / truth5.size
    info(s"half-sample ivfpq recall@5: $ivfRecall")
    assert(ivfRecall >= 0.4, s"sample-trained ivfpq recall too low: $ivfRecall")
  }
}
