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
}
