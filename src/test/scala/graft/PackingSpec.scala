package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

class PackingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pack(weights: Seq[Long], budget: Long, nBuckets: Int = 256) =
    Packing.packSequences(
      weights.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "n_tokens"),
      "doc_id", "n_tokens", budget, nBuckets)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))

  test("chunk boundaries: offsets, straddles, and zero-weight rows") {
    // weights 3,4,5,10,0,2 at budget 10 → cum ends 3,7,12,22,22,24
    val got = pack(Seq(3L, 4L, 5L, 10L, 0L, 2L), budget = 10L)
    val want = Seq(
      (0L, 0L, 0L, 0L, 1L),  // tokens [0,3)  → seq 0
      (1L, 3L, 0L, 0L, 1L),  // tokens [3,7)  → seq 0
      (2L, 7L, 0L, 1L, 2L),  // tokens [7,12) → straddles 0→1
      (3L, 12L, 1L, 2L, 2L), // tokens [12,22) → straddles 1→2
      (4L, 22L, 2L, 2L, 1L), // zero tokens at offset 22 → seq 2, no straddle
      (5L, 22L, 2L, 2L, 1L)) // tokens [22,24) → seq 2
    assert(got.toSeq === want)
  }

  test("exact-boundary doc ends flush: next doc starts a fresh sequence") {
    val got = pack(Seq(10L, 5L), budget = 10L)
    assert(got(0) === ((0L, 0L, 0L, 0L, 1L))) // [0,10) stays inside seq 0
    assert(got(1) === ((1L, 10L, 1L, 1L, 1L)))
  }

  test("prefix sum is invariant to partitioning and bucket count") {
    val docs = (0L until 500L).map(i => (i * 7 % 501, 1L + i % 13)).toDF("doc_id", "n_tokens")
    val base = Packing.packSequences(docs, "doc_id", "n_tokens", 64L)
      .orderBy("doc_id").collect().toSeq
    val repart = Packing.packSequences(docs.repartition(11), "doc_id", "n_tokens", 64L)
      .orderBy("doc_id").collect().toSeq
    val twoBuckets = Packing.packSequences(docs, "doc_id", "n_tokens", 64L, nBuckets = 2)
      .orderBy("doc_id").collect().toSeq
    assert(repart === base)
    assert(twoBuckets === base)
    // global invariant: consecutive tok_starts differ by exactly the weight
    val rows = base.map(r => (r.getLong(1), r.getLong(2)))
    rows.sliding(2).foreach { case Seq((w, s), (_, s2)) => assert(s2 === s + w); case _ => }
  }

  test("random weights match a sequential reference scan exactly") {
    val rnd = new scala.util.Random(7)
    val weights = Seq.fill(300)(rnd.nextInt(21).toLong) // includes zeros
    val budget = 7L
    // sequential reference: running sum in id order
    var cum = 0L
    val expected = weights.zipWithIndex.map { case (w, i) =>
      val start = cum; cum += w
      val first = start / budget
      val last = if (w > 0) (cum - 1) / budget else first
      (i.toLong, start, first, last, last - first + 1)
    }
    assert(pack(weights, budget).toSeq === expected)
  }

  test("empty input yields the output schema with zero rows") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "n_tokens")
    val out = Packing.packSequences(empty, "doc_id", "n_tokens", 10L)
    assert(out.columns.toSeq ===
      Seq("doc_id", "n_tokens", "tok_start", "seq_first", "seq_last", "n_seqs"))
    assert(out.count() === 0L)
  }

  test("NULL weights pack as zero tokens instead of failing the totals collect") {
    val docs = Seq((0L, Some(3L)), (1L, None), (2L, Some(4L)))
      .toDF("doc_id", "n_tokens")
    val got = Packing.packSequences(docs, "doc_id", "n_tokens", 10L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 3L, 0L), (1L, 0L, 3L), (2L, 4L, 3L)))
  }

  test("extreme 64-bit ids bucket integrally (no double-division misbucketing)") {
    // ids beyond 2^53 lose low bits under double division; `div` must keep
    // the bucket ordering aligned with the id ordering
    val big = Seq(
      (Long.MaxValue - 2L, 1L), (Long.MaxValue - 1L, 2L),
      (0L, 4L), (Long.MinValue + 1L, 8L))
      .toDF("doc_id", "n_tokens")
    val got = Packing.packSequences(big, "doc_id", "n_tokens", 10L)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    // id order: MinValue+1, 0, Max-2, Max-1 → offsets 0, 8, 12, 13
    assert(got.toSeq === Seq(
      (Long.MinValue + 1L, 0L), (0L, 8L),
      (Long.MaxValue - 2L, 12L), (Long.MaxValue - 1L, 13L)))
  }
}
