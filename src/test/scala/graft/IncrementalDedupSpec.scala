package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.IncrementalDedup

class IncrementalDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val base = "the quick brown fox jumps over the lazy dog and runs far away " +
    "into the deep dark woods tonight while the moon rises slowly over the hills"
  private val nearCopy = base.replace("slowly", "quickly")  // one token differs
  private val other = "completely different text about spark structured streaming " +
    "engines processing terabytes of shuffled data with watermarks and stateful operators"
  private val third = "yet another unrelated document covering minhash signatures " +
    "locality sensitive hashing banded buckets and jaccard similarity estimation at scale"

  test("novel docs pass, near-dups of the store and exact re-sends are dropped") {
    val store = tmp("sig-store") + "/sigs"
    val b1 = Seq((1L, base), (2L, other)).toDF("doc_id", "text")
    val out1 = IncrementalDedup.processBatch(b1, store, threshold = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out1 === Set(1L, 2L))

    val b2 = Seq((3L, nearCopy), (4L, third), (5L, other)).toDF("doc_id", "text")
    val out2 = IncrementalDedup.processBatch(b2, store, threshold = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out2 === Set(4L), s"expected only the novel doc, got $out2")

    // the store accumulated exactly the novel signatures
    val stored = spark.read.parquet(store).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(stored === Set(1L, 2L, 4L))
  }

  test("in-batch near-dups collapse to the min doc_id") {
    val store = tmp("sig-store2") + "/sigs"
    val b = Seq((10L, base), (11L, nearCopy), (12L, other)).toDF("doc_id", "text")
    val out = IncrementalDedup.processBatch(b, store, threshold = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(10L, 12L))
  }

  test("streaming wiring: micro-batches accumulate the store, output has novel docs only") {
    val store = tmp("sig-store3") + "/sigs"
    val outDir = tmp("dedup-out") + "/docs"
    val input = MemoryStream[(Long, String)](spark)
    val q = IncrementalDedup.start(
      input.toDF().toDF("doc_id", "text"), store, outDir, tmp("dedup-ckpt"),
      threshold = 0.7)
    try {
      input.addData((1L, base), (2L, other))
      q.processAllAvailable()
      input.addData((3L, nearCopy), (4L, third))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(emitted === Set(1L, 2L, 4L))
  }

  test("docs too short to shingle pass through as novel instead of vanishing") {
    val store = tmp("sig-store4") + "/sigs"
    val b = Seq((20L, base), (21L, ""), (22L, "two words")).toDF("doc_id", "text")
    val out = IncrementalDedup.processBatch(b, store, threshold = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(20L, 21L, 22L))
  }
}
