package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val media = Multimodal.asMediaTable(
    Seq((1L, "some fairly long media payload standing in for image bytes today"),
        (2L, "x")).toDF("doc_id", "text"), "doc_id", "text")

  test("media table carries bytes + checksum") {
    val r = media.orderBy("media_id").collect()
    assert(new String(r(0).getAs[Array[Byte]]("bytes"), "UTF-8").startsWith("some fairly"))
    assert(r(0).getString(2).length === 32)
  }

  test("feature extraction: fixed dim, normalized, deterministic") {
    val out = Multimodal.withFeatures(media).orderBy("media_id").collect()
    val feats = out(0).getSeq[Float](2)
    assert(feats.length === Multimodal.featureDim)
    assert(math.abs(feats.sum - 1.0f) < 1e-5) // histogram normalized by length
    val again = Multimodal.withFeatures(media).orderBy("media_id").collect()
    assert(again(0).getSeq[Float](2) === feats)
  }

  test("resize shrinks to the pixel budget; frame sampling yields n frames") {
    val out = Multimodal.withResizedFrames(media, w = 32, h = 32, nFrames = 3)
      .orderBy("media_id").collect()
    val full = media.orderBy("media_id").collect()(0).getAs[Array[Byte]]("bytes").length
    assert(out(0).getLong(2) <= full)
    assert(out(0).getSeq[String](3).length === 3)
    // tiny payload degrades gracefully
    assert(out(1).getSeq[String](3).nonEmpty)
  }
}
