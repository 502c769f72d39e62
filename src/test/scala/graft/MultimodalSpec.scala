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

  test("decodeMeta parses real PNG IHDR and JPEG SOF0/SOF2 dimensions") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def be16(v: Int) = Array((v >>> 8).toByte, v.toByte)
    // minimal PNG: signature + IHDR length/type + width=640 height=480
    val png = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      be32(13) ++ "IHDR".getBytes ++ be32(640) ++ be32(480) ++ Array.fill(5)(0.toByte)
    // JPEG: SOI, APP0 segment (skipped), SOF0 [len, precision, h=100, w=200]
    val jpeg = Array(0xff, 0xd8).map(_.toByte) ++
      Array(0xff, 0xe0).map(_.toByte) ++ be16(6) ++ Array.fill(4)(0.toByte) ++
      Array(0xff, 0xc0).map(_.toByte) ++ be16(8) ++ Array(8.toByte) ++
      be16(100) ++ be16(200) ++ Array.fill(1)(0.toByte)
    // progressive JPEG (SOF2) with a restart marker AND legal 0xFF fill
    // bytes before the frame marker (T.81 B.1.1.2) in the walk
    val jpeg2 = Array(0xff, 0xd8, 0xff, 0xd0, 0xff, 0xff, 0xff).map(_.toByte) ++
      Array(0xff, 0xc2).map(_.toByte) ++ be16(8) ++ Array(8.toByte) ++
      be16(77) ++ be16(99) ++ Array.fill(1)(0.toByte)
    // not a container → deterministic stub fallback (n=10 → 10%3=1 "jpeg")
    val text = "plaintext!".getBytes("UTF-8")
    val schema = StructType(Seq(StructField("media_id", LongType),
      StructField("bytes", BinaryType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, png), Row(2L, jpeg), Row(3L, jpeg2), Row(4L, text)),
      schema)
    val metas = Multimodal.withFeatures(df).orderBy("media_id")
      .select("meta.format", "meta.width", "meta.height").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(metas(0) === (("png", 640, 480)))
    assert(metas(1) === (("jpeg", 200, 100)))   // SOF stores height first
    assert(metas(2) === (("jpeg", 99, 77)))
    assert(metas(3) === (("jpeg", 64 + 10 % 512, 64 + (10 / 7) % 512)))
    // truncated headers must not throw — they fall back to the stub
    val trunc = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, png.take(20)), Row(2L, jpeg.take(3)), Row(3L, Array.empty[Byte])), schema)
    assert(Multimodal.withFeatures(trunc).count() === 3)
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
