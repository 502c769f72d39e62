package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column handling for training-data pipelines: media as opaque
 * `BINARY` columns with typed metadata structs, plus batch-shaped feature
 * extraction.
 *
 * The Spark-side plumbing (schema, partition-preserving batch iteration,
 * fixed-dim feature output) is real, and so is container-header METADATA
 * decode: `decodeMeta` parses PNG IHDR and JPEG SOFn dimensions from the
 * bytes (pure JVM, no codec needed). Pixel/sample decode — the model's
 * actual input — is a clearly marked deterministic STUB: this container
 * ships no image/audio codecs (see the builder brief), so `stubFeatures`/
 * `stubResize`/`stubFrames` derive pseudo-outputs from the bytes alone.
 * Swapping in a real codec means replacing those bodies; every schema and
 * boundary stays the same.
 *
 * Scale notes: feature extraction runs in `mapPartitions` (the Scala
 * equivalent of a Pandas-UDF batch loop — per-partition setup cost amortized
 * across rows, no per-row JVM↔native crossings), preserves partitioning (no
 * shuffle), and emits fixed-size vectors (bounded row width).
 */
object Multimodal {

  val featureDim = 16

  /** Typed metadata for an opaque media blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /**
   * Wrap a text corpus as a media table: bytes = utf-8 of the text (stand-in
   * for image/audio payloads), plus content checksum. Purely columnar.
   */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("bytes"),
      md5(col(textCol)).as("checksum"))

  /** Media decode: REAL container-header parsing for PNG and JPEG (pure-JVM
   * byte inspection, no codec), falling back to the deterministic stub for
   * anything else. The fallback is what our text-as-bytes stand-in payloads
   * always hit (valid UTF-8 cannot begin with 0x89 or 0xFF), so the
   * DuckDB oracle over the documents table keeps its arithmetic form;
   * MultimodalSpec exercises the real paths with crafted headers. Pixel
   * DECODE (the model's input) stays env-blocked — header metadata is the
   * one part of decode that needs no codec. */
  private[operators] def decodeMeta(bytes: Array[Byte]): (String, Int, Int) =
    parsePng(bytes).orElse(parseJpeg(bytes)).getOrElse(stubDecode(bytes))

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private val pngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG: 8-byte signature, then the IHDR chunk is REQUIRED first —
   * width/height are the two big-endian u32s at offsets 16/20
   * (ISO/IEC 15948 §5.2, §11.2.2). */
  private def parsePng(b: Array[Byte]): Option[(String, Int, Int)] =
    if (b.length >= 24 && b.startsWith(pngSignature) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some(("png", be32(b, 16), be32(b, 20)))
    else None

  /** JPEG: SOI (FF D8), then walk the marker segments to the first frame
   * header SOFn (FF C0/C1/C2 — baseline/extended/progressive); its payload
   * is [len u16, precision u8, height u16, width u16, …] (ITU-T T.81
   * §B.2.2). Standalone markers (RSTn, TEM) carry no length; any number of
   * 0xFF FILL bytes may legally precede a marker (§B.1.1.2) and are
   * consumed, never parsed as a marker themselves. */
  private def parseJpeg(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // desynced: not a marker
      val marker = b(i + 1) & 0xff
      if (marker == 0xff) i += 1 // fill byte: the NEXT 0xFF starts the marker
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
      else {
        val len = be16(b, i + 2)
        if (len < 2) return None
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
          return if (i + 8 < b.length) Some(("jpeg", be16(b, i + 7), be16(b, i + 5)))
          else None
        }
        i += 2 + len
      }
    }
    None
  }

  /** STUB media decode: deterministic pseudo-metadata from the blob — the
   * [[decodeMeta]] fallback when no known container header is present. */
  private def stubDecode(bytes: Array[Byte]): (String, Int, Int) = {
    val n = bytes.length
    val fmt = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp"
    // fake dimensions derived deterministically from content length
    (fmt, 64 + n % 512, 64 + (n / 7) % 512)
  }

  /** STUB feature extraction: fixed-dim deterministic features from byte
   * histogram moments. A real implementation would run the model forward
   * pass here, batched per partition. */
  private def stubFeatures(bytes: Array[Byte]): Array[Float] = {
    val feats = new Array[Float](featureDim)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      feats(b % featureDim) += 1.0f
      i += 1
    }
    val n = math.max(bytes.length, 1).toFloat
    feats.map(_ / n)
  }

  /** STUB resize: a real implementation re-encodes the image at (w, h); the
   * stub deterministically subsamples the byte stream to the target "pixel"
   * budget so output size tracks the requested dimensions. */
  private def stubResize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, math.min(bytes.length, w * h / 64))
    val step = math.max(1, bytes.length / target)
    bytes.indices.by(step).map(bytes).toArray
  }

  /** STUB frame sampling: a real implementation decodes the container and
   * grabs every k-th frame; the stub slices the byte stream into nFrames
   * equal chunks and returns each chunk's md5 as the "frame". */
  private def stubFrames(bytes: Array[Byte], nFrames: Int): Seq[String] = {
    if (bytes.isEmpty) return Seq.empty
    val size = math.max(1, bytes.length / nFrames)
    bytes.grouped(size).take(nFrames).map { chunk =>
      java.security.MessageDigest.getInstance("MD5").digest(chunk)
        .map("%02x".format(_)).mkString
    }.toSeq
  }

  /**
   * Resize + frame-sample in partition-sized batches (same mapPartitions
   * shape as [[withFeatures]]). Output: (media_id, resized binary,
   * n_resized_bytes, frames array<string>).
   */
  def withResizedFrames(media: DataFrame, w: Int = 224, h: Int = 224,
      nFrames: Int = 4): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("resized", BinaryType),
      StructField("n_resized_bytes", LongType),
      StructField("frames", ArrayType(StringType))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("bytes")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val resized = stubResize(bytes, w, h)
        Row(id, resized, resized.length.toLong, stubFrames(bytes, nFrames))
      }
    }(enc)
  }

  /**
   * Decode + featurize in partition-sized batches. Output schema:
   * (media_id, meta struct, features array<float>).
   */
  def withFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("meta", mediaMetaSchema),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("bytes")).mapPartitions { rows =>
      // per-partition setup happens once (where a real impl loads its model)
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (fmt, w, h) = decodeMeta(bytes)
        Row(id, Row(fmt, w, h, bytes.length.toLong), stubFeatures(bytes).toSeq)
      }
    }(enc)
  }
}
