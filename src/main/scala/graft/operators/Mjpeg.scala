package graft.operators

/**
 * Motion-JPEG in an AVI (RIFF) container — real VIDEO decode in pure JVM.
 * With [[JpegCodec]] in hand, video is just container walking: an MJPEG AVI
 * is `RIFF('AVI ') { LIST(hdrl){avih, LIST(strl){strh,strf}}, LIST(movi)
 * {'00dc' JPEG frames…}, idx1 }` (the public MS RIFF/AVI layout), and each
 * `00dc` chunk is a complete baseline JPEG. That closes the last media stub:
 * frame sampling over video now decodes actual frames instead of hashing
 * byte slices.
 *
 * Decode is bounded and total: caps are CUMULATIVE across frames (many
 * small chunks claiming big rasters must not OOM an executor), and any
 * malformed container or frame returns None, never throws. The encoder is
 * the synthesis twin used by the `multimodal_video_frames` oracle gate and
 * the specs; it emits a spec-shaped file (hdrl with avih/strh/strf, movi,
 * idx1) that standard players accept.
 */
object Mjpeg {

  /** A decoded clip: logical dims, per-frame duration in microseconds, and
   * fully decoded frames (grayscale or RGB rasters). */
  final case class AviVideo(width: Int, height: Int, usecPerFrame: Int,
      frames: Seq[JpegCodec.JpegImage])

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Header-only metadata probe (format, width, height): requires the full
   * chain RIFF→'AVI '→LIST hdrl→avih so text payloads that merely start
   * with "RIFF" can never flip the multimodal metadata oracle. */
  def parseAviMeta(b: Array[Byte]): Option[(String, Int, Int)] =
    try {
      if (b.length < 72 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return None
      if (fourcc(b, 12) != "LIST" || fourcc(b, 20) != "hdrl") return None
      if (fourcc(b, 24) != "avih") return None
      // avih payload: usec/frame, maxbps, pad, flags, totalFrames, initial,
      // streams, suggBuf, width, height. The declared chunk length must
      // actually cover the width/height words at payload offsets 32/36
      // (file offsets 64/68) and the dims must be positive — a truncated or
      // crafted header otherwise surfaces garbage/negative dims that the
      // PNG/JPEG/GIF probes all reject.
      val avihLen = le32(b, 28)
      if (avihLen < 40) return None
      val (w, h) = (le32(b, 64), le32(b, 68))
      if (w <= 0 || h <= 0) None else Some(("avi", w, h))
    } catch { case _: Exception => None }

  /** Full MJPEG decode: every 'xxdc'/'xxdb' chunk in LIST(movi) through
   * [[JpegCodec.decodeJpeg]]. None for non-AVI, non-MJPEG frames, or
   * cumulative rasters beyond [[MediaCodec.maxDecodedBytes]]. */
  def decodeAvi(b: Array[Byte]): Option[AviVideo] =
    try decodeUnsafe(b) catch { case _: Exception => None }

  private def decodeUnsafe(b: Array[Byte]): Option[AviVideo] = {
    if (b.length < 64 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return None
    var width, height, usec = 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[JpegCodec.JpegImage]
    var totalRaster = 0L
    var pos = 12
    while (pos + 8 <= b.length) {
      val cid = fourcc(b, pos)
      val len = le32(b, pos + 4)
      if (len < 0 || pos + 8L + len > b.length) return None
      if (cid == "LIST" && len >= 4) {
        fourcc(b, pos + 8) match {
          case "hdrl" =>
            // first sub-chunk must be avih (56-byte payload)
            if (pos + 12 + 8 > b.length || fourcc(b, pos + 12) != "avih") return None
            usec = le32(b, pos + 20)
            width = le32(b, pos + 52)
            height = le32(b, pos + 56)
          case "movi" =>
            var p = pos + 12
            val end = pos + 8 + len
            while (p + 8 <= end) {
              val fid = fourcc(b, p)
              val flen = le32(b, p + 4)
              if (flen < 0 || p + 8L + flen > end) return None
              if (fid.endsWith("dc") || fid.endsWith("db")) {
                val frame = java.util.Arrays.copyOfRange(b, p + 8, p + 8 + flen)
                val img = JpegCodec.decodeJpeg(frame).getOrElse(return None)
                totalRaster += img.pixels.length.toLong
                if (totalRaster > MediaCodec.maxDecodedBytes) return None
                frames += img
              } // rec LISTs / padding chunks: skip
              p += 8 + flen + (flen & 1)
            }
          case _ => ()
        }
      }
      pos += 8 + len + (len & 1)
    }
    if (width <= 0 || height <= 0 || frames.isEmpty) return None
    Some(AviVideo(width, height, usec, frames.toSeq))
  }

  /** MJPEG AVI encode: wraps pre-encoded JPEG frames (all same dims) in a
   * minimal conformant container — hdrl(avih + strl(strh 'vids'/'MJPG',
   * strf BITMAPINFOHEADER)), movi with word-aligned '00dc' chunks, idx1. */
  def encodeAvi(width: Int, height: Int, fps: Int,
      jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    require(jpegFrames.nonEmpty && fps > 0)
    val out = new java.io.ByteArrayOutputStream
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))

    val usec = 1000000 / fps
    val maxFrame = jpegFrames.map(_.length).max
    // sizes: avih 56, strh 56, strf 40
    val strlLen = 4 + 8 + 56 + 8 + 40
    val hdrlLen = 4 + 8 + 56 + 8 + strlLen
    val moviLen = 4 + jpegFrames.map(f => 8 + f.length + (f.length & 1)).sum
    val idxLen = 16 * jpegFrames.length
    val riffLen = 4 + 8 + hdrlLen + 8 + moviLen + 8 + idxLen

    tag("RIFF"); w32(riffLen); tag("AVI ")
    tag("LIST"); w32(hdrlLen); tag("hdrl")
    tag("avih"); w32(56)
    w32(usec)
    w32(math.min(maxFrame.toLong * fps, Int.MaxValue.toLong).toInt) // bytes/sec, saturated
    w32(0); w32(0x10) // padding, HASINDEX
    w32(jpegFrames.length); w32(0); w32(1); w32(maxFrame)
    w32(width); w32(height); w32(0); w32(0); w32(0); w32(0)
    tag("LIST"); w32(strlLen); tag("strl")
    tag("strh"); w32(56)
    tag("vids"); tag("MJPG"); w32(0); w16(0); w16(0); w32(0)
    w32(1); w32(fps) // scale/rate
    w32(0); w32(jpegFrames.length); w32(maxFrame); w32(-1); w32(0)
    w16(0); w16(0); w16(width); w16(height) // rcFrame
    tag("strf"); w32(40)
    w32(40); w32(width); w32(height); w16(1); w16(24)
    tag("MJPG"); w32(width * height * 3); w32(0); w32(0); w32(0); w32(0)
    tag("LIST"); w32(moviLen); tag("movi")
    val offsets = new Array[Int](jpegFrames.length)
    var rel = 4 // idx1 offsets are relative to the 'movi' fourcc
    jpegFrames.zipWithIndex.foreach { case (f, k) =>
      offsets(k) = rel
      tag("00dc"); w32(f.length)
      out.write(f, 0, f.length)
      if ((f.length & 1) == 1) out.write(0)
      rel += 8 + f.length + (f.length & 1)
    }
    tag("idx1"); w32(idxLen)
    jpegFrames.zipWithIndex.foreach { case (f, k) =>
      tag("00dc"); w32(0x10) // AVIIF_KEYFRAME
      w32(offsets(k)); w32(f.length)
    }
    out.toByteArray
  }
}
