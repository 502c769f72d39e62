package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

/**
 * Pure-JVM media codecs for the multimodal pipeline: PNG (encode + decode)
 * and WAV/PCM (decode). No external codec libraries — PNG's only
 * compression is DEFLATE (`java.util.zip`), and WAV PCM is raw samples, so
 * both are fully implementable from their public specs:
 *
 *  - PNG: ISO/IEC 15948 — 8-byte signature, length-type-data-CRC chunks,
 *    IHDR/IDAT/IEND, five scanline filters (None/Sub/Up/Average/Paeth).
 *    Decode supports bit depth 8, color types 0 (gray), 2 (RGB),
 *    4 (gray+alpha), 6 (RGBA), non-interlaced — the shapes a training
 *    pipeline normalizes to anyway. Chunk CRCs are verified.
 *  - WAV: RIFF container, `fmt ` chunk (PCM format 1, 8/16-bit), `data`
 *    chunk of interleaved little-endian samples.
 *
 * This closes the "pixel/sample decode is env-blocked" stub for these two
 * containers (VERDICT r8 gap #2): JPEG entropy decode and video remain
 * genuinely codec-bound and keep the documented stub.
 *
 * Everything here is deterministic byte math — the `multimodal_pixels`
 * catalog query round-trips arithmetic pixels through encode→decode and
 * hash-matches a closed-form DuckDB replay, so any filter/unfilter bug
 * fails the oracle, not just a spec.
 */
object MediaCodec {

  /** Decoded raster: `pixels` is row-major interleaved, `channels` bytes per
   * pixel, length = width*height*channels. */
  final case class PngImage(width: Int, height: Int, channels: Int,
      colorType: Int, pixels: Array[Byte])

  /** Decoded PCM clip: samples interleaved by channel, each normalized
   * sample kept as its raw integer (8-bit unsigned → 0..255 re-centered to
   * -128..127; 16-bit signed as-is) so downstream math can stay exact. */
  final case class WavAudio(sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Int])

  private val pngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  // ---------------------------------------------------------------- PNG

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => -1
  }

  /**
   * Full PNG pixel decode. Returns None (never throws) for anything outside
   * the supported envelope: wrong signature, depth ≠ 8, palette/interlaced
   * images, truncated data, or a chunk CRC mismatch.
   */
  /** Decoded rasters are capped at 128 MB: one hostile-but-well-formed IHDR
   * must not be able to OOM an executor with a single row. */
  val maxDecodedBytes: Long = 128L << 20

  def decodePng(b: Array[Byte]): Option[PngImage] = {
    if (b.length < 8 || !b.startsWith(pngSignature)) return None
    var width, height, colorType = -1
    val idatChunks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (offset, len)
    var pos = 8
    var sawEnd = false
    while (pos + 8 <= b.length && !sawEnd) {
      val len = be32(b, pos)
      if (len < 0 || pos + 12L + len > b.length) return None
      val ctype = new String(b, pos + 4, 4, "US-ASCII")
      val crc = new CRC32
      crc.update(b, pos + 4, 4 + len)
      if (crc.getValue.toInt != be32(b, pos + 8 + len)) return None
      ctype match {
        case "IHDR" =>
          if (len != 13) return None
          width = be32(b, pos + 8)
          height = be32(b, pos + 12)
          val bitDepth = b(pos + 16) & 0xff
          colorType = b(pos + 17) & 0xff
          val interlace = b(pos + 20) & 0xff
          if (bitDepth != 8 || channelsOf(colorType) < 0 || interlace != 0) return None
          if (width <= 0 || height <= 0) return None
        case "IDAT" => idatChunks += ((pos + 8, len)) // concat once at the end
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunk: skip
      }
      pos += 12 + len
    }
    if (width < 0 || !sawEnd || idatChunks.isEmpty) return None
    val ch = channelsOf(colorType)
    // Long math BEFORE any allocation: a hostile IHDR (2^30 × 3 channels)
    // overflows Int stride/rawLen, and even non-overflowing huge dims must
    // bounce off the size cap, not attempt the allocation
    val strideL = width.toLong * ch
    val rawLenL = (strideL + 1L) * height
    if (rawLenL > maxDecodedBytes) return None
    val stride = strideL.toInt
    val rawLen = rawLenL.toInt
    // single linear concat — libpng-style encoders emit IDAT in 8-32 KB
    // chunks, so grow-and-copy per chunk would be quadratic
    val idat = new Array[Byte](idatChunks.map(_._2.toLong).sum.toInt)
    var w = 0
    idatChunks.foreach { case (off, len) =>
      System.arraycopy(b, off, idat, w, len); w += len
    }
    val raw = new Array[Byte](rawLen)
    val inf = new Inflater
    inf.setInput(idat)
    try {
      var off = 0
      while (off < rawLen && !inf.finished()) {
        val n = inf.inflate(raw, off, rawLen - off)
        // n == 0 with no appetite for input = truncated stream OR a zlib
        // FDICT preset-dictionary header (needsDictionary) — both
        // undecodable; without the dictionary check this loop never exits
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        off += n
      }
      if (off != rawLen) return None
    } catch { case _: Exception => return None } finally inf.end()

    // unfilter scanlines in place into the output raster
    val out = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val ft = raw(y * (stride + 1)) & 0xff
      if (ft > 4) return None
      val src = y * (stride + 1) + 1
      val dst = y * stride
      var i = 0
      while (i < stride) {
        val x = raw(src + i) & 0xff
        val a = if (i >= ch) out(dst + i - ch) & 0xff else 0 // left
        val b0 = if (y > 0) out(dst - stride + i) & 0xff else 0 // up
        val c = if (y > 0 && i >= ch) out(dst - stride + i - ch) & 0xff else 0 // up-left
        val recon = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b0
          case 3 => x + (a + b0) / 2
          case 4 => x + paeth(a, b0, c)
        }
        out(dst + i) = (recon & 0xff).toByte
        i += 1
      }
      y += 1
    }
    Some(PngImage(width, height, ch, colorType, out))
  }

  /** Paeth predictor (ISO/IEC 15948 §9.4): nearest of left/up/up-left to
   * the linear estimate a+b-c, ties resolved a, then b, then c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /**
   * PNG encode (bit depth 8, non-interlaced). `filterOf(y)` picks each
   * scanline's filter type (0-4) — the catalog's round-trip rotates through
   * all five so any filter/unfilter asymmetry breaks the pixel oracle, and
   * a real encoder's per-row heuristic is exactly this hook.
   */
  def encodePng(width: Int, height: Int, channels: Int, pixels: Array[Byte],
      filterOf: Int => Int = _ % 5): Array[Byte] = {
    require(Set(1, 2, 3, 4).contains(channels), s"channels=$channels")
    require(pixels.length == width * height * channels,
      s"pixels ${pixels.length} != $width*$height*$channels")
    val colorType = channels match { case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6 }
    val stride = width * channels
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val ft = filterOf(y) % 5
      raw(y * (stride + 1)) = ft.toByte
      val src = y * stride
      val dst = y * (stride + 1) + 1
      var i = 0
      while (i < stride) {
        val x = pixels(src + i) & 0xff
        val a = if (i >= channels) pixels(src + i - channels) & 0xff else 0
        val b = if (y > 0) pixels(src - stride + i) & 0xff else 0
        val c = if (y > 0 && i >= channels) pixels(src - stride + i - channels) & 0xff else 0
        val filtered = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => x - paeth(a, b, c)
        }
        raw(dst + i) = (filtered & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()

    val out = new java.io.ByteArrayOutputStream
    out.write(pngSignature, 0, 8)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      writeBe32(out, data.length)
      val t = ctype.getBytes("US-ASCII")
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val crc = new CRC32
      crc.update(t); crc.update(data)
      writeBe32(out, crc.getValue.toInt)
    }
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = colorType.toByte // depth 8; compression/filter/interlace = 0
    chunk("IHDR", ihdr)
    chunk("IDAT", zbuf.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeBe32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff)
    o.write((v >>> 8) & 0xff); o.write(v & 0xff)
  }
  private def putBe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  /** Nearest-neighbor resize — the normalization step of an image training
   * pipeline. Exact integer source-index math: src = floor(dst * srcDim /
   * dstDim), so the result is deterministic and replayable in SQL. */
  def resizeNearest(img: PngImage, w: Int, h: Int): PngImage = {
    require(w > 0 && h > 0)
    val out = new Array[Byte](w * h * img.channels)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.height / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * img.width / w).toInt
        val src = (sy * img.width + sx) * img.channels
        val dst = (y * w + x) * img.channels
        var c = 0
        while (c < img.channels) { out(dst + c) = img.pixels(src + c); c += 1 }
        x += 1
      }
      y += 1
    }
    PngImage(w, h, img.channels, img.colorType, out)
  }

  // ---------------------------------------------------------------- GIF

  /** One decoded GIF frame: region geometry within the logical screen,
   * centiseconds of delay (0 for stills), and the region's pixels as RGB
   * triplets after palette lookup. Frames are the raw per-frame regions —
   * disposal-method compositing is deliberately NOT applied (frame
   * sampling and per-frame statistics, the training-pipeline uses, operate
   * on frames in isolation; a player's compositor is out of scope). */
  final case class GifFrame(left: Int, top: Int, width: Int, height: Int,
      delayCs: Int, pixels: Array[Byte])

  final case class GifImage(width: Int, height: Int, frames: Seq[GifFrame])

  /**
   * GIF87a/89a decode: logical screen + palette parsing and full LZW
   * decompression (variable-width LSB-first codes, clear/EOI handling,
   * 4096-entry dictionary) for every frame. The one "video-like" container
   * decodable with zero codec dependencies — animated GIFs give the
   * pipeline REAL frame sampling. Interlaced frames and rasters beyond
   * [[maxDecodedBytes]] return None (never throws).
   */
  def decodeGif(b: Array[Byte]): Option[GifImage] = {
    if (b.length < 13) return None
    val hdr = new String(b, 0, 6, "US-ASCII")
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    try decodeGifUnsafe(b) catch { case _: Exception => None }
  }

  private def decodeGifUnsafe(b: Array[Byte]): Option[GifImage] = {
    val width = le16(b, 6)
    val height = le16(b, 8)
    if (width <= 0 || height <= 0) return None
    val packed = b(10) & 0xff
    var pos = 13
    val globalPal: Array[Byte] =
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        val p = java.util.Arrays.copyOfRange(b, pos, pos + 3 * n)
        pos += 3 * n
        p
      } else null
    val frames = scala.collection.mutable.ArrayBuffer.empty[GifFrame]
    var totalPixelBytes = 0L // the cap is CUMULATIVE: many per-cap frames
    var delayCs = 0          // from tiny LZW input must not OOM either
    while (pos < b.length) {
      (b(pos) & 0xff) match {
        case 0x3b => return Some(GifImage(width, height, frames.toSeq)) // trailer
        case 0x21 => // extension: label + sub-blocks
          val label = b(pos + 1) & 0xff
          pos += 2
          if (label == 0xf9 && (b(pos) & 0xff) >= 4)
            delayCs = le16(b, pos + 2) // graphic control: next frame's delay
          while ((b(pos) & 0xff) != 0) pos += 1 + (b(pos) & 0xff)
          pos += 1
        case 0x2c => // image descriptor
          val left = le16(b, pos + 1)
          val top = le16(b, pos + 3)
          val fw = le16(b, pos + 5)
          val fh = le16(b, pos + 7)
          val fpacked = b(pos + 9) & 0xff
          pos += 10
          if ((fpacked & 0x40) != 0) return None // interlaced: unsupported
          val pal: Array[Byte] =
            if ((fpacked & 0x80) != 0) {
              val n = 2 << (fpacked & 7)
              val p = java.util.Arrays.copyOfRange(b, pos, pos + 3 * n)
              pos += 3 * n
              p
            } else globalPal
          if (pal == null) return None
          if (fw <= 0 || fh <= 0) return None
          totalPixelBytes += fw.toLong * fh * 3
          if (totalPixelBytes > maxDecodedBytes) return None
          val minCode = b(pos) & 0xff
          pos += 1
          // concatenate the length-prefixed data sub-blocks
          val data = new java.io.ByteArrayOutputStream
          while ((b(pos) & 0xff) != 0) {
            val n = b(pos) & 0xff
            data.write(b, pos + 1, n)
            pos += 1 + n
          }
          pos += 1
          val indices = lzwDecode(data.toByteArray, minCode, fw * fh).getOrElse(return None)
          val px = new Array[Byte](fw * fh * 3)
          var i = 0
          while (i < fw * fh) {
            val idx = (indices(i) & 0xff) * 3
            if (idx + 2 >= pal.length) return None // index outside palette
            px(i * 3) = pal(idx); px(i * 3 + 1) = pal(idx + 1); px(i * 3 + 2) = pal(idx + 2)
            i += 1
          }
          frames += GifFrame(left, top, fw, fh, delayCs, px)
          delayCs = 0
        case _ => return None // desynced
      }
    }
    None // no trailer
  }

  /** GIF-flavor LZW: variable-width codes packed LSB-first, dictionary of
   * index sequences seeded with the clear code's alphabet, grown one entry
   * per code up to 4096, reset on CLEAR. Returns exactly `expected` indices
   * or None. */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int, expected: Int): Option[Array[Byte]] = {
    // GIF spec range is 2..8 (literals are palette indices, max 256): a
    // larger root size would let literal codes > 255 truncate mod-256 into
    // wrong-but-in-range palette indices — garbage decoded as Some(...)
    if (minCodeSize < 2 || minCodeSize > 8) return None
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Byte](expected)
    var outLen = 0
    // dictionary as prefix links: prefix(code), suffix(code)
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var free = eoi + 1
    var codeSize = minCodeSize + 1
    var prev = -1
    var acc = 0L
    var accBits = 0
    var bytePos = 0
    val stack = new Array[Byte](4096)

    def emit(code: Int): Boolean = { // expand code via prefix links
      var sp = 0
      var c = code
      while (c >= clear) { // walk to the root
        if (sp >= stack.length || c >= free) return false
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
      }
      if (outLen + sp + 1 > expected) return false
      out(outLen) = c.toByte; outLen += 1
      while (sp > 0) { sp -= 1; out(outLen) = stack(sp); outLen += 1 }
      true
    }
    def firstIndexOf(code: Int): Byte = {
      var c = code
      while (c >= clear) c = prefix(c)
      c.toByte
    }

    while (outLen < expected) {
      while (accBits < codeSize) {
        if (bytePos >= data.length) return None // truncated
        acc |= (data(bytePos) & 0xffL) << accBits
        accBits += 8
        bytePos += 1
      }
      val code = (acc & ((1 << codeSize) - 1)).toInt
      acc >>>= codeSize
      accBits -= codeSize
      if (code == clear) {
        free = eoi + 1; codeSize = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        return if (outLen == expected) Some(out) else None
      } else if (prev < 0) {
        if (code >= clear) return None // first code must be a literal
        out(outLen) = code.toByte; outLen += 1
        prev = code
      } else {
        if (code > free || (code == free && free >= 4096)) return None
        val cur = if (code == free) {
          // KwKwK case: current = prev + firstIndex(prev)
          if (free >= 4096) return None
          prefix(free) = prev; suffix(free) = firstIndexOf(prev)
          free += 1
          if (!emit(free - 1)) return None
          free - 1
        } else {
          if (!emit(code)) return None
          if (free < 4096) {
            prefix(free) = prev; suffix(free) = firstIndexOf(code)
            free += 1
          }
          code
        }
        if (free >= (1 << codeSize) && codeSize < 12) codeSize += 1
        prev = cur
      }
    }
    Some(out)
  }

  /**
   * GIF89a encode for the round-trip gates: one global 256-color palette,
   * any number of full-screen frames of palette indices, animation delays.
   * LZW emission is the classic "uncompressed" strategy — literal codes
   * with a CLEAR before the dictionary would force a width growth — which
   * any conformant decoder (including [[decodeGif]]) must accept.
   */
  def encodeGif(width: Int, height: Int, palette: Array[Byte],
      frames: Seq[Array[Byte]], delayCs: Int = 4): Array[Byte] = {
    require(palette.length == 768, "palette must be 256 RGB entries")
    require(frames.nonEmpty)
    frames.foreach(f => require(f.length == width * height, "frame size mismatch"))
    val out = new java.io.ByteArrayOutputStream
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(width & 0xff); out.write(width >>> 8)
    out.write(height & 0xff); out.write(height >>> 8)
    out.write(0x80 | 7) // global table, 2^(7+1)=256 entries
    out.write(0); out.write(0) // bg index, aspect
    out.write(palette)
    frames.foreach { frame =>
      if (frames.length > 1) { // graphic control (delay) per animated frame
        out.write(0x21); out.write(0xf9); out.write(4)
        out.write(0) // packed: no disposal, no transparency
        out.write(delayCs & 0xff); out.write(delayCs >>> 8)
        out.write(0); out.write(0) // transparent idx, terminator
      }
      out.write(0x2c)
      out.write(0); out.write(0); out.write(0); out.write(0) // left, top
      out.write(width & 0xff); out.write(width >>> 8)
      out.write(height & 0xff); out.write(height >>> 8)
      out.write(0) // no local table, not interlaced
      out.write(8) // LZW min code size (256 literals)
      // literal emission, 9-bit codes, CLEAR every 254 literals so the
      // decoder's dictionary never reaches the 512 width-growth threshold
      val bits = new java.io.ByteArrayOutputStream
      var acc = 0L
      var accBits = 0
      def put(code: Int): Unit = {
        acc |= (code.toLong & 0x1ff) << accBits
        accBits += 9
        while (accBits >= 8) {
          bits.write((acc & 0xff).toInt); acc >>>= 8; accBits -= 8
        }
      }
      put(256) // initial CLEAR
      var i = 0
      while (i < frame.length) {
        put(frame(i) & 0xff)
        i += 1
        if (i % 254 == 0 && i < frame.length) put(256)
      }
      put(257) // EOI
      if (accBits > 0) bits.write((acc & 0xff).toInt)
      val payload = bits.toByteArray
      var off = 0
      while (off < payload.length) { // ≤255-byte sub-blocks
        val n = math.min(255, payload.length - off)
        out.write(n)
        out.write(payload, off, n)
        off += n
      }
      out.write(0) // sub-block terminator
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // ---------------------------------------------------------------- WAV

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /**
   * WAV PCM decode: RIFF/WAVE container, `fmt ` (format 1 = integer PCM,
   * 8- or 16-bit) + `data`. Returns None for float/compressed/extensible
   * formats or malformed containers. 8-bit samples are unsigned per spec
   * and re-centered to -128..127 so both widths share sign conventions.
   */
  def decodeWav(b: Array[Byte]): Option[WavAudio] = {
    if (b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var pos = 12
    var sampleRate, channels, bits = -1
    var dataOff, dataLen = -1
    while (pos + 8 <= b.length && (bits < 0 || dataOff < 0)) {
      val cid = new String(b, pos, 4, "US-ASCII")
      val len = le32(b, pos + 4)
      if (len < 0 || pos + 8L + len > b.length) return None
      cid match {
        case "fmt " =>
          if (len < 16) return None
          val fmt = le16(b, pos + 8)
          if (fmt != 1) return None // integer PCM only
          channels = le16(b, pos + 10)
          sampleRate = le32(b, pos + 12)
          bits = le16(b, pos + 22)
          if (channels <= 0 || sampleRate <= 0 || (bits != 8 && bits != 16)) return None
        case "data" =>
          dataOff = pos + 8; dataLen = len
        case _ => ()
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned; odd sizes pad
    }
    if (bits < 0 || dataOff < 0) return None
    val bytesPer = bits / 8
    val n = dataLen / bytesPer
    val samples = new Array[Int](n)
    var i = 0
    while (i < n) {
      samples(i) =
        if (bits == 8) (b(dataOff + i) & 0xff) - 128
        else le16(b, dataOff + i * 2).toShort.toInt
      i += 1
    }
    Some(WavAudio(sampleRate, channels, bits, samples))
  }

  /** WAV PCM encode (testing + pipeline symmetry): 16-bit integer PCM, or
   * 8-bit unsigned when `bits = 8` (samples then given as −128..127 and
   * stored re-centered, the inverse of [[decodeWav]]'s convention). */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Int],
      bits: Int = 16): Array[Byte] = {
    require(bits == 8 || bits == 16, s"bits=$bits")
    if (bits == 8) return encodeWav8(sampleRate, channels, samples)
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putAscii(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, off)
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    def putLe16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
    }
    putAscii(0, "RIFF"); putLe32(4, 36 + dataLen); putAscii(8, "WAVE")
    putAscii(12, "fmt "); putLe32(16, 16); putLe16(20, 1)
    putLe16(22, channels); putLe32(24, sampleRate)
    putLe32(28, sampleRate * channels * 2) // byte rate
    putLe16(32, channels * 2); putLe16(34, 16) // block align, bits
    putAscii(36, "data"); putLe32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      putLe16(44 + i * 2, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  private def encodeWav8(sampleRate: Int, channels: Int,
      samples: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](44 + samples.length)
    def putAscii(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, off)
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    def putLe16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
    }
    putAscii(0, "RIFF"); putLe32(4, 36 + samples.length); putAscii(8, "WAVE")
    putAscii(12, "fmt "); putLe32(16, 16); putLe16(20, 1)
    putLe16(22, channels); putLe32(24, sampleRate)
    putLe32(28, sampleRate * channels) // byte rate
    putLe16(32, channels); putLe16(34, 8) // block align, bits
    putAscii(36, "data"); putLe32(40, samples.length)
    var i = 0
    while (i < samples.length) {
      out(44 + i) = ((samples(i) + 128) & 0xff).toByte // unsigned per spec
      i += 1
    }
    out
  }
}
