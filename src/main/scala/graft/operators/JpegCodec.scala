package graft.operators

import scala.util.control.NoStackTrace

/**
 * Pure-JVM baseline JPEG codec (ITU-T T.81 sequential DCT, 8-bit): the last
 * "genuinely codec-bound" stub falls. Baseline JPEG needs no external
 * library — the entire pipeline is public-spec byte math:
 *
 *  - marker parsing (§B.2): SOI, APPn/COM skip, DQT (8/16-bit), DHT, SOF0/1,
 *    DRI, SOS, EOI;
 *  - entropy decode (§F.2): canonical Huffman tables rebuilt from DHT
 *    bits/values via MINCODE/MAXCODE/VALPTR, DC prediction + EXTEND,
 *    AC run/size with ZRL and EOB, 0xFF00 byte stuffing, RSTn restart
 *    markers resetting the DC predictors;
 *  - dequantization + zigzag→natural reorder (§A.3.6), separable
 *    double-precision IDCT, level shift + clamp (§A.3.1);
 *  - chroma upsampling by integer index replication and JFIF YCbCr→RGB in
 *    fixed-point integer arithmetic, so every decoded pixel is a
 *    deterministic function of the bytes — replayable by a SQL oracle.
 *
 * Envelope (returns None, never throws, for anything outside it): baseline
 * or extended-sequential Huffman frames (SOF0/SOF1), 8-bit precision, 1 or
 * 3 components in ONE interleaved scan, sampling factors 1..4. Progressive
 * (SOF2), arithmetic coding, 12-bit, multi-scan and hierarchical streams
 * are rejected. Rasters beyond [[MediaCodec.maxDecodedBytes]] are rejected
 * BEFORE allocation — a hostile SOF header must not OOM an executor.
 *
 * The encoder is the test/synthesis twin ([[encodeGray]]/[[encodeYcc]]):
 * forward DCT + the same canonical-Huffman machinery, emitting streams any
 * conformant decoder accepts. With the unit quant table, FLAT 8×8 blocks
 * round-trip bit-exactly (DC = 8·(v−128), all ACs 0, IDCT restores v), which
 * is what lets the `multimodal_jpeg` catalog gate hash-match a closed-form
 * DuckDB replay of the block arithmetic — through real Huffman coding,
 * stuffing, restarts, subsampling and color conversion.
 */
object JpegCodec {

  /** Decoded raster: interleaved row-major, `channels` ∈ {1 (gray), 3 (RGB)}. */
  final case class JpegImage(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  private object Bail extends RuntimeException with NoStackTrace

  private def fail(): Nothing = throw Bail

  /** Zigzag scan order (T.81 Figure A.6): scan position → natural index. */
  private[operators] val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)
  require(zigzag.sorted.sameElements(0 until 64), "zigzag must be a permutation")

  /** Unit quant table: lossless for flat blocks — the oracle gates use it. */
  val unitQuant: Array[Int] = Array.fill(64)(1)

  /** Annex-K example luminance table (natural order) — the conventional
   * "quality 50" table; only affects loss, not conformance. */
  val stdLuminanceQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** libjpeg-convention quality scaling of a base quant table: Q=50 is the
   * table itself, higher quality divides the steps (less loss), lower
   * multiplies them. Entries stay in the 8-bit DQT range [1, 255]. */
  def scaledQuant(base: Array[Int], quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, s"quality=$quality")
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    base.map(v => math.min(255, math.max(1, (v * scale + 50) / 100)))
  }

  val stdChrominanceQuant: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // ------------------------------------------------ Huffman table plumbing

  /** (bits, vals) as they appear in DHT: bits(i) = #codes of length i+1.
   * Both encode and decode build from the same canonical construction, so
   * round-trip correctness needs only a VALID prefix code covering the
   * emitted symbols — conformance of the specific table shapes below is the
   * standard Annex-K set used by libjpeg-class encoders. */
  private final case class HuffSpec(bits: Array[Int], vals: Array[Int]) {
    require(bits.length == 16 && bits.sum == vals.length && vals.distinct.length == vals.length)
  }

  private val dcLumSpec = HuffSpec(
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0), (0 to 11).toArray)
  private val dcChrSpec = HuffSpec(
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0), (0 to 11).toArray)
  private val acLumSpec = HuffSpec(
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d),
    Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
      0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
      0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
      0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
      0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
      0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
      0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
      0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
      0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
      0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
      0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
      0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
      0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
      0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa))
  private val acChrSpec = HuffSpec(
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
    Array(
      0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
      0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
      0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
      0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
      0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
      0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
      0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
      0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
      0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
      0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
      0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
      0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
      0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
      0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa))

  /** Decoder-side table: the T.81 F.2.2.3 DECODE arrays. */
  private final class HuffDecoder(spec: HuffSpec) {
    val minCode = new Array[Int](17)
    val maxCode: Array[Int] = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    val vals: Array[Int] = spec.vals
    private def init(): Unit = {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (spec.bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += spec.bits(l - 1)
          k += spec.bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
      if (code > (1 << 17)) fail() // over-subscribed: not a prefix code
    }
    init()
  }

  /** Encoder-side table: symbol → (code, length). */
  private final class HuffEncoder(spec: HuffSpec) {
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    private def init(): Unit = {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < spec.bits(l - 1)) {
          codeOf(spec.vals(k)) = code
          lenOf(spec.vals(k)) = l
          code += 1; k += 1; i += 1
        }
        code <<= 1
        l += 1
      }
    }
    init()
  }

  // ------------------------------------------------------------ DCT pair

  private val c0 = math.sqrt(0.5)
  /** cosTab(u)(x) = cos((2x+1)·u·π/16) — shared basis for FDCT and IDCT. */
  private val cosTab: Array[Array[Double]] =
    Array.tabulate(8, 8)((u, x) => math.cos((2 * x + 1) * u * math.Pi / 16.0))

  /** Separable inverse DCT of one dequantized block (natural order) into
   * clamped, level-shifted samples. Double precision end to end — strict FP
   * on JVM 17+, so the result is deterministic across executors. */
  private def idctBlock(coef: Array[Double], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: tmp(y,x) = 0.5 Σ_u C(u) coef(y,u) cos[u][x]
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) c0 else 1.0
          s += cu * coef(y * 8 + u) * cosTab(u)(x)
          u += 1
        }
        tmp(y * 8 + x) = 0.5 * s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) { // cols: out(y,x) = clamp(round(0.5 Σ_v C(v) tmp(v,x) cos[v][y]) + 128)
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) c0 else 1.0
          s += cv * tmp(v * 8 + x) * cosTab(v)(yy)
          v += 1
        }
        val px = Math.round(0.5 * s).toInt + 128
        out(yy * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        yy += 1
      }
      x += 1
    }
  }

  /** Forward DCT of one level-shifted block (natural order in, natural out). */
  private def fdctBlock(samples: Array[Int], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) { // rows: tmp(y,u) = 0.5 C(u) Σ_x s(y,x) cos[u][x]
      var y = 0
      while (y < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += (samples(y * 8 + x) - 128) * cosTab(u)(x); x += 1 }
        tmp(y * 8 + u) = 0.5 * (if (u == 0) c0 else 1.0) * s
        y += 1
      }
      u += 1
    }
    var v = 0
    while (v < 8) { // cols: out(v,u) = 0.5 C(v) Σ_y tmp(y,u) cos[v][y]
      var uu = 0
      while (uu < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) { s += tmp(y * 8 + uu) * cosTab(v)(y); y += 1 }
        out(v * 8 + uu) = 0.5 * (if (v == 0) c0 else 1.0) * s
        uu += 1
      }
      v += 1
    }
  }

  // ------------------------------------------------------------- decoder

  private def be16(b: Array[Byte], off: Int): Int = {
    if (off + 1 >= b.length) fail()
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int)

  /** Baseline JPEG pixel decode. None (never throws) outside the envelope. */
  def decodeJpeg(b: Array[Byte]): Option[JpegImage] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    try decodeUnsafe(b) catch { case _: Exception => None }
  }

  private def decodeUnsafe(b: Array[Byte]): Option[JpegImage] = {
    val qt = new Array[Array[Int]](4) // zigzag-order tables
    val dcTabs = new Array[HuffDecoder](4)
    val acTabs = new Array[HuffDecoder](4)
    var width, height = -1
    var comps: Array[Component] = null
    var restartInterval = 0
    var i = 2
    while (true) {
      // any number of 0xFF fill bytes may precede a marker (§B.1.1.2)
      while (i < b.length && (b(i) & 0xff) == 0xff && i + 1 < b.length &&
        (b(i + 1) & 0xff) == 0xff) i += 1
      if (i + 1 >= b.length) return None
      if ((b(i) & 0xff) != 0xff) return None // desynced
      val marker = b(i + 1) & 0xff
      i += 2
      marker match {
        case 0xd9 => return None // EOI before any scan
        case 0x01 => () // TEM: standalone
        case m if m >= 0xd0 && m <= 0xd7 => () // stray RST: standalone
        case 0xdb => // DQT: repeated (pq|tq, 64 values)
          val len = be16(b, i)
          val end = i + len
          var p = i + 2
          while (p < end) {
            val pq = (b(p) & 0xff) >> 4
            val tq = b(p) & 0x0f
            if (tq > 3 || pq > 1) fail()
            p += 1
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) {
              t(k) = if (pq == 0) b(p) & 0xff else be16(b, p)
              if (t(k) == 0) fail()
              p += (if (pq == 0) 1 else 2)
              k += 1
            }
            qt(tq) = t
          }
          i = end
        case 0xc4 => // DHT: repeated (tc|th, bits[16], vals)
          val len = be16(b, i)
          val end = i + len
          var p = i + 2
          while (p < end) {
            val tc = (b(p) & 0xff) >> 4
            val th = b(p) & 0x0f
            if (tc > 1 || th > 3) fail()
            p += 1
            val bits = Array.tabulate(16)(k => b(p + k) & 0xff)
            p += 16
            val n = bits.sum
            if (n > 256 || p + n > end) fail()
            val vals = Array.tabulate(n)(k => b(p + k) & 0xff)
            p += n
            val dec = new HuffDecoder(HuffSpec(bits, vals))
            if (tc == 0) dcTabs(th) = dec else acTabs(th) = dec
          }
          i = end
        case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 extended sequential
          val len = be16(b, i)
          val precision = b(i + 2) & 0xff
          height = be16(b, i + 3)
          width = be16(b, i + 5)
          val nc = b(i + 7) & 0xff
          if (precision != 8 || width <= 0 || height <= 0 || (nc != 1 && nc != 3)) return None
          comps = Array.tabulate(nc) { k =>
            val o = i + 8 + 3 * k
            val c = Component(b(o) & 0xff, (b(o + 1) & 0xff) >> 4, b(o + 1) & 0x0f, b(o + 2) & 0xff)
            if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3) fail()
            c
          }
          i += len
        case m if m == 0xc2 || (m >= 0xc3 && m <= 0xcf && m != 0xc4 && m != 0xc8) =>
          return None // progressive / arithmetic / hierarchical: out of envelope
        case 0xdd => // DRI
          restartInterval = be16(b, i + 2)
          i += be16(b, i)
        case 0xda => // SOS — decode the single interleaved scan and finish
          if (comps == null) fail()
          val len = be16(b, i)
          val ns = b(i + 2) & 0xff
          if (ns != comps.length) return None // multi-scan: out of envelope
          val scanDc = new Array[HuffDecoder](ns)
          val scanAc = new Array[HuffDecoder](ns)
          val order = new Array[Component](ns)
          var k = 0
          while (k < ns) {
            val cs = b(i + 3 + 2 * k) & 0xff
            val td = (b(i + 4 + 2 * k) & 0xff) >> 4
            val ta = b(i + 4 + 2 * k) & 0x0f
            val comp = comps.find(_.id == cs).getOrElse(fail())
            order(k) = comp
            scanDc(k) = dcTabs(td); scanAc(k) = acTabs(ta)
            if (scanDc(k) == null || scanAc(k) == null || qt(comp.tq) == null) fail()
            k += 1
          }
          val ss = b(i + 3 + 2 * ns) & 0xff
          val se = b(i + 4 + 2 * ns) & 0xff
          val ahl = b(i + 5 + 2 * ns) & 0xff
          if (ss != 0 || se != 63 || ahl != 0) return None // not sequential
          return decodeScan(b, i + len, width, height, order, scanDc, scanAc,
            order.map(c => qt(c.tq)), restartInterval)
        case _ => // APPn, COM, anything else with a length: skip
          val len = be16(b, i)
          if (len < 2) fail()
          i += len
      }
    }
    None
  }

  private def decodeScan(b: Array[Byte], start: Int, width: Int, height: Int,
      comps: Array[Component], dcT: Array[HuffDecoder], acT: Array[HuffDecoder],
      qts: Array[Array[Int]], restartInterval: Int): Option[JpegImage] = {
    val nc = comps.length
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    // size caps BEFORE allocation: padded planes + the output raster
    var planeBytes = 0L
    comps.foreach { c => planeBytes += mcusX.toLong * 8 * c.h * mcusY * 8 * c.v }
    if (planeBytes + width.toLong * height * nc > MediaCodec.maxDecodedBytes) return None
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planes = comps.map(c => new Array[Byte](mcusX * 8 * c.h * mcusY * 8 * c.v))
    val pred = new Array[Int](nc)
    val coef = new Array[Double](64)
    val blockOut = new Array[Int](64)

    // --- bit reader over the entropy segment (MSB-first, 0xFF00 stuffing)
    var pos = start
    var acc = 0
    var accBits = 0
    def nextBit(): Int = {
      if (accBits == 0) {
        if (pos >= b.length) fail()
        val v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          if (pos >= b.length) fail()
          if ((b(pos) & 0xff) != 0x00) fail() // a marker mid-entropy: error here
          pos += 1
        }
        acc = v; accBits = 8
      }
      accBits -= 1
      (acc >> accBits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) { v = (v << 1) | nextBit(); k += 1 }
      v
    }
    def extend(v: Int, s: Int): Int =
      if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    def decodeSym(t: HuffDecoder): Int = {
      var code = nextBit()
      var l = 1
      while (l <= 16) {
        if (code <= t.maxCode(l)) return t.vals(t.valPtr(l) + code - t.minCode(l))
        code = (code << 1) | nextBit()
        l += 1
      }
      fail()
    }
    def expectRst(n: Int): Unit = { // byte-align, then the RST marker itself
      accBits = 0
      if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff ||
        (b(pos + 1) & 0xff) != (0xd0 + n)) fail()
      pos += 2
      java.util.Arrays.fill(pred, 0)
    }

    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0)
        expectRst((mcu / restartInterval - 1) % 8)
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < nc) {
        val c = comps(ci)
        val q = qts(ci)
        var v0 = 0
        while (v0 < c.v) {
          var h0 = 0
          while (h0 < c.h) {
            // one block: DC then ACs, dequantized into natural order
            java.util.Arrays.fill(coef, 0.0)
            val s = decodeSym(dcT(ci))
            if (s > 11) fail()
            pred(ci) += extend(receive(s), s)
            coef(0) = pred(ci).toDouble * q(0)
            var k = 1
            var done = false
            while (!done && k < 64) {
              val rs = decodeSym(acT(ci))
              val r = rs >> 4
              val sz = rs & 0x0f
              if (sz == 0) {
                if (r == 15) k += 16 // ZRL
                else done = true // EOB
              } else {
                k += r
                if (k > 63) fail()
                coef(zigzag(k)) = extend(receive(sz), sz).toDouble * q(k)
                k += 1
              }
            }
            idctBlock(coef, blockOut)
            val bx = mx * 8 * c.h + 8 * h0
            val by = my * 8 * c.v + 8 * v0
            val pw = planeW(ci)
            val plane = planes(ci)
            var yy = 0
            while (yy < 8) {
              var xx = 0
              val rowOff = (by + yy) * pw + bx
              while (xx < 8) {
                plane(rowOff + xx) = blockOut(yy * 8 + xx).toByte
                xx += 1
              }
              yy += 1
            }
            h0 += 1
          }
          v0 += 1
        }
        ci += 1
      }
      mcu += 1
    }

    // --- upsample + color convert into the output raster
    val out = new Array[Byte](width * height * nc)
    if (nc == 1) {
      val pw = planeW(0)
      var y = 0
      while (y < height) {
        System.arraycopy(planes(0), y * pw, out, y * width, width)
        y += 1
      }
    } else {
      val c0c = comps(0); val c1c = comps(1); val c2c = comps(2)
      val p0 = planes(0); val p1 = planes(1); val p2 = planes(2)
      val w0 = planeW(0); val w1 = planeW(1); val w2 = planeW(2)
      var y = 0
      while (y < height) {
        val y0 = y * c0c.v / vmax; val y1 = y * c1c.v / vmax; val y2 = y * c2c.v / vmax
        var x = 0
        while (x < width) {
          val lum = p0(y0 * w0 + x * c0c.h / hmax) & 0xff
          val cb = (p1(y1 * w1 + x * c1c.h / hmax) & 0xff) - 128
          val cr = (p2(y2 * w2 + x * c2c.h / hmax) & 0xff) - 128
          val o = (y * width + x) * 3
          out(o) = clamp8(lum + ((91881 * cr + 32768) >> 16))
          out(o + 1) = clamp8(lum - ((22554 * cb + 46802 * cr + 32768) >> 16))
          out(o + 2) = clamp8(lum + ((116130 * cb + 32768) >> 16))
          x += 1
        }
        y += 1
      }
    }
    Some(JpegImage(width, height, nc, out))
  }

  private def clamp8(v: Int): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  // ------------------------------------------------------------- encoder

  /** One component going into [[encodeBaseline]]: a plane of unsigned bytes
   * at its own (subsampled) resolution `ceil(w·h/hmax) × ceil(h·v/vmax)`,
   * edge-replicated to block/MCU boundaries at encode time. */
  final case class EncComponent(plane: Array[Byte], h: Int, v: Int,
      qtId: Int, dcId: Int, acId: Int)

  /** Grayscale baseline encode. `quant` is natural-order, 1..255 each. */
  def encodeGray(width: Int, height: Int, pixels: Array[Byte],
      quant: Array[Int] = unitQuant, restartInterval: Int = 0): Array[Byte] = {
    require(pixels.length == width * height, "plane size mismatch")
    encodeBaseline(width, height,
      Array(EncComponent(pixels, 1, 1, 0, 0, 0)),
      Array(quant), restartInterval)
  }

  /** YCbCr baseline encode with explicit sampling factors (yH/yV ∈ {1,2}):
   * (2,2) = 4:2:0, (2,1) = 4:2:2, (1,1) = 4:4:4. Chroma planes must be
   * `ceil(w/yH) × ceil(h/yV)`. */
  def encodeYcc(width: Int, height: Int, yPlane: Array[Byte],
      cbPlane: Array[Byte], crPlane: Array[Byte], yH: Int = 2, yV: Int = 2,
      lumQuant: Array[Int] = unitQuant, chrQuant: Array[Int] = unitQuant,
      restartInterval: Int = 0): Array[Byte] = {
    require(yH >= 1 && yH <= 2 && yV >= 1 && yV <= 2)
    require(yPlane.length == width * height, "luma plane size mismatch")
    val cw = (width + yH - 1) / yH
    val ch = (height + yV - 1) / yV
    require(cbPlane.length == cw * ch && crPlane.length == cw * ch, "chroma plane size mismatch")
    encodeBaseline(width, height,
      Array(EncComponent(yPlane, yH, yV, 0, 0, 0),
        EncComponent(cbPlane, 1, 1, 1, 1, 1),
        EncComponent(crPlane, 1, 1, 1, 1, 1)),
      Array(lumQuant, chrQuant), restartInterval)
  }

  private def encodeBaseline(width: Int, height: Int, comps: Array[EncComponent],
      quants: Array[Array[Int]], restartInterval: Int): Array[Byte] = {
    require(width > 0 && height > 0 && width < 65536 && height < 65536)
    quants.foreach(q => require(q.length == 64 && q.forall(v => v >= 1 && v <= 255)))
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val out = new java.io.ByteArrayOutputStream
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int): Unit = { w8(0xff); w8(m) }

    marker(0xd8) // SOI
    // APP0 / JFIF 1.01, no thumbnail
    marker(0xe0); w16(16)
    out.write("JFIF".getBytes("US-ASCII")); w8(0)
    w8(1); w8(1); w8(0); w16(1); w16(1); w8(0); w8(0)
    // DQT: all tables in one marker, 8-bit precision, zigzag order
    marker(0xdb); w16(2 + 65 * quants.length)
    quants.zipWithIndex.foreach { case (q, tq) =>
      w8(tq)
      var k = 0
      while (k < 64) { w8(q(zigzag(k))); k += 1 }
    }
    // SOF0
    marker(0xc0); w16(8 + 3 * comps.length)
    w8(8); w16(height); w16(width); w8(comps.length)
    comps.zipWithIndex.foreach { case (c, k) =>
      w8(k + 1); w8((c.h << 4) | c.v); w8(c.qtId)
    }
    // DHT: the tables the components reference
    val specs: Seq[(Int, Int, HuffSpec)] =
      if (comps.length == 1) Seq((0, 0, dcLumSpec), (1, 0, acLumSpec))
      else Seq((0, 0, dcLumSpec), (1, 0, acLumSpec), (0, 1, dcChrSpec), (1, 1, acChrSpec))
    marker(0xc4); w16(2 + specs.map(s => 17 + s._3.vals.length).sum)
    specs.foreach { case (tc, th, spec) =>
      w8((tc << 4) | th)
      spec.bits.foreach(w8)
      spec.vals.foreach(w8)
    }
    if (restartInterval > 0) { marker(0xdd); w16(4); w16(restartInterval) }
    // SOS
    marker(0xda); w16(6 + 2 * comps.length)
    w8(comps.length)
    comps.zipWithIndex.foreach { case (c, k) => w8(k + 1); w8((c.dcId << 4) | c.acId) }
    w8(0); w8(63); w8(0)

    // --- entropy-coded segment
    val dcEnc = Array(new HuffEncoder(dcLumSpec), new HuffEncoder(dcChrSpec))
    val acEnc = Array(new HuffEncoder(acLumSpec), new HuffEncoder(acChrSpec))
    var acc = 0L
    var accBits = 0
    def putBits(code: Int, len: Int): Unit = {
      if (len == 0) return
      acc = (acc << len) | (code & ((1L << len) - 1))
      accBits += len
      while (accBits >= 8) {
        val v = ((acc >> (accBits - 8)) & 0xff).toInt
        w8(v)
        if (v == 0xff) w8(0) // byte stuffing
        accBits -= 8
      }
    }
    def flushBits(): Unit = { // pad with 1s to the byte boundary
      if (accBits > 0) putBits((1 << (8 - accBits)) - 1, 8 - accBits)
    }
    def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))
    def putCoded(enc: HuffEncoder, sym: Int): Unit = {
      require(enc.lenOf(sym) > 0, s"no Huffman code for symbol $sym")
      putBits(enc.codeOf(sym), enc.lenOf(sym))
    }
    def putAmplitude(v: Int, s: Int): Unit =
      putBits(if (v < 0) v + (1 << s) - 1 else v, s)

    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    val pred = new Array[Int](comps.length)
    val samples = new Array[Int](64)
    val freq = new Array[Double](64)
    val planeDims = comps.map { c =>
      ((width * c.h + hmax - 1) / hmax, (height * c.v + vmax - 1) / vmax)
    }
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        flushBits()
        marker(0xd0 + ((mcu / restartInterval - 1) % 8))
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val (cw, chh) = planeDims(ci)
        val q = quants(c.qtId)
        val dcT = dcEnc(c.dcId); val acT = acEnc(c.acId)
        var v0 = 0
        while (v0 < c.v) {
          var h0 = 0
          while (h0 < c.h) {
            val bx = mx * 8 * c.h + 8 * h0
            val by = my * 8 * c.v + 8 * v0
            var yy = 0
            while (yy < 8) { // edge-replicated block gather
              val sy = math.min(by + yy, chh - 1)
              var xx = 0
              while (xx < 8) {
                samples(yy * 8 + xx) = c.plane(sy * cw + math.min(bx + xx, cw - 1)) & 0xff
                xx += 1
              }
              yy += 1
            }
            fdctBlock(samples, freq)
            // DC
            val dc = Math.round(freq(0) / q(0)).toInt
            val diff = dc - pred(ci)
            pred(ci) = dc
            val s = category(diff)
            putCoded(dcT, s)
            putAmplitude(diff, s)
            // ACs in zigzag order with run-lengths
            var run = 0
            var k = 1
            while (k < 64) {
              // scan position k holds coefficient zigzag(k); its quant step
              // is q(zigzag(k)) — the SAME natural-order entry the DQT
              // writer emits at position k and the decoder dequantizes with
              // baseline amplitudes are 10-bit: clamp the rare ±1024 corner
              val vq0 = Math.round(freq(zigzag(k)) / q(zigzag(k))).toInt
              val vq = if (vq0 > 1023) 1023 else if (vq0 < -1023) -1023 else vq0
              if (vq == 0) run += 1
              else {
                while (run >= 16) { putCoded(acT, 0xf0); run -= 16 } // ZRL
                val sz = category(vq)
                putCoded(acT, (run << 4) | sz)
                putAmplitude(vq, sz)
                run = 0
              }
              k += 1
            }
            if (run > 0) putCoded(acT, 0x00) // EOB
            h0 += 1
          }
          v0 += 1
        }
        ci += 1
      }
      mcu += 1
    }
    flushBits()
    marker(0xd9) // EOI
    out.toByteArray
  }
}
