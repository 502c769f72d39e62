package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.JpegCodec
import graft.operators.JpegCodec.JpegImage

/**
 * Baseline JPEG codec: encode→decode round trips, exactness guarantees on
 * flat blocks (the property the `multimodal_jpeg` oracle builds on),
 * bounded loss on smooth/noisy content, restart markers, byte stuffing,
 * subsampling modes, and hostile-input rejection (None, never a throw).
 */
class JpegCodecSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] =
    Array.tabulate(w * h)(i => f(i % w, i / w).toByte)

  private def maxAbsDiff(a: Array[Byte], b: Array[Byte]): Int = {
    require(a.length == b.length)
    a.indices.foldLeft(0)((m, i) => math.max(m, math.abs((a(i) & 0xff) - (b(i) & 0xff))))
  }

  // ---- flat blocks: the exactness contract behind the catalog oracle

  test("flat 8x8 blocks round-trip EXACTLY with the unit quant table") {
    for ((w, h, ri) <- Seq((16, 8, 0), (24, 16, 2), (32, 8, 1))) {
      val px = gray(w, h)((x, y) => (17 + 11 * (x / 8) + 23 * (y / 8)) % 256)
      val img = JpegCodec.decodeJpeg(
        JpegCodec.encodeGray(w, h, px, restartInterval = ri)).get
      assert(img.width === w && img.height === h && img.channels === 1)
      assert(img.pixels.sameElements(px), s"w=$w h=$h ri=$ri")
    }
  }

  test("flat blocks at non-multiple-of-8 dims are exact in the visible region") {
    // one flat value per image so edge replication pads with the same value
    for ((w, h) <- Seq((10, 6), (17, 9), (8, 5))) {
      val px = gray(w, h)((_, _) => 77)
      val img = JpegCodec.decodeJpeg(JpegCodec.encodeGray(w, h, px)).get
      assert(img.width === w && img.height === h)
      assert(img.pixels.sameElements(px))
    }
  }

  test("flat 4:2:0 color is exact through subsampling and YCbCr->RGB") {
    val w = 24; val h = 8
    val yP = gray(w, h)((x, y) => (40 + 11 * (x / 8) + 23 * (y / 8)) % 256)
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val cb = 77; val cr = 200
    val img = JpegCodec.decodeJpeg(JpegCodec.encodeYcc(w, h, yP,
      Array.fill(cw * ch)(cb.toByte), Array.fill(cw * ch)(cr.toByte))).get
    assert(img.channels === 3)
    // independent replay of the decoder's documented fixed-point formula
    val offR = (91881 * (cr - 128) + 32768) >> 16
    val offG = -((22554 * (cb - 128) + 46802 * (cr - 128) + 32768) >> 16)
    val offB = (116130 * (cb - 128) + 32768) >> 16
    def clamp(v: Int) = math.max(0, math.min(255, v))
    for (y <- 0 until h; x <- 0 until w) {
      val lum = yP(y * w + x) & 0xff
      val o = (y * w + x) * 3
      assert((img.pixels(o) & 0xff) === clamp(lum + offR), s"R at ($x,$y)")
      assert((img.pixels(o + 1) & 0xff) === clamp(lum + offG), s"G at ($x,$y)")
      assert((img.pixels(o + 2) & 0xff) === clamp(lum + offB), s"B at ($x,$y)")
    }
  }

  // ---- bounded loss on non-flat content (unit quant: error <= rounding)

  test("gradient round-trips within 1 with the unit quant table") {
    val w = 40; val h = 24
    val px = gray(w, h)((x, y) => (x * 5 + y * 3) % 256)
    val img = JpegCodec.decodeJpeg(JpegCodec.encodeGray(w, h, px)).get
    assert(maxAbsDiff(img.pixels, px) <= 1)
  }

  test("seeded noise round-trips within 4 with the unit quant table") {
    val rnd = new scala.util.Random(42)
    val w = 32; val h = 32
    val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
    val img = JpegCodec.decodeJpeg(JpegCodec.encodeGray(w, h, px)).get
    assert(maxAbsDiff(img.pixels, px) <= 4)
  }

  test("std quant tables decode fine; smooth content mean error stays small") {
    val w = 48; val h = 32
    val px = gray(w, h)((x, y) => 128 + (40 * math.sin(x / 8.0) + 30 * math.cos(y / 6.0)).toInt)
    val img = JpegCodec.decodeJpeg(JpegCodec.encodeGray(w, h, px,
      quant = JpegCodec.stdLuminanceQuant)).get
    val meanErr = px.indices.map(i => math.abs((px(i) & 0xff) - (img.pixels(i) & 0xff))).sum / px.length.toDouble
    assert(meanErr < 4.0, s"meanErr=$meanErr")
  }

  test("4:2:2 and 4:4:4 color round-trip within 2 on smooth planes (unit quant)") {
    val w = 20; val h = 12
    val yP = gray(w, h)((x, y) => 30 + x * 6 + y * 2)
    for ((yH, yV) <- Seq((2, 1), (1, 1))) {
      val cw = (w + yH - 1) / yH; val ch = (h + yV - 1) / yV
      val cbP = Array.tabulate(cw * ch)(i => (100 + i % 20).toByte)
      val crP = Array.tabulate(cw * ch)(i => (150 - i % 15).toByte)
      val img = JpegCodec.decodeJpeg(
        JpegCodec.encodeYcc(w, h, yP, cbP, crP, yH, yV)).get
      assert(img.width === w && img.height === h && img.channels === 3)
      // luma recoverable from RGB: the conversion is invertible up to rounding
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        val lum = (299 * (img.pixels(o) & 0xff) + 587 * (img.pixels(o + 1) & 0xff) +
          114 * (img.pixels(o + 2) & 0xff)) / 1000
        assert(math.abs(lum - (yP(y * w + x) & 0xff)) <= 3, s"(${yH},${yV}) at ($x,$y)")
      }
    }
  }

  // ---- entropy-layer mechanics

  test("byte stuffing occurs and decodes transparently") {
    // noise across many blocks makes an unstuffed 0xFF near-certain
    val rnd = new scala.util.Random(7)
    val w = 64; val h = 64
    val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
    val enc = JpegCodec.encodeGray(w, h, px)
    val hasStuffed = enc.sliding(2).exists(p => (p(0) & 0xff) == 0xff && p(1) == 0x00)
    assert(hasStuffed, "encoded stream never needed byte stuffing — weak test input")
    assert(JpegCodec.decodeJpeg(enc).isDefined)
  }

  test("restart markers are emitted on DRI and consumed; result matches no-DRI") {
    val px = gray(32, 24)((x, y) => (x * 7 + y * 13) % 256)
    val plain = JpegCodec.decodeJpeg(JpegCodec.encodeGray(32, 24, px)).get
    val enc = JpegCodec.encodeGray(32, 24, px, restartInterval = 1)
    val hasRst = enc.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7)
    assert(hasRst)
    val restarted = JpegCodec.decodeJpeg(enc).get
    assert(restarted.pixels.sameElements(plain.pixels))
  }

  // ---- rejection envelope: None, never a throw

  test("every truncation prefix returns None without throwing") {
    val enc = JpegCodec.encodeGray(16, 16, gray(16, 16)((x, y) => x * y % 256))
    // prefixes cutting real entropy data (not just trailing pad bits / EOI)
    // must fail; every prefix must return instead of throwing
    (2 until enc.length by 3).foreach { k =>
      val r = JpegCodec.decodeJpeg(java.util.Arrays.copyOf(enc, k))
      if (k < enc.length - 4) assert(r.isEmpty, s"prefix $k of ${enc.length} decoded")
    }
  }

  test("progressive (SOF2) and arithmetic (SOF9) frames are rejected") {
    val enc = JpegCodec.encodeGray(8, 8, gray(8, 8)((_, _) => 5))
    for (sof <- Seq(0xc2, 0xc9)) {
      val mut = enc.clone()
      val at = mut.indices.dropWhile(i => !((mut(i) & 0xff) == 0xff && (mut(i + 1) & 0xff) == 0xc0)).head
      mut(at + 1) = sof.toByte
      assert(JpegCodec.decodeJpeg(mut).isEmpty, f"SOF marker $sof%02x")
    }
  }

  test("hostile SOF dims bounce off the size cap before allocation") {
    // craft: SOI, minimal DQT/DHT-free path — a huge SOF0 then SOS
    val enc = JpegCodec.encodeGray(8, 8, gray(8, 8)((_, _) => 5))
    val at = enc.indices.dropWhile(i => !((enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xc0)).head
    val mut = enc.clone()
    // height/width at SOF payload offsets +3/+5 (after len u16 + precision)
    mut(at + 5) = 0xff.toByte; mut(at + 6) = 0xff.toByte // height 65535
    mut(at + 7) = 0xff.toByte; mut(at + 8) = 0xff.toByte // width 65535
    val t0 = System.nanoTime()
    assert(JpegCodec.decodeJpeg(mut).isEmpty)
    assert((System.nanoTime() - t0) < 2e9, "rejection must not attempt the decode")
  }

  test("garbage and bit-flip corpora neither throw nor hang") {
    val rnd = new scala.util.Random(11)
    assert(JpegCodec.decodeJpeg(Array.fill(200)(rnd.nextInt(256).toByte)).isEmpty)
    val enc = JpegCodec.encodeGray(16, 8, gray(16, 8)((x, y) => (x + y) % 256))
    (0 until enc.length by 5).foreach { i =>
      val mut = enc.clone()
      mut(i) = (mut(i) ^ (1 << (i % 8))).toByte
      JpegCodec.decodeJpeg(mut) match {
        case Some(img) => assert(img.pixels.length === img.width * img.height * img.channels)
        case None => ()
      }
    }
  }

  test("16-bit DQT precision is accepted") {
    // rewrite the 8-bit DQT of a valid stream into pq=1 (16-bit entries)
    val px = gray(16, 8)((x, y) => (31 + 5 * (x / 8)) % 256)
    val enc = JpegCodec.encodeGray(16, 8, px)
    val at = enc.indices.dropWhile(i => !((enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xdb)).head
    val before = enc.take(at)
    val lenOld = ((enc(at + 2) & 0xff) << 8) | (enc(at + 3) & 0xff)
    val tableVals = enc.slice(at + 5, at + 5 + 64) // after len + pq|tq byte
    val after = enc.drop(at + 2 + lenOld)
    val wide = new java.io.ByteArrayOutputStream
    wide.write(before); wide.write(0xff); wide.write(0xdb)
    val newLen = 2 + 1 + 128
    wide.write(newLen >> 8); wide.write(newLen & 0xff)
    wide.write(0x10) // pq=1, tq=0
    tableVals.foreach { v => wide.write(0); wide.write(v & 0xff) }
    wide.write(after)
    val img = JpegCodec.decodeJpeg(wide.toByteArray).get
    assert(img.pixels.sameElements(px))
  }
}
