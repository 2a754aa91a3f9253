package graft.multimodal

/** Independent baseline-JPEG decoder — the second-decoder differential
  * pin for the lossy image leg (round-7 verdict #7).
  *
  * `mm_image_jpeg` audits a codec DuckDB cannot run, so its oracle story
  * was a spec pin only. This decoder closes the gap: a from-scratch
  * implementation of baseline sequential DCT decoding (ITU-T T.81 §F.2)
  * for the single-component grayscale JFIF streams the engine's encoder
  * emits — marker parse, DQT/DHT table build, Huffman entropy decode
  * with byte unstuffing, dequantize, de-zigzag, reference float IDCT
  * (T.81 Annex A.3.3), level shift. It shares NO code with
  * `javax.imageio`; agreement between the two decoders on every image is
  * a machine-checked differential verdict, not a replay of either
  * implementation against itself.
  *
  * Scope (checked, None otherwise): baseline SOF0, 8-bit precision, one
  * component, 1×1 sampling — exactly what
  * [[Multimodal.packJpegBytes]] produces for TYPE_BYTE_GRAY input.
  * Restart markers are supported (the encoder doesn't emit them, but a
  * real-corpus JPEG might). Progressive/multi-component streams are out
  * of scope and return None.
  *
  * Decoded samples may legitimately differ from ImageIO's by ±1: T.81
  * does not mandate a bit-exact IDCT, only Annex A accuracy bounds, and
  * ImageIO uses its own fixed-point kernel. The verdict therefore pins a
  * per-sample |diff| bound and an aHash Hamming bound rather than byte
  * equality.
  */
object JpegBaseline {

  final case class GrayImage(width: Int, height: Int, samples: Array[Int])

  private val Zigzag: Array[Int] = Array(
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16) · C(u)/2, precomputed for the reference IDCT. */
  private val CosTable: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = 0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    t
  }

  /** Canonical Huffman decoding table (T.81 §C.2/F.2.2.3). */
  private final class HuffTable(bits: Array[Int], huffval: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    val values: Array[Int] = huffval
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  /** Entropy-coded-segment bit reader with 0xFF00 unstuffing; positions
    * itself past RSTn markers on `restart()`.
    */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var hitMarker = false

    def nextBit(): Int = {
      if (nBits == 0) {
        if (pos >= data.length) { hitMarker = true; return 0 }
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          val b2 = if (pos < data.length) data(pos) & 0xff else 0xd9
          if (b2 == 0x00) pos += 1 // stuffed literal 0xFF
          else { hitMarker = true; pos -= 1; b = 0 } // marker: stop feeding
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }

    /** Skip to just after the next RSTn marker and clear bit state. */
    def restart(): Boolean = {
      nBits = 0; hitMarker = false
      while (pos + 1 < data.length) {
        if ((data(pos) & 0xff) == 0xff) {
          val m = data(pos + 1) & 0xff
          if (m >= 0xd0 && m <= 0xd7) { pos += 2; return true }
          if (m == 0xd9) return false
        }
        pos += 1
      }
      false
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private def huffDecode(br: BitReader, tbl: HuffTable): Int = {
    var code = br.nextBit()
    var l = 1
    while (l <= 16 && (tbl.maxCode(l) < 0 || code > tbl.maxCode(l))) {
      code = (code << 1) | br.nextBit()
      l += 1
    }
    if (l > 16) throw new IllegalStateException("bad huffman code")
    tbl.values(tbl.valPtr(l) + code - tbl.minCode(l))
  }

  /** Reference 2-D IDCT (T.81 A.3.3), direct double-precision sum —
    * 4096 multiplies per block; the images this leg audits are 2×2
    * blocks each, so clarity beats a fast kernel here.
    */
  private def idctBlock(coef: Array[Int], out: Array[Int]): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cy = CosTable(v * 8 + y)
          var u = 0
          while (u < 8) {
            val c = coef(v * 8 + u)
            if (c != 0) s += CosTable(u * 8 + x) * cy * c
            u += 1
          }
          v += 1
        }
        val px = math.round(s).toInt + 128
        out(y * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        x += 1
      }
      y += 1
    }
  }

  private def u16(d: Array[Byte], p: Int): Int =
    ((d(p) & 0xff) << 8) | (d(p + 1) & 0xff)

  /** Decode a baseline single-component JPEG; None for anything outside
    * the supported scope or any malformed stream (quarantine contract —
    * never throws).
    */
  def decodeGray(data: Array[Byte]): Option[GrayImage] =
    try decodeGrayUnsafe(data)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeGrayUnsafe(data: Array[Byte]): Option[GrayImage] = {
    if (data.length < 4 || (data(0) & 0xff) != 0xff || (data(1) & 0xff) != 0xd8)
      return None
    val qTables = new Array[Array[Int]](4) // zigzag order
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var width = 0
    var height = 0
    var qSel = -1
    var restartInterval = 0
    var p = 2
    while (p + 3 < data.length) {
      if ((data(p) & 0xff) != 0xff) return None
      val marker = data(p + 1) & 0xff
      if (marker == 0xd8) { p += 2 }
      else if (marker == 0xd9) { return None } // EOI before SOS
      else {
        val len = u16(data, p + 2)
        val seg = p + 4
        marker match {
          case 0xdb => // DQT: one or more tables
            var q = seg
            while (q < p + 2 + len) {
              val pq = (data(q) & 0xff) >> 4
              val tq = data(q) & 0x0f
              val tbl = new Array[Int](64)
              var i = 0
              if (pq == 0) { while (i < 64) { tbl(i) = data(q + 1 + i) & 0xff; i += 1 }; q += 65 }
              else { while (i < 64) { tbl(i) = u16(data, q + 1 + 2 * i); i += 1 }; q += 129 }
              qTables(tq) = tbl
            }
          case 0xc4 => // DHT: one or more tables
            var q = seg
            while (q < p + 2 + len) {
              val tc = (data(q) & 0xff) >> 4
              val th = data(q) & 0x0f
              val bits = new Array[Int](16)
              var n = 0
              var i = 0
              while (i < 16) { bits(i) = data(q + 1 + i) & 0xff; n += bits(i); i += 1 }
              val vals = new Array[Int](n)
              i = 0
              while (i < n) { vals(i) = data(q + 17 + i) & 0xff; i += 1 }
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcTables(th) = t else acTables(th) = t
              q += 17 + n
            }
          case 0xc0 => // SOF0 baseline
            if ((data(seg) & 0xff) != 8) return None // precision
            height = u16(data, seg + 1)
            width = u16(data, seg + 3)
            if ((data(seg + 5) & 0xff) != 1) return None // components
            if ((data(seg + 7) & 0xff) != 0x11) return None // 1×1 sampling
            qSel = data(seg + 8) & 0xff
          case m if m >= 0xc1 && m <= 0xcf && m != 0xc4 && m != 0xc8 =>
            return None // any non-baseline SOF
          case 0xdd => restartInterval = u16(data, seg)
          case 0xda => // SOS: decode the scan and finish
            if ((data(seg) & 0xff) != 1 || width <= 0 || height <= 0) return None
            val td = (data(seg + 2) & 0xff) >> 4
            val ta = data(seg + 2) & 0x0f
            val dc = dcTables(td)
            val ac = acTables(ta)
            val qt = qTables(qSel)
            if (dc == null || ac == null || qt == null) return None
            val br = new BitReader(data, p + 2 + len)
            val bw = (width + 7) / 8
            val bh = (height + 7) / 8
            val out = new Array[Int](width * height)
            val zz = new Array[Int](64)
            val blk = new Array[Int](64)
            val px = new Array[Int](64)
            var pred = 0
            var mcu = 0
            var by = 0
            while (by < bh) {
              var bx = 0
              while (bx < bw) {
                if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
                  if (!br.restart()) return None
                  pred = 0
                }
                java.util.Arrays.fill(zz, 0)
                val t = huffDecode(br, dc)
                pred += extend(br.receive(t), t)
                zz(0) = pred
                var k = 1
                var done = false
                while (!done && k < 64) {
                  val rs = huffDecode(br, ac)
                  val r = rs >> 4
                  val s0 = rs & 0x0f
                  if (s0 == 0) {
                    if (r == 15) k += 16 else done = true // ZRL vs EOB
                  } else {
                    k += r
                    if (k > 63) return None
                    zz(k) = extend(br.receive(s0), s0)
                    k += 1
                  }
                }
                var i = 0
                while (i < 64) { blk(Zigzag(i)) = zz(i) * qt(i); i += 1 }
                idctBlock(blk, px)
                var yy = 0
                while (yy < 8) {
                  val ay = by * 8 + yy
                  if (ay < height) {
                    var xx = 0
                    while (xx < 8) {
                      val axx = bx * 8 + xx
                      if (axx < width) out(ay * width + axx) = px(yy * 8 + xx)
                      xx += 1
                    }
                  }
                  yy += 1
                }
                mcu += 1
                bx += 1
              }
              by += 1
            }
            return Some(GrayImage(width, height, out))
          case _ => () // APPn/COM/etc: skip
        }
        if (marker != 0xda) p += 2 + len
        else p = data.length // unreachable (SOS returns) — safety
      }
    }
    None
  }
}
