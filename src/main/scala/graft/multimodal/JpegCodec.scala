package graft.multimodal

import org.apache.spark.sql.{Dataset, Encoders}

/** Baseline JFIF (JPEG) codec — the full ITU T.81 baseline pipeline:
  * RGB→YCbCr, 4:2:0 chroma subsampling, 8×8 integer FDCT, Annex-K
  * quantization + Huffman tables, zigzag run-length entropy coding
  * with byte stuffing, and the complete marker structure (SOI, APP0,
  * DQT×2, SOF0, DHT×4, SOS, EOI). The decoder re-parses everything
  * from the FILE (tables from DQT/DHT, geometry from SOF0): Huffman
  * decode, dequant, integer IDCT, chroma upsample, YCbCr→RGB.
  *
  * Exactness contract (the px_md5 oracle): the LOSSY math (color
  * transform, subsample, FDCT→quant→dequant→IDCT, all in truncating
  * integer arithmetic over the 8192-scaled DCT basis of
  * [[FrameFeatures.dctBasis]]) is replayed by the DuckDB oracle from
  * the raw payload bytes; the entropy/container layer is LOSSLESS, so
  * the decoded pixels hash-match the oracle's replay exactly iff the
  * whole Huffman/marker/stuffing round trip is bit-correct — a
  * single mis-parsed bit shifts the stream and diverges everything.
  *
  * Images here are 8×8 RGB (the payload's first 192 bytes, r,g,b
  * row-major); with 2×2/1×1/1×1 sampling the MCU is 16×16, so the
  * encoder edge-pads to one full MCU and the decoder crops back —
  * the standard boundary behavior every JPEG encoder implements.
  */
object JpegCodec {

  // ---- shared integer constants (mirrored literally in the oracle) --

  /** 4·8192² — the FDCT/IDCT denominator (basis scale² times the DCT
    * 1/4 normalization).
    */
  val D: Long = 268435456L

  /** c(u) multipliers, 8192-scaled: c(0)=√½. */
  val cScale: Array[Long] = Array(5793L, 8192L, 8192L, 8192L, 8192L, 8192L, 8192L, 8192L)

  /** Annex-K luminance quantization table, natural (row-major) order. */
  val qLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex-K chrominance quantization table, natural order. */
  val qChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Natural index at each zigzag position (T.81 figure A.6). */
  val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // ---- Annex-K Huffman table specs: (bits per code length 1..16, symbol values)

  private val dcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcLumaVals = (0 to 11).map(_.toByte).toArray
  private val dcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val dcChromaVals = (0 to 11).map(_.toByte).toArray
  private val acLumaBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val acLumaVals: Array[Byte] = Array(
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
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)
  private val acChromaBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val acChromaVals: Array[Byte] = Array(
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
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  /** Canonical Huffman: symbol → (code, length). */
  private def buildCodes(bits: Array[Int], vals: Array[Byte]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = scala.collection.mutable.HashMap[Int, (Int, Int)]()
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out(vals(k) & 0xff) = (code, len)
        code += 1
        k += 1
        i += 1
      }
      code <<= 1
      len += 1
    }
    out.toMap
  }

  private lazy val encDcLuma = buildCodes(dcLumaBits, dcLumaVals)
  private lazy val encAcLuma = buildCodes(acLumaBits, acLumaVals)
  private lazy val encDcChroma = buildCodes(dcChromaBits, dcChromaVals)
  private lazy val encAcChroma = buildCodes(acChromaBits, acChromaVals)

  // ---- shared integer transforms (truncating division — DuckDB `//`)

  private def clamp(v: Long): Int = math.max(0L, math.min(255L, v)).toInt

  /** FDCT + quantization of one 8×8 sample block (natural order out).
    * t1 = Σ (p−128)·B[u][x]·B[v][y]; t3 scales by c(u)c(v); the
    * quantized value is round-half-away on t3/(D·q), all truncating.
    */
  def fdctQuant(block: Array[Int], qt: Array[Int]): Array[Int] = {
    val b = FrameFeatures.dctBasis
    val out = new Array[Int](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var t1 = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            t1 += (block(y * 8 + x) - 128).toLong * b(u)(x) * b(v)(y)
            x += 1
          }
          y += 1
        }
        val t3 = ((t1 * cScale(u)) / 8192L * cScale(v)) / 8192L
        val dq = D * qt(v * 8 + u)
        out(v * 8 + u) =
          ((2L * t3 + (if (t3 < 0) -dq else dq)) / (2L * dq)).toInt
        v += 1
      }
      u += 1
    }
    out
  }

  /** Dequant + IDCT of one natural-order coefficient block into 8×8
    * samples (level-shifted back, clamped).
    */
  def idct(coefs: Array[Int], qt: Array[Int]): Array[Int] = {
    val b = FrameFeatures.dctBasis
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0L
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val fd = coefs(v * 8 + u).toLong * qt(v * 8 + u)
            s += (fd * cScale(u)) / 8192L * cScale(v) / 8192L * b(u)(x) * b(v)(y)
            v += 1
          }
          u += 1
        }
        out(y * 8 + x) =
          clamp((2L * s + (if (s < 0) -D else D)) / (2L * D) + 128L)
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- bit I/O with byte stuffing ----

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 B.2.1). */
    def flush(): Unit = if (nbits > 0) put(0xff, 8 - nbits)
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        val b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require((bytes(pos) & 0xff) == 0x00, "unexpected marker in scan")
          pos += 1 // skip the stuffed zero
        }
        acc = b
        nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  private def category(v: Int): Int =
    32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Huffman-encode one block (zigzag AC scan, DC diff) — returns new DC. */
  /** Checked Huffman lookup: an out-of-range coefficient category (a
    * quantizer/overflow bug upstream) names the missing symbol instead
    * of surfacing as a bare NoSuchElementException from Map.apply.
    */
  private def code(tab: Map[Int, (Int, Int)], sym: Int): (Int, Int) =
    tab.getOrElse(sym, throw new IllegalArgumentException(
      f"huffman table lacks symbol 0x$sym%02x (coefficient category out of range)"))

  private def encodeBlock(w: BitWriter, coefs: Array[Int], prevDc: Int,
                          dc: Map[Int, (Int, Int)], ac: Map[Int, (Int, Int)]): Int = {
    val diff = coefs(0) - prevDc
    val t = category(diff)
    val (c0, l0) = code(dc, t)
    w.put(c0, l0)
    if (t > 0) w.put(if (diff >= 0) diff else diff + (1 << t) - 1, t)
    var run = 0
    var k = 1
    while (k < 64) {
      val v = coefs(zigzag(k))
      if (v == 0) run += 1
      else {
        while (run >= 16) { val (cz, lz) = code(ac, 0xf0); w.put(cz, lz); run -= 16 }
        val s = category(v)
        val (cs, ls) = code(ac, (run << 4) | s)
        w.put(cs, ls)
        w.put(if (v >= 0) v else v + (1 << s) - 1, s)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (ce, le) = code(ac, 0x00); w.put(ce, le) }
    coefs(0)
  }

  // ---- encoder ----

  private def u16be(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 8) & 0xff); out.write(v & 0xff)
  }

  private def segment(out: java.io.ByteArrayOutputStream, marker: Int,
                      body: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    u16be(out, body.length + 2)
    out.write(body, 0, body.length)
  }

  private def dhtBody(tcTh: Int, bits: Array[Int], vals: Array[Byte]): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    b.write(tcTh)
    bits.foreach(b.write)
    b.write(vals, 0, vals.length)
    b.toByteArray
  }

  /** Encode an 8×8 RGB image (r,g,b row-major, 192 bytes) as baseline
    * 4:2:0 JFIF. The 16×16 MCU is edge-padded; all four luma blocks
    * and both chroma blocks are really encoded.
    */
  def encode(rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length >= 192, s"need 192 RGB bytes, got ${rgb.length}")
    // color transform on the 8x8 source
    val yv = new Array[Int](64); val cb = new Array[Int](64); val cr = new Array[Int](64)
    var i = 0
    while (i < 64) {
      val r = rgb(i * 3) & 0xff
      val g = rgb(i * 3 + 1) & 0xff
      val b = rgb(i * 3 + 2) & 0xff
      yv(i) = clamp((19595L * r + 38470L * g + 7471L * b + 32768L) / 65536L)
      cb(i) = clamp(128L + (-11056L * r - 21712L * g + 32768L * b + 32768L) / 65536L)
      cr(i) = clamp(128L + (32768L * r - 27440L * g - 5328L * b + 32768L) / 65536L)
      i += 1
    }
    // padded 16x16 luma plane; subsampled (from padded) 8x8 chroma
    def padY(x: Int, y: Int): Int = yv(math.min(y, 7) * 8 + math.min(x, 7))
    def sub(p: Array[Int])(cx: Int, cy: Int): Int = {
      def at(x: Int, y: Int): Int = p(math.min(y, 7) * 8 + math.min(x, 7))
      (at(2 * cx, 2 * cy) + at(2 * cx + 1, 2 * cy) +
        at(2 * cx, 2 * cy + 1) + at(2 * cx + 1, 2 * cy + 1) + 2) / 4
    }
    def lumaBlock(bx: Int, by: Int): Array[Int] =
      Array.tabulate(64)(j => padY(bx * 8 + j % 8, by * 8 + j / 8))
    val blocksY = Seq((0, 0), (1, 0), (0, 1), (1, 1)).map { case (bx, by) =>
      fdctQuant(lumaBlock(bx, by), qLuma)
    }
    val blockCb = fdctQuant(Array.tabulate(64)(j => sub(cb)(j % 8, j / 8)), qChroma)
    val blockCr = fdctQuant(Array.tabulate(64)(j => sub(cr)(j % 8, j / 8)), qChroma)

    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    segment(out, 0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    segment(out, 0xdb, (Array(0x00) ++ zigzag.map(qLuma(_))).map(_.toByte))
    segment(out, 0xdb, (Array(0x01) ++ zigzag.map(qChroma(_))).map(_.toByte))
    // SOF0: 8-bit, 8x8, 3 components, sampling 2x2 / 1x1 / 1x1
    segment(out, 0xc0, Array[Byte](8, 0, 8, 0, 8, 3,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    segment(out, 0xc4, dhtBody(0x00, dcLumaBits, dcLumaVals))
    segment(out, 0xc4, dhtBody(0x10, acLumaBits, acLumaVals))
    segment(out, 0xc4, dhtBody(0x01, dcChromaBits, dcChromaVals))
    segment(out, 0xc4, dhtBody(0x11, acChromaBits, acChromaVals))
    segment(out, 0xda, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    val w = new BitWriter(out)
    var dcY = 0; var dcCb = 0; var dcCr = 0
    blocksY.foreach(bk => dcY = encodeBlock(w, bk, dcY, encDcLuma, encAcLuma))
    dcCb = encodeBlock(w, blockCb, dcCb, encDcChroma, encAcChroma)
    dcCr = encodeBlock(w, blockCr, dcCr, encDcChroma, encAcChroma)
    w.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ---- decoder ----

  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    // canonical decode: per length, [minCode, maxCode] + value pointer
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        valPtr(len) = k
        minCode(len) = code
        code += bits(len - 1)
        k += bits(len - 1)
        maxCode(len) = code - 1
        if (bits(len - 1) == 0) maxCode(len) = -1
        code <<= 1
        len += 1
      }
    }
    def decode(r: BitReader): Int = {
      var code = r.bit()
      var len = 1
      while (len < 16 && (maxCode(len) < 0 || code > maxCode(len))) {
        code = (code << 1) | r.bit()
        len += 1
      }
      require(maxCode(len) >= 0 && code <= maxCode(len), "bad Huffman code")
      vals(valPtr(len) + code - minCode(len)) & 0xff
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  case class JpegStats(doc_id: Long, width: Long, height: Long, n_px: Long,
                       sum_r: Long, sum_g: Long, sum_b: Long,
                       n_jpeg_bytes: Long, px_md5: String)

  /** Full decode of a baseline 4:2:0 JFIF produced by [[encode]] —
    * nothing is assumed beyond baseline: quant tables, Huffman tables,
    * dimensions and sampling all come from the file's own segments.
    */
  final class Decoder {
    def decode(docId: Long, bytes: Array[Byte]): JpegStats = {
      require(bytes.length > 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
        s"doc $docId: missing SOI")
      val qts = new Array[Array[Int]](4)
      val dcTabs = new Array[HuffTable](4)
      val acTabs = new Array[HuffTable](4)
      var w = -1; var h = -1
      // per component: (id, hSamp, vSamp, quantTable, dcSel, acSel)
      var comps: Array[Array[Int]] = null
      var pos = 2
      var scanAt = -1
      while (scanAt < 0) {
        require((bytes(pos) & 0xff) == 0xff, s"doc $docId: bad marker sync at $pos")
        val marker = bytes(pos + 1) & 0xff
        val len = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
        val body = pos + 4
        marker match {
          case 0xdb =>
            var p = body
            while (p < pos + 2 + len) {
              require((bytes(p) & 0xf0) == 0, s"doc $docId: only 8-bit DQT")
              val id = bytes(p) & 0x0f
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) { t(zigzag(k)) = bytes(p + 1 + k) & 0xff; k += 1 }
              qts(id) = t
              p += 65
            }
          case 0xc0 =>
            require((bytes(body) & 0xff) == 8, s"doc $docId: 8-bit only")
            h = ((bytes(body + 1) & 0xff) << 8) | (bytes(body + 2) & 0xff)
            w = ((bytes(body + 3) & 0xff) << 8) | (bytes(body + 4) & 0xff)
            val nc = bytes(body + 5) & 0xff
            require(nc == 3, s"doc $docId: expected 3 components")
            comps = Array.tabulate(nc) { c =>
              val o = body + 6 + c * 3
              Array(bytes(o) & 0xff, (bytes(o + 1) & 0xff) >> 4,
                bytes(o + 1) & 0x0f, bytes(o + 2) & 0xff, 0, 0)
            }
          case 0xc4 =>
            var p = body
            while (p < pos + 2 + len) {
              val tc = (bytes(p) & 0xf0) >> 4
              val th = bytes(p) & 0x0f
              val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
              val n = bits.sum
              val vals = java.util.Arrays.copyOfRange(bytes, p + 17, p + 17 + n)
              if (tc == 0) dcTabs(th) = new HuffTable(bits, vals)
              else acTabs(th) = new HuffTable(bits, vals)
              p += 17 + n
            }
          case 0xda =>
            val ns = bytes(body) & 0xff
            var c = 0
            while (c < ns) {
              val cid = bytes(body + 1 + c * 2) & 0xff
              val sel = bytes(body + 2 + c * 2) & 0xff
              val comp = comps.find(_(0) == cid).get
              comp(4) = (sel >> 4) & 0x0f
              comp(5) = sel & 0x0f
              c += 1
            }
            scanAt = body + 1 + ns * 2 + 3
          case _ => () // APP0 etc: skip
        }
        if (scanAt < 0) pos += 2 + len
      }
      require(w > 0 && h > 0 && comps != null, s"doc $docId: missing SOF")
      val hmax = comps.map(_(1)).max
      val vmax = comps.map(_(2)).max
      require(hmax == 2 && vmax == 2 && comps(0)(1) == 2 && comps(0)(2) == 2 &&
        comps(1)(1) == 1 && comps(2)(1) == 1, s"doc $docId: expected 4:2:0")
      val mcusX = (w + 16 - 1) / 16
      val mcusY = (h + 16 - 1) / 16
      // component planes at full MCU-grid resolution
      val planeW = Array.tabulate(3)(c => mcusX * comps(c)(1) * 8)
      val planes = Array.tabulate(3)(c => new Array[Int](planeW(c) * mcusY * comps(c)(2) * 8))
      val r = new BitReader(bytes, scanAt)
      val prevDc = new Array[Int](3)
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          var c = 0
          while (c < 3) {
            val (hs, vs) = (comps(c)(1), comps(c)(2))
            val qt = qts(comps(c)(3))
            var vb = 0
            while (vb < vs) {
              var hb = 0
              while (hb < hs) {
                // entropy-decode one block (natural-order coefs)
                val coefs = new Array[Int](64)
                val t = dcTabs(comps(c)(4)).decode(r)
                prevDc(c) += extend(r.bits(t), t)
                coefs(0) = prevDc(c)
                var k = 1
                while (k < 64) {
                  val rs = acTabs(comps(c)(5)).decode(r)
                  if (rs == 0x00) k = 64 // EOB
                  else if (rs == 0xf0) k += 16 // ZRL
                  else {
                    k += (rs >> 4)
                    // a corrupt/truncated scan can emit a run that
                    // overflows the block — fail with doc context, not
                    // a bare ArrayIndexOutOfBoundsException
                    require(k < 64, s"doc $docId: AC run overflows block at k=$k")
                    val s = rs & 0x0f
                    coefs(zigzag(k)) = extend(r.bits(s), s)
                    k += 1
                  }
                }
                val px = idct(coefs, qt)
                val ox = (mx * hs + hb) * 8
                val oy = (my * vs + vb) * 8
                var j = 0
                while (j < 64) {
                  planes(c)((oy + j / 8) * planeW(c) + ox + j % 8) = px(j)
                  j += 1
                }
                hb += 1
              }
              vb += 1
            }
            c += 1
          }
          mx += 1
        }
        my += 1
      }
      // crop + upsample + color convert + digest
      val hexDigits = "0123456789abcdef"
      val hx = new java.lang.StringBuilder(w * h * 6)
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yy = planes(0)(y * planeW(0) + x).toLong
          val cbv = planes(1)((y / 2) * planeW(1) + x / 2).toLong - 128L
          val crv = planes(2)((y / 2) * planeW(2) + x / 2).toLong - 128L
          val rr = clamp(yy + (91881L * crv + 32768L) / 65536L)
          val gg = clamp(yy - (22554L * cbv + 46802L * crv + 32768L) / 65536L)
          val bb = clamp(yy + (116130L * cbv + 32768L) / 65536L)
          sr += rr; sg += gg; sb += bb
          Seq(rr, gg, bb).foreach { v =>
            hx.append(hexDigits(v >> 4)).append(hexDigits(v & 15))
          }
          x += 1
        }
        y += 1
      }
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(hx.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      JpegStats(docId, w.toLong, h.toLong, w.toLong * h,
        sr, sg, sb, bytes.length.toLong,
        md.map(b => f"${b & 0xff}%02x").mkString)
    }
  }

  /** Encode + decode in the sanctioned codec-walk mapPartitions pass. */
  def roundtrip(imgs: Dataset[FrameFeatures.WavPayload]): Dataset[JpegStats] = {
    implicit val enc = Encoders.product[JpegStats]
    imgs.mapPartitions { it =>
      val dec = new Decoder
      it.map(p => dec.decode(p.doc_id, encode(p.payload)))
    }
  }
}
