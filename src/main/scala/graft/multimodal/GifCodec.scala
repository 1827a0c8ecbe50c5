package graft.multimodal

import org.apache.spark.sql.{Dataset, Encoders}

/** Real GIF89a codec: encode grayscale bytes into a genuine GIF (logical
  * screen descriptor, 256-entry global color table, image descriptor,
  * variable-width LSB-first LZW with clear/EOI codes, 255-byte
  * sub-blocks, trailer) and parse it back (header validation, color
  * table walk, sub-block reassembly, full LZW decode including the
  * KwKwK case and the 4096-entry clear/reset).
  *
  * Code-width lockstep (the classic GIF pitfall, documented here
  * because the round-trip test is what pins it): the ENCODER widens
  * after adding a dictionary entry when nextCode == 2^codeSize; the
  * DECODER adds its entries one code later, so it widens at
  * nextCode == 2^codeSize - 1. The dictionary clears at 4096 on both
  * sides.
  *
  * Like PngCodec: the byte-walking parser is the one place a codec
  * genuinely can't be a Catalyst expression, so it runs in the
  * sanctioned mapPartitions walk; everything else in the query plans
  * as one scan with zero shuffle.
  */
object GifCodec {

  final case class GifStats(doc_id: Long, width: Long, height: Long,
                            n_px: Long, sum_px: Long, min_px: Long, max_px: Long,
                            px_md5: String)

  private val MinCodeSize = 8
  private val ClearCode = 1 << MinCodeSize          // 256
  private val EoiCode = ClearCode + 1               // 257
  private val FirstFree = EoiCode + 1               // 258
  private val MaxDict = 4096

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def write(code: Int, size: Int): Unit = {
      cur |= code << nbits
      nbits += size
      while (nbits >= 8) { out.write(cur & 0xff); cur >>>= 8; nbits -= 8 }
    }
    def finish(): Array[Byte] = {
      if (nbits > 0) { out.write(cur & 0xff); cur = 0; nbits = 0 }
      out.toByteArray
    }
  }

  private final class BitReader(bytes: Array[Byte]) {
    private var pos = 0
    private var cur = 0
    private var nbits = 0
    def read(size: Int): Int = {
      while (nbits < size) {
        require(pos < bytes.length, "LZW stream exhausted mid-code")
        cur |= (bytes(pos) & 0xff) << nbits
        pos += 1; nbits += 8
      }
      val v = cur & ((1 << size) - 1)
      cur >>>= size; nbits -= size
      v
    }
  }

  /** GIF-variant LZW over 8-bit symbols. */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new BitWriter
    var dict = new java.util.HashMap[Long, Integer]()
    var nextCode = FirstFree
    var codeSize = MinCodeSize + 1
    out.write(ClearCode, codeSize)
    var prefix = -1
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xff
      if (prefix < 0) prefix = b
      else {
        val key = (prefix.toLong << 8) | b
        val hit = dict.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          out.write(prefix, codeSize)
          dict.put(key, Integer.valueOf(nextCode))
          nextCode += 1
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
          if (nextCode == MaxDict) {
            out.write(ClearCode, codeSize)
            dict = new java.util.HashMap[Long, Integer]()
            nextCode = FirstFree
            codeSize = MinCodeSize + 1
          }
          prefix = b
        }
      }
      i += 1
    }
    if (prefix >= 0) {
      out.write(prefix, codeSize)
      // the flush code counts toward the width schedule even though it
      // defines no dictionary entry — the decoder counts READS, so
      // without this bump an EOI landing on a widen boundary would be
      // written one bit narrower than the decoder reads it
      nextCode += 1
      if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
    }
    out.write(EoiCode, codeSize)
    out.finish()
  }

  private def lzwDecode(bytes: Array[Byte], expectPx: Int): Array[Byte] = {
    val in = new BitReader(bytes)
    val out = new java.io.ByteArrayOutputStream(expectPx)
    val prefixOf = new Array[Int](MaxDict)
    val suffixOf = new Array[Byte](MaxDict)
    var nextCode = FirstFree
    var codeSize = MinCodeSize + 1
    var prev = -1
    val buf = new Array[Byte](MaxDict)
    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= 256) c = prefixOf(c)
      c.toByte
    }
    def emit(code: Int): Unit = {
      var c = code
      var n = 0
      while (c >= 256) { buf(n) = suffixOf(c); n += 1; c = prefixOf(c) }
      out.write(c)
      while (n > 0) { n -= 1; out.write(buf(n) & 0xff) }
    }
    def add(pfx: Int, sfx: Byte): Unit = {
      if (nextCode < MaxDict) {
        prefixOf(nextCode) = pfx; suffixOf(nextCode) = sfx
        nextCode += 1
      }
    }
    // width schedule runs on codes READ (the encoder's runs on codes
    // written, including its final flush) — counting dictionary adds
    // instead desyncs exactly when the stream ends on a widen boundary
    var rcnt = FirstFree
    var done = false
    while (!done) {
      val code = in.read(codeSize)
      if (code == ClearCode) {
        nextCode = FirstFree; codeSize = MinCodeSize + 1; prev = -1
        rcnt = FirstFree
      } else if (code == EoiCode) {
        done = true
      } else {
        if (prev < 0) {
          require(code < 256, s"first post-clear code $code must be a literal")
          out.write(code)
        } else {
          require(code <= nextCode, s"code $code out of range (next $nextCode)")
          if (code == nextCode) {      // KwKwK: prev string + its first byte
            add(prev, firstByte(prev))
            emit(code)
          } else {
            emit(code)
            add(prev, firstByte(code))
          }
        }
        prev = code
        rcnt += 1
        if (rcnt == (1 << codeSize) && codeSize < 12) codeSize += 1
      }
    }
    out.toByteArray
  }

  def encode(gray: Array[Byte], width: Int): Array[Byte] = {
    val h = gray.length / width
    // the logical-screen / image-descriptor size fields are 16-bit:
    // a payload >= 1 MiB at width 16 would overflow h past 65535 and
    // silently truncate through le16, aborting the decoder downstream
    // with an opaque size mismatch — fail loudly at the encode edge
    require(width <= 0xffff && h <= 0xffff,
      s"GIF size fields are 16-bit: ${width}x$h does not fit")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(le16(width)); out.write(le16(h))
    out.write(0xf7)                    // GCT present, 8-bit, 256 entries
    out.write(0)                       // background color index
    out.write(0)                       // aspect ratio
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c)                    // image separator
    out.write(le16(0)); out.write(le16(0))
    out.write(le16(width)); out.write(le16(h))
    out.write(0)                       // no local table, not interlaced
    out.write(MinCodeSize)
    val lzw = lzwEncode(java.util.Arrays.copyOf(gray, h * width))
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n); off += n
    }
    out.write(0)                       // block terminator
    out.write(0x3b)                    // trailer
    out.toByteArray
  }

  final class GifDecoder {
    private def u16le(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

    def decode(docId: Long, bytes: Array[Byte]): GifStats = {
      require(bytes.length >= 13 &&
        new String(bytes, 0, 6, java.nio.charset.StandardCharsets.US_ASCII) == "GIF89a",
        s"doc $docId: not a GIF89a")
      val w = u16le(bytes, 6); val h = u16le(bytes, 8)
      val packed = bytes(10) & 0xff
      require((packed & 0x80) != 0, s"doc $docId: global color table required")
      val gctSize = 2 << (packed & 7)
      var off = 13
      val gct = java.util.Arrays.copyOfRange(bytes, off, off + gctSize * 3)
      off += gctSize * 3
      require((bytes(off) & 0xff) == 0x2c, s"doc $docId: expected image descriptor")
      require(u16le(bytes, off + 5) == w && u16le(bytes, off + 7) == h,
        s"doc $docId: image size != screen size")
      require((bytes(off + 9) & 0x80) == 0, s"doc $docId: local color table unsupported")
      off += 10
      require((bytes(off) & 0xff) == MinCodeSize, s"doc $docId: unexpected LZW root size")
      off += 1
      val lzw = new java.io.ByteArrayOutputStream()
      var blk = bytes(off) & 0xff
      while (blk != 0) {
        lzw.write(bytes, off + 1, blk)
        off += 1 + blk
        blk = bytes(off) & 0xff
      }
      require((bytes(off + 1) & 0xff) == 0x3b, s"doc $docId: missing trailer")
      val idx = lzwDecode(lzw.toByteArray, w * h)
      require(idx.length == w * h,
        s"doc $docId: decoded ${idx.length} pixels, expected ${w * h}")
      val hexDigits = "0123456789abcdef"
      val hx = new java.lang.StringBuilder(idx.length * 2)
      var sum = 0L; var mn = 255L; var mx = 0L
      var i = 0
      while (i < idx.length) {
        val v = gct((idx(i) & 0xff) * 3) & 0xff    // gray = R of the table entry
        sum += v; if (v < mn) mn = v; if (v > mx) mx = v
        hx.append(hexDigits(v >> 4)).append(hexDigits(v & 15))
        i += 1
      }
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(hx.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      GifStats(docId, w.toLong, h.toLong, w.toLong * h, sum, mn, mx,
        md.map(b => f"${b & 0xff}%02x").mkString)
    }
  }

  /** Distributed encode→decode round trip, one decoder per partition. */
  def roundtrip(imgs: Dataset[FrameFeatures.WavPayload],
                width: Int): Dataset[GifStats] = {
    implicit val enc = Encoders.product[GifStats]
    imgs.mapPartitions { it =>
      val codec = new GifDecoder
      it.map(p => codec.decode(p.doc_id, encode(p.payload, width)))
    }
  }
}
