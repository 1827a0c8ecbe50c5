package graft.multimodal

import org.apache.spark.sql.{Dataset, Encoders}

/** Real PNG codec (PNG spec / RFC 2083): 8-bit grayscale, zlib-compressed
  * IDAT via `java.util.zip.Deflater`/`Inflater`, all five scanline filters
  * (None/Sub/Up/Average/Paeth), CRC-32-validated chunks. The encoder is
  * the ingest-side twin used to synthesize containers from document
  * bytes; the decoder re-derives the pixels, so the DuckDB oracle can
  * check the WHOLE round trip (deflate → inflate, filter → unfilter,
  * chunk CRCs) against raw byte arithmetic without ever seeing a PNG.
  *
  * Reference surface: the reference pipeline treats media as opaque
  * blobs with metadata (dataflow_pipeline.py's parse step); this is the
  * decode-and-featurize stage a multimodal corpus needs at scale.
  */
object PngCodec {

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  final case class PngStats(doc_id: Long, width: Long, height: Long,
                            n_px: Long, sum_px: Long, min_px: Long,
                            max_px: Long, px_md5: String)

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def crc(chunkType: Array[Byte], data: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32
    c.update(chunkType); c.update(data)
    c.getValue
  }

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val t = tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    be32(data.length.toLong) ++ t ++ data ++ be32(crc(t, data))
  }

  /** Encode 8-bit grayscale pixels (row-major) as a genuine PNG. Each
    * row's filter is `row % 5`, so a multi-row image exercises every
    * filter type — an unfiltering bug anywhere diverges the round trip.
    */
  def encode(gray: Array[Byte], width: Int): Array[Byte] = {
    require(width > 0 && gray.length % width == 0, "pixels must tile the width")
    val height = gray.length / width
    val raw = new Array[Byte](height * (width + 1))
    var row = 0
    while (row < height) {
      val f = row % 5
      raw(row * (width + 1)) = f.toByte
      var x = 0
      while (x < width) {
        val cur = gray(row * width + x) & 0xff
        val left = if (x > 0) gray(row * width + x - 1) & 0xff else 0
        val up = if (row > 0) gray((row - 1) * width + x) & 0xff else 0
        val ul = if (x > 0 && row > 0) gray((row - 1) * width + x - 1) & 0xff else 0
        val filtered = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(row * (width + 1) + 1 + x) = (filtered & 0xff).toByte
        x += 1
      }
      row += 1
    }
    val deflater = new java.util.zip.Deflater
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = be32(width.toLong) ++ be32(height.toLong) ++
      Array[Byte](8, 0, 0, 0, 0) // depth 8, grayscale, deflate, adaptive, no interlace
    Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Streaming-safe PNG parser: validates the signature, walks chunks
    * verifying every CRC-32, inflates the concatenated IDAT (zlib wrapper
    * + Adler-32 checked by `Inflater`), reverses the per-row filters, and
    * folds pixel stats plus an md5 over the pixels' lowercase hex (pins
    * values AND order, like the BMP/WAV digests).
    */
  final class PngDecoder {
    private def u32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

    def decode(docId: Long, bytes: Array[Byte]): PngStats = {
      require(bytes.length >= 8 && bytes.take(8).sameElements(Signature),
        s"doc $docId: not a PNG")
      var off = 8
      var w = 0; var h = 0
      val idat = new java.io.ByteArrayOutputStream()
      var sawEnd = false
      while (!sawEnd && off + 12 <= bytes.length) {
        val len = u32(bytes, off).toInt
        val tag = new String(bytes, off + 4, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
        require(off + 12 + len <= bytes.length, s"doc $docId: truncated chunk $tag")
        val data = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
        val tagB = java.util.Arrays.copyOfRange(bytes, off + 4, off + 8)
        require(u32(bytes, off + 8 + len) == crc(tagB, data),
          s"doc $docId: CRC mismatch in $tag")
        tag match {
          case "IHDR" =>
            w = u32(data, 0).toInt; h = u32(data, 4).toInt
            require(data(8) == 8 && data(9) == 0,
              s"doc $docId: only 8-bit grayscale supported")
            require(data(10) == 0 && data(11) == 0 && data(12) == 0,
              s"doc $docId: unsupported compression/filter/interlace")
          case "IDAT" => idat.write(data)
          case "IEND" => sawEnd = true
          case _      => () // ancillary chunks skipped (CRC still verified)
        }
        off += 12 + len
      }
      require(sawEnd && w > 0 && h > 0, s"doc $docId: missing IHDR/IEND")
      val inflater = new java.util.zip.Inflater
      inflater.setInput(idat.toByteArray)
      val raw = new Array[Byte](h * (w + 1))
      var n = 0
      while (n < raw.length && !inflater.finished())
        n += inflater.inflate(raw, n, raw.length - n)
      require(n == raw.length && inflater.finished(),
        s"doc $docId: inflated ${n} of ${raw.length} filtered bytes")
      inflater.end()
      val px = new Array[Byte](h * w)
      var row = 0
      while (row < h) {
        val f = raw(row * (w + 1)) & 0xff
        var x = 0
        while (x < w) {
          val v = raw(row * (w + 1) + 1 + x) & 0xff
          val left = if (x > 0) px(row * w + x - 1) & 0xff else 0
          val up = if (row > 0) px((row - 1) * w + x) & 0xff else 0
          val ul = if (x > 0 && row > 0) px((row - 1) * w + x - 1) & 0xff else 0
          val rec = f match {
            case 0 => v
            case 1 => v + left
            case 2 => v + up
            case 3 => v + (left + up) / 2
            case 4 => v + paeth(left, up, ul)
            case other => sys.error(s"doc $docId: unknown filter $other")
          }
          px(row * w + x) = (rec & 0xff).toByte
          x += 1
        }
        row += 1
      }
      val hexDigits = "0123456789abcdef"
      val hx = new java.lang.StringBuilder(px.length * 2)
      var sum = 0L; var mn = 255L; var mx = 0L
      var i = 0
      while (i < px.length) {
        val v = px(i) & 0xff
        sum += v; if (v < mn) mn = v; if (v > mx) mx = v
        hx.append(hexDigits(v >> 4)).append(hexDigits(v & 15))
        i += 1
      }
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(hx.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      PngStats(docId, w.toLong, h.toLong, w.toLong * h, sum, mn, mx,
        md.map(b => f"${b & 0xff}%02x").mkString)
    }
  }

  /** Distributed encode→decode round trip: one Deflater/Inflater pair per
    * partition, streamed — the mapPartitions shape every real codec uses.
    */
  def roundtrip(imgs: Dataset[FrameFeatures.WavPayload],
                width: Int): Dataset[PngStats] = {
    implicit val enc = Encoders.product[PngStats]
    imgs.mapPartitions { it =>
      val codec = new PngDecoder
      it.map(p => codec.decode(p.doc_id, encode(p.payload, width)))
    }
  }
}
