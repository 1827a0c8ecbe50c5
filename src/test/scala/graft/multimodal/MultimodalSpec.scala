package graft.multimodal

import graft.SparkTestSession
import graft.multimodal.FrameFeatures.{WavDecoder, WavPayload, encodeWav}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("JpegCodec: decode(encode) equals the pure-math pipeline replay") {
    // the exactness contract the oracle relies on: the container +
    // entropy layer is lossless, so decoded pixels must equal the
    // direct FDCT->quant->dequant->IDCT replay of the same source
    val rgb = Array.tabulate(192)(i => ((i * 37 + 11) % 256).toByte)
    val jpeg = JpegCodec.encode(rgb)
    // container sanity: SOI/EOI markers, stuffed scan
    assert((jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8)
    assert((jpeg(jpeg.length - 2) & 0xff) == 0xff &&
      (jpeg(jpeg.length - 1) & 0xff) == 0xd9)
    val stats = new JpegCodec.Decoder().decode(7L, jpeg)
    assert(stats.width === 8L && stats.height === 8L && stats.n_px === 64L)

    // replay the lossy math directly (no container)
    def clamp(v: Long): Long = math.max(0L, math.min(255L, v))
    val yv = new Array[Int](64); val cb = new Array[Int](64); val cr = new Array[Int](64)
    (0 until 64).foreach { i =>
      val r = rgb(i * 3) & 0xff; val g = rgb(i * 3 + 1) & 0xff; val b = rgb(i * 3 + 2) & 0xff
      yv(i) = clamp((19595L * r + 38470L * g + 7471L * b + 32768L) / 65536L).toInt
      cb(i) = clamp(128L + (-11056L * r - 21712L * g + 32768L * b + 32768L) / 65536L).toInt
      cr(i) = clamp(128L + (32768L * r - 27440L * g - 5328L * b + 32768L) / 65536L).toInt
    }
    def sub(p: Array[Int])(cx: Int, cy: Int): Int = {
      def at(x: Int, y: Int) = p(math.min(y, 7) * 8 + math.min(x, 7))
      (at(2 * cx, 2 * cy) + at(2 * cx + 1, 2 * cy) +
        at(2 * cx, 2 * cy + 1) + at(2 * cx + 1, 2 * cy + 1) + 2) / 4
    }
    val recY = JpegCodec.idct(JpegCodec.fdctQuant(yv, JpegCodec.qLuma), JpegCodec.qLuma)
    val recCb = JpegCodec.idct(JpegCodec.fdctQuant(
      Array.tabulate(64)(j => sub(cb)(j % 8, j / 8)), JpegCodec.qChroma), JpegCodec.qChroma)
    val recCr = JpegCodec.idct(JpegCodec.fdctQuant(
      Array.tabulate(64)(j => sub(cr)(j % 8, j / 8)), JpegCodec.qChroma), JpegCodec.qChroma)
    var sr = 0L; var sg = 0L; var sb = 0L
    (0 until 64).foreach { i =>
      val x = i % 8; val y = i / 8
      val yy = recY(i).toLong
      val cbv = recCb((y / 2) * 8 + x / 2).toLong - 128L
      val crv = recCr((y / 2) * 8 + x / 2).toLong - 128L
      sr += clamp(yy + (91881L * crv + 32768L) / 65536L)
      sg += clamp(yy - (22554L * cbv + 46802L * crv + 32768L) / 65536L)
      sb += clamp(yy + (116130L * cbv + 32768L) / 65536L)
    }
    assert(stats.sum_r === sr && stats.sum_g === sg && stats.sum_b === sb,
      s"container round trip diverged from the math replay: " +
        s"(${stats.sum_r},${stats.sum_g},${stats.sum_b}) vs ($sr,$sg,$sb)")
  }

  test("JpegCodec: a flat-color image decodes to itself (DC-only blocks)") {
    // constant 8x8 color: every AC coefficient is zero, DC quantizes
    // and reconstructs near-exactly; lossy error must be tiny
    val rgb = Array.tabulate(192)(i =>
      (Seq(200, 120, 40)(i % 3)).toByte)
    // tolerance: +-10/px — the integer RGB->YCbCr->RGB round trip
    // alone costs up to ~5/px, DC quantization (q=16/17) up to ~2 more
    val stats = new JpegCodec.Decoder().decode(1L, JpegCodec.encode(rgb))
    assert(math.abs(stats.sum_r - 64L * 200) <= 64 * 10, s"sum_r=${stats.sum_r}")
    assert(math.abs(stats.sum_g - 64L * 120) <= 64 * 10, s"sum_g=${stats.sum_g}")
    assert(math.abs(stats.sum_b - 64L * 40) <= 64 * 10, s"sum_b=${stats.sum_b}")
  }

  test("JpegCodec: byte stuffing survives an all-extremes image") {
    // saturated checkerboard maximizes AC energy -> long Huffman runs
    // and a realistic chance of 0xFF bytes in the scan
    val rgb = Array.tabulate(192) { i =>
      val px = i / 3
      (if (((px % 8) + (px / 8)) % 2 == 0) 0xff else 0x00).toByte
    }
    val jpeg = JpegCodec.encode(rgb)
    val stats = new JpegCodec.Decoder().decode(2L, jpeg)
    assert(stats.n_px === 64L)
    assert(stats.px_md5.length === 32)
  }

  test("WavDecoder round-trips a hand-built PCM file exactly") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 100, -100, 12345)
    val frames = new WavDecoder().decode(7L, encodeWav(samples, 16000)).toSeq
    assert(frames.size === 1) // 8 samples < one 128-sample frame
    val f = frames.head
    assert(f.doc_id === 7L)
    assert(f.sample_rate === 16000L)
    assert(f.n_channels === 1L)
    assert(f.bits_per_sample === 16L)
    assert(f.n_samples === 8L)
    assert(f.sum_samples === samples.map(_.toLong).sum)
    assert(f.min_sample === -32768L)
    assert(f.max_sample === 32767L)
  }

  test("WavDecoder splits long payloads into 128-sample frames") {
    val samples = Array.tabulate(300)(i => (i - 150).toShort) // 3 frames: 128+128+44
    val frames = new WavDecoder().decode(1L, encodeWav(samples, 8000)).toSeq
    assert(frames.map(_.n_samples) === Seq(128L, 128L, 44L))
    assert(frames.map(_.frame_id) === Seq(0L, 1L, 2L))
    assert(frames.map(_.sum_samples).sum === samples.map(_.toLong).sum)
    assert(frames.head.min_sample === -150L && frames.last.max_sample === 149L)
  }

  test("WavDecoder walks past unknown chunks to find fmt/data") {
    // splice a LIST chunk between fmt and data, as real recorders emit
    val base = encodeWav(Array[Short](5, -5), 12000)
    val listChunk = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = base.slice(0, 36) ++ listChunk ++ base.slice(36, base.length)
    // fix the RIFF size field (+12 bytes), little-endian at offset 4
    val riffSize = (base.length - 8) + listChunk.length
    spliced(4) = (riffSize & 0xff).toByte
    spliced(5) = ((riffSize >> 8) & 0xff).toByte
    val frames = new WavDecoder().decode(2L, spliced).toSeq
    assert(frames.size === 1)
    assert(frames.head.n_samples === 2L && frames.head.sum_samples === 0L)
  }

  test("WavDecoder clamps a data chunk longer than the file") {
    // a truncated upload: header claims more samples than bytes present
    val full = encodeWav(Array.tabulate(10)(i => i.toShort), 8000)
    val truncated = full.slice(0, full.length - 4) // drop 2 samples
    val frames = new WavDecoder().decode(9L, truncated).toSeq
    assert(frames.size === 1)
    assert(frames.head.n_samples === 8L)
    assert(frames.head.max_sample === 7L)
  }

  test("WavDecoder fails loudly on a malformed container") {
    val ex = intercept[IllegalArgumentException] {
      new WavDecoder().decode(3L, Array.fill[Byte](64)(0x41)).toSeq
    }
    assert(ex.getMessage.contains("RIFF"))
  }

  test("BmpDecoder round-trips a hand-built 24bpp image exactly") {
    import graft.multimodal.FrameFeatures.{BmpDecoder, encodeBmp}
    // 16x2 image: row0 all (b=1,g=2,r=3), row1 all (b=10,g=20,r=30)
    val px = (Array.fill(16)(Array[Byte](1, 2, 3)).flatten ++
      Array.fill(16)(Array[Byte](10, 20, 30)).flatten)
    val st = new BmpDecoder().decode(4L, encodeBmp(px, 16))
    assert(st.width === 16L && st.height === 2L && st.n_px === 32L)
    assert(st.sum_b === 16 * 1 + 16 * 10)
    assert(st.sum_g === 16 * 2 + 16 * 20)
    assert(st.sum_r === 16 * 3 + 16 * 30)
    val bad = intercept[IllegalArgumentException] {
      new BmpDecoder().decode(5L, Array.fill[Byte](64)(0x7f))
    }
    assert(bad.getMessage.contains("BMP"))
    // truncated pixel array must fail, not read out of bounds
    val whole = encodeBmp(px, 16)
    intercept[IllegalArgumentException] {
      new BmpDecoder().decode(6L, whole.slice(0, whole.length - 8))
    }
  }

  test("WavDecoder rejects a chunk size larger than the file") {
    val wav = encodeWav(Array[Short](1, 2, 3, 4), 8000)
    wav(42) = 0xff.toByte // corrupt the data-chunk size field upward
    wav(43) = 0xff.toByte
    val ex = intercept[IllegalArgumentException] {
      new WavDecoder().decode(8L, wav).toSeq
    }
    assert(ex.getMessage.contains("claims"))
  }

  test("mm_wav_decode emits one row per 128-sample frame of each doc") {
    val sf = "/root/testdata/sf0.001"
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .select(ceil((length(col("text").cast("binary")) / lit(2)).cast("int") / 128.0).cast("long").as("nf"))
      .filter(col("nf") >= 1)
      .agg(sum(col("nf"))).collect()(0).getLong(0)
    val got = graft.SparkEntry.queries("mm_wav_decode")(spark, sf).count()
    assert(got === expected)
  }

  test("distributed decodeWav equals a local decode of the same blobs") {
    import spark.implicits._
    val wavs = (0L until 8L).map(i =>
      WavPayload(i, encodeWav(Array.tabulate(200)(j => ((j * 31 + i * 7) % 1000 - 500).toShort),
        8000 + (i % 3).toInt * 4000)))
    val dist = FrameFeatures.decodeWav(spark.createDataset(wavs).repartition(4))
      .collect().sortBy(f => (f.doc_id, f.frame_id)).toSeq
    val local = {
      val c = new WavDecoder()
      wavs.flatMap(w => c.decode(w.doc_id, w.payload)).sortBy(f => (f.doc_id, f.frame_id))
    }
    assert(dist === local)
    assert(dist.map(_.sample_rate).distinct.sorted === Seq(8000L, 12000L, 16000L))
  }

  test("PngCodec round-trips pixels exactly through deflate + all five filters") {
    // 16x10 image: 10 rows cycle through filters 0..4 twice
    val px = Array.tabulate(160)(i => ((i * 37 + 11) % 256).toByte)
    val png = PngCodec.encode(px, 16)
    // genuine PNG signature on the wire
    assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte)
    val stats = new PngCodec.PngDecoder().decode(42L, png)
    assert(stats.doc_id === 42L)
    assert(stats.width === 16L && stats.height === 10L && stats.n_px === 160L)
    assert(stats.sum_px === px.map(b => (b & 0xff).toLong).sum)
    assert(stats.min_px === px.map(b => b & 0xff).min.toLong)
    assert(stats.max_px === px.map(b => b & 0xff).max.toLong)
    val hexpx = px.map(b => f"${b & 0xff}%02x").mkString
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(hexpx.getBytes("US-ASCII")).map(b => f"${b & 0xff}%02x").mkString
    assert(stats.px_md5 === md)
  }

  test("PngCodec rejects a tampered chunk via CRC-32") {
    val png = PngCodec.encode(Array.tabulate(64)(_.toByte), 16)
    // flip one bit inside the IDAT payload (after sig + IHDR chunk = 8+25)
    val bad = png.clone()
    bad(8 + 25 + 12) = (bad(8 + 25 + 12) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException] {
      new PngCodec.PngDecoder().decode(1L, bad)
    }
    assert(e.getMessage.contains("CRC"))
  }

  test("PngCodec decodes a zero-height-safe single-row image (filter 0 only)") {
    val px = Array[Byte](0, 127, -128, -1, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    val stats = new PngCodec.PngDecoder().decode(2L, PngCodec.encode(px, 16))
    assert(stats.height === 1L && stats.sum_px === px.map(b => (b & 0xff).toLong).sum)
  }

  test("GifCodec round-trips pixels exactly, including KwKwK runs") {
    // leading run of identical bytes forces the KwKwK decoder path
    val px = (Array.fill(40)(7.toByte) ++
      Array.tabulate(120)(i => ((i * 53 + 5) % 256).toByte))
    val gif = GifCodec.encode(px, 16)
    assert(new String(gif, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
      === "GIF89a")
    assert((gif(gif.length - 1) & 0xff) === 0x3b, "trailer byte")
    val stats = new GifCodec.GifDecoder().decode(7L, gif)
    assert(stats.width === 16L && stats.height === 10L && stats.n_px === 160L)
    assert(stats.sum_px === px.map(b => (b & 0xff).toLong).sum)
    val hexpx = px.map(b => f"${b & 0xff}%02x").mkString
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(hexpx.getBytes("US-ASCII")).map(b => f"${b & 0xff}%02x").mkString
    assert(stats.px_md5 === md)
  }

  test("GifCodec round-trips every length 16..1600 (pins widen-boundary stream ends)") {
    // the r9 bug class: a stream ENDING exactly when the width
    // schedule crosses 2^codeSize made the encoder write EOI one bit
    // narrower than the decoder read it — only specific lengths hit
    // the boundary, so sweep them all
    var len = 16
    while (len <= 1600) {
      val px = Array.tabulate(len)(i => (((i * 89) ^ (len + (i >> 2))) % 256).toByte)
      val stats = new GifCodec.GifDecoder().decode(len.toLong, GifCodec.encode(px, 16))
      assert(stats.sum_px === px.map(b => (b & 0xff).toLong).sum, s"len $len")
      len += 16
    }
  }

  test("GifCodec survives a dictionary-full clear/reset on a long varied stream") {
    // ~12k low-repetition bytes push the LZW dictionary past 4096
    // entries -> the encoder must emit CLEAR and both sides must
    // resynchronize at 9-bit codes
    val px = Array.tabulate(12000 - 12000 % 16)(i =>
      (((i * 131) ^ (i >> 3)) % 256).toByte)
    val stats = new GifCodec.GifDecoder().decode(9L, GifCodec.encode(px, 16))
    assert(stats.n_px === px.length.toLong)
    assert(stats.sum_px === px.map(b => (b & 0xff).toLong).sum)
    val hexpx = px.map(b => f"${b & 0xff}%02x").mkString
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(hexpx.getBytes("US-ASCII")).map(b => f"${b & 0xff}%02x").mkString
    assert(stats.px_md5 === md)
  }

  test("audioSnr and quantizePalette emit 0-row stats on sub-frame payloads") {
    // guards live in the functions themselves, not only behind the
    // call sites' length(bin) filters — a short payload must not
    // surface as ArrayIndexOutOfBounds/ArithmeticException in a task
    import spark.implicits._
    val short = Seq(
      WavPayload(1L, Array[Byte](1, 2)),          // < one 16-sample frame
      WavPayload(2L, Array.empty[Byte])).toDS()
    val snr = graft.multimodal.FrameFeatures.audioSnr(short).collect()
    assert(snr.forall(r => r.n_frames === 0L && r.snr_db === 0.0))
    val pal = graft.multimodal.FrameFeatures.quantizePalette(short).collect()
    assert(pal.forall(r => r.n_px === 0L && r.coverage_bp === 0L))
  }
}
