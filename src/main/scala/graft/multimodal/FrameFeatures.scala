package graft.multimodal

import org.apache.spark.sql.{Dataset, Encoders}

/** Typed frame-decode / feature-extract pipeline over binary payloads.
  *
  * Decoding opaque codec bytes is the one operation Catalyst genuinely
  * cannot express — this is the sanctioned `mapPartitions` case
  * (preference (d) in SURVEY §4): the decoder is initialized ONCE per
  * partition (the way a real codec/model handle would be) and streamed
  * over the partition's rows, so per-row overhead is just the decode.
  *
  * The codec here is a REAL container parser: RIFF/WAVE (PCM 16-bit),
  * the simplest widely-deployed media format. It walks the chunk list
  * (word-aligned, unknown chunks skipped), validates magics, reads the
  * fmt header fields, and folds per-frame sample statistics over the
  * data chunk — the same byte-level work libsndfile does for WAV, and
  * the shape a libjpeg/ffmpeg handle drops into unchanged. All emitted
  * stats are integer-exact so the DuckDB oracle can reproduce them by
  * hex/byte arithmetic on the same blobs.
  */
object FrameFeatures {

  case class WavPayload(doc_id: Long, payload: Array[Byte])

  /** One row per `frameSamples`-sample frame: header fields as parsed
    * from the container plus exact integer sample stats for the frame.
    */
  case class WavFrame(doc_id: Long, sample_rate: Long, n_channels: Long,
                      bits_per_sample: Long, frame_id: Long, n_samples: Long,
                      sum_samples: Long, min_sample: Long, max_sample: Long)

  /** Samples per analysis frame (8 ms at 16 kHz). */
  val frameSamples = 128

  /** PCM WAV parser. Stateless per call, but instantiated once per
    * partition like any real codec handle (libsndfile/ffmpeg contexts
    * are expensive to open and not serializable).
    */
  final class WavDecoder {

    private def u16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    private[multimodal] def s16(b: Array[Byte], off: Int): Int = {
      val v = u16(b, off)
      if (v >= 0x8000) v - 0x10000 else v
    }
    private def ascii(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Chunk-walk the container: (dataOff, nSamples, sampleRate, channels).
      * Malformed containers FAIL the task loudly — silent nulls would
      * vanish through joins.
      */
    private[multimodal] def parseHeader(docId: Long,
                                        bytes: Array[Byte]): (Int, Int, Long, Int) = {
      require(bytes.length >= 44 && ascii(bytes, 0) == "RIFF" && ascii(bytes, 8) == "WAVE",
        s"doc $docId: not a RIFF/WAVE container (${bytes.length} bytes)")
      var pos = 12
      var sampleRate = -1L; var channels = -1; var bits = -1
      var dataOff = -1; var dataLen = -1
      while (pos + 8 <= bytes.length && (dataOff < 0 || sampleRate < 0)) {
        val id = ascii(bytes, pos)
        val sizeL = u32(bytes, pos + 4)
        // a corrupt size field larger than the file would wrap negative
        // through toInt and walk the chunk scan backwards — fail instead
        require(sizeL <= bytes.length.toLong,
          s"doc $docId: chunk '$id' claims $sizeL bytes in a ${bytes.length}-byte file")
        val size = sizeL.toInt
        id match {
          case "fmt " =>
            require(u16(bytes, pos + 8) == 1, s"doc $docId: not PCM")
            channels = u16(bytes, pos + 10)
            sampleRate = u32(bytes, pos + 12)
            bits = u16(bytes, pos + 22)
          case "data" =>
            dataOff = pos + 8
            dataLen = math.min(size, bytes.length - dataOff)
          case _ => () // unknown chunk: skip (LIST/fact/cue_ are common)
        }
        pos += 8 + size + (size & 1) // chunks are word-aligned
      }
      require(sampleRate > 0 && dataOff >= 0, s"doc $docId: missing fmt/data chunk")
      require(bits == 16, s"doc $docId: only 16-bit PCM supported, got $bits")
      (dataOff, dataLen / 2, sampleRate, channels)
    }

    /** Parse one WAV blob into per-frame stats. */
    def decode(docId: Long, bytes: Array[Byte]): Iterator[WavFrame] = {
      val (dataOff, nSamples, sampleRate, channels) = parseHeader(docId, bytes)
      val nFrames = (nSamples + frameSamples - 1) / frameSamples
      (0 until nFrames).iterator.map { f =>
        val lo = f * frameSamples
        val hi = math.min(lo + frameSamples, nSamples)
        var i = lo; var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
        while (i < hi) {
          val v = s16(bytes, dataOff + 2 * i)
          sum += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 1
        }
        WavFrame(docId, sampleRate, channels.toLong, 16L,
          f.toLong, (hi - lo).toLong, sum, mn.toLong, mx.toLong)
      }
    }

    /** Doc-level audio features in one sample walk: zero-crossing count
      * ((s_i >= 0) flips vs the previous sample), exact |amplitude| sum,
      * and peak |amplitude| — the cheap speech/music/noise triage
      * features, all integer-exact.
      */
    def features(docId: Long, bytes: Array[Byte]): WavAudio = {
      val (dataOff, nSamples, _, _) = parseHeader(docId, bytes)
      var i = 0; var zc = 0L; var sumAbs = 0L; var peak = 0L
      var prevNonNeg = false
      while (i < nSamples) {
        val v = s16(bytes, dataOff + 2 * i)
        val nonNeg = v >= 0
        if (i > 0 && nonNeg != prevNonNeg) zc += 1
        prevNonNeg = nonNeg
        val a = math.abs(v).toLong
        sumAbs += a
        if (a > peak) peak = a
        i += 1
      }
      WavAudio(docId, nSamples.toLong, zc, sumAbs, peak)
    }

    /** Decimate-by-2 resample (every other sample) in one walk over the
      * parsed container — the cheapest rate conversion (production
      * resamplers put a polyphase low-pass in front; the WALK is the
      * shape). Emits exact stats of the OUTPUT stream plus a
      * position-weighted digest (Σ sampⱼ·((j mod 31)+1)) so a decoder
      * that reorders, drops, or off-by-ones the stride diverges even
      * when the order-independent sums happen to agree.
      */
    def resample2(docId: Long, bytes: Array[Byte]): WavResampled = {
      val (dataOff, nSamples, sampleRate, _) = parseHeader(docId, bytes)
      val nOut = (nSamples + 1) / 2
      var j = 0; var sum = 0L; var dig = 0L
      var mn = Long.MaxValue; var mx = Long.MinValue
      while (j < nOut) {
        val v = s16(bytes, dataOff + 4 * j).toLong
        sum += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        dig += v * ((j % 31) + 1)
        j += 1
      }
      if (nOut == 0) { mn = 0; mx = 0 }
      WavResampled(docId, sampleRate / 2, nSamples.toLong, nOut.toLong,
        sum, mn, mx, dig)
    }
  }

  case class WavResampled(doc_id: Long, sample_rate_out: Long, n_in: Long,
                          n_out: Long, sum_out: Long, min_out: Long,
                          max_out: Long, posw_digest: Long)

  case class WavVad(doc_id: Long, n_frames: Long, n_active: Long,
                    n_segments: Long, longest_seg: Long)

  /** Energy-based voice-activity detection over the parsed PCM: frames
    * of `frameLen` samples (complete frames only), a frame is ACTIVE
    * when its Σ|amplitude| exceeds the threshold, and adjacent active
    * frames merge into segments (the gaps-and-islands fold, run
    * sequentially inside the codec walk). Integer-exact end to end.
    */
  final class WavVadDetector(frameLen: Int, threshold: Long) {
    private val dec = new WavDecoder
    def vad(docId: Long, bytes: Array[Byte]): WavVad = {
      val (dataOff, nSamples, _, _) = dec.parseHeader(docId, bytes)
      val nFrames = nSamples / frameLen
      var f = 0
      var nActive = 0L; var nSeg = 0L; var longest = 0L; var run = 0L
      while (f < nFrames) {
        var e = 0L
        var i = f * frameLen
        val end = i + frameLen
        while (i < end) {
          e += math.abs(dec.s16(bytes, dataOff + 2 * i)).toLong
          i += 1
        }
        if (e > threshold) {
          if (run == 0L) nSeg += 1
          run += 1
          nActive += 1
          if (run > longest) longest = run
        } else run = 0L
        f += 1
      }
      WavVad(docId, nFrames.toLong, nActive, nSeg, longest)
    }
  }

  def vadWav(wavs: Dataset[WavPayload], frameLen: Int,
             threshold: Long): Dataset[WavVad] = {
    implicit val enc = Encoders.product[WavVad]
    wavs.mapPartitions { it =>
      val codec = new WavVadDetector(frameLen, threshold)
      it.map(w => codec.vad(w.doc_id, w.payload))
    }
  }

  def resampleWav(wavs: Dataset[WavPayload]): Dataset[WavResampled] = {
    implicit val enc = Encoders.product[WavResampled]
    wavs.mapPartitions { it =>
      val codec = new WavDecoder
      it.map(w => codec.resample2(w.doc_id, w.payload))
    }
  }

  case class WavAudio(doc_id: Long, n_samples: Long, zero_crossings: Long,
                      sum_abs: Long, peak: Long)

  def wavFeatures(wavs: Dataset[WavPayload]): Dataset[WavAudio] = {
    implicit val enc = Encoders.product[WavAudio]
    wavs.mapPartitions { it =>
      val codec = new WavDecoder
      it.map(w => codec.features(w.doc_id, w.payload))
    }
  }

  case class WavClip(doc_id: Long, n_samples: Long, n_clipped: Long,
                     clip_bp: Long, longest_run: Long, peak: Long)

  /** Clipping detector over the parsed PCM stream: count of samples at
    * or above |threshold| (near full-scale = the recording was driven
    * past headroom), the LONGEST consecutive clipped run (distinguishes
    * a single transient from sustained distortion), and peak — the
    * audio-QA gate a capture pipeline runs before anything expensive.
    * One sample walk, all integer.
    */
  def clipStats(wavs: Dataset[WavPayload], threshold: Long): Dataset[WavClip] = {
    implicit val enc = Encoders.product[WavClip]
    wavs.mapPartitions { it =>
      val codec = new WavDecoder
      it.map { w =>
        val (dataOff, nSamples, _, _) = codec.parseHeader(w.doc_id, w.payload)
        var i = 0; var nClip = 0L; var run = 0L; var longest = 0L; var peak = 0L
        while (i < nSamples) {
          val a = math.abs(codec.s16(w.payload, dataOff + 2 * i)).toLong
          if (a > peak) peak = a
          if (a >= threshold) {
            nClip += 1; run += 1
            if (run > longest) longest = run
          } else run = 0
          i += 1
        }
        WavClip(w.doc_id, nSamples.toLong, nClip,
          if (nSamples > 0) nClip * 10000 / nSamples else 0L, longest, peak)
      }
    }
  }

  /** Build a minimal valid PCM WAV blob — the test/ingest-side twin of
    * the decoder (what an upstream recorder would have produced).
    */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataSize = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(bb.putShort)
    bb.array()
  }

  case class BmpStats(doc_id: Long, width: Long, height: Long, n_px: Long,
                      sum_b: Long, sum_g: Long, sum_r: Long)

  /** 24bpp BMP parser: validates the BITMAPFILEHEADER magic, reads the
    * pixel-array offset, width/height and bit depth from the
    * BITMAPINFOHEADER, then folds exact per-channel byte sums over the
    * BGR pixel rows (stride padded to 4 bytes, rows stored bottom-up —
    * irrelevant for channel sums, handled for per-pixel access).
    */
  final class BmpDecoder {
    private def u16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def i32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

    /** Validate magics/depth/bounds, return (pixel offset, width, rows). */
    private[multimodal] def header(docId: Long, bytes: Array[Byte]): (Int, Int, Int) = {
      require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
        s"doc $docId: not a BMP (${bytes.length} bytes)")
      val dataOff = i32(bytes, 10)
      val w = i32(bytes, 18)
      val h = i32(bytes, 22) // negative height = top-down row order (legal BMP)
      require(u16(bytes, 28) == 24, s"doc $docId: only 24bpp supported")
      require(w > 0 && h != 0, s"doc $docId: bad dimensions ${w}x$h")
      val rows = math.abs(h)
      val stride = ((w * 3 + 3) / 4) * 4
      require(dataOff >= 54 && dataOff.toLong + rows.toLong * stride <= bytes.length,
        s"doc $docId: pixel array out of bounds")
      (dataOff, w, rows)
    }

    def decode(docId: Long, bytes: Array[Byte]): BmpStats = {
      val (dataOff, w, rows) = header(docId, bytes)
      val stride = ((w * 3 + 3) / 4) * 4
      var sb = 0L; var sg = 0L; var sr = 0L
      var row = 0
      while (row < rows) {
        val base = dataOff + row * stride
        var c = 0
        while (c < w) {
          val p = base + c * 3
          sb += bytes(p) & 0xff
          sg += bytes(p + 1) & 0xff
          sr += bytes(p + 2) & 0xff
          c += 1
        }
        row += 1
      }
      BmpStats(docId, w.toLong, rows.toLong, w.toLong * rows, sb, sg, sr)
    }
  }

  /** Build a minimal valid 24bpp BMP (the ingest-side twin). */
  def encodeBmp(pixelsBgr: Array[Byte], width: Int): Array[Byte] = {
    require(width * 3 % 4 == 0, "test encoder supports aligned strides only")
    val height = pixelsBgr.length / (width * 3)
    val dataSize = height * width * 3
    val bb = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putShort(0).putShort(0).putInt(54)            // reserved, data offset
      .putInt(40).putInt(width).putInt(height)       // info header, w, h
      .putShort(1).putShort(24).putInt(0)            // planes, bpp, no compression
      .putInt(dataSize).putInt(2835).putInt(2835)    // size, 72 dpi
      .putInt(0).putInt(0)                           // palette counts
      .put(pixelsBgr, 0, dataSize)
    bb.array()
  }

  case class BmpResized(doc_id: Long, width: Long, height: Long,
                        out_w: Long, out_h: Long, n_px_out: Long,
                        sum_b: Long, sum_g: Long, sum_r: Long,
                        px_md5: String)

  /** Nearest-neighbor 2x downsample over a parsed 24bpp BMP: keeps the
    * even-indexed pixels of every even STORAGE-ORDER row (BMP rows are
    * stored bottom-up; sampling in storage order keeps the byte
    * arithmetic engine-reproducible). Emits the resized dimensions,
    * exact per-channel sums over the kept pixels, and an md5 over the
    * resized BGR bytes' lowercase hex — the digest pins pixel VALUES and
    * assembly ORDER, so an off-by-one in stride, sampling phase, or
    * channel order diverges immediately.
    */
  final class BmpResizer {
    private val inner = new BmpDecoder
    def resize(docId: Long, bytes: Array[Byte]): BmpResized = {
      val (dataOff, w, rows) = inner.header(docId, bytes)
      val stride = ((w * 3 + 3) / 4) * 4
      val outW = (w + 1) / 2; val outH = (rows + 1) / 2
      val hexDigits = "0123456789abcdef"
      val hx = new java.lang.StringBuilder(outW * outH * 6)
      var sb = 0L; var sg = 0L; var sr = 0L
      var row = 0
      while (row < rows) {
        val base = dataOff + row * stride
        var x = 0
        while (x < w) {
          val p = base + x * 3
          val b = bytes(p) & 0xff; val g = bytes(p + 1) & 0xff; val r = bytes(p + 2) & 0xff
          sb += b; sg += g; sr += r
          hx.append(hexDigits(b >> 4)).append(hexDigits(b & 15))
            .append(hexDigits(g >> 4)).append(hexDigits(g & 15))
            .append(hexDigits(r >> 4)).append(hexDigits(r & 15))
          x += 2
        }
        row += 2
      }
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(hx.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val digest = md.map(b => f"${b & 0xff}%02x").mkString
      BmpResized(docId, w.toLong, rows.toLong, outW.toLong, outH.toLong,
        outW.toLong * outH, sb, sg, sr, digest)
    }
  }

  case class AHash(doc_id: Long, hash_lo: Long, hash_hi: Long)

  /** Average-hash perceptual fingerprint over a decoded 16x8 24bpp BMP:
    * 8x8 brightness blocks (2 adjacent pixels each, brightness = B+G+R),
    * bit i set iff block_i's sum * 64 > the image total (strict, so ties
    * clear — integer cross-multiplication, no division anywhere). The 64
    * bits are packed as two POSITIVE 32-bit halves so band extraction
    * and XOR never touch a sign bit on either engine.
    */
  final class AHasher {
    private val inner = new BmpDecoder

    /** The shared 8x8 block-luma grid: blockSums(row*8 + x/2) is the sum
      * of B+G+R over the block's 2 pixels — ahash thresholds it against
      * the image mean, PHasher pushes it through the integer DCT.
      */
    def blockSums(docId: Long, bytes: Array[Byte]): Array[Long] = {
      val (dataOff, w, rows) = inner.header(docId, bytes)
      require(w == 16 && rows == 8,
        s"doc $docId: ahash expects a 16x8 thumbnail, got ${w}x$rows")
      val sums = new Array[Long](64)
      var r = 0
      while (r < 8) {
        val base = dataOff + r * 48
        var x = 0
        while (x < 16) {
          val p = base + x * 3
          val s = (bytes(p) & 0xff) + (bytes(p + 1) & 0xff) + (bytes(p + 2) & 0xff)
          sums(r * 8 + x / 2) += s
          x += 1
        }
        r += 1
      }
      sums
    }

    def hash(docId: Long, bytes: Array[Byte]): AHash = {
      val sums = blockSums(docId, bytes)
      var total = 0L
      var i = 0
      while (i < 64) { total += sums(i); i += 1 }
      var lo = 0L; var hi = 0L
      i = 0
      while (i < 64) {
        if (sums(i) * 64 > total) {
          if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
        }
        i += 1
      }
      AHash(docId, lo, hi)
    }
  }

  def ahashBmp(imgs: Dataset[WavPayload]): Dataset[AHash] = {
    implicit val enc = Encoders.product[AHash]
    imgs.mapPartitions { it =>
      val codec = new AHasher
      it.map(w => codec.hash(w.doc_id, w.payload))
    }
  }

  /** Integer 8x8 DCT-II basis, scaled by 8192 and rounded — shared
    * verbatim with the oracle SQL (MultimodalQueries interpolates these
    * exact longs as literals), so both engines run the identical
    * integer transform. basis(u)(x) = round(cos(pi*(2x+1)*u/16)*8192).
    */
  val dctBasis: Array[Array[Long]] = Array.tabulate(8, 8) { (u, x) =>
    math.round(math.cos(math.Pi * (2 * x + 1) * u / 16.0) * 8192.0)
  }

  /** pHash: the AHasher's 8x8 block-luma grid pushed through the integer
    * DCT above; bit i = u*8+v (i > 0 — DC carries only global brightness
    * and is dropped) set iff the AC coefficient is strictly positive.
    * Sign-of-DCT is the classic pHash decision rule re-expressed without
    * the float median so both engines agree bit-for-bit. Max |term| =
    * 1530 * 8192^2 and 64 terms keep every sum well inside a signed 64-bit
    * long.
    */
  final class PHasher {
    private val inner = new AHasher
    def hash(docId: Long, bytes: Array[Byte]): AHash = {
      val sums = inner.blockSums(docId, bytes)
      var lo = 0L; var hi = 0L
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          val i = u * 8 + v
          if (i > 0) {
            var f = 0L
            var r = 0
            while (r < 8) {
              var c = 0
              while (c < 8) {
                f += sums(r * 8 + c) * dctBasis(u)(r) * dctBasis(v)(c)
                c += 1
              }
              r += 1
            }
            if (f > 0) {
              if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
            }
          }
          v += 1
        }
        u += 1
      }
      AHash(docId, lo, hi)
    }
  }

  def phashBmp(imgs: Dataset[WavPayload]): Dataset[AHash] = {
    implicit val enc = Encoders.product[AHash]
    imgs.mapPartitions { it =>
      val codec = new PHasher
      it.map(w => codec.hash(w.doc_id, w.payload))
    }
  }

  def resizeBmp(imgs: Dataset[WavPayload]): Dataset[BmpResized] = {
    implicit val enc = Encoders.product[BmpResized]
    imgs.mapPartitions { it =>
      val codec = new BmpResizer
      it.map(w => codec.resize(w.doc_id, w.payload))
    }
  }

  def decodeBmp(imgs: Dataset[WavPayload]): Dataset[BmpStats] = {
    implicit val enc = Encoders.product[BmpStats]
    imgs.mapPartitions { it =>
      val codec = new BmpDecoder
      it.map(w => codec.decode(w.doc_id, w.payload))
    }
  }

  case class BmpHistBin(doc_id: Long, channel: String, bin: Long,
                        n: Long, share_bp: Long)

  /** Per-channel 4-bin (value >> 6) color histogram over the decoded
    * pixels — the canonical image-statistics artifact (flat/dim gates,
    * palette drift monitors). Emits all 12 (channel, bin) rows per
    * image, zero counts included; share_bp = n*10000/n_px stays
    * integer-exact.
    */
  final class BmpHistogrammer {
    private val dec = new BmpDecoder
    def histogram(docId: Long, bytes: Array[Byte]): Iterator[BmpHistBin] = {
      val (dataOff, w, rows) = dec.header(docId, bytes)
      val stride = ((w * 3 + 3) / 4) * 4
      val counts = Array.ofDim[Long](3, 4)
      var row = 0
      while (row < rows) {
        val base = dataOff + row * stride
        var c = 0
        while (c < w) {
          val p = base + c * 3
          counts(0)((bytes(p) & 0xff) >> 6) += 1
          counts(1)((bytes(p + 1) & 0xff) >> 6) += 1
          counts(2)((bytes(p + 2) & 0xff) >> 6) += 1
          c += 1
        }
        row += 1
      }
      val nPx = w.toLong * rows
      val chans = Array("b", "g", "r")
      (0 until 3).iterator.flatMap { ch =>
        (0 until 4).iterator.map { b =>
          BmpHistBin(docId, chans(ch), b.toLong, counts(ch)(b),
            counts(ch)(b) * 10000L / nPx)
        }
      }
    }
  }

  def histogramBmp(imgs: Dataset[WavPayload]): Dataset[BmpHistBin] = {
    implicit val enc = Encoders.product[BmpHistBin]
    imgs.mapPartitions { it =>
      val codec = new BmpHistogrammer
      it.flatMap(w => codec.histogram(w.doc_id, w.payload))
    }
  }

  case class BmpChannelMoments(doc_id: Long, n_px: Long,
                               sb: Long, sg: Long, sr: Long,
                               sbb: Long, sgg: Long, srr: Long,
                               sbg: Long, sbr: Long, sgr: Long)

  /** Exact first/second/cross moments of the B/G/R channels over a
    * parsed 24bpp BMP — the integer sufficient statistics for the
    * channel-correlation audit (de-facto grayscale detection). One
    * pixel walk per image; every sum is a Long, so the query layer's
    * correlation arithmetic is bit-reproducible cross-engine.
    */
  def channelMoments(imgs: Dataset[WavPayload]): Dataset[BmpChannelMoments] = {
    implicit val enc = Encoders.product[BmpChannelMoments]
    imgs.mapPartitions { it =>
      val codec = new BmpDecoder
      it.map { w =>
        val (dataOff, width, rows) = codec.header(w.doc_id, w.payload)
        val stride = ((width * 3 + 3) / 4) * 4
        var sb = 0L; var sg = 0L; var sr = 0L
        var sbb = 0L; var sgg = 0L; var srr = 0L
        var sbg = 0L; var sbr = 0L; var sgr = 0L
        var row = 0
        while (row < rows) {
          val base = dataOff + row * stride
          var c = 0
          while (c < width) {
            val p = base + c * 3
            val b = (w.payload(p) & 0xff).toLong
            val g = (w.payload(p + 1) & 0xff).toLong
            val r = (w.payload(p + 2) & 0xff).toLong
            sb += b; sg += g; sr += r
            sbb += b * b; sgg += g * g; srr += r * r
            sbg += b * g; sbr += b * r; sgr += g * r
            c += 1
          }
          row += 1
        }
        BmpChannelMoments(w.doc_id, width.toLong * rows,
          sb, sg, sr, sbb, sgg, srr, sbg, sbr, sgr)
      }
    }
  }

  case class BmpPatch(doc_id: Long, patch_row: Long, patch_col: Long,
                      n_px: Long, lum_sum: Long, mean_e2: Long)

  /** ViT-style patch grid over a parsed 24bpp BMP: 4x4-pixel patches in
    * STORAGE row order, each reduced to pixel count + exact integer
    * luminance sum (b+g+r per pixel) + scaled mean — the patching/
    * pooling pass a vision-encoder preprocessing pipeline runs per
    * image before embedding. One pixel walk per image; edge patches
    * (height not divisible by 4) keep their true pixel counts.
    */
  def patchGrid(imgs: Dataset[WavPayload]): Dataset[BmpPatch] = {
    implicit val enc = Encoders.product[BmpPatch]
    imgs.mapPartitions { it =>
      val codec = new BmpDecoder
      it.flatMap { w =>
        val (dataOff, width, rows) = codec.header(w.doc_id, w.payload)
        val stride = ((width * 3 + 3) / 4) * 4
        val pCols = (width + 3) / 4
        val pRows = (rows + 3) / 4
        val sums = Array.ofDim[Long](pRows * pCols)
        val cnts = Array.ofDim[Long](pRows * pCols)
        var row = 0
        while (row < rows) {
          val base = dataOff + row * stride
          var c = 0
          while (c < width) {
            val p = base + c * 3
            val lum = (w.payload(p) & 0xff).toLong +
              (w.payload(p + 1) & 0xff) + (w.payload(p + 2) & 0xff)
            val idx = (row / 4) * pCols + c / 4
            sums(idx) += lum
            cnts(idx) += 1
            c += 1
          }
          row += 1
        }
        (0 until pRows * pCols).iterator.filter(cnts(_) > 0).map { idx =>
          BmpPatch(w.doc_id, (idx / pCols).toLong, (idx % pCols).toLong,
            cnts(idx), sums(idx), sums(idx) * 100 / (3 * cnts(idx)))
        }
      }
    }
  }

  case class AudioSnr(doc_id: Long, n_frames: Long, e10: Long, e90: Long,
                      snr_db: Double)

  /** PCM frame-energy SNR proxy over a RAW little-endian int16 sample
    * stream (no container — the payload IS the samples): per-16-sample
    * frame energies in one walk, nearest-rank p10/p90 from one in-row
    * sort (bounded by the PAYLOAD length, never the corpus), and the
    * dB ratio rounded exactly as Spark's `round` (HALF_UP on the
    * Double.toString decimal) so the value matches what the previous
    * expression pipeline — and the DuckDB oracle — emit bit-for-bit.
    * Replaces a per-sample explode + 2 hex conv per sample (~15× the
    * walk's constant at sf0.1).
    */
  def audioSnr(pcm: Dataset[WavPayload]): Dataset[AudioSnr] = {
    implicit val enc = Encoders.product[AudioSnr]
    pcm.mapPartitions { it =>
      val dec = new WavDecoder
      it.map { w =>
        val nSamp = w.payload.length / 2
        val nFrames = nSamp / 16
        val es = new Array[Long](nFrames)
        var f = 0
        while (f < nFrames) {
          var e = 0L
          var i = f * 16
          val end = i + 16
          while (i < end) {
            val v = dec.s16(w.payload, 2 * i).toLong
            e += v * v
            i += 1
          }
          es(f) = e
          f += 1
        }
        // guard the short-payload case HERE (not only at the call
        // site's length filter): a sub-frame payload gets a 0-frame
        // row instead of an ArrayIndexOutOfBounds inside a task
        if (nFrames == 0) AudioSnr(w.doc_id, 0L, 0L, 0L, 0.0)
        else {
          java.util.Arrays.sort(es)
          val e10 = es(((nFrames - 1) * 10) / 100)
          val e90 = es(((nFrames - 1) * 90) / 100)
          val snr = 10.0 * math.log(e90.toDouble / math.max(e10, 1L).toDouble) /
            math.log(10.0)
          val snr4 = BigDecimal(java.math.BigDecimal.valueOf(snr))
            .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
          AudioSnr(w.doc_id, nFrames.toLong, e10, e90, snr4)
        }
      }
    }
  }

  /** Scaled-integer DFT basis for the 4-bin spectral profile:
    * cos/sin(2π·k·j/64)·8192 rounded, k ∈ {1,2,4,8}, j ∈ 0..63 —
    * shared verbatim with the DuckDB oracle (the dctBasis discipline).
    */
  val dftBins: Array[Int] = Array(1, 2, 4, 8)
  val dftCos: Array[Array[Long]] = dftBins.map(k =>
    Array.tabulate(64)(j => math.round(math.cos(2 * math.Pi * k * j / 64.0) * 8192.0)))
  val dftSin: Array[Array[Long]] = dftBins.map(k =>
    Array.tabulate(64)(j => math.round(math.sin(2 * math.Pi * k * j / 64.0) * 8192.0)))

  case class SpectralProfile(doc_id: Long, n_frames: Long,
                             e1: Long, e2: Long, e4: Long, e8: Long,
                             dominant_k: Long)

  /** 4-bin DFT spectral profile over a RAW little-endian int16 sample
    * stream: per complete 64-sample frame and bin k, the energy
    * (Σ s·cos)²+(Σ s·sin)² with both correlations scaled down by the
    * basis factor (div 8192, truncating — the oracle's `//`) BEFORE
    * squaring so every intermediate stays far inside a long; energies
    * sum over frames. The dominant bin (ties → lowest k) is the
    * tone-vs-noise gate: speech/music concentrates low bins, hiss is
    * flat. One sample walk per doc, exact integers end to end.
    */
  def spectralProfile(pcm: Dataset[WavPayload]): Dataset[SpectralProfile] = {
    implicit val enc = Encoders.product[SpectralProfile]
    pcm.mapPartitions { it =>
      val dec = new WavDecoder
      it.map { w =>
        val nSamp = w.payload.length / 2
        val nFrames = nSamp / 64
        val e = new Array[Long](4)
        var f = 0
        while (f < nFrames) {
          var k = 0
          while (k < 4) {
            var c = 0L
            var s = 0L
            var j = 0
            while (j < 64) {
              val v = dec.s16(w.payload, 2 * (f * 64 + j)).toLong
              c += v * dftCos(k)(j)
              s += v * dftSin(k)(j)
              j += 1
            }
            val cq = c / 8192L
            val sq = s / 8192L
            e(k) += cq * cq + sq * sq
            k += 1
          }
          f += 1
        }
        var dom = 0
        var k = 1
        while (k < 4) {
          if (e(k) > e(dom)) dom = k // ties keep the lower bin
          k += 1
        }
        SpectralProfile(w.doc_id, nFrames.toLong, e(0), e(1), e(2), e(3),
          dftBins(dom).toLong)
      }
    }
  }

  case class SobelStats(doc_id: Long, width: Long, height: Long,
                        n_interior: Long, edge_energy: Long, n_edge_px: Long,
                        edge_bp: Long)

  /** Sobel gradient scan over a RAW byte stream viewed as a 16-wide
    * 8-bit grayscale image (height = len/16): per interior pixel,
    * |Gx| + |Gy| with the standard 3×3 kernels, summed to an exact
    * edge-energy integer plus the count of pixels clearing the
    * magnitude-128 edge threshold (density in bp). The texture/
    * blankness gate a vision-ingest pipeline runs before anything
    * expensive — one byte walk per image, integer-exact.
    */
  def sobelStats(imgs: Dataset[WavPayload]): Dataset[SobelStats] = {
    implicit val enc = Encoders.product[SobelStats]
    imgs.mapPartitions { it =>
      it.map { w =>
        val h = w.payload.length / 16
        def p(x: Int, y: Int): Int = w.payload(y * 16 + x) & 0xff
        var energy = 0L
        var nEdge = 0L
        var y = 1
        while (y < h - 1) {
          var x = 1
          while (x < 15) {
            val gx = (p(x + 1, y - 1) + 2 * p(x + 1, y) + p(x + 1, y + 1)) -
              (p(x - 1, y - 1) + 2 * p(x - 1, y) + p(x - 1, y + 1))
            val gy = (p(x - 1, y + 1) + 2 * p(x, y + 1) + p(x + 1, y + 1)) -
              (p(x - 1, y - 1) + 2 * p(x, y - 1) + p(x + 1, y - 1))
            val m = math.abs(gx) + math.abs(gy)
            energy += m
            if (m > 128) nEdge += 1
            x += 1
          }
          y += 1
        }
        val nInt = math.max((h - 2).toLong, 0L) * 14L
        SobelStats(w.doc_id, 16L, h.toLong, nInt, energy, nEdge,
          if (nInt > 0) nEdge * 10000L / nInt else 0L)
      }
    }
  }

  case class PaletteQuant(doc_id: Long, n_px: Long, dominant_pk: Long,
                          coverage_bp: Long)

  /** Palette quantization over a RAW BGR byte stream (3 bytes/pixel,
    * h*16 pixels where h = len/48): every pixel snaps to the nearest of
    * the 8 1-bit RGB corner colors (exact integer L2, ties to the
    * smallest palette index), dominant entry and its coverage in exact
    * basis points. One byte walk and 8 counters per image — replaces a
    * per-pixel explode with 3 hex parses + an 8-way struct argmin per
    * row.
    */
  def quantizePalette(imgs: Dataset[WavPayload]): Dataset[PaletteQuant] = {
    implicit val enc = Encoders.product[PaletteQuant]
    imgs.mapPartitions { it =>
      it.map { w =>
        val h = w.payload.length / 48
        val nPx = h * 16
        val counts = new Array[Long](8)
        var i = 0
        while (i < nPx) {
          val b = w.payload(i * 3) & 0xff
          val g = w.payload(i * 3 + 1) & 0xff
          val r = w.payload(i * 3 + 2) & 0xff
          var bestK = 0
          var bestD = Long.MaxValue
          var k = 0
          while (k < 8) {
            val db = (b - (k & 1) * 255).toLong
            val dg = (g - ((k >> 1) & 1) * 255).toLong
            val dr = (r - ((k >> 2) & 1) * 255).toLong
            val dist = db * db + dg * dg + dr * dr
            if (dist < bestD) { bestD = dist; bestK = k } // ties keep smaller k
            k += 1
          }
          counts(bestK) += 1
          i += 1
        }
        var dom = 0
        var k = 1
        while (k < 8) {
          if (counts(k) > counts(dom)) dom = k // ties keep smaller pk
          k += 1
        }
        // sub-pixel payload -> 0-row stats, not ArithmeticException
        // (the sobelStats nInt>0 discipline)
        PaletteQuant(w.doc_id, nPx.toLong, dom.toLong,
          if (nPx > 0) counts(dom) * 10000L / nPx else 0L)
      }
    }
  }

  /** Distributed decode: one codec instance per partition, streamed. */
  def decodeWav(wavs: Dataset[WavPayload]): Dataset[WavFrame] = {
    implicit val enc = Encoders.product[WavFrame]
    wavs.mapPartitions { it =>
      val codec = new WavDecoder // once per partition, not per row
      it.flatMap(w => codec.decode(w.doc_id, w.payload))
    }
  }
}
