package graft.multimodal

import graft.{Query, Tables}
import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.6).
  *
  * Media payloads are opaque `binary` columns with typed metadata — the
  * pattern a 100 TB image/audio corpus uses (payload bytes + extracted
  * metadata travel together; decode happens in batch UDFs at the edge).
  * This container has no media codecs, so the PAYLOAD here is the
  * document text's utf-8 bytes (deterministic fake) while the Spark-side
  * plumbing — binary columns, metadata extraction, frame slicing — is
  * real and oracle-checked where SQL-expressible.
  *
  * Codec walks deliberately stay ZERO-SHUFFLE (scan → mapPartitions):
  * at corpus scale the payload bytes ARE the data volume, so a
  * repartition would shuffle the whole corpus to save per-core decode
  * time the scan's own splits already provide. The single-file test
  * corpus therefore decodes on few cores — a test-layout artifact,
  * accepted; the plan shape is the one that ships (PlanSpec pins it).
  */
object MultimodalQueries {

  /** Little-endian uint32 as 8 hex chars — the byte order RIFF headers
    * use. Built from the big-endian hex by swapping byte pairs.
    */
  private def leHex32(c: Column): Column = {
    val h = lpad(lower(hex(c.cast("long"))), 8, "0")
    concat(substring(h, 7, 2), substring(h, 5, 2), substring(h, 3, 2), substring(h, 1, 2))
  }

  // ---- shared aHash machinery (mm_ahash_neardup + media curation) ----

  /** 16x8 BMP head images (first 384 text bytes) for docs big enough. */
  private def ahashImgs(s: org.apache.spark.sql.SparkSession, d: String) = {
    import graft.multimodal.FrameFeatures.WavPayload
    val bin = col("text").cast("binary")
    val bmpHex = concat(
      lit("424d"), leHex32(lit(384 + 54)), lit("00000000"),
      lit("36000000"), lit("28000000"),
      lit("10000000"), leHex32(lit(8)),
      lit("0100"), lit("1800"), lit("00000000"),
      leHex32(lit(384)), lit("130b0000130b0000"),
      lit("0000000000000000"),
      lower(hex(bin)).substr(lit(1), lit(768)))
    Tables.documents(s, d)
      .filter(length(bin) >= 384)
      .select(col("doc_id"), unhex(bmpHex).as("payload"))
      .as[WavPayload](Encoders.product[WavPayload])
  }

  /** (doc_id, hash_lo, hash_hi, band_idx, bkey) — 4 x 16-bit bands. */
  private def ahashBands(hashes: org.apache.spark.sql.DataFrame) = {
    val bandStructs = (0 until 4).map { b =>
      val bkey = b match {
        case 0 => col("hash_lo").bitwiseAND(65535)
        case 1 => shiftright(col("hash_lo"), 16).bitwiseAND(65535)
        case 2 => col("hash_hi").bitwiseAND(65535)
        case 3 => shiftright(col("hash_hi"), 16).bitwiseAND(65535)
      }
      struct(lit(b).as("band_idx"), bkey.as("bkey"))
    }
    hashes
      .select(col("doc_id"), col("hash_lo"), col("hash_hi"),
        explode(array(bandStructs: _*)).as("bd"))
      .select(col("doc_id"), col("hash_lo"), col("hash_hi"),
        col("bd.band_idx").as("band_idx"), col("bd.bkey").as("bkey"))
  }

  /** Near-dup pairs (da < db, hamming <= maxHam) from the band join. */
  private def ahashPairs(bands: org.apache.spark.sql.DataFrame, maxHam: Int) = {
    val ham = (bit_count(col("la").bitwiseXOR(col("lb"))) +
      bit_count(col("ha").bitwiseXOR(col("hb")))).cast("long")
    bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("a.hash_lo").as("la"), col("a.hash_hi").as("ha"),
        col("b.doc_id").as("db"), col("b.hash_lo").as("lb"), col("b.hash_hi").as("hb"))
      .distinct()
      .select(col("da"), col("db"), ham.as("hamming"))
      .filter(col("hamming") <= maxHam)
  }

  /** Shared oracle prefix: the 8x8 block-luma grid `bs(doc_id, blk, s)`
    * recomputed from the raw text bytes (the BMP payload is built from
    * those same bytes) — consumed by both the ahash mean-threshold and
    * the pHash integer DCT.
    */
  private val blockSumsCteSql =
    """d AS (SELECT doc_id, lower(hex(encode(text))) AS hx
      |      FROM documents WHERE octet_length(encode(text)) >= 384),
      |b AS (SELECT doc_id, (i // 48) * 8 + ((i % 48) // 6) AS blk,
      |             CAST('0x' || substr(hx, i*2 + 1, 2) AS BIGINT) AS v
      |      FROM (SELECT doc_id, hx, unnest(generate_series(0, 383)) AS i FROM d)),
      |bs AS (SELECT doc_id, blk, SUM(v) AS s FROM b GROUP BY 1, 2)""".stripMargin

  /** Oracle twin of the aHash computation — extends the block-sum grid
    * to `h(doc_id, lo, hi)` (mean-threshold bits, split 32/32) and
    * `bands(doc_id, lo, hi, band_idx, bkey)` (16-bit LSH bands).
    */
  private val ahashCteSql =
    blockSumsCteSql + """,
      |tot AS (SELECT doc_id, SUM(s) AS total FROM bs GROUP BY 1),
      |h AS (SELECT bs.doc_id,
      |        CAST(SUM(CASE WHEN s*64 > total AND blk < 32
      |                      THEN (CAST(1 AS BIGINT) << CAST(blk AS INT)) ELSE 0 END) AS BIGINT) AS lo,
      |        CAST(SUM(CASE WHEN s*64 > total AND blk >= 32
      |                      THEN (CAST(1 AS BIGINT) << CAST(blk - 32 AS INT)) ELSE 0 END) AS BIGINT) AS hi
      |      FROM bs JOIN tot ON bs.doc_id = tot.doc_id GROUP BY 1),
      |bands AS (SELECT doc_id, lo, hi, bb.b AS band_idx,
      |            CASE bb.b WHEN 0 THEN lo & 65535 WHEN 1 THEN (lo >> 16) & 65535
      |                      WHEN 2 THEN hi & 65535 ELSE (hi >> 16) & 65535 END AS bkey
      |          FROM h CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) bb)""".stripMargin

  /** The integer DCT basis as SQL VALUES rows `(u, x, c)` — the same
    * longs PHasher multiplies with, so the oracle transform is
    * literally identical.
    */
  private lazy val dctValsSql: String =
    FrameFeatures.dctBasis.zipWithIndex.flatMap { case (row, u) =>
      row.zipWithIndex.map { case (c, x) => s"($u, $x, $c)" }
    }.mkString(", ")

  /** The 4-bin DFT basis as literal SQL rows `(k, j, c, sn)` — the
    * same scaled longs FrameFeatures.spectralProfile multiplies with.
    */
  private lazy val dftValsSql: String =
    FrameFeatures.dftBins.zipWithIndex.flatMap { case (k, ki) =>
      (0 until 64).map { j =>
        s"($k, $j, ${FrameFeatures.dftCos(ki)(j)}::BIGINT, ${FrameFeatures.dftSin(ki)(j)}::BIGINT)"
      }
    }.mkString(", ")

  /** The JPEG codec's integer tables as literal SQL rows — the exact
    * longs JpegCodec multiplies/divides with, so the oracle's
    * FDCT/quant/IDCT replay is literally the same arithmetic: the
    * 8192-scaled DCT basis `bs`, the c(u) multipliers `cc`, and the
    * Annex-K quant tables `ql`/`qc` in natural order.
    */
  private lazy val jpegTablesSql: String = {
    // every numeric lands as BIGINT: the INT32 literals would overflow
    // in the D*q / basis-product arithmetic
    val ccVals = JpegCodec.cScale.zipWithIndex
      .map { case (c, u) => s"($u, ${c}::BIGINT)" }.mkString(", ")
    val qlVals = JpegCodec.qLuma.zipWithIndex
      .map { case (q, i) => s"($i, ${q}::BIGINT)" }.mkString(", ")
    val qcVals = JpegCodec.qChroma.zipWithIndex
      .map { case (q, i) => s"($i, ${q}::BIGINT)" }.mkString(", ")
    val bsVals = FrameFeatures.dctBasis.zipWithIndex.flatMap { case (row, u) =>
      row.zipWithIndex.map { case (c, x) => s"($u, $x, ${c}::BIGINT)" }
    }.mkString(", ")
    s"""bs AS (SELECT * FROM (VALUES $bsVals) AS t(u, x, c)),
       |cc AS (SELECT * FROM (VALUES $ccVals) AS t(u, c)),
       |ql AS (SELECT * FROM (VALUES $qlVals) AS t(idx, q)),
       |qc AS (SELECT * FROM (VALUES $qcVals) AS t(idx, q))""".stripMargin
  }

  val entries: Seq[(String, Query)] = Seq(

    // REAL PNG round trip: each document's head bytes become an 8-bit
    // grayscale image, PngCodec.encode builds a genuine PNG (zlib IDAT
    // via Deflater, per-row filters cycling through all five types,
    // CRC-32 chunks), and PngDecoder reverses it: chunk walk + CRC
    // verification, Inflater, filter reconstruction. Decoded pixels must
    // equal the original bytes, so the oracle checks the WHOLE deflate/
    // filter round trip from raw byte arithmetic — the px_md5 pins
    // values and order. A filter, stride, or inflate bug diverges here.
    "mm_png_decode" -> Query(
      (s, d) => {
        import graft.multimodal.FrameFeatures.WavPayload
        val bin = col("text").cast("binary")
        val imgs = Tables.documents(s, d)
          .filter(length(bin) >= 16)
          .select(col("doc_id"),
            expr("substring(cast(text as binary), 1, " +
              "16 * (length(cast(text as binary)) div 16))").as("payload"))
          .as[WavPayload](Encoders.product[WavPayload])
        PngCodec.roundtrip(imgs, 16).toDF()
      },
      Some("""WITH d AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
             |                  octet_length(encode(text)) // 16 AS h
             |           FROM documents WHERE octet_length(encode(text)) >= 16),
             |b AS (SELECT doc_id, h, i, substr(hx, i*2 + 1, 2) AS bh,
             |             CAST('0x' || substr(hx, i*2 + 1, 2) AS BIGINT) AS v
             |      FROM (SELECT doc_id, hx, h,
             |              unnest(generate_series(0, h*16 - 1)) AS i FROM d))
             |SELECT doc_id, CAST(16 AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
             |  CAST(16*h AS BIGINT) AS n_px, CAST(SUM(v) AS BIGINT) AS sum_px,
             |  CAST(MIN(v) AS BIGINT) AS min_px, CAST(MAX(v) AS BIGINT) AS max_px,
             |  md5(string_agg(bh, '' ORDER BY i)) AS px_md5
             |FROM b GROUP BY doc_id, h""".stripMargin)
    ),

    // REAL container decode: each document's UTF-8 bytes become the PCM
    // payload of a genuine RIFF/WAVE file (44-byte header built field by
    // field in the scan — the blob would open in any audio tool), then
    // FrameFeatures.WavDecoder parses the container back: chunk walk,
    // magic/fmt validation, per-128-sample frame stats over the int16
    // LE samples. The oracle never sees the container — it recomputes
    // the sample stats from the raw text bytes by hex arithmetic and
    // the header fields from the same construction formula, so a decoder
    // that mis-parses offsets, endianness, or sign diverges immediately.
    // Integer-exact end to end.
    "mm_wav_decode" -> Query(
      (s, d) => {
        import graft.multimodal.FrameFeatures.WavPayload
        val bin = col("text").cast("binary")
        val nBytes = length(bin)
        val dataSize = nBytes - nBytes % 2 // whole int16 samples only
        val rate = (lit(8000) + (col("doc_id") % 3) * 4000).cast("int")
        val wavHex = concat(
          lit("52494646"), leHex32(dataSize + 36), lit("57415645"), // RIFF size WAVE
          lit("666d7420"), lit("10000000"),                         // fmt , 16
          lit("0100"), lit("0100"),                                 // PCM, mono
          leHex32(rate), leHex32(rate * 2),                         // rate, byte rate
          lit("0200"), lit("1000"),                                 // align 2, 16 bit
          lit("64617461"), leHex32(dataSize),                       // data, size
          lower(hex(bin)).substr(lit(1), dataSize * 2))
        val wavs = Tables.documents(s, d)
          .filter(nBytes >= 2)
          .select(col("doc_id"), unhex(wavHex).as("payload"))
          .as[WavPayload](Encoders.product[WavPayload])
        FrameFeatures.decodeWav(wavs).toDF()
      },
      Some("""WITH d AS (
             |  SELECT doc_id, lower(hex(encode(text))) AS hx,
             |         octet_length(encode(text)) // 2 AS n_samp,
             |         8000 + (doc_id % 3) * 4000 AS rate
             |  FROM documents
             |  WHERE octet_length(encode(text)) >= 2),
             |u AS (SELECT doc_id, rate, hx,
             |        unnest(generate_series(0, n_samp - 1)) AS i FROM d),
             |s AS (SELECT doc_id, rate, i // 128 AS frame_id,
             |        CAST('0x' || substr(hx, i*4 + 3, 2) || substr(hx, i*4 + 1, 2) AS INT) AS v
             |      FROM u),
             |sg AS (SELECT doc_id, rate, frame_id,
             |         CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS samp FROM s)
             |SELECT doc_id, CAST(rate AS BIGINT) AS sample_rate,
             |  CAST(1 AS BIGINT) AS n_channels, CAST(16 AS BIGINT) AS bits_per_sample,
             |  CAST(frame_id AS BIGINT) AS frame_id,
             |  CAST(COUNT(*) AS BIGINT) AS n_samples,
             |  CAST(SUM(samp) AS BIGINT) AS sum_samples,
             |  CAST(MIN(samp) AS BIGINT) AS min_sample,
             |  CAST(MAX(samp) AS BIGINT) AS max_sample
             |FROM sg GROUP BY doc_id, rate, frame_id""".stripMargin)
    ),

    // Audio FEATURE EXTRACTION over the real container: the same PCM
    // WAVs as mm_wav_decode, walked once per doc for zero-crossing
    // count, exact |amplitude| sum, and peak — the classic
    // speech/music/noise triage features. Integer-exact end to end;
    // the oracle recomputes the sign-flip count with a lag window over
    // byte-parsed samples, so an off-by-one in the walk (first sample,
    // sign convention, truncated tail byte) diverges immediately.
    "mm_wav_features" -> Query(
      (s, d) => {
        import graft.multimodal.FrameFeatures.WavPayload
        val bin = col("text").cast("binary")
        val nBytes = length(bin)
        val dataSize = nBytes - nBytes % 2
        val rate = (lit(8000) + (col("doc_id") % 3) * 4000).cast("int")
        val wavHex = concat(
          lit("52494646"), leHex32(dataSize + 36), lit("57415645"),
          lit("666d7420"), lit("10000000"),
          lit("0100"), lit("0100"),
          leHex32(rate), leHex32(rate * 2),
          lit("0200"), lit("1000"),
          lit("64617461"), leHex32(dataSize),
          lower(hex(bin)).substr(lit(1), dataSize * 2))
        val wavs = Tables.documents(s, d)
          .filter(nBytes >= 2)
          .select(col("doc_id"), unhex(wavHex).as("payload"))
          .as[WavPayload](Encoders.product[WavPayload])
        FrameFeatures.wavFeatures(wavs).toDF()
      },
      Some("""WITH d AS (
             |  SELECT doc_id, lower(hex(encode(text))) AS hx,
             |         octet_length(encode(text)) // 2 AS n_samp
             |  FROM documents
             |  WHERE octet_length(encode(text)) >= 2),
             |u AS (SELECT doc_id, hx, unnest(generate_series(0, n_samp - 1)) AS i FROM d),
             |s AS (SELECT doc_id, i,
             |        CAST('0x' || substr(hx, i*4 + 3, 2) || substr(hx, i*4 + 1, 2) AS INT) AS v
             |      FROM u),
             |sg AS (SELECT doc_id, i,
             |         CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS samp FROM s),
             |z AS (SELECT doc_id, samp,
             |        CASE WHEN lag(samp) OVER w IS NOT NULL
             |              AND (samp >= 0) != (lag(samp) OVER w >= 0)
             |             THEN 1 ELSE 0 END AS zc
             |      FROM sg WINDOW w AS (PARTITION BY doc_id ORDER BY i))
             |SELECT doc_id, COUNT(*) AS n_samples,
             |  CAST(SUM(zc) AS BIGINT) AS zero_crossings,
             |  CAST(SUM(abs(samp)) AS BIGINT) AS sum_abs,
             |  CAST(MAX(abs(samp)) AS BIGINT) AS peak
             |FROM z GROUP BY doc_id""".stripMargin)
    ),

    // Audio RATE CONVERSION over the real container: decimate-by-2
    // resampling (every other sample) of the same PCM WAVs, one walk
    // per doc in the sanctioned mapPartitions codec. The oracle
    // recomputes the output stream by hex arithmetic at input stride 2
    // — the position-weighted digest (Σ samp·((j mod 31)+1)) pins the
    // output ORDER, not just its order-independent sums, so a stride
    // or reassembly bug diverges even when totals agree. Integer-exact;
    // plans as one scan with zero shuffle like the other codecs.
    "mm_audio_resample" -> Query(
      (s, d) => {
        import graft.multimodal.FrameFeatures.WavPayload
        val bin = col("text").cast("binary")
        val nBytes = length(bin)
        val dataSize = nBytes - nBytes % 2
        val rate = (lit(8000) + (col("doc_id") % 3) * 4000).cast("int")
        val wavHex = concat(
          lit("52494646"), leHex32(dataSize + 36), lit("57415645"),
          lit("666d7420"), lit("10000000"),
          lit("0100"), lit("0100"),
          leHex32(rate), leHex32(rate * 2),
          lit("0200"), lit("1000"),
          lit("64617461"), leHex32(dataSize),
          lower(hex(bin)).substr(lit(1), dataSize * 2))
        val wavs = Tables.documents(s, d)
          .filter(nBytes >= 2)
          .select(col("doc_id"), unhex(wavHex).as("payload"))
          .as[WavPayload](Encoders.product[WavPayload])
        FrameFeatures.resampleWav(wavs).toDF()
      },
      Some("""WITH d AS (
             |  SELECT doc_id, lower(hex(encode(text))) AS hx,
             |         octet_length(encode(text)) // 2 AS n_in,
             |         8000 + (doc_id % 3) * 4000 AS rate
             |  FROM documents
             |  WHERE octet_length(encode(text)) >= 2),
             |u AS (SELECT doc_id, rate, n_in, hx,
             |        unnest(generate_series(0, (n_in + 1) // 2 - 1)) AS j FROM d),
             |s AS (SELECT doc_id, rate, n_in, j,
             |        CAST('0x' || substr(hx, j*8 + 3, 2) || substr(hx, j*8 + 1, 2) AS INT) AS v
             |      FROM u),
             |sg AS (SELECT doc_id, rate, n_in, j,
             |         CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS samp FROM s)
             |SELECT doc_id, CAST(rate // 2 AS BIGINT) AS sample_rate_out,
             |  CAST(n_in AS BIGINT) AS n_in, COUNT(*) AS n_out,
             |  CAST(SUM(samp) AS BIGINT) AS sum_out,
             |  CAST(MIN(samp) AS BIGINT) AS min_out,
             |  CAST(MAX(samp) AS BIGINT) AS max_out,
             |  CAST(SUM(samp * ((j % 31) + 1)) AS BIGINT) AS posw_digest
             |FROM sg GROUP BY doc_id, rate, n_in""".stripMargin)
    ),

    // Second real container format, IMAGE side: each document's bytes
    // become the 24bpp pixel array of a genuine BMP (16 px wide =>
    // 48-byte stride, 4-byte aligned by construction), and the
    // BmpDecoder parses the headers back and folds exact per-channel
    // BGR sums. Oracle: channel c of data byte i is i mod 3, so DuckDB
    // reproduces the sums by hex arithmetic without ever seeing the
    // container. Integer-exact end to end.
    "mm_bmp_decode" -> Query(
      (s, d) => {
        import graft.multimodal.FrameFeatures.WavPayload
        val bin = col("text").cast("binary")
        val nB = length(bin)
        val h = expr("length(cast(text as binary)) div 48")
        val dataSize = h * 48
        val bmpHex = concat(
          lit("424d"), leHex32(dataSize + 54), lit("00000000"), // BM, size, reserved
          lit("36000000"), lit("28000000"),                     // data offset 54, info 40
          lit("10000000"), leHex32(h),                          // width 16, height
          lit("0100"), lit("1800"), lit("00000000"),            // planes, 24bpp, raw
          leHex32(dataSize), lit("130b0000130b0000"),           // data size, 72dpi
          lit("0000000000000000"),                              // palette counts
          lower(hex(bin)).substr(lit(1), dataSize * 2))
        val imgs = Tables.documents(s, d)
          .filter(nB >= 48)
          .select(col("doc_id"), unhex(bmpHex).as("payload"))
          .as[WavPayload](Encoders.product[WavPayload])
        FrameFeatures.decodeBmp(imgs).toDF()
      },
      Some("""WITH d AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
             |                  octet_length(encode(text)) // 48 AS h
             |           FROM documents WHERE octet_length(encode(text)) >= 48),
             |b AS (SELECT doc_id, h, i, CAST('0x' || substr(hx, i*2 + 1, 2) AS BIGINT) AS v
             |      FROM (SELECT doc_id, hx, h,
             |              unnest(generate_series(0, h*48 - 1)) AS i FROM d))
             |SELECT doc_id, CAST(16 AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
             |  CAST(16*h AS BIGINT) AS n_px,
             |  CAST(SUM(CASE WHEN i % 3 = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_b,
             |  CAST(SUM(CASE WHEN i % 3 = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
             |  CAST(SUM(CASE WHEN i % 3 = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_r
             |FROM b GROUP BY doc_id, h""".stripMargin)
    ),

    // Image RESIZE over the real container: the same 24bpp BMPs as
    // mm_bmp_decode, nearest-neighbor 2x downsampled inside the
    // mapPartitions codec. The emitted md5 over the resized pixels' hex
    // pins pixel values AND assembly order (stride, sampling phase,
    // BGR order); the oracle rebuilds the identical byte string from the
    // raw text bytes — byte i of the pixel array is storage row i/48,
    // x (i%48)/3, channel i%3, kept iff row and x are even.
    "mm_image_resize" -> Query(
      (s, d) => {
        import graft.multimodal.FrameFeatures.WavPayload
        val bin = col("text").cast("binary")
        val nB = length(bin)
        val h = expr("length(cast(text as binary)) div 48")
        val dataSize = h * 48
        val bmpHex = concat(
          lit("424d"), leHex32(dataSize + 54), lit("00000000"),
          lit("36000000"), lit("28000000"),
          lit("10000000"), leHex32(h),
          lit("0100"), lit("1800"), lit("00000000"),
          leHex32(dataSize), lit("130b0000130b0000"),
          lit("0000000000000000"),
          lower(hex(bin)).substr(lit(1), dataSize * 2))
        val imgs = Tables.documents(s, d)
          .filter(nB >= 48)
          .select(col("doc_id"), unhex(bmpHex).as("payload"))
          .as[WavPayload](Encoders.product[WavPayload])
        FrameFeatures.resizeBmp(imgs).toDF()
      },
      Some("""WITH d AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
             |                  octet_length(encode(text)) // 48 AS h
             |           FROM documents WHERE octet_length(encode(text)) >= 48),
             |b AS (SELECT doc_id, h, i, substr(hx, i*2 + 1, 2) AS bh,
             |             CAST('0x' || substr(hx, i*2 + 1, 2) AS BIGINT) AS v,
             |             (i // 48) AS r, ((i % 48) // 3) AS x, (i % 3) AS ch
             |      FROM (SELECT doc_id, hx, h,
             |              unnest(generate_series(0, h*48 - 1)) AS i FROM d)),
             |samp AS (SELECT * FROM b WHERE r % 2 = 0 AND x % 2 = 0)
             |SELECT doc_id, CAST(16 AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
             |  CAST(8 AS BIGINT) AS out_w, CAST((h+1)//2 AS BIGINT) AS out_h,
             |  CAST(8*((h+1)//2) AS BIGINT) AS n_px_out,
             |  CAST(SUM(CASE WHEN ch = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_b,
             |  CAST(SUM(CASE WHEN ch = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
             |  CAST(SUM(CASE WHEN ch = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
             |  md5(string_agg(bh, '' ORDER BY i)) AS px_md5
             |FROM samp GROUP BY doc_id, h""".stripMargin)
    ),

    // Perceptual-hash image near-dup — the image analog of dedup_simhash,
    // run over DECODED pixels: each doc's first 384 bytes become a real
    // 16x8 24bpp BMP, the codec computes an 8x8-block average-hash
    // (bit = block brightness * 64 > image total, integer-exact), and
    // near-dup pairs come from a 4x16-bit banded Hamming join — an
    // O(n*bands) equi-join shuffle keyed on band value, never all-pairs,
    // so the plan scales to billions of images. The hash packs as two
    // positive 32-bit halves: band extraction and XOR never touch a
    // sign bit, which keeps shift semantics engine-identical (DuckDB
    // raises on 1<<63). The oracle recomputes blocks from raw bytes:
    // byte i belongs to block (i div 48)*8 + (i mod 48) div 6.
    "mm_ahash_neardup" -> Query(
      (s, d) => {
        val hashes = graft.Caches.scoped(
          FrameFeatures.ahashBmp(ahashImgs(s, d)).toDF())
        ahashPairs(ahashBands(hashes), maxHam = 12)
      },
      Some(s"""WITH $ahashCteSql,
             |cand AS (SELECT DISTINCT a.doc_id AS da, a.lo AS la, a.hi AS ha,
             |                         b.doc_id AS db, b.lo AS lb, b.hi AS hb
             |         FROM bands a JOIN bands b
             |           ON a.band_idx = b.band_idx AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
             |SELECT da, db,
             |  CAST(bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) AS BIGINT) AS hamming
             |FROM cand WHERE bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) <= 12""".stripMargin)
    ),

    // pHash NEAR-DUP: the decoded 8x8 block-luma grid pushed through an
    // INTEGER 8x8 DCT-II (basis = round(cos*8192), the exact longs
    // interpolated into the oracle below from FrameFeatures.dctBasis),
    // sign-of-AC-coefficient bits — robust to global brightness shifts
    // aHash is blind to, the standard second fingerprint in an image
    // curation stack. Same 4x16-bit banded Hamming equi-join as aHash:
    // candidates are O(n·bands), never all-pairs, and the decode is one
    // zero-shuffle mapPartitions scan.
    "mm_dct_phash" -> Query(
      (s, d) => {
        val hashes = graft.Caches.scoped(
          FrameFeatures.phashBmp(ahashImgs(s, d)).toDF())
        ahashPairs(ahashBands(hashes), maxHam = 12)
      },
      Some(s"""WITH $blockSumsCteSql,
             |cs AS (SELECT * FROM (VALUES $dctValsSql) AS t(u, x, c)),
             |phf AS (SELECT bs.doc_id, cu.u, cv.u AS v, SUM(bs.s * cu.c * cv.c) AS f
             |        FROM bs
             |        JOIN cs cu ON cu.x = bs.blk // 8
             |        JOIN cs cv ON cv.x = bs.blk % 8
             |        GROUP BY 1, 2, 3),
             |ph AS (SELECT doc_id,
             |         CAST(SUM(CASE WHEN f > 0 AND u*8+v > 0 AND u*8+v < 32
             |                       THEN (CAST(1 AS BIGINT) << CAST(u*8+v AS INT))
             |                       ELSE 0 END) AS BIGINT) AS lo,
             |         CAST(SUM(CASE WHEN f > 0 AND u*8+v >= 32
             |                       THEN (CAST(1 AS BIGINT) << CAST(u*8+v-32 AS INT))
             |                       ELSE 0 END) AS BIGINT) AS hi
             |       FROM phf GROUP BY 1),
             |pbands AS (SELECT doc_id, lo, hi, bb.b AS band_idx,
             |            CASE bb.b WHEN 0 THEN lo & 65535 WHEN 1 THEN (lo >> 16) & 65535
             |                      WHEN 2 THEN hi & 65535 ELSE (hi >> 16) & 65535 END AS bkey
             |          FROM ph CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) bb),
             |cand AS (SELECT DISTINCT a.doc_id AS da, a.lo AS la, a.hi AS ha,
             |                         b.doc_id AS db, b.lo AS lb, b.hi AS hb
             |         FROM pbands a JOIN pbands b
             |           ON a.band_idx = b.band_idx AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
             |SELECT da, db,
             |  CAST(bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) AS BIGINT) AS hamming
             |FROM cand WHERE bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) <= 12""".stripMargin)
    ),

    // END-TO-END media curation — the multimodal twin of
    // pipeline_corpus_curation: decode the image head of every
    // qualifying doc, fingerprint it, then verdict with precedence
    // dup_image (band-collides at Hamming <= 12 with a lower-id doc) >
    // flat_image (aHash bit count at the extremes — the blank/banner
    // case) > dim_image (integer cross-multiplied brightness band) >
    // kept. The only wide op is the band equi-join; brightness and bit
    // stats ride the same decoded pass, and the loser set comes back as
    // a left join flag, never a collect.
    "pipeline_media_curation" -> Query(
      (s, d) => {
        val imgs = ahashImgs(s, d)
        val hashes = graft.Caches.scoped(
          FrameFeatures.ahashBmp(imgs).toDF())
        val stats = FrameFeatures.decodeBmp(imgs).toDF()
          .select(col("doc_id"),
            (col("sum_b") + col("sum_g") + col("sum_r")).as("total"))
        val losers = ahashPairs(ahashBands(hashes), maxHam = 12)
          .select(col("db").as("doc_id")).distinct()
          .withColumn("is_dup", lit(1))
        val nbits = (bit_count(col("hash_lo")) + bit_count(col("hash_hi"))).cast("long")
        hashes.join(stats, Seq("doc_id"))
          .join(losers, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), nbits.as("nbits"), col("total"),
            when(col("is_dup") === 1, "dup_image")
              .when(nbits >= 44 || nbits <= 20, "flat_image")
              .when(col("total") * 1000 < lit(93500L) * 384, "dim_image")
              .otherwise("kept").as("verdict"))
      },
      Some(s"""WITH $ahashCteSql,
             |cand AS (SELECT DISTINCT a.doc_id AS da, a.lo AS la, a.hi AS ha,
             |                         b.doc_id AS db, b.lo AS lb, b.hi AS hb
             |         FROM bands a JOIN bands b
             |           ON a.band_idx = b.band_idx AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
             |losers AS (SELECT DISTINCT db AS doc_id FROM cand
             |           WHERE bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) <= 12),
             |st AS (SELECT h.doc_id,
             |         CAST(bit_count(h.lo) + bit_count(h.hi) AS BIGINT) AS nbits,
             |         t.total,
             |         h.doc_id IN (SELECT doc_id FROM losers) AS is_dup
             |       FROM h JOIN tot t ON h.doc_id = t.doc_id)
             |SELECT doc_id, nbits, CAST(total AS BIGINT) AS total,
             |  CASE WHEN is_dup THEN 'dup_image'
             |       WHEN nbits >= 44 OR nbits <= 20 THEN 'flat_image'
             |       WHEN total * 1000 < 93500 * 384 THEN 'dim_image'
             |       ELSE 'kept' END AS verdict
             |FROM st""".stripMargin)
    ),

    // Binary payload + typed metadata extraction: byte length (vs char
    // length), head-bytes hex signature ("magic number" sniffing), and
    // content digest. All codegen'd builtins over the binary column.
    "mm_binary_meta" -> Query(
      (s, d) => {
        val bin = col("text").cast("binary")
        Tables.documents(s, d).select(
          col("doc_id"),
          length(bin).cast("long").as("n_bytes"),
          lower(hex(substring(col("text"), 1, 8).cast("binary"))).as("head_hex"),
          md5(bin).as("payload_md5"),
          (length(bin) - length(col("text"))).cast("long").as("multibyte_extra"))
      },
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  lower(hex(encode(substr(text, 1, 8)))) AS head_hex,
             |  md5(text) AS payload_md5,
             |  CAST(octet_length(encode(text)) - length(text) AS BIGINT) AS multibyte_extra
             |FROM documents""".stripMargin)
    ),

    // Deterministic frame sampling over the binary payload: 64-byte
    // "frames", every 4th sampled, per-frame digest. The decode step a
    // real video pipeline would run on each frame is stubbed by an md5
    // over the frame's hex image (the oracle's DuckDB version has no
    // blob slicing, and hashing the hex is byte-equivalent evidence) —
    // the explode/slice plumbing and batch shape are the real thing.
    "mm_frame_sample" -> Query(
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .withColumn("n_bytes", length(col("payload")))
          .withColumn("hx", lower(hex(col("payload"))))
          .withColumn("n_frames", ceil(col("n_bytes") / 64.0).cast("int"))
          .withColumn("frame_id",
            explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(4))))
          .select(
            col("doc_id"),
            col("frame_id").cast("long").as("frame_id"),
            expr("md5(substring(hx, frame_id*128 + 1, 128))").as("frame_md5"),
            expr("length(substring(hx, frame_id*128 + 1, 128)) div 2").cast("long").as("frame_bytes")),
      Some("""SELECT doc_id, CAST(f AS BIGINT) AS frame_id,
             |  md5(substr(lower(hex(encode(text))), f*128 + 1, 128)) AS frame_md5,
             |  CAST(length(substr(lower(hex(encode(text))), f*128 + 1, 128)) // 2 AS BIGINT) AS frame_bytes
             |FROM (SELECT doc_id, text,
             |        unnest(generate_series(0,
             |          GREATEST(CAST(ceil(octet_length(encode(text)) / 64.0) AS INT) - 1, 0), 4)) AS f
             |      FROM documents)""".stripMargin)
    ),

    // Scene-cut detection over the synthetic frame stream: each doc's
    // payload is a video of 64-byte frames, each frame reduces to an
    // exact integer intensity (byte sum), and a cut is a consecutive-
    // frame delta above threshold — the keyframe selector a video
    // curation pipeline runs before sampling frames for captioning.
    // Frame sums are row-local (explode + in-frame fold); the only
    // non-local step is the per-video lag, a window keyed on the
    // (high-cardinality) video id — partition-friendly at any scale.
    // Integer arithmetic end to end, so both engines agree exactly.
    "mm_scene_cuts" -> Query(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_id"))
        // frame sums run in the native FrameByteSums expression (one
        // byte walk per row inside codegen) — the hex-substring +
        // aggregate-fold form cost 64 interpreted conv() frames per
        // frame, ~3 s flat at sf0.1
        Tables.documents(s, d)
          .select(col("doc_id"),
            length(col("text").cast("binary")).as("n_bytes"),
            graft.plans.TextExpressions.frameByteSums(col("text").cast("binary"), 64)
              .as("fsums"))
          .filter(col("n_bytes") >= 128)
          .select(col("doc_id"),
            posexplode(col("fsums")).as(Seq("frame_id", "fsum")))
          .withColumn("prev_sum", lag(col("fsum"), 1).over(w))
          .filter(col("prev_sum").isNotNull)
          .withColumn("delta", abs(col("fsum") - col("prev_sum")))
          .filter(col("delta") > 300)
          .select(col("doc_id"), col("frame_id").cast("long").as("frame_id"),
            col("prev_sum"), col("fsum"), col("delta"))
      },
      Some("""WITH d AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
             |    octet_length(encode(text)) AS n_bytes
             |  FROM documents WHERE octet_length(encode(text)) >= 128),
             |f AS (SELECT doc_id, hx,
             |    unnest(generate_series(0, CAST(n_bytes // 64 AS INT) - 1)) AS frame_id
             |  FROM d),
             |fs AS (SELECT doc_id, frame_id,
             |    CAST(list_sum(list_transform(generate_series(0, 63),
             |      i -> CAST('0x' || substr(hx, frame_id*128 + i*2 + 1, 2) AS BIGINT))) AS BIGINT) AS fsum
             |  FROM f),
             |l AS (SELECT doc_id, CAST(frame_id AS BIGINT) AS frame_id, fsum,
             |    lag(fsum) OVER (PARTITION BY doc_id ORDER BY frame_id) AS prev_sum
             |  FROM fs)
             |SELECT doc_id, frame_id, prev_sum, fsum,
             |  CAST(abs(fsum - prev_sum) AS BIGINT) AS delta
             |FROM l WHERE prev_sum IS NOT NULL AND abs(fsum - prev_sum) > 300""".stripMargin)
    ),

    // SHOT STATISTICS on top of scene-cut detection — the video-grain
    // summary a curation pipeline keys sampling decisions on (a
    // 1-shot static clip and a 40-cut montage want different frame
    // sampling rates): per video, frame/cut counts and the mean shot
    // length in x100 fixed point (shots = cuts + 1 over the frames
    // that have a predecessor). Same native FrameByteSums walk as
    // mm_scene_cuts; the rollup is one map-side agg.
    "mm_shot_stats" -> Query(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_id"))
        Tables.documents(s, d)
          .select(col("doc_id"),
            length(col("text").cast("binary")).as("n_bytes"),
            graft.plans.TextExpressions.frameByteSums(col("text").cast("binary"), 64)
              .as("fsums"))
          .filter(col("n_bytes") >= 128)
          .select(col("doc_id"),
            posexplode(col("fsums")).as(Seq("frame_id", "fsum")))
          .withColumn("prev_sum", lag(col("fsum"), 1).over(w))
          .filter(col("prev_sum").isNotNull)
          .groupBy(col("doc_id"))
          .agg((count(lit(1)) + 1).as("n_frames"),
            sum((abs(col("fsum") - col("prev_sum")) > 300).cast("long")).as("n_cuts"))
          .select(col("doc_id"), col("n_frames"), col("n_cuts"),
            (col("n_cuts") + 1).as("n_shots"),
            expr("n_frames * 100 div (n_cuts + 1)").as("mean_shot_len_x100"))
      },
      Some("""WITH d AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
             |    octet_length(encode(text)) AS n_bytes
             |  FROM documents WHERE octet_length(encode(text)) >= 128),
             |f AS (SELECT doc_id, hx,
             |    unnest(generate_series(0, CAST(n_bytes // 64 AS INT) - 1)) AS frame_id
             |  FROM d),
             |fs AS (SELECT doc_id, frame_id,
             |    CAST(list_sum(list_transform(generate_series(0, 63),
             |      i -> CAST('0x' || substr(hx, frame_id*128 + i*2 + 1, 2) AS BIGINT))) AS BIGINT) AS fsum
             |  FROM f),
             |l AS (SELECT doc_id, fsum,
             |    lag(fsum) OVER (PARTITION BY doc_id ORDER BY frame_id) AS prev_sum
             |  FROM fs),
             |g AS (SELECT doc_id, COUNT(*) + 1 AS n_frames,
             |    CAST(SUM(CAST(abs(fsum - prev_sum) > 300 AS BIGINT)) AS BIGINT) AS n_cuts
             |  FROM l WHERE prev_sum IS NOT NULL GROUP BY 1)
             |SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames, n_cuts,
             |  CAST(n_cuts + 1 AS BIGINT) AS n_shots,
             |  CAST(n_frames * 100 // (n_cuts + 1) AS BIGINT) AS mean_shot_len_x100
             |FROM g""".stripMargin)
    ),

    // COLOR HISTOGRAM over the real container: the same 24bpp BMPs as
    // mm_bmp_decode, folded to a per-channel 4-bin (value >> 6)
    // histogram inside the mapPartitions codec — the canonical image
    // statistic behind flat/dim gates, palette-drift monitors, and
    // cheap visual-dedup features. All 12 (channel, bin) rows emitted
    // per image (zero counts included) with integer-exact share_bp =
    // n*10000/n_px; the oracle rebuilds the identical counts from raw
    // byte arithmetic over a generated 12-row scaffold.
    "mm_rgb_histogram" -> Query(
      (s, d) => {
        import graft.multimodal.FrameFeatures.WavPayload
        val bin = col("text").cast("binary")
        val nB = length(bin)
        val h = expr("length(cast(text as binary)) div 48")
        val dataSize = h * 48
        val bmpHex = concat(
          lit("424d"), leHex32(dataSize + 54), lit("00000000"),
          lit("36000000"), lit("28000000"),
          lit("10000000"), leHex32(h),
          lit("0100"), lit("1800"), lit("00000000"),
          leHex32(dataSize), lit("130b0000130b0000"),
          lit("0000000000000000"),
          lower(hex(bin)).substr(lit(1), dataSize * 2))
        val imgs = Tables.documents(s, d)
          .filter(nB >= 48)
          .select(col("doc_id"), unhex(bmpHex).as("payload"))
          .as[WavPayload](Encoders.product[WavPayload])
        FrameFeatures.histogramBmp(imgs).toDF()
      },
      Some("""WITH d AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
             |                  octet_length(encode(text)) // 48 AS h
             |           FROM documents WHERE octet_length(encode(text)) >= 48),
             |b AS (SELECT doc_id, h, i % 3 AS ch,
             |        CAST('0x' || substr(hx, i*2 + 1, 2) AS BIGINT) // 64 AS bin
             |      FROM (SELECT doc_id, hx, h,
             |              unnest(generate_series(0, h*48 - 1)) AS i FROM d)),
             |cnt AS (SELECT doc_id, ch, bin, COUNT(*) AS n FROM b GROUP BY 1, 2, 3),
             |scaf AS (SELECT d.doc_id, d.h, cc.ch, bb.bin
             |         FROM d CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS ch) cc
             |                CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS bin) bb)
             |SELECT scaf.doc_id,
             |  CASE scaf.ch WHEN 0 THEN 'b' WHEN 1 THEN 'g' ELSE 'r' END AS channel,
             |  CAST(scaf.bin AS BIGINT) AS bin,
             |  CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n,
             |  CAST(COALESCE(cnt.n, 0) * 10000 // (16 * scaf.h) AS BIGINT) AS share_bp
             |FROM scaf LEFT JOIN cnt
             |  ON cnt.doc_id = scaf.doc_id AND cnt.ch = scaf.ch AND cnt.bin = scaf.bin""".stripMargin)
    ),

    // CLIPPING DETECTION over the real container: samples driven to
    // >= |30000| of the s16 full scale, plus the LONGEST consecutive
    // clipped run (one transient vs sustained distortion) and peak —
    // the audio-QA gate that rejects hot captures before transcription
    // or embedding spends anything. Same one-walk codec shape as
    // mm_wav_features; the oracle replays samples from hex and finds
    // runs with the gaps-and-islands grouping. Integer-exact.
    "mm_audio_clipping" -> Query(
      (s, d) => {
        import graft.multimodal.FrameFeatures.WavPayload
        val bin = col("text").cast("binary")
        val nBytes = length(bin)
        val dataSize = nBytes - nBytes % 2
        val rate = (lit(8000) + (col("doc_id") % 3) * 4000).cast("int")
        val wavHex = concat(
          lit("52494646"), leHex32(dataSize + 36), lit("57415645"),
          lit("666d7420"), lit("10000000"),
          lit("0100"), lit("0100"),
          leHex32(rate), leHex32(rate * 2),
          lit("0200"), lit("1000"),
          lit("64617461"), leHex32(dataSize),
          lower(hex(bin)).substr(lit(1), dataSize * 2))
        val wavs = Tables.documents(s, d)
          .filter(nBytes >= 2)
          .select(col("doc_id"), unhex(wavHex).as("payload"))
          .as[WavPayload](Encoders.product[WavPayload])
        FrameFeatures.clipStats(wavs, 30000L).toDF()
      },
      Some("""WITH d AS (
             |  SELECT doc_id, lower(hex(encode(text))) AS hx,
             |         octet_length(encode(text)) // 2 AS n_samp
             |  FROM documents
             |  WHERE octet_length(encode(text)) >= 2),
             |u AS (SELECT doc_id, hx, unnest(generate_series(0, n_samp - 1)) AS i FROM d),
             |sg AS (SELECT doc_id, i,
             |         CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS samp
             |       FROM (SELECT doc_id, i,
             |               CAST('0x' || substr(hx, i*4 + 3, 2) || substr(hx, i*4 + 1, 2) AS INT) AS v
             |             FROM u)),
             |c AS (SELECT doc_id, i, abs(samp) AS a,
             |        CASE WHEN abs(samp) >= 30000 THEN 1 ELSE 0 END AS clip FROM sg),
             |runs AS (SELECT doc_id, COUNT(*) AS run FROM (
             |           SELECT doc_id, i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
             |           FROM c WHERE clip = 1)
             |         GROUP BY doc_id, grp),
             |mr AS (SELECT doc_id, MAX(run) AS longest FROM runs GROUP BY 1)
             |SELECT c.doc_id, COUNT(*) AS n_samples,
             |  CAST(SUM(clip) AS BIGINT) AS n_clipped,
             |  CAST(SUM(clip) * 10000 // COUNT(*) AS BIGINT) AS clip_bp,
             |  CAST(COALESCE(MAX(mr.longest), 0) AS BIGINT) AS longest_run,
             |  CAST(MAX(a) AS BIGINT) AS peak
             |FROM c LEFT JOIN mr USING (doc_id) GROUP BY 1""".stripMargin)
    ),

    // PATCH GRID extraction over the real container: the 16-wide BMPs
    // reduced to a ViT-style grid of 4x4-pixel patches (pixel count,
    // exact luminance sum b+g+r, scaled mean) — the patching/pooling
    // pre-pass a vision-encoder pipeline runs per image before the
    // model sees anything. One pixel walk per image in the sanctioned
    // codec; the oracle replays the grid from hex byte arithmetic.
    "mm_patch_grid" -> Query(
      (s, d) => {
        import graft.multimodal.FrameFeatures.WavPayload
        val bin = col("text").cast("binary")
        val nB = length(bin)
        val h = expr("length(cast(text as binary)) div 48")
        val dataSize = h * 48
        val bmpHex = concat(
          lit("424d"), leHex32(dataSize + 54), lit("00000000"),
          lit("36000000"), lit("28000000"),
          lit("10000000"), leHex32(h),
          lit("0100"), lit("1800"), lit("00000000"),
          leHex32(dataSize), lit("130b0000130b0000"),
          lit("0000000000000000"),
          lower(hex(bin)).substr(lit(1), dataSize * 2))
        val imgs = Tables.documents(s, d)
          .filter(nB >= 48)
          .select(col("doc_id"), unhex(bmpHex).as("payload"))
          .as[WavPayload](Encoders.product[WavPayload])
        FrameFeatures.patchGrid(imgs).toDF()
      },
      Some("""WITH d AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
             |                  octet_length(encode(text)) // 48 AS h
             |           FROM documents WHERE octet_length(encode(text)) >= 48),
             |px AS (SELECT doc_id, i // 16 AS y, i % 16 AS x,
             |         CAST('0x' || substr(hx, i*6 + 1, 2) AS BIGINT)
             |       + CAST('0x' || substr(hx, i*6 + 3, 2) AS BIGINT)
             |       + CAST('0x' || substr(hx, i*6 + 5, 2) AS BIGINT) AS lum
             |       FROM (SELECT doc_id, hx, unnest(generate_series(0, h*16 - 1)) AS i FROM d))
             |SELECT doc_id, CAST(y // 4 AS BIGINT) AS patch_row,
             |  CAST(x // 4 AS BIGINT) AS patch_col, COUNT(*) AS n_px,
             |  CAST(SUM(lum) AS BIGINT) AS lum_sum,
             |  CAST(SUM(lum) * 100 // (3 * COUNT(*)) AS BIGINT) AS mean_e2
             |FROM px GROUP BY 1, 2, 3""".stripMargin)
    ),

    // VOICE-ACTIVITY DETECTION over the real container: the same PCM
    // WAVs as mm_wav_features, folded to energy-gated 16-sample frames
    // (Σ|amplitude| > 400000) with adjacent active frames merged into
    // segments — the speech-segmentation pre-pass an audio curation
    // pipeline runs before any transcription/embedding step decides
    // what's worth the expensive model. The gaps-and-islands merge
    // runs sequentially inside the codec walk (one pass per doc); the
    // oracle replays frames, gates, and islands from hex arithmetic.
    // Integer-exact; one scan, zero shuffle like the other codecs.
    "mm_audio_vad" -> Query(
      (s, d) => {
        import graft.multimodal.FrameFeatures.WavPayload
        val bin = col("text").cast("binary")
        val nBytes = length(bin)
        val dataSize = nBytes - nBytes % 2
        val rate = (lit(8000) + (col("doc_id") % 3) * 4000).cast("int")
        val wavHex = concat(
          lit("52494646"), leHex32(dataSize + 36), lit("57415645"),
          lit("666d7420"), lit("10000000"),
          lit("0100"), lit("0100"),
          leHex32(rate), leHex32(rate * 2),
          lit("0200"), lit("1000"),
          lit("64617461"), leHex32(dataSize),
          lower(hex(bin)).substr(lit(1), dataSize * 2))
        val wavs = Tables.documents(s, d)
          .filter(nBytes >= 2)
          .select(col("doc_id"), unhex(wavHex).as("payload"))
          .as[WavPayload](Encoders.product[WavPayload])
        FrameFeatures.vadWav(wavs, frameLen = 16, threshold = 400000L).toDF()
      },
      Some("""WITH d AS (
             |  SELECT doc_id, lower(hex(encode(text))) AS hx,
             |         octet_length(encode(text)) // 2 AS n_samp
             |  FROM documents
             |  WHERE octet_length(encode(text)) >= 2),
             |u AS (SELECT doc_id, hx, n_samp // 16 AS n_frames,
             |        unnest(generate_series(0, (n_samp // 16) * 16 - 1)) AS i
             |      FROM d),
             |sg AS (SELECT doc_id, n_frames, i // 16 AS f,
             |         CASE WHEN CAST('0x' || substr(hx, i*4 + 3, 2) || substr(hx, i*4 + 1, 2) AS INT) >= 32768
             |              THEN CAST('0x' || substr(hx, i*4 + 3, 2) || substr(hx, i*4 + 1, 2) AS INT) - 65536
             |              ELSE CAST('0x' || substr(hx, i*4 + 3, 2) || substr(hx, i*4 + 1, 2) AS INT) END AS samp
             |       FROM u),
             |fr AS (SELECT doc_id, n_frames, f, SUM(abs(samp)) AS e
             |       FROM sg GROUP BY 1, 2, 3),
             |act AS (SELECT doc_id, n_frames, f,
             |          f - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY f) AS isl
             |        FROM fr WHERE e > 400000),
             |seg AS (SELECT doc_id, isl, COUNT(*) AS seg_len FROM act GROUP BY 1, 2),
             |per AS (SELECT a.doc_id, COUNT(*) AS n_segments, MAX(seg_len) AS longest_seg,
             |          CAST(SUM(seg_len) AS BIGINT) AS n_active
             |        FROM seg a GROUP BY 1)
             |SELECT dd.doc_id, CAST(dd.n_samp // 16 AS BIGINT) AS n_frames,
             |  COALESCE(per.n_active, 0) AS n_active,
             |  COALESCE(per.n_segments, 0) AS n_segments,
             |  CAST(COALESCE(per.longest_seg, 0) AS BIGINT) AS longest_seg
             |FROM d dd LEFT JOIN per USING (doc_id)""".stripMargin)
    ),

    // CHANNEL-CORRELATION AUDIT: Pearson correlation between the B/G/R
    // channels of each decoded image — near-1.0 on all three pairs
    // means a de-facto grayscale image stored as RGB (a dedup/storage
    // signal no pixel hash gives you). The codec walk emits exact
    // integer first/second/cross moments; the correlations divide
    // integer-difference doubles, mirrored cross-engine, with
    // zero-variance channels pinned to 0.
    "mm_channel_corr" -> Query(
      (s, d) => {
        import graft.multimodal.FrameFeatures.WavPayload
        val bin = col("text").cast("binary")
        val nB = length(bin)
        val h = expr("length(cast(text as binary)) div 48")
        val dataSize = h * 48
        val bmpHex = concat(
          lit("424d"), leHex32(dataSize + 54), lit("00000000"),
          lit("36000000"), lit("28000000"),
          lit("10000000"), leHex32(h),
          lit("0100"), lit("1800"), lit("00000000"),
          leHex32(dataSize), lit("130b0000130b0000"),
          lit("0000000000000000"),
          lower(hex(bin)).substr(lit(1), dataSize * 2))
        val imgs = Tables.documents(s, d)
          .filter(nB >= 48)
          .select(col("doc_id"), unhex(bmpHex).as("payload"))
          .as[WavPayload](Encoders.product[WavPayload])
        val m = FrameFeatures.channelMoments(imgs).toDF()
        def corr(sxy: String, sx: String, sy: String,
                 sxx: String, syy: String) = {
          val num = (col("n_px") * col(sxy) - col(sx) * col(sy)).cast("double")
          val dx = col("n_px") * col(sxx) - col(sx) * col(sx)
          val dy = col("n_px") * col(syy) - col(sy) * col(sy)
          when(dx > 0 && dy > 0,
            round(num / (sqrt(dx.cast("double")) * sqrt(dy.cast("double"))), 4))
            .otherwise(lit(0.0))
        }
        m.select(col("doc_id"), col("n_px"),
          corr("sbg", "sb", "sg", "sbb", "sgg").as("corr_bg"),
          corr("sbr", "sb", "sr", "sbb", "srr").as("corr_br"),
          corr("sgr", "sg", "sr", "sgg", "srr").as("corr_gr"))
      },
      Some("""WITH d AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
             |                  octet_length(encode(text)) // 48 AS h
             |           FROM documents WHERE octet_length(encode(text)) >= 48),
             |b AS (SELECT doc_id, i // 3 AS px, i % 3 AS ch,
             |        CAST('0x' || substr(hx, i*2 + 1, 2) AS BIGINT) AS v
             |      FROM (SELECT doc_id, hx, h,
             |              unnest(generate_series(0, h*48 - 1)) AS i FROM d)),
             |px AS (SELECT doc_id, px,
             |         MAX(CASE WHEN ch = 0 THEN v END) AS b,
             |         MAX(CASE WHEN ch = 1 THEN v END) AS g,
             |         MAX(CASE WHEN ch = 2 THEN v END) AS r
             |       FROM b GROUP BY 1, 2),
             |m AS (SELECT doc_id, COUNT(*) AS n, SUM(b) AS sb, SUM(g) AS sg,
             |        SUM(r) AS sr, SUM(b*b) AS sbb, SUM(g*g) AS sgg,
             |        SUM(r*r) AS srr, SUM(b*g) AS sbg, SUM(b*r) AS sbr,
             |        SUM(g*r) AS sgr
             |      FROM px GROUP BY 1)
             |SELECT doc_id, CAST(n AS BIGINT) AS n_px,
             |  CASE WHEN n*sbb - sb*sb > 0 AND n*sgg - sg*sg > 0
             |    THEN ROUND(CAST(n*sbg - sb*sg AS DOUBLE)
             |      / (sqrt(CAST(n*sbb - sb*sb AS DOUBLE))
             |         * sqrt(CAST(n*sgg - sg*sg AS DOUBLE))), 4)
             |    ELSE 0.0 END AS corr_bg,
             |  CASE WHEN n*sbb - sb*sb > 0 AND n*srr - sr*sr > 0
             |    THEN ROUND(CAST(n*sbr - sb*sr AS DOUBLE)
             |      / (sqrt(CAST(n*sbb - sb*sb AS DOUBLE))
             |         * sqrt(CAST(n*srr - sr*sr AS DOUBLE))), 4)
             |    ELSE 0.0 END AS corr_br,
             |  CASE WHEN n*sgg - sg*sg > 0 AND n*srr - sr*sr > 0
             |    THEN ROUND(CAST(n*sgr - sg*sr AS DOUBLE)
             |      / (sqrt(CAST(n*sgg - sg*sg AS DOUBLE))
             |         * sqrt(CAST(n*srr - sr*sr AS DOUBLE))), 4)
             |    ELSE 0.0 END AS corr_gr
             |FROM m""".stripMargin)
    ),

    // IMAGE BYTE-ENTROPY gate — the cheap blank/flat-image detector a
    // media-curation pipeline runs before any decode: Shannon entropy
    // of the 8-bit value histogram over the 384-byte head payload
    // (same payload window as the aHash family). Low entropy = the
    // "image" is a near-constant field (blank scans, solid fills) and
    // gets flagged. Same exact-DECIMAL c*ln(c) fold as text_entropy:
    // counts are integers, the entropy identity ln(n) - sum(c ln c)/n
    // is one terminal double, and the flag compares the ROUNDED value.
    // Row-local explode + two partial aggs; zero joins, zero state.
    "mm_image_entropy" -> Query(
      (s, d) => {
        val hx = Tables.documents(s, d)
          .repartition(col("doc_id")) // 384 conv/substring per doc — spread the scan
          .filter(length(col("text").cast("binary")) >= 384)
          .select(col("doc_id"),
            lower(hex(substring(col("text").cast("binary"), 1, 384))).as("hx"))
        val bytes = hx
          .select(col("doc_id"), col("hx"), explode(sequence(lit(0), lit(383))).as("i"))
          .select(col("doc_id"),
            conv(expr("substring(hx, i*2 + 1, 2)"), 16, 10).cast("long").as("v"))
        bytes.groupBy(col("doc_id"), col("v")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_distinct"),
            sum((col("c").cast("double") * log(col("c").cast("double")))
              .cast("decimal(18,12)")).as("clnc"))
          .select(col("doc_id"), col("n_distinct"),
            round(log(lit(384.0)) - col("clnc").cast("double") / 384, 4).as("entropy"))
          .withColumn("flat", (col("entropy") < 3.0).cast("long"))
      },
      Some("""WITH d AS (SELECT doc_id, lower(hex(encode(text))) AS hx
             |      FROM documents WHERE octet_length(encode(text)) >= 384),
             |b AS (SELECT doc_id, CAST('0x' || substr(hx, i*2 + 1, 2) AS BIGINT) AS v
             |      FROM (SELECT doc_id, hx, unnest(generate_series(0, 383)) AS i FROM d)),
             |tc AS (SELECT doc_id, v, COUNT(*) AS c FROM b GROUP BY 1, 2),
             |g AS (SELECT doc_id, COUNT(*) AS n_distinct,
             |        ROUND(ln(384.0) -
             |          CAST(SUM(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
             |            AS DECIMAL(18,12))) AS DOUBLE) / 384, 4) AS entropy
             |      FROM tc GROUP BY doc_id)
             |SELECT doc_id, n_distinct, entropy,
             |  CAST(entropy < 3.0 AS BIGINT) AS flat
             |FROM g""".stripMargin)
    ),

    // REAL GIF89a round trip — the third genuine container codec next
    // to PNG and WAV: each document's head bytes become an 8-bit
    // grayscale GIF (256-entry global color table, variable-width
    // LSB-first LZW with clear/EOI, 255-byte sub-blocks), and
    // GifCodec.GifDecoder walks it back: header/table validation,
    // sub-block reassembly, full LZW decode (KwKwK + 4096 clear).
    // Decoded pixels must equal the original bytes, so the oracle
    // pins the WHOLE LZW round trip from raw byte arithmetic — the
    // px_md5 pins values and order; a bit-packing or code-width
    // lockstep bug diverges immediately. mapPartitions is confined to
    // the codec walk; the plan is one scan, zero shuffle.
    "mm_gif_decode" -> Query(
      (s, d) => {
        import graft.multimodal.FrameFeatures.WavPayload
        val bin = col("text").cast("binary")
        val imgs = Tables.documents(s, d)
          .filter(length(bin) >= 16)
          .select(col("doc_id"),
            expr("substring(cast(text as binary), 1, " +
              "16 * (length(cast(text as binary)) div 16))").as("payload"))
          .as[WavPayload](Encoders.product[WavPayload])
        GifCodec.roundtrip(imgs, 16).toDF()
      },
      Some("""WITH d AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
             |                  octet_length(encode(text)) // 16 AS h
             |           FROM documents WHERE octet_length(encode(text)) >= 16),
             |b AS (SELECT doc_id, h, i, substr(hx, i*2 + 1, 2) AS bh,
             |             CAST('0x' || substr(hx, i*2 + 1, 2) AS BIGINT) AS v
             |      FROM (SELECT doc_id, hx, h,
             |              unnest(generate_series(0, h*16 - 1)) AS i FROM d))
             |SELECT doc_id, CAST(16 AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
             |  CAST(16*h AS BIGINT) AS n_px, CAST(SUM(v) AS BIGINT) AS sum_px,
             |  CAST(MIN(v) AS BIGINT) AS min_px, CAST(MAX(v) AS BIGINT) AS max_px,
             |  md5(string_agg(bh, '' ORDER BY i)) AS px_md5
             |FROM b GROUP BY doc_id, h""".stripMargin)
    ),

    // PCM frame SNR proxy — the clipping gate's dynamic-range partner:
    // per-frame energies (16 signed LE samples each), then the
    // p90/p10 energy ratio in dB. A near-flat ratio means dead air or
    // constant tone; a huge one means bursty speech-like content. The
    // sample walk, per-frame energies, and the nearest-rank p10/p90
    // (ONE in-row sort bounded by the PAYLOAD length, never the
    // corpus) all run in the sanctioned codec-walk mapPartitions pass
    // (FrameFeatures.audioSnr) — one scan, zero shuffle, no
    // per-sample explode/hex parse. Energies are exact integers; the
    // dB value is 10*ln(r)/ln(10) on an exact integer ratio, rounded
    // HALF_UP identically in both engines.
    "mm_audio_snr" -> Query(
      (s, d) => {
        import graft.multimodal.FrameFeatures.WavPayload
        val bin = col("text").cast("binary")
        val pcm = Tables.documents(s, d).filter(length(bin) >= 32)
          .select(col("doc_id"), bin.as("payload"))
          .as[WavPayload](Encoders.product[WavPayload])
        FrameFeatures.audioSnr(pcm).toDF()
      },
      Some("""WITH d AS (
             |  SELECT doc_id, lower(hex(encode(text))) AS hx,
             |         octet_length(encode(text)) // 2 AS n_samp
             |  FROM documents WHERE octet_length(encode(text)) >= 32),
             |u AS (SELECT doc_id, hx,
             |        unnest(generate_series(0, (n_samp // 16) * 16 - 1)) AS i
             |      FROM d),
             |sg AS (SELECT doc_id, i // 16 AS f,
             |         CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS samp
             |       FROM (SELECT doc_id, i,
             |               CAST('0x' || substr(hx, i*4 + 3, 2)
             |                    || substr(hx, i*4 + 1, 2) AS INT) AS v
             |             FROM u)),
             |fe AS (SELECT doc_id, f, SUM(samp*samp) AS energy
             |       FROM sg GROUP BY 1, 2),
             |g AS (SELECT doc_id, COUNT(*) AS n_frames,
             |        list(energy ORDER BY energy) AS es
             |      FROM fe GROUP BY 1)
             |SELECT doc_id, n_frames,
             |  CAST(es[CAST(((n_frames - 1) * 10) // 100 + 1 AS INT)] AS BIGINT) AS e10,
             |  CAST(es[CAST(((n_frames - 1) * 90) // 100 + 1 AS INT)] AS BIGINT) AS e90,
             |  ROUND(10.0 * ln(CAST(es[CAST(((n_frames - 1) * 90) // 100 + 1 AS INT)] AS DOUBLE)
             |      / CAST(GREATEST(es[CAST(((n_frames - 1) * 10) // 100 + 1 AS INT)], 1) AS DOUBLE))
             |    / ln(10.0), 4) AS snr_db
             |FROM g""".stripMargin)
    ),

    // PALETTE QUANTIZATION — snap every pixel to the nearest of 8
    // literal palette colors (the 1-bit RGB corners) and report each
    // image's dominant palette entry and its coverage: the cheap
    // color-profile fingerprint media dashboards facet on (and a
    // poor-man's posterize). Distances are exact integer L2 over the
    // 8-entry literal palette (argmin with index tie-break), coverage
    // is an exact bp ratio. Pixel decode + assignment + the 8-counter
    // fold run in the sanctioned codec-walk mapPartitions pass
    // (FrameFeatures.quantizePalette) — one scan, zero shuffle, zero
    // joins, no per-pixel explode/hex parse.
    "mm_image_quantize_palette" -> Query(
      (s, d) => {
        import graft.multimodal.FrameFeatures.WavPayload
        val bin = col("text").cast("binary")
        val imgs = Tables.documents(s, d).filter(length(bin) >= 48)
          .select(col("doc_id"), bin.as("payload"))
          .as[WavPayload](Encoders.product[WavPayload])
        FrameFeatures.quantizePalette(imgs).toDF()
      },
      Some("""WITH d AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
             |                  octet_length(encode(text)) // 48 AS h
             |           FROM documents WHERE octet_length(encode(text)) >= 48),
             |px AS (SELECT doc_id, i,
             |         CAST('0x' || substr(hx, i*6 + 1, 2) AS BIGINT) AS b,
             |         CAST('0x' || substr(hx, i*6 + 3, 2) AS BIGINT) AS g,
             |         CAST('0x' || substr(hx, i*6 + 5, 2) AS BIGINT) AS r
             |       FROM (SELECT doc_id, hx, unnest(generate_series(0, h*16 - 1)) AS i FROM d)),
             |pal AS (SELECT unnest(generate_series(0, 7)) AS k),
             |dd AS (SELECT doc_id, i, k,
             |         (b - (k & 1) * 255) * (b - (k & 1) * 255)
             |       + (g - ((k >> 1) & 1) * 255) * (g - ((k >> 1) & 1) * 255)
             |       + (r - ((k >> 2) & 1) * 255) * (r - ((k >> 2) & 1) * 255) AS dist
             |       FROM px CROSS JOIN pal),
             |asg AS (SELECT doc_id, CAST(k AS BIGINT) AS pk FROM (
             |          SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, i
             |                                       ORDER BY dist, k) AS rn
             |          FROM dd) WHERE rn = 1),
             |cc AS (SELECT doc_id, pk, COUNT(*) AS c FROM asg GROUP BY 1, 2),
             |top AS (SELECT doc_id, pk AS dominant_pk, c FROM (
             |          SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
             |                                       ORDER BY c DESC, pk) AS rn
             |          FROM cc) WHERE rn = 1),
             |t AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_px FROM cc GROUP BY 1)
             |SELECT t.doc_id, t.n_px, top.dominant_pk,
             |  CAST(top.c * 10000 // t.n_px AS BIGINT) AS coverage_bp
             |FROM t JOIN top USING (doc_id)""".stripMargin)
    ),

    // SOBEL EDGE SCAN over the 16-wide grayscale view of each doc's
    // bytes — the texture/blankness gate vision ingest runs before
    // anything expensive: per interior pixel |Gx| + |Gy| with the
    // standard 3x3 kernels, exact integer edge energy, and the share
    // of pixels clearing the magnitude-128 threshold in bp. One byte
    // walk per image in the codec pass; the oracle computes every
    // gradient by direct hex-offset arithmetic (no joins), so a
    // kernel-orientation or stride bug diverges immediately.
    "mm_image_sobel" -> Query(
      (s, d) => {
        import graft.multimodal.FrameFeatures.WavPayload
        val bin = col("text").cast("binary")
        val imgs = Tables.documents(s, d)
          .filter(length(bin) >= 48) // >= 3 rows so interiors exist
          .select(col("doc_id"),
            expr("substring(cast(text as binary), 1, " +
              "16 * (length(cast(text as binary)) div 16))").as("payload"))
          .as[WavPayload](Encoders.product[WavPayload])
        FrameFeatures.sobelStats(imgs).toDF()
      },
      Some("""WITH d AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
             |                  octet_length(encode(text)) // 16 AS h
             |           FROM documents WHERE octet_length(encode(text)) >= 48),
             |px AS (SELECT doc_id, h, i % 14 + 1 AS x, i // 14 + 1 AS y, hx
             |       FROM (SELECT doc_id, h, hx,
             |               unnest(generate_series(0, (h - 2) * 14 - 1)) AS i FROM d)),
             |g AS (SELECT doc_id, h,
             |        abs((CAST('0x' || substr(hx, ((y-1)*16 + x+1)*2 + 1, 2) AS BIGINT)
             |           + 2*CAST('0x' || substr(hx, (y*16 + x+1)*2 + 1, 2) AS BIGINT)
             |           + CAST('0x' || substr(hx, ((y+1)*16 + x+1)*2 + 1, 2) AS BIGINT))
             |          - (CAST('0x' || substr(hx, ((y-1)*16 + x-1)*2 + 1, 2) AS BIGINT)
             |           + 2*CAST('0x' || substr(hx, (y*16 + x-1)*2 + 1, 2) AS BIGINT)
             |           + CAST('0x' || substr(hx, ((y+1)*16 + x-1)*2 + 1, 2) AS BIGINT)))
             |      + abs((CAST('0x' || substr(hx, ((y+1)*16 + x-1)*2 + 1, 2) AS BIGINT)
             |           + 2*CAST('0x' || substr(hx, ((y+1)*16 + x)*2 + 1, 2) AS BIGINT)
             |           + CAST('0x' || substr(hx, ((y+1)*16 + x+1)*2 + 1, 2) AS BIGINT))
             |          - (CAST('0x' || substr(hx, ((y-1)*16 + x-1)*2 + 1, 2) AS BIGINT)
             |           + 2*CAST('0x' || substr(hx, ((y-1)*16 + x)*2 + 1, 2) AS BIGINT)
             |           + CAST('0x' || substr(hx, ((y-1)*16 + x+1)*2 + 1, 2) AS BIGINT)))
             |        AS m
             |      FROM px)
             |SELECT doc_id, CAST(16 AS BIGINT) AS width, CAST(MAX(h) AS BIGINT) AS height,
             |  CAST((MAX(h) - 2) * 14 AS BIGINT) AS n_interior,
             |  CAST(SUM(m) AS BIGINT) AS edge_energy,
             |  CAST(SUM(CASE WHEN m > 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_edge_px,
             |  CAST(SUM(CASE WHEN m > 128 THEN 1 ELSE 0 END) * 10000
             |    // ((MAX(h) - 2) * 14) AS BIGINT) AS edge_bp
             |FROM g GROUP BY 1""".stripMargin)
    ),

    // 4-BIN DFT SPECTRAL PROFILE over the PCM stream — the
    // tone-vs-noise frequency gate (speech/music concentrates low
    // bins, hiss is flat): per complete 64-sample frame, bin energies
    // (Σ s·cos)² + (Σ s·sin)² at k ∈ {1,2,4,8} cycles/frame over the
    // 8192-scaled integer basis (interpolated verbatim into the
    // oracle, the dctBasis discipline), correlations scaled down
    // BEFORE squaring so everything stays in longs; energies sum over
    // frames, dominant bin ties to the lowest k. One codec-walk pass
    // per doc, exact integers end to end.
    "mm_audio_spectral" -> Query(
      (s, d) => {
        import graft.multimodal.FrameFeatures.WavPayload
        val bin = col("text").cast("binary")
        val pcm = Tables.documents(s, d).filter(length(bin) >= 128)
          .select(col("doc_id"), bin.as("payload"))
          .as[WavPayload](Encoders.product[WavPayload])
        FrameFeatures.spectralProfile(pcm).toDF()
      },
      Some(s"""WITH d AS (
             |  SELECT doc_id, lower(hex(encode(text))) AS hx,
             |         octet_length(encode(text)) // 2 AS n_samp
             |  FROM documents WHERE octet_length(encode(text)) >= 128),
             |u AS (SELECT doc_id, hx,
             |        unnest(generate_series(0, (n_samp // 64) * 64 - 1)) AS i
             |      FROM d),
             |sg AS (SELECT doc_id, i // 64 AS f, i % 64 AS j,
             |         CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS samp
             |       FROM (SELECT doc_id, i,
             |               CAST('0x' || substr(hx, i*4 + 3, 2)
             |                    || substr(hx, i*4 + 1, 2) AS INT) AS v
             |             FROM u)),
             |bs AS (SELECT * FROM (VALUES $dftValsSql) AS t(k, j, c, sn)),
             |corr AS (SELECT sg.doc_id, sg.f, bs.k,
             |           SUM(samp * bs.c) // 8192 AS cq,
             |           SUM(samp * bs.sn) // 8192 AS sq
             |         FROM sg JOIN bs ON bs.j = sg.j
             |         GROUP BY 1, 2, 3),
             |en AS (SELECT doc_id, k, CAST(SUM(cq*cq + sq*sq) AS BIGINT) AS e
             |       FROM corr GROUP BY 1, 2)
             |SELECT en.doc_id,
             |  CAST(MAX(d.n_samp) // 64 AS BIGINT) AS n_frames,
             |  CAST(MAX(CASE WHEN k = 1 THEN e END) AS BIGINT) AS e1,
             |  CAST(MAX(CASE WHEN k = 2 THEN e END) AS BIGINT) AS e2,
             |  CAST(MAX(CASE WHEN k = 4 THEN e END) AS BIGINT) AS e4,
             |  CAST(MAX(CASE WHEN k = 8 THEN e END) AS BIGINT) AS e8,
             |  CAST(-((MAX(struct_pack(e := e, nk := -k))).nk) AS BIGINT) AS dominant_k
             |FROM en JOIN d ON d.doc_id = en.doc_id
             |GROUP BY 1""".stripMargin)
    ),

    // REAL BASELINE JPEG round trip: each doc's first 192 bytes become
    // an 8x8 RGB image, JpegCodec.encode builds a genuine 4:2:0 JFIF
    // (integer RGB->YCbCr, edge-padded 16x16 MCU, 8192-scaled integer
    // FDCT, Annex-K quant + Huffman tables, zigzag RLE with byte
    // stuffing, full marker structure), and the decoder re-parses the
    // FILE (DQT/DHT/SOF0/SOS), Huffman-decodes the MCU, dequants,
    // IDCTs, upsamples chroma and converts back to RGB. The oracle
    // replays ONLY the lossy math (color transform, subsample,
    // FDCT->quant->dequant->IDCT, all truncating integer arithmetic
    // over the same literal basis/quant tables) from the raw payload
    // bytes — the entropy/container layer is lossless, so px_md5
    // matches exactly iff the Huffman/marker/stuffing round trip is
    // bit-correct; one mis-parsed bit shifts the scan and diverges
    // everything. mapPartitions is confined to the codec walk; the
    // plan is one scan, zero shuffle.
    "mm_jpeg_decode" -> Query(
      (s, d) => {
        import graft.multimodal.FrameFeatures.WavPayload
        val bin = col("text").cast("binary")
        val imgs = Tables.documents(s, d)
          .filter(length(bin) >= 192)
          .select(col("doc_id"),
            expr("substring(cast(text as binary), 1, 192)").as("payload"))
          .as[WavPayload](Encoders.product[WavPayload])
        JpegCodec.roundtrip(imgs).toDF().drop("n_jpeg_bytes")
      },
      Some(s"""WITH d AS (SELECT doc_id, lower(hex(encode(text))) AS hx
             |           FROM documents WHERE octet_length(encode(text)) >= 192),
             |px AS (SELECT doc_id, i, i % 8 AS x, i // 8 AS y,
             |         CAST('0x' || substr(hx, i*6 + 1, 2) AS BIGINT) AS r,
             |         CAST('0x' || substr(hx, i*6 + 3, 2) AS BIGINT) AS g,
             |         CAST('0x' || substr(hx, i*6 + 5, 2) AS BIGINT) AS b
             |       FROM (SELECT doc_id, hx, unnest(generate_series(0, 63)) AS i FROM d)),
             |ycc AS (SELECT doc_id, x, y,
             |         GREATEST(0, LEAST(255, (19595*r + 38470*g + 7471*b + 32768) // 65536)) AS yv,
             |         GREATEST(0, LEAST(255, 128 + (-11056*r - 21712*g + 32768*b + 32768) // 65536)) AS cb,
             |         GREATEST(0, LEAST(255, 128 + (32768*r - 27440*g - 5328*b + 32768) // 65536)) AS cr
             |       FROM px),
             |$jpegTablesSql,
             |sub AS (SELECT s0.doc_id, s0.cx, s0.cy,
             |          (pa.cb + pb2.cb + pc.cb + pd.cb + 2) // 4 AS cb,
             |          (pa.cr + pb2.cr + pc.cr + pd.cr + 2) // 4 AS cr
             |        FROM (SELECT doc_id, j % 8 AS cx, j // 8 AS cy
             |              FROM (SELECT doc_id, unnest(generate_series(0, 63)) AS j FROM d)) s0
             |        JOIN ycc pa  ON pa.doc_id = s0.doc_id
             |          AND pa.x = LEAST(2*s0.cx, 7)     AND pa.y = LEAST(2*s0.cy, 7)
             |        JOIN ycc pb2 ON pb2.doc_id = s0.doc_id
             |          AND pb2.x = LEAST(2*s0.cx + 1, 7) AND pb2.y = LEAST(2*s0.cy, 7)
             |        JOIN ycc pc  ON pc.doc_id = s0.doc_id
             |          AND pc.x = LEAST(2*s0.cx, 7)     AND pc.y = LEAST(2*s0.cy + 1, 7)
             |        JOIN ycc pd  ON pd.doc_id = s0.doc_id
             |          AND pd.x = LEAST(2*s0.cx + 1, 7) AND pd.y = LEAST(2*s0.cy + 1, 7)),
             |fy AS (SELECT p.doc_id, bu.u AS u, bv.u AS v,
             |         SUM((p.yv - 128) * bu.c * bv.c) AS t1
             |       FROM ycc p JOIN bs bu ON bu.x = p.x JOIN bs bv ON bv.x = p.y
             |       GROUP BY 1, 2, 3),
             |fyq AS (SELECT doc_id, u, v, q,
             |          (2*t3 + CASE WHEN t3 < 0 THEN -(268435456*q) ELSE 268435456*q END)
             |            // (2*268435456*q) AS qv
             |        FROM (SELECT f.doc_id, f.u, f.v, ql.q,
             |                (((f.t1 * cu.c) // 8192) * cv.c) // 8192 AS t3
             |              FROM fy f JOIN cc cu ON cu.u = f.u JOIN cc cv ON cv.u = f.v
             |              JOIN ql ON ql.idx = f.v * 8 + f.u)),
             |recy AS (SELECT doc_id, x, y,
             |          GREATEST(0, LEAST(255,
             |            (2*s + CASE WHEN s < 0 THEN -268435456 ELSE 268435456 END)
             |              // 536870912 + 128)) AS yr
             |        FROM (SELECT f.doc_id, bu.x AS x, bv.x AS y,
             |                SUM((((((f.qv * f.q) * cu.c) // 8192) * cv.c) // 8192)
             |                    * bu.c * bv.c) AS s
             |              FROM fyq f
             |              JOIN cc cu ON cu.u = f.u JOIN cc cv ON cv.u = f.v
             |              JOIN bs bu ON bu.u = f.u JOIN bs bv ON bv.u = f.v
             |              GROUP BY 1, 2, 3)),
             |fc AS (SELECT p.doc_id, bu.u AS u, bv.u AS v,
             |         SUM((p.cb - 128) * bu.c * bv.c) AS tcb,
             |         SUM((p.cr - 128) * bu.c * bv.c) AS tcr
             |       FROM sub p JOIN bs bu ON bu.x = p.cx JOIN bs bv ON bv.x = p.cy
             |       GROUP BY 1, 2, 3),
             |fcq AS (SELECT doc_id, u, v, q,
             |          (2*t3b + CASE WHEN t3b < 0 THEN -(268435456*q) ELSE 268435456*q END)
             |            // (2*268435456*q) AS qvb,
             |          (2*t3r + CASE WHEN t3r < 0 THEN -(268435456*q) ELSE 268435456*q END)
             |            // (2*268435456*q) AS qvr
             |        FROM (SELECT f.doc_id, f.u, f.v, qc.q,
             |                (((f.tcb * cu.c) // 8192) * cv.c) // 8192 AS t3b,
             |                (((f.tcr * cu.c) // 8192) * cv.c) // 8192 AS t3r
             |              FROM fc f JOIN cc cu ON cu.u = f.u JOIN cc cv ON cv.u = f.v
             |              JOIN qc ON qc.idx = f.v * 8 + f.u)),
             |recc AS (SELECT doc_id, cx, cy,
             |          GREATEST(0, LEAST(255,
             |            (2*sb + CASE WHEN sb < 0 THEN -268435456 ELSE 268435456 END)
             |              // 536870912 + 128)) AS cbr,
             |          GREATEST(0, LEAST(255,
             |            (2*sr + CASE WHEN sr < 0 THEN -268435456 ELSE 268435456 END)
             |              // 536870912 + 128)) AS crr
             |        FROM (SELECT f.doc_id, bu.x AS cx, bv.x AS cy,
             |                SUM((((((f.qvb * f.q) * cu.c) // 8192) * cv.c) // 8192)
             |                    * bu.c * bv.c) AS sb,
             |                SUM((((((f.qvr * f.q) * cu.c) // 8192) * cv.c) // 8192)
             |                    * bu.c * bv.c) AS sr
             |              FROM fcq f
             |              JOIN cc cu ON cu.u = f.u JOIN cc cv ON cv.u = f.v
             |              JOIN bs bu ON bu.u = f.u JOIN bs bv ON bv.u = f.v
             |              WHERE bu.x <= 3 AND bv.x <= 3
             |              GROUP BY 1, 2, 3)),
             |rgb AS (SELECT yy.doc_id, yy.x, yy.y,
             |          GREATEST(0, LEAST(255, yy.yr + (91881*(c.crr - 128) + 32768) // 65536)) AS r,
             |          GREATEST(0, LEAST(255, yy.yr - (22554*(c.cbr - 128)
             |            + 46802*(c.crr - 128) + 32768) // 65536)) AS g,
             |          GREATEST(0, LEAST(255, yy.yr + (116130*(c.cbr - 128) + 32768) // 65536)) AS b
             |        FROM recy yy JOIN recc c ON c.doc_id = yy.doc_id
             |          AND c.cx = yy.x // 2 AND c.cy = yy.y // 2)
             |SELECT doc_id, CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
             |  CAST(64 AS BIGINT) AS n_px,
             |  CAST(SUM(r) AS BIGINT) AS sum_r, CAST(SUM(g) AS BIGINT) AS sum_g,
             |  CAST(SUM(b) AS BIGINT) AS sum_b,
             |  md5(string_agg(printf('%02x%02x%02x', CAST(r AS BIGINT), CAST(g AS BIGINT),
             |    CAST(b AS BIGINT)), '' ORDER BY y * 8 + x)) AS px_md5
             |FROM rgb GROUP BY doc_id""".stripMargin)
    )
  )
}
