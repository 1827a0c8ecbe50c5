package graft.multimodal

import graft.{Query, Tables}
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
  */
object MultimodalQueries {

  val entries: Seq[(String, Query)] = Seq(

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
    )
  )
}
