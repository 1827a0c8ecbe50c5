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
  * The container ships no media codecs, so `Decoder.decode` is a
  * clearly-marked deterministic STUB (md5-seeded pseudo-features). The
  * Spark side — typed schema, partition batching, encoder plumbing —
  * is the real thing a production image/audio pipeline would keep,
  * swapping only the decoder body.
  */
object FrameFeatures {

  case class FramePayload(doc_id: Long, frame_id: Long, payload: Array[Byte])
  case class FrameFeature(doc_id: Long, frame_id: Long,
                          width: Int, height: Int, mean_luma: Double)

  /** Stand-in for a codec handle (libjpeg/ffmpeg/...) that is expensive
    * to initialize and not serializable — hence per-partition init.
    */
  final class Decoder {
    private val md = java.security.MessageDigest.getInstance("MD5")
    /** STUB: real implementation decodes the frame; this derives
      * deterministic pseudo-features from the payload digest.
      */
    def decode(bytes: Array[Byte]): (Int, Int, Double) = {
      md.reset()
      val h = md.digest(bytes)
      val w = 320 + (h(0) & 0x7f)
      val ht = 240 + (h(1) & 0x7f)
      val luma = (java.lang.Byte.toUnsignedInt(h(2)) * 256 +
        java.lang.Byte.toUnsignedInt(h(3))).toDouble / 65535.0
      (w, ht, luma)
    }
  }

  def extract(frames: Dataset[FramePayload]): Dataset[FrameFeature] = {
    implicit val enc = Encoders.product[FrameFeature]
    frames.mapPartitions { it =>
      val codec = new Decoder // once per partition, not per row
      it.map { f =>
        val (w, h, luma) = codec.decode(f.payload)
        FrameFeature(f.doc_id, f.frame_id, w, h, luma)
      }
    }
  }
}
