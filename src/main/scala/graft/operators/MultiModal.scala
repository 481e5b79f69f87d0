package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image /
  * audio / video payloads as opaque `binary` columns with a typed
  * metadata struct, processed partition-batched.
  *
  * The *decode kernels are deterministic STUBS* — this container has no
  * image/audio codecs, so "decoding" derives metadata from a hash of
  * the payload and "features" are byte statistics. Everything around
  * the stub — schema, binary handling, per-partition batch iteration,
  * explode shape for frame sampling — is the real plumbing a codec
  * would drop into (swap `stubDecodeBatch` for a JNI/FFmpeg call; the
  * dataflow does not change).
  */
object MultiModal {

  /** Asset table synthesized from `documents`: payload = utf-8 bytes of
    * the text, modality round-robins image/audio/video. */
  def syntheticAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("content"))

  /** PNG signature (8 bytes) — the one container format decoded for
    * real: width/height/bit-depth/color-type live at fixed offsets in
    * the IHDR chunk (bytes 17-26, 1-indexed), readable with pure column
    * expressions — no codec needed for header metadata. */
  private val PngSig = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
  private val IhdrTag = "IHDR".getBytes("US-ASCII")

  /** Big-endian unsigned int from a binary slice, via hex — codegen'd. */
  private def beLong(bytes: Column): Column =
    conv(hex(bytes), 16, 10).cast("long")

  /** True when the payload is a PNG: signature + IHDR as first chunk. */
  def isPng(content: Column): Column =
    length(content) >= 33 &&
      substring(content, 1, 8) === lit(PngSig) &&
      substring(content, 13, 4) === lit(IhdrTag)

  /** "Decode": REAL header parse for PNG payloads (width/height/
    * bit-depth/color-type straight from the IHDR bytes), md5-derived
    * pseudo-header stub for formats whose decode needs a native codec
    * (documented stub — this container ships none). Pure column
    * expressions either way (codegen'd), and the stub arm stays
    * replicable in SQL for the oracle; the PNG arm is checked against
    * ground truth persisted independently of the parser
    * (fixtures/png_assets.parquet, tools/gen_png_fixture.py). */
  def decodeMeta(assets: DataFrame): DataFrame = {
    val h = md5(col("content"))
    val png = isPng(col("content"))
    assets
      .withColumn("n_bytes", length(col("content")).cast("long"))
      .withColumn("width",
        when(png, beLong(substring(col("content"), 17, 4)))
          .otherwise(conv(substring(h, 1, 7), 16, 10).cast("long") % 240 + 16))
      .withColumn("height",
        when(png, beLong(substring(col("content"), 21, 4)))
          .otherwise(conv(substring(h, 8, 7), 16, 10).cast("long") % 240 + 16))
      .withColumn("bit_depth",
        when(png, beLong(substring(col("content"), 25, 1))))
      .withColumn("color_type",
        when(png, beLong(substring(col("content"), 26, 1))))
      .withColumn("channels", when(col("modality") === "image", 3L).otherwise(1L))
      .withColumn("duration_ms",
        when(col("modality") === "image", 0L)
          .otherwise(col("n_bytes") * 20L))
  }

  /** Byte-sum feature via the partition-batched kernel shape: the stub
    * walks each payload's bytes (exact integer sum — deterministic and
    * oracle-checkable); a native feature extractor would be called in
    * its place, amortized per batch, never per driver. */
  def byteFeatures(assets: DataFrame): DataFrame = {
    val schema = StructType(assets.schema.fields ++ Seq(
      StructField("byte_sum", LongType), StructField("byte_max", LongType)))
    val contentIdx = assets.schema.fieldIndex("content")
    assets.mapPartitions { iter =>
      // batched kernel boundary: one pass per partition, payloads stay
      // off the driver; this is where a codec/accelerator call lands
      iter.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        var s = 0L; var m = 0L
        var i = 0
        while (i < bytes.length) {
          val v = bytes(i) & 0xffL
          s += v; if (v > m) m = v
          i += 1
        }
        Row.fromSeq(r.toSeq ++ Seq(s, m))
      }
    }(Encoders.row(schema))
  }

  /** "Resize" an image asset: halves the pseudo dimensions, payload
    * passthrough (a codec would re-encode here). */
  def resize(decoded: DataFrame, factor: Int): DataFrame =
    decoded
      .withColumn("width", col("width") / factor cast LongType)
      .withColumn("height", col("height") / factor cast LongType)

  /** Frame sampling for video assets: split the payload into
    * `frameBytes`-sized chunks, one output row per sampled frame with a
    * content fingerprint — the explode shape a real frame extractor
    * produces. Every `stride`-th frame is kept. */
  def sampleFrames(assets: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = ceil(length(col("content")).cast("double") / frameBytes).cast("int")
    assets.filter(col("modality") === "video")
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), nFrames - 1), i => i % stride === 0)))
      .withColumn("frame_bytes",
        expr(s"substring(content, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(col("asset_id"), col("frame_idx").cast("long").as("frame_idx"),
        length(col("frame_bytes")).cast("long").as("frame_len"),
        md5(col("frame_bytes")).as("frame_md5"))
  }
}
