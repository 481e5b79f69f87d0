package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image /
  * audio / video payloads as opaque `binary` columns with a typed
  * metadata struct, processed partition-batched.
  *
  * Header-level decode is REAL for three container formats — PNG
  * (IHDR: width/height/bit-depth/color-type, big-endian), canonical
  * PCM WAV (fmt chunk: sample-rate/channels/bits + data-chunk
  * duration, little-endian), and JPEG (SOF0-SOF3 frame header found by
  * a genuine marker-segment walk, since its offset varies per file) —
  * parsed straight from the bytes with column expressions and checked
  * against ground truth persisted independently of the parser
  * (fixtures/{png,wav,jpeg}_assets.parquet). For canonical PCM WAV the
  * decode goes PAST the header: [[pcmSampleStats]] decodes the data
  * chunk's samples themselves (pure byte arithmetic — count/sum/peak,
  * sample-exact vs an independent Python decoder), so one modality's
  * data arm is fully real.
  * Formats whose decode needs a full codec (compressed audio, image
  * pixels, video frames) fall back to a *deterministic documented
  * STUB* (md5-derived pseudo-header, exact byte statistics) — this
  * container ships no native codecs.
  * Everything around the kernels — schema, binary handling,
  * per-partition batch iteration, explode shape for frame sampling —
  * is the real plumbing a codec drops into (swap the kernel for a
  * JNI/FFmpeg call; the dataflow does not change).
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

  /** Little-endian unsigned int read of `n` bytes at 1-indexed `offset`
    * — RIFF/WAV fields are LE, so each byte is extracted and shifted
    * individually (still pure codegen'd column exprs). */
  private def leLong(content: Column, offset: Int, n: Int): Column =
    (0 until n).map { i =>
      conv(hex(substring(content, offset + i, 1)), 16, 10).cast("long") * lit(1L << (8 * i))
    }.reduce(_ + _)

  /** Exact floor division on non-negative long columns (Column `/` is
    * double division, which can mis-floor near-integer quotients). */
  private def floorDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** True when the payload is a PNG: signature + IHDR as first chunk. */
  def isPng(content: Column): Column =
    length(content) >= 33 &&
      substring(content, 1, 8) === lit(PngSig) &&
      substring(content, 13, 4) === lit(IhdrTag)

  /** Unsigned byte at a DYNAMIC 1-indexed offset — unlike the PNG/WAV
    * fields, JPEG frame headers sit at a variable offset, so the reads
    * take the position as a column. Past-the-end reads yield null,
    * which the walker treats as malformed input. */
  private def byteAt(content: Column, pos: Column): Column =
    conv(hex(content.substr(pos.cast("int"), lit(1))), 16, 10).cast("long")

  /** Big-endian u16 at a dynamic 1-indexed offset. */
  private def be16At(content: Column, pos: Column): Column =
    conv(hex(content.substr(pos.cast("int"), lit(2))), 16, 10).cast("long")

  /** True when the payload is a JPEG: SOI marker followed by the first
    * segment's FF byte. */
  def isJpeg(content: Column): Column =
    length(content) >= 4 &&
      substring(content, 1, 3) ===
        lit(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte))

  /** 1-indexed offset of the SOF (start-of-frame) segment, or null.
    *
    * JPEG metadata cannot be read at fixed offsets: the frame header
    * hides behind a variable prefix of APPn/DQT/COM segments, and the
    * byte pair FF C0 can legitimately occur INSIDE a segment payload
    * (Exif thumbnails do exactly this), so "find first FFC0" mis-parses
    * real files. This is a real marker-segment walk as a bounded fold:
    * state is the offset of the current segment's FF byte; each step
    * either terminates (SOF0/1/2/3 found → negated offset; SOS/EOI or a
    * non-FF byte → 0 = malformed) or hops over the segment via its
    * big-endian length field. 64 iterations bounds the walk — far above
    * any real header's segment count. `aggregate` is an interpreted
    * (non-codegen) HOF, but the fold is O(segments), touches only
    * header bytes, and stays fully distributed. */
  def jpegSofOffset(content: Column): Column = {
    val walked = aggregate(
      sequence(lit(1), lit(64)),
      lit(3L), // first segment starts right after the 2-byte SOI
      (st, _) => {
        val mk = byteAt(content, st + 1)
        when(st <= 0, st) // terminal: found (<0) or malformed (0)
          .otherwise(
            when(byteAt(content, st) =!= 255L, lit(0L))
              .when(mk === 255L, st + 1) // FF fill byte padding
              .when(mk.isin(192L, 193L, 194L, 195L), -st) // SOF0-SOF3
              .when(mk.isin(216L, 218L, 217L), lit(0L)) // SOI/SOS/EOI: no SOF
              .otherwise(st + 2L + be16At(content, st + 2)))
      })
    when(walked < 0, -walked)
  }

  /** Parsed SOF fields: FF marker len(2) precision(1) height(2)
    * width(2) n_components(1), heights/widths big-endian. Null struct
    * fields when the payload is not a well-formed JPEG. */
  def jpegSof(content: Column): Column = {
    val off = jpegSofOffset(content)
    struct(
      be16At(content, off + 7).as("width"),
      be16At(content, off + 5).as("height"),
      byteAt(content, off + 4).as("precision"),
      byteAt(content, off + 9).as("n_components"),
      (byteAt(content, off + 1) === 194L).as("progressive"))
  }

  /** Big-endian u32 at a dynamic 1-indexed offset (ISO-BMFF box sizes
    * and integer fields are BE). */
  private def be32At(content: Column, pos: Column): Column =
    conv(hex(content.substr(pos.cast("int"), lit(4))), 16, 10).cast("long")

  /** True when the payload is an ISO-BMFF (MP4) container: the first
    * box is ftyp. */
  def isMp4(content: Column): Column =
    length(content) >= 16 &&
      substring(content, 5, 4) === lit("ftyp".getBytes("US-ASCII"))

  /** 1-indexed offset of the first sibling box tagged `fourcc` in
    * [start, end], or null. ISO-BMFF is a tree of [u32 size][4cc]
    * boxes; children are found by HOPPING over siblings via their size
    * fields — the same bounded-fold shape as the JPEG marker walk, and
    * necessary for the same reason: the raw 4cc bytes legitimately
    * occur inside other boxes' payloads (the fixture plants "moov" and
    * "tkhd" decoys in free boxes), so a byte-position scan mis-parses.
    * A size < 8 (including the 64-bit largesize escape, never used by
    * header-sized boxes) terminates the walk as malformed; 32 hops
    * bounds it far above any real header's sibling count. */
  def mp4ChildBox(content: Column, fourcc: String,
                  start: Column, end: Column): Column = {
    val walked = aggregate(
      sequence(lit(1), lit(32)),
      start,
      (st, _) =>
        when(st <= 0, st) // terminal: found (<0) or malformed/absent (0)
          .when(st + 7 > end, lit(0L))
          .when(content.substr((st + 4).cast("int"), lit(4)) ===
            lit(fourcc.getBytes("US-ASCII")), -st)
          .when(be32At(content, st) < 8, lit(0L))
          .otherwise(st + be32At(content, st)))
    when(walked < 0, -walked)
  }

  /** Parsed MP4 header fields from the real box tree: moov at top level
    * (behind ftyp/free/mdat prefixes of any size), mvhd and the first
    * trak among moov's children, tkhd among trak's — each a size-walk,
    * never a byte scan. Version-0 offsets (the only layout the spec
    * guarantees for 32-bit times): mvhd timescale at +20, duration at
    * +24; tkhd track-id at +20, and width/height as 16.16 fixed point
    * at +84/+88 (the reader extracts the integer part). A payload that
    * IS an MP4 container but whose box chain is corrupt or non-v0
    * parses to NULL fields, and null is the final answer for it in
    * [[decodeMeta]] too — "recognized container, header unknown" — it
    * does NOT fall through to the synthetic stub arm, which exists only
    * for formats the engine does not recognize at all. Never a
    * mis-parse.
    *
    * NOTE: one-shot Column form for single-field/ad-hoc use; anything
    * row-heavy must use [[withMp4Meta]], which stages each box walk
    * into its own projection so it evaluates once per row (extracting
    * several fields from THIS struct re-evaluates the nested walks per
    * field — see withMp4Meta's scaladoc). */
  def mp4Meta(content: Column): Column = {
    val len = length(content).cast("long")
    val moov = mp4ChildBox(content, "moov", lit(1L), len)
    val moovEnd = moov + be32At(content, moov) - 1
    val mvhd = mp4ChildBox(content, "mvhd", moov + 8, moovEnd)
    val trak = mp4ChildBox(content, "trak", moov + 8, moovEnd)
    val tkhd = mp4ChildBox(content, "tkhd", trak + 8,
      trak + be32At(content, trak) - 1)
    def v0(b: Column) = byteAt(content, b + 8) === 0L
    struct(
      when(v0(mvhd), be32At(content, mvhd + 20)).as("timescale"),
      when(v0(mvhd), floorDiv(be32At(content, mvhd + 24) * 1000L,
        be32At(content, mvhd + 20))).as("duration_ms"),
      when(v0(tkhd), be32At(content, tkhd + 20)).as("track_id"),
      when(v0(tkhd), be16At(content, tkhd + 84)).as("width"),
      when(v0(tkhd), be16At(content, tkhd + 88)).as("height"))
  }

  /** Staged JPEG parse: the marker-segment walk ([[jpegSofOffset]], the
    * expensive part) lands in ONE projection column and every SOF field
    * is then a cheap byte read off that offset — extracting N fields
    * from the [[jpegSof]] struct re-runs the walk N times instead.
    * Adds `<p>width/height/precision/n_components/progressive`. */
  def withJpegSof(df: DataFrame, c: Column, p: String): DataFrame =
    df
      .withColumn(s"${p}off", jpegSofOffset(c))
      .withColumn(s"${p}width", be16At(c, col(s"${p}off") + 7))
      .withColumn(s"${p}height", be16At(c, col(s"${p}off") + 5))
      .withColumn(s"${p}precision", byteAt(c, col(s"${p}off") + 4))
      .withColumn(s"${p}n_components", byteAt(c, col(s"${p}off") + 9))
      .withColumn(s"${p}progressive", byteAt(c, col(s"${p}off") + 1) === 194L)
      .drop(s"${p}off")

  /** Staged MP4 walk: each box offset lands in its own projection
    * column, so every walk runs ONCE per row. The one-shot [[mp4Meta]]
    * Column form nests the walks inside each field — field → tkhd →
    * trak → moov references fan out EXPONENTIALLY under the
    * interpreted HOF evaluator (dozens of moov walks per row; it
    * benchmarked 20× slower) — while multiply-referenced non-cheap
    * producers are NOT inlined by CollapseProject, so the staged form
    * provably evaluates four walks total. Adds
    * `<p>timescale/duration_ms/track_id/width/height`. */
  def withMp4Meta(df: DataFrame, c: Column, p: String): DataFrame = {
    def v0(b: Column) = byteAt(c, b + 8) === 0L
    df
      .withColumn(s"${p}moov",
        mp4ChildBox(c, "moov", lit(1L), length(c).cast("long")))
      .withColumn(s"${p}moov_end",
        col(s"${p}moov") + be32At(c, col(s"${p}moov")) - 1)
      .withColumn(s"${p}mvhd",
        mp4ChildBox(c, "mvhd", col(s"${p}moov") + 8, col(s"${p}moov_end")))
      .withColumn(s"${p}trak",
        mp4ChildBox(c, "trak", col(s"${p}moov") + 8, col(s"${p}moov_end")))
      .withColumn(s"${p}tkhd",
        mp4ChildBox(c, "tkhd", col(s"${p}trak") + 8,
          col(s"${p}trak") + be32At(c, col(s"${p}trak")) - 1))
      .withColumn(s"${p}timescale",
        when(v0(col(s"${p}mvhd")), be32At(c, col(s"${p}mvhd") + 20)))
      .withColumn(s"${p}duration_ms",
        when(v0(col(s"${p}mvhd")), floorDiv(
          be32At(c, col(s"${p}mvhd") + 24) * 1000L,
          be32At(c, col(s"${p}mvhd") + 20))))
      .withColumn(s"${p}track_id",
        when(v0(col(s"${p}tkhd")), be32At(c, col(s"${p}tkhd") + 20)))
      .withColumn(s"${p}width",
        when(v0(col(s"${p}tkhd")), be16At(c, col(s"${p}tkhd") + 84)))
      .withColumn(s"${p}height",
        when(v0(col(s"${p}tkhd")), be16At(c, col(s"${p}tkhd") + 88)))
      .drop(s"${p}moov", s"${p}moov_end", s"${p}mvhd", s"${p}trak", s"${p}tkhd")
  }

  /** True when the payload is a canonical-layout PCM WAV: RIFF
    * signature, WAVE form, "fmt " first chunk, "data" second (the
    * layout every encoder emits; exotic chunk orders fall back to the
    * stub arm rather than mis-parse). */
  def isWav(content: Column): Column =
    length(content) >= 44 &&
      substring(content, 1, 4) === lit("RIFF".getBytes("US-ASCII")) &&
      substring(content, 9, 8) === lit("WAVEfmt ".getBytes("US-ASCII")) &&
      substring(content, 37, 4) === lit("data".getBytes("US-ASCII"))

  /** PCM SAMPLE decode for canonical WAV — the one modality whose
    * sample data (not just headers) is pure arithmetic over bytes, so
    * the decode arm is REAL here, no codec needed: 16-bit frames are
    * signed little-endian, 8-bit frames unsigned centered at 128 (the
    * WAV conventions). Returns struct(n_samples, sample_sum,
    * sample_peak) — count, exact signed sum (mean = sum/n), and max
    * absolute amplitude. Runs as [[graft.functions.PcmFold]], a
    * codegen'd single-pass kernel: O(blob) per row, one byte-array
    * read, primitive loop inside whole-stage codegen. Ground truth is
    * persisted at fixture generation by an independent Python decoder
    * (tools/gen_wav_fixture.py `pcm_samples`), and the kernel is
    * spec-pinned bit-equal to [[pcmSampleStatsHof]]. Compressed audio
    * formats remain on the documented stub arm. Reference behavior:
    * provider payload normalization, src/etl.py:24-44 (the engine
    * generalizes it to binary columns). */
  def pcmSampleStats(content: Column): Column =
    graft.functions.PcmFold.pcmStats(content)

  /** The declarative HOF form of [[pcmSampleStats]] — the semantic
    * REFERENCE the codegen'd kernel is proven against, not the
    * deployment path: Spark's higher-order functions stay interpreted,
    * and each per-sample `substr` in the lambda re-materializes the
    * whole binary field from the UnsafeRow (`getBinary` copies), so
    * this form is O(samples × blob) in memory traffic — found burning
    * 800+ CPU-seconds on the 200-asset fixture. Kept (test-only) so
    * the kernel's semantics have an in-plan executable twin; never
    * call it on real data.
    *
    * Extract MULTIPLE fields via one staged `withColumn` then field
    * reads (the [[withMp4Meta]] discipline) — the struct producer is
    * multiply-referenced but evaluated once. */
  private[graft] def pcmSampleStatsHof(content: Column): Column = {
    val bits = leLong(content, 35, 2)
    val dataLen = leLong(content, 41, 4)
    val nSamples = floorDiv(dataLen, floorDiv(bits, lit(8)))
    // sequence(0, n-1) DESCENDS when n == 0 (start > stop) — guard the
    // empty data chunk to an empty index array instead
    val idx = when(nSamples > 0, sequence(lit(0L), nSamples - 1))
      .otherwise(array().cast("array<bigint>"))
    val folded = aggregate(
      idx,
      struct(lit(0L).as("sum"), lit(0L).as("peak")),
      (st, i) => {
        val o16 = lit(45L) + i * 2L
        val u16 = byteAt(content, o16) + byteAt(content, o16 + 1) * 256L
        val s16 = when(u16 >= 32768L, u16 - 65536L).otherwise(u16)
        val s8 = byteAt(content, lit(45L) + i) - 128L
        val s = when(bits === 16L, s16).otherwise(s8)
        struct((st.getField("sum") + s).as("sum"),
          greatest(st.getField("peak"), abs(s)).as("peak"))
      })
    when(isWav(content) && leLong(content, 21, 2) === 1L && bits.isin(8L, 16L),
      struct(nSamples.as("n_samples"),
        folded.getField("sum").as("sample_sum"),
        folded.getField("peak").as("sample_peak")))
  }

  /** "Decode": REAL header parse for PNG payloads (width/height/
    * bit-depth/color-type straight from the IHDR bytes), md5-derived
    * pseudo-header stub for formats whose decode needs a native codec
    * (documented stub — this container ships none). Pure column
    * expressions either way (codegen'd), and the stub arm stays
    * replicable in SQL for the oracle; the PNG arm is checked against
    * ground truth persisted independently of the parser
    * (fixtures/png_assets.parquet, tools/gen_png_fixture.py).
    *
    * Branch contract: the format dispatch is on the container
    * SIGNATURE (isPng/isJpeg/isMp4/isWav), so a recognized container
    * whose header fails to parse (corrupt box chain, non-v0 MP4)
    * reports NULL for the fields the parse could not recover — the
    * honest answer — rather than falling through to the md5-derived
    * stub, which is reserved for payloads no signature matches. */
  def decodeMeta(assets: DataFrame): DataFrame = {
    val h = md5(col("content"))
    val png = isPng(col("content"))
    val wav = isWav(col("content"))
    val jpg = isJpeg(col("content"))
    val mp4 = isMp4(col("content"))
    val c = col("content")
    withJpegSof(withMp4Meta(assets, c, "_m4_"), c, "_sof_")
      .withColumn("n_bytes", length(c).cast("long"))
      .withColumn("width",
        when(png, beLong(substring(c, 17, 4)))
          .when(jpg, col("_sof_width"))
          .when(mp4, col("_m4_width"))
          .otherwise(conv(substring(h, 1, 7), 16, 10).cast("long") % 240 + 16))
      .withColumn("height",
        when(png, beLong(substring(c, 21, 4)))
          .when(jpg, col("_sof_height"))
          .when(mp4, col("_m4_height"))
          .otherwise(conv(substring(h, 8, 7), 16, 10).cast("long") % 240 + 16))
      .withColumn("bit_depth",
        when(png, beLong(substring(c, 25, 1)))
          .when(jpg, col("_sof_precision"))
          .when(wav, leLong(c, 35, 2)))
      .withColumn("color_type",
        when(png, beLong(substring(c, 26, 1))))
      .withColumn("sample_rate",
        when(wav, leLong(c, 25, 4)))
      .withColumn("channels",
        when(wav, leLong(c, 23, 2))
          .when(jpg, col("_sof_n_components"))
          .otherwise(when(col("modality") === "image", 3L).otherwise(1L)))
      .withColumn("duration_ms",
        when(wav, floorDiv(leLong(c, 41, 4) * 1000, leLong(c, 29, 4)))
          .when(mp4, col("_m4_duration_ms"))
          .otherwise(when(col("modality") === "image", 0L)
            .otherwise(col("n_bytes") * 20L)))
      .drop("_m4_timescale", "_m4_duration_ms", "_m4_track_id",
        "_m4_width", "_m4_height", "_sof_width", "_sof_height",
        "_sof_precision", "_sof_n_components", "_sof_progressive")
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
