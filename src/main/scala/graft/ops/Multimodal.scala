package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract operators.
  *
  * The Spark-side plumbing (schema, batching, partition sizing) is real; the
  * codec itself is STUBBED with a deterministic fake — this container has no
  * image/audio libraries, and in production the `decodeStub` body is the only
  * thing to replace (e.g. with a JNI codec or a `mapInPandas`-equivalent
  * Arrow batch UDF on the Python side).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("mime_type", StringType, nullable = true)))

  /** Wrap a text corpus as a binary media table (UTF-8 payload) — the shape
    * real ingestion produces (id, bytes, mime).
    */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      lit("text/plain").as("mime_type"))

  /** Payload metadata: byte length + content digest. Pure expressions; at
    * scale this is the cheap first pass that lets later stages partition by
    * size and dedup by digest without ever decoding.
    */
  def payloadMetadata(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("mime_type"),
      octet_length(col("payload")).as("n_bytes"),
      sha2(col("payload"), 256).as("sha256"))

  /** REAL image-container metadata: format + pixel dimensions parsed from
    * the payload's header bytes for PNG / GIF / BMP — pure codegen'd
    * builtins (binary substring + hex + radix conversion), no image
    * library, no UDF, so it runs at scan speed over 100 TB of payloads.
    * Unrecognized or truncated payloads yield a null struct (a corrupt blob
    * must not kill the scan). PNG stores IHDR dimensions big-endian at
    * offsets 17/21; GIF (87a/89a) and BMP little-endian at 7/9 and 19/23.
    */
  def imageDimensions(payload: Column): Column = {
    // unsigned big-endian int from `len` bytes at 1-based offset `off`
    def be(off: Int, len: Int): Column =
      conv(hex(substring(payload, off, len)), 16, 10).cast("long")
    // little-endian: reverse the bytes before radix conversion
    def le(off: Int, len: Int): Column =
      conv(concat((off + len - 1).to(off, -1).map(i => hex(substring(payload, i, 1))): _*),
        16, 10).cast("long")
    val isPng = octet_length(payload) >= 24 &&
      hex(substring(payload, 1, 8)) === "89504E470D0A1A0A"
    val isGif = octet_length(payload) >= 10 &&
      (hex(substring(payload, 1, 6)) === "474946383761" || // GIF87a
        hex(substring(payload, 1, 6)) === "474946383961") // GIF89a
    val isBmp = octet_length(payload) >= 26 && hex(substring(payload, 1, 2)) === "424D"
    // JPEG dimensions sit at a variable offset (frame-header segment) — the
    // native graft.plans.JpegDimensions walks the marker stream in codegen
    val jpeg = graft.plans.VectorExpressions.jpegDimensions(payload)
    val isJpeg = octet_length(payload) >= 4 && hex(substring(payload, 1, 2)) === "FFD8"
    when(isPng, struct(lit("png").as("format"),
        be(17, 4).as("width"), be(21, 4).as("height")))
      .when(isGif, struct(lit("gif").as("format"),
        le(7, 2).as("width"), le(9, 2).as("height")))
      .when(isBmp, struct(lit("bmp").as("format"),
        le(19, 4).as("width"),
        // BMP height is SIGNED (negative = top-down row order) — two's-
        // complement fold, then magnitude: consumers want pixel extent
        abs(when(le(23, 4) >= 2147483648L, le(23, 4) - 4294967296L)
          .otherwise(le(23, 4))).as("height")))
      .when(isJpeg && jpeg.isNotNull, struct(lit("jpeg").as("format"),
        jpeg.getField("width").as("width"), jpeg.getField("height").as("height")))
  }

  /** REAL audio-container metadata: channels / sample rate / bit depth /
    * frame count parsed from WAV (RIFF) chunk streams by the native
    * [[graft.plans.WavMetadata]] expression (any chunk order, unknown
    * chunks skipped, word-alignment honored). Null for non-WAV payloads.
    * Duration seconds = n_frames / sample_rate, computed here as a double
    * convenience column.
    */
  def audioMetadata(payload: Column): Column = {
    val m = graft.plans.VectorExpressions.wavMetadata(payload)
    when(m.isNotNull, struct(
      lit("wav").as("format"),
      m.getField("channels").as("channels"),
      m.getField("sample_rate").as("sample_rate"),
      m.getField("bits_per_sample").as("bits_per_sample"),
      m.getField("n_frames").as("n_frames"),
      (m.getField("n_frames").cast("double") / m.getField("sample_rate"))
        .as("duration_s")))
  }

  /** REAL MP3 metadata: first-valid-frame header fields (ID3v2 skipped,
    * false syncs resynced) via the codegen'd [[graft.plans.Mp3Metadata]]
    * walk; duration_s is the CBR estimate audio_bytes·8 / bitrate. Null
    * struct for payloads with no valid frame header.
    */
  def mp3Metadata(payload: Column): Column = {
    val m = graft.plans.VectorExpressions.mp3Metadata(payload)
    when(m.isNotNull, struct(
      lit("mp3").as("format"),
      m.getField("layer").as("layer"),
      m.getField("bitrate_kbps").as("bitrate_kbps"),
      m.getField("sample_rate").as("sample_rate"),
      m.getField("audio_bytes").as("audio_bytes"),
      (m.getField("audio_bytes").cast("double") * 8.0 /
        (m.getField("bitrate_kbps").cast("double") * 1000.0)).as("duration_s")))
  }

  /** REAL video-container metadata: movie timescale / duration / video-track
    * pixel dimensions parsed from MP4 (ISO-BMFF) box trees by the native
    * [[graft.plans.Mp4Metadata]] expression (`moov`→`mvhd` for timing,
    * first nonzero-dimension `trak`→`tkhd` for extent; v0 and v1 full-box
    * layouts, 64-bit largesize boxes, unknown boxes skipped). Null for
    * non-MP4 / truncated / corrupt payloads. Duration seconds =
    * duration / timescale, computed here as a double convenience column.
    */
  def videoMetadata(payload: Column): Column = {
    val m = graft.plans.VectorExpressions.mp4Metadata(payload)
    when(m.isNotNull, struct(
      lit("mp4").as("format"),
      m.getField("timescale").as("timescale"),
      m.getField("duration").as("duration"),
      m.getField("width").as("width"),
      m.getField("height").as("height"),
      (m.getField("duration").cast("double") / m.getField("timescale"))
        .as("duration_s")))
  }

  /** STUB decode: deterministic fake "image" properties derived from the
    * payload bytes. Replace the three expressions with a real codec call
    * (for PIXEL decoding; [[imageDimensions]] already parses real container
    * headers); the output schema and the per-row batch shape are the
    * production contract.
    */
  def decodeStub(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      (octet_length(col("payload")) % 640 + 1).as("width"),
      (octet_length(col("payload")) * 7 % 480 + 1).as("height"),
      // engine-portable deterministic fake intensity (sha2 prefix mod 256)
      (conv(substring(sha2(col("payload"), 256), 1, 6), 16, 10) % 256)
        .cast("int").as("mean_intensity"))

  final case class DecodedMedia(media_id: Long, width: Int, height: Int,
      mean_intensity: Int)

  /** The deterministic stub codec in batch form: one SHA-256 instance per
    * PARTITION (the init-once-per-batch slot a real codec/model needs),
    * matching [[decodeStub]] bit-for-bit on non-null payloads.
    */
  def stubCodec(rows: Iterator[(Long, Array[Byte])]): Iterator[DecodedMedia] = {
    val md = java.security.MessageDigest.getInstance("SHA-256") // per-batch init
    rows.map { case (id, payload) =>
      val n = if (payload == null) 0 else payload.length
      md.reset()
      val digest = md.digest(if (payload == null) Array.emptyByteArray else payload)
      val prefix24 = ((digest(0) & 0xffL) << 16) | ((digest(1) & 0xffL) << 8) | (digest(2) & 0xffL)
      DecodedMedia(id, n % 640 + 1, n * 7 % 480 + 1, (prefix24 % 256).toInt)
    }
  }

  /** Batched decode through an injectable codec — the Scala analog of a
    * `mapInPandas` Arrow-batch UDF: the codec sees a whole partition's
    * (id, payload) iterator and yields decoded rows, so a production
    * implementation amortizes codec/model initialization per batch and
    * controls batch size via `spark.sql.files.maxPartitionBytes` /
    * `repartition`. Output schema is the fixed production contract; the
    * default codec is the deterministic stub (no media libs here).
    */
  def decodeBatched(media: DataFrame,
      codec: Iterator[(Long, Array[Byte])] => Iterator[DecodedMedia] = stubCodec): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(codec)
      .toDF()
  }

  /** STUB resize: target dimensions plus the scale factors from the decoded
    * (stub) source dimensions, and a deterministic digest of the "resized"
    * payload. A real implementation replaces the digest expression with the
    * codec's resize call (via [[decodeBatched]]'s batch slot); the schema —
    * (media_id, width, height, scale_x, scale_y, resized_digest) — and the
    * pure-projection shape (no shuffle, runs inside the scan's codegen
    * stage) are the production contract.
    */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0, "resize targets must be positive")
    val srcW = octet_length(col("payload")) % 640 + 1
    val srcH = octet_length(col("payload")) * 7 % 480 + 1
    media.select(
      col("media_id"),
      lit(targetW).cast("long").as("width"),
      lit(targetH).cast("long").as("height"),
      round(srcW.cast("double") / targetW, 4).as("scale_x"),
      round(srcH.cast("double") / targetH, 4).as("scale_y"),
      sha2(concat(col("payload"), lit(s"${targetW}x$targetH").cast("binary")), 256)
        .as("resized_digest"))
  }

  /** STUB frame sampling: emit `n` evenly-spaced frame indices with a
    * deterministic per-frame digest — the row-explosion plumbing (one row per
    * sampled frame, repartitionable downstream) is the real part.
    */
  def sampleFramesStub(media: DataFrame, n: Int): DataFrame = {
    require(n > 0, s"sampleFramesStub: n must be positive, got $n" +
      " (sequence(0, n-1) with n=0 would emit frames 0 and -1)")
    media.select(col("media_id"), col("payload"),
      explode(sequence(lit(0), lit(n - 1))).as("frame_idx"))
      .select(
        col("media_id"), col("frame_idx"),
        sha2(concat(col("payload"), col("frame_idx").cast("string").cast("binary")), 256)
          .as("frame_digest"))
  }
}
