package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus decode / resize / feature-extract
  * operators.
  *
  * The image path is REAL end-to-end: container metadata via codegen'd
  * header parses, pixel decode via the JDK's `javax.imageio` readers
  * (PNG/JPEG/BMP/GIF — zero added dependencies) behind the batch seam, a
  * fixed-point bilinear resize, and multi-frame sampling through the same
  * readers' `getNumImages`/`read(idx)` random access ([[sampleFrames]]).
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

  final case class DecodedImage(media_id: Long, format: Option[String],
      width: Option[Long], height: Option[Long], mean_intensity: Option[Long])

  /** Decode one payload to RGB samples with a REUSED `ImageReader` — the
    * per-batch amortization the codec seam exists for (`ImageIO.read`
    * re-discovers a reader and re-wraps streams per call; a reused reader
    * is the difference between ~µs and ~ms per tiny image). Returns
    * (formatName, width, height, row-major RGB ints) or null for payloads
    * no installed reader accepts / corrupt streams — a bad blob must yield
    * a null row, never kill the scan.
    */
  private final class ImageDecoder {
    private var reader: javax.imageio.ImageReader = _
    private var readerFormat: String = _

    /** Release the cached reader's native/heap resources eagerly — called
      * when the partition iterator is exhausted (see [[completing]]), the
      * same explicit-dispose discipline the error paths already follow.
      */
    def dispose(): Unit = {
      if (reader != null) {
        try reader.dispose() catch { case _: Exception => () }
        reader = null; readerFormat = null
      }
    }

    def decode(payload: Array[Byte]): (String, Int, Int, Array[Int]) = {
      if (payload == null) return null
      // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream:
      // the factory consults the stream-SPI registry per call and, with
      // the default useCache=true, backs each stream with a TEMP FILE —
      // a file create+delete per image. The payload is already in memory.
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        if (reader != null) {
          // fast path: probe the cached reader before a registry scan
          iis.mark()
          val ok = try reader.getOriginatingProvider.canDecodeInput(iis)
            catch { case _: Exception => false }
          iis.reset()
          if (!ok) { reader.dispose(); reader = null; readerFormat = null }
        }
        if (reader == null) {
          val it = javax.imageio.ImageIO.getImageReaders(iis)
          if (!it.hasNext) return null
          reader = it.next()
          // Locale.ROOT: the default locale would turn "GIF"/"AIFF" into
          // dotless-ı forms under tr/az locales
          readerFormat = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
        }
        reader.setInput(iis, true, true)
        val img = reader.read(0)
        val (w, h) = (img.getWidth, img.getHeight)
        (readerFormat, w, h, img.getRGB(0, 0, w, h, null, 0, w))
      } catch {
        case _: Exception =>
          if (reader != null) { reader.dispose(); reader = null; readerFormat = null }
          null
      } finally {
        // drop the cached reader's reference to this payload's stream so
        // the memory-cached bytes are collectable between rows (the reader
        // INSTANCE stays cached — that is the point; its input must not)
        if (reader != null) try reader.setInput(null) catch { case _: Exception => () }
        iis.close()
      }
    }
  }

  /** REAL pixel codec: `javax.imageio` (PNG/JPEG/BMP/GIF ship in the JDK —
    * zero added dependencies) through the batch seam. Emits format, pixel
    * dimensions, and `mean_intensity` = floor(sum of all R,G,B samples /
    * (3·w·h)) — integer arithmetic end-to-end so lossless formats are
    * engine-replayable exactly. Undecodable payloads yield a null-field
    * row (the corrupt-blob contract of [[imageDimensions]]).
    */
  /** Run `onDone` exactly once when `it` is exhausted — the hook that lets a
    * per-partition cached codec (ImageReader) be disposed deterministically
    * instead of waiting for GC. Two triggers, whichever fires first:
    * `hasNext` returning false (the common full-drain path), and the
    * task-completion listener — which also covers consumers that abandon
    * the iterator early (`limit`/`take` short-circuits, task kills), where
    * eager disposal matters most. `onDone` must therefore be idempotent
    * and safe to call from the task-cleanup thread (ImageReader.dispose
    * and stream closes are).
    */
  private def completing[T](it: Iterator[T])(onDone: => Unit): Iterator[T] = {
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    def fire(): Unit = if (fired.compareAndSet(false, true)) onDone
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => fire())
    new Iterator[T] {
      override def hasNext: Boolean = {
        val h = it.hasNext
        if (!h) fire()
        h
      }
      override def next(): T = it.next()
    }
  }

  def imageIoCodec(rows: Iterator[(Long, Array[Byte])]): Iterator[DecodedImage] = {
    val dec = new ImageDecoder // per-partition init (the seam's purpose)
    completing(rows.map { case (id, payload) =>
      dec.decode(payload) match {
        case null => DecodedImage(id, None, None, None, None)
        case (fmt, w, h, rgb) =>
          var sum = 0L
          var i = 0
          while (i < rgb.length) {
            val p = rgb(i)
            sum += ((p >>> 16) & 0xff) + ((p >>> 8) & 0xff) + (p & 0xff)
            i += 1
          }
          DecodedImage(id, Some(fmt), Some(w.toLong), Some(h.toLong),
            Some(sum / (3L * w * h)))
      }
    })(dec.dispose())
  }

  /** Batched decode through an injectable codec — the Scala analog of a
    * `mapInPandas` Arrow-batch UDF: the codec sees a whole partition's
    * (id, payload) iterator and yields decoded rows, so the implementation
    * amortizes codec/model initialization per batch and controls batch
    * size via `spark.sql.files.maxPartitionBytes` / `repartition`. Output
    * schema is the fixed production contract; the default codec is the
    * REAL JDK `ImageIO` decoder ([[imageIoCodec]]).
    */
  /** NOTE on parallelizing small codec inputs (optimization r17): the codec
    * seams below deliberately do NOT repartition. A `repartition(n)` here
    * lands ABOVE the caller's payload projection, so for synthesized or
    * projected payloads one upstream task materializes, locally sorts
    * (`spark.sql.execution.sortBeforeRepartition`) and shuffles every blob
    * before any decode parallelism is gained — measured 9-89 s/run at x10
    * where the unshuffled form ran 3 s (the guide §8 lesson verbatim:
    * never move the heavy bytes to fix a scheduling problem). Callers that
    * need decode parallelism on a near-single-split input must spread the
    * NARROW side (ids) BEFORE attaching payload bytes — see
    * `Queries.spreadDocs` for the gate-side pattern.
    */
  def decodeBatched(media: DataFrame,
      codec: Iterator[(Long, Array[Byte])] => Iterator[DecodedImage] = imageIoCodec): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(codec)
      .toDF()
  }

  final case class ResizedImage(media_id: Long, width: Long, height: Long,
      scale_x: Option[Double], scale_y: Option[Double],
      resized_digest: Option[String])

  /** REAL resize: decode via `ImageIO`, then FIXED-POINT bilinear to
    * `targetW`×`targetH` — every weight and rounding is 16.16/32-bit
    * integer arithmetic, so the resized bytes are bit-deterministic across
    * JVMs and SQL-replayable (no dependence on `Graphics2D` interpolation
    * internals, which pin neither). Mapping is align-corners:
    * `fx = X·(srcW−1)·65536 ∕ (targetW−1)` (0 when targetW = 1), sample =
    * `(top·(65536−dy) + bot·dy + 2³¹) >> 32` with `top`/`bot` the
    * dx-interpolated row pairs.
    *
    * `resized_digest` = SHA-256 of the LOWERCASE-HEX string of the resized
    * row-major RGB bytes — hex-string form because the oracle engine's
    * `sha256` accepts VARCHAR only, and a digest convention the oracle
    * cannot evaluate would gate nothing. Undecodable payloads keep the
    * target dims but null scales/digest.
    */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0, "resize targets must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val dec = new ImageDecoder
        val md = java.security.MessageDigest.getInstance("SHA-256")
        val hexDigits = "0123456789abcdef".getBytes
        completing(rows.map { case (id, payload) =>
          dec.decode(payload) match {
            case null =>
              ResizedImage(id, targetW.toLong, targetH.toLong, None, None, None)
            case (_, w, h, rgb) =>
              val hex = new Array[Byte](targetH * targetW * 6)
              var o = 0
              var ty = 0
              while (ty < targetH) {
                val fy = if (targetH == 1) 0L else ty.toLong * (h - 1) * 65536L / (targetH - 1)
                val y0 = (fy >> 16).toInt
                val dy = fy & 0xffffL
                val y1 = math.min(y0 + 1, h - 1)
                var tx = 0
                while (tx < targetW) {
                  val fx = if (targetW == 1) 0L else tx.toLong * (w - 1) * 65536L / (targetW - 1)
                  val x0 = (fx >> 16).toInt
                  val dx = fx & 0xffffL
                  val x1 = math.min(x0 + 1, w - 1)
                  val p00 = rgb(y0 * w + x0); val p01 = rgb(y0 * w + x1)
                  val p10 = rgb(y1 * w + x0); val p11 = rgb(y1 * w + x1)
                  var sh = 16
                  while (sh >= 0) {
                    val top = ((p00 >>> sh) & 0xff) * (65536L - dx) + ((p01 >>> sh) & 0xff) * dx
                    val bot = ((p10 >>> sh) & 0xff) * (65536L - dx) + ((p11 >>> sh) & 0xff) * dx
                    val v = ((top * (65536L - dy) + bot * dy + (1L << 31)) >> 32).toInt
                    hex(o) = hexDigits(v >>> 4); hex(o + 1) = hexDigits(v & 0xf)
                    o += 2
                    sh -= 8
                  }
                  tx += 1
                }
                ty += 1
              }
              md.reset()
              // HALF_UP, not rint's half-even: SQL oracles' round() is
              // half-away-from-zero, and a .00005 tie must not diverge
              ResizedImage(id, targetW.toLong, targetH.toLong,
                Some(BigDecimal(w.toDouble / targetW)
                  .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble),
                Some(BigDecimal(h.toDouble / targetH)
                  .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble),
                Some(hexDigest(md.digest(hex))))
          }
        })(dec.dispose())
      }
      .toDF()
  }

  /** 32-byte digest → 64-char lowercase hex: the one digest-rendering
    * convention every codec gate's oracle replays (`sha256(hexstr)` in
    * DuckDB yields lowercase hex).
    */
  private def hexDigest(dg: Array[Byte]): String = {
    val hexDigits = HexDigits
    val out = new Array[Byte](64)
    var i = 0
    while (i < 32) {
      out(2 * i) = hexDigits((dg(i) >>> 4) & 0xf)
      out(2 * i + 1) = hexDigits(dg(i) & 0xf)
      i += 1
    }
    new String(out, java.nio.charset.StandardCharsets.US_ASCII)
  }
  private val HexDigits = "0123456789abcdef".getBytes

  final case class FrameSample(media_id: Long, sample_ord: Int,
      frame_idx: Option[Long], n_frames: Option[Long],
      mean_intensity: Option[Long], frame_digest: Option[String])

  /** REAL frame sampling: open each payload with the JDK's `javax.imageio`
    * GIF reader (multi-frame via `getNumImages(allowSearch = true)`), pick
    * `n` evenly-spaced frame indices align-corners (`idx_j = j·(F−1)/(n−1)`,
    * integer division; all 0 when n = 1), decode each sampled frame, and
    * emit one row per sample: frame index, total frame count,
    * `mean_intensity` = floor(Σ(R+G+B) / (3·w·h)) (the [[decodeBatched]]
    * convention), and `frame_digest` = SHA-256 of the lowercase-hex string
    * of the frame's row-major RED-channel bytes — the luma digest for
    * grayscale-palette fixtures, hex-string form so a SQL oracle can
    * recompute it arithmetically. Payloads that are not multi-frame-readable
    * images yield `n` rows with null frame fields (the structural row count
    * survives; the corrupt-blob contract of [[decodeBatched]] holds), never
    * a scan failure.
    *
    * Scale shape: per-row decode behind the same `mapPartitions` seam as
    * the image codec — reader instance reused across a partition, no
    * shuffle; the n-row explosion is bounded and explicit.
    */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    require(n > 0, s"sampleFrames: n must be positive, got $n")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        val hexDigits = "0123456789abcdef".getBytes
        // reader cached per partition with a canDecodeInput fast-path probe
        // (the [[ImageDecoder]] rationale — getImageReaders is a registry
        // scan per call); disposed on decode failure, format change, or
        // (via the completing wrapper below) iterator exhaustion
        var reader: javax.imageio.ImageReader = null
        completing(rows.flatMap { case (id, payload) =>
          val nulls = (0 until n).map(j => FrameSample(id, j, None, None, None, None))
          if (payload == null) nulls
          else {
            // memory-cached stream, not ImageIO.createImageInputStream —
            // the factory's default useCache=true backs each stream with a
            // temp FILE (see [[ImageDecoder.decode]])
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(payload))
            try {
              if (reader != null) {
                iis.mark()
                val ok = try reader.getOriginatingProvider.canDecodeInput(iis)
                  catch { case _: Exception => false }
                iis.reset()
                if (!ok) { reader.dispose(); reader = null }
              }
              if (reader == null) {
                val it = javax.imageio.ImageIO.getImageReaders(iis)
                if (it.hasNext) reader = it.next()
              }
              if (reader == null) nulls
              else try {
                // seekForwardOnly = false: getNumImages(true) walks the
                // whole stream, then read(idx) random-accesses frames
                reader.setInput(iis, false, true)
                val frames = reader.getNumImages(true)
                if (frames <= 0) nulls
                else (0 until n).map { j =>
                  val idx =
                    if (n == 1) 0
                    else (j.toLong * (frames - 1) / (n - 1)).toInt
                  val img = reader.read(idx)
                  val (w, h) = (img.getWidth, img.getHeight)
                  val rgb = img.getRGB(0, 0, w, h, null, 0, w)
                  var sum = 0L
                  val hex = new Array[Byte](rgb.length * 2)
                  var i = 0
                  while (i < rgb.length) {
                    val p = rgb(i)
                    val r = (p >>> 16) & 0xff
                    sum += r + ((p >>> 8) & 0xff) + (p & 0xff)
                    hex(2 * i) = hexDigits(r >>> 4)
                    hex(2 * i + 1) = hexDigits(r & 0xf)
                    i += 1
                  }
                  md.reset()
                  FrameSample(id, j, Some(idx.toLong), Some(frames.toLong),
                    Some(sum / (3L * w * h)), Some(hexDigest(md.digest(hex))))
                }
              } catch {
                case _: Exception =>
                  if (reader != null) { reader.dispose(); reader = null }
                  nulls
              }
            } finally {
              // release the payload stream from the cached reader (the
              // [[ImageDecoder.decode]] rationale)
              if (reader != null) try reader.setInput(null) catch { case _: Exception => () }
              iis.close()
            }
          }
        }) {
          if (reader != null) {
            try reader.dispose() catch { case _: Exception => () }
            reader = null
          }
        }
      }
      .toDF()
  }

  final case class VideoFrame(media_id: Long, frame_idx: Option[Long],
      container: Option[String], format: Option[String],
      width: Option[Long], height: Option[Long], mean_intensity: Option[Long])

  /** Byte ranges `(offset, length)` of the video-data chunks (`##dc`/`##db`)
    * inside a RIFF AVI payload's `LIST movi`, in stream order — or null for
    * anything that is not a well-formed AVI (wrong magic, truncated chunk,
    * size running past the buffer). Pure byte walk, no allocation beyond
    * the result; the public RIFF rules (little-endian sizes, word-aligned
    * chunks) are the whole grammar.
    */
  private def aviVideoChunks(p: Array[Byte]): Array[(Int, Int)] = {
    def le32(o: Int): Long =
      (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
        ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)
    def isFcc(o: Int, s: String): Boolean =
      (p(o) & 0xff) == s.charAt(0) && (p(o + 1) & 0xff) == s.charAt(1) &&
        (p(o + 2) & 0xff) == s.charAt(2) && (p(o + 3) & 0xff) == s.charAt(3)
    if (p.length < 12 || !isFcc(0, "RIFF") || !isFcc(8, "AVI ")) return null
    val riffEnd = math.min(p.length.toLong, 8 + le32(4))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var pos = 12L
    while (pos + 8 <= riffEnd) {
      val size = le32(pos.toInt + 4)
      val dataStart = pos + 8
      if (dataStart + size > riffEnd) return null // truncated chunk
      if (isFcc(pos.toInt, "LIST")) {
        if (size < 4) return null
        if (isFcc(dataStart.toInt, "movi")) {
          var sp = dataStart + 4
          val listEnd = dataStart + size
          while (sp + 8 <= listEnd) {
            val ssz = le32(sp.toInt + 4)
            if (sp + 8 + ssz > listEnd) return null
            val b2 = p(sp.toInt + 2) & 0xff
            val b3 = p(sp.toInt + 3) & 0xff
            if (b2 == 'd' && (b3 == 'c' || b3 == 'b'))
              out += ((sp.toInt + 8, ssz.toInt))
            sp += 8 + ssz + (ssz & 1)
          }
        }
        // non-movi LISTs (hdrl, odml) carry no frame data — skip whole
      }
      pos += 8 + size + (size & 1)
    }
    out.toArray
  }

  /** REAL video pixel decode: MJPEG-in-AVI frames through the JDK JPEG
    * reader — the container walked by [[aviVideoChunks]] (public RIFF/AVI
    * structure), each `00dc` frame handed to the same per-partition cached
    * [[ImageDecoder]] the image gates use. One output row per frame:
    * (frame_idx, container, frame format, dimensions, integer
    * mean_intensity — the [[imageIoCodec]] statistic). Non-AVI / truncated
    * payloads yield ONE null-fielded row (corrupt-blob contract); a valid
    * container whose individual frame fails to decode yields that frame's
    * row with null decode fields.
    *
    * Scale shape: per-row decode at the codec seam, zero shuffle; frame
    * payloads are sliced views of the already-in-memory blob.
    */
  def videoFrames(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val dec = new ImageDecoder
        completing(rows.flatMap { case (id, payload) =>
          val corrupt = Seq(VideoFrame(id, None, None, None, None, None, None))
          if (payload == null) corrupt
          else {
            val chunks = try aviVideoChunks(payload) catch {
              case _: IndexOutOfBoundsException => null
            }
            if (chunks == null || chunks.isEmpty) corrupt
            else chunks.iterator.zipWithIndex.map { case ((off, len), f) =>
              dec.decode(java.util.Arrays.copyOfRange(payload, off, off + len)) match {
                case null => VideoFrame(id, Some(f.toLong), Some("avi"),
                  None, None, None, None)
                // a decoder reporting a zero dimension is a failed decode,
                // not a divide-by-zero scan failure (corrupt-blob contract)
                case (_, w, h, _) if w <= 0 || h <= 0 =>
                  VideoFrame(id, Some(f.toLong), Some("avi"),
                    None, None, None, None)
                case (fmt, w, h, rgb) =>
                  var sum = 0L
                  var i = 0
                  while (i < rgb.length) {
                    val px = rgb(i)
                    sum += ((px >>> 16) & 0xff) + ((px >>> 8) & 0xff) + (px & 0xff)
                    i += 1
                  }
                  VideoFrame(id, Some(f.toLong), Some("avi"), Some(fmt),
                    Some(w.toLong), Some(h.toLong), Some(sum / (3L * w * h)))
              }
            }.toSeq
          }
        })(dec.dispose())
      }
      .toDF()
  }

  final case class DecodedAudio(media_id: Long, format: Option[String],
      sample_rate: Option[Long], channels: Option[Long], bits: Option[Long],
      n_frames: Option[Long], duration_us: Option[Long],
      mean_abs: Option[Long], peak_abs: Option[Long],
      pcm_digest: Option[String])

  /** REAL audio sample decode: `javax.sound.sampled` (the WAVE/AIFF/AU
    * readers ship in the JDK — zero added dependencies) through the same
    * `mapPartitions` batch seam as the image codec. For 16-bit signed PCM
    * streams it emits container format, declared rate/channels/bits, frame
    * count, integer microsecond duration (`frames·1e6 / rate`, floor), and
    * three sample statistics in exact integer arithmetic so a SQL oracle
    * replays them from the generator formula: `mean_abs` =
    * floor(Σ|sample| / total samples), `peak_abs` = max|sample|, and
    * `pcm_digest` = SHA-256 of the lowercase-hex string of each sample's
    * unsigned 16-bit bit pattern (`%04x`, stream order, channels
    * interleaved). 8-bit G.711 μ-law streams (AU containers) are expanded
    * to 16-bit linear with the exact public g711 integer arithmetic and
    * fed through the same conventions (`bits` reports the declared 8).
    * Payloads no installed provider accepts, truncated streams, and other
    * encodings yield a null-fielded row (the corrupt-blob contract of
    * [[decodeBatched]]), never a scan failure.
    *
    * Scale shape: per-row decode, no shuffle; statistics and digest are
    * streamed per frame chunk, so memory is O(frame buffer), not O(clip).
    * The `AudioFileReader` providers are ServiceLoader-cached PER PARTITION
    * with a last-successful-provider fast path — `AudioSystem.get*` routes
    * every call through a GLOBAL provider registry whose lookup serializes
    * concurrent callers (measured: ~8 ms/clip wall at 32 threads for a
    * ~120 µs/clip single-thread decode; the per-partition cache removes
    * the contention entirely), the audio analog of the image codec's
    * reused-`ImageReader` rationale.
    */
  /** Container name from the payload's own magic bytes — a FIXED vocabulary
    * (`wave`/`aiff`/`aifc`/`au`), independent of whatever string a
    * third-party `AudioFileReader` would report via
    * `AudioFileFormat.getType.toString` (a provider registered ahead of the
    * JDK one could say "WAV" and silently break the oracle's 'wave'
    * literal). Only consulted after a provider accepted the payload, so
    * `unknown` marks a container outside the canonical set, not a corrupt
    * blob.
    */
  private def containerName(p: Array[Byte]): String =
    if (p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == 'F' && p(8) == 'W' && p(9) == 'A' && p(10) == 'V' &&
        p(11) == 'E') "wave"
    else if (p.length >= 12 && p(0) == 'F' && p(1) == 'O' && p(2) == 'R' &&
        p(3) == 'M' && p(8) == 'A' && p(9) == 'I' && p(10) == 'F')
      (if (p(11) == 'C') "aifc" else "aiff")
    else if (p.length >= 4 && p(0) == '.' && p(1) == 's' && p(2) == 'n' &&
        p(3) == 'd') "au"
    else "unknown"

  def decodeAudio(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        val hexDigits = "0123456789abcdef".getBytes
        val providers = {
          val it = java.util.ServiceLoader.load(
            classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
          val b = Array.newBuilder[javax.sound.sampled.spi.AudioFileReader]
          while (it.hasNext) b += it.next()
          b.result()
        }
        var last = -1 // index of the provider that accepted the previous payload
        // ONE header parse per payload (getAudioInputStream alone — the
        // container type comes from the magic bytes below, so the old
        // getAudioFileFormat pre-parse is gone), amortized further by the
        // last-successful-provider fast path
        def open(payload: Array[Byte]): javax.sound.sampled.AudioInputStream = {
          def tryOne(i: Int) =
            try {
              val ais = providers(i).getAudioInputStream(
                new java.io.ByteArrayInputStream(payload))
              last = i
              ais
            } catch { case _: Exception => null }
          var out = if (last >= 0) tryOne(last) else null
          var i = 0
          while (out == null && i < providers.length) {
            if (i != last) out = tryOne(i)
            i += 1
          }
          out
        }
        rows.map { case (id, payload) =>
          val nullRow =
            DecodedAudio(id, None, None, None, None, None, None, None, None, None)
          if (payload == null) nullRow
          else {
          // IMA/DVI ADPCM WAVE (fmt tag 0x11): the JDK has no ADPCM codec,
          // so the engine's own integer predictor decode handles it —
          // imaAdpcmWav returns null only when the payload is NOT an
          // IMA-ADPCM WAVE (providers then get their turn), and a
          // null-fielded row for a malformed one (corrupt-blob contract)
          val adpcmRow = imaAdpcmWav(id, payload, md, hexDigits)
          if (adpcmRow != null) adpcmRow
          else try {
            val ais = open(payload)
            if (ais == null) nullRow
            else {
            try {
              val f = ais.getFormat
              val enc = f.getEncoding
              if (enc == javax.sound.sampled.AudioFormat.Encoding.ULAW &&
                  f.getSampleSizeInBits == 8) {
                // G.711 μ-law (AU containers): expand each byte to 16-bit
                // linear with the public-domain g711 ulaw2linear arithmetic
                // (exact integers — `t = ((m<<3)+0x84)<<seg; ±(t-0x84)`),
                // then apply the SAME stats/digest conventions as the PCM
                // path, so a SQL oracle replays the expansion formula.
                // `bits` reports the container's declared 8.
                val channels = f.getChannels
                val rate = math.round(f.getSampleRate.toDouble)
                md.reset()
                val buf = new Array[Byte](8192)
                val hex = new Array[Byte](buf.length * 4)
                var sumAbs = 0L
                var peak = 0L
                var nSamples = 0L
                var eof = false
                while (!eof) {
                  val k = ais.read(buf, 0, buf.length)
                  if (k <= 0) eof = true
                  else {
                    var i = 0
                    while (i < k) {
                      val v = ~buf(i) & 0xff
                      val t = (((v & 0x0f) << 3) + 0x84) << ((v & 0x70) >> 4)
                      val sv = if ((v & 0x80) != 0) 0x84 - t else t - 0x84
                      val a = math.abs(sv).toLong
                      sumAbs += a
                      if (a > peak) peak = a
                      val p16 = sv & 0xffff
                      hex(4 * i) = hexDigits(p16 >>> 12)
                      hex(4 * i + 1) = hexDigits((p16 >>> 8) & 0xf)
                      hex(4 * i + 2) = hexDigits((p16 >>> 4) & 0xf)
                      hex(4 * i + 3) = hexDigits(p16 & 0xf)
                      nSamples += 1
                      i += 1
                    }
                    md.update(hex, 0, k * 4)
                  }
                }
                if (nSamples == 0 || rate <= 0 || channels <= 0) nullRow
                else DecodedAudio(id, Some(containerName(payload)), Some(rate),
                  Some(channels.toLong), Some(8L), Some(nSamples / channels),
                  Some(nSamples / channels * 1000000L / rate),
                  Some(sumAbs / nSamples), Some(peak),
                  Some(hexDigest(md.digest())))
              } else if (enc != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
                  f.getSampleSizeInBits != 16) nullRow
              else {
                val channels = f.getChannels
                val frameSize = f.getFrameSize // channels * 2
                val big = f.isBigEndian
                val rate = math.round(f.getSampleRate.toDouble)
                md.reset()
                val buf = new Array[Byte](frameSize * 4096)
                val hex = new Array[Byte](buf.length * 2)
                var carry = 0 // bytes of a split frame carried across reads
                var sumAbs = 0L
                var peak = 0L
                var nSamples = 0L
                var eof = false
                while (!eof) {
                  val k = ais.read(buf, carry, buf.length - carry)
                  if (k <= 0) eof = true
                  else {
                    val avail = carry + k
                    val whole = avail - avail % 2
                    var i = 0
                    while (i < whole) {
                      val b0 = buf(i) & 0xff
                      val b1 = buf(i + 1) & 0xff
                      val v16 = if (big) (b0 << 8) | b1 else (b1 << 8) | b0
                      val sv = (v16 << 16) >> 16 // sign-extend
                      val a = math.abs(sv).toLong
                      sumAbs += a
                      if (a > peak) peak = a
                      hex(2 * i) = hexDigits(v16 >>> 12)
                      hex(2 * i + 1) = hexDigits((v16 >>> 8) & 0xf)
                      hex(2 * i + 2) = hexDigits((v16 >>> 4) & 0xf)
                      hex(2 * i + 3) = hexDigits(v16 & 0xf)
                      nSamples += 1
                      i += 2
                    }
                    md.update(hex, 0, whole * 2)
                    carry = avail - whole
                    if (carry > 0) buf(0) = buf(whole)
                  }
                }
                if (nSamples == 0 || rate <= 0) nullRow
                else {
                  DecodedAudio(id,
                    Some(containerName(payload)),
                    Some(rate), Some(channels.toLong), Some(16L),
                    Some(nSamples / channels),
                    Some(nSamples / channels * 1000000L / rate),
                    Some(sumAbs / nSamples), Some(peak),
                    Some(hexDigest(md.digest())))
                }
              }
            } finally ais.close()
            }
          } catch {
            case _: Exception => nullRow
          }
          }
        }
      }
      .toDF()
  }

  /** Decode an IMA/DVI ADPCM WAVE payload (fmt tag 0x11, mono, 4-bit) with
    * the public IMA integer predictor arithmetic — step/index tables, the
    * `(step>>3) + conditional step>>2/step>>1/step` magnitude expansion,
    * ±32768 predictor clamp, 0..88 index clamp — through the SAME stats and
    * digest conventions as the PCM path ([[decodeAudio]] doc). Each block's
    * 4-byte header (initial predictor int16 LE, step index, reserved) IS
    * the block's first sample; data nibbles decode LOW nibble first. The
    * `fact` chunk bounds the emitted frame count (the final block may carry
    * padding nibbles); a missing `fact` derives the count from full blocks.
    *
    * Returns null when the payload is NOT an IMA-ADPCM WAVE (other readers
    * get their turn), a null-fielded row when it claims to be one but is
    * malformed (non-mono, wrong bit width, truncated data, zero rate —
    * the corrupt-blob contract), never throws.
    */
  private def imaAdpcmWav(id: Long, p: Array[Byte],
      md: java.security.MessageDigest, hexDigits: Array[Byte]): DecodedAudio = {
    if (p.length < 12 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' ||
        p(3) != 'F' || p(8) != 'W' || p(9) != 'A' || p(10) != 'V' ||
        p(11) != 'E') return null
    val nullRow =
      DecodedAudio(id, None, None, None, None, None, None, None, None, None)
    def le16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    def le32(o: Int): Long = (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
      ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)
    // chunk walk (word-aligned sizes, bounds-guarded)
    var fmtTag = -1; var channels = 0; var rate = 0L; var blockAlign = 0
    var bits = 0; var spb = 0
    var factFrames = -1L
    var dataOff = -1; var dataLen = 0
    var pos = 12
    while (pos + 8 <= p.length) {
      val size = le32(pos + 4)
      val ds = pos + 8
      if (ds + size > p.length) return nullRow // truncated chunk
      val isFmt = p(pos) == 'f' && p(pos + 1) == 'm' && p(pos + 2) == 't' &&
        p(pos + 3) == ' '
      val isFact = p(pos) == 'f' && p(pos + 1) == 'a' && p(pos + 2) == 'c' &&
        p(pos + 3) == 't'
      val isData = p(pos) == 'd' && p(pos + 1) == 'a' && p(pos + 2) == 't' &&
        p(pos + 3) == 'a'
      if (isFmt && size >= 16) {
        fmtTag = le16(ds)
        channels = le16(ds + 2)
        rate = le32(ds + 4)
        blockAlign = le16(ds + 12)
        bits = le16(ds + 14)
        spb = if (size >= 20 && le16(ds + 16) >= 2) le16(ds + 18)
          else if (blockAlign > 4) (blockAlign - 4) * 2 + 1 else 0
      } else if (isFact && size >= 4) factFrames = le32(ds)
      else if (isData) { dataOff = ds; dataLen = size.toInt }
      pos = ds + size.toInt + (size.toInt & 1)
    }
    if (fmtTag != 0x11) return null // not IMA ADPCM — not ours
    if (channels != 1 || bits != 4 || rate <= 0 || blockAlign < 5 ||
        spb < 1 || spb > (blockAlign - 4) * 2 + 1 || dataOff < 0)
      return nullRow
    val blocks = dataLen / blockAlign
    val frames = if (factFrames >= 0) factFrames else blocks.toLong * spb
    if (frames <= 0 ||
        frames > blocks.toLong * spb) return nullRow // data can't cover fact
    md.reset()
    val hex = new Array[Byte](4)
    var sumAbs = 0L; var peak = 0L; var emitted = 0L
    var blk = 0
    while (blk < blocks && emitted < frames) {
      val off = dataOff + blk * blockAlign
      var pred = (le16(off) << 16) >> 16 // sign-extended initial predictor
      var idx = p(off + 2) & 0xff
      if (idx > 88) idx = 88
      @inline def emit(s: Int): Unit = {
        val a = math.abs(s).toLong
        sumAbs += a
        if (a > peak) peak = a
        val v16 = s & 0xffff
        hex(0) = hexDigits(v16 >>> 12)
        hex(1) = hexDigits((v16 >>> 8) & 0xf)
        hex(2) = hexDigits((v16 >>> 4) & 0xf)
        hex(3) = hexDigits(v16 & 0xf)
        md.update(hex)
        emitted += 1
      }
      emit(pred) // the header predictor is sample 0 of the block
      var inBlock = 1
      var m = 0
      while (m < (blockAlign - 4) * 2 && inBlock < spb && emitted < frames) {
        val byte = p(off + 4 + (m >> 1)) & 0xff
        val nib = if ((m & 1) == 0) byte & 0xf else byte >>> 4
        val step = ImaAdpcmTables.Step(idx)
        var diff = step >> 3
        if ((nib & 4) != 0) diff += step
        if ((nib & 2) != 0) diff += step >> 1
        if ((nib & 1) != 0) diff += step >> 2
        pred = if ((nib & 8) != 0) pred - diff else pred + diff
        if (pred > 32767) pred = 32767 else if (pred < -32768) pred = -32768
        idx += ImaAdpcmTables.IndexDelta(nib)
        if (idx < 0) idx = 0 else if (idx > 88) idx = 88
        emit(pred)
        inBlock += 1
        m += 1
      }
      blk += 1
    }
    if (emitted < frames) return nullRow // truncated data chunk
    DecodedAudio(id, Some(containerName(p)), Some(rate), Some(1L), Some(4L),
      Some(frames), Some(frames * 1000000L / rate),
      Some(sumAbs / frames), Some(peak), Some(hexDigest(md.digest())))
  }
}

/** The public IMA/DVI ADPCM tables (IMA ADPCM reference algorithm). */
private object ImaAdpcmTables {
  val Step: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484,
    7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
    18500, 20350, 22385, 24623, 27086, 29794, 32767)
  val IndexDelta: Array[Int] = Array(
    -1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)
}
