package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Deterministic REAL-PNG synthesis: a spec-complete truecolor PNG
  * (signature, IHDR, one zlib IDAT of stored-deflate blocks, IEND — CRC32
  * and Adler32 included) whose pixels are a fixed arithmetic function of
  * `(id, x, y)`, so the [[graft.ops.Multimodal]] gates can drive the REAL
  * `javax.imageio` decoder over payloads whose decoded values a SQL oracle
  * recomputes arithmetically — any disagreement between this writer, the
  * JDK's PNG reader, and the documented pixel formula breaks the hash.
  *
  * Pixel formula (the SQL-replayable contract, row-major from top-left,
  * `s = y*w + x`, `b = id mod 251`):
  * {{{ r = (b + s) % 256; g = (b + 2s + 7) % 256; b = (b + 3s + 13) % 256 }}}
  *
  * Stored (uncompressed) deflate blocks keep the bytes deterministic across
  * JDK versions — no dependence on a Deflater's compression choices; the
  * JDK PNG reader inflates them like any other zlib stream.
  */
case class PngSynth(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[GraftSqlBridge.AbstractType] =
    Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_png_synth"

  override def nullSafeEval(id: Any, w: Any, h: Any): Any =
    PngSynth.compute(id.asInstanceOf[Long], w.asInstanceOf[Int], h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, w, h) => s"graft.plans.PngSynth.compute($id, $w, $h)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object PngSynth {
  /** The pixel generator — shared by [[compute]] and (arithmetically) by
    * the oracle SQL. Channel 0/1/2 = r/g/b.
    */
  @inline def pixel(id: Long, s: Long, ch: Int): Int = {
    val b = id % 251
    val v = ch match {
      case 0 => b + s
      case 1 => b + 2 * s + 7
      case _ => b + 3 * s + 13
    }
    (v % 256).toInt
  }

  def compute(id: Long, w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w.toLong * h <= (1 << 22),
      s"png_synth: dimensions ${w}x$h out of range")
    // raw scanline stream: per row, filter byte 0 + w RGB triples
    val raw = new Array[Byte](h * (1 + 3 * w))
    var y = 0
    var p = 0
    while (y < h) {
      raw(p) = 0 // filter: None
      p += 1
      var x = 0
      while (x < w) {
        val s = y.toLong * w + x
        raw(p) = pixel(id, s, 0).toByte
        raw(p + 1) = pixel(id, s, 1).toByte
        raw(p + 2) = pixel(id, s, 2).toByte
        p += 3
        x += 1
      }
      y += 1
    }
    // zlib stream: header 0x78 0x01, stored deflate blocks, Adler-32
    val zlib = new java.io.ByteArrayOutputStream(raw.length + 16)
    zlib.write(0x78); zlib.write(0x01)
    var off = 0
    while (off < raw.length) {
      val n = math.min(65535, raw.length - off)
      val fin = if (off + n >= raw.length) 1 else 0
      zlib.write(fin) // BFINAL | BTYPE=00 (stored)
      zlib.write(n & 0xff); zlib.write((n >>> 8) & 0xff) // LEN, little-endian
      zlib.write(~n & 0xff); zlib.write((~n >>> 8) & 0xff) // NLEN
      zlib.write(raw, off, n)
      off += n
    }
    val adler = new java.util.zip.Adler32
    adler.update(raw)
    writeBe32(zlib, adler.getValue)

    val out = new java.io.ByteArrayOutputStream(zlib.size() + 64)
    // signature
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'))
    // IHDR: w, h, bit depth 8, color type 2 (truecolor), 0, 0, 0
    val ihdr = new java.io.ByteArrayOutputStream(13)
    writeBe32(ihdr, w.toLong); writeBe32(ihdr, h.toLong)
    ihdr.write(8); ihdr.write(2); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk(out, "IHDR", ihdr.toByteArray)
    chunk(out, "IDAT", zlib.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeBe32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write(((v >>> 24) & 0xff).toInt); o.write(((v >>> 16) & 0xff).toInt)
    o.write(((v >>> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
  }

  private def chunk(o: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    writeBe32(o, data.length.toLong)
    val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    o.write(t, 0, 4)
    o.write(data, 0, data.length)
    val crc = new java.util.zip.CRC32
    crc.update(t); crc.update(data)
    writeBe32(o, crc.getValue)
  }

  def png(id: Column, w: Column, h: Column): Column =
    GraftSqlBridge.column(PngSynth(GraftSqlBridge.expression(id),
      GraftSqlBridge.expression(w), GraftSqlBridge.expression(h)))
}

/** Deterministic REAL animated-GIF synthesis: a spec-complete GIF89a
  * (logical screen descriptor, 256-entry grayscale global color table,
  * `nFrames` full-size image descriptors with "uncompressed" LZW data,
  * trailer) whose frame pixels are a fixed arithmetic function of
  * `(id, frame, x, y)` — the fixture generator for the REAL
  * `javax.imageio` GIF reader behind [[graft.ops.Multimodal.sampleFrames]].
  *
  * Pixel formula (the SQL-replayable contract, row-major, `s = y*w + x`,
  * `b = id mod 251`, frame index `f`):
  * {{{ v = (b + s + 17*f) % 256 }}}
  * palette entry `v` is the gray `(v, v, v)`, so the decoded RGB is exactly
  * `v` per channel — the oracle recomputes every sampled frame's mean and
  * digest from the formula alone.
  *
  * "Uncompressed" LZW is the public GIF technique: emit each 8-bit pixel
  * index as its own 9-bit literal code and issue a CLEAR before the
  * decoder's code table could reach 512 entries (every 125 literals keeps
  * it ≤ 382), so the code width never grows and the bytes are a pure
  * function of the pixels — no dependence on any encoder's match heuristics.
  */
case class GifSynth(first: Expression, second: Expression, third: Expression,
    fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[GraftSqlBridge.AbstractType] =
    Seq(LongType, IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable || fourth.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_gif_synth"

  override def nullSafeEval(id: Any, w: Any, h: Any, n: Any): Any =
    GifSynth.compute(id.asInstanceOf[Long], w.asInstanceOf[Int],
      h.asInstanceOf[Int], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (id, w, h, n) => s"graft.plans.GifSynth.compute($id, $w, $h, $n)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

object GifSynth {
  /** The per-frame pixel generator — shared by [[compute]] and
    * (arithmetically) by the oracle SQL.
    */
  @inline def pixel(id: Long, frame: Int, s: Long): Int =
    ((id % 251 + s + 17L * frame) % 256).toInt

  def compute(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w.toLong * h <= (1 << 20) && nFrames > 0 &&
      nFrames <= 64, s"gif_synth: ${w}x$h x$nFrames out of range")
    val out = new java.io.ByteArrayOutputStream(
      nFrames * (w * h * 9 / 8 + 32) + 800)
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    // logical screen descriptor: w, h (LE16), GCT present / 8-bit / size 256
    le16(out, w); le16(out, h)
    out.write(0xf7); out.write(0); out.write(0)
    // global color table: 256 grayscale entries (v, v, v)
    var v = 0
    while (v < 256) { out.write(v); out.write(v); out.write(v); v += 1 }
    var f = 0
    while (f < nFrames) {
      // image descriptor: full-frame at (0,0), no local table, no interlace
      out.write(0x2c)
      le16(out, 0); le16(out, 0); le16(out, w); le16(out, h)
      out.write(0)
      writeLzw(out, id, f, w, h)
      f += 1
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  private def le16(o: java.io.ByteArrayOutputStream, x: Int): Unit = {
    o.write(x & 0xff); o.write((x >>> 8) & 0xff)
  }

  /** One frame's pixel indices as an "uncompressed" LZW stream in ≤255-byte
    * sub-blocks: 9-bit literal codes LSB-first, CLEAR(256) up front and
    * every 125 literals, EOI(257) last.
    */
  private def writeLzw(out: java.io.ByteArrayOutputStream, id: Long, f: Int,
      w: Int, h: Int): Unit = {
    out.write(8) // LZW minimum code size
    val bits = new java.io.ByteArrayOutputStream(w * h * 9 / 8 + 16)
    var acc = 0L
    var nbits = 0
    def emit(code: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += 9
      while (nbits >= 8) {
        bits.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8
      }
    }
    emit(256)
    var s = 0L
    var run = 0
    val n = w.toLong * h
    while (s < n) {
      emit(pixel(id, f, s))
      run += 1
      if (run == 125 && s < n - 1) { emit(256); run = 0 }
      s += 1
    }
    emit(257)
    if (nbits > 0) bits.write((acc & 0xff).toInt)
    val data = bits.toByteArray
    var off = 0
    while (off < data.length) {
      val k = math.min(255, data.length - off)
      out.write(k)
      out.write(data, off, k)
      off += k
    }
    out.write(0) // block terminator
  }

  def gif(id: Column, w: Column, h: Column, nFrames: Column): Column =
    GraftSqlBridge.column(GifSynth(GraftSqlBridge.expression(id),
      GraftSqlBridge.expression(w), GraftSqlBridge.expression(h),
      GraftSqlBridge.expression(nFrames)))
}

/** Deterministic REAL baseline-JPEG synthesis: a spec-complete JFIF
  * (SOI, APP0, DQT, SOF0, two DHTs, SOS, entropy-coded scan, EOI) baseline
  * sequential YCbCr 4:4:4 JPEG built from DC-ONLY 8×8 blocks — the one
  * JPEG family whose decoded pixels are BIT-EXACT across conformant
  * decoders, closing the codec-fixture matrix (PNG/GIF/BMP/WAV all have
  * arithmetic oracles; JPEG was parsed but never pixel-verified).
  *
  * Exactness argument (why a LOSSY codec can carry a hash gate):
  *  - Every block carries only a DC coefficient. The IDCT of a DC-only
  *    block is the flat value `dequant/8 + 128`; with quantizer
  *    `q00 = 8` that is `128 + d` with the division exact, so every
  *    integer or float IDCT implementation agrees bit-for-bit (libjpeg's
  *    islow: DESCALE((d·8)<<2, 5) = d exactly, both signs).
  *  - Chroma blocks are all-zero → flat Cb = Cr = 128. libjpeg's
  *    fixed-point YCbCr→RGB tables are exactly zero-offset at 128
  *    (Cr_r_tab[128] = (0 + ONE_HALF) >> SCALEBITS = 0, etc.), so
  *    R = G = B = Y with no rounding. 4:4:4 sampling avoids the merged-
  *    upsample path entirely.
  *
  * Block formula (the SQL-replayable contract, blocks row-major,
  * `k = by·wb + bx`, `b = id mod 251`): {{{ g_k = (b + 23·k) % 256 }}}
  * — all 64 pixels of block `k` decode to gray `(g_k, g_k, g_k)`.
  *
  * Huffman tables are the public ITU T.81 Annex K luminance pair (the same
  * tables virtually every camera emits); codes are derived from
  * (BITS, HUFFVAL) by the Annex C algorithm at class-init time.
  */
case class JpegSynth(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[GraftSqlBridge.AbstractType] =
    Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  // nullable: out-of-range block counts yield null (the corrupt-blob
  // contract of the decoders this feeds), never a thrown scan failure
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_jpeg_synth"

  override def nullSafeEval(id: Any, wb: Any, hb: Any): Any =
    JpegSynth.compute(id.asInstanceOf[Long], wb.asInstanceOf[Int],
      hb.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (id, wb, hb) => s"""
      ${ev.value} = graft.plans.JpegSynth.compute($id, $wb, $hb);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object JpegSynth {
  /** The per-block gray generator — shared by [[compute]] and
    * (arithmetically) by the oracle SQL.
    */
  @inline def blockGray(id: Long, k: Long): Int =
    ((id % 251 + 23L * k) % 256L).toInt

  // ITU T.81 Annex K, Table K.3: luminance DC (BITS per code length 1..16,
  // then HUFFVAL = categories 0..11)
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array.tabulate(12)(identity)
  // Annex K, Table K.5: luminance AC
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Annex C code assignment: value → (code, length). */
  private def deriveCodes(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out
  }
  private val DcCodes = deriveCodes(DcBits, DcVals)
  private val AcCodes = deriveCodes(AcBits, AcVals)
  private val AcEob = AcCodes(0x00)

  /** Entropy-coded-segment bit writer with mandatory 0xFF→0xFF00 stuffing;
    * the final partial byte is 1-padded per the spec.
    */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      n += len
      while (n >= 8) {
        val b = ((acc >>> (n - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00)
        n -= 8
      }
    }
    def finish(): Unit = if (n > 0) {
      val b = (((acc << (8 - n)) | ((1 << (8 - n)) - 1)) & 0xff).toInt
      out.write(b)
      if (b == 0xff) out.write(0x00)
      n = 0
    }
  }

  def compute(id: Long, wBlocks: Int, hBlocks: Int): Array[Byte] = {
    if (wBlocks <= 0 || hBlocks <= 0 ||
        wBlocks.toLong * hBlocks > (1 << 16) ||
        wBlocks > 8191 || hBlocks > 8191) return null
    val w = wBlocks * 8
    val h = hBlocks * 8
    val out = new java.io.ByteArrayOutputStream(1024 + wBlocks * hBlocks * 4)
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def be16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }

    marker(0xd8) // SOI
    // APP0 JFIF v1.01, no density, no thumbnail — makes the YCbCr
    // interpretation explicit rather than inferred from component ids
    marker(0xe0); be16(16)
    out.write("JFIF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(0); out.write(1); out.write(1); out.write(0)
    be16(0); be16(0); out.write(0); out.write(0)
    // DQT: one table (id 0) of all-8s; only q[0] matters (AC coeffs are 0),
    // and q00 = 8 is what makes the DC-only IDCT exact (see class doc)
    marker(0xdb); be16(67); out.write(0x00)
    var i = 0
    while (i < 64) { out.write(8); i += 1 }
    // SOF0: baseline sequential, 8-bit, 3 components, all 1×1 (4:4:4)
    marker(0xc0); be16(17); out.write(8); be16(h); be16(w); out.write(3)
    var c = 1
    while (c <= 3) { out.write(c); out.write(0x11); out.write(0x00); c += 1 }
    // DHT: Annex K luminance DC (class 0, id 0) + AC (class 1, id 0)
    marker(0xc4); be16(2 + 1 + 16 + DcVals.length); out.write(0x00)
    DcBits.foreach(out.write); DcVals.foreach(out.write)
    marker(0xc4); be16(2 + 1 + 16 + AcVals.length); out.write(0x10)
    AcBits.foreach(out.write); AcVals.foreach(out.write)
    // SOS: all three components on tables (0, 0)
    marker(0xda); be16(12); out.write(3)
    c = 1
    while (c <= 3) { out.write(c); out.write(0x00); c += 1 }
    out.write(0); out.write(63); out.write(0)

    // entropy-coded scan: MCU = (Y, Cb, Cr) blocks, MCUs row-major;
    // Y carries the per-block DC, chroma stays at zero (flat 128)
    val bw = new BitWriter(out)
    def putDc(diff: Int): Unit = {
      var t = 0
      var m = math.abs(diff)
      while (m != 0) { t += 1; m >>= 1 }
      val (code, len) = DcCodes(t)
      bw.put(code, len)
      if (t > 0) {
        val v = if (diff >= 0) diff else diff + (1 << t) - 1
        bw.put(v, t)
      }
    }
    var prevY = 0
    var k = 0L
    val nBlocks = wBlocks.toLong * hBlocks
    while (k < nBlocks) {
      val d = blockGray(id, k) - 128 // quantized DC; dequant d·8 → flat 128+d
      putDc(d - prevY); prevY = d
      bw.put(AcEob._1, AcEob._2) // Y: no AC coefficients
      putDc(0); bw.put(AcEob._1, AcEob._2) // Cb flat 128
      putDc(0); bw.put(AcEob._1, AcEob._2) // Cr flat 128
      k += 1
    }
    bw.finish()
    marker(0xd9) // EOI
    out.toByteArray
  }

  def jpeg(id: Column, wBlocks: Column, hBlocks: Column): Column =
    GraftSqlBridge.column(JpegSynth(GraftSqlBridge.expression(id),
      GraftSqlBridge.expression(wBlocks), GraftSqlBridge.expression(hBlocks)))
}
