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
