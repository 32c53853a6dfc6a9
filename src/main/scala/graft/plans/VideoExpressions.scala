package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Deterministic REAL MJPEG-in-AVI synthesis: a spec-complete RIFF AVI
  * container (`RIFF/'AVI '` → `LIST hdrl` with `avih` + `strl`(`strh 'vids'
  * /'MJPG'` + `strf` BITMAPINFOHEADER) → `LIST movi` of one `00dc` chunk
  * per frame) whose frames are [[JpegSynth]] DC-only baseline JPEGs — the
  * container layout is the public MS RIFF/AVI 1.0 structure, the frame
  * codec the ITU T.81 construction whose decode exactness JpegSynth's doc
  * proves. This gives the codec matrix its video PIXEL gate: the
  * [[graft.ops.Multimodal.videoFrames]] walk must parse the real
  * container, hand each frame to the real JDK JPEG decoder, and reproduce
  * values a SQL oracle recomputes arithmetically.
  *
  * Frame formula (the SQL-replayable contract): frame `f` is
  * `JpegSynth.compute(id + 89·f, wb, hb)`, so block `k` of frame `f`
  * decodes to flat gray {{{ g = ((id + 89·f) % 251 + 23·k) % 256 }}}
  * (89 is coprime to 251, so consecutive frames of one payload differ in
  * every block — a parser returning frame `0` twice cannot hash-pass).
  *
  * Null contract: out-of-range geometry/frame counts and frame-synth
  * failures yield null, never a thrown scan failure (the corrupt-blob
  * convention of every decoder this feeds).
  */
case class AviSynth(first: Expression, second: Expression, third: Expression,
    fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[GraftSqlBridge.AbstractType] =
    Seq(LongType, IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_avi_synth"

  override def nullSafeEval(id: Any, wb: Any, hb: Any, nf: Any): Any =
    AviSynth.compute(id.asInstanceOf[Long], wb.asInstanceOf[Int],
      hb.asInstanceOf[Int], nf.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (id, wb, hb, nf) => s"""
      ${ev.value} = graft.plans.AviSynth.compute($id, $wb, $hb, $nf);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

object AviSynth {
  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  private def le16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
  }
  private def le32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
    o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff)
  }
  private def fcc(o: java.io.ByteArrayOutputStream, s: String): Unit =
    o.write(s.getBytes(Ascii))

  /** `<fcc><le32 size><body>[pad]` — RIFF chunks are word-aligned. */
  private def chunk(fcc4: String, body: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream(body.length + 9)
    fcc(o, fcc4); le32(o, body.length); o.write(body, 0, body.length)
    if ((body.length & 1) == 1) o.write(0)
    o.toByteArray
  }
  private def list(listType: String, body: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream(body.length + 13)
    fcc(o, "LIST"); le32(o, body.length + 4); fcc(o, listType)
    o.write(body, 0, body.length)
    o.toByteArray
  }

  def compute(id: Long, wBlocks: Int, hBlocks: Int, nFrames: Int): Array[Byte] = {
    if (nFrames <= 0 || nFrames > 64) return null
    val frames = new Array[Array[Byte]](nFrames)
    var f = 0
    var maxFrame = 0
    while (f < nFrames) {
      val j = JpegSynth.compute(id + 89L * f, wBlocks, hBlocks)
      if (j == null) return null
      frames(f) = j
      if (j.length > maxFrame) maxFrame = j.length
      f += 1
    }
    val w = wBlocks * 8
    val h = hBlocks * 8

    // avih: MainAVIHeader (56 bytes)
    val avih = {
      val o = new java.io.ByteArrayOutputStream(56)
      le32(o, 40000) // dwMicroSecPerFrame: 25 fps
      le32(o, 0); le32(o, 0); le32(o, 0) // maxBytesPerSec, padding, flags
      le32(o, nFrames); le32(o, 0) // totalFrames, initialFrames
      le32(o, 1) // one stream
      le32(o, maxFrame) // suggestedBufferSize
      le32(o, w); le32(o, h)
      le32(o, 0); le32(o, 0); le32(o, 0); le32(o, 0) // reserved
      o.toByteArray
    }
    // strh: AVIStreamHeader (56 bytes), 'vids'/'MJPG'
    val strh = {
      val o = new java.io.ByteArrayOutputStream(56)
      fcc(o, "vids"); fcc(o, "MJPG")
      le32(o, 0) // flags
      le16(o, 0); le16(o, 0) // priority, language
      le32(o, 0) // initialFrames
      le32(o, 1); le32(o, 25) // scale, rate: 25 fps
      le32(o, 0); le32(o, nFrames) // start, length
      le32(o, maxFrame) // suggestedBufferSize
      le32(o, -1); le32(o, 0) // quality (default), sampleSize (varies)
      le16(o, 0); le16(o, 0); le16(o, w); le16(o, h) // rcFrame
      o.toByteArray
    }
    // strf: BITMAPINFOHEADER (40 bytes), biCompression = 'MJPG'
    val strf = {
      val o = new java.io.ByteArrayOutputStream(40)
      le32(o, 40); le32(o, w); le32(o, h)
      le16(o, 1); le16(o, 24) // planes, bitCount
      fcc(o, "MJPG")
      le32(o, w * h * 3) // biSizeImage (uncompressed bound)
      le32(o, 0); le32(o, 0); le32(o, 0); le32(o, 0)
      o.toByteArray
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = {
      val o = new java.io.ByteArrayOutputStream(
        frames.iterator.map(_.length + 9).sum)
      frames.foreach { fr => val c = chunk("00dc", fr); o.write(c, 0, c.length) }
      list("movi", o.toByteArray)
    }
    val out = new java.io.ByteArrayOutputStream(hdrl.length + movi.length + 12)
    fcc(out, "RIFF"); le32(out, 4 + hdrl.length + movi.length); fcc(out, "AVI ")
    out.write(hdrl, 0, hdrl.length)
    out.write(movi, 0, movi.length)
    out.toByteArray
  }

  def avi(id: Column, wBlocks: Column, hBlocks: Column, nFrames: Column): Column =
    GraftSqlBridge.column(AviSynth(GraftSqlBridge.expression(id),
      GraftSqlBridge.expression(wBlocks), GraftSqlBridge.expression(hBlocks),
      GraftSqlBridge.expression(nFrames)))
}
