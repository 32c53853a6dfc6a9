package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Deterministic REAL-WAV synthesis: a spec-complete RIFF/WAVE container
  * (RIFF header, `fmt ` chunk, `data` chunk) carrying mono 16-bit signed
  * little-endian PCM whose samples are a fixed arithmetic function of
  * `(id, i)` — the fixture generator for the REAL `javax.sound.sampled`
  * decoder behind [[graft.ops.Multimodal.decodeAudio]], the audio analog of
  * [[PngSynth]]/[[GifSynth]]. Any disagreement between this writer, the
  * JDK's WAVE file reader, and the documented sample formula breaks the
  * gate hash.
  *
  * Sample formula (the SQL-replayable contract, sample index `i`,
  * `b = id mod 251`):
  * {{{ v16 = (b + 37*i) mod 65536  // the unsigned 16-bit PCM bit pattern
  *     signed = v16 < 32768 ? v16 : v16 - 65536 }}}
  * `v16` sweeps the full 16-bit range (37 is odd, so the orbit has period
  * 65536/gcd(37,65536) = 65536), exercising sign handling on both ends.
  */
case class WavSynth(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[GraftSqlBridge.AbstractType] =
    Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  // always nullable: out-of-range (n, rate) yields null, matching the
  // corrupt-blob contract of the decoders this expression feeds — an
  // adversarial row must produce a null payload, never kill the scan
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_wav_synth"

  override def nullSafeEval(id: Any, n: Any, rate: Any): Any =
    WavSynth.compute(id.asInstanceOf[Long], n.asInstanceOf[Int],
      rate.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (id, n, rate) => s"""
      ${ev.value} = graft.plans.WavSynth.compute($id, $n, $rate);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object WavSynth {
  /** The sample generator (unsigned 16-bit bit pattern) — shared by
    * [[compute]] and (arithmetically) by the oracle SQL.
    */
  @inline def sample(id: Long, i: Long): Int =
    ((id % 251 + 37L * i) % 65536L).toInt

  /** Null (not an exception) for out-of-range arguments — the expression's
    * nullable contract; fixture generators feed decoders whose corrupt-blob
    * contract is null-row, and a thrown require would kill the whole scan.
    */
  def compute(id: Long, nSamples: Int, rate: Int): Array[Byte] = {
    if (nSamples <= 0 || nSamples > (1 << 22) || rate <= 0) return null
    val dataLen = nSamples * 2
    val out = new Array[Byte](44 + dataLen)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.put("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(16)            // fmt chunk length
    bb.putShort(1)           // audio format: PCM
    bb.putShort(1)           // channels: mono
    bb.putInt(rate)          // sample rate
    bb.putInt(rate * 2)      // byte rate
    bb.putShort(2)           // block align
    bb.putShort(16)          // bits per sample
    bb.put("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      bb.putShort(sample(id, i).toShort) // LE, bit pattern = unsigned v16
      i += 1
    }
    out
  }

  def wav(id: Column, nSamples: Column, rate: Column): Column =
    GraftSqlBridge.column(WavSynth(GraftSqlBridge.expression(id),
      GraftSqlBridge.expression(nSamples), GraftSqlBridge.expression(rate)))
}

/** Deterministic REAL-AU synthesis: a spec-complete Sun/NeXT `.snd`
  * container (big-endian: magic, data offset, data size, encoding 1 =
  * 8-bit G.711 μ-law, sample rate, channels) carrying mono μ-law bytes
  * that are a fixed arithmetic function of `(id, i)` — the fixture for the
  * non-PCM leg of [[graft.ops.Multimodal.decodeAudio]] (the JDK's AU
  * reader parses the container and reports ULAW/8-bit; the G.711
  * expansion to 16-bit linear is exact integer arithmetic a SQL oracle
  * replays).
  *
  * Byte formula (the SQL-replayable contract, `b = id mod 251`):
  * {{{ u_i = (b + 11·i) mod 256 }}}
  * — period 256 in i (11 is odd), so every μ-law code point, both signs
  * and all 8 segments, is exercised.
  */
case class AuSynth(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[GraftSqlBridge.AbstractType] =
    Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  // nullable: out-of-range (n, rate) yields null — the corrupt-blob
  // contract of the decoder this feeds
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_au_synth"

  override def nullSafeEval(id: Any, n: Any, rate: Any): Any =
    AuSynth.compute(id.asInstanceOf[Long], n.asInstanceOf[Int],
      rate.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (id, n, rate) => s"""
      ${ev.value} = graft.plans.AuSynth.compute($id, $n, $rate);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** Deterministic REAL-IMA-ADPCM WAV synthesis: a spec-complete RIFF/WAVE
  * container with `fmt ` tag 0x11 (IMA/DVI ADPCM, mono, 4-bit), the
  * required `fact` chunk (total sample frames — compressed WAV needs it),
  * and fixed-size data blocks — the fixture for the engine's own IMA
  * predictor decode (the JDK's `javax.sound.sampled` has no ADPCM codec,
  * so [[graft.ops.Multimodal.decodeAudio]] implements the public IMA
  * integer arithmetic directly).
  *
  * Layout contract (the SQL-replayable spec):
  *  - `blockAlign` = 12 bytes ⇒ `samplesPerBlock` = (12−4)·2+1 = 17: the
  *    4-byte block header (initial predictor int16 LE = 0, step index = 0,
  *    reserved = 0) IS sample 0 of the block; the 8 data bytes carry 16
  *    nibbles, LOW nibble first.
  *  - nibble g (GLOBAL index, g = blk·16 + within-block position):
  *    {{{ nib_g = (id mod 251 + 7·g) mod 16 }}}
  *    period 16 in g, so every 4-bit code (both signs, all magnitude bits)
  *    is exercised in every block.
  *  - every block resets predictor/index to 0 (valid per spec — the header
  *    re-seeds the decoder), which is what makes the oracle's per-block
  *    recursive replay independent and 17 levels deep, not clip-deep.
  *  - the final block is written FULL; `fact` limits decode to n samples.
  */
case class AdpcmSynth(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[GraftSqlBridge.AbstractType] =
    Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  // nullable: out-of-range (n, rate) yields null — the corrupt-blob
  // contract of the decoder this feeds
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_adpcm_synth"

  override def nullSafeEval(id: Any, n: Any, rate: Any): Any =
    AdpcmSynth.compute(id.asInstanceOf[Long], n.asInstanceOf[Int],
      rate.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (id, n, rate) => s"""
      ${ev.value} = graft.plans.AdpcmSynth.compute($id, $n, $rate);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object AdpcmSynth {
  val BlockAlign = 12
  val SamplesPerBlock: Int = (BlockAlign - 4) * 2 + 1 // 17

  /** The nibble generator (global nibble index) — shared by [[compute]]
    * and (arithmetically) by the oracle SQL.
    */
  @inline def nibble(id: Long, g: Long): Int =
    ((id % 251 + 7L * g) % 16L).toInt

  def compute(id: Long, nSamples: Int, rate: Int): Array[Byte] = {
    if (nSamples <= 0 || nSamples > (1 << 22) || rate <= 0) return null
    val blocks = (nSamples + SamplesPerBlock - 1) / SamplesPerBlock
    val dataLen = blocks * BlockAlign
    val out = new Array[Byte](12 + 28 + 12 + 8 + dataLen)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    bb.put("RIFF".getBytes(ascii))
    bb.putInt(out.length - 8)
    bb.put("WAVE".getBytes(ascii))
    bb.put("fmt ".getBytes(ascii))
    bb.putInt(20)                  // fmt chunk length (16 + cbSize ext)
    bb.putShort(0x11)              // audio format: IMA/DVI ADPCM
    bb.putShort(1)                 // channels: mono
    bb.putInt(rate)
    // byte rate for ADPCM: rate * blockAlign / samplesPerBlock (integer)
    bb.putInt((rate.toLong * BlockAlign / SamplesPerBlock).toInt)
    bb.putShort(BlockAlign.toShort)
    bb.putShort(4)                 // bits per (encoded) sample
    bb.putShort(2)                 // cbSize
    bb.putShort(SamplesPerBlock.toShort)
    bb.put("fact".getBytes(ascii))
    bb.putInt(4)
    bb.putInt(nSamples)
    bb.put("data".getBytes(ascii))
    bb.putInt(dataLen)
    var blk = 0
    while (blk < blocks) {
      bb.putShort(0) // initial predictor
      bb.put(0.toByte) // initial step index
      bb.put(0.toByte) // reserved
      var m = 0
      while (m < BlockAlign - 4) {
        val g = blk.toLong * 16 + 2 * m
        bb.put((nibble(id, g) | (nibble(id, g + 1) << 4)).toByte)
        m += 1
      }
      blk += 1
    }
    out
  }

  def adpcm(id: Column, nSamples: Column, rate: Column): Column =
    GraftSqlBridge.column(AdpcmSynth(GraftSqlBridge.expression(id),
      GraftSqlBridge.expression(nSamples), GraftSqlBridge.expression(rate)))
}

object AuSynth {
  /** The μ-law byte generator — shared by [[compute]] and (arithmetically)
    * by the oracle SQL.
    */
  @inline def ulawByte(id: Long, i: Long): Int =
    ((id % 251 + 11L * i) % 256L).toInt

  def compute(id: Long, nSamples: Int, rate: Int): Array[Byte] = {
    if (nSamples <= 0 || nSamples > (1 << 22) || rate <= 0) return null
    val out = new Array[Byte](24 + nSamples)
    val bb = java.nio.ByteBuffer.wrap(out) // AU is big-endian
    bb.put(".snd".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(24)       // data offset
    bb.putInt(nSamples) // data size in bytes (1 byte per μ-law sample)
    bb.putInt(1)        // encoding: 8-bit G.711 μ-law
    bb.putInt(rate)
    bb.putInt(1)        // channels: mono
    var i = 0
    while (i < nSamples) {
      bb.put(ulawByte(id, i).toByte)
      i += 1
    }
    out
  }

  def au(id: Column, nSamples: Column, rate: Column): Column =
    GraftSqlBridge.column(AuSynth(GraftSqlBridge.expression(id),
      GraftSqlBridge.expression(nSamples), GraftSqlBridge.expression(rate)))
}
