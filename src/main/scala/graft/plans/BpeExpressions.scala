package graft.plans

import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Serializable, immutable BPE merge table: `ranks` maps a symbol pair
  * (encoded `left + ' ' + right` — a space can never appear inside a whitespace-split
  * symbol, so the key is unambiguous) to its merge priority (0 = learned first). Shipped to executors
  * once per plan as an expression constant (the same pattern as the
  * decontamination bloom filter): the table is metadata-sized by definition
  * (a vocabulary is 10⁴–10⁵ merges), so it rides the task closure instead of
  * a join — encoding a 100 TB corpus stays a pure one-scan projection.
  */
final class BpeMergeTable(val pairs: Array[String]) extends Serializable {
  @transient lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pairs.length * 2)
    var i = 0
    while (i < pairs.length) { m.put(pairs(i), Integer.valueOf(i)); i += 1 }
    m
  }

  /** Bounded word→subwords memo, owned by THIS table (a JVM may host two
    * models at once — per-table keying keeps them from cross-contaminating)
    * and shared across executor threads (better hit rate than per-thread on
    * a Zipfian corpus). Cleared wholesale at [[BpeEncode.MemoCap]] so an
    * all-distinct pathological corpus cannot grow it unboundedly.
    */
  @transient lazy val memo: java.util.concurrent.ConcurrentHashMap[String, Array[String]] =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
}

/** Byte-pair encode a text column into its subword sequence
  * (`array<string>`): whitespace pre-tokenization (identical to
  * `GraftFunctions.tokens`), each word split to single characters plus the
  * `</w>` end-of-word symbol, then the learned merges applied
  * greedily-by-rank (always fuse the LOWEST-rank adjacent pair present —
  * the GPT-2 encode order) until no learnable pair remains. Null text →
  * null; empty/whitespace-only text → empty array.
  *
  * This is the apply side of [[graft.ops.Bpe]]: training is a driver-side
  * loop over the metadata-sized word-frequency table (one corpus scan);
  * encoding — the part that touches all 100 TB — is this expression, a
  * codegen'd projection with no shuffle, no join, and no per-row driver
  * involvement. A per-table word→subwords memo exploits the Zipfian corpus
  * (the same few thousand words dominate), bounding re-merge work to the
  * distinct-word tail.
  */
case class BpeEncode(child: Expression, table: BpeMergeTable)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bpe_encode"

  override def nullSafeEval(input: Any): Any =
    BpeEncode.encode(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeMergeTable].getName)
    nullSafeCodeGen(ctx, ev, txt =>
      s"${ev.value} = graft.plans.BpeEncode.encode($txt, $tRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {
  val EndOfWord = "</w>"

  private[plans] val MemoCap = 1 << 16

  /** Exactly Java regex `\s` — the split set `GraftFunctions.tokens` uses at
    * TRAIN time. Deliberately NOT `Character.isWhitespace`: that adds Unicode
    * separators (U+2000–U+200A, U+2028/29, U+3000, U+001C–U+001F) which the
    * trainer treats as word-internal characters; splitting on them at encode
    * time would apply the merge table to word shapes it was never trained on.
    */
  @inline private def isSplitWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def encode(text: UTF8String, table: BpeMergeTable): ArrayData = {
    val s = text.toString
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isSplitWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isSplitWs(s.charAt(i))) i += 1
      if (i > start) {
        val pieces = encodeWord(s.substring(start, i), table)
        var k = 0
        while (k < pieces.length) { out += UTF8String.fromString(pieces(k)); k += 1 }
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Greedy lowest-rank merge loop over one word's symbol sequence.
    * O(len²·lookup) worst case per DISTINCT word — amortized away by the
    * memo; words are bounded by the whitespace pre-tokenizer, never
    * document-length.
    */
  def encodeWord(word: String, table: BpeMergeTable): Array[String] = {
    val cache = table.memo
    val hit = cache.get(word)
    if (hit != null) return hit
    var syms = new java.util.ArrayList[String](word.length + 1)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val w = Character.charCount(cp)
      syms.add(word.substring(i, i + w))
      i += w
    }
    syms.add(EndOfWord)
    val ranks = table.ranks
    var done = syms.size() <= 1
    while (!done) {
      var best = -1
      var bestRank = Integer.MAX_VALUE
      var j = 0
      while (j < syms.size() - 1) {
        val r = ranks.get(syms.get(j) + " " + syms.get(j + 1))
        if (r != null && r.intValue() < bestRank) { bestRank = r.intValue(); best = j }
        j += 1
      }
      if (best < 0) done = true
      else {
        // fuse EVERY occurrence of the winning pair left-to-right
        // (non-overlapping), exactly as the trainer counted it
        val merged = new java.util.ArrayList[String](syms.size())
        val l = syms.get(best)
        val rS = syms.get(best + 1)
        var k = 0
        while (k < syms.size()) {
          if (k < syms.size() - 1 && syms.get(k) == l && syms.get(k + 1) == rS) {
            merged.add(l + rS); k += 2
          } else { merged.add(syms.get(k)); k += 1 }
        }
        syms = merged
        done = syms.size() <= 1
      }
    }
    val arr = new Array[String](syms.size())
    syms.toArray(arr)
    if (cache.size() >= MemoCap) cache.clear()
    cache.put(word, arr)
    arr
  }
}
