package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.tokens
import graft.plans.{BpeEncode, BpeMergeTable}

/** Byte-pair-encoding tokenizer training and application — the vocabulary
  * side of a training-data pipeline (Sennrich et al. 2016; the GPT-2 merge
  * discipline for encoding).
  *
  * Scale shape — the part that makes BPE feasible on a 100 TB corpus is
  * that the merge loop NEVER touches the corpus:
  *
  *  1. ONE distributed scan aggregates the corpus to its word-frequency
  *     table ([[wordFrequencies]]) — map-side-combined `groupBy(word)`,
  *     optionally capped to the top-`maxWords` words by a deterministic
  *     tournament (`TakeOrdered`, no global sort). Every production BPE
  *     trainer (subword-nmt, fastBPE, SentencePiece, HF tokenizers) runs
  *     its merge loop over exactly this dictionary: truncating the
  *     billion-word tail changes pair counts negligibly (Zipf) and is the
  *     standard practice, loudly parameterized here.
  *  2. The merge loop ([[train]]) runs driver-side over that
  *     metadata-sized dictionary with incrementally-maintained pair counts
  *     and a pair→words inverted index — O(merges · touched-words), not
  *     O(merges · vocabulary).
  *  3. Encoding ([[encode]]) is a codegen'd per-row expression closing
  *     over the learned merge table as a plan constant — a pure one-scan
  *     projection over the corpus with no shuffle and no join
  *     ([[graft.plans.BpeEncode]]).
  *
  * Determinism: pair-count ties break on the lexicographically smallest
  * (left, right) pair; the word-frequency cap breaks count ties on the
  * lexicographically smallest word. Training twice on the same corpus
  * yields byte-identical merge tables (spec-locked).
  */
object Bpe {

  /** End-of-word marker appended to every word's symbol sequence before
    * merging — what lets a learned subword distinguish "low " from the
    * prefix "low…" (Sennrich et al. 2016 §3.2).
    */
  val EndOfWord: String = BpeEncode.EndOfWord

  /** One learned merge: fuse adjacent symbols (`left`,`right`) at priority
    * `rank` (0 = learned first).
    */
  final case class Merge(rank: Int, left: String, right: String)

  // -------------------------------------------------------------------
  // Corpus statistics (the only distributed part of training)
  // -------------------------------------------------------------------

  /** Word-frequency dictionary of `textCol`: one row per distinct
    * whitespace-token, capped to the `maxWords` most frequent (ties to the
    * lexicographically smallest word, so the cap is deterministic).
    * `maxWords <= 0` disables the cap. One corpus scan; map-side combine;
    * the cap compiles to `TakeOrderedAndProject`, never a global sort.
    */
  def wordFrequencies(docs: DataFrame, textCol: String,
      maxWords: Int = 1 << 20): DataFrame = {
    val freqs = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    if (maxWords > 0) freqs.orderBy(col("freq").desc, col("word").asc)
      .limit(maxWords)
    else freqs
  }

  /** Adjacent-symbol pair counts over a word-frequency dictionary, for the
    * INITIAL (pre-merge) symbolization: each word split to codepoints plus
    * [[EndOfWord]], each adjacent pair weighted by the word's frequency.
    * This is the statistic the trainer's first step maximizes — exposed as
    * a DataFrame so the oracle gate can verify the trainer's core update
    * rule against an independent SQL replay. Distributed, but normally run
    * on the already-metadata-sized dictionary.
    */
  def pairCounts(wordFreqs: DataFrame): DataFrame = {
    // split to codepoints: split-by-empty-string yields single chars
    // (surrogate pairs split too, but identically in trainer and oracle —
    // the testdata corpus is ASCII; documented limitation of the SQL gate)
    // array_remove guards the trailing "" some split implementations emit
    val syms = concat(array_remove(split(col("word"), ""), ""),
      array(lit(EndOfWord)))
    wordFreqs
      .select(col("freq"), syms.as("syms"))
      .select(col("freq"), col("syms"),
        posexplode(col("syms")).as(Seq("i", "left")))
      .withColumn("right", try_element_at(col("syms"), col("i") + 2))
      .where(col("right").isNotNull)
      .groupBy("left", "right").agg(sum("freq").as("pair_freq"))
  }

  // -------------------------------------------------------------------
  // Driver-side merge loop
  // -------------------------------------------------------------------

  /** Learn `numMerges` merges from a word-frequency dictionary. Stops early
    * when the best remaining pair's count falls below `minFrequency`.
    * Incremental pair-count maintenance: merging pair p inside word w only
    * touches w's neighbors of p, and only words containing p are visited
    * (via the pair→word inverted index).
    */
  def train(wordFreqs: Seq[(String, Long)], numMerges: Int,
      minFrequency: Long = 2L): Seq[Merge] = {
    import scala.collection.mutable
    // per-word symbol sequences and frequencies
    val words = wordFreqs.map { case (w, f) =>
      val syms = mutable.ArrayBuffer[String]()
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val n = Character.charCount(cp)
        syms += w.substring(i, i + n)
        i += n
      }
      syms += EndOfWord
      (syms, f)
    }.toArray

    val pairCount = mutable.HashMap[(String, String), Long]()
    val pairWords = mutable.HashMap[(String, String), mutable.HashSet[Int]]()

    def addPairs(wi: Int, sign: Long): Unit = {
      val (syms, f) = words(wi)
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        val c = pairCount.getOrElse(p, 0L) + sign * f
        if (c == 0L) pairCount.remove(p) else pairCount(p) = c
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.HashSet()) += wi
        j += 1
      }
    }
    words.indices.foreach(addPairs(_, 1L))

    val merges = mutable.ArrayBuffer[Merge]()
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      if (pairCount.isEmpty) exhausted = true
      else {
        // deterministic argmax: max count, ties to smallest (left, right)
        val (best, bestCount) = pairCount.foldLeft(
            (("", ""), Long.MinValue)) { case (acc @ (bp, bc), (p, c)) =>
          if (c > bc || (c == bc && (p._1 < bp._1 ||
            (p._1 == bp._1 && p._2 < bp._2)))) (p, c) else acc
        }
        if (bestCount < minFrequency) exhausted = true
        else {
          merges += Merge(rank, best._1, best._2)
          val fused = best._1 + best._2
          val touched = pairWords.getOrElse(best, mutable.HashSet()).toArray
          pairWords.remove(best)
          touched.foreach { wi =>
            val (syms, _) = words(wi)
            // retract this word's pair contributions, rewrite, re-add —
            // simpler than neighbor surgery and still O(word length)
            addPairs(wi, -1L)
            val out = mutable.ArrayBuffer[String]()
            var k = 0
            while (k < syms.length) {
              if (k < syms.length - 1 && syms(k) == best._1 &&
                  syms(k + 1) == best._2) { out += fused; k += 2 }
              else { out += syms(k); k += 1 }
            }
            syms.clear(); syms ++= out
            addPairs(wi, 1L)
          }
          rank += 1
        }
      }
    }
    merges.toSeq
  }

  /** Train from a corpus: ONE distributed scan to the (capped) dictionary,
    * then the driver loop. The dictionary collect is bounded by `maxWords`
    * (required positive here — this entry point must never blind-collect).
    */
  def trainFromCorpus(docs: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 1 << 20, minFrequency: Long = 2L): Seq[Merge] = {
    require(maxWords > 0,
      s"trainFromCorpus: maxWords must bound the driver collect (got $maxWords)")
    val dict = wordFrequencies(docs, textCol, maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    train(dict.toSeq, numMerges, minFrequency)
  }

  // -------------------------------------------------------------------
  // Model persistence (parquet-round-trippable merge table)
  // -------------------------------------------------------------------

  def mergesToDF(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
  }

  /** Read a merge table back; the frame is vocabulary-sized by definition,
    * and ordering is restored from the persisted rank.
    */
  def mergesFromDF(df: DataFrame): Seq[Merge] =
    df.select("rank", "left", "right").collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_.rank).toSeq

  // -------------------------------------------------------------------
  // Encoding (the 100 TB side)
  // -------------------------------------------------------------------

  private def toTable(merges: Seq[Merge]): BpeMergeTable =
    new BpeMergeTable(
      merges.sortBy(_.rank).map(m => m.left + " " + m.right).toArray)

  /** Subword sequence of `text` under the learned merges
    * (`array<string>`; `</w>` marks word ends inside fused symbols).
    */
  def encode(text: Column, merges: Seq[Merge]): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      BpeEncode(org.apache.spark.sql.GraftSqlBridge.expression(text),
        toTable(merges)))

  /** Integer token ids: the vocabulary is every surviving subword, ranked
    * deterministically (see [[vocabulary]]); unknown subwords (impossible
    * when encoding with the same merges, possible across model versions)
    * map to `unkId`.
    */
  def vocabulary(spark: SparkSession, merges: Seq[Merge],
      baseSymbols: Seq[String]): DataFrame = {
    import spark.implicits._
    // base symbols first (sorted), then merge outputs in rank order — the
    // convention every BPE vocab file uses. A merge cannot re-create a base
    // symbol (merges always lengthen), but two DISTINCT merges can fuse to
    // the same string (a+bc and ab+c both yield abc), so keep only the first
    // (lowest-rank) occurrence — the mapping must be token→id unambiguous
    val base = (baseSymbols.toSet + EndOfWord).toSeq.sorted
    val all = (base ++ merges.sortBy(_.rank).map(m => m.left + m.right)).distinct
    all.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("token_id", "token")
  }
}
