package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language identification, document fingerprinting. All
  * pure column expressions (no UDFs) — a single scan over the corpus computes
  * every signal, and Catalyst prunes the scan to the text column only.
  */
object TextAnalysis {

  /** Whitespace token count (empty text → 0). */
  /** Whitespace-token count — native byte-scan expression, exact parity
    * with `size(tokens(text))` (graft.plans.TokenCount) without the regex
    * split: the split's backtracking cost was text_tokens' whole
    * data-proportional gap vs DuckDB's linear RE2 (9.2× at k=16).
    */
  def tokenCount(text: Column): Column =
    graft.plans.VectorExpressions.tokenCount(text)

  /** BPE-ish subword count: alphanumeric runs and single non-space symbols
    * each count as one token — a cheap, deterministic proxy for a real
    * byte-pair tokenizer's length. Native single-pass expression
    * (graft.plans.SubwordCount), parity with the old
    * `size(regexp_extract_all(text, "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"))`.
    */
  def subwordCount(text: Column): Column =
    graft.plans.VectorExpressions.subwordCount(text)

  /** The quality-signal columns for a text column, aliased — shared by the
    * id-projected [[qualitySignals]] and the column-appending stage form.
    */
  def qualityExprs(t: Column, stopwords: Seq[String] = DefaultStopwords): Seq[Column] = {
    // one native byte scan for all eight signals (graft.plans
    // .QualitySignals — the old per-signal regex/HOF chains, whose
    // semantics it preserves exactly per QualityParitySpec, re-scanned
    // the text per signal wherever projection CSE could not reach). The
    // coalesces preserve the historical null-text contract: every field
    // null except the two `otherwise(0.0)` ratios.
    val sig = graft.plans.QualitySignals.signals(t, stopwords)
    Seq(
      sig.getField("n_chars").as("n_chars"),
      sig.getField("n_words").as("n_words"),
      sig.getField("mean_word_len").as("mean_word_len"),
      sig.getField("punct_ratio").as("punct_ratio"),
      sig.getField("alpha_ratio").as("alpha_ratio"),
      sig.getField("digit_ratio").as("digit_ratio"),
      coalesce(sig.getField("stopword_ratio"), lit(0.0)).as("stopword_ratio"),
      coalesce(sig.getField("repetition_ratio"), lit(0.0)).as("repetition_ratio"))
  }

  /** Quality signals: lengths, word stats, punctuation/alpha/digit/space
    * ratios, stopword fraction — the usual pre-training heuristics.
    */
  def qualitySignals(docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String] = DefaultStopwords): DataFrame =
    docs.select((col(idCol) +: qualityExprs(col(textCol), stopwords)): _*)

  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as")

  /** Language-ID marker words: tiny per-language stopword lists; the language
    * with the highest marker hit-count wins (ties → lexicographic first).
    * An n-gram/stopword heuristic in the fastText tradition, kept
    * deterministic and expression-only.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ein"),
    "en" -> Seq("the", "and", "of", "to", "is", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une"))

  /** Executed by the native [[graft.plans.MarkerCounts]] single byte scan
    * over `lower(text)` (all languages in one pass; codegen CSE shares it
    * across the score columns). The old per-language
    * `size(regexp_extract_all(lower(text), "\\b(w1|…)\\b"))` form — whose
    * semantics this preserves exactly, see MarkerCounts' scaladoc and the
    * LangIdParitySpec net — measured 2.8× DuckDB's marginal at 320k docs
    * on java.util.regex alternation constants alone.
    */
  def langScores(text: Column): Seq[(String, Column)] = {
    val counts = graft.plans.MarkerCounts.counts(lower(text), LangMarkers.map(_._2))
    LangMarkers.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(counts, i + 1)
    }
  }

  /** The language-ID columns (per-language scores + prediction), aliased —
    * shared by the id-projected [[languageId]] and the column-appending stage
    * form.
    */
  def langIdExprs(t: Column): Seq[Column] = {
    val scores = langScores(t)
    val best = scores.map(_._2).reduce(greatest(_, _))
    // ties → lexicographically-first language wins (LangMarkers is sorted)
    val predFirst = scores.foldRight(lit("unknown")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    scores.map { case (l, s) => s.as(s"score_$l") } :+ predFirst.as("lang_pred")
  }

  /** Predicted language + per-language scores. `unknown` when no marker hits. */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select((col(idCol) +: langIdExprs(col(textCol))): _*)

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1-A1.2 family):
    * line- and n-gram-level duplication fractions plus the ellipsis/bullet
    * line heuristics — the document-internal repetition filters a crawl
    * pipeline applies before any cross-document dedup. One native byte
    * scan; blank/short documents score 0 on every signal (no nulls —
    * these feed threshold filters directly).
    *
    *  - dup_line_fraction:       1 − distinct / total over nonblank lines
    *  - dup_line_char_fraction:  1 − chars-in-distinct-lines / line chars
    *  - dup_ngram_fraction:      1 − distinct / total over word `n`-grams
    *    (counted via the 56-bit shingle hash — collision-free at any real
    *    document length)
    *  - ellipsis_line_fraction:  lines ending in `...` or `…`
    *  - bullet_line_fraction:    lines starting with `-`, `*`, or `•`
    */

  /** The five signals, each a field of ONE native byte-scan struct
    * ([[graft.plans.RepetitionSignals]] — no intermediate arrays, no
    * interpreted higher-order functions; whole-stage codegen's
    * subexpression elimination evaluates the shared struct once per row
    * even though five columns reference it). The zero-coalesce preserves
    * the historical contract: a NULL text scores 0.0 on every signal,
    * like an empty one. Semantics (lines, trims, distinct rules, n-gram
    * joining) are pinned against the original staged-HOF recipe by
    * RepetitionParitySpec's randomized net.
    */
  def repetitionExprs(t: Column, n: Int = 3): Seq[Column] = {
    val sig = graft.plans.VectorExpressions.repetitionSignals(t, n)
    graft.plans.RepetitionSignals.fields.map(f =>
      coalesce(sig.getField(f), lit(0.0)).as(f))
  }

  /** Append the five repetition signals. */
  def withRepetitionSignals(docs: DataFrame, textCol: String,
      n: Int = 3): DataFrame = {
    val outs = graft.plans.RepetitionSignals.fields
    val clash = outs.intersect(docs.columns.toSeq)
    require(clash.isEmpty,
      s"withRepetitionSignals: column(s) ${clash.mkString(", ")} already exist")
    docs.select(col("*") +: repetitionExprs(col(textCol), n): _*)
  }

  /** Repetition signals projected onto the id column. */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame =
    withRepetitionSignals(docs.select(col(idCol), col(textCol)), textCol, n)
      .drop(textCol)

  /** Normalized-content fingerprint (lowercase, collapse whitespace, md5). */
  /** Per-document top-k TF-IDF terms — the corpus-statistics curation op
    * (keyword extraction, domain-mix diagnostics, topic balancing). Emits
    * (id, term, tf, score, rank) with rank 1..k per doc ordered by score
    * descending, term ascending.
    *
    * Formula: sklearn's smoothed idf — score = tf * (ln((1+N)/(1+df)) + 1),
    * N = documents with at least one token. Ranking uses the 4-dp-rounded
    * score (with the term tiebreak) so the order is engine-reproducible:
    * ln() differs between libm implementations by 1 ulp on ~0.02% of
    * inputs, and ranking on raw doubles would let that ulp flip an order.
    *
    * Scale shape: the corpus is scanned and tokenized ONCE — tf is one
    * partial-agg'd shuffle of (id, term) pairs, and BOTH df and N are
    * derived from tf (df = terms per group key, N = distinct ids), so
    * AQE's ReuseExchange serves all three consumers from tf's single
    * exchange instead of re-reading and re-splitting the text per branch;
    * the idf join is a SHUFFLED HASH join (hinted): df's per-partition
    * build side is vocabulary-sized — small — while sort-merge would sort
    * the big (id, term) side by term for nothing; per-doc top-k is a
    * row_number window over (score desc, term), a pure Tungsten radix sort
    * whose per-key group is one document's vocabulary (bounded by document
    * length, never corpus-sized). The previous k-bounded priority-queue
    * aggregate (collectTopK) was measured 3.4× slower at 64× scale:
    * TypedImperativeAggregate pushes ObjectHashAggregate into its
    * 128-distinct-key sort-based fallback on per-doc group keys, paying
    * per-row state serde on top of the same sort the window does once.
    */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // N = docs with >= 1 token: explode already dropped tokenless docs, so
    // counting tf's distinct ids equals the old filter(size(tokens)>0)
    // count — including a null-id group, which countDistinct would drop.
    //
    // The `tf > 0` filter is a semantic no-op (counts are >= 1) whose one
    // job is to REFERENCE the count column from the derived branches:
    // without it, column pruning strips the count aggregate from the df/N
    // subtrees, their canonical form diverges from the join branch's tf,
    // and ReuseExchange cannot fire — the corpus then gets re-scanned and
    // re-tokenized once per branch, tripling the dominant stage at scale.
    // With it, all three consumers share tf's single shuffle.
    val tfUsed = tf.where(col("tf") > 0)
    val n = tfUsed.groupBy(col(idCol)).agg(count(lit(1)).as("__k"))
      .agg(count(lit(1)).as("__n"))
    val df = tfUsed.groupBy("term").agg(count(lit(1)).as("__df"))
    val scored = tf.join(df.hint("shuffle_hash"), Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * (log((lit(1.0) + col("__n")) / (col("__df") + lit(1.0)))
          + lit(1.0)), 4))
    // rank on the ROUNDED score with the term tiebreak (doc-unique terms →
    // total order → engine-reproducible), exactly the oracle's QUALIFY shape
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("score"), col("rank"))
  }

  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Per-group corpus statistics — the dataset-card / mix-diagnostics table
    * (doc counts, token and char totals, token distribution) a curation
    * pipeline reports per source/language slice. Median is the NEAREST-RANK
    * order statistic, computed from the per-group TOKEN-COUNT HISTOGRAM:
    * the corpus aggregates map-side into (group, n_tokens) rows first, so a
    * group with a billion documents shuffles only its distinct token-count
    * values (bounded by the longest document, not the corpus), and the
    * cumulative-rank window runs over that small histogram — never a
    * per-group sort of full rows, the single-task trap the stratified-cap
    * rewrite removed. One map-side-combined shuffle; the windowed second
    * pass is histogram-sized.
    */
  def corpusStats(docs: DataFrame, textCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "corpusStats needs at least one group column")
    val g = groupCols.map(col)
    val hist = docs.select(g ++ Seq(
      length(col(textCol)).cast("long").as("__chars"),
      tokenCount(col(textCol)).cast("long").as("__toks")): _*)
      .groupBy((g :+ col("__toks")): _*)
      .agg(count(lit(1)).as("__cnt"), sum("__chars").as("__chars_sum"))
    val cum = hist
      .withColumn("__cum", sum("__cnt").over(
        Window.partitionBy(g: _*).orderBy(col("__toks"))))
      .withColumn("__n", sum("__cnt").over(Window.partitionBy(g: _*)))
    // nearest-rank target, identical to the MEDS quantile arithmetic; the
    // median is the first histogram value whose cumulative count reaches it
    val target = floor(lit(0.5) * (col("__n") - 1) + 0.5) + 1
    cum.groupBy(g: _*).agg(
      sum("__cnt").as("n_docs"),
      sum("__chars_sum").as("total_chars"),
      sum(col("__toks") * col("__cnt")).as("total_tokens"),
      round(sum(col("__toks") * col("__cnt")).cast("double") / sum("__cnt"), 4)
        .as("mean_tokens"),
      min("__toks").as("min_tokens"),
      max("__toks").as("max_tokens"),
      min(when(col("__cum") >= target, col("__toks"))).as("median_tokens"))
  }

  /** C4-style page cleanup (Raffel et al. 2020 §2.2, the heuristics behind
    * the C4 corpus): line level, keep only lines that end in a terminal
    * punctuation mark, carry at least `minLineWords` words, and do not
    * mention "javascript"; page level, drop documents whose surviving text
    * has fewer than `minLines` lines or whose ORIGINAL text contains any of
    * `dropPhrases` (C4 drops pages with "lorem ipsum" or a curly brace).
    * Surviving documents get `textCol` REPLACED by the retained lines.
    *
    * The line logic is ONE native byte scan ([[graft.plans.C4Lines]] —
    * the per-line rlike + tokenizing-split + lowercase-contains chain was
    * re-inlined into both the filter and the replacement projection by
    * predicate pushdown, 8.0× DuckDB at 320k docs; C4ParitySpec pins the
    * scan against that recipe). The filter evaluates the scan once via
    * [[graft.plans.SignalBounds]], the replacement projection once more;
    * the phrase rules stay builtin `contains(lower(...))` probes (custom
    * phrases may be non-ASCII — full lower() semantics preserved).
    * Nothing shuffles, and Catalyst prunes the scan to the referenced
    * columns.
    */
  def c4Filters(docs: DataFrame, idCol: String, textCol: String,
      minLineWords: Int = 5, minLines: Int = 3,
      dropPhrases: Seq[String] = Seq("lorem ipsum", "{")): DataFrame = {
    require(minLineWords >= 0 && minLines >= 0, "thresholds must be >= 0")
    val c4 = graft.plans.C4Lines.lines(col(textCol), minLineWords)
    // one allocation-free probe for all phrases (graft.plans.PhraseHit)
    // instead of a lowered text copy per phrase
    val phraseHit =
      if (dropPhrases.isEmpty) lit(false)
      else graft.plans.PhraseHit.hitCol(col(textCol), dropPhrases)
    docs
      .filter(graft.plans.SignalBounds.bounds(c4,
        Seq((0, Some(minLines.toDouble), None, false))) && !phraseHit)
      .withColumn(textCol, c4.getField("kept_text"))
  }

  /** Unigram word entropy in bits — the cheap perplexity proxy quality
    * filters use to catch gibberish (entropy near log2(n): every token
    * distinct, no language structure) and degenerate repetition (entropy
    * near 0: one token repeated). H = log2(n) − (Σ c·log2 c)/n over the
    * per-token counts c; 0.0 for empty/whitespace-only text.
    *
    * Computed in ONE pass over the row's sorted token array: sort groups
    * equal tokens into runs, and a single fold accumulates Σ c·log2 c from
    * run lengths — no explode, no shuffle, no per-token map lookups; at
    * corpus scale the whole signal is a projection over one text scan.
    */
  /** One codegen'd pass (graft.plans.UnigramEntropy): hash-map unigram
    * counts → H = log2(n) − (Σ c·log2 c)/n. Replaced the interpreted
    * sorted-run `aggregate()` fold, whose per-token struct allocation
    * measured 15× DuckDB's marginal cost at 16× scale. The native
    * expression is null-intolerant, so NULL text is coalesced back to 0.0
    * here — the contract the pre-native Column expression, the DuckDB
    * oracle, and the quality-filter stages (min/max_entropy must not
    * silently drop null-text rows) all share.
    */
  def unigramEntropy(text: Column): Column =
    coalesce(graft.plans.VectorExpressions.unigramEntropy(tokens(text)), lit(0.0))

  /** Composable text normalization — the standard pre-dedup cleanup chain,
    * applied in a FIXED order regardless of the order ops are requested in
    * (lowercase → strip punctuation → collapse whitespace → trim), so two
    * configs naming the same op set normalize identically. Pure codegen'd
    * expressions; unknown op names fail fast with the known set.
    */
  val NormalizeOps: Seq[String] = Seq("lowercase", "strip_punct", "collapse_ws")

  def normalize(text: Column, ops: Seq[String]): Column = {
    val unknown = ops.filterNot(NormalizeOps.contains)
    require(unknown.isEmpty,
      s"unknown normalize op(s) ${unknown.mkString(", ")} (known: ${NormalizeOps.mkString(", ")})")
    var t = text
    if (ops.contains("lowercase")) t = lower(t)
    // punctuation → space (not empty): "end.Start" must not fuse into one
    // token, and the whitespace collapse below tidies the result
    if (ops.contains("strip_punct")) t = regexp_replace(t, "[\\p{Punct}]+", " ")
    if (ops.contains("collapse_ws")) t = regexp_replace(t, "\\s+", " ")
    trim(t)
  }
}
