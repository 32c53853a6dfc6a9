package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.functions.GraftFunctions.tokens

/** Statistical-language-model perplexity scoring — the CCNet-style quality
  * signal (Wenzek et al. 2020): score every document by how surprising its
  * text is under an n-gram model trained on a trusted reference corpus, then
  * filter/bucket on the score. High perplexity ⇒ gibberish, boilerplate
  * soup, or the wrong language; near-zero ⇒ degenerate repetition of the
  * reference's most common patterns.
  *
  * The model here is a word-BIGRAM model with add-one (Laplace) smoothing —
  * deterministic, engine-portable (counts + natural logs, no external
  * binary), and entirely expressible as Catalyst plans, where CCNet shells
  * out to a KenLM binary. The smoothing vocabulary V is the number of
  * distinct words observed in the model's bigram table (union of context and
  * successor positions), so the whole model derives from ONE artifact — the
  * (w1, w2, cnt) count table — and an LM trained in any SQL engine scores
  * identically.
  *
  * Scale shape: training is one scan of the reference corpus — in-row bigram
  * assembly (`zip_with` over the token array, no self-join), explode, and a
  * map-side-combined count aggregate, so the hot bigrams ("of the") collapse
  * per task before the single shuffle. Scoring is one scan of the target
  * corpus: per-document bigram counts aggregate map-side on (id, w1, w2) —
  * bounded by document length — then join the vocab-sized count table on the
  * bigram key (AQE broadcasts a small LM, splits skewed hot-gram keys
  * otherwise); the context marginal and vocabulary size are DERIVED from the
  * count table's own aggregation, so the reference corpus is never
  * re-scanned. Per-bigram log-probabilities are rounded to 1e-6 and summed
  * as exact integers — the document score is order-independent, so the same
  * LM gives the same scores at any parallelism in any engine.
  */
object LanguageModel {

  /** Train: corpus-wide bigram count table (w1, w2, cnt) — the single model
    * artifact. Persist with `write.parquet` for build-once/score-many.
    * Bigrams are pre-counted per document by the in-row codegen'd pass
    * ([[graft.plans.BigramCounts]]) and summed — identical totals to
    * exploding every occurrence, with one exploded row per DISTINCT
    * per-doc bigram instead of per occurrence feeding the count shuffle.
    */
  def bigramCounts(corpus: DataFrame, textCol: String): DataFrame =
    corpus.select(explode(graft.plans.VectorExpressions
        .bigramCounts(tokens(col(textCol)))).as("__g"))
      .groupBy(col("__g.w1").as("w1"), col("__g.w2").as("w2"))
      .agg(sum(col("__g.k")).as("cnt"))

  /** Per-document average negative log-likelihood (nats/bigram) and
    * perplexity under the bigram model `lm` (a [[bigramCounts]] frame).
    * Emits one row per input document:
    *
    *  - `n_bigrams`:   scored bigram occurrences (0 for docs under 2 tokens)
    *  - `oov_bigrams`: occurrences of bigrams absent from the model
    *  - `avg_nll`:     −(Σ ln P(w2|w1))/n_bigrams; null when n=0
    *  - `ppl`:         exp(avg_nll), 2 dp; null when n=0
    *
    * P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V): add-one smoothing over the model
    * vocabulary; an unseen context degrades to the uniform 1/V. The context
    * marginal c(w1) and V are derived from `lm` itself (the `cnt > 0`
    * predicate is a semantic no-op that keeps the derived branches'
    * canonical plans equal to the join branch so ReuseExchange serves all
    * consumers from one aggregation — without it a self-trained LM would
    * re-scan and re-tokenize the corpus per branch).
    */
  def perplexity(docs: DataFrame, idCol: String, textCol: String,
      lm: DataFrame): DataFrame =
    perplexityOfGrams(docs, idCol, docGramCounts(docs, idCol, textCol), lm)

  /** Per-document bigram occurrence counts (id, w1, w2, __k), counted
    * IN-ROW by the codegen'd [[graft.plans.BigramCounts]] pass and exploded
    * pre-counted: a document's bigram counts never need cross-partition
    * data, so the former `explode → groupBy(id, w1, w2)` formulation's
    * corpus-sized string-keyed exchange (one row per bigram OCCURRENCE —
    * 161.9 MB shuffled at 32× sf0.1, the dominant stage of both perplexity
    * gates) moved bytes for no semantic reason. Values are identical —
    * same string keys, same counts — so the scoring joins, the self-LM
    * derivation, and the DuckDB oracles are untouched. The trailing
    * isnotnull filters are semantic no-ops (struct fields are non-null by
    * construction) kept for PLAN CONVERGENCE: downstream joins infer
    * exactly these constraints, and stating the superset explicitly keeps
    * every copy of this subtree canonically identical.
    */
  private def docGramCounts(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol), explode(graft.plans.VectorExpressions
        .bigramCounts(tokens(col(textCol)))).as("__g"))
      .select(col(idCol), col("__g.w1").as("w1"), col("__g.w2").as("w2"),
        col("__g.k").as("__k"))
      .where(col(idCol).isNotNull && col("w1").isNotNull && col("w2").isNotNull)

  private def perplexityOfGrams(docs: DataFrame, idCol: String,
      grams: DataFrame, lm: DataFrame): DataFrame = {
    // cnt>0 is a semantic no-op; the key isnotnull filters (null-keyed model
    // rows could only come from a hand-built table and could never match)
    // converge the three lm consumers' inferred-constraint sets so the
    // model aggregation is computed once (see docGramCounts)
    val lmUsed = lm.where(col("cnt") > 0 &&
      col("w1").isNotNull && col("w2").isNotNull)
    val ctx = lmUsed.groupBy("w1").agg(sum("cnt").as("__ctx"))
    val vocab = lmUsed
      .select(explode(array(col("w1"), col("w2"))).as("__w"))
      .agg(count_distinct(col("__w")).as("__v"))

    // ln P rounded to 1e-6 as an exact integer: the per-document sum is
    // order-independent, so scores are stable under any row distribution
    val lpE6 = round((log(coalesce(col("cnt"), lit(0L)) + lit(1.0)) -
      log(coalesce(col("__ctx"), lit(0L)) + col("__v"))) * lit(1e6))
      .cast(LongType)
    val scored = grams
      .join(lmUsed, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(sum("__k").as("n_bigrams"),
        coalesce(sum(when(col("cnt").isNull, col("__k"))), lit(0L))
          .as("oov_bigrams"),
        sum(col("__k") * lpE6).as("__sum_e6"))

    // avg_nll stays the raw division result: both operands derive exactly
    // from integers, so the correctly-rounded IEEE quotient is bit-identical
    // in any engine — a decimal re-round would reintroduce engine-specific
    // boundary behavior (Spark rounds the shortest decimal repr, SQL engines
    // the binary value). ppl rounds to 2 dp only to absorb the 1-ulp libm
    // exp() spread, far below that resolution.
    val avgNll = -col("__sum_e6") / (col("n_bigrams") * lit(1e6))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("oov_bigrams"), lit(0L)).as("oov_bigrams"),
        avgNll.as("avg_nll"),
        round(exp(avgNll), 2).as("ppl"))
  }

  /** Self-perplexity: train on the corpus being scored (the no-reference
    * mode — flags documents unusual RELATIVE TO THE CORPUS ITSELF; with a
    * trusted reference, pass its [[bigramCounts]] to [[perplexity]]).
    *
    * Single-scan shape: the model is derived FROM the per-document gram
    * counts (cnt = Σ_docs k, identical to [[bigramCounts]]) instead of
    * re-tokenizing — the gram aggregation's scan and exchange serve both
    * the scoring join and the model branch via ReuseExchange, so the
    * corpus is read once however large it is.
    */
  def selfPerplexity(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val grams = docGramCounts(docs, idCol, textCol).where(col("__k") > 0)
    val lm = grams.groupBy("w1", "w2").agg(sum("__k").as("cnt"))
    perplexityOfGrams(docs, idCol, grams, lm)
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): split each
    * group (typically a language) into `nBuckets` equal-population bands by
    * perplexity — bucket 1 ("head") = most-fluent third under the default 3.
    * CCNet trains on Wikipedia and keeps head+middle as the curated corpus.
    *
    * Input is an already-scored frame (compose with [[selfPerplexity]] or
    * [[perplexity]] — the bucketing is score-agnostic). Appends an integer
    * `ppl_bucket` ∈ [1, nBuckets] (null where `pplCol` is null: unscoreable
    * docs are not silently "fluent").
    *
    * Exact nearest-rank boundaries, no corpus-sized sort: thresholds come
    * from the per-(group, score) HISTOGRAM — t_k = min score whose cumulative
    * count reaches k/nBuckets of the group (`nB·cum ≥ k·n`, all-integer, so
    * any engine agrees) — then broadcast-joined back. Window partitions are
    * histogram-sized (distinct scores per group, bounded when scores are
    * rounded like `ppl`'s 2 dp), never corpus-sized; the corpus itself is
    * touched by exactly one extra pass (the histogram aggregation).
    * Boundary docs (score == t_k) land in the LOWER bucket, so equal scores
    * always share a bucket regardless of row order.
    */
  def perplexityBuckets(scored: DataFrame, pplCol: String,
      groupCols: Seq[String] = Nil, nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 2, s"perplexityBuckets: nBuckets $nBuckets < 2")
    val gCols = groupCols.map(col)
    // The histogram carries null scores through the aggregation (masked
    // inside the cum/threshold expressions) instead of filtering them: a
    // `pplCol IS NOT NULL` filter would push below the aggregate and fork
    // this branch's copy of the upstream scoring subtree away from the
    // bucket join's copy, costing the AQE stage reuse that lets the heavy
    // scoring stages compute once for both consumers.
    val base = scored
    val hist = base
      .groupBy((gCols :+ col(pplCol).as("__s")): _*)
      .agg(count(lit(1)).as("__c"))
    val presentC = when(col("__s").isNotNull, col("__c")).otherwise(lit(0L))
    val wOrder = org.apache.spark.sql.expressions.Window
      .partitionBy(gCols: _*).orderBy(col("__s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(gCols: _*)
    val ranked = hist
      .withColumn("__cum", sum(presentC).over(wOrder))
      .withColumn("__n", sum(presentC).over(wAll))
    val thAggs = (1 until nBuckets).map(k =>
      min(when(col("__s").isNotNull &&
        col("__cum") * nBuckets >= col("__n") * k, col("__s"))).as(s"__t$k"))
    val th =
      if (groupCols.isEmpty) ranked.agg(thAggs.head, thAggs.tail: _*)
      else ranked.groupBy(gCols: _*).agg(thAggs.head, thAggs.tail: _*)
    val joined =
      if (groupCols.isEmpty) base.crossJoin(broadcast(th))
      else {
        val (l, r) = (base.alias("__pb_l"), th.alias("__pb_r"))
        val cond = groupCols.map(g => col(s"__pb_l.$g") <=> col(s"__pb_r.$g"))
          .reduce(_ && _)
        l.join(broadcast(r), cond, "left")
          .select((scored.columns.map(c => col(s"__pb_l.$c")) ++
            (1 until nBuckets).map(k => col(s"__pb_r.__t$k"))): _*)
      }
    val bucket = (1 until nBuckets)
      .map(k => when(col(pplCol) > col(s"__t$k"), 1).otherwise(0))
      .reduce(_ + _) + 1
    joined
      .withColumn("ppl_bucket",
        when(col(pplCol).isNotNull, bucket).cast("int"))
      .drop((1 until nBuckets).map(k => s"__t$k"): _*)
  }
}
