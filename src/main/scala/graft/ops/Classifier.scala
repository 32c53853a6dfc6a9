package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.functions.GraftFunctions.tokens

/** Trainable document classifier — the quality/domain-classifier slot of a
  * curation pipeline (the GPT-3/LLaMA fastText-classifier analog: train on a
  * labeled seed corpus, score the crawl, keep/bucket by predicted class).
  *
  * The model is multinomial Naive Bayes with add-one smoothing over word
  * counts: log P(c|d) ∝ ln P(c) + Σ_w k_w · ln((cnt(w,c)+1)/(tot_c+V)).
  * Chosen deliberately over gradient-trained models: training IS a count
  * aggregation (one scan, map-side combined, no iteration), the model is two
  * plain tables reproducible in any SQL engine, and scoring is a single
  * vocab-keyed join — so a classifier trained anywhere scores identically
  * here, and the whole train+score path stays inside Catalyst.
  *
  * Scale shape: training scans the labeled seed once (seed corpora are
  * metadata-sized next to the crawl). Scoring scans the crawl once:
  * per-document token counts aggregate map-side on (id, token) — bounded by
  * document length — then one join against the (token, label) count table;
  * the class list rides along as a broadcast (labels are low-cardinality by
  * construction). Per-token-class log-likelihood terms are rounded to 1e-6
  * and summed as exact integers, making scores and the argmax
  * order-independent — stable under any partitioning in any engine. No
  * driver-side collection anywhere: class totals, vocabulary size, and N
  * are all 1-row/low-cardinality frames joined in broadcast position.
  */
object Classifier {

  /** Train: the two model tables from a labeled corpus.
    * Returns (tokenCounts: (label, token, cnt), priors: (label, n_docs)).
    * Persist both with `write.parquet` for train-once/score-many.
    */
  def trainNaiveBayes(train: DataFrame, textCol: String, labelCol: String)
      : (DataFrame, DataFrame) = {
    val tokenCounts = train
      .select(col(labelCol).as("label"), explode(tokens(col(textCol))).as("token"))
      .groupBy("label", "token")
      .agg(count(lit(1)).as("cnt"))
    val priors = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
    (tokenCounts, priors)
  }

  /** Score: one row per (document, class) — `score` is the joint log
    * probability ln P(c) + ln P(d|c) (natural log, exact at 1e-6
    * resolution), `pred` the argmax class
    * (ties broken to the lexicographically-smallest label; the comparison
    * runs on the exact scaled-integer scores, not the rounded doubles).
    * Documents with no tokens score on the prior alone.
    */
  def nbScores(docs: DataFrame, idCol: String, textCol: String,
      tokenCounts: DataFrame, priors: DataFrame): DataFrame = {
    val (likScores, classes) = scoredFrames(docs, idCol, textCol, tokenCounts, priors)
    // the (doc × class) table, empty docs included: every doc id against
    // every class, with the prior alone where no token row exists
    val scoredE6 = docs.select(col(idCol)).crossJoin(broadcast(classes))
      .join(likScores, Seq(idCol, "label"), "left")
      .select(col(idCol), col("label"),
        coalesce(col("__s_e6"), col("__prior_e6")).as("__s_e6"))
    // the argmax rides a per-document window (class-count rows per
    // partition) instead of a groupBy+self-join — one pass, no duplicated
    // stage chain. score = exact integer / 1e6: IEEE division of identical
    // integers is correctly rounded, so the double is BIT-IDENTICAL in any
    // engine — a decimal re-round here would reintroduce engine-specific
    // boundary behavior on values landing exactly on x.xxxx5
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
    scoredE6
      .withColumn("__b", min(struct((-col("__s_e6")).as("ns"),
        col("label").as("l"))).over(w))
      .select(col(idCol), col("label"),
        (col("__s_e6") / lit(1e6)).as("score"), col("__b.l").as("pred"))
  }

  /** Classify: one row per document — (id, pred). Tokenless documents get
    * the prior argmax (a single broadcast constant), so the expensive
    * per-(doc, class) expansion only runs over token-bearing documents.
    */
  def nbClassify(docs: DataFrame, idCol: String, textCol: String,
      tokenCounts: DataFrame, priors: DataFrame): DataFrame = {
    val (likScores, classes) = scoredFrames(docs, idCol, textCol, tokenCounts, priors)
    docs.select(col(idCol))
      .join(argmax(likScores, classes, idCol), Seq(idCol), "left")
      .crossJoin(broadcast(priorArgmax(classes)))
      .select(col(idCol), coalesce(col("pred"), col("__prior_pred")).as("pred"))
  }

  /** Train/test evaluation: the confusion table (label, pred, n) from
    * classifying an eval corpus that carries true labels — the accuracy
    * loop that decides whether a trained filter ships. Exact counts only,
    * so the whole evaluation replays in any engine. One chain: likelihood
    * aggregation → per-doc argmax → label join → count; the true-label
    * projection doubles as the universe of ids, so no separate id scan.
    */
  def nbConfusion(eval: DataFrame, idCol: String, textCol: String,
      labelCol: String, tokenCounts: DataFrame, priors: DataFrame): DataFrame = {
    val (likScores, classes) = scoredFrames(eval, idCol, textCol, tokenCounts, priors)
    eval.select(col(idCol), col(labelCol).as("label"))
      .join(argmax(likScores, classes, idCol), Seq(idCol), "left")
      .crossJoin(broadcast(priorArgmax(classes)))
      .groupBy(col("label"), coalesce(col("pred"), col("__prior_pred")).as("pred"))
      .agg(count(lit(1)).as("n"))
  }

  /** argmax over exact integers: min of (−score, label) ⇒ highest score,
    * tie → lexicographically-smallest label. The (−score, label) order is
    * packed into ONE long — `−s_e6·1024 + labelIdx`, with `labelIdx` the
    * dense LEXICOGRAPHIC label rank from the broadcast-tiny class frame —
    * because `min(struct)` silently forces SortAggregate (structs are not
    * mutable hash-agg buffer types), sorting the corpus-sized (doc × class)
    * stream on both shuffle sides; the packed min is a plain HashAggregate
    * (the Dedup.packFirst trap, same round-14 measurement). Bounds fail
    * loudly: ≤1024 classes, |s_e6| < 2^53 (a petabyte-of-tokens document).
    */
  private def argmax(scoredE6: DataFrame, classes: DataFrame,
      idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("label"))
    val idx = classes.select(col("label"),
      (row_number().over(w) - 1).cast("long").as("__li"))
    val packed = when(abs(col("__s_e6")) >= lit(1L << 53) ||
        col("__li") >= 1024L,
      raise_error(concat(lit("nb argmax packing out of range: s_e6="),
        col("__s_e6").cast("string"), lit(" labelIdx="),
        col("__li").cast("string"))).cast("long"))
      .otherwise(-col("__s_e6") * lit(1024L) + col("__li"))
    scoredE6.join(broadcast(idx), Seq("label"))
      .groupBy(col(idCol))
      .agg(min(packed).as("__p"))
      .select(col(idCol), pmod(col("__p"), lit(1024L)).as("__li"))
      .join(broadcast(idx), Seq("__li"))
      .select(col(idCol), col("label").as("pred"))
  }

  /** The class a tokenless document gets: argmax of the priors alone, as a
    * 1-row broadcastable frame (same exact-integer tiebreak).
    */
  private def priorArgmax(classes: DataFrame): DataFrame =
    classes
      .agg(min(struct((-col("__prior_e6")).as("ns"), col("label").as("l")))
        .as("__b"))
      .select(col("__b.l").as("__prior_pred"))

  /** The exact per-(doc, class) scaled-integer score frame for
    * TOKEN-BEARING documents — (id, label, __s_e6) — plus the class frame
    * (label, __prior_e6, __lnt_e6). Shared by score/classify/evaluate.
    *
    * The smoothed likelihood DECOMPOSES so the corpus-sized join never
    * expands by the class count: a (token, class) pair absent from the
    * model contributes ln(0+1) = 0, so
    *
    *   s(id,c) = prior(c) + Σ_w k_w·ln(cnt_wc+1) − K_id·ln(tot_c+V)
    *
    * needs only the INNER join of doc grams to model rows on token (the
    * per-class sums and the doc's token total K aggregate from that one
    * gram frame), and the ×nclasses expansion happens afterwards on the
    * per-document aggregates — class-count rows per doc, not per token.
    * Each ln is individually rounded to 1e-6 (that exact decomposition is
    * the engine-portable contract).
    */
  private def scoredFrames(docs: DataFrame, idCol: String, textCol: String,
      tokenCounts: DataFrame, priors: DataFrame): (DataFrame, DataFrame) = {
    // cnt>0 is a semantic no-op and the isnotnull filters only drop
    // degenerate null-keyed model rows; their real job is PLAN CONVERGENCE:
    // downstream joins infer exactly these constraints and push a different
    // subset into each copy of this subtree, and any pushed-filter
    // difference breaks the canonical equality AQE stage reuse needs —
    // stating the superset explicitly keeps self-training to one seed scan
    val tcUsed = tokenCounts.where(col("cnt") > 0 &&
      col("token").isNotNull && col("label").isNotNull)
    // per-class token totals and the shared smoothing vocabulary, derived
    // from the model table itself
    val classTotals = tcUsed.groupBy("label").agg(sum("cnt").as("__tot"))
    val vocab = tcUsed.agg(count_distinct(col("token")).as("__v"))
    // unlabeled (null-label) seed rows are ignored by training ENTIRELY —
    // they are no class and do not count toward N; filtering the shared
    // priors frame once also keeps the nTotal branch's subtree identical
    // to the class-list branch's, so the seed aggregation is reused
    val priUsed = priors.where(col("label").isNotNull)
    val nTotal = priUsed.agg(sum("n_docs").as("__n"))
    val classes = priUsed.join(classTotals, Seq("label"), "left")
      .crossJoin(broadcast(vocab)).crossJoin(broadcast(nTotal))
      .select(col("label"),
        round((log(col("n_docs")) - log(col("__n"))) * lit(1e6))
          .cast(LongType).as("__prior_e6"),
        round(log(coalesce(col("__tot"), lit(0L)) + col("__v")) * lit(1e6))
          .cast(LongType).as("__lnt_e6"))
      // always true (n_docs <= N ⇒ ln prior <= 0; tot+V >= 1 ⇒ lnt >= 0;
      // a null label would be a degenerate null class): pins BOTH derived
      // columns — and transitively priors/nTotal/totals/vocab — into every
      // consumer's column set and states the constraint the outer join
      // would infer on only one copy, so the copies of this frame prune
      // and filter identically and the seed aggregations are computed once
      // instead of re-scanning per branch
      .where(col("__prior_e6") <= 0L && col("__lnt_e6") >= 0L &&
        col("label").isNotNull)

    val grams = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("__k"))
      .where(col(idCol).isNotNull && col("token").isNotNull)

    val tcScored = tcUsed.select(col("token"), col("label"),
      round(log(col("cnt") + lit(1.0)) * lit(1e6)).cast(LongType)
        .as("__lnc_e6"))
    val sums = grams
      .join(tcScored, Seq("token"))
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("__k") * col("__lnc_e6")).as("__sum_e6"))
    // K_id = Σ __k = the doc's total token count — derivable as a ZERO-
    // SHUFFLE projection (size of the token array) instead of a second
    // aggregation over the gram exchange (r17 probe: that agg was its own
    // 2 s-CPU stage at x10). The `> 0` filter preserves the gram form's
    // absence semantics EXACTLY: null/empty-text docs have no kTot row and
    // score through the prior-only path, as before.
    val kTot = docs
      .where(col(idCol).isNotNull)
      .select(col(idCol),
        coalesce(size(tokens(col(textCol))), lit(0)).cast(LongType).as("__kk"))
      .where(col("__kk") > 0L)
    val likScores = kTot.crossJoin(broadcast(classes))
      .join(sums, Seq(idCol, "label"), "left")
      .select(col(idCol), col("label"),
        (col("__prior_e6") + coalesce(col("__sum_e6"), lit(0L)) -
          col("__kk") * col("__lnt_e6")).as("__s_e6"))
    (likScores, classes)
  }
}
