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
    val (scoredE6, _) = scoredFrames(docs, idCol, textCol, tokenCounts, priors)
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

  /** Classify: one row per document — (id, pred). */
  def nbClassify(docs: DataFrame, idCol: String, textCol: String,
      tokenCounts: DataFrame, priors: DataFrame): DataFrame = {
    val (scoredE6, _) = scoredFrames(docs, idCol, textCol, tokenCounts, priors)
    argmax(scoredE6, idCol)
  }

  /** argmax over exact integers: min of (−score, label) ⇒ highest score,
    * tie → lexicographically-smallest label.
    */
  private def argmax(scoredE6: DataFrame, idCol: String): DataFrame =
    scoredE6.groupBy(col(idCol))
      .agg(min(struct((-col("__s_e6")).as("ns"), col("label").as("l")))
        .as("__b"))
      .select(col(idCol), col("__b.l").as("pred"))

  /** The exact per-(doc, class) scaled-integer score frame
    * (id, label, __s_e6) shared by [[nbScores]] and [[nbClassify]].
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
        coalesce(col("__tot"), lit(0L)).as("__tot"), col("__v"))
      // always true (n_docs <= N ⇒ ln prior <= 0; a null label would be a
      // degenerate null class): pins __prior_e6 — and transitively
      // priors/nTotal — into BOTH consumers' column sets and states the
      // constraint the outer join would infer on only one copy, so the two
      // copies of this frame prune and filter identically and the priors
      // aggregation is computed once instead of re-scanning the seed as a
      // pruned distinct + a rows-only count
      .where(col("__prior_e6") <= 0L && col("label").isNotNull)

    val grams = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("__k"))
      .where(col(idCol).isNotNull && col("token").isNotNull)

    val termE6 = round((log(coalesce(col("cnt"), lit(0L)) + lit(1.0)) -
      log(col("__tot") + col("__v"))) * lit(1e6)).cast(LongType)
    val likSums = grams
      .crossJoin(broadcast(classes))
      .join(tcUsed, Seq("token", "label"), "left")
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("__k") * termE6).as("__lik_e6"))

    val scoredE6 = docs.select(col(idCol)).crossJoin(broadcast(classes))
      .join(likSums, Seq(idCol, "label"), "left")
      .select(col(idCol), col("label"),
        (col("__prior_e6") + coalesce(col("__lik_e6"), lit(0L))).as("__s_e6"))
    (scoredE6, classes)
  }
}
