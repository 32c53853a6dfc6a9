package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.functions.GraftFunctions.tokens

/** Corpus-distribution drift monitoring: per-group Jensen-Shannon
  * divergence between each group's unigram distribution and the whole
  * corpus's — the dataset-card / mix-shift diagnostic a curation pipeline
  * reports per source, language, or crawl snapshot (a new release whose
  * per-source JSD jumps has changed its content mix, whatever its row
  * counts say). JSD is symmetric and bounded in [0, 1] bit — comparable
  * across groups and over time, which is why it beats raw KL here.
  *
  * For P = group distribution, Q = corpus distribution, M = (P+Q)/2:
  * JSD = ½·KL(P‖M) + ½·KL(Q‖M) in bits. Because every group is part of
  * the corpus, supp(P) ⊆ supp(Q), and the Q-side sum over tokens the
  * group never uses collapses in closed form: for w ∉ supp(P), m = q/2,
  * so those terms contribute Σ q·log2(2) = 1 − Q(supp P). Everything
  * else lives on the group's own vocabulary:
  *
  *   JSD_g = ½·Σ_w p·log2(2p/(p+q)) + ½·(Σ_w q·log2(2q/(p+q)) + 1 − Σ_w q)
  *
  * with all three sums over w ∈ supp(P) only — no per-group traversal of
  * the full corpus vocabulary.
  *
  * Scale shape: ONE corpus scan — the (group, token) count aggregation
  * shuffles map-side-combined, and every other input (corpus-wide token
  * counts, group totals, the corpus total) is a SECOND-level aggregation
  * of that same frame, so AQE stage reuse serves all consumers from one
  * scan+exchange (the explicit isnotnull filters keep the copies'
  * canonical plans equal — see Classifier for the failure mode). The
  * per-term arithmetic is exact engine-portable: probabilities are IEEE
  * quotients of identical integers, each term is rounded to 1e-9 and
  * summed as an exact long, and the output is the raw quotient of that
  * integer sum — bit-identical at any parallelism in any engine.
  */
object Divergence {

  /** Per-group unigram JSD to the whole corpus: (group, n_tokens,
    * n_terms, js_bits). Groups with no tokens produce no row; null-group
    * docs are excluded (coalesce the group column upstream to monitor
    * them as a bucket).
    */
  def jsDivergence(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val gw = docs
      .select(col(groupCol).as("__g"), explode(tokens(col(textCol))).as("__w"))
      .groupBy("__g", "__w")
      .agg(count(lit(1)).as("__c"))
      // inferable-constraint superset, stated explicitly so all four
      // consumers' copies of this subtree stay canonically equal — see
      // Classifier for the reuse failure mode this prevents
      .where(col("__g").isNotNull && col("__w").isNotNull && col("__c") > 0)

    val groupTotals = gw.groupBy("__g").agg(sum("__c").as("__tg"))
    val corpus = gw.groupBy("__w").agg(sum("__c").as("__cw"))
      .where(col("__w").isNotNull && col("__cw") > 0)
    val total = corpus.agg(sum("__cw").as("__t"))

    val p = col("__c").cast("double") / col("__tg")
    val q = col("__cw").cast("double") / col("__t")
    val m2 = p + q // 2m
    def e9(c: Column): Column = round(c * lit(1e9)).cast(LongType)
    val joined = gw
      .join(corpus, Seq("__w"))
      .join(broadcast(groupTotals), Seq("__g"))
      .crossJoin(broadcast(total))
      .groupBy(col("__g"))
      .agg(
        max(col("__tg")).as("n_tokens"),
        count(lit(1)).as("n_terms"),
        sum(e9(p * log2(lit(2.0) * p / m2))).as("__sp"),
        sum(e9(q * log2(lit(2.0) * q / m2))).as("__sq"),
        sum(e9(q)).as("__qcov"))
    joined.select(col("__g").as(groupCol), col("n_tokens"), col("n_terms"),
      ((col("__sp") + col("__sq") + lit(1000000000L) - col("__qcov"))
        / lit(2e9)).as("js_bits"))
  }
}
