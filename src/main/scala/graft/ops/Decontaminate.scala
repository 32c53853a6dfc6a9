package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.tokens

/** Eval-set decontamination: remove training documents that share any word
  * n-gram with a held-out evaluation corpus — the standard test-set-leakage
  * guard a pre-training pipeline runs before anything else ships (the
  * GPT-3/PaLM-style n-gram overlap rule; n=8..13 in practice).
  *
  * Scale shape: the EVAL side is metadata-sized by definition (benchmarks,
  * not crawls), so its distinct n-gram hashes broadcast; the TRAIN side is
  * the 100 TB corpus and must never shuffle. Two plans, same result:
  *
  *  - [[decontaminate]] (exact): explode the train corpus's n-gram hashes,
  *    broadcast-semi-join against the eval grams to find contaminated ids,
  *    broadcast-anti-join those ids back. Zero full-corpus shuffles, but
  *    the explode materializes ~doc_len candidate rows per train doc.
  *  - [[decontaminateBloom]]: fold the eval grams into ONE serialized
  *    bloom filter (Spark's own runtime-filter aggregate, map-side merged,
  *    metadata-sized however many grams), probe it per-document inside an
  *    `exists` over the in-row hash array — no explode at all for the
  *    overwhelmingly-clean majority — and run the exact path only on the
  *    flagged docs, which removes bloom false positives. One corpus scan +
  *    a scan of the flagged sliver: the plan to reach for at 100 TB.
  *
  * Hashes are the engine's 56-bit portable shingle hash: collision odds at
  * eval-set scale (~10⁷ grams) are ~10⁻²; a collision only flags a doc for
  * the exact confirm (bloom path) or spuriously drops one doc (exact path,
  * odds ~10⁻² corpus-wide) — acceptable for a contamination guard whose
  * false-negative rate is what matters.
  */
object Decontaminate {

  private def gramHashes(textCol: String, n: Int): Column =
    graft.plans.VectorExpressions.shingleHash56(tokens(col(textCol)), n,
      distinct = true)

  /** Distinct n-gram hashes of the eval corpus (one LONG column `__g`). */
  private def evalGrams(eval: DataFrame, textCol: String, n: Int): DataFrame =
    eval.filter(size(tokens(col(textCol))) >= n)
      .select(explode(gramHashes(textCol, n)).as("__g"))
      .distinct()

  /** ids of train docs sharing at least one word n-gram with `eval`.
    * `eval` needs only `textCol`; docs shorter than n words cannot be
    * contaminated.
    */
  def contaminatedIds(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame =
    train.filter(size(tokens(col(textCol))) >= n)
      .select(col(idCol), explode(gramHashes(textCol, n)).as("__g"))
      .join(broadcast(evalGrams(eval, textCol, n)), Seq("__g"), "left_semi")
      .select(idCol).distinct()

  /** `train` minus every document sharing an n-gram with `eval` (exact). */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame =
    train.join(broadcast(contaminatedIds(train, eval, idCol, textCol, n)),
      Seq(idCol), "left_anti")

  /** [[decontaminate]] with a bloom prefilter: identical output (the exact
    * confirm removes false positives; bloom filters have no false
    * negatives), but the train corpus is never exploded — only flagged
    * docs are. `expectedItems`/`numBits` size the filter (defaults: 4M
    * grams at 8 bits/item ≈ 2% fpp); oversize `expectedItems` rather than
    * undersize, the filter degrades to more confirm work, never to misses.
    */
  def decontaminateBloom(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 8, expectedItems: Long = 4L << 20,
      numBits: Long = 32L << 20): DataFrame = {
    val bloomRow = evalGrams(eval, textCol, n)
      .agg(GraftSqlBridge.bloomFilterAgg(col("__g"), expectedItems, numBits)
        .as("__bf"))
      .head()
    if (bloomRow.isNullAt(0)) return train // empty/too-short eval: nothing to remove
    val bloomBytes = bloomRow.getAs[Array[Byte]](0)
    // per-doc early-exit probe over the in-row hash array: no explode for
    // clean docs, and the probe is a native codegen'd loop (the composable
    // exists() + might_contain form interprets its lambda per element,
    // which measured SLOWER than the explode it replaces — DecontamSmoke)
    val flagged = train.filter(size(tokens(col(textCol))) >= n)
      .filter(graft.plans.VectorExpressions.bloomAnyContain(
        gramHashes(textCol, n), bloomBytes))
    train.join(
      broadcast(contaminatedIds(flagged, eval, idCol, textCol, n)),
      Seq(idCol), "left_anti")
  }
}
