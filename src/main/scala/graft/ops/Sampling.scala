package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.portableHash56

/** Deterministic sampling and split assignment for training-data curation.
  *
  * All methods key off the engine-portable md5 hash of a stable id — not
  * `rand()` — so samples are reproducible run-to-run, engine-to-engine, and
  * under retries/stragglers at cluster scale (a task re-execution with
  * `rand()` silently changes the sample).
  */
object Sampling {

  /** Uniform hash in [0, 1) derived from the id column and a seed, quantized
    * to 1e-9 steps — fractions below 1e-9 are not representable (a request
    * for less rounds up to the grid). Null ids hash to null.
    */
  def unitHash(id: Column, seed: Long = 42L): Column =
    (portableHash56(concat(id.cast("string"), lit(":"), lit(seed.toString))) % 1000000000L)
      .cast("double") / 1000000000.0

  /** Deterministic Bernoulli sample: keep rows whose unit hash < fraction.
    * Rows with a null id are dropped (they have no stable hash).
    */
  def sample(df: DataFrame, idCol: String, fraction: Double, seed: Long = 42L): DataFrame =
    df.filter(unitHash(col(idCol), seed) < fraction)

  /** Deterministic train/validation/test split assignment by cumulative
    * weight ranges over the unit hash. Rows with a null id get a null split
    * (they must not silently pile into the last split and contaminate a
    * held-out set) — consistent with sample() dropping them.
    */
  def assignSplits(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], seed: Long = 42L): DataFrame = {
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "split weights must sum to 1")
    val h = unitHash(col(idCol), seed)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val expr = splits.zip(cum).reverse.tail.foldLeft(lit(splits.last._1)) {
      case (acc, ((name, _), hi)) => when(h < hi, name).otherwise(acc)
    }
    df.withColumn("split", when(h.isNotNull, expr))
  }

  /** Deterministic per-stratum resampling to a target mix (the domain-
    * reweighting primitive behind DoReMi-style data mixing and epoch-based
    * source repetition): each stratum keeps/repeats rows at its configured
    * rate. A rate r emits floor(r) copies of every row plus one more when
    * the row's unit hash falls under the fractional part — so r <= 1 is
    * exactly [[sample]] restricted to the stratum (same hash, same seed
    * semantics), r = 2 duplicates every row, r = 2.25 duplicates every row
    * and keeps a deterministic quarter a third time. Copies are
    * distinguished by `epochCol` (0-based) so downstream exact-dedup keyed
    * on (id, epoch) does not collapse intentional repetition.
    *
    * Strata absent from `rates` (and null strata) use `defaultRate`. Rows
    * with a null id are dropped, consistent with [[sample]].
    *
    * Scale shape: pure map-side — the rate lookup is a literal map over the
    * config (config-sized by definition), the copy count is arithmetic on
    * the row's hash, and the repetition is a per-row explode of a
    * copies-long sequence. No shuffle, no join, nothing driver-sized; a
    * rate must be < ~2^31 which any sane mix is.
    */
  def resampleMix(df: DataFrame, idCol: String, stratumCol: String,
      rates: Seq[(String, Double)], defaultRate: Double = 1.0,
      seed: Long = 42L, epochCol: String = "epoch"): DataFrame = {
    rates.foreach { case (k, r) =>
      require(r >= 0 && !r.isNaN, s"rate for stratum `$k` must be >= 0, got $r") }
    require(defaultRate >= 0 && !defaultRate.isNaN,
      s"defaultRate must be >= 0, got $defaultRate")
    require(!df.columns.contains(epochCol),
      s"output column `$epochCol` already exists; pass a different epochCol")
    val rateExpr = coalesce(
      element_at(map(rates.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
        col(stratumCol)), // null / unlisted stratum -> null -> defaultRate
      lit(defaultRate))
    val u = unitHash(col(idCol), seed)
    val copies = (floor(rateExpr).cast("long") +
      when(u < (rateExpr - floor(rateExpr)), 1L).otherwise(0L))
    df.filter(col(idCol).isNotNull)
      .withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn(epochCol, explode(sequence(lit(0L), col("__copies") - 1L)))
      .drop("__copies")
  }

  /** Stratified cap: keep at most `perStratum` rows per stratum, selected by
    * hash rank (deterministic). Requires `idCol` to be a unique row key —
    * the same assumption every hash-keyed method here already makes
    * (duplicate ids were nondeterministic under the previous window
    * implementations too: equal sort keys); use [[stratifiedCapWindow]]
    * when ids can repeat and an exact row count matters more than plan cost.
    *
    * BOUNDED TOP-K AGGREGATE + BROADCAST SEMI-JOIN, because any window
    * partitioned by the stratum must co-locate each stratum's FULL row set
    * before ranking — and real corpora have a dominant stratum (one `source`
    * covering most of a 100 TB crawl), so that shuffle moves most of the
    * dataset no matter how it is salted. Here the ranking state is a
    * k-bounded priority queue with map-side partial combine
    * ([[org.apache.spark.sql.GraftSqlBridge.collectTopK]]): each map task
    * ships at most `perStratum` (hash, id) entries per stratum, the reduce
    * side merges #tasks × k bounded buffers, and the full rows are never
    * shuffled at all — the winners (≤ strata × perStratum ids) broadcast
    * back onto the source as a semi-join, keeping the big side's scan
    * shuffle-free. Skew-proof by construction: a stratum's cost no longer
    * depends on its row share.
    *
    * "Metadata-sized" holds when the stratum column is a grouping key
    * (source, language, shard), not a near-unique one: with S distinct
    * strata the winner set is S × perStratum rows, and forcing that
    * through a broadcast at S in the millions would OOM the driver. For
    * such corpora pass `broadcastWinners = false` (stage key
    * `broadcast: false`) — the semi-join then goes through the planner
    * unhinted, which shuffles the big side but bounds memory — or use the
    * window variant (`algo: window`).
    */
  def stratifiedCap(df: DataFrame, idCol: String, stratumCol: String,
      perStratum: Int, seed: Long = 42L,
      broadcastWinners: Boolean = true): DataFrame = {
    require(perStratum >= 1, s"perStratum must be >= 1, got $perStratum")
    import org.apache.spark.sql.GraftSqlBridge
    // null ids have no stable hash — drop them, consistent with sample()
    val winners = df.filter(col(idCol).isNotNull)
      .groupBy(col(stratumCol).as("__stratum"))
      .agg(GraftSqlBridge.collectTopK(
        struct(unitHash(col(idCol), seed).as("h"), col(idCol).as("id")),
        perStratum, smallest = true).as("__top"))
      .select(col("__stratum"), explode(col("__top.id")).as("__sel_id"))
    df.join(if (broadcastWinners) broadcast(winners) else winners,
        col(stratumCol) <=> col("__stratum") && col(idCol) === col("__sel_id"),
        "left_semi")
  }

  /** The previous two-phase salted-window cap, kept for corpora whose id
    * column is NOT unique (it caps the row COUNT exactly even then, at the
    * price of shuffling every row once) and as the independent oracle the
    * aggregate path is property-tested against. Phase 1 windows over
    * (stratum, salt) keeping each salt's local top-`perStratum`; phase 2
    * ranks only the ≤ salts × perStratum survivors. The salt is id-derived
    * (not round-robin), so retries re-bucket identically.
    */
  /** Token-budget cap: keep documents, in deterministic hash order, until a
    * stratum's CUMULATIVE TOKEN count reaches `budgetTokens` — the
    * "assemble an N-token mix" selection, the token-weighted sibling of
    * [[stratifiedCap]]'s row-count cap (a row cap over wildly-varying
    * document lengths over/under-shoots the token budget by the length
    * skew). The document that crosses the budget line is KEPT (budgets are
    * targets; always dropping the straddler would systematically
    * under-fill every stratum by half a document), later ones are dropped.
    * No `stratumCol` = one global budget. Null ids are dropped (no stable
    * hash), consistent with [[sample]].
    *
    * Scale shape: stats-pass + apply-pass. The cumulative sum windows over
    * a 3-column (id, stratum, n_tokens) PROJECTION — document text never
    * shuffles — and the winner ids (≈ budget / mean_tokens rows per
    * stratum, metadata-sized for any practical budget) broadcast back as a
    * semi-join. The projection window still co-locates a stratum's
    * triplets (the [[stratifiedCapWindow]] caveat); for a dominant stratum
    * at extreme scale, pre-thin with [[sample]] at a fraction safely above
    * budget/corpus_tokens first.
    */
  def tokenBudgetCap(df: DataFrame, idCol: String, textCol: String,
      budgetTokens: Long, stratumCol: Option[String] = None,
      seed: Long = 42L, broadcastWinners: Boolean = true): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens must be >= 1, got $budgetTokens")
    val stratum = stratumCol.map(col).getOrElse(lit(""))
    val w = Window.partitionBy(col("__stratum"))
      .orderBy(unitHash(col(idCol), seed), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val winners = df.filter(col(idCol).isNotNull)
      .select(col(idCol), stratum.as("__stratum"),
        graft.ops.TextAnalysis.tokenCount(col(textCol)).cast("long").as("__tok"))
      .withColumn("__pre", sum(col("__tok")).over(w) - col("__tok"))
      .filter(col("__pre") < budgetTokens) // the straddler's pre-sum is under budget
      .select(idCol)
    df.join(if (broadcastWinners) broadcast(winners) else winners,
      Seq(idCol), "left_semi")
  }

  def stratifiedCapWindow(df: DataFrame, idCol: String, stratumCol: String,
      perStratum: Int, seed: Long = 42L, salts: Int = 64): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val order = Seq(unitHash(col(idCol), seed), col(idCol))
    val local = Window.partitionBy(col(stratumCol), pmod(hash(col(idCol)), lit(salts)))
      .orderBy(order: _*)
    val global = Window.partitionBy(col(stratumCol)).orderBy(order: _*)
    // null ids have no stable hash: default nulls-first ordering would keep
    // them preferentially AND nondeterministically (all sort keys equal) —
    // drop them, consistent with sample()
    df.filter(col(idCol).isNotNull)
      .withColumn("__lrank", row_number().over(local))
      .filter(col("__lrank") <= perStratum)
      .withColumn("__rank", row_number().over(global))
      .filter(col("__rank") <= perStratum)
      .drop("__lrank", "__rank")
  }

  /** [[resampleMix]] with the per-stratum rates supplied as a FRAME
    * (stratum, rate) instead of literals — for rates computed from data
    * (see [[temperatureMix]]) or loaded from a manifest. The rate table is
    * strata-sized → broadcast; null/unlisted strata fall to `defaultRate`.
    * Same copies/epoch semantics as resampleMix.
    */
  def resampleMixByRates(df: DataFrame, idCol: String, stratumCol: String,
      rates: DataFrame, defaultRate: Double = 1.0, seed: Long = 42L,
      epochCol: String = "epoch"): DataFrame = {
    require(defaultRate >= 0 && !defaultRate.isNaN,
      s"defaultRate must be >= 0, got $defaultRate")
    require(!df.columns.contains(epochCol),
      s"output column `$epochCol` already exists; pass a different epochCol")
    val r = rates.select(col(stratumCol).as("__stratum"), col("rate").as("__rate"))
    val rateExpr = coalesce(col("__rate"), lit(defaultRate))
    val u = unitHash(col(idCol), seed)
    val copies = (floor(rateExpr).cast("long") +
      when(u < (rateExpr - floor(rateExpr)), 1L).otherwise(0L))
    df.filter(col(idCol).isNotNull)
      .join(broadcast(r), col(stratumCol) <=> col("__stratum"), "left")
      .withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn(epochCol, explode(sequence(lit(0L), col("__copies") - 1L)))
      .drop("__copies", "__stratum", "__rate")
  }

  /** Temperature-based mix rebalancing (the multilingual "alpha sampling"
    * of XLM / multilingual BERT): resample so stratum g's share of the
    * output follows p_g^alpha (renormalized) instead of its natural share
    * p_g — alpha 1 keeps the corpus as-is, alpha 0 equalizes all strata,
    * values between damp the head and lift the tail. `sizeFactor` scales
    * the expected output size relative to the input.
    *
    * rate_g = sizeFactor · N · p_g^alpha / (Σ_h n_h^alpha) / n_g, rounded
    * to 1e-6 so the sampling decisions are engine-portable (the suite's
    * standard decimal-pinning convention). Derivation is one
    * stratum-column-pruned count pass + a strata-sized broadcast; the data
    * itself is scanned once more for the resample — two pruned scans total,
    * no corpus shuffle anywhere.
    */
  def temperatureMix(df: DataFrame, idCol: String, stratumCol: String,
      alpha: Double, sizeFactor: Double = 1.0, seed: Long = 42L,
      epochCol: String = "epoch"): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0,1], got $alpha")
    require(sizeFactor > 0 && !sizeFactor.isNaN,
      s"sizeFactor must be positive, got $sizeFactor")
    val counts = df.filter(col(idCol).isNotNull)
      .groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
    // NOTE: Spark resolves column names case-insensitively — totals must
    // not differ from `__n` by case alone
    val tot = counts.agg(sum("__n").as("__tot"),
      sum(pow(col("__n"), lit(alpha))).as("__z"))
    val rates = counts.crossJoin(broadcast(tot))
      .select(col(stratumCol),
        round(lit(sizeFactor) * col("__tot") * pow(col("__n"), lit(alpha)) /
          col("__z") / col("__n"), 6).as("rate"))
    resampleMixByRates(df, idCol, stratumCol, rates, defaultRate = 0.0,
      seed = seed, epochCol = epochCol)
  }

  /** Deterministic global shuffle: append the row's position (`outCol`,
    * 1-based) in the id-hash order — the reproducible corpus permutation
    * training runs need (same seed ⇒ same order on any cluster, any
    * partitioning, any engine). Decorrelated from both input order and id
    * order by the hash; ties cannot occur (the id breaks them). Null ids
    * are dropped, consistent with [[sample]].
    *
    * Scale shape: the global numbering is the two-pass range bridge
    * ([[graft.functions.GraftFunctions.withGlobalRowNumber]]) — a
    * range-exchange plus per-partition offsets from partition counts, not a
    * single-partition window. Writing the result sorted by `outCol` yields
    * shard files that stream the permutation in order.
    */
  def deterministicShuffle(df: DataFrame, idCol: String,
      outCol: String = "shuffle_pos", seed: Long = 42L): DataFrame =
    graft.functions.GraftFunctions.withGlobalRowNumber(
      df.filter(col(idCol).isNotNull), outCol,
      Seq(unitHash(col(idCol), seed), col(idCol)))
}
