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

  /** Stratified cap: keep at most `perStratum` rows per stratum, selected by
    * hash rank (deterministic).
    *
    * TWO-PHASE TOURNAMENT, because the obvious single window partitioned by
    * the stratum serializes each stratum into one task — and real corpora
    * have a dominant stratum (one `source` covering most of a 100 TB crawl),
    * which turns the cap into a single-task sort of most of the dataset.
    * Phase 1 windows over (stratum, salt) — `salts`-way parallel even inside
    * one stratum — keeping each salt's local top-`perStratum`; phase 2 ranks
    * only the ≤ salts × perStratum survivors per stratum. Exact: every
    * global top-k row is its salt bucket's top-≤k, so phase 1 never drops
    * one. The phase-1 shuffle is the same volume the single window paid but
    * spread over salts× more keys; phase 2 shuffles only survivors. The salt
    * is id-derived (not round-robin), so retries re-bucket identically.
    */
  def stratifiedCap(df: DataFrame, idCol: String, stratumCol: String,
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
}
