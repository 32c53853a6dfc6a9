package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level helper functions shared across operators. All are composed
  * from codegen'd `org.apache.spark.sql.functions` builtins — no UDFs — so
  * every operator stays inside whole-stage codegen.
  */
object GraftFunctions {

  /** Deterministic, engine-portable 56-bit hash of a string: the first 14 hex
    * digits of md5, as a non-negative Long. Used by MinHash/SimHash/LSH so
    * that results are reproducible across engines (the same value is
    * computable in any SQL dialect with md5 + hex→int conversion).
    */
  def portableHash56(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 14), 16, 10).cast(LongType)

  /** Mersenne prime 2^31-1; universal-hash family h(x) = (a*x + b) mod P over
    * the 56-bit portable hash reduced mod P (keeps a*x within Long range).
    */
  val HashPrime: Long = 2147483647L

  def universalHash(h: Column, a: Long, b: Long): Column =
    (lit(a) * (h % HashPrime) + lit(b)) % HashPrime

  /** Deterministic (a_i, b_i) parameter streams for the universal-hash family
    * — LCG-generated from a fixed seed so both the engine and any oracle can
    * reproduce them.
    */
  def hashParams(n: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    var s = seed
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); (s >>> 33) % (HashPrime - 1) }
    Seq.fill(n)((next() + 1, next()))
  }

  /** Whitespace tokenization with Polars/DuckDB-compatible edge semantics:
    * empty or all-whitespace text → empty array (Spark's split would give
    * [""]).
    */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast(ArrayType(StringType)))
      .otherwise(split(trim(text), "\\s+"))

  /** Word n-gram shingles as space-joined strings: one entry per window of
    * `n` consecutive tokens. Documents shorter than n words → empty array.
    *
    * Linear-time construction: every reference to the token array is in
    * ARGUMENT position (`zip_with`/`slice` operands, evaluated once per row),
    * never inside a per-element lambda body — a `slice(tokens(text), i, n)`
    * lambda re-tokenizes per window (O(words²) per doc; bit us in round 1).
    * Fold step k zips the (k-1)-gram array with the tokens shifted by k-1;
    * `concat` null-propagates past the end, and the final `filter` drops the
    * null tail, leaving exactly size-n+1 shingles.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val ws = tokens(text)
    if (n <= 1) ws
    else {
      val joined = (2 to n).foldLeft(ws) { (acc, k) =>
        zip_with(acc, slice(ws, lit(k), greatest(size(ws) - (k - 1), lit(0))),
          (a, b) => concat(a, lit(" "), b))
      }
      filter(joined, s => s.isNotNull)
    }
  }

  /** Vector math on array columns: native Catalyst expressions with tight
    * codegen loops (graft.plans.VectorExpressions) — the higher-order
    * `zip_with`+`aggregate` composition is semantically identical but pays a
    * per-element lambda frame, which dominates knn/dedup at scale.
    */
  def dot(a: Column, b: Column): Column = graft.plans.VectorExpressions.dot(a, b)

  def norm(a: Column): Column = graft.plans.VectorExpressions.l2norm(a)

  def cosine(a: Column, b: Column): Column = graft.plans.VectorExpressions.cosine(a, b)

  /** Reference implementation of [[dot]] via higher-order functions; kept for
    * cross-checking the native expression in tests.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** Right-bisect (numpy searchsorted side="right"): number of endpoints
    * <= value. Reference: bin_numeric_values.py:185.
    */
  def searchSortedRight(endpoints: Column, value: Column): Column =
    size(filter(endpoints, e => e <= value))

  /** Skew-safe exact distinct count: salt by a hash of the DISTINCT column so
    * each salt partition holds a disjoint value set, count-distinct within
    * (group, salt), then sum partials per group. For heavy-hitter group keys
    * (one code holding half the corpus) this bounds any single task to
    * 1/salts of the hot group where a plain `countDistinct` funnels the whole
    * group through one task's expand/aggregate.
    */
  def skewSafeDistinctCount(df: DataFrame, groupKeys: Seq[String], distinctCol: String,
      salts: Int = 64, outName: String = "n_distinct"): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(col(distinctCol)), lit(salts)))
    salted.groupBy((groupKeys :+ "__salt").map(col): _*)
      .agg(count_distinct(col(distinctCol)).as("__partial"))
      .groupBy(groupKeys.map(col): _*)
      .agg(sum(col("__partial")).as(outName))
  }

  /** Scalable global row number (1-based): the distributed equivalent of
    * `row_number().over(Window.orderBy(sortCols))`, which funnels EVERY row
    * through a single partition (WindowExec warns; a non-starter at 100 TB).
    *
    * Shape: range-partition by the sort keys (equal keys land in one
    * partition, partitions are globally ordered), sort within partitions,
    * read the per-partition record index out of `monotonically_increasing_id`
    * (upper bits = partition id, lower 33 = record number in row order — so
    * no Window exchange is needed at all), then add per-partition row-count
    * offsets via a broadcast join.
    *
    * The ranged-and-numbered frame is materialized ONCE via an eager
    * localCheckpoint before the offsets pass and the numbering pass read it,
    * because two executions of a range shuffle are NOT bit-identical:
    * RangePartitioner's sample seed incorporates the RDD id, and AQE may
    * coalesce each consumer's shuffle read differently — either way the
    * partition ids baked into monotonically_increasing_id disagree between
    * passes and rows get mis-numbered or dropped (both variants were
    * observed at sf0.1). localCheckpoint truncates lineage to the
    * materialized blocks (both passes read THE SAME partitions), and unlike
    * an engine-internal cache the blocks are released by the ContextCleaner
    * once the returned frame is garbage-collected — no session-lifetime
    * leak. Trade-off: localCheckpoint is not fault-tolerant to executor
    * loss mid-query (Spark recomputes from nothing); acceptable for a
    * deterministic batch operator that simply re-runs.
    */
  def withGlobalRowNumber(df: DataFrame, outCol: String, sortCols: Seq[Column]): DataFrame = {
    val mask = (1L << 33) - 1
    val ranged = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint()
    val counts = ranged
      .groupBy(shiftright(col("__mid"), 33).as("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, cnt) => val o = acc; acc += cnt; (pid, o) }
    val offsetsDf = df.sparkSession.createDataFrame(offsets.toSeq).toDF("__pid", "__offset")
    ranged
      .join(broadcast(offsetsDf), shiftright(col("__mid"), 33) === col("__pid"))
      .withColumn(outCol, col("__mid").bitwiseAND(lit(mask)) + col("__offset") + 1)
      .drop("__mid", "__pid", "__offset")
  }

  /** Polars `shrink_dtype` analog (reducer.py:217, fit_vocabulary_indices
    * .py:195): cast integer columns to the narrowest integral type that holds
    * their observed min/max. Requires one extra aggregation pass, so it is
    * applied only to small reduced metadata outputs, never the event table.
    */
  def shrinkIntColumns(df: DataFrame, columns: Seq[String]): DataFrame = {
    val present = columns.filter(df.columns.contains)
    if (present.isEmpty) return df
    val aggs = present.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    present.foldLeft(df) { (d, c) =>
      val lo = Option(row.getAs[Any](s"min_$c")).map(_.toString.toLong).getOrElse(0L)
      val hi = Option(row.getAs[Any](s"max_$c")).map(_.toString.toLong).getOrElse(0L)
      val t: DataType =
        if (lo >= Byte.MinValue && hi <= Byte.MaxValue) ByteType
        else if (lo >= Short.MinValue && hi <= Short.MaxValue) ShortType
        else if (lo >= Int.MinValue && hi <= Int.MaxValue) IntegerType
        else LongType
      d.withColumn(c, col(c).cast(t))
    }
  }
}
