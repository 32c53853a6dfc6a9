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
  /** Native expression (graft.plans.Hash56): first 7 md5-digest bytes read
    * big-endian — bit-identical to the composable definition every oracle
    * mirrors, `conv(substring(md5(s), 1, 14), 16, 10)::long`, without the
    * per-value hex materialization + radix parse.
    */
  def portableHash56(c: Column): Column =
    graft.plans.VectorExpressions.hash56(c.cast("string"))

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
    * empty or all-whitespace text -> empty array, and ALL whitespace - not
    * just spaces - counts as an edge. NOT trim+split: Spark's one-arg
    * `trim` strips spaces only (newline/tab-edged text would emit empty
    * tokens), and the multi-char trim variant measured ~30% slower on the
    * shingle-hash hot path (BenchOne, winnow 0.39 vs 0.52+). `split` keeps
    * edge separators as "" elements; one codegen'd `array_remove` pass
    * drops them, which also covers the empty/all-whitespace cases for
    * free.
    */
  def tokens(text: Column): Column = array_remove(split(text, "\\s+"), "")

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
    * offsets via a constant-folded map-literal lookup (broadcast join only
    * past 4096 partitions, where the literal would bloat the expression
    * tree). The counts come out of the materialization job itself — see
    * GraftSqlBridge.localCheckpointWithPartitionCounts — so the blocks are
    * scanned once, not twice.
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
    // ONE job materializes the blocks AND reads off per-partition counts
    // (the counts job over the blocks that used to follow the eager
    // checkpoint was a second full scan — ~30% of the operator)
    val (checkpointed, counts) =
      org.apache.spark.sql.GraftSqlBridge.localCheckpointWithPartitionCounts(ranged)
    var acc = 0L
    val offsets = counts.map { case (pid, cnt) => val o = acc; acc += cnt; (pid.toLong, o) }
    if (offsets.length <= MapLiteralMaxEntries) {
      // constant-folded map literal: offset lookup is a pure projection —
      // no BroadcastExchange, no join operator in the plan
      val kv = offsets.flatMap { case (p, o) => Seq(lit(p), lit(o)) }
      checkpointed
        .withColumn(outCol, col("__mid").bitwiseAND(lit(mask))
          + element_at(map(kv.toIndexedSeq: _*), shiftright(col("__mid"), 33)) + 1)
        .drop("__mid")
    } else {
      // GetMapValue over a literal map is a per-row LINEAR key scan, so past
      // a few hundred partitions the O(1) broadcast-hash probe wins
      val offsetsDf = df.sparkSession.createDataFrame(offsets.toSeq).toDF("__pid", "__offset")
      checkpointed
        .join(broadcast(offsetsDf), shiftright(col("__mid"), 33) === col("__pid"))
        .withColumn(outCol, col("__mid").bitwiseAND(lit(mask)) + col("__offset") + 1)
        .drop("__mid", "__pid", "__offset")
    }
  }

  /** Offset-lookup strategy bound: element_at on a literal map compiles to
    * GetMapValue — a per-row linear key scan, not a hash lookup — so the
    * map-literal projection only beats a broadcast-hash join while the
    * partition count is small.
    */
  private val MapLiteralMaxEntries = 256

  /** Scalable global row number, keyed variant: same contract as
    * [[withGlobalRowNumber]] but REQUIRES `bucketKey` to be a numeric
    * expression equal to the leading sort column (ascending, nulls first).
    * That restriction buys a fundamentally cheaper plan: bucket boundaries
    * are collected ONCE as literals (approxQuantile over the key), so the
    * bucket id is a pure function of row values — two executions of the
    * plan agree by construction, which is exactly the property a range
    * shuffle lacks (RangePartitioner reseeds per RDD id; AQE coalesces per
    * consumer) and the reason the generic variant must pay an eager
    * localCheckpoint. Here nothing is materialized: one pass computes exact
    * per-bucket counts (map-side combined — only bucket partials shuffle),
    * the offsets broadcast back, and the main pass runs one hash shuffle on
    * the bucket id with a streaming row_number window per bucket. Also
    * fault-tolerant: with no checkpointed blocks, executor loss just
    * recomputes lineage.
    *
    * Bucket count follows spark.sql.shuffle.partitions; quantile bounds keep
    * buckets balanced under key skew (heavily duplicated keys collapse
    * bounds, never split a key across buckets — equal keys always share a
    * bucket, so ordering by the remaining sort columns stays within one
    * window partition).
    */
  def withGlobalRowNumberKeyed(df: DataFrame, outCol: String, bucketKey: Column,
      sortCols: Seq[Column], numBuckets: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numBuckets > 0) numBuckets
      else spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val keyed = df.withColumn("__bk", bucketKey.cast("double"))
    val bounds =
      if (n <= 1) Array.empty[Double]
      else keyed.stat.approxQuantile("__bk",
        (1 until n).map(_.toDouble / n).toArray, 0.001).distinct.sorted
    // pure-function bucket id: number of bounds strictly below the key.
    // Nulls compare to null -> dropped by filter -> bucket 0 (nulls first).
    val pid =
      if (bounds.isEmpty) lit(0)
      else size(filter(array(bounds.map(lit(_)): _*), b => col("__bk") > b))
    val withPid = keyed.withColumn("__pid", pid)
    // exact counts; deterministic because __pid is value-derived
    val counts = withPid.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (p, cnt) => val o = acc; acc += cnt; (p, o) }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(sortCols: _*)
    val numbered = withPid.withColumn("__rn", row_number().over(w).cast(LongType))
    val out =
      if (offsets.isEmpty) // empty input: map() would be a typeless literal
        numbered.withColumn(outCol, col("__rn"))
      else if (offsets.length <= MapLiteralMaxEntries) {
        // constant-folded map literal — the offset lookup is a pure projection
        val kv = offsets.flatMap { case (p, o) => Seq(lit(p), lit(o)) }
        numbered.withColumn(outCol,
          col("__rn") + element_at(map(kv.toIndexedSeq: _*), col("__pid")))
      } else {
        val offsetsDf = spark.createDataFrame(offsets.toSeq).toDF("__pid", "__offset")
        numbered.join(broadcast(offsetsDf), Seq("__pid"))
          .withColumn(outCol, col("__rn") + col("__offset"))
          .drop("__offset")
      }
    out.drop("__bk", "__pid", "__rn")
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
