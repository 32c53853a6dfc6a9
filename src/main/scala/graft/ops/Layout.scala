package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-column data skipping.
  *
  * At 100 TB the scan cost of a query is set by how many parquet files its
  * predicates can SKIP via footer min/max stats. Sorting by one column gives
  * perfect skipping on that column and none on any other; interleaving the
  * bits of several columns' ranks (the Z-order curve) gives every interleaved
  * column tight per-file ranges, so predicates on ANY of them prune files.
  * The layout is a pure expression + one range-partitioned sort — no custom
  * writer, no table format dependency: plain parquet footers carry the stats.
  *
  * All-integer, engine-portable arithmetic: ranks are scaled to `bits`-bit
  * integers and interleaved with the classic shift-mask spread (each step a
  * codegen'd bitwise op). 2 or 3 columns, ≤ 16 bits each — 3×16 = 48 result
  * bits, comfortably inside a signed long.
  */
object Layout {

  /** Spread the low 16 bits of `x` so consecutive bits land `gap` apart
    * (gap = 2 for 2-column interleave, 3 for 3-column). Magic-mask ladder —
    * each step doubles the spacing; constants are the standard Morton masks
    * widened to 64-bit.
    */
  private def spread2(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = (a.bitwiseOR(shiftleft(a, 8))).bitwiseAND(lit(0x00FF00FFL))
    val c = (b.bitwiseOR(shiftleft(b, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val d = (c.bitwiseOR(shiftleft(c, 2))).bitwiseAND(lit(0x33333333L))
    (d.bitwiseOR(shiftleft(d, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 3-way spread: bit k lands at position 3k (the standard 64-bit Morton
    * "split-by-3" ladder, good to 21 input bits — we feed ≤ 16).
    */
  private def spread3(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = (a.bitwiseOR(shiftleft(a, 32))).bitwiseAND(lit(0x001F00000000FFFFL))
    val c = (b.bitwiseOR(shiftleft(b, 16))).bitwiseAND(lit(0x001F0000FF0000FFL))
    val d = (c.bitwiseOR(shiftleft(c, 8))).bitwiseAND(lit(0x100F00F00F00F00FL))
    val e = (d.bitwiseOR(shiftleft(d, 4))).bitwiseAND(lit(0x10C30C30C30C30C3L))
    (e.bitwiseOR(shiftleft(e, 2))).bitwiseAND(lit(0x1249249249249249L))
  }

  /** Interleave 2 or 3 pre-scaled ranks (each already in [0, 2^bits)) into
    * one Z-value. Null ranks sort FIRST (z = −1): a null key cannot claim a
    * curve position without biasing the interleave, and grouping nulls into
    * the leading files keeps their stats tight too.
    */
  def zValue(ranks: Seq[Column], bits: Int = 16): Column = {
    require(ranks.size == 2 || ranks.size == 3,
      s"zValue interleaves 2 or 3 columns, got ${ranks.size}")
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    val anyNull = ranks.map(_.isNull).reduce(_ || _)
    val spreadFn: Column => Column =
      if (ranks.size == 2) spread2 else spread3
    val z = ranks.zipWithIndex.map { case (r, i) =>
      shiftleft(spreadFn(r.cast("long")), i)
    }.reduce(_ bitwiseOR _)
    when(anyNull, lit(-1L)).otherwise(z)
  }

  /** Per-column linear scaling of a numeric/timestamp column into
    * [0, 2^bits): (v − min) · (2^bits − 1) / (max − min), computed against
    * the column's own observed range. The range comes from `stats` — a
    * 1-row frame of `<c>_min`/`<c>_max` doubles (see [[rangeStats]]);
    * broadcast, so scaling adds no shuffle.
    */
  def scaleToBits(v: Column, minV: Column, maxV: Column, bits: Int): Column = {
    val span = maxV - minV
    val unit = (v.cast("double") - minV) / when(span === 0, lit(1.0)).otherwise(span)
    least(greatest(floor(unit * ((1L << bits) - 1)), lit(0L)),
      lit((1L << bits) - 1)).cast("long")
  }

  /** One metadata-sized pass: min/max of each layout column, as a 1-row
    * frame (`<c>_min`, `<c>_max` doubles).
    */
  def rangeStats(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(
      cols.flatMap(c => Seq(
        min(col(c)).cast("double").as(s"${c}_min"),
        max(col(c)).cast("double").as(s"${c}_max"))).head,
      cols.flatMap(c => Seq(
        min(col(c)).cast("double").as(s"${c}_min"),
        max(col(c)).cast("double").as(s"${c}_max"))).tail: _*)

  /** Z-order `df` by `cols` (2 or 3 numeric/timestamp columns): append the
    * interleaved `__z` value, range-partition on it into `numFiles` ranges,
    * and sort each partition by it — `write.parquet` then emits one file
    * per range whose footer min/max is tight on EVERY layout column.
    *
    * Cost: one metadata agg (the range stats) + one range-exchange + sort —
    * the same shuffle count as a plain global sort, buying skipping on all
    * the columns instead of one. The appended `__z` column is kept so
    * writers can also use it as a bucketing/sort key; drop it after write
    * if undesired.
    */
  def zOrderBy(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 16): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val stats = rangeStats(df, cols)
    val withStats = df.crossJoin(broadcast(stats))
    val ranks = cols.map(c =>
      scaleToBits(col(c), col(s"${c}_min"), col(s"${c}_max"), bits))
    withStats
      .withColumn("__z", zValue(ranks, bits))
      .drop(cols.flatMap(c => Seq(s"${c}_min", s"${c}_max")): _*)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
  }

  /** Hash-bucketed table layout: pay the shuffle ONCE at write time so that
    * every later equi-join or aggregation on the bucket key is
    * exchange-free — Spark's scan reports `HashPartitioning(bucketCols,
    * numBuckets)` as its output partitioning (plus output ordering when
    * `sortCols` are given), and Catalyst drops the Exchange (and the Sort,
    * for sort-merge joins) on both sides. This is THE layout for the
    * 100 TB fact tables a pipeline joins repeatedly on the same key
    * (events by subject, documents by doc hash): the join cost collapses
    * from corpus-shuffle-per-run to a per-bucket local merge.
    *
    * Both sides of a co-located join must agree on the bucket count (or
    * differ by an integer factor with bucket coalescing enabled) — keep a
    * single count per key domain. Bucketing rides the table catalog
    * (`saveAsTable`): read back with `spark.table(name)`, not the raw
    * path (a path read sees plain parquet files and re-shuffles).
    * BucketedJoinSpec locks the zero-Exchange plan shape.
    */
  def writeBucketed(df: DataFrame, tableName: String, bucketCols: Seq[String],
      numBuckets: Int, sortCols: Seq[String] = Nil,
      mode: String = "overwrite"): Unit = {
    require(bucketCols.nonEmpty, "writeBucketed: bucketCols must be non-empty")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    // align write partitions with buckets (same murmur3 pmod both sides):
    // each task then owns exactly one bucket, producing ONE file per bucket
    // — without this, every task writes a sliver of every bucket (task ×
    // bucket file explosion at cluster scale) and, worse, a multi-file
    // bucket forfeits the sortBy guarantee, so merge joins re-Sort and the
    // layout's whole point is lost. This is the one shuffle the layout
    // exists to prepay.
    val aligned = df.repartition(numBuckets, bucketCols.map(col): _*)
    val w = aligned.write.mode(mode).format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(tableName)
  }
}
