package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing time-range aggregates (RANGE frame: every row sees the
  * aggregate of its key's rows within `[t − range, t]`) — the rolling
  * feature-engineering primitive (trailing counts/sums/rates per user,
  * host, session).
  *
  * [[trailing]] is the native RANGE-frame window: one shuffle on the key,
  * exact frame arithmetic. Like every per-key timeline op, a pathological
  * key holding most of the corpus serializes its own sort —
  * [[trailingSliced]] closes that (the last member of the r8-documented
  * hot-key category, after the as-of carry): a monotone time grid with
  * slice width ≥ `range`, each row windowed inside (key, slice) and GHOSTED
  * into the successor slice when its trailing window can reach it. A ghost
  * participates in frames but emits no row. Over-inclusion is free — the
  * RANGE frame filters on exact time — so the ghost condition carries
  * slack against double rounding; only under-inclusion could corrupt a
  * frame, and the slack plus width ≥ range (a row's window spans at most
  * its own and the previous slice) rule it out.
  */
object RollingAgg {

  /** @param aggs (outputName, aggregate expression) pairs — the expression
    *             is attached to the trailing window via `.over`
    * @param range trailing window size in the time column's own units;
    *              the time column must be numeric (convert timestamps with
    *              `unix_micros` first — the RANGE frame needs exact integer
    *              arithmetic, not a cast)
    */
  def trailing(df: DataFrame, keyCols: Seq[String], timeCol: String,
      range: Long, aggs: Seq[(String, Column)]): DataFrame = {
    require(keyCols.nonEmpty, "trailing: at least one key column")
    require(range >= 0, s"trailing: range must be >= 0, got $range")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(timeCol))
      .rangeBetween(-range, 0)
    aggs.foldLeft(df) { case (d, (n, a)) => d.withColumn(n, a.over(w)) }
  }

  /** Hot-key-hardened [[trailing]]: identical results, `numSlices`-way
    * parallelism within a key. Null-time rows form their own grid cell
    * (slice −1) exactly as they form one peer group in the plain window.
    */
  def trailingSliced(df: DataFrame, keyCols: Seq[String], timeCol: String,
      range: Long, aggs: Seq[(String, Column)],
      numSlices: Int = 64): DataFrame = {
    require(keyCols.nonEmpty, "trailingSliced: at least one key column")
    require(range >= 0, s"trailingSliced: range must be >= 0, got $range")
    require(numSlices >= 1,
      s"trailingSliced: numSlices must be >= 1, got $numSlices")
    require(df.schema(timeCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"trailingSliced: $timeCol must be numeric (unix_micros a timestamp " +
        "first) — the grid and the RANGE frame need exact arithmetic")

    val b = df.agg(min(col(timeCol).cast("double")),
      max(col(timeCol).cast("double"))).head()
    if (b.isNullAt(0)) // no timed rows: one degenerate cell, plain window
      return trailing(df, keyCols, timeCol, range, aggs)
    val lo = b.getDouble(0)
    // width ≥ range: a trailing window spans at most the previous slice
    val width = math.max(math.max((b.getDouble(1) - lo) / numSlices,
      range.toDouble), java.lang.Double.MIN_NORMAL)
    val effSlices = math.max(1,
      math.min(numSlices.toLong, math.ceil((b.getDouble(1) - lo) / width).toLong))

    val unclamped = floor((col(timeCol).cast("double") - lit(lo)) / lit(width))
    val sliceOf = when(col(timeCol).isNull, lit(-1L))
      .otherwise(least(unclamped, lit(effSlices - 1)))
    val native = df.withColumn("__slice", sliceOf)
      .withColumn("__ghost", lit(false))
    // ghost a row into its successor slice when a row there could look back
    // at it: t ≥ nextSliceStart − range, with slack (over-inclusion is
    // filtered exactly by the frame; under-inclusion would corrupt it)
    val slack = lit(math.max(math.ulp(math.abs(b.getDouble(1)) + width) * 4, 1e-6))
    val ghosts = df
      .filter(col(timeCol).isNotNull)
      .withColumn("__slice", unclamped + 1)
      .filter(col("__slice") <= lit(effSlices - 1) &&
        col(timeCol).cast("double") >=
          lit(lo) + col("__slice") * lit(width) - lit(range.toDouble) - slack)
      .withColumn("__ghost", lit(true))

    val w = Window.partitionBy((keyCols.map(col) :+ col("__slice")): _*)
      .orderBy(col(timeCol)).rangeBetween(-range, 0)
    aggs.foldLeft(native.unionByName(ghosts)) {
      case (d, (n, a)) => d.withColumn(n, a.over(w))
    }
      .filter(!col("__ghost"))
      .drop("__slice", "__ghost")
  }
}
