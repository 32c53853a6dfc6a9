package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — points to containing intervals — the second
  * temporal operator Spark has no native plan for (the naive
  * `ON key = key AND t BETWEEN s AND e` plans as an inequality join that
  * degenerates to per-key cross products). The workhorse of attribution
  * and windowed enrichment: clicks inside purchase-attribution windows,
  * readings inside alarm intervals, events inside sessions.
  *
  * Spark-first shape — GRID BUCKETING: both sides map onto a fixed time
  * grid (`bucketWidth`, in the time column's own unit); intervals explode
  * into the buckets they cover, points take their single bucket, and the
  * match becomes a plain EQUI-join on (key, bucket) + an exact containment
  * filter. One hash shuffle, co-partitioned, AQE-skew-splittable; match
  * cost is proportional to true overlap density, never to per-key row
  * products. The explode is bounded by `maxBucketsPerInterval` — an
  * interval spanning more grid cells than that raises (loudly, per row)
  * rather than silently amplifying the build side; pick `bucketWidth` near
  * the typical interval length so coverage stays O(1) buckets each.
  *
  * Time columns are NUMERIC (epoch micros, seconds, positions — any unit);
  * callers convert timestamps first (`unix_micros`), keeping the grid
  * arithmetic exact and engine-portable. Inner semantics: points with no
  * containing interval (or a null time) emit nothing; a point inside k
  * intervals emits k rows. Degenerate intervals (null bounds, end < start)
  * match nothing.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String], timeCol: String, startCol: String, endCol: String,
      valueCols: Seq[String], bucketWidth: Long,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(keyCols.nonEmpty, "pointInInterval: at least one key column")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    val collide = (valueCols.toSet ++ Set(startCol, endCol))
      .intersect(points.columns.toSet)
    require(collide.isEmpty,
      s"pointInInterval: column(s) ${collide.mkString(", ")} exist on both sides — " +
        "rename the interval bounds/values first")

    // EXACT floor-division on longs via truncating quotient + negative-
    // remainder correction (java.lang.Math.floorDiv's own identity):
    // negative times bucket correctly, no double rounding (a cast-to-double
    // floor misbuckets boundary values beyond 2^53 — epoch NANOS live
    // there), and no overflow anywhere — `t - pmod(t, w)` would wrap below
    // Long.MinValue for t within w of it, while here q-1 can only underflow
    // if q = MinValue, which forces w = 1 and remainder 0 (no correction)
    def bucketOf(t: Column): Column = {
      val tl = t.cast("long")
      val q = org.apache.spark.sql.GraftSqlBridge
        .integralDivide(tl, lit(bucketWidth)) // SQL div: exact, truncating
      when(tl % lit(bucketWidth) < 0, q - 1).otherwise(q)
    }
    val b0 = bucketOf(col(startCol))
    val b1 = bucketOf(col(endCol))
    val iv = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(endCol) >= col(startCol))
      // b1 >= b0 mathematically (end >= start, floor-div monotone), so an
      // overflowed (NULL) try_subtract proves the interval spans around
      // 2^63/bucketWidth buckets — far past any sane cap. try_subtract
      // (NULL, never wrap/throw) routes both overflow and over-cap through
      // the intended per-row error below; a raw `b1 - b0` would ANSI-throw
      // a generic ARITHMETIC_OVERFLOW before the guard could see it (and
      // wrap negative, PASSING the < check, with ANSI off)
      .withColumn("__span", try_add(try_subtract(b1, b0), lit(1L)))
      .withColumn("__b", explode(sequence(b0,
        when(col("__span") <= maxBucketsPerInterval, b1)
          .otherwise(raise_error(concat(
          lit(s"pointInInterval: interval covers more than $maxBucketsPerInterval "),
          lit(s"buckets of width $bucketWidth ("),
          coalesce(col("__span").cast("string"), lit(">= 2^63")),
          lit(") — widen bucketWidth or split the interval")))))))
      .drop("__span")
      .select((keyCols.map(col) :+ col("__b") :+ col(startCol) :+ col(endCol)) ++
        valueCols.filterNot(c => c == startCol || c == endCol).map(col): _*)

    points
      .filter(col(timeCol).isNotNull)
      .withColumn("__b", bucketOf(col(timeCol)))
      .join(iv, keyCols :+ "__b")
      .filter(col(timeCol) >= col(startCol) && col(timeCol) <= col(endCol))
      .select(points.columns.map(col) ++ valueCols.map(col): _*)
  }
}
