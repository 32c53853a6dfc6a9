package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset profiling: one row of summary statistics per column — the
  * first query anyone runs against an unfamiliar 100 TB table, and the
  * standing data-quality report a pipeline emits next to its output
  * (count, null rate, distinct cardinality, numeric range/moments, string
  * lengths).
  *
  * ONE pass over the data: every per-column statistic is an aggregate of
  * the same scan (Catalyst fuses them into a single partial+final
  * HashAggregate — no per-column jobs, no Expand). Distinct counts are
  * exact by default (`approxDistinct = true` switches to HLL for
  * hyper-cardinality columns; exact multi-column count_distinct plans one
  * Expand pass per column, which is the honest cost of exactness — the
  * approx switch is the 100 TB default). The wide single-row aggregate is
  * then unpivoted driver-side into the (column, stats...) shape — a
  * metadata-sized transpose of one collected row.
  */
object Profile {

  /** @param cols columns to profile (default: all)
    * @param approxDistinct use approx_count_distinct instead of exact
    */
  def profile(df: DataFrame, cols: Seq[String] = Nil,
      approxDistinct: Boolean = false): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    names.foreach(c => require(df.columns.contains(c), s"profile: no column `$c`"))
    val spark = df.sparkSession

    def isNumeric(dt: DataType): Boolean = dt match {
      case _: NumericType => true
      case _ => false
    }

    val aggs: Seq[Column] = names.flatMap { c =>
      val dt = df.schema(c).dataType
      val base = Seq(
        count(col(c)).as(s"__${c}__nn"),
        (if (approxDistinct) approx_count_distinct(col(c))
         else count_distinct(col(c))).as(s"__${c}__nd"))
      val typed: Seq[Column] = dt match {
        case t if isNumeric(t) => Seq(
          min(col(c)).cast("double").as(s"__${c}__min"),
          max(col(c)).cast("double").as(s"__${c}__max"),
          avg(col(c)).cast("double").as(s"__${c}__avg"))
        case StringType => Seq(
          min(length(col(c))).cast("double").as(s"__${c}__min"),
          max(length(col(c))).cast("double").as(s"__${c}__max"),
          avg(length(col(c))).cast("double").as(s"__${c}__avg"))
        case TimestampType | TimestampNTZType | DateType => Seq(
          min(col(c)).cast("string").as(s"__${c}__smin"),
          max(col(c)).cast("string").as(s"__${c}__smax"))
        case _ => Nil
      }
      base ++ typed
    }
    val total = count(lit(1)).as("__total")
    val row = df.agg(total, aggs: _*).head()
    val n = row.getAs[Long]("__total")

    def opt[T](k: String): Option[T] = {
      val i = row.fieldIndex(k)
      if (row.isNullAt(i)) None else Some(row.getAs[T](i))
    }
    val out = names.map { c =>
      val dt = df.schema(c).dataType
      val nn = row.getAs[Long](s"__${c}__nn")
      val nd = row.getAs[Long](s"__${c}__nd")
      val hasNum = isNumeric(dt) || dt == StringType
      (c, dt.simpleString, n, n - nn, nd,
        if (hasNum) opt[Double](s"__${c}__min").map(Double.box).orNull else null,
        if (hasNum) opt[Double](s"__${c}__max").map(Double.box).orNull else null,
        if (hasNum) opt[Double](s"__${c}__avg").map(Double.box).orNull else null,
        dt match {
          case TimestampType | TimestampNTZType | DateType =>
            opt[String](s"__${c}__smin").orNull
          case _ => null
        },
        dt match {
          case TimestampType | TimestampNTZType | DateType =>
            opt[String](s"__${c}__smax").orNull
          case _ => null
        })
    }
    import spark.implicits._
    out.toDF("column", "dtype", "n_rows", "n_null", "n_distinct",
      "num_min", "num_max", "num_avg", "time_min", "time_max")
  }
}
