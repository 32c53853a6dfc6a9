package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.meds.MedsSchema._

/** `filter_subjects` (reference:
  * /root/reference/src/MEDS_transforms/stages/filter_subjects/filter_subjects.py:15-263).
  *
  * Drops all rows of subjects with fewer than N *measurements* (rows with
  * non-null time) and/or fewer than N *events* (distinct non-null times).
  *
  * Scale note: implemented as a per-subject aggregate + semi-join rather than
  * a `collect_set(...).over(subject)` window — the window would materialize a
  * distinct-set per row; the aggregate form map-side combines and shuffles
  * only (subject, counts). When the data is already hash-partitioned by
  * subject (the MEDS layout invariant), both the aggregate and the join
  * reuse that partitioning and no extra shuffle occurs.
  */
object FilterSubjects {
  def apply(
      data: DataFrame,
      minMeasurementsPerSubject: Option[Int] = None,
      minEventsPerSubject: Option[Int] = None): DataFrame = {
    if (minMeasurementsPerSubject.isEmpty && minEventsPerSubject.isEmpty) return data
    val stats = data.groupBy(SubjectId).agg(
      count(col(Time)).as("__n_measurements"), // count skips nulls in both engines
      // Polars n_unique counts null as ONE distinct event (doctest: times
      // [null, null, t1, t2, t3] survive min_events=4); Spark count_distinct
      // skips it, so add the has-null indicator
      (count_distinct(col(Time)) +
        max(when(col(Time).isNull, 1).otherwise(0))).as("__n_events"))
    val keep = stats.filter(
      minMeasurementsPerSubject.map(n => col("__n_measurements") >= n).getOrElse(lit(true)) &&
        minEventsPerSubject.map(n => col("__n_events") >= n).getOrElse(lit(true)))
    data.join(keep.select(SubjectId), Seq(SubjectId), "left_semi")
  }
}

/** `filter_measurements` (reference:
  * /root/reference/src/MEDS_transforms/stages/filter_measurements/filter_measurements.py:135-168).
  *
  * Keeps rows whose (code + modifiers) pass `min_subjects_per_code` /
  * `min_occurrences_per_code` thresholds looked up in the code-metadata
  * table. The allowed-codes side is metadata-sized → broadcast left-semi
  * join, so the 100 TB event table never shuffles.
  */
object FilterMeasurements {
  def apply(
      data: DataFrame,
      codes: DataFrame,
      minSubjectsPerCode: Option[Int] = None,
      minOccurrencesPerCode: Option[Int] = None,
      codeModifiers: Seq[String] = Nil): DataFrame = {
    if (minSubjectsPerCode.isEmpty && minOccurrencesPerCode.isEmpty) return data
    val keys = Code +: codeModifiers
    val allowed = codes.filter(
      minSubjectsPerCode.map(n => col(CodeNSubjects) >= n).getOrElse(lit(true)) &&
        minOccurrencesPerCode.map(n => col(CodeNOccurrences) >= n).getOrElse(lit(true)))
      .select(keys.map(col): _*)
    data.join(broadcast(allowed), keys, "left_semi")
  }
}

/** `occlude_outliers` (reference:
  * /root/reference/src/MEDS_transforms/stages/occlude_outliers/occlude_outliers.py:78-116).
  *
  * Nulls out `numeric_value` when |x − μ| > cutoff·σ for its code, and adds a
  * `numeric_value/is_inlier` boolean flag (null where no value). μ/σ come
  * from the code metadata — either precomputed `values/mean`/`values/std` or
  * derived from sum / sum_sqd / n (population std, occlude_outliers.py:90-95).
  */
object OccludeOutliers {
  def apply(
      data: DataFrame,
      codes: DataFrame,
      stddevCutoff: Double = 4.5,
      codeModifiers: Seq[String] = Nil): DataFrame = {
    val keys = Code +: codeModifiers
    val hasPre = codes.columns.contains(ValuesMean) && codes.columns.contains(ValuesStd)
    val stats =
      if (hasPre) codes.select((keys.map(col) :+ col(ValuesMean).as("__mean") :+ col(ValuesStd).as("__std")): _*)
      else {
        // try_divide: codes with zero present values have nothing to occlude;
        // ANSI mode (Spark 4 default) would otherwise throw DIVIDE_BY_ZERO
        val mean = try_divide(col(ValuesSum), col(ValuesNOccurrences))
        codes.select((keys.map(col) :+ mean.as("__mean") :+
          sqrt(try_divide(col(ValuesSumSqd), col(ValuesNOccurrences)) - pow(mean, 2)).as("__std")): _*)
      }
    val joined = data.join(broadcast(stats), keys, "left")
    // Raw three-valued comparison, matching occlude_outliers.py:104-109: when
    // the code has no stats (join miss) or the value is null, is_inlier is
    // NULL — not false — and when(is_inlier, v) still nulls the value.
    // A NaN std (float rounding makes a near-constant code's derived variance
    // slightly negative) must occlude EVERYTHING like the reference's IEEE
    // comparison — Spark orders NaN greater than all values, which would
    // instead keep everything.
    val raw = abs(col(NumericValue) - col("__mean")) <= lit(stddevCutoff) * col("__std")
    // null-value rows stay NULL even under a NaN std — the reference's
    // three-valued semantics take precedence over the occlude-everything rule
    val inlier = when(col(NumericValue).isNull, lit(null).cast("boolean"))
      .when(isnan(col("__std")), lit(false)).otherwise(raw)
    joined
      .withColumn(IsInlier, inlier)
      .withColumn(NumericValue, when(col(IsInlier), col(NumericValue)))
      .drop("__mean", "__std")
  }
}
