package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.meds.MedsSchema._

/** `normalization` (reference:
  * /root/reference/src/MEDS_transforms/stages/normalization/normalization.py:180-225).
  *
  * Inner-joins the code metadata on (code + modifiers) with NULL-EQUAL join
  * keys (Polars `nulls_equal=True`, normalization.py:214 → Spark's `<=>`),
  * replaces the string `code` with the integer `code/vocab_index`, z-scores
  * `numeric_value` to float32, drops non-matching rows and extra columns, and
  * restores the original row order via the engine-wide `__row_idx` column
  * (Polars preserves left order in joins; Spark does not, so order is data,
  * not an execution accident).
  */
object Normalization {
  def apply(data: DataFrame, codes: DataFrame, codeModifiers: Seq[String] = Nil,
      valueType: org.apache.spark.sql.types.DataType = org.apache.spark.sql.types.FloatType): DataFrame = {
    val keys = Code +: codeModifiers
    val hasPre = codes.columns.contains(ValuesMean) && codes.columns.contains(ValuesStd)
    // try_divide: ANSI-safe for codes with zero present values
    val derivedMean = try_divide(codes(ValuesSum), codes(ValuesNOccurrences))
    val meta = codes.select((keys.map(codes(_)) :+ codes(VocabIndex).as("__vocab") :+
      (if (hasPre) codes(ValuesMean) else derivedMean).as("__mean") :+
      (if (hasPre) codes(ValuesStd)
       else sqrt(try_divide(codes(ValuesSumSqd), codes(ValuesNOccurrences)) -
         pow(derivedMean, 2))).as("__std")): _*)
    val withIdx =
      if (data.columns.contains(RowIdx)) data
      else data.withColumn(RowIdx, monotonically_increasing_id())
    // explicit aliases: when codes derive from the same scan as data (the
    // usual pipeline), unaliased refs collapse to one attribute (self-join
    // lineage) and the join condition degenerates
    val d = withIdx.alias("__norm_d")
    val m = meta.alias("__norm_m")
    val cond = keys.map(k => col(s"__norm_d.$k") <=> col(s"__norm_m.$k")).reduce(_ && _)
    val keep = withIdx.columns.filterNot(keys.contains).filterNot(_ == NumericValue)
    // zero-variance codes: the reference's float arithmetic yields ±inf
    // (v != mean) or NaN (v == mean); a bare `/` would throw DIVIDE_BY_ZERO
    // under Spark 4's ANSI default instead, and try_divide alone would
    // silently null them — reproduce the reference values explicitly
    val diff = col(s"__norm_d.$NumericValue") - col("__norm_m.__mean")
    val z = when(col("__norm_m.__std") === 0.0 && diff.isNotNull,
        when(diff > 0, lit(Double.PositiveInfinity))
          .when(diff < 0, lit(Double.NegativeInfinity))
          .otherwise(lit(Double.NaN)))
      .otherwise(try_divide(diff, col("__norm_m.__std")))
    d.join(broadcast(m), cond, "inner")
      .select((keep.map(c => col(s"__norm_d.$c")) :+
        col("__norm_m.__vocab").as(Code) :+
        z.cast(valueType).as(NumericValue)): _*)
      .orderBy(col(RowIdx))
      .drop(RowIdx)
  }
}

/** `reorder_measurements` (reference:
  * /root/reference/src/MEDS_transforms/stages/reorder_measurements/reorder_measurements.py:156-199).
  *
  * Each code gets an order index = position of the first regex in
  * `orderedCodePatterns` it matches (unmatched → N), then rows are stably
  * re-sorted within each (subject, time) block by that index. Polars'
  * maintain_order=True stability is reproduced by the explicit `__row_idx`
  * tiebreaker.
  */
object ReorderMeasurements {
  /** Order index of a code: position of the first matching pattern, else N. */
  def orderIndex(orderedCodePatterns: Seq[String]): org.apache.spark.sql.Column =
    orderedCodePatterns.zipWithIndex
      .foldRight(lit(orderedCodePatterns.length)) { case ((pat, i), acc) =>
        when(col(Code).rlike(pat), lit(i)).otherwise(acc)
      }

  def apply(data: DataFrame, orderedCodePatterns: Seq[String]): DataFrame = {
    val orderIdx = orderIndex(orderedCodePatterns)
    val withIdx =
      if (data.columns.contains(RowIdx)) data
      else data.withColumn(RowIdx, monotonically_increasing_id())
    withIdx
      .withColumn("__order_idx", orderIdx)
      .orderBy(col(SubjectId), col(Time).asc_nulls_first, col("__order_idx"), col(RowIdx))
      .drop("__order_idx", RowIdx)
  }
}
