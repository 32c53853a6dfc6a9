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
    val meta = {
      val base = codes.select((keys.map(codes(_)) :+ codes(VocabIndex).as("__vocab") :+
        (if (hasPre) codes(ValuesMean) else (codes(ValuesSum) / codes(ValuesNOccurrences))).as("__mean") :+
        (if (hasPre) codes(ValuesStd)
         else sqrt(codes(ValuesSumSqd) / codes(ValuesNOccurrences) -
           pow(codes(ValuesSum) / codes(ValuesNOccurrences), 2))).as("__std")): _*)
      base
    }
    val withIdx =
      if (data.columns.contains(RowIdx)) data
      else data.withColumn(RowIdx, monotonically_increasing_id())
    val cond = keys.map(k => withIdx(k) <=> meta(k)).reduce(_ && _)
    val keep = withIdx.columns.filterNot(keys.contains).filterNot(_ == NumericValue)
    withIdx.join(broadcast(meta), cond, "inner")
      .select((keep.map(withIdx(_)) :+
        meta("__vocab").as(Code) :+
        ((withIdx(NumericValue) - meta("__mean")) / meta("__std")).cast(valueType).as(NumericValue)): _*)
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
