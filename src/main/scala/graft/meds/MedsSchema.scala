package graft.meds

import org.apache.spark.sql.types._

/** Column-name and schema constants for the MEDS (Medical Event Data Standard)
  * data model re-expressed for Spark.
  *
  * The reference data model (see /root/reference/src/MEDS_transforms/mapreduce/stage.py:64-101
  * and stages/extract_values/extract_values.py:16-23) is a flat event table:
  * one row per measurement, keyed by (subject_id, time), with nullable time
  * (null => "static" event) and nullable numeric_value (NaN treated as absent).
  */
object MedsSchema {
  val SubjectId = "subject_id"
  val Time = "time"
  val Code = "code"
  val NumericValue = "numeric_value"
  val TextValue = "text_value"
  val CategoricalValue = "categorical_value"

  /** Engine-wide stable-order bookkeeping column. Spark sorts are not stable
    * (unlike Polars' maintain_order=True), so every operator that must
    * preserve or restore input row order materializes this column.
    */
  val RowIdx = "__row_idx"

  /** Match-revise block precedence column (see operators.MatchRevise). */
  val BlockIdx = "__block_idx"

  val Split = "split"
  val Shard = "shard"

  /** Mandatory MEDS data-column types (extract_values.py:16-23). */
  val mandatoryTypes: Map[String, DataType] = Map(
    SubjectId -> LongType,
    Time -> TimestampType,
    Code -> StringType,
    NumericValue -> FloatType,
    TextValue -> StringType,
    CategoricalValue -> StringType
  )

  val dataSchema: StructType = StructType(Seq(
    StructField(SubjectId, LongType, nullable = false),
    StructField(Time, TimestampType, nullable = true),
    StructField(Code, StringType, nullable = false),
    StructField(NumericValue, FloatType, nullable = true)
  ))

  // metadata/codes.parquet column names (aggregate_code_metadata.py:791-808)
  val Description = "description"
  val ParentCodes = "parent_codes"
  val CodeNSubjects = "code/n_subjects"
  val CodeNOccurrences = "code/n_occurrences"
  val ValuesNSubjects = "values/n_subjects"
  val ValuesNOccurrences = "values/n_occurrences"
  val ValuesNInts = "values/n_ints"
  val ValuesSum = "values/sum"
  val ValuesSumSqd = "values/sum_sqd"
  val ValuesMin = "values/min"
  val ValuesMax = "values/max"
  val ValuesQuantiles = "values/quantiles"
  val ValuesMean = "values/mean"
  val ValuesStd = "values/std"
  val VocabIndex = "code/vocab_index"
  val IsInlier = "numeric_value/is_inlier"

  val codesSchema: StructType = StructType(Seq(
    StructField(Code, StringType, nullable = false),
    StructField(Description, StringType, nullable = true),
    StructField(ParentCodes, ArrayType(StringType), nullable = true)
  ))

  val splitsSchema: StructType = StructType(Seq(
    StructField(SubjectId, LongType, nullable = false),
    StructField(Split, StringType, nullable = false)
  ))

  val TrainSplit = "train"
  val TuningSplit = "tuning"
  val HeldOutSplit = "held_out"
}
