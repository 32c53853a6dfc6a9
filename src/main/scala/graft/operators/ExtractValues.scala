package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dsl.{Cfg, Dsl}
import graft.meds.MedsSchema._

/** `extract_values` (reference:
  * /root/reference/src/MEDS_transforms/stages/extract_values/extract_values.py:106-139).
  *
  * Adds columns computed by the expression DSL from a config of
  * {output_column: column_expression}, validating that every input column the
  * expressions need exists, then force-casting MEDS mandatory columns
  * (numeric_value → float32 etc., type table extract_values.py:16-23).
  */
object ExtractValues {
  def apply(data: DataFrame, exprs: Seq[(String, Cfg)]): DataFrame = {
    val dupOuts = exprs.groupBy(_._1).collect { case (n, es) if es.size > 1 => n }
    require(dupOuts.isEmpty,
      s"extract_values: duplicate output columns ${dupOuts.mkString(", ")}")
    val compiled = exprs.map { case (out, cfg) =>
      val (c, needed) = Dsl.colExpr(cfg)
      val missing = needed -- data.columns.toSet
      require(missing.isEmpty,
        s"extract_values: missing input columns $missing for output $out")
      out -> c
    }
    // one withColumns call: every expression is evaluated against the INPUT
    // frame (Polars with_columns parallel-assignment semantics) — a
    // sequential fold would let an output column shadow an input of a later
    // expression
    val castCompiled = compiled.map { case (out, c) =>
      out -> mandatoryTypes.get(out).map(t => c.cast(t)).getOrElse(c)
    }
    data.withColumns(castCompiled.toMap)
  }
}

/** `bin_numeric_values` (reference:
  * /root/reference/src/MEDS_transforms/stages/bin_numeric_values/bin_numeric_values.py:213-390,393-780).
  *
  * Left-joins per-code bin endpoints (from the metadata quantile struct
  * and/or config-supplied custom bins, custom winning), computes
  * bin index = right-bisect(endpoints, value) via the codegen'd higher-order
  * `filter` function, rewrites `code` with a `{code}//{bin_name}` template
  * where bin names are `_(left,right]`-style labels keyed by endpoints, and
  * optionally nulls the binned values out.
  */
object BinNumericValues {
  import graft.functions.GraftFunctions.searchSortedRight

  /** Available `codeFormat` fields, mirroring BIN_NAME_FMT_EXPRS
    * (bin_numeric_values.py:150-205): {code} original code, {bin} bin index,
    * {left}/{right} bin bounds as strings with -inf/inf fill.
    */
  private val FormatField = """\{(code|bin|left|right)\}""".r

  /** @param binWithColumns metadata struct columns holding bin endpoints, in
    *                    priority order — the first non-null column is used per
    *                    code (`bin_with_columns`, default ["values/quantiles"],
    *                    bin_numeric_values.py:403-414); struct field order
    *                    gives the endpoints least → greatest
    * @param customBins  code → sorted endpoints, overriding every metadata
    *                    column
    * @param dropNumeric if true, binned rows get numeric_value = null
    * @param codeFormat  bin-name template over {code},{bin},{left},{right},
    *                    e.g. the reference default "{code}//value_[{left},{right})"
    */
  def apply(
      data: DataFrame,
      codes: DataFrame,
      binWithColumns: Seq[String] = Seq(ValuesQuantiles),
      customBins: Map[String, Seq[Double]] = Map.empty,
      dropNumeric: Boolean = false,
      codeFormat: String = "{code}//{bin}//{left}//{right}"): DataFrame = {
    // endpoints stay float32: the reference's bin-name bounds are f32 values
    // rendered to strings ("164.68689"), and the bisect compares f32-to-f32
    val structCols = binWithColumns.filter(codes.columns.contains)
    val endpointArrays = structCols.map { c =>
      codes.schema(c).dataType match {
        case st: org.apache.spark.sql.types.StructType =>
          when(col(c).isNotNull,
            array(st.fieldNames.map(f => col(c).getField(f).cast("float")): _*))
        case other => throw new IllegalArgumentException(
          s"bin_with_columns entry $c must be a struct of endpoints, got $other")
      }
    }
    val metaEndpoints = endpointArrays match {
      case Nil => lit(null).cast("array<float>")
      case single :: Nil => single
      case many => coalesce(many: _*)
    }
    val fromQuantiles = codes.select(col(Code), metaEndpoints.as("__endpoints_meta"))
    val custom =
      if (customBins.isEmpty) fromQuantiles.withColumn("__endpoints_custom", lit(null).cast("array<float>"))
      else {
        val cb = customBins.toSeq.foldRight(lit(null).cast("array<float>")) {
          case ((code, eps), acc) =>
            when(col(Code) === code, array(eps.map(e => lit(e.toFloat)): _*)).otherwise(acc)
        }
        fromQuantiles.withColumn("__endpoints_custom", cb)
      }
    val meta = custom
      .withColumn("__endpoints", coalesce(col("__endpoints_custom"), col("__endpoints_meta")))
      .select(Code, "__endpoints")

    // per-code uniqueness is this operator's metadata contract (the
    // reference keys bins by code alone); a codes table carrying modifier
    // duplicates must not multiply event rows through the left join
    val joined = data.join(broadcast(meta.dropDuplicates(Code)), Seq(Code), "left")
    // reference do_bin checks only is_not_null (bin_numeric_values.py:
    // do_bin) — NaN values ARE binned; searchSortedRight places NaN past
    // every endpoint (Spark orders NaN greatest), matching numpy's
    // searchsorted end placement
    val binnable = col("__endpoints").isNotNull && col(NumericValue).isNotNull
    val binIdx = searchSortedRight(col("__endpoints"), col(NumericValue))
    // bin bounds: left = endpoints[i-1] (or -inf), right = endpoints[i] (or inf)
    val left = when(binIdx === 0, lit("-inf"))
      .otherwise(element_at(col("__endpoints"), binIdx).cast("string"))
    val right = when(binIdx === size(col("__endpoints")), lit("inf"))
      .otherwise(element_at(col("__endpoints"), binIdx + 1).cast("string"))
    val fieldExprs = Map[String, org.apache.spark.sql.Column](
      "code" -> col(Code), "bin" -> binIdx.cast("string"),
      "left" -> left, "right" -> right)
    val segments = FormatField.pattern.split(codeFormat, -1)
    val fields = FormatField.findAllMatchIn(codeFormat).map(_.group(1)).toSeq
    val parts = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Column]
    for (i <- segments.indices) {
      if (segments(i).nonEmpty) parts += lit(segments(i))
      if (i < fields.length) parts += fieldExprs(fields(i))
    }
    val newCode = when(binnable, concat(parts.toSeq: _*)).otherwise(col(Code))
    val out = joined
      .withColumn(Code, newCode)
      .withColumn(NumericValue,
        if (dropNumeric) when(!binnable, col(NumericValue)) else col(NumericValue))
    out.drop("__endpoints", "__endpoints_meta", "__endpoints_custom")
  }
}
