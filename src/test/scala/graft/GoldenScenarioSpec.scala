package graft

import org.apache.spark.sql.functions._
import graft.config.PipelineConfig
import graft.dsl.Cfg
import graft.meds.MedsData
import graft.meds.MedsSchema._
import graft.operators._

/** Row-order-sensitive golden parity against the reference's shipped
  * per-stage scenarios (stages/<stage>/examples/ — cfg translated YAML→JSON
  * verbatim, in/out CSV-in-YAML parsed directly from the reference tree).
  */
class GoldenScenarioSpec extends SparkSpec {

  private val stagesRoot = "/root/reference/src/MEDS_transforms/stages"

  test("reorder_measurements golden scenario (stable within-block order)") {
    val dir = s"$stagesRoot/reorder_measurements/examples"
    val data = GoldenScenario.shardedData(spark, s"$dir/in.yaml")
    val patterns = Seq("ADMISSION.*", "TEMP", "HR", "EYE_COLOR//B.*", "HEIGHT", "DISCHARGE.*")
    val out = ReorderMeasurements(data, patterns)
    GoldenScenario.assertShardsEqual(out, s"$dir/out_data.yaml", spark,
      Seq("subject_id", "time", "code", "numeric_value"))
  }

  test("filter_measurements/simple golden scenario") {
    val dir = s"$stagesRoot/filter_measurements/examples/simple"
    val data = GoldenScenario.shardedData(spark, s"$dir/in.yaml")
    val codes = GoldenScenario.metadataTable(spark, s"$dir/in.yaml", "codes").get
    val out = FilterMeasurements(data, codes, minSubjectsPerCode = Some(2))
      .orderBy(col(Shard), col(RowIdx))
    GoldenScenario.assertShardsEqual(out, s"$dir/out_data.yaml", spark,
      Seq("subject_id", "time", "code", "numeric_value"))
  }

  test("occlude_outliers/on_raw_static_data golden scenario") {
    val dir = s"$stagesRoot/occlude_outliers/examples/on_raw_static_data"
    val data = GoldenScenario.shardedData(spark, s"$dir/in.yaml")
    val codes = GoldenScenario.metadataTable(spark, s"$dir/in.yaml", "codes").get
    val out = OccludeOutliers(data, codes, stddevCutoff = 1.0)
      .orderBy(col(Shard), col(RowIdx))
    GoldenScenario.assertShardsEqual(out, s"$dir/out_data.yaml", spark,
      Seq("subject_id", "time", "code", "numeric_value", "numeric_value/is_inlier"))
  }

  test("bin_numeric_values golden scenario (quantile bins, f32 bound rendering)") {
    val dir = s"$stagesRoot/bin_numeric_values/examples"
    val data = GoldenScenario.shardedData(spark, s"$dir/in.yaml")
    def q(a: Double, b: Double, c: Double) = struct(
      lit(a).cast("float").as("values/quantile/0.25"),
      lit(b).cast("float").as("values/quantile/0.5"),
      lit(c).cast("float").as("values/quantile/0.75"))
    // in.yaml's codes metadata is record-form YAML (nested structs); the
    // three value-bearing codes are built directly from its values
    import spark.implicits._
    val codes = Seq("HEIGHT", "HR", "TEMP").toDF(Code)
      .withColumn(ValuesQuantiles,
        when(col(Code) === "HEIGHT", q(160.395311, 164.686884, 164.686884))
          .when(col(Code) === "HR", q(107.5, 112.5, 113.4))
          .otherwise(q(96.2, 99.9, 100.0)))
    val out = BinNumericValues(data, codes,
      codeFormat = "{code}//value_[{left},{right})")
      .orderBy(col(Shard), col(RowIdx))
    GoldenScenario.assertShardsEqual(out, s"$dir/out_data.yaml", spark,
      Seq("subject_id", "time", "code", "numeric_value"))
  }

  test("extract_values golden scenario (multi-match-revise + DSL extraction)") {
    val dir = s"$stagesRoot/extract_values/examples"
    val data = GoldenScenario.shardedData(spark, s"$dir/in.yaml")
    // cfg.yaml translated verbatim to JSON
    val cfg = Cfg.fromJson(
      """{
        |  "_match_revise_mode": "multi_match_and_revise",
        |  "_match_revise": [
        |    {"_matcher": {"code": "BP"},
        |     "numeric_value": {"extract": {"from": "text_value", "regex": "(\\d+)/.*"}},
        |     "code": "{code}//SYSTOLIC",
        |     "text_value": {"literal": null}},
        |    {"_matcher": {"code": "BP"},
        |     "numeric_value": {"extract": {"from": "text_value", "regex": ".*/(\\d+)"}},
        |     "code": "{code}//DIASTOLIC",
        |     "text_value": {"literal": null}},
        |    {"_matcher": {"code": "TEMP", "text_value": {"regex": "^[\\d\\.]+C$"}},
        |     "numeric_value": {"extract": {"from": "text_value", "regex": "^([\\d\\.]+)C$"}},
        |     "code": "{code}//C",
        |     "text_value": {"literal": null}},
        |    {"_matcher": {"code": "TEMP", "text_value": {"regex": "^[\\d\\.]+F$"}},
        |     "numeric_value": {"extract": {"from": "text_value", "regex": "^([\\d\\.]+)F$"}},
        |     "code": "{code}//F",
        |     "text_value": {"literal": null}}
        |  ]
        |}""".stripMargin)
    val stage = PipelineConfig.buildStage("extract_values", "extract_values", cfg)
      .asInstanceOf[Pipeline.DataStage]
    val codes = spark.emptyDataFrame
    val out = stage.f(MedsData(data, codes, codes))
    GoldenScenario.assertShardsEqual(out, s"$dir/out_data.yaml", spark,
      Seq("subject_id", "time", "code", "numeric_value", "text_value"))
  }
}
