package graft

import org.apache.spark.sql.functions._
import graft.meds.{MedsData, MedsIO, MedsSchema}

/** End-to-end lock on the committed ANALYSIS pipeline fixture
  * (`config/analysis_pipeline.yaml`): the CSV-source → LM-perplexity →
  * fluency-filter → NB-classify → JSD-report chain through the graft.Main
  * CLI must equal the same stages composed directly, and chained
  * single-`--stage` runs must reproduce the full run. The DuckDB hash
  * gate for the composed output is `analysis_pipeline` in Queries.
  */
class AnalysisPipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val outCols = Seq("nb_pred", "n_tokens", "n_terms", "js_bits")

  private def freshTmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_analysis_$tag").toString

  test("graft.Main CLI run equals the directly-composed stage chain and filters") {
    val tmp = freshTmp("e2e")
    val overrides = Queries.stageAnalysisInputs(spark, dir, tmp)
    Main.run(Array(Queries.AnalysisYaml, s"$tmp/in", s"$tmp/out") ++ overrides,
      spark)
    val viaMain = MedsIO.read(spark, s"$tmp/out").data
      .select(outCols.map(col): _*)

    val parsed = graft.config.PipelineConfig.fromFile(
      Queries.AnalysisYaml, overrides)
    def empty(s: org.apache.spark.sql.types.StructType) =
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
    val seedRow = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "lang", "source").limit(1)
    val direct = graft.operators.Pipeline.run(spark,
      MedsData(seedRow, empty(MedsSchema.codesSchema),
        empty(MedsSchema.splitsSchema)), parsed.stages).data
      .select(outCols.map(col): _*)

    assert(collectSet(viaMain) == collectSet(direct))
    // the report covers every predicted class of the FILTERED corpus: at
    // least one group, fewer tokens than the raw corpus carries
    val rows = viaMain.collect()
    assert(rows.nonEmpty)
    val rawTokens = spark.read.parquet(s"$dir/documents.parquet")
      .agg(sum(size(split(trim(col("text")), "\\s+")))).collect()(0).getLong(0)
    assert(rows.map(_.getLong(1)).sum < rawTokens)
  }

  test("chained --stage runs reproduce the full-pipeline run") {
    val tmp = freshTmp("staged")
    val overrides = Queries.stageAnalysisInputs(spark, dir, tmp)
    Main.run(Array(Queries.AnalysisYaml, s"$tmp/in", s"$tmp/full") ++ overrides,
      spark)
    val stages = Seq("load_csv", "lm_perplexity", "filter_rows",
      "nb_classify", "js_divergence")
    val last = stages.zipWithIndex.foldLeft(s"$tmp/in") { case (in, (st, i)) =>
      val out = s"$tmp/s$i"
      Main.run(Array(Queries.AnalysisYaml, in, out, s"--stage=$st") ++ overrides,
        spark)
      out
    }
    val full = MedsIO.read(spark, s"$tmp/full").data.select(outCols.map(col): _*)
    val staged = MedsIO.read(spark, last).data.select(outCols.map(col): _*)
    assert(collectSet(staged) == collectSet(full))
  }
}
