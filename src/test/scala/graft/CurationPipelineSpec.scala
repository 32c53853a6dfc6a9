package graft

import org.apache.spark.sql.functions._
import graft.meds.{MedsData, MedsIO, MedsSchema}

/** End-to-end lock on the committed curation pipeline fixture
  * (`config/curation_pipeline.yaml`) — the curation-layer analog of the
  * MEDS example-pipeline e2e: the full 8-stage chain through the graft.Main
  * CLI (config parse, Hydra-style overrides, MEDS root write + read-back)
  * must equal the same stages composed directly on live DataFrames, and
  * chained single-`--stage` runs (the cluster-orchestrator shape: one
  * submitted job per stage, handed off through dataset roots on shared
  * storage) must reproduce the full-pipeline run bit-for-bit. The DuckDB
  * hash gate for the composed output is `curation_pipeline` in Queries.
  */
class CurationPipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def freshTmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_curation_$tag").toString

  private val outCols =
    Seq("doc_id", "pack_shard", "n_tokens", "offset", "seq_idx", "straddles")

  test("graft.Main CLI run equals the directly-composed stage chain, and curates") {
    val tmp = freshTmp("e2e")
    val overrides = Queries.stageCurationInputs(spark, dir, tmp)
    Main.run(Array(Queries.CurationYaml, s"$tmp/in", s"$tmp/out") ++ overrides,
      spark)
    val viaMain = MedsIO.read(spark, s"$tmp/out").data
      .select(outCols.map(col): _*)

    // same parsed stages, composed directly on the live corpus — no CLI,
    // no dataset-root round-trip
    val corpus = Queries.curationCorpus(spark, dir)
    val parsed = graft.config.PipelineConfig.fromFile(
      Queries.CurationYaml, overrides)
    def empty(s: org.apache.spark.sql.types.StructType) =
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
    val direct = graft.operators.Pipeline.run(spark,
      MedsData(corpus.limit(1), empty(MedsSchema.codesSchema),
        empty(MedsSchema.splitsSchema)), parsed.stages).data
      .select(outCols.map(col): _*)

    assert(collectSet(viaMain) == collectSet(direct))
    // the chain genuinely curates: a nonempty strict subset of the corpus
    val n = viaMain.count()
    assert(n > 0 && n < corpus.count())
  }

  test("chained --stage runs reproduce the full-pipeline run") {
    val tmp = freshTmp("staged")
    val overrides = Queries.stageCurationInputs(spark, dir, tmp)
    Main.run(Array(Queries.CurationYaml, s"$tmp/in", s"$tmp/full") ++ overrides,
      spark)
    val stages = Seq("load_jsonl", "expect_schema", "quality_filter",
      "c4_filter", "dedup_lines", "minhash_lsh_dedup", "decontaminate",
      "resample_mix", "pack_sequences")
    val last = stages.zipWithIndex.foldLeft(s"$tmp/in") { case (in, (st, i)) =>
      val out = s"$tmp/s$i"
      Main.run(Array(Queries.CurationYaml, in, out, s"--stage=$st") ++ overrides,
        spark)
      out
    }
    val full = MedsIO.read(spark, s"$tmp/full").data.select(outCols.map(col): _*)
    val staged = MedsIO.read(spark, last).data.select(outCols.map(col): _*)
    assert(collectSet(staged) == collectSet(full))
  }
}
