package graft

import org.apache.spark.sql.functions._
import graft.meds.{MedsData, MedsIO, MedsSchema}

/** End-to-end lock on the committed tokenizer pipeline fixture
  * (`config/tokenizer_pipeline.yaml`): JSONL source → exact dedup →
  * bpe_train (persisted model artifact) → bpe_encode, through the
  * graft.Main CLI. Locks CLI ≡ directly-composed stages, staged runs ≡
  * full run, the model artifact's validity (re-encoding with the persisted
  * model reproduces the pipeline's encode column), and the subword
  * round-trip invariant over every surviving document.
  */
class TokenizerPipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val yaml = Seq("config/tokenizer_pipeline.yaml",
    "/root/repo/config/tokenizer_pipeline.yaml")
    .find(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p))).get

  private def stage(tmp: String): Seq[String] = {
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "lang", "source")
    graft.sources.CorpusSources.writeJsonl(corpus, s"$tmp/corpus")
    def empty(s2: org.apache.spark.sql.types.StructType) =
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s2)
    MedsIO.write(MedsData(corpus.limit(1), empty(MedsSchema.codesSchema),
      empty(MedsSchema.splitsSchema)), s"$tmp/in")
    Seq(s"stages.load_jsonl.path=$tmp/corpus",
      s"stages.bpe_train.model_path=$tmp/model",
      s"stages.bpe_encode.model_path=$tmp/model")
  }

  test("CLI run trains a usable model and encodes; round-trip holds") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_tok_e2e").toString
    val overrides = stage(tmp)
    Main.run(Array(yaml, s"$tmp/in", s"$tmp/out") ++ overrides, spark)
    val out = MedsIO.read(spark, s"$tmp/out").data
    // every surviving doc round-trips: subwords concatenated and </w>
    // restored to spaces reproduce the whitespace-normalized text
    val bad = out.where(col("text").isNotNull &&
      trim(regexp_replace(array_join(col("bpe"), ""), "</w>", " ")) =!=
      trim(regexp_replace(col("text"), "\\s+", " "))).count()
    assert(bad == 0)
    assert(out.count() > 0)

    // the persisted model artifact stands alone: re-encoding the output's
    // text with it reproduces the pipeline's bpe column exactly
    val merges = graft.ops.Bpe.mergesFromDF(spark.read.parquet(s"$tmp/model"))
    assert(merges.nonEmpty && merges.map(_.rank) == merges.indices)
    val re = out.select(col("doc_id"),
      graft.ops.Bpe.encode(col("text"), merges).as("bpe2"))
    val drift = out.join(re, "doc_id")
      .where(col("bpe") =!= col("bpe2")).count()
    assert(drift == 0)
  }

  test("chained --stage runs reproduce the full run") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_tok_staged").toString
    val overrides = stage(tmp)
    Main.run(Array(yaml, s"$tmp/in", s"$tmp/full") ++ overrides, spark)
    val stages = Seq("load_jsonl", "expect_schema", "dedup_exact",
      "bpe_train", "bpe_encode")
    val last = stages.zipWithIndex.foldLeft(s"$tmp/in") { case (in, (st, i)) =>
      val out = s"$tmp/s$i"
      Main.run(Array(yaml, in, out, s"--stage=$st") ++ overrides, spark)
      out
    }
    val full = MedsIO.read(spark, s"$tmp/full").data
      .select("doc_id", "bpe")
    val staged = MedsIO.read(spark, last).data.select("doc_id", "bpe")
    assert(collectSet(staged) == collectSet(full))
  }
}
