package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.meds.{MedsData, MedsIO, MedsSchema}

/** Per-stage shuffle/spill profile of the three composed pipelines
  * (VERDICT r10 #4): MetricsSpec pins each chain's TOTAL volume; this spec
  * pins the MARGINAL volume each pipeline stage adds, so a plan regression
  * localizes to the offending operator instead of the whole chain.
  *
  * Method: prefix diffs over the REAL fused chain. For each prefix
  * `stages.take(i)`, run `Pipeline.run` and fully materialize the output
  * (`Bench.force`); stage i's marginal = prefix-i volume − prefix-(i−1)
  * volume. Prefix runs keep the exact cross-stage plan fusion the runner
  * executes (measuring stages in isolation over parquet intermediates
  * would break scan sharing and column pruning across stage boundaries and
  * profile a plan the runner never runs). Volumes are plan-deterministic —
  * no warm runs needed — and input staging happens before the listener
  * attaches. A marginal can legitimately be ~0 (pure projections/filters)
  * or slightly negative (a later stage's pruning shrinking an upstream
  * exchange); bounds are upper bounds on bytes ADDED. Spill must be zero
  * at every prefix.
  *
  * Cumulative totals here are smaller than MetricsSpec's gate totals for
  * the same pipelines: the gates run through graft.Main (durable output
  * root write + read-back + final gate sort), which this spec deliberately
  * excludes — the chain's internal shuffles are the per-stage quantity.
  */
class PipelineStageMetricsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.1"

  private def empty(schema: org.apache.spark.sql.types.StructType) =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  private case class Totals(shufWrite: Long, spillDisk: Long, spillMem: Long)

  private def measured(body: => Unit): Totals = {
    org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
    var sw = 0L; var sd = 0L; var sm = 0L
    val l = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        sw += m.shuffleWriteMetrics.bytesWritten
        sd += m.diskBytesSpilled
        sm += m.memoryBytesSpilled
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(l)
    Totals(sw, sd, sm)
  }

  /** Run every prefix of the chain, asserting each stage's marginal
    * shuffle bytes against its pinned bound and zero spill throughout.
    */
  private def profile(yamlPath: String, overrides: Seq[String],
      input: MedsData, stageBounds: Seq[(String, Long)]): Unit = {
    val parsed = graft.config.PipelineConfig.fromFile(yamlPath, overrides)
    assert(parsed.stages.map(_.name) === stageBounds.map(_._1),
      "stage list drifted from the pinned profile — re-measure the bounds")
    var prev = 0L
    for (i <- 1 to parsed.stages.length) {
      val (name, cap) = stageBounds(i - 1)
      val t = measured {
        Bench.force(graft.operators.Pipeline
          .run(spark, input, parsed.stages.take(i)).data)
      }
      val marginal = t.shufWrite - prev
      info(f"stage $name%-22s marginal=$marginal%,12d cumulative=${t.shufWrite}%,d")
      assert(marginal <= cap,
        s"stage $name added $marginal shuffle bytes > pinned bound $cap — " +
          "a stage-local plan regression (lost reuse, re-scan, join explosion)?")
      assert(t.spillDisk == 0 && t.spillMem == 0,
        s"prefix through $name spilled (disk=${t.spillDisk}, mem=${t.spillMem})")
      prev = t.shufWrite
    }
  }

  private def freshTmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_stagemetrics_$tag").toString

  test("analysis pipeline: per-stage marginal shuffle within pinned bounds") {
    val tmp = freshTmp("analysis")
    val overrides = Queries.stageAnalysisInputs(spark, dir, tmp)
    val seed = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "lang", "source").limit(1)
    profile(Queries.AnalysisYaml, overrides,
      MedsData(seed, empty(MedsSchema.codesSchema), empty(MedsSchema.splitsSchema)),
      Seq( // measured at sf0.1 (r11), ~2.5x headroom
        "load_csv" -> 64_000L,         // measured 0 (source scan only)
        "lm_perplexity" -> 250_000L,   // measured 88 KB (LM/ctx aggs; the
                                       // in-row BigramCounts pass removed
                                       // the per-occurrence gram exchange)
        "filter_rows" -> 64_000L,      // measured 0 (pure filter)
        "nb_classify" -> 2_200_000L,   // measured 885 KB (token/class aggs)
        "js_divergence" -> 500_000L))  // measured -64 KB (its aggregation
                                       // is SMALLER than the columns it
                                       // prunes from upstream exchanges)
  }

  test("curation pipeline: per-stage marginal shuffle within pinned bounds") {
    val tmp = freshTmp("curation")
    val overrides = Queries.stageCurationInputs(spark, dir, tmp)
    profile(Queries.CurationYaml, overrides,
      MedsData(spark.read.parquet(s"$dir/documents.parquet").limit(1),
        empty(MedsSchema.codesSchema), empty(MedsSchema.splitsSchema)),
      Seq( // measured at sf0.1 (r11), ~2.5x headroom
        "load_jsonl" -> 64_000L,          // measured 0 (source scan only)
        "expect_schema" -> 64_000L,       // measured 0 (metadata-only)
        "quality_filter" -> 64_000L,      // measured 0 (pure filter)
        "c4_filter" -> 64_000L,           // measured 0 (in-row line logic)
        "dedup_lines" -> 320_000L,        // measured 122 KB (line groups)
        "minhash_lsh_dedup" -> 320_000L,  // measured 122 KB (band buckets + CC)
        "decontaminate" -> 64_000L,       // measured 15 KB (gram probe)
        "resample_mix" -> 64_000L,        // measured 0 (per-source caps in-row)
        "pack_sequences" -> 120_000L))    // measured 38 KB (pack numbering)
  }

  test("feature pipeline: per-stage marginal shuffle within pinned bounds") {
    val tmp = freshTmp("feature")
    val overrides = Queries.stageFeatureInputs(spark, dir, tmp)
    profile(Queries.FeatureYaml, overrides, MedsIO.read(spark, s"$tmp/in"),
      Seq( // measured at sf0.1 (r11), ~2.5x headroom
        "enrich_view" -> 4_800_000L,       // measured 1.92 MB (asof sliced union)
        "trailing_activity" -> 2_000_000L))// measured 0.78 MB (rolling grid window)
  }
}
