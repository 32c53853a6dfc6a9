package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Shuffle-volume regression net (VERDICT r9 #3): SparkListener-accumulated
  * totals for the heaviest operators at sf0.1, asserted against pinned
  * upper bounds with ~2.5× headroom — the 100×-relevant quantities (bytes
  * shuffled, bytes spilled) pinned directly instead of inferred from plan
  * shape. A plan regression that re-scans an input, loses an exchange
  * reuse, or explodes a join ~doubles shuffle volume and fails here even
  * when wall-clock noise would hide it; PlanSpec/PlanLint continue to pin
  * the shapes themselves.
  *
  * Bounds are TOTAL shuffle bytes written across all stages of one gate
  * run at sf0.1 (local[4], 4 shuffle partitions — partition count changes
  * layout, not total volume). Each gate is warmed once first so one-time
  * fixture staging (idempotent input roots, IVF index builds) never counts
  * against the bound. Spill must be zero: nothing at sf0.1 should exceed
  * executor memory, and a spill regression is exactly the kind of silent
  * scale-killer this net exists to catch.
  */
class MetricsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.1"

  private case class Totals(shufWrite: Long, spillDisk: Long, spillMem: Long)

  private def measure(name: String): Totals = {
    // warm: one-time staging + codegen, outside the measured region
    Bench.force(SparkEntry.queries(name)(spark, dir))
    // listener-bus dispatch is asynchronous — drain the warm run's queued
    // stage events BEFORE attaching, or they get attributed to the timed
    // run (up to a full extra gate of shuffle bytes, eating the headroom)
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
      // full materialization (Bench.force): a bare count() lets Catalyst
      // prune unreferenced windows/projections and would measure a
      // degenerate plan — the very discovery that prompted this net
      Bench.force(SparkEntry.queries(name)(spark, dir))
      org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(l)
    Totals(sw, sd, sm)
  }

  /** (gate, max total shuffle bytes) — measured at sf0.1 and pinned with
    * ~2.5× headroom; a >2× volume regression fails before the headroom
    * hides it. Update deliberately, with a measured justification.
    */
  private val bounds: Seq[(String, Long)] = Seq(
    "analysis_pipeline" -> 15_000_000L,       // measured 5.72 MB (r10)
    "curation_pipeline" -> 1_000_000L,        // measured 0.33 MB
    "feature_pipeline" -> 8_000_000L,         // measured 3.16 MB (r10 end)
    "ngram_jaccard" -> 30_000_000L,           // measured 11.43 MB
    "tf_idf" -> 10_000_000L,                  // measured 4.02 MB
    "minhash_lsh_dedup_stage" -> 2_000_000L,  // measured 0.81 MB
    "dedup_clusters" -> 64_000L,              // measured 9.0 KB
    "cluster_reps" -> 64_000L,                // measured 17.7 KB
    "semdedup" -> 32_000L,                    // measured 5.7 KB
    "zorder_values" -> 20_000_000L,           // measured 8.06 MB
    "asof_join_sliced" -> 6_000_000L,         // measured 2.60 MB (r10 end)
    "rolling_agg_sliced" -> 12_000_000L,      // measured 4.91 MB
    "lm_perplexity" -> 500_000L,              // measured 183 KB (r11, in-row grams)
    "ppl_buckets" -> 450_000L,                // measured 172 KB (r11, in-row grams)
    "pq_codes" -> 450_000L,                   // measured 170 KB (train partials + output sort)
    "ivfpq_topk" -> 96_000L,                  // measured 32 KB (train partials; ADC needs no exchange)
    "pq_knn" -> 48_000L,                      // measured 16.9 KB (train partials + queries*k top-k lists — corpus never shuffles)
    "pq_rerank" -> 32_000L,                   // measured 12.8 KB (train partials only: shortlist + exact re-rank are broadcast/TakeOrdered — corpus never shuffles)
    "pq_knn_rerank" -> 64_000L)               // measured 21.4 KB (train partials + two bounded top-k exchanges — corpus never shuffles on either pass)

  for ((q, cap) <- bounds)
    test(s"$q: shuffle volume within pinned bound, zero spill") {
      val t = measure(q)
      info(f"$q shuffleWrite=${t.shufWrite}%,d spillDisk=${t.spillDisk}%,d " +
        f"spillMem=${t.spillMem}%,d")
      assert(t.shufWrite <= cap,
        s"$q shuffled ${t.shufWrite} bytes > pinned bound $cap — a plan " +
          "regression (lost exchange reuse, re-scan, join explosion)?")
      assert(t.spillDisk == 0 && t.spillMem == 0,
        s"$q spilled (disk=${t.spillDisk}, mem=${t.spillMem}) at sf0.1 — " +
          "partitions no longer fit in executor memory")
    }

  test("Pq.train shuffle is codebook-keyed, not corpus-proportional") {
    // the PQ 100 TB claim pinned directly: each Lloyd iteration's exchange
    // carries map-side partials onto m*ksub keys, so TRAINING shuffle must
    // stay a few KB regardless of corpus size (the gates' totals above
    // also include their presentation sort, which IS output-proportional)
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    def train() = graft.ops.Pq.train(embs, "vec_id", "embedding",
      dim = 64, m = 8, ksub = 8, iters = 3, seed = 42L)
    train() // warm
    org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
    var sw = 0L
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: SparkListenerStageCompleted): Unit =
        sw += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    }
    spark.sparkContext.addSparkListener(l)
    try {
      train()
      org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(l)
    info(f"Pq.train shuffleWrite=$sw%,d")
    // 3 iterations x (m*ksub = 64 partial rows per map task x 4 tasks,
    // ~dsub longs each) — generous 128 KB cap is still 100x under the
    // corpus-proportional failure mode (sf0.1 encode output is ~1 MB+)
    assert(sw <= 131072L,
      s"Pq.train shuffled $sw bytes — training exchange is no longer " +
        "codebook-keyed partials (corpus-proportional shuffle?)")
  }
}
