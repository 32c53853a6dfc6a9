package graft

import org.apache.spark.sql.functions._
import graft.config.PipelineConfig
import graft.meds.{MedsData, MedsIO}
import graft.operators.Pipeline

/** The built-in training-data-hygiene stages (graft.config.OpStages) are
  * config-reachable: a pipeline YAML can chain MEDS transforms with corpus
  * curation stages through the same registry third-party stages use.
  */
class OpStagesSpec extends SparkSpec {

  private def docs = spark.createDataFrame(Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "web"),
    (2L, "the quick brown fox jumps over the lazy dog", "web"), // exact dup of 1
    (3L, "The  quick  brown fox jumps over the lazy dog", "web"), // fingerprint dup of 1
    (4L, "the quick brown fox jumps over the lazy cat today", "books"), // near-dup of 1
    (5L, "completely different content about spark catalyst plans", "books"),
    (6L, "short text", "web")
  )).toDF("doc_id", "text", "source")

  private def emptyMeds(data: org.apache.spark.sql.DataFrame): MedsData =
    MedsData(data, spark.emptyDataFrame, spark.emptyDataFrame)

  test("built-in hygiene stages are registered through the extension registry") {
    val expected = Set("dedup_exact", "dedup_fingerprint", "minhash_lsh_dedup",
      "ngram_jaccard_dedup", "simhash_dedup", "text_quality", "lang_id",
      "text_tokens", "sample", "sample_split", "stratified_cap")
    assert(expected.subsetOf(PipelineConfig.registeredStages))
  }

  test("documents pipeline from YAML: quality -> near-dup dedup -> split -> cap") {
    val yaml =
      """description: corpus curation chain
        |stages:
        |  - text_quality
        |  - ngram_jaccard_dedup:
        |      n: 3
        |      threshold: 0.5
        |  - sample_split:
        |      splits:
        |        train: 0.8
        |        held_out: 0.2
        |  - stratified_cap:
        |      stratum_col: source
        |      per_stratum: 2
        |""".stripMargin
    val parsed = PipelineConfig.fromYaml(yaml)
    assert(parsed.stages.map(_.name) == Seq(
      "text_quality", "ngram_jaccard_dedup", "sample_split", "stratified_cap"))
    val out = Pipeline.run(spark, emptyMeds(docs), parsed.stages).data

    // quality columns were appended, originals kept
    assert(Seq("doc_id", "text", "source", "n_words", "stopword_ratio")
      .forall(out.columns.contains))
    // the exact/fingerprint/near dups of doc 1 are gone, representative stays
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && Set(2L, 3L, 4L).intersect(kept).isEmpty)
    // split column assigned from the configured names
    val splits = out.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "held_out")))
    // per-source cap respected
    val maxPerSource = out.groupBy("source").count().collect().map(_.getLong(1)).max
    assert(maxPerSource <= 2)
  }

  test("YAML pipeline mixes MEDS stages with a dedup stage") {
    val yaml =
      """stages:
        |  - filter_subjects:
        |      min_events_per_subject: 5
        |  - dedup_exact:
        |      id_col: subject_id
        |      text_col: code
        |""".stripMargin
    val meds = MedsIO.read(spark, "/root/reference/example/data")
    val before = Pipeline.run(spark, meds,
      PipelineConfig.fromYaml("stages:\n  - filter_subjects:\n      min_events_per_subject: 5\n").stages)
    val out = Pipeline.run(spark, meds, PipelineConfig.fromYaml(yaml).stages)
    // runs end-to-end; dedup keeps the min-id representative per code so the
    // survivor set is a subset of the filtered subjects
    assert(out.data.count() > 0 && out.data.count() <= before.data.count())
    val keptSubjects = out.data.select("subject_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val allSubjects = before.data.select("subject_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(keptSubjects.subsetOf(allSubjects))
  }

  test("dedup stage variants keep exactly the group representatives") {
    def run(stage: String, extra: String = ""): Set[Long] = {
      val yaml = s"stages:\n  - $stage:$extra\n"
      Pipeline.run(spark, emptyMeds(docs), PipelineConfig.fromYaml(yaml).stages)
        .data.select("doc_id").collect().map(_.getLong(0)).toSet
    }
    // exact: only the byte-identical copy collapses
    assert(run("dedup_exact", "\n      id_col: doc_id") == Set(1L, 3L, 4L, 5L, 6L))
    // fingerprint: whitespace/case variants collapse too
    assert(run("dedup_fingerprint") == Set(1L, 4L, 5L, 6L))
    // minhash-lsh: near-dups (2, 3, 4 vs 1) collapse; distinct docs stay
    val mh = run("minhash_lsh_dedup", "\n      threshold: 0.4")
    assert(mh.contains(1L) && mh.contains(5L) && mh.contains(6L))
    assert(Set(2L, 3L).intersect(mh).isEmpty)
    // with the hot-bucket chain guard on, the duplicate CLUSTER is preserved
    // (chain pairs reach every member), so the survivor set is identical
    assert(run("minhash_lsh_dedup", "\n      threshold: 0.4\n      max_bucket: 2") == mh)
    // simhash: exact copies share all bands at hamming 0
    val sh = run("simhash_dedup", "\n      max_hamming: 3")
    assert(sh.contains(1L) && !sh.contains(2L))
  }

  test("exact/fingerprint dedup stages keep every null-text row") {
    // null texts group together under SQL GROUP BY (md5(null) = null) — a
    // dedup over them would keep one failed-extraction row and silently drop
    // the rest as "duplicates" of each other
    val withNulls = docs.unionByName(spark.createDataFrame(Seq(
      (7L, null.asInstanceOf[String], "web"),
      (8L, null.asInstanceOf[String], "books"),
      (9L, null.asInstanceOf[String], "web")
    )).toDF("doc_id", "text", "source"))
    def run(stage: String): Set[Long] =
      Pipeline.run(spark, emptyMeds(withNulls),
        PipelineConfig.fromYaml(s"stages:\n  - $stage\n").stages)
        .data.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(run("dedup_exact") == Set(1L, 3L, 4L, 5L, 6L, 7L, 8L, 9L))
    assert(run("dedup_fingerprint") == Set(1L, 4L, 5L, 6L, 7L, 8L, 9L))
  }

  test("column-appending stages fail fast on an output-name collision") {
    val clash = docs.withColumn("n_tokens", lit(0L))
    val ex = intercept[IllegalArgumentException] {
      Pipeline.run(spark, emptyMeds(clash),
        PipelineConfig.fromYaml("stages:\n  - text_tokens\n").stages).data.count()
    }
    assert(ex.getMessage.contains("n_tokens") && ex.getMessage.contains("text_tokens"))
  }

  test("sample stage is deterministic and requires fraction") {
    val yaml = "stages:\n  - sample:\n      fraction: 0.5\n      seed: 7\n"
    val a = Pipeline.run(spark, emptyMeds(docs), PipelineConfig.fromYaml(yaml).stages)
      .data.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Pipeline.run(spark, emptyMeds(docs), PipelineConfig.fromYaml(yaml).stages)
      .data.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty && a.size < 6)
    intercept[IllegalArgumentException] {
      Pipeline.run(spark, emptyMeds(docs),
        PipelineConfig.fromYaml("stages:\n  - sample:\n      seed: 7\n").stages)
    }
  }

  test("hygiene stages honor train_only orchestration") {
    // train_only resolves splits per subject_id — documents pipelines carry
    // one (here 1:1 with doc_id)
    val d = docs.withColumn("subject_id", col("doc_id"))
    val splits = d.select(col("subject_id"),
      when(col("doc_id") <= 3, "train").otherwise("held_out").as("split"))
    val m = MedsData(d, spark.emptyDataFrame, splits)
    val yaml = "stages:\n  - text_tokens:\n      train_only: true\n"
    val out = Pipeline.run(spark, m, PipelineConfig.fromYaml(yaml).stages).data
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    assert(out.columns.contains("n_tokens"))
  }
}
