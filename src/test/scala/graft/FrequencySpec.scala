package graft

import org.apache.spark.sql.functions._
import graft.plans.FrequencyExpressions

/** Frequent-items sketch aggregates: exact-regime equality with true
  * counts, merge-vs-direct, the no-false-negatives guarantee beyond
  * capacity, null handling, and SQL-surface parity.
  */
class FrequencySpec extends SparkSpec {
  import spark.implicits._

  private def items(df: org.apache.spark.sql.DataFrame, thr: Long,
      maxMap: Int = FrequencyExpressions.DefaultMaxMapSize) =
    df.agg(FrequencyExpressions.freqAgg(col("t"), maxMap).as("sk"))
      .select(explode(FrequencyExpressions.freqItems(col("sk"), lit(thr))).as("f"))
      .select(col("f.item"), col("f.estimate"))
      .as[(String, Long)].collect().toMap

  test("exact regime: estimates equal true counts, threshold filters") {
    val rng = new scala.util.Random(9)
    val data = (0 until 5000).map(_ => s"tok${rng.nextInt(40)}")
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = items(data.toDF("t"), thr = 100L)
    assert(got == truth.filter(_._2 >= 100L))
    assert(got.nonEmpty)
  }

  test("merged per-shard sketches equal the single-pass sketch (exact regime)") {
    val data = (0 until 3000).map(i => s"w${i % 25}")
    val parts = data.grouped(1000).toSeq.map(g =>
      g.toDF("t").agg(FrequencyExpressions.freqAgg(col("t")).as("sk")))
    val merged = parts.reduce(_ union _)
      .agg(FrequencyExpressions.freqMergeAgg(col("sk")).as("sk"))
      .select(explode(FrequencyExpressions.freqItems(col("sk"), lit(1L))).as("f"))
      .select(col("f.item"), col("f.estimate")).as[(String, Long)].collect().toMap
    val direct = items(data.toDF("t"), thr = 1L)
    assert(merged == direct && merged.values.forall(_ == 120L))
  }

  test("beyond capacity: every true heavy hitter survives (no false negatives)") {
    // 60k distinct light items + 5 items at 5000 each, map size 1024:
    // the sketch evicts constantly, but the Misra-Gries bound guarantees
    // anything above N/maxMapSize (~370k/1024 ≈ 360 < 5000) is returned
    val heavy = (0 until 5).flatMap(h => Seq.fill(5000)(s"HEAVY$h"))
    val light = (0 until 60000).map(i => s"light$i")
    val df = scala.util.Random.shuffle(heavy ++ light).toDF("t")
    val got = items(df, thr = 4000L, maxMap = 1024)
    assert((0 until 5).forall(h => got.contains(s"HEAVY$h")))
    // estimates overshoot by at most the error bound (3.5/maxMapSize · N)
    val n = heavy.size + light.size
    assert(got.filterKeys(_.startsWith("HEAVY")).values
      .forall(e => e >= 5000L && e <= 5000L + 4L * n / 1024))
  }

  test("nulls are skipped; empty input yields empty item list") {
    val got = items(Seq(Some("a"), None, Some("a")).toDF("t"), thr = 1L)
    assert(got == Map("a" -> 2L))
    val empty = items(Seq.empty[String].toDF("t"), thr = 1L)
    assert(empty.isEmpty)
  }

  test("freq_items stage: YAML -> registry -> heavy-hitter report") {
    import graft.config.PipelineConfig
    import graft.operators.Pipeline
    val data = ((0 until 50).map(_ => "hot") ++ (0 until 9).map(i => s"cold$i"))
      .toDF("item")
    val wrap = graft.meds.MedsData(data, spark.emptyDataFrame, spark.emptyDataFrame)
    val out = Pipeline.run(spark, wrap, PipelineConfig.fromYaml(
      """stages:
        |  - freq_items:
        |      threshold: 10
        |      max_map_size: 64
        |""".stripMargin).stages).data
    assert(out.select("item", "estimate").as[(String, Long)].collect().toSeq ==
      Seq(("hot", 50L)))
    intercept[IllegalArgumentException] {
      PipelineConfig.fromYaml(
        "stages:\n  - freq_items:\n      max_map_size: 100\n").stages
    }
  }

  test("SQL surface parity") {
    graft.plans.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      """SELECT f.item, f.estimate
        |FROM (SELECT graft_freq_items(graft_freq_agg(t, 64), 2L) AS fs
        |      FROM VALUES ('x'),('x'),('x'),('y'),('y'),('z') AS v(t))
        |LATERAL VIEW explode(fs) AS f""".stripMargin)
      .as[(String, Long)].collect().toMap
    assert(viaSql == Map("x" -> 3L, "y" -> 2L))
  }
}
