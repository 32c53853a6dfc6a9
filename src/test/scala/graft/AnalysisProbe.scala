package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: phase-level timing breakdown of the analysis_pipeline gate
  * (staging vs stage-chain compute vs MEDS round-trip) — where does the
  * gate's wall time actually go at sf0.1?
  * Usage: sbt "Test/runMain graft.AnalysisProbe [sfDir]"
  */
object AnalysisProbe {
  private def time[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    spark.conf.set("spark.sql.shuffle.partitions", sys.env.getOrElse("PROBE_PARTS", "32"))
    spark.conf.set("spark.sql.adaptive.enabled", sys.env.getOrElse("PROBE_AQE", "true"))
    for (iter <- 1 to 3) {
      println(s"--- iteration $iter ---")
      val tmp = java.nio.file.Files.createTempDirectory("graft_probe").toString
      val overrides = time("stage inputs") {
        Queries.stageAnalysisInputs(spark, dir, tmp)
      }
      val parsed = time("parse yaml") {
        graft.config.PipelineConfig.fromFile(Queries.AnalysisYaml, overrides)
      }
      def empty(s: org.apache.spark.sql.types.StructType) =
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      val in = graft.meds.MedsData(
        spark.read.parquet(s"$dir/documents.parquet").limit(1),
        empty(graft.meds.MedsSchema.codesSchema),
        empty(graft.meds.MedsSchema.splitsSchema))
      val out = time("Pipeline.run (lazy)") {
        graft.operators.Pipeline.run(spark, in, parsed.stages)
      }
      val n = time("materialize (count)") { out.data.count() }
      time("MEDS write out") {
        graft.meds.MedsIO.write(out, s"$tmp/out")
      }
      time("read back + collect") {
        graft.meds.MedsIO.read(spark, s"$tmp/out").data.collect()
      }
      println(s"[probe] rows: $n")
    }
    spark.stop()
  }
}
