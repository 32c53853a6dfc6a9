package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Dev tool (VERDICT r9 #6): phase breakdown of one `feature_pipeline` gate
  * invocation — where the ~3 s fixed floor goes. Times each phase of the
  * warmed gate separately: config parse, MEDS read, the two sliced stages
  * (lazily built, forced by the write), durable write, read-back counts,
  * and the gate's final read+orderBy+count.
  *
  * Usage: Test/runMain graft.FeatureFloorProbe <sfDir> [iters]
  */
object FeatureFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    // warm the whole gate once (staging becomes idempotent, codegen+JIT)
    Bench.force(SparkEntry.queries("feature_pipeline")(spark, sfDir))

    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_feature_" + Integer.toHexString(sfDir.hashCode)).getAbsolutePath

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[floor] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    for (i <- 1 to iters) {
      println(s"--- iteration $i")
      t("whole gate") { // Bench.force: count() would prune the output sort
        Bench.force(SparkEntry.queries("feature_pipeline")(spark, sfDir))
      }
      // decomposed replica of the same run
      val parsed = t("config parse") {
        graft.config.PipelineConfig.fromFile(Queries.FeatureYaml,
          Seq(s"stages.enrich_view.right_path=$tmp/views.parquet"))
      }
      val input = t("MedsIO.read input") { graft.meds.MedsIO.read(spark, s"$tmp/in") }
      val out = t("build chain (lazy)") {
        graft.operators.Pipeline.run(spark, input, parsed.stages, Map.empty)
      }
      t("MedsIO.write output") { graft.meds.MedsIO.write(out, s"$tmp/out2") }
      t("metadata + counts") {
        graft.meds.MedsIO.writeDatasetMetadata(s"$tmp/out2", "dataset", "probe")
        val w = graft.meds.MedsIO.read(spark, s"$tmp/out2")
        (w.data.count(), w.codes.count())
      }
      t("gate read-back+orderBy+force") {
        Bench.force(graft.meds.MedsIO.read(spark, s"$tmp/out2").data
          .select(col("event_id"), col("user_id"), col("t"),
            col("view_ts_us"), col("view_event_id"), col("n_1h"))
          .orderBy("event_id"))
      }
    }
    spark.stop()
  }
}
