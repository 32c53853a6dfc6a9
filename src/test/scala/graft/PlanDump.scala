package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump `.explain("formatted")` for named gates to files — the
  * optimization-round evidence artifacts (`plans/r17/<query>_<suffix>.txt`).
  *
  * Usage: Test/runMain graft.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...|all>
  *
  * The dump is the ANALYZED plan's formatted physical explain (pre-execution,
  * `AdaptiveSparkPlan isFinalPlan=false` under AQE) — deterministic and
  * cheap, and it already shows Exchange placement, join strategy pick,
  * PushedFilters and ReadSchema, which is what the plan-shape claims cite.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names: Seq[String] =
      if (args(3) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(3).split(",").map(_.trim).toSeq
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val out = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(out, txt)
        println(s"[plandump] wrote $out (${txt.length} chars)")
      } catch { case e: Throwable =>
        println(s"[plandump] FAILED $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
