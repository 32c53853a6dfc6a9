package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-stage time/shuffle breakdown of the tf_idf gate at a
  * replicated scale dir (where does the k=64 superlinear step go?).
  *
  * Usage: Test/runMain graft.TfIdfProbe <scaleDir> [query]
  */
object TfIdfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val query = if (args.length > 1) args(1) else "tf_idf"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        println(f"[stage] id=${si.stageId}%-4d tasks=${si.numTasks}%-4d " +
          f"run=${m.executorRunTime / 1e3}%7.1fs " +
          f"cpu=${m.executorCpuTime / 1e9}%7.1fs " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
          f"shufR=${m.shuffleReadMetrics.remoteBytesRead / 1e6 +
            m.shuffleReadMetrics.localBytesRead / 1e6}%8.1fMB " +
          f"spillMem=${m.memoryBytesSpilled / 1e6}%8.1fMB " +
          f"spillDisk=${m.diskBytesSpilled / 1e6}%8.1fMB  ${si.name}")
      }
    }

    Bench.force(SparkEntry.queries(query)(spark, dir)) // warm
    println("=== timed run")
    spark.sparkContext.addSparkListener(listener)
    val q = SparkEntry.queries(query)(spark, dir)
    val t0 = System.nanoTime()
    val n = Bench.force(q)
    println(f"rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(1000)
    println("=== executed plan")
    println(q.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
