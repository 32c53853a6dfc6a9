package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape audit: executes every gate at the given SF and reports queries
  * whose FINAL (post-AQE) plan scans the same parquet table more than once —
  * the diamond-recompute shape that re-reads the corpus per branch at scale.
  * Reused exchanges/stages are counted once (identity dedupe). Duplicate
  * scans are sometimes the RIGHT plan (a stats pass over two pruned columns
  * + an apply pass beats shuffling full rows), so this is a review list,
  * not a failure gate.
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val skip = Set("events_sessionize_stream", "events_dedup_stream") // streaming: plan is per-batch
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1) if !skip(name)) {
      try {
        val df = fn(spark, dir)
        df.collect() // finalizes df's OWN AdaptiveSparkPlan (count() would plan separately)
        val dup = graft.plans.PlanLint.check(df)
          .filter(_.kind == "duplicate-scan").map(_.detail)
        if (dup.nonEmpty) println(s"AUDIT $name: ${dup.mkString(", ")}")
        spark.catalog.clearCache()
      } catch { case e: Throwable => println(s"AUDIT $name: ERR ${e.getClass.getSimpleName}") }
    }
    println("AUDIT done")
    spark.stop()
  }
}
