package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

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
        // reused stages appear as the same object in several tree positions:
        // dedupe by identity so reuse counts as the one physical scan it is
        val seen = java.util.Collections.newSetFromMap(
          new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
        var scans = List.empty[String]
        def walk(p: SparkPlan): Unit = {
          if (!seen.add(p)) return
          p match {
            case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
            case qs: QueryStageExec => walk(qs.plan)
            case re: ReusedExchangeExec => walk(re.child)
            case s: org.apache.spark.sql.execution.FileSourceScanExec =>
              scans ::= s.relation.location.rootPaths.headOption.map(_.getName).getOrElse("?")
            case other => other.children.foreach(walk)
          }
          p.subqueries.foreach(walk)
        }
        walk(df.queryExecution.executedPlan)
        val dup = scans.groupBy(identity).filter(_._2.size > 1).map { case (t, l) => s"$t x${l.size}" }
        if (dup.nonEmpty) println(s"AUDIT $name: ${dup.mkString(", ")}")
        spark.catalog.clearCache()
      } catch { case e: Throwable => println(s"AUDIT $name: ERR ${e.getClass.getSimpleName}") }
    }
    println("AUDIT done")
    spark.stop()
  }
}
