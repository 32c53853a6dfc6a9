package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time one (or more) named gate queries with repeats, reporting
  * per-iteration seconds — the per-query feedback loop for plan iteration
  * (graft.Bench is the driver's single-shot whole-suite contract).
  * Usage: runMain graft.BenchOne <sfDir> <iters> <query...>
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        Bench.force(fn(spark, sfDir)) // full materialization, same as Bench
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s min=${times.min}%.2f  " +
        times.map(t => f"$t%.2f").mkString(" "))
    }
    spark.stop()
  }
}
