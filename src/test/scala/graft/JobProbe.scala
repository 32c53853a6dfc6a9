package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev tool: per-JOB wall/gap breakdown of a gate — where does a
  * many-job composed pipeline's wall go at toy scale (job floor vs task
  * time)? Prints each job's wall, the idle gap since the previous job
  * ended, and the first line of its call site / description.
  *
  * Usage: Test/runMain graft.JobProbe <sfDir> [query]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val query = if (args.length > 1) args(1) else "analysis_pipeline"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // trailing k=v args: ad-hoc conf for A/B runs (e.g. AQE off)
    args.drop(2).filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    case class Job(id: Int, start: Long, var end: Long = 0L,
      desc: String = "", site: String = "")
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("")
        jobs.synchronized {
          jobs(js.jobId) = Job(js.jobId, js.time, desc = desc, site = site)
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(je.jobId).foreach(_.end = je.time) }
    }

    Bench.force(SparkEntry.queries(query)(spark, dir)) // warm
    println("=== timed run")
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val n = Bench.force(SparkEntry.queries(query)(spark, dir))
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1500)
    var prevEnd = 0L
    var sumWall = 0.0
    var sumGap = 0.0
    jobs.values.toSeq.sortBy(_.start).foreach { j =>
      val w = (j.end - j.start) / 1e3
      val gap = if (prevEnd == 0) 0.0 else math.max(0, j.start - prevEnd) / 1e3
      sumWall += w; sumGap += gap
      prevEnd = math.max(prevEnd, j.end)
      val label = if (j.desc.nonEmpty) j.desc else j.site
      println(f"[job] ${j.id}%-4d wall=${w}%6.3fs gap=${gap}%6.3fs  ${label.take(110)}")
    }
    println(f"rows=$n wall=$wall%.2f s  jobs=${jobs.size} " +
      f"sumJobWall=$sumWall%.2f sumGap=$sumGap%.2f")
    spark.stop()
  }
}
