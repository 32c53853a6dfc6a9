package graft

import org.apache.spark.sql.functions._
import graft.sources.CorpusSources

/** ORC source: lossless round-trip for nulls / empty strings / arrays /
  * timestamps, and scan-level pushdown+pruning (the properties that make a
  * columnar source usable at 100 TB).
  */
class OrcSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("round-trips nulls, empty strings, arrays and timestamps losslessly") {
    val df = Seq(
      (1L, "plain", Seq(0.5f, -1.0f), Option(ts("2024-01-02 03:04:05"))),
      (2L, "", Seq.empty[Float], None),
      (3L, null.asInstanceOf[String], null.asInstanceOf[Seq[Float]],
        Option(ts("1999-12-31 23:59:59")))
    ).toDF("id", "text", "vec", "t")
    val dir = tmpDir("orc_rt")
    CorpusSources.writeOrc(df, dir)
    val back = CorpusSources.readOrc(spark, dir)
    // nullability relaxes to true on read-back (all Spark file sources);
    // names and types must survive exactly
    assert(back.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq)
    assert(collectSet(back.orderBy("id")) == collectSet(df))
  }

  test("filters push down and columns prune at the ORC scan") {
    val dir = tmpDir("orc_push")
    CorpusSources.writeOrc(
      spark.range(1000).select(col("id"), concat(lit("d"), col("id")).as("text"),
        (col("id") % 7).as("grp")), dir)
    val q = CorpusSources.readOrc(spark, dir)
      .filter(col("grp") === 3).select("id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("grp"),
      s"no pushed filter in:\n$plan")
    // pruned read schema: text must not be read for an id projection
    assert(!plan.contains("text"), s"text column not pruned:\n$plan")
    assert(q.count() == 143)
  }
}
