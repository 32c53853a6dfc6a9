package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Corpus interchange sources beyond the MEDS parquet layout. LLM training
  * corpora overwhelmingly arrive as JSONL (one JSON object per line — the
  * common-crawl / RedPajama / Dolma convention), so the pipeline can load
  * and emit it directly.
  *
  * Scale notes: a JSONL read with an explicit schema is a single streamed
  * pass, splittable per line like any text source; schema INFERENCE is a
  * whole extra corpus scan before the first real job — at 100 TB always
  * pass the DDL. Malformed lines follow Spark's PERMISSIVE default (the
  * row surfaces as all-null instead of failing the scan), matching the
  * json_extract stage's contract that one bad record in an untrusted crawl
  * must not kill the job.
  */
object CorpusSources {

  /** Read a JSONL corpus. `ddl` is the explicit schema ("a BIGINT, b
    * STRING"); omitting it falls back to Spark's inference pass (fine for
    * tests and small corpora, an extra full scan at scale).
    */
  def readJsonl(spark: SparkSession, path: String, ddl: Option[String] = None): DataFrame =
    ddl match {
      case Some(d) => spark.read.schema(StructType.fromDDL(d)).json(path)
      case None => spark.read.json(path)
    }

  /** Write a corpus as JSONL (Spark's json sink is one object per line —
    * JSONL by construction; string fields escape newlines/quotes, so the
    * round-trip is lossless for multi-line documents).
    */
  def writeJsonl(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)

  /** Read a CSV corpus. Explicit schema for the same single-pass reason;
    * `multiLine` tolerates quoted fields containing newlines (document text)
    * at the cost of file-level (not line-level) splits — prefer JSONL for
    * text-bearing corpora at scale.
    */
  def readCsv(spark: SparkSession, path: String, ddl: Option[String] = None,
      header: Boolean = true, multiLine: Boolean = false): DataFrame = {
    // explicit null sentinel (matching writeCsv): with the default
    // nullValue="" an empty string field reads back as null — CSV's
    // classic lossy-empty trap
    val r = spark.read.option("header", header).option("multiLine", multiLine)
      .option("nullValue", "\\N")
    ddl match {
      case Some(d) => r.schema(StructType.fromDDL(d)).csv(path)
      case None => r.option("inferSchema", true).csv(path)
    }
  }

  /** Nulls are written as the `\N` sentinel (and read back as null by
    * [[readCsv]]) so empty strings — written as quoted `""` — round-trip
    * as "" instead of collapsing into null (CSV's classic lossy-empty
    * trap under the default nullValue="").
    */
  def writeCsv(df: DataFrame, path: String, mode: String = "overwrite",
      header: Boolean = true): Unit =
    df.write.mode(mode).option("header", header)
      .option("nullValue", "\\N").option("emptyValue", "\"\"").csv(path)

  /** Read an ORC corpus (the Hive-era interchange format many institutional
    * corpora still live in). ORC is columnar with embedded schema and
    * file/stripe statistics: predicate pushdown and column pruning reach
    * the scan exactly as with parquet (OrcSourceSpec pins `PushedFilters`),
    * so no explicit DDL is needed — the schema rides the footer, not an
    * inference scan.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Write ORC. Complex types (arrays/structs — embeddings, token lists)
    * and timestamps round-trip natively.
    */
  def writeOrc(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).orc(path)
}
