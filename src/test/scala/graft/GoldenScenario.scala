package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loader for the reference's golden-scenario fixture format: YAML files
  * whose top-level entries are `relative/path: |2-` blocks of CSV with
  * "MM/DD/YYYY, HH:MM:SS" timestamps (stages/examples.py:875-922). Only the
  * CSV-block subset of YAML is parsed — exactly what the fixtures use.
  */
object GoldenScenario {

  private val KeyLine = """^([^\s:][^:]*):\s*\|.*$""".r

  /** Parse a blocks file into {relative path (sans .parquet) → CSV text}. */
  def parseBlocks(path: String): Map[String, String] = {
    val lines = scala.io.Source.fromFile(path).getLines().toSeq
    val out = scala.collection.mutable.LinkedHashMap.empty[String, StringBuilder]
    var current: Option[StringBuilder] = None
    lines.foreach {
      case KeyLine(key) =>
        val sb = new StringBuilder
        out(key.trim.stripSuffix(".parquet")) = sb
        current = Some(sb)
      case l if l.startsWith("  ") && current.isDefined =>
        current.get.append(l.drop(2)).append("\n")
      case l if l.trim.isEmpty => ()
      case _ => current = None
    }
    out.map { case (k, v) => k -> v.toString }.toMap
  }

  /** Materialize one CSV block as a typed MEDS-ish DataFrame. */
  def csvDf(spark: SparkSession, csv: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.option("header", "true").option("quote", "\"")
      .csv(csv.split("\n").toSeq.toDS())
    raw.columns.foldLeft(raw) { (df, c) =>
      c match {
        case "subject_id" => df.withColumn(c, col(c).cast(LongType))
        case "time" => df.withColumn(c, to_timestamp(col(c), "MM/dd/yyyy, HH:mm:ss"))
        case "numeric_value" => df.withColumn(c, col(c).cast(FloatType))
        case n if n.endsWith("n_occurrences") || n.endsWith("n_subjects") =>
          df.withColumn(c, col(c).cast(LongType))
        case n if n.endsWith("sum") || n.endsWith("sum_sqd") =>
          df.withColumn(c, col(c).cast(DoubleType))
        case n if n.contains("is_inlier") =>
          df.withColumn(c, col(c).cast(BooleanType))
        case _ => df
      }
    }
  }

  /** Load the data shards of an in.yaml/out_data.yaml as one DataFrame with
    * a `shard` column, preserving per-shard row order via `__row_idx`.
    */
  def shardedData(spark: SparkSession, blocksFile: String): DataFrame = {
    val blocks = parseBlocks(blocksFile).filter(_._1.startsWith("data/"))
    blocks.map { case (path, csv) =>
      csvDf(spark, csv)
        .withColumn("shard", lit(path.stripPrefix("data/")))
        .withColumn(graft.meds.MedsSchema.RowIdx, monotonically_increasing_id())
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  def metadataTable(spark: SparkSession, blocksFile: String, name: String): Option[DataFrame] =
    parseBlocks(blocksFile).get(s"metadata/$name").map(csvDf(spark, _))

  /** Parse the record-form YAML metadata block (`metadata/codes.parquet:`
    * followed by `- code: …` entries with scalar fields, one optional level
    * of nested struct fields, and inline string lists) used by the full-agg
    * golden scenarios. Returns one ordered field map per record; nested
    * structs become nested maps.
    */
  def parseRecordMetadata(path: String,
      blockKey: String = "metadata/codes.parquet"): Seq[Map[String, Any]] = {
    import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}
    val lines = scala.io.Source.fromFile(path).getLines().toSeq
    val start = lines.indexWhere(_.trim == s"$blockKey:")
    require(start >= 0, s"$blockKey: not found in $path")
    val body = lines.drop(start + 1)
      .takeWhile(l => l.trim.isEmpty || l.startsWith("  "))
    def parseVal(raw: String): Any = {
      val v = raw.trim
      if (v.isEmpty || v == "null") null
      else if (v.startsWith("\"")) v.stripPrefix("\"").stripSuffix("\"")
      else if (v.startsWith("["))
        v.stripPrefix("[").stripSuffix("]").split(",")
          .map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
      else
        try { if (v.contains(".")) v.toDouble else v.toLong }
        catch { case _: NumberFormatException => v }
    }
    val records = ArrayBuffer.empty[LinkedHashMap[String, Any]]
    var nested: Option[LinkedHashMap[String, Any]] = None
    body.foreach {
      case l if l.trim.isEmpty => ()
      case l if l.startsWith("  - ") =>
        records += LinkedHashMap.empty; nested = None
        val Array(k, v) = l.drop(4).split(":", 2)
        records.last += k.trim -> parseVal(v)
      case l if l.startsWith("      ") && nested.isDefined =>
        val Array(k, v) = l.trim.split(":", 2)
        nested.get += k.trim -> parseVal(v)
      case l if l.startsWith("    ") =>
        val Array(k, v) = l.trim.split(":", 2)
        if (v.trim.isEmpty) {
          val m = LinkedHashMap.empty[String, Any]
          nested = Some(m); records.last += k.trim -> m
        } else { nested = None; records.last += k.trim -> parseVal(v) }
      case l => throw new IllegalArgumentException(s"unparsed metadata line: $l")
    }
    records.map(_.toMap.map {
      case (k, m: LinkedHashMap[_, _]) =>
        k -> m.asInstanceOf[LinkedHashMap[String, Any]].toMap
      case kv => kv
    }).toSeq
  }

  /** Compare a metadata DataFrame against a record-form golden file
    * (row-order-insensitive, keyed by `code`; reference tolerances; nested
    * quantile structs compared field-wise; null-code = all-codes row).
    */
  def assertRecordMetadataEquals(actual: DataFrame, expectedFile: String): Unit = {
    val rows = actual.collect()
    val got = rows.map(r => Option(r.getAs[String]("code")) -> r).toMap
    val expected = parseRecordMetadata(expectedFile)
    // row count BEFORE keying by code: a join fan-out duplicating codes
    // would otherwise collapse in the map and pass the size check
    assert(rows.length == expected.size,
      s"${rows.length} rows vs ${expected.size} expected")
    assert(got.size == expected.size, s"${got.size} rows vs ${expected.size} expected")
    def isIntegral(v: Any): Boolean = v match {
      case _: Long | _: Int | _: Short | _: Byte => true
      case _ => false
    }
    // counts are exact quantities: the float tolerance (abs 1e-5 + rel 1e-3)
    // would wave through off-by-one count bugs once counts reach ~1000
    def approxAny(c: String, e: Any, a: Any): Unit =
      if (isIntegral(e) && isIntegral(a))
        assert(asD(e) == asD(a), s"$c: expected $e got $a (exact integral)")
      else approx(c, asD(e), asD(a))
    def approx(c: String, e: Double, a: Double): Unit =
      assert(math.abs(e - a) <= 1e-5 + 1e-3 * math.abs(e), s"$c: expected $e got $a")
    def asD(v: Any): Double = v match {
      case d: Double => d; case f: Float => f.toDouble; case l: Long => l.toDouble
      case i: Int => i.toDouble; case s: Short => s.toDouble; case b: Byte => b.toDouble
    }
    expected.foreach { rec =>
      val code = Option(rec("code").asInstanceOf[String])
      val row = got(code)
      rec.foreach {
        case ("values/quantiles", null) =>
          assert(row.getAs[Any]("values/quantiles") == null,
            s"$code: expected null quantiles")
        case ("values/quantiles", qs: Map[_, _]) =>
          val struct = row.getAs[org.apache.spark.sql.Row]("values/quantiles")
          qs.asInstanceOf[Map[String, Any]].foreach { case (qk, qv) =>
            approx(s"$code.$qk", asD(qv), asD(struct.getAs[Any](qk)))
          }
        case ("parent_codes", null) => assert(row.getAs[Any]("parent_codes") == null)
        case ("parent_codes", pcs: Seq[_]) =>
          assert(row.getSeq[String](row.fieldIndex("parent_codes")) == pcs)
        case (f, null) => assert(row.getAs[Any](f) == null, s"$code.$f: expected null")
        case (f, s: String) => assert(row.getAs[Any](f) == s, s"$code.$f")
        case (f, v) => approxAny(s"$code.$f", v, row.getAs[Any](f))
      }
    }
  }

  /** Row-order-INsensitive metadata comparison (the reference compares
    * metadata frames unordered, examples.py:1033-1035): sort both sides by
    * the first column, compare the expected file's columns with the
    * reference tolerances.
    */
  def assertMetadataEquals(actual: DataFrame, expectedFile: String,
      spark: SparkSession): Unit = {
    val csv = parseBlocks(expectedFile)("metadata/codes")
    val exp = csvDf(spark, csv)
    val cols = exp.columns.toSeq
    cols.foreach(c => assert(actual.columns.contains(c), s"missing output column $c"))
    def sorted(rows: Array[org.apache.spark.sql.Row]) =
      rows.sortBy(r => Option(r.get(0)).map(_.toString).getOrElse(""))
    val ea = sorted(exp.select(cols.map(col): _*).collect())
    val aa = sorted(actual.select(cols.map(col): _*).collect())
    assert(aa.length == ea.length,
      s"expected ${ea.length} metadata rows, got ${aa.length}: " +
        s"expected codes ${ea.map(_.get(0)).mkString(",")} vs ${aa.map(_.get(0)).mkString(",")}")
    def asNum(v: Any): Option[Double] = v match {
      case d: Double => Some(d)
      case f: Float => Some(f.toDouble)
      case l: Long => Some(l.toDouble)
      case i: Int => Some(i.toDouble)
      case s: Short => Some(s.toDouble)
      case b: Byte => Some(b.toDouble)
      case _ => None
    }
    def integral(v: Any): Boolean = v match {
      case _: Long | _: Int | _: Short | _: Byte => true
      case _ => false
    }
    ea.zip(aa).foreach { case (e, a) =>
      cols.zipWithIndex.foreach { case (c, i) =>
        (e.get(i), a.get(i)) match {
          case (null, null) => ()
          // counts are exact — the float tolerance must not absorb
          // off-by-one count divergences at larger fixture scales
          case (ev, av) if integral(ev) && integral(av) =>
            assert(asNum(ev) == asNum(av),
              s"code ${e.get(0)} col $c: expected $ev got $av (exact integral)")
          case (ev, av) => (asNum(ev), asNum(av)) match {
            case (Some(x), Some(y)) =>
              assert(math.abs(x - y) <= 1e-5 + 1e-3 * math.abs(x),
                s"code ${e.get(0)} col $c: expected $x got $y")
            case _ => assert(ev == av, s"code ${e.get(0)} col $c: expected $ev got $av")
          }
        }
      }
    }
  }

  /** TIMESTAMP vs TIMESTAMP_NTZ values both render as the same instant under
    * the UTC session TZ — normalize for comparison. */
  private def norm(v: Any): Any = v match {
    case t: java.sql.Timestamp => t.toLocalDateTime
    case x => x
  }

  /** Row-order-sensitive per-shard comparison with the reference tolerances
    * (rel 1e-3, abs 1e-5 on floats).
    */
  def assertShardsEqual(actual: DataFrame, expectedFile: String, spark: SparkSession,
      compareCols: Seq[String]): Unit = {
    val expectedBlocks = parseBlocks(expectedFile).filter(_._1.startsWith("data/"))
    val actualRows = actual.collect() // already in stage output order
    // rows under shard names absent from the golden file must FAIL, not be
    // silently skipped by the per-expected-shard iteration below
    val expectedShards = expectedBlocks.keySet.map(_.stripPrefix("data/"))
    val actualShards = actualRows.map(_.getAs[String]("shard")).toSet
    assert(actualShards.subsetOf(expectedShards),
      s"unexpected shards in output: ${actualShards -- expectedShards}")
    expectedBlocks.foreach { case (path, csv) =>
      val shard = path.stripPrefix("data/")
      val exp = csvDf(spark, csv).collect()
      val act = actualRows.filter(_.getAs[String]("shard") == shard)
      assert(act.length == exp.length,
        s"shard $shard: expected ${exp.length} rows, got ${act.length}")
      exp.zip(act).zipWithIndex.foreach { case ((e, a), i) =>
        compareCols.foreach { c =>
          val ev = if (e.schema.fieldNames.contains(c)) e.getAs[Any](c) else null
          val av = a.getAs[Any](c)
          (norm(ev), norm(av)) match {
            case (null, null) => ()
            case (x: Float, y: Float) =>
              assert(math.abs(x - y) <= 1e-5 + 1e-3 * math.abs(x),
                s"shard $shard row $i col $c: expected $x got $y")
            case (x, y) =>
              assert(x == y, s"shard $shard row $i col $c: expected $x got $y")
          }
        }
      }
    }
  }
}
