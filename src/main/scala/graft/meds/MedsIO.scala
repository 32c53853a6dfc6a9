package graft.meds

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A MEDS dataset: the event-data table plus its two metadata side tables.
  *
  * Mirrors the reference's on-disk layout (sharded parquet under data/,
  * metadata/codes.parquet, metadata/subject_splits.parquet — see
  * /root/reference/src/MEDS_transforms/mapreduce/stage.py:64-168) but as live
  * DataFrames: the whole shard set is one DataFrame with `split`/`shard`
  * provenance columns so per-shard outputs remain reproducible.
  */
final case class MedsData(
    data: DataFrame,
    codes: DataFrame,
    splits: DataFrame
) {
  def withData(d: DataFrame): MedsData = copy(data = d)
  def withCodes(c: DataFrame): MedsData = copy(codes = c)
  def withSplits(s: DataFrame): MedsData = copy(splits = s)
}

object MedsIO {
  import MedsSchema._

  /** Read a MEDS dataset root (sharded parquet under data/ + metadata/).
    *
    * The shard identity is recovered from the file path (`split/shardIdx`),
    * replacing the reference's shard_iterator (shard_iteration.py:70-316):
    * under Spark the directory scan + partition pruning does the enumeration
    * and `trainOnly` becomes a filter Catalyst pushes into the scan.
    */
  def read(spark: SparkSession, root: String): MedsData = {
    val data = readData(spark, root)
    // a streaming sink writes data/ before any metadata exists — a missing
    // codes table falls back to empty (same contract as splits below), so
    // batch operators can run over a root a stream is still appending to
    val codes = readMetadataTable(spark, s"$root/metadata/codes.parquet", codesSchema)
    // Only a *missing* splits table falls back to empty; a corrupt or
    // unreadable one must propagate (ADVICE r1: silently-empty splits made
    // trainOnly drop every row with no error surfaced).
    val splits = readMetadataTable(spark,
      s"$root/metadata/subject_splits.parquet", splitsSchema)
    MedsData(data, codes, splits)
  }

  /** Read one metadata side table. A missing table falls back to the
    * canonical empty frame (a streaming sink writes data/ before any
    * metadata exists). A PRESENT table whose footer proves 0 rows at the
    * canonical column set ALSO resolves to that frame — the footer check
    * is driver-side (no job), and restoring the statically-empty
    * LocalRelation is what lets the NEXT checkpoint's writeMetadataTable
    * skip its write job again (a scan of the empty file would defeat the
    * plan-only emptiness check on every downstream stage). Non-canonical
    * or non-empty tables read normally.
    */
  private def readMetadataTable(spark: SparkSession, path: String,
      canonical: org.apache.spark.sql.types.StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def emptyCanonical = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], canonical)
    if (!fs.exists(p)) emptyCanonical
    else if (fs.getFileStatus(p).isFile &&
        graft.plans.ParquetStats.rowCount(spark, path).contains(0L)) {
      // name/type equality modulo nullability: an empty frame carries no
      // rows for nullability to matter, but a different column SET must
      // keep the file's own schema
      val df = spark.read.parquet(path)
      val same = df.schema.length == canonical.length &&
        df.schema.zip(canonical).forall { case (a, b) =>
          a.name == b.name && a.dataType == b.dataType }
      if (same) emptyCanonical else df
    } else spark.read.parquet(path)
  }

  /** The data-table half of read(): sharded parquet under `root/data` with
    * the shard identity recovered from the file path. A root carrying
    * `.shards.json` is a RESHARDED root (written by writeReshardedData):
    * its shard identity is restored as the integer index — the same
    * convention ReshardToSplit emits — so a checkpoint-resumed pipeline
    * keeps writing the resharded layout instead of silently reverting to
    * the default one.
    */
  private def readData(spark: SparkSession, root: String): DataFrame = {
    val pathShard = spark.read
      .option("recursiveFileLookup", "true") // shards live in split subdirs
      .parquet(s"$root/data")
      .withColumn(Shard,
        // Tolerate a Hive-style layout (data/split=train/...) by stripping the
        // partition-column prefix, so Shard is always "<split>/<file>". A
        // checkpointed flat root writes its empty split as Hive's default
        // partition dir — strip that too, restoring split="" so trainOnly's
        // splits-table fallback still applies after a round-trip.
        regexp_replace(
          regexp_replace(
            regexp_extract(input_file_name(), """.*/data/(.+)\.parquet""", 1),
            """^split=""", ""),
          """^__HIVE_DEFAULT_PARTITION__/""", ""))
      .withColumn(Split, regexp_extract(col(Shard), """^([^/]+)/""", 1))
    val shardsJson = new org.apache.hadoop.fs.Path(s"$root/.shards.json")
    if (shardsJson.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(shardsJson))
      // "<split>/<idx>.parquet" or "<split>/<idx>/<file>.parquet" -> idx
      pathShard.withColumn(Shard,
        regexp_extract(col(Shard), """^[^/]+/(\d+)""", 1).cast("int"))
    else pathShard
  }

  /** Write a MEDS dataset root. Data is written partitioned by shard columns
    * (split dirs) and sorted within partitions by (subject_id, time) — the
    * MEDS invariant that every window/agg operator relies on, and what makes
    * subject-disjoint per-shard reductions correct at 100 TB.
    *
    * On-disk layout matches the reference (`data/<split>/<file>.parquet`,
    * mapreduce/stage.py:64-101), NOT Hive's `data/split=<split>/`: the
    * partitioned write is followed by a metadata-only directory rename that
    * strips the `split=` prefix, so a graft-written root round-trips through
    * read() with the split value intact (ADVICE r1 high).
    */
  /** Marker committed LAST by write(): its presence proves data AND both
    * metadata tables finished (data/_SUCCESS alone only covers the data job
    * — a crash between it and the metadata writes must not look complete).
    */
  val CompleteMarker = "_GRAFT_COMPLETE"

  def write(meds: MedsData, root: String): Unit = {
    val markerPath = new org.apache.hadoop.fs.Path(s"$root/$CompleteMarker")
    val markerFs = markerPath.getFileSystem(
      meds.data.sparkSession.sparkContext.hadoopConfiguration)
    markerFs.delete(markerPath, false) // a rewrite invalidates prior completion
    // An INTEGER `shard` column is an explicit reshard assignment
    // (ReshardToSplit output) and is persisted as the reference's resharded
    // layout `data/<split>/<shardIdx>.parquet` plus a root `.shards.json`
    // (reshard_to_split.py:264-333); the path-derived STRING shard from
    // read() is provenance only and takes the default layout.
    val intShard = meds.data.schema.fields
      .exists(f => f.name == Shard && f.dataType == org.apache.spark.sql.types.IntegerType)
    if (intShard) writeReshardedData(meds.data, root)
    else {
      // a stale .shards.json from an earlier resharded write to the same
      // dir would make read() misparse the new layout's shard identities
      val shardsJson = new org.apache.hadoop.fs.Path(s"$root/.shards.json")
      markerFs.delete(shardsJson, false)
      val withSplit =
        if (meds.data.columns.contains(Split)) meds.data
        else meds.data.withColumn(Split, lit(TrainSplit))
      // the path-derived shard provenance is re-created by read(); writing
      // it as a data column would add a field the MEDS layout doesn't have
      val bare = withSplit.drop(Shard)
      // the (subject_id, time) sorted layout is the MEDS invariant — but
      // the pipeline also carries NON-MEDS tables (a documents corpus
      // through the hygiene stages, a session table): for those, partition
      // by split alone instead of failing on absent MEDS columns
      val sortCols = Seq(SubjectId, Time).filter(bare.columns.contains)
      val arranged = sortCols match {
        // non-MEDS table (no subject/time): write as-is — each task emits
        // its own file per split it holds. Repartitioning on Split alone
        // would hash every row of a split into ONE task (a serialized
        // write at 100 TB) for no invariant in return.
        case Seq() => bare
        case cs => bare.repartition(col(Split), col(cs.head))
          .sortWithinPartitions(cs.map(col): _*)
      }
      arranged.write.mode("overwrite").partitionBy(Split).parquet(s"$root/data")
      // Strip Hive partition-dir prefixes: data/split=train -> data/train.
      val dataPath = new org.apache.hadoop.fs.Path(s"$root/data")
      val fs = dataPath.getFileSystem(
        meds.data.sparkSession.sparkContext.hadoopConfiguration)
      fs.listStatus(dataPath).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory && name.startsWith("split="))
          fs.rename(st.getPath,
            new org.apache.hadoop.fs.Path(dataPath, name.stripPrefix("split=")))
      }
    }
    writeMetadataTable(meds.codes, codesSchema, s"$root/metadata/codes.parquet")
    writeMetadataTable(meds.splits, splitsSchema,
      s"$root/metadata/subject_splits.parquet")
    markerFs.create(markerPath, true).close()
  }

  /** Write one metadata side table — bypassing the Spark job entirely when
    * the frame is STATICALLY empty at the canonical schema (an empty
    * LocalRelation / zero-partition RDD, the shape every pipeline carries
    * for a metadata table it never populated): a single empty parquet FILE
    * (footer-only, zero row groups) is written driver-side instead. Each
    * composed pipeline checkpoint was paying 2 write jobs (~0.1 s each at
    * bench scale) to persist zero rows — at cluster scale it is 2 fewer
    * commit-protocol rounds per stage. Unlike r17's skip-and-delete, the
    * canonical file SET stays on disk (ADVICE r17 medium: the reference's
    * compute_fn does an unguarded read of metadata/codes.parquet, and
    * MEDS consumers expect the file to exist, possibly empty), and
    * Main's zero-job footer row counts keep working. The emptiness check
    * is plan-only (no job): a frame that MIGHT be empty but needs
    * execution to know is written normally. The stale target (possibly a
    * directory from a prior distributed write) is removed first so a
    * prior non-empty write to the same root cannot resurface.
    */
  private def writeMetadataTable(df: DataFrame,
      canonical: org.apache.spark.sql.types.StructType, path: String): Unit = {
    val staticallyEmpty = df.schema == canonical &&
      (df.queryExecution.optimizedPlan match {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
          l.data.isEmpty
        case _: org.apache.spark.sql.execution.LogicalRDD =>
          df.queryExecution.toRdd.getNumPartitions == 0
        case _ => false
      })
    val p = new org.apache.hadoop.fs.Path(path)
    if (staticallyEmpty)
      writeEmptyParquetFile(df.sparkSession, canonical, p)
    else df.write.mode("overwrite").parquet(path)
  }

  /** One valid parquet file with the given schema and zero row groups,
    * written on the driver with parquet-hadoop directly — no Spark job, no
    * commit protocol. The footer carries Spark's row-metadata key so a
    * read-back resolves to exactly the canonical StructType (same as a
    * distributed Spark write of the empty frame would).
    */
  private def writeEmptyParquetFile(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      p: org.apache.hadoop.fs.Path): Unit = {
    import org.apache.parquet.hadoop.ParquetFileWriter
    val conf = spark.sparkContext.hadoopConfiguration
    fsFor(p).delete(p, true) // prior write may have left a DIRECTORY here
    val msgType = org.apache.spark.sql.GraftSqlBridge.parquetMessageType(spark, schema)
    val w = new ParquetFileWriter(conf, msgType, p,
      ParquetFileWriter.Mode.OVERWRITE)
    w.start()
    w.end(java.util.Collections.singletonMap(
      "org.apache.spark.sql.parquet.row.metadata", schema.json))
  }

  /** Resharded data layout: one `data/<split>/<shardIdx>.parquet` file per
    * (split, shard) — the reference's exact on-disk shape, which read()
    * round-trips to shard name `"<split>/<shardIdx>"` with no special
    * casing. Each (split, shard) pair lands in exactly one task (the
    * repartition key), so each Hive partition dir holds one file and the
    * dir-to-file collapse is a metadata-only rename. Shards are bounded by
    * construction (n_subjects_per_shard), so one file per shard is the
    * scale-correct unit too. `.shards.json` is derived from the files just
    * written (layout-truthful) and streamed — never collected whole.
    */
  private def writeReshardedData(data: DataFrame, root: String): Unit = {
    val spark = data.sparkSession
    data
      .repartition(col(Split), col(Shard))
      .sortWithinPartitions(Split, Shard, SubjectId, Time)
      .write.mode("overwrite").partitionBy(Split, Shard).parquet(s"$root/data")
    val dataPath = new org.apache.hadoop.fs.Path(s"$root/data")
    val fs = dataPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dataPath).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("split=")) {
        val splitDir = new org.apache.hadoop.fs.Path(dataPath, name.stripPrefix("split="))
        fs.rename(st.getPath, splitDir)
        fs.listStatus(splitDir).foreach { sh =>
          val shName = sh.getPath.getName
          if (sh.isDirectory && shName.startsWith("shard=")) {
            val idx = shName.stripPrefix("shard=")
            val files = fs.listStatus(sh.getPath)
              .filter(_.getPath.getName.endsWith(".parquet"))
            if (files.length == 1) {
              // collapse dir/part-*.parquet -> <idx>.parquet (reference shape)
              fs.rename(files(0).getPath,
                new org.apache.hadoop.fs.Path(splitDir, s"$idx.parquet"))
              fs.delete(sh.getPath, true)
            } else {
              // multi-file shard (maxRecordsPerFile etc.): keep the dir; read()
              // still recovers a per-file shard id prefixed "<split>/<idx>/"
              fs.rename(sh.getPath, new org.apache.hadoop.fs.Path(splitDir, idx))
            }
          }
        }
      }
    }
    writeShardsJson(readData(spark, root), root)
  }

  /** Attach the engine-wide stable-order row index (monotonic within the
    * input order of each file split; globally ordered across partitions).
    */
  def withRowIdx(df: DataFrame): DataFrame =
    df.withColumn(RowIdx, monotonically_increasing_id())

  /** Bucketed event-table write: hash-bucket by subject_id and sort within
    * buckets by (subject_id, time). This is the cluster-scale layout: every
    * per-subject window (timeline tokens, filters, sessionization) and every
    * subject-keyed join on two so-bucketed tables runs WITHOUT a shuffle —
    * Spark matches the bucket spec to the operator's required distribution.
    * See GoldenSpec("bucketed layout") for the plan-level proof.
    */
  def writeBucketed(data: DataFrame, tableName: String, numBuckets: Int): Unit =
    data.write.mode("overwrite")
      .bucketBy(numBuckets, SubjectId)
      .sortBy(SubjectId, Time)
      .format("parquet")
      .saveAsTable(tableName)

  // Hadoop FS for the small JSON side files too — java.nio paths would break
  // the moment the root is s3://, hdfs:// etc. while parquet IO works fine
  private def fsFor(path: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.FileSystem = {
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    path.getFileSystem(conf)
  }

  private def writeStringFile(path: org.apache.hadoop.fs.Path, content: String): Unit = {
    val out = fsFor(path).create(path, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readStringFile(path: org.apache.hadoop.fs.Path): Option[String] = {
    val fs = fsFor(path)
    if (!fs.exists(path)) None
    else {
      val in = fs.open(path)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  /** metadata/dataset.json (reference configs/dataset.py:17-53). */
  def writeDatasetMetadata(root: String, name: String, version: String,
      extra: Map[String, String] = Map.empty): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("dataset_name", name)
    node.put("dataset_version", version)
    extra.foreach { case (k, v) => node.put(k, v) }
    writeStringFile(new org.apache.hadoop.fs.Path(s"$root/metadata/dataset.json"),
      mapper.writerWithDefaultPrettyPrinter.writeValueAsString(node))
  }

  /** `<sweepRoot>/multirun.json` — the analog of Hydra's `multirun.yaml`:
    * the job-index → override-combo mapping of a `--multirun` value sweep,
    * written BEFORE the jobs run so a crashed sweep still documents which
    * `run_<i>` directory was which combination.
    */
  def writeMultirunManifest(root: String, jobs: Seq[Seq[String]]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    val arr = node.putArray("jobs")
    jobs.zipWithIndex.foreach { case (combo, i) =>
      val j = arr.addObject()
      j.put("job", i)
      j.put("output", s"run_$i")
      val o = j.putArray("overrides")
      combo.foreach(o.add)
    }
    writeStringFile(new org.apache.hadoop.fs.Path(s"$root/multirun.json"),
      mapper.writerWithDefaultPrettyPrinter.writeValueAsString(node))
  }

  def readDatasetMetadata(root: String): Map[String, String] = {
    readStringFile(new org.apache.hadoop.fs.Path(s"$root/metadata/dataset.json"))
      .map { content =>
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(content)
        val it = node.fields()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText }
        b.result()
      }.getOrElse(Map.empty)
  }

  /** `.shards.json` — the {split/shardIdx → subject ids} map the reference's
    * resharding emits (reshard_to_split.py:232-261). Computed from the
    * resharded data itself so it is layout-truthful, and STREAMED: the
    * distinct+sort runs distributed, `toLocalIterator` pulls one partition
    * at a time, and a Jackson generator writes straight to the (Hadoop FS)
    * output stream — driver memory is bounded by one partition even at 10⁸+
    * subjects, where the previous whole-map collect was an OOM hazard.
    * Accepts both shard conventions: an integer reshard assignment and the
    * path-derived `"<split>/<idx>"` string from read().
    */
  def writeShardsJson(resharded: DataFrame, root: String): Unit = {
    val shardStr = col(Shard).cast("string")
    val key0 = when(shardStr.startsWith(concat(col(Split), lit("/"))), shardStr)
      .otherwise(concat(col(Split), lit("/"), shardStr))
    // a multi-file shard dir ("train/0/part-*.parquet") must still map to
    // ONE "train/0" key — per-file keys would split a shard's subject list
    val key = regexp_replace(key0, """^([^/]+/\d+)/.*$""", "$1")
    val rows = resharded
      .select(key.as("__key"), col(SubjectId))
      .distinct()
      .orderBy("__key", SubjectId)
      .toLocalIterator()
    val out = fsFor(new org.apache.hadoop.fs.Path(s"$root/.shards.json"))
      .create(new org.apache.hadoop.fs.Path(s"$root/.shards.json"), true)
    val gen = new com.fasterxml.jackson.core.JsonFactory()
      .createGenerator(out: java.io.OutputStream)
    gen.setPrettyPrinter(new com.fasterxml.jackson.core.util.DefaultPrettyPrinter())
    try {
      gen.writeStartObject()
      var current: String = null
      while (rows.hasNext) {
        val r = rows.next()
        val k = r.getString(0)
        if (k != current) {
          if (current != null) gen.writeEndArray()
          gen.writeArrayFieldStart(k)
          current = k
        }
        gen.writeNumber(r.getLong(1))
      }
      if (current != null) gen.writeEndArray()
      gen.writeEndObject()
    } finally {
      gen.close() // closes the underlying FS stream too
    }
  }
}
