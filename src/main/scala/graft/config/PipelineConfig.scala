package graft.config

import org.apache.spark.sql.DataFrame
import graft.dsl.Cfg
import graft.dsl.Cfg._
import graft.meds.MedsData
import graft.meds.MedsSchema._
import graft.operators._

/** Config-driven pipeline construction, mirroring the reference's pipeline
  * YAML surface (configs/pipeline.py:222-322, runner.py; stage entries are
  * either a bare stage name or {name: {stage config}}, with `_base_stage`
  * aliasing and `_match_revise` block rewriting). Configs are Cfg trees —
  * parsed from JSON via `Cfg.fromJson` or from the reference's own YAML
  * pipeline files via [[Yaml.parse]] (see [[fromFile]]).
  *
  * A pipeline built here is a sequence of `Pipeline.Stage`s executed on one
  * SparkSession by `Pipeline.run` — the reference's subprocess-per-stage,
  * file-lock, disk-round-trip orchestration collapses into chained DataFrame
  * transformations with optional checkpoints.
  */
object PipelineConfig {

  final case class Parsed(description: Option[String], stages: Seq[Pipeline.Stage],
      conf: Seq[(String, String)] = Nil,
      noCheckpoint: Set[String] = Set.empty)

  def fromJson(json: String): Parsed = fromCfg(Cfg.fromJson(json))

  def fromYaml(yaml: String): Parsed = fromCfg(Yaml.parse(yaml))

  /** Parse a pipeline config file, dispatching on extension (.yaml/.yml vs
    * JSON) — the reference's pipelines are YAML and run unmodified. Optional
    * `overrides` are Hydra-style `dotted.path=value` edits applied to the
    * parsed tree before stages are built (see [[Overrides]]).
    *
    * `pkg://pkg.path.file.yaml` paths resolve from the classpath — the JVM
    * analog of the reference's installed-package resolution
    * (utils.py resolve_pkg_path, configs/pipeline.py:296-305): dot segments
    * map to the package directory, the last segment is the extension, so
    * `pkg://my_pkg.configs.pipeline.yaml` loads the classpath resource
    * `my_pkg/configs/pipeline.yaml`.
    */
  def fromFile(path: String, overrides: Seq[String] = Nil): Parsed = {
    val text =
      if (path.startsWith("pkg://")) {
        val parts = path.stripPrefix("pkg://").split('.')
        require(parts.length >= 2, s"bad pkg:// path (need name.ext): $path")
        val resource = parts.init.mkString("/") + "." + parts.last
        val in = Thread.currentThread.getContextClassLoader.getResourceAsStream(resource)
        require(in != null, s"$path: classpath resource not found: $resource")
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      } else java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    val base = if (path.endsWith(".yaml") || path.endsWith(".yml")) Yaml.parse(text)
      else Cfg.fromJson(text)
    fromCfg(Overrides(base, overrides))
  }

  def fromCfg(cfg: Cfg): Parsed = {
    val m = cfg.asInstanceOf[M].v
    val desc = m.get("description").collect { case S(s) => s }
    val entries = m("stages").asInstanceOf[L].v.map(parseStageEntry)
    val stages = entries.map(_._1)
    // stages declaring `checkpoint: false` are excluded from a
    // checkpointRoot run's materialization: a narrow stage (a filter, a
    // projection) costs a full write+read cycle per run if checkpointed —
    // pure per-stage floor at ANY scale, since the downstream stage's scan
    // re-applies the narrow op for free. Default (absent) stays true:
    // materialize-every-stage is the reference's own execution model.
    val noCkpt = entries.collect { case (s, false) => s.name }.toSet
    // stage names key checkpoint dirs and resume lookups — duplicates would
    // silently collapse two stages onto one checkpoint, so reject them
    val dups = stages.groupBy(_.name).collect { case (n, ss) if ss.size > 1 => n }
    require(dups.isEmpty,
      s"duplicate stage names ${dups.mkString(", ")}: give repeated stages distinct " +
        "names with _base_stage aliasing")
    // optional top-level `conf:` map — per-pipeline Spark SQL conf (the
    // Hydra-config-group analog: a reporting pipeline over MBs declares
    // different engine settings than a 100 TB transform). Applied by the
    // runner for the DURATION of the run and restored after; only scalars.
    val conf = m.get("conf").map {
      case M(cm) => cm.toSeq.map {
        case (k, S(s)) => k -> s
        case (k, I(i)) => k -> i.toString
        case (k, D(d)) => k -> d.toString
        case (k, B(b)) => k -> b.toString
        case (k, other) => throw new IllegalArgumentException(
          s"conf `$k`: expected a scalar, got $other")
      }
      case other => throw new IllegalArgumentException(
        s"`conf` must be a map of scalars, got $other")
    }.getOrElse(Nil)
    Parsed(desc, stages, conf, noCkpt)
  }

  /** Returns the built stage plus its `checkpoint` flag (default true). */
  private def parseStageEntry(entry: Cfg): (Pipeline.Stage, Boolean) = entry match {
    case S(name) => (buildStage(name, name, Cfg.map()), true)
    case M(m) if m.size == 1 =>
      val (name, stageCfg) = m.head
      val cfgMap = stageCfg match { case mm: M => mm; case Null => Cfg.map().asInstanceOf[M]
        case other => throw new IllegalArgumentException(s"bad stage config for $name: $other") }
      val base = cfgMap.v.get("_base_stage").collect { case S(s) => s }.getOrElse(name)
      val ckpt = cfgMap.v.get("checkpoint") match {
        case Some(B(b)) => b
        case Some(other) => throw new IllegalArgumentException(
          s"stage $name: `checkpoint` must be a boolean, got $other")
        case None => true
      }
      (buildStage(name, base, M(cfgMap.v - "_base_stage" - "checkpoint")), ckpt)
    case other => throw new IllegalArgumentException(s"bad stage entry: $other")
  }

  // ---- config accessors -------------------------------------------------

  private[config] implicit class CfgOps(val c: Cfg) {
    def obj: Map[String, Cfg] = c match { case M(m) => m; case _ => Map.empty }
    // A key that is PRESENT but not readable as the expected type throws
    // instead of reading as absent: a quoted "1000" (or any typo'd value) on
    // e.g. `max_bucket` would otherwise silently disable the very guard the
    // user configured. Numeric strings coerce (YAML quoting is not an error).
    private def bad(k: String, want: String, got: Cfg): Nothing =
      throw new IllegalArgumentException(s"config key `$k`: expected $want, got $got")
    // explicit `key: null` reads as absent (the reference's Hydra configs use
    // null to disable optional thresholds)
    def getInt(k: String): Option[Int] = obj.get(k).flatMap {
      case Null => None
      case I(i) => Some(i.toInt)
      case D(d) => Some(d.toInt)
      case S(s) if s.trim.toIntOption.isDefined => Some(s.trim.toInt)
      case other => bad(k, "an integer", other)
    }
    // for 64-bit values (seeds): getInt would silently wrap them
    def getLong(k: String): Option[Long] = obj.get(k).flatMap {
      case Null => None
      case I(i) => Some(i)
      case D(d) => Some(d.toLong)
      case S(s) if s.trim.toLongOption.isDefined => Some(s.trim.toLong)
      case other => bad(k, "an integer", other)
    }
    def getDouble(k: String): Option[Double] = obj.get(k).flatMap {
      case Null => None
      case D(d) => Some(d)
      case I(i) => Some(i.toDouble)
      case S(s) if s.trim.toDoubleOption.isDefined => Some(s.trim.toDouble)
      case other => bad(k, "a number", other)
    }
    def getStr(k: String): Option[String] = obj.get(k).flatMap {
      case Null => None
      case S(s) => Some(s)
      case other => bad(k, "a string", other)
    }
    def getBool(k: String): Option[Boolean] = obj.get(k).flatMap {
      case Null => None
      case B(b) => Some(b)
      case S(s) if s.trim.toBooleanOption.isDefined => Some(s.trim.toBoolean)
      case other => bad(k, "a boolean", other)
    }
    def getList(k: String): Seq[Cfg] = obj.get(k).collect { case L(xs) => xs }.getOrElse(Nil)
    def strings(k: String): Seq[String] = getList(k).collect { case S(s) => s }
    /** An ordered `{name: number}` map (split fractions/weights) — one
      * coercion shared by every split-weighted stage. */
    def numberMap(k: String, owner: String): Option[Seq[(String, Double)]] =
      obj.get(k).map {
        case M(m) => m.toSeq.map {
          case (key, D(d)) => key -> d
          case (key, I(i)) => key -> i.toDouble
          case (key, other) => throw new IllegalArgumentException(
            s"$owner: bad number for $key in `$k`: $other")
        }
        case other => throw new IllegalArgumentException(
          s"$owner: `$k` must be a {name: number} map, got $other")
      }
  }

  // ---- stage builders ---------------------------------------------------

  /** Aggregations may be plain names or {name: values/quantiles, quantiles:
    * [...]} entries (cfg.yaml of aggregate_code_metadata scenarios).
    */
  private[graft] final case class ParsedAggs(names: Seq[String],
    quantiles: Seq[Double], quantileMode: String, sketchK: Int,
    subjectCountMode: String, subjectLgK: Int)

  private def parseAggregations(cfg: Cfg): ParsedAggs = {
    val dflt = ParsedAggs(AggregateCodeMetadata.AllAggregations,
      Seq(0.25, 0.5, 0.75), "nearest", graft.plans.KllExpressions.DefaultK,
      "exact", 12)
    val entries = cfg.getList("aggregations")
    if (entries.isEmpty) dflt
    else {
      var quantiles = dflt.quantiles
      var mode = dflt.quantileMode
      var sketchK = dflt.sketchK
      var subjMode = dflt.subjectCountMode
      var subjLgK = dflt.subjectLgK
      val subjectCountNames = Set(graft.meds.MedsSchema.CodeNSubjects,
        graft.meds.MedsSchema.ValuesNSubjects)
      val names = entries.map {
        case S(s) => s
        case m: M =>
          val name = m.getStr("name").getOrElse(
            throw new IllegalArgumentException(s"aggregation entry missing name: $m"))
          // a quantiles list only means anything on the values/quantiles
          // entry — honoring it from any entry would let a later unrelated
          // aggregation silently overwrite the configured quantiles
          if (name == graft.meds.MedsSchema.ValuesQuantiles) {
            quantiles = m.getList("quantiles").collect { case D(d) => d; case I(i) => i.toDouble } match {
              case Nil => quantiles
              case qs => qs
            }
            // algo: nearest (reference parity) | linear | sketch (KLL, the
            // hyper-cardinality path; sketch_k sizes the sketch)
            mode = m.getStr("algo").getOrElse(mode)
            sketchK = m.getInt("sketch_k").getOrElse(sketchK)
          }
          // algo: sketch on either subject-count entry switches BOTH to the
          // HLL estimate (one shared mode: mixing exact and sketched subject
          // counts in one metadata table would be a silent inconsistency)
          if (subjectCountNames.contains(name)) {
            subjMode = m.getStr("algo").getOrElse(subjMode)
            subjLgK = m.getInt("lg_k").getOrElse(subjLgK)
          }
          name
        case other => throw new IllegalArgumentException(s"bad aggregation entry: $other")
      }
      ParsedAggs(names, quantiles, mode, sketchK, subjMode, subjLgK)
    }
  }

  // ---- stage registry ---------------------------------------------------

  /** Third-party stage extension point, mirroring the reference's entry-point
    * discovery (stages/discovery.py:14-72): packages register a builder under
    * a base-stage name and pipeline configs can then reference it like any
    * built-in (including via `_base_stage` aliasing and `_match_revise` —
    * registered stages are consulted BEFORE the built-in match). The builder
    * receives (stage name, stage config).
    */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Cfg) => Pipeline.Stage]()

  // built-in hygiene stages (dedup / text signals / sampling) register through
  // the same path third-party stages use — see OpStages. Runs once when this
  // object initializes; `registry` is defined above so ordering is safe.
  OpStages.registerAll()

  def register(baseStage: String)(builder: (String, Cfg) => Pipeline.Stage): Unit =
    registry.put(baseStage, builder)

  def unregister(baseStage: String): Unit = registry.remove(baseStage)

  def registeredStages: Set[String] = {
    import scala.jdk.CollectionConverters._
    registry.keySet().asScala.toSet
  }

  /** The built-in reference stages (the `buildBuiltinStageInner` match arms
    * — kept in sync by PipelineConfigSpec, which builds each one). Together
    * with [[registeredStages]] this is the full `--list-stages` surface.
    */
  val BuiltinStages: Set[String] = Set(
    "aggregate_code_metadata", "fit_vocabulary_indices", "reshard_to_split",
    "generate_subject_splits", "filter_subjects", "filter_measurements",
    "occlude_outliers", "normalization", "reorder_measurements",
    "extract_values", "add_time_derived_measurements", "bin_numeric_values")

  def buildStage(name: String, baseStage: String, cfg: Cfg): Pipeline.Stage = {
    // single volatile read: a concurrent unregister cannot NPE us
    val b = registry.get(baseStage)
    if (b == null) buildBuiltinStage(name, baseStage, cfg)
    else buildRegisteredStage(b, name, cfg)
  }

  /** Registered stages get the SAME orchestration surface as built-ins: a
    * `train_only` override wraps the input and `_match_revise` rewrites the
    * stage into per-matcher blocks (both require the builder to yield data
    * stages; a metadata stage is already train-only via Pipeline.run).
    */
  private def buildRegisteredStage(b: (String, Cfg) => Pipeline.Stage,
      name: String, cfg: Cfg): Pipeline.Stage = {
    val trainOnly = cfg.getBool("train_only").getOrElse(false)
    val hasMatchRevise = cfg.obj.contains("_match_revise")
    if (!trainOnly && !hasMatchRevise) b(name, cfg)
    else {
      val stageCfg = cfg match { case M(m0) => M(m0 - "train_only"); case c => c }
      def simple(c: Cfg): MedsData => DataFrame = b(name, c) match {
        case Pipeline.DataStage(_, f) => f
        case _ => throw new IllegalArgumentException(
          s"stage $name: _match_revise requires a data stage")
      }
      if (hasMatchRevise) {
        val xform = dataTransformWith(simple, stageCfg)
        if (trainOnly) Pipeline.DataStage(name, m => xform(Pipeline.trainOnly(m)))
        else Pipeline.DataStage(name, m => xform(m))
      } else b(name, stageCfg) match {
        case Pipeline.DataStage(_, f) =>
          Pipeline.DataStage(name, m => f(Pipeline.trainOnly(m)))
        case ms => ms // metadata stages are train-only via Pipeline.run already
      }
    }
  }

  /** train_only is hoisted HERE so every present and future data-stage case
    * honors it uniformly (config_overwrites may set it on ANY stage,
    * pipeline.py:430): the case arms see the stripped stage config, and any
    * DataStage they return gets its input wrapped. Metadata stages are
    * train-only via Pipeline.run already.
    */
  private def buildBuiltinStage(name: String, baseStage: String, cfg: Cfg): Pipeline.Stage = {
    val stageCfg = cfg match { case M(m0) => M(m0 - "train_only"); case c => c }
    val stage = buildBuiltinStageInner(name, baseStage, stageCfg)
    if (!cfg.getBool("train_only").getOrElse(false)) stage
    else stage match {
      case Pipeline.DataStage(n, f) =>
        Pipeline.DataStage(n, m => f(Pipeline.trainOnly(m)))
      case ms => ms
    }
  }

  private def buildBuiltinStageInner(name: String, baseStage: String, cfg: Cfg): Pipeline.Stage = baseStage match {
    case "aggregate_code_metadata" =>
      val pa = parseAggregations(cfg)
      val mods = cfg.strings("code_modifiers")
      val summarize = cfg.getBool("do_summarize_over_all_codes").getOrElse(false)
      Pipeline.MetadataStage(name, m =>
        AggregateCodeMetadata(m.data, m.codes, pa.names, pa.quantiles, mods,
          summarize, pa.quantileMode, pa.sketchK, pa.subjectCountMode,
          pa.subjectLgK))
    case "fit_vocabulary_indices" =>
      Pipeline.MetadataStage(name, m =>
        FitVocabularyIndices(m.codes, cfg.strings("code_modifiers")))
    case "reshard_to_split" =>
      // Reference stage config (reshard_to_split/config.yaml + reshard_to_split
      // .py:264-333): n_subjects_per_shard (default 50000) sizes shards per
      // split; n_shards fixes the count instead when given. The distributed
      // seeded assignment is the default; reference_parity=true selects the
      // driver-side permutation that structurally matches the reference's
      // collected numpy shuffle.
      val nShards = cfg.getInt("n_shards")
      val perShard = cfg.getInt("n_subjects_per_shard")
      val seed = cfg.getLong("seed").getOrElse(0L)
      val parity = cfg.getBool("reference_parity").getOrElse(false)
      Pipeline.DataStage(name, m => {
        import org.apache.spark.sql.functions.{col, length}
        // splits table when present; else fall back to the path-derived split
        // (a root written without subject_splits but with split dirs)
        val splitsSrc =
          if (m.splits.isEmpty)
            m.data.filter(length(col(graft.meds.MedsSchema.Split)) > 0)
              .select(graft.meds.MedsSchema.SubjectId, graft.meds.MedsSchema.Split)
              .distinct()
          else m.splits
        // fail FAST on a root with no split information at all: the inner
        // join against an empty assignment would otherwise complete
        // "successfully" with zero rows — the silent-drop failure mode the
        // r1 advice on MedsIO.read exists to prevent
        require(!splitsSrc.isEmpty,
          s"reshard_to_split stage '$name': no split information — the root has " +
            "neither a metadata/subject_splits.parquet table nor split " +
            "directories under data/")
        val assignment = (nShards, parity) match {
          case (Some(k), false) => ReshardToSplit.assignShardsDistributed(splitsSrc, k, seed)
          case (Some(k), true) => ReshardToSplit.assignShardsSeeded(splitsSrc, k, seed)
          case (None, false) =>
            ReshardToSplit.assignShardsDistributedBySize(splitsSrc, perShard.getOrElse(50000), seed)
          case (None, true) =>
            ReshardToSplit.assignShardsBySize(splitsSrc, perShard.getOrElse(50000), seed)
        }
        ReshardToSplit.applyAssigned(m.data, assignment)
      })
    case "generate_subject_splits" =>
      // Config-reachable analog of shard_subjects' IID split generation
      // (reshard_to_split.py:25-110: split_fracs_dict, default 0.8/0.1/0.1,
      // plus the external-splits contract): subjects already present in the
      // splits table KEEP their split — only unassigned subjects draw a
      // seeded IID split by fraction. Replaces MedsData.splits for every
      // downstream stage, so `generate_subject_splits -> reshard_to_split`
      // runs on a root with no split information at all.
      val fracs = cfg.numberMap("split_fracs", s"stage $name").getOrElse(
        Seq(TrainSplit -> 0.8, TuningSplit -> 0.1, HeldOutSplit -> 0.1))
      val seed = cfg.getLong("seed").getOrElse(1L)
      val parity = cfg.getBool("reference_parity").getOrElse(false)
      Pipeline.SplitsStage(name, m => {
        import org.apache.spark.sql.functions.{col, countDistinct}
        val subjects = m.data.select(col(SubjectId)).distinct()
        // a subject listed under TWO different splits is a silent-leakage
        // hazard: dropDuplicates would keep an arbitrary row, so a held_out
        // subject could nondeterministically land in train on some runs.
        // Fail fast with examples instead (identical duplicate rows are fine
        // — distinct() collapses them first).
        val existing = m.splits.select(col(SubjectId), col(Split)).distinct()
        val conflicted = existing.groupBy(SubjectId)
          .agg(countDistinct(col(Split)).as("__n_splits"))
          .filter(col("__n_splits") > 1)
          .limit(5).collect().map(_.get(0))
        require(conflicted.isEmpty,
          s"stage $name: subject(s) ${conflicted.mkString(", ")} appear under " +
            "more than one split in the external splits table — resolve the " +
            "conflict upstream (an arbitrary winner would silently leak " +
            "held-out subjects into training)")
        val unassigned = subjects.join(existing, Seq(SubjectId), "left_anti")
        val assigned =
          if (parity) ReshardToSplit.assignSplitsByFrac(unassigned, fracs, seed)
          else ReshardToSplit.assignSplitsByFracDistributed(unassigned, fracs, seed)
        existing.unionByName(assigned)
      })
    case _ =>
      // resolve the transform EAGERLY so an unknown stage name fails at
      // config-parse time, not mid-pipeline when the stage first executes
      // (train_only was already stripped and is handled by the caller)
      val xform = dataTransform(baseStage, cfg)
      Pipeline.DataStage(name, m => xform(m))
  }

  /** Data-stage transformation for `baseStage` under `cfg`; `_match_revise`
    * (compute_modes/match_revise.py) rewrites it into per-matcher blocks with
    * block-level config overrides.
    */
  private def dataTransform(baseStage: String, cfg: Cfg): MedsData => DataFrame =
    dataTransformWith(simpleDataTransform(baseStage, _), cfg)

  /** The `_match_revise` rewrite over an arbitrary stage-transform factory —
    * shared by built-in and registered stages.
    */
  private def dataTransformWith(simple: Cfg => MedsData => DataFrame,
      cfg: Cfg): MedsData => DataFrame = {
    cfg.obj.get("_match_revise") match {
      case Some(L(blocks)) =>
        val mode = cfg.getStr("_match_revise_mode").getOrElse("match_and_revise")
        val parsed = blocks.map { b =>
          val bm = b.obj
          val matcher = M(scala.collection.immutable.ListMap(
            bm("_matcher").obj.toSeq: _*))
          // train_only is orchestration config, never stage config — strip it
          // at the block level too (the top-level strip in buildStage does
          // not see override maps)
          val overrides = M(scala.collection.immutable.ListMap(
            (cfg.obj - "_match_revise" - "_match_revise_mode" - "train_only"
              ++ (bm - "_matcher" - "train_only")).toSeq: _*))
          (matcher, overrides)
        }
        m => {
          val blockDefs = parsed.map { case (matcher, overrides) =>
            MatchRevise.Block(matcher, df => dataTransformWith(simple, overrides)(m.withData(df)))
          }
          MatchRevise(m.data, blockDefs, multi = mode == "multi_match_and_revise")
        }
      case _ => simple(cfg)
    }
  }

  private def simpleDataTransform(baseStage: String, cfg: Cfg): MedsData => DataFrame =
    baseStage match {
      case "filter_subjects" => m =>
        FilterSubjects(m.data,
          cfg.getInt("min_measurements_per_subject"),
          cfg.getInt("min_events_per_subject"))
      case "filter_measurements" => m =>
        FilterMeasurements(m.data, m.codes,
          cfg.getInt("min_subjects_per_code"),
          cfg.getInt("min_occurrences_per_code"),
          cfg.strings("code_modifiers"))
      case "occlude_outliers" => m =>
        OccludeOutliers(m.data, m.codes,
          cfg.getDouble("stddev_cutoff").getOrElse(4.5),
          cfg.strings("code_modifiers"))
      case "normalization" => m =>
        Normalization(graft.meds.MedsIO.withRowIdx(m.data), m.codes,
          cfg.strings("code_modifiers"))
      case "reorder_measurements" => m =>
        ReorderMeasurements(m.data, cfg.strings("ordered_code_patterns"))
      case "extract_values" => m =>
        ExtractValues(m.data, cfg.obj.toSeq.filterNot(_._1.startsWith("_")))
      case "add_time_derived_measurements" => m => {
        // Generators in config-key order through the sequential-semantics,
        // single-sort driver (addAll): later generators' rows precede earlier
        // ones' within a block — the reference's per-functor prepend
        // (add_time_derived_measurements.py:174-231) — and TIMELINE//END
        // lands after the block, all with ONE global sort.
        import AddTimeDerivedMeasurements.Generator
        val gens = cfg.obj.toSeq.collect {
          case (_, Cfg.Null) => None // feature: None skips it, like the reference
          case ("age", ac) => Some(Generator(df =>
            AddTimeDerivedMeasurements.ageEvents(df,
              ac.getStr("DOB_code").getOrElse("MEDS_BIRTH"),
              ac.getStr("age_code").getOrElse("AGE"),
              ac.getStr("age_unit").getOrElse("years"))))
          case ("time_of_day", tc) => Some(Generator(df =>
            AddTimeDerivedMeasurements.timeOfDayEvents(df,
              // accept 6.0 as well as 6 — YAML→JSON round-trips often float
              tc.getList("endpoints").collect { case I(i) => i.toInt; case D(d) => d.toInt },
              tc.getStr("time_of_day_code").getOrElse("TIME_OF_DAY"))))
          case ("timeline_tokens", tt) =>
            val endCode = tt.getStr("timeline_end_code").getOrElse("TIMELINE//END")
            Some(Generator(df =>
              AddTimeDerivedMeasurements.timelineTokenEvents(df,
                tt.getStr("time_unit").orElse(tt.getStr("unit")).getOrElse("days"),
                startCode = tt.getStr("timeline_start_code").getOrElse("TIMELINE//START"),
                endCode = endCode,
                deltaCodeTemplate =
                  tt.getStr("time_delta_code").getOrElse("TIMELINE//DELTA//{time_unit}")),
              Some(endCode)))
          case (other, _) =>
            throw new IllegalArgumentException(s"Unknown time-derived measurement: $other")
        }.flatten
        require(gens.nonEmpty, "add_time_derived_measurements: no generators configured")
        AddTimeDerivedMeasurements.addAll(m.data, gens)
      }
      case "bin_numeric_values" => m => {
        // custom_bins values may be the reference's dict form (bin name →
        // endpoint, insertion-ordered least→greatest) or a plain list
        def parseBins(c: Cfg): Map[String, Seq[Double]] = c.obj.map {
          case (code, L(eps)) => code -> eps.collect { case D(d) => d; case I(i) => i.toDouble }
          case (code, m0 @ Cfg.M(_)) =>
            code -> m0.obj.values.toSeq.collect { case D(d) => d; case I(i) => i.toDouble }
          case (code, other) => throw new IllegalArgumentException(s"bad bins for $code: $other")
        }.toMap
        // custom_bins_filepath: same structure from a YAML (like the
        // reference) or JSON file; inline custom_bins entries win on collision
        val fileBins = cfg.getStr("custom_bins_filepath").map { p =>
          val text = java.nio.file.Files.readString(java.nio.file.Paths.get(p))
          parseBins(if (p.endsWith(".yaml") || p.endsWith(".yml")) Yaml.parse(text)
            else Cfg.fromJson(text))
        }.getOrElse(Map.empty[String, Seq[Double]])
        val custom = fileBins ++ cfg.obj.get("custom_bins").map(parseBins).getOrElse(Map.empty)
        val binWith = cfg.strings("bin_with_columns") match {
          case Nil => Seq(graft.meds.MedsSchema.ValuesQuantiles)
          case cols => cols
        }
        BinNumericValues(m.data, m.codes,
          binWithColumns = binWith,
          customBins = custom.toMap,
          dropNumeric = cfg.getBool("do_drop_numeric_value")
            .orElse(cfg.getBool("drop_numeric_value")).getOrElse(false),
          codeFormat = cfg.getStr("code_with_bin_name").orElse(cfg.getStr("code_format"))
            .getOrElse("{code}//value_[{left},{right})"))
      }
      case other =>
        throw new IllegalArgumentException(s"unknown stage: $other")
    }
}
