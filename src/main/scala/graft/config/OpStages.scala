package graft.config

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dsl.Cfg
import graft.operators.Pipeline
import graft.ops.{Dedup, Sampling, TextAnalysis}

/** Built-in training-data-hygiene stages, registered through the SAME
  * extension point third-party packages use ([[PipelineConfig.register]],
  * mirroring the reference's entry-point stage discovery,
  * /root/reference/src/MEDS_transforms/stages/discovery.py:14-72 and
  * pyproject.toml:53-65) — so a pipeline YAML can chain MEDS transforms with
  * corpus curation (dedup, quality signals, sampling) in one run.
  *
  * These go beyond the reference's own stage set: they wrap the
  * `graft.ops` operators (each independently oracle-verified by the
  * correctness gate) as pipeline stages over whatever table the pipeline
  * threads as `data`. Column names are configurable per stage (`id_col`,
  * `text_col`, ...) with documents-table defaults (`doc_id`, `text`).
  *
  * Dedup-stage semantics: the stage RETURNS THE DEDUPLICATED DATA — rows
  * whose id survives as its group's representative (minimum id per exact
  * text / fingerprint / near-dup cluster). The pair- and sketch-level
  * outputs stay available through the `graft.ops` API for analysis
  * workloads; a pipeline stage has to yield the filtered corpus to be
  * chainable.
  */
object OpStages {

  private val IdCol = "id_col"
  private val TextCol = "text_col"

  /** Register every built-in hygiene stage. Invoked once from
    * [[PipelineConfig]]'s initializer; idempotent (re-registration replaces
    * the same builder).
    */
  private[config] def registerAll(): Unit = {
    import PipelineConfig.CfgOps

    def ids(cfg: Cfg) = (cfg.getStr(IdCol).getOrElse("doc_id"),
      cfg.getStr(TextCol).getOrElse("text"))

    // null-text rows are NOT duplicates of one another: md5(null) is null and
    // SQL GROUP BY groups nulls together, so deduping over them would keep
    // one row and silently drop every other failed-extraction document. They
    // bypass the dedup entirely (matching the near-dup stages, whose pair
    // generation never emits null-text docs).
    def keepNullText(data: DataFrame, id: String, text: String, keep: DataFrame): DataFrame =
      data.filter(col(text).isNull)
        .unionByName(data.filter(col(text).isNotNull).join(keep, Seq(id), "left_semi"))

    // keep the min-id row per distinct raw text (one hash shuffle on md5)
    PipelineConfig.register("dedup_exact") { (name, cfg) =>
      val (id, text) = ids(cfg)
      Pipeline.DataStage(name, m => {
        val keep = Dedup.exact(m.data.filter(col(text).isNotNull), id, text)
          .select(col("keep_id").as(id))
        keepNullText(m.data, id, text, keep)
      })
    }

    // keep the min-id row per normalized fingerprint (case/whitespace-
    // insensitive copies collapse too)
    PipelineConfig.register("dedup_fingerprint") { (name, cfg) =>
      val (id, text) = ids(cfg)
      Pipeline.DataStage(name, m => {
        val keep = Dedup.fingerprint(m.data.filter(col(text).isNotNull), id, text)
          .groupBy("fingerprint").agg(min(col(id)).as(id))
          .select(id)
        keepNullText(m.data, id, text, keep)
      })
    }

    // near-dup family: candidate pairs → connected components → drop every
    // non-representative (cluster member with id != min id of its cluster).
    // Rows never appearing in a pair are their own cluster and are kept.
    def dropNonRepresentatives(data: DataFrame, id: String, pairs: DataFrame): DataFrame = {
      val drop = Dedup.resolveClusters(pairs)
        .filter(col("id") =!= col("cluster_id"))
        .select(col("id").as(id))
      data.join(drop, Seq(id), "left_anti")
    }

    PipelineConfig.register("minhash_lsh_dedup") { (name, cfg) =>
      val (id, text) = ids(cfg)
      val n = cfg.getInt("n").getOrElse(3)
      val bands = cfg.getInt("bands").getOrElse(8)
      val rows = cfg.getInt("rows_per_band").getOrElse(4)
      val threshold = cfg.getDouble("threshold").getOrElse(0.5)
      val seed = cfg.getLong("seed").getOrElse(42L)
      val maxBucket = cfg.getInt("max_bucket") // None = no hot-bucket chaining
      Pipeline.DataStage(name, m => dropNonRepresentatives(m.data, id,
        Dedup.minhashLshPairs(m.data, id, text, n, bands, rows, threshold, seed,
          maxBucket)))
    }

    PipelineConfig.register("ngram_jaccard_dedup") { (name, cfg) =>
      val (id, text) = ids(cfg)
      val n = cfg.getInt("n").getOrElse(3)
      val threshold = cfg.getDouble("threshold").getOrElse(0.5)
      val maxDf = cfg.getInt("max_df") // None = no hot-shingle pruning
      Pipeline.DataStage(name, m => dropNonRepresentatives(m.data, id,
        Dedup.ngramJaccardPairs(m.data, id, text, n, threshold, maxDf)))
    }

    PipelineConfig.register("simhash_dedup") { (name, cfg) =>
      val (id, text) = ids(cfg)
      val n = cfg.getInt("n").getOrElse(3)
      val numBits = cfg.getInt("num_bits").getOrElse(32)
      val bands = cfg.getInt("bands").getOrElse(4)
      val maxHamming = cfg.getInt("max_hamming").getOrElse(3)
      val maxBucket = cfg.getInt("max_bucket")
      Pipeline.DataStage(name, m => dropNonRepresentatives(m.data, id,
        Dedup.simhashPairs(m.data, id, text, n, numBits, bands, maxHamming,
          maxBucket)))
    }

    // column-appending signal stages: pure projections, chainable anywhere.
    // A name clash with an existing column fails HERE with the stage named —
    // letting it through would surface as AMBIGUOUS_REFERENCE in whatever
    // later stage first touches the duplicated column.
    def appendCols(stage: String, data: DataFrame,
        exprs: Seq[org.apache.spark.sql.Column]): DataFrame = {
      val clash = data.select(exprs: _*).columns.toSeq.intersect(data.columns.toSeq)
      require(clash.isEmpty, s"stage $stage: output column(s) " +
        s"${clash.mkString(", ")} already exist in the input")
      data.select((col("*") +: exprs): _*)
    }

    PipelineConfig.register("text_quality") { (name, cfg) =>
      val text = cfg.getStr(TextCol).getOrElse("text")
      Pipeline.DataStage(name, m =>
        appendCols(name, m.data, TextAnalysis.qualityExprs(col(text))))
    }

    PipelineConfig.register("lang_id") { (name, cfg) =>
      val text = cfg.getStr(TextCol).getOrElse("text")
      Pipeline.DataStage(name, m =>
        appendCols(name, m.data, TextAnalysis.langIdExprs(col(text))))
    }

    PipelineConfig.register("text_tokens") { (name, cfg) =>
      val text = cfg.getStr(TextCol).getOrElse("text")
      Pipeline.DataStage(name, m => appendCols(name, m.data, Seq(
        TextAnalysis.tokenCount(col(text)).as("n_tokens"),
        TextAnalysis.subwordCount(col(text)).as("n_subwords"))))
    }

    // deterministic Bernoulli sample on the id hash (retry/engine-stable)
    PipelineConfig.register("sample") { (name, cfg) =>
      val id = cfg.getStr(IdCol).getOrElse("doc_id")
      val fraction = cfg.getDouble("fraction").getOrElse(throw new IllegalArgumentException(
        s"stage $name: `fraction` is required"))
      val seed = cfg.getLong("seed").getOrElse(42L)
      Pipeline.DataStage(name, m => Sampling.sample(m.data, id, fraction, seed))
    }

    // deterministic split assignment: splits is an ORDERED {name: weight} map
    PipelineConfig.register("sample_split") { (name, cfg) =>
      val id = cfg.getStr(IdCol).getOrElse("doc_id")
      val seed = cfg.getLong("seed").getOrElse(42L)
      val splits = cfg.numberMap("splits", s"stage $name").getOrElse(
        throw new IllegalArgumentException(
          s"stage $name: `splits` map of {name: weight} is required"))
      Pipeline.DataStage(name, m => Sampling.assignSplits(m.data, id, splits, seed))
    }

    PipelineConfig.register("stratified_cap") { (name, cfg) =>
      val id = cfg.getStr(IdCol).getOrElse("doc_id")
      val stratum = cfg.getStr("stratum_col").getOrElse(throw new IllegalArgumentException(
        s"stage $name: `stratum_col` is required"))
      val perStratum = cfg.getInt("per_stratum").getOrElse(throw new IllegalArgumentException(
        s"stage $name: `per_stratum` is required"))
      val seed = cfg.getLong("seed").getOrElse(42L)
      Pipeline.DataStage(name, m =>
        Sampling.stratifiedCap(m.data, id, stratum, perStratum, seed))
    }
  }
}
