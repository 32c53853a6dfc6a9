package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-release corpus overlap estimation with theta sketches — "how much
  * of crawl B is already in release A" answered WITHOUT joining the two
  * corpora. Each corpus aggregates to a fixed-size sketch of its document
  * fingerprints (Spark's Datasketches theta aggregates: codegen'd,
  * map-side combined, shuffle bytes = sketch size × partitions — never the
  * fingerprints themselves); intersections, unions, differences and the
  * Jaccard follow from sketch algebra on the metadata-sized result.
  *
  * The companion to [[Dedup.dedupAgainst]]: overlap is the cheap AUDIT
  * (should we even pay for a dedup pass, and how big will the cut be?),
  * dedupAgainst is the exact surgery.
  *
  * Accuracy contract: a theta sketch is EXACT while its retained-entry
  * count stays at or below its nominal entry count (the sketch holds every
  * hash), and ~1/sqrt(nominalEntries) relative error beyond — so the estimates
  * are exact at test scale (the gate pins this against DuckDB's exact
  * INTERSECT counts) and degrade gracefully, with documented bounds, at
  * 100 TB. Set-operation results stay exact as long as BOTH operands are
  * in exact mode.
  */
object Overlap {

  /** Default log2 nominal entries (2^16 = 65536): exact through 65k
    * distinct docs per group — comfortably past every test SF — ~0.4%
    * relative error beyond.
    */
  val DefaultLgNominal: Int = 16

  private def fp(textCol: String, normalize: Boolean): Column =
    if (normalize) TextAnalysis.fingerprint(col(textCol))
    else md5(col(textCol))

  /** Per-group theta sketches of document fingerprints: one row per group
    * with a binary `sketch` column. `groupCols` empty → one global row.
    * Null-text documents carry no content to compare and are excluded
    * (matching dedupAgainst, whose null rows bypass the dedup).
    */
  def corpusSketch(docs: DataFrame, textCol: String,
      groupCols: Seq[String] = Nil, normalize: Boolean = true,
      lgNominalEntries: Int = DefaultLgNominal): DataFrame = {
    val base = docs.filter(col(textCol).isNotNull)
      .select((groupCols.map(col) :+ fp(textCol, normalize).as("__fp")): _*)
    if (groupCols.isEmpty)
      base.agg(theta_sketch_agg(col("__fp"), lgNominalEntries).as("sketch"))
    else base.groupBy(groupCols.map(col): _*)
      .agg(theta_sketch_agg(col("__fp"), lgNominalEntries).as("sketch"))
  }

  /** Overlap report between two corpora, optionally per group: estimated
    * distinct docs in each side, in common, in the union, new in B (the
    * incremental value of the crawl), and the Jaccard — all from two
    * sketch aggregations. Groups present in only one side report the other
    * side as empty (full outer join on the group keys).
    */
  def overlapReport(a: DataFrame, b: DataFrame, textCol: String,
      groupCols: Seq[String] = Nil, normalize: Boolean = true,
      lgNominalEntries: Int = DefaultLgNominal): DataFrame = {
    val sa = corpusSketch(a, textCol, groupCols, normalize, lgNominalEntries)
      .withColumnRenamed("sketch", "__sa")
    val sb = corpusSketch(b, textCol, groupCols, normalize, lgNominalEntries)
      .withColumnRenamed("sketch", "__sb")
    val joined =
      if (groupCols.isEmpty) sa.crossJoin(sb) // two 1-row frames
      else sa.join(sb, groupCols, "full_outer")
    // an absent side is an empty set: estimate 0, intersection 0. Sketch
    // columns may be null after the outer join; theta functions null-guard
    // through the `when`s below.
    val estA = when(col("__sa").isNull, 0.0)
      .otherwise(theta_sketch_estimate(col("__sa")))
    val estB = when(col("__sb").isNull, 0.0)
      .otherwise(theta_sketch_estimate(col("__sb")))
    val inter = when(col("__sa").isNull.or(col("__sb").isNull), 0.0)
      .otherwise(theta_sketch_estimate(theta_intersection(col("__sa"), col("__sb"))))
    val uni = when(col("__sa").isNull, estB).when(col("__sb").isNull, estA)
      .otherwise(theta_sketch_estimate(theta_union(col("__sa"), col("__sb"),
        lgNominalEntries)))
    joined.select(groupCols.map(col) ++ Seq(
      round(estA).cast("long").as("est_docs_a"),
      round(estB).cast("long").as("est_docs_b"),
      round(inter).cast("long").as("est_common"),
      round(uni).cast("long").as("est_union"),
      // greatest(...) guard: in the approximate regime the intersection
      // estimate can exceed B's own estimate — a negative doc count would
      // be nonsense, clamp to 0
      round(greatest(estB - inter, lit(0.0))).cast("long").as("est_new_in_b"),
      round(when(uni === 0.0, 0.0).otherwise(inter / uni), 4)
        .as("jaccard")): _*)
  }
}
