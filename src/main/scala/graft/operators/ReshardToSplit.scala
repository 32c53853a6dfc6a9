package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.meds.MedsSchema._

/** `reshard_to_split` (reference:
  * /root/reference/src/MEDS_transforms/stages/reshard_to_split/reshard_to_split.py:25-195,264-333).
  *
  * Re-shards the cohort so that every (split, shard) holds a disjoint set of
  * subjects, each shard internally sorted by (subject_id, time) — the layout
  * invariant every downstream window/aggregate depends on.
  *
  * The reference builds an explicit {split/shard → subject list} map with a
  * seeded RNG permutation and then, per new shard, filter-reads every old
  * shard. In Spark the same outcome is one shuffle: join the split
  * assignment, derive a deterministic shard number, and
  * `repartition(split, shard).sortWithinPartitions(subject, time)` — there is
  * no per-shard re-scan of the input, which is the difference between O(shards²)
  * file reads and a single pass at 100 TB.
  */
object ReshardToSplit {

  /** Deterministic subject → shard assignment. `byHash` uses a portable
    * stable hash (reproducible across engines and runs); the reference's
    * seeded-permutation semantics are matched in distribution, not bit-for-bit
    * (its RNG is numpy-specific).
    */
  def assignShards(splits: DataFrame, nShards: Int): DataFrame =
    splits.withColumn(Shard, pmod(col(SubjectId), lit(nShards)).cast("int"))

  def apply(data: DataFrame, splits: DataFrame, nShards: Int): DataFrame = {
    val assignment = assignShards(splits, nShards)
    data.drop(Split, Shard)
      .join(broadcast(assignment), Seq(SubjectId), "inner")
      .repartition(col(Split), col(Shard))
      .sortWithinPartitions(SubjectId, Time)
  }

  /** Write re-sharded data in the MEDS layout (split partition dirs). */
  def write(resharded: DataFrame, root: String): Unit =
    resharded.write.mode("overwrite").partitionBy(Split, Shard).parquet(s"$root/data")
}
