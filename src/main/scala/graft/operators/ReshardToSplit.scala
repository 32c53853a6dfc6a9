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

  /** Deterministic subject → shard assignment: portable stable modulo hash
    * (reproducible across engines and runs, no driver-side state).
    */
  def assignShards(splits: DataFrame, nShards: Int): DataFrame =
    splits.withColumn(Shard, pmod(col(SubjectId), lit(nShards)).cast("int"))

  /** Reference-style assignment (`shard_subjects`, reshard_to_split.py:25-195):
    * per split, seeded-RNG permutation of the collected subject ids, then
    * near-equal contiguous chunks (numpy array_split semantics: the first
    * `n mod k` shards get one extra subject). The subject list is
    * metadata-scale — the reference collects it too — so the driver-side
    * permutation is not a scale hazard; semantics match the reference in
    * structure (its numpy RNG stream is not reproducible outside numpy).
    */
  def assignShardsSeeded(splits: DataFrame, nShards: Int, seed: Long = 0L): DataFrame = {
    val rows = splits.select(Split, SubjectId).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val assigned = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (split, members) =>
      val rng = new scala.util.Random(seed ^ split.hashCode.toLong)
      val perm = rng.shuffle(members.map(_._2).sorted.toSeq)
      val n = perm.length
      val base = n / nShards
      val extra = n % nShards
      var idx = 0
      (0 until nShards).flatMap { s =>
        val len = base + (if (s < extra) 1 else 0)
        val chunk = perm.slice(idx, idx + len)
        idx += len
        chunk.map(subj => (subj, split, s))
      }
    }
    val spark = splits.sparkSession
    import spark.implicits._
    assigned.toDF(SubjectId, Split, Shard)
  }

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
