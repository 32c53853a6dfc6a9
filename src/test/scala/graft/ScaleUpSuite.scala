package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: build a FULL replicated-scale dataset dir — every table, not
  * just the documents/embeddings/events trio of [[ScaleUpBench]] — so the
  * ENTIRE 109-gate hash suite and the whole bench can run at the next order
  * of magnitude (VERDICT r14 gap #1: "the 109-gate suite has never run
  * above sf0.1"; point measurements of individual queries are not a suite
  * pass).
  *
  * Replication keeps foreign keys consistent so join selectivities scale
  * like real data instead of degenerating (an unshifted o_custkey against
  * shifted c_custkey would orphan 90% of orders; an unshifted l_orderkey
  * would fan every lineitem across k order replicas):
  *   - customer/orders/lineitem/part/supplier entity keys shift by
  *     replica-disjoint offsets, and every FK column shifts by ITS
  *     referenced table's offset — each replica is a closed TPC-H world.
  *   - region/nation stay fixed (shared dimensions, like calendar tables
  *     at 100 TB): nationkey FKs remain valid unshifted.
  *   - documents/embeddings/events reuse [[ScaleUpBench]]'s conventions
  *     (affine alphabet permutations, per-replica float scaling, disjoint
  *     user/event ids) so per-stage work scales ~linearly in k.
  *
  * Usage: Test/runMain graft.ScaleUpSuite <sfDir> <outRoot> <k>
  * Writes <outRoot>/x<k>/<table>.parquet for all ten tables; then
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.Verify <outRoot>/x<k> <dump>"
  *   python3 tools/compare.py <outRoot>/x<k> <dump> --fork
  * is the suite pass at scale.
  */
object ScaleUpSuite {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outRoot, kArg) = args.take(3)
    val k = kArg.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = s"$outRoot/x$k"

    def t(name: String): DataFrame = spark.read.parquet(s"$sfDir/$name.parquet")
    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$dir/$name.parquet")

    /** Union k copies with the named key columns shifted by
      * replica-disjoint offsets (offset per column = i·step). Guard: the
      * fixed steps below only keep replicas disjoint while every source key
      * fits under its step — for a source dir past roughly sf50 the shifted
      * ranges would overlap and silently corrupt FK closure, so assert
      * max(key) < step up front instead.
      */
    def shifted(df: DataFrame, k: Int, shifts: (String, Long)*): DataFrame = {
      val maxes = df.select(shifts.map { case (c, _) =>
        max(col(c).cast("long")).as(c) }: _*).head()
      shifts.zipWithIndex.foreach { case ((c, step), idx) =>
        val mx = if (maxes.isNullAt(idx)) 0L else maxes.getLong(idx)
        require(mx < step,
          s"replica step for '$c' ($step) <= max key ($mx): shifted replicas " +
            "would overlap — raise the step for this source scale")
      }
      (0 until k).map { i =>
        shifts.foldLeft(df) { case (d, (c, step)) =>
          d.withColumn(c, col(c) + lit(i * step))
        }
      }.reduce(_ unionByName _)
    }

    val C = 10_000_000L // custkey step
    val O = 100_000_000L // orderkey step
    val P = 10_000_000L // partkey step
    val S = 1_000_000L // suppkey step

    // shared dimensions: copied once, unshifted
    write(t("region"), "region", 1)
    write(t("nation"), "nation", 1)
    write(shifted(t("customer"), k, "c_custkey" -> C), "customer",
      math.max(k / 8, 2))
    write(shifted(t("supplier"), k, "s_suppkey" -> S), "supplier", 2)
    write(shifted(t("part"), k, "p_partkey" -> P), "part", math.max(k / 8, 2))
    write(shifted(t("orders"), k, "o_orderkey" -> O, "o_custkey" -> C),
      "orders", math.max(k / 2, 4))
    write(shifted(t("lineitem"), k,
      "l_orderkey" -> O, "l_partkey" -> P, "l_suppkey" -> S),
      "lineitem", math.max(k, 8))

    // the ScaleUpBench trio, same conventions
    write(ScaleUpBench.replicate(t("documents"), k), "documents",
      math.max(k / 2, 4))
    // DIRECTION-perturbed replicas, not ScaleUpBench's pure (1 + i/1024)
    // scaling: scaling preserves cosine EXACTLY, so scaled replicas are
    // exact cosine ties to every query and top-k rank order inside a tie
    // group degenerates to fp-ulps (the knn_join x4 divergence measured in
    // SMOKE.md round 15 — result sets identical, rank pairing inside equal-
    // cos groups not). Offsetting coordinate 0 by i/16 changes the
    // direction, so replica cosines are distinct and rank order is
    // well-defined at every scale.
    val maxVecId = t("embeddings")
      .agg(max(col("vec_id").cast("long"))).head.getLong(0)
    require(maxVecId < 10_000_000L,
      s"embeddings vec_id step (10M) <= max vec_id ($maxVecId): replicas " +
        "would overlap")
    write((0 until k).map { i =>
      t("embeddings")
        .withColumn("vec_id", col("vec_id") + lit(i.toLong * 10_000_000L))
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else transform(col("embedding"), (v, idx) =>
            when(idx === 0, (v + lit(i / 16.0f)).cast("float"))
              .otherwise((v * lit(1.0f + i / 1024.0f)).cast("float"))))
    }.reduce(_ unionByName _), "embeddings", math.max(k / 4, 2))
    write(shifted(t("events"), k,
      "event_id" -> 100_000_000L, "user_id" -> 10_000_000L),
      "events", math.max(k / 2, 4))

    println(s"[scale-suite] wrote x$k tables under $dir")
    spark.stop()
  }
}
