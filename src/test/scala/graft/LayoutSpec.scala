package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order layout: the interleave expression against a bit-loop reference,
  * null semantics, and the actual data-skipping payoff — per-file footer
  * ranges tight on BOTH layout columns, which a single-column sort cannot
  * give.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave: bit k of ranks(i) → position k*n + i. */
  private def mortonRef(ranks: Seq[Long]): Long = {
    var z = 0L
    for (k <- 0 until 16; i <- ranks.indices)
      if ((ranks(i) >> k & 1L) == 1L) z |= 1L << (k * ranks.size + i)
    z
  }

  test("zValue matches the bit-loop reference for 2 and 3 columns") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(300)(i =>
      (i.toLong, rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong,
        rnd.nextInt(65536).toLong)) ++
      Seq((300L, 0L, 0L, 0L), (301L, 65535L, 65535L, 65535L))
    val df = rows.toDF("id", "x", "y", "w")
    val out2 = df.select(col("id"),
        Layout.zValue(Seq(col("x"), col("y"))).as("z")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out3 = df.select(col("id"),
        Layout.zValue(Seq(col("x"), col("y"), col("w"))).as("z")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, x, y, w) =>
      assert(out2(id) == mortonRef(Seq(x, y)), s"2-col mismatch at id=$id")
      assert(out3(id) == mortonRef(Seq(x, y, w)), s"3-col mismatch at id=$id")
    }
  }

  test("zValue: z-order preserves locality (adjacent cells share prefixes); null -> -1") {
    // the curve property actually used for skipping: z range of a quadrant
    // is contiguous — all (x,y) in [0,255]^2 sort before any x or y >= 256
    // iff both high bytes are zero
    val cells = for (x <- Seq(3L, 255L, 256L, 1000L); y <- Seq(7L, 255L, 256L, 1000L))
      yield (x, y)
    val z = cells.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(Seq(col("x"), col("y"))).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val lowQuad = cells.filter { case (x, y) => x <= 255 && y <= 255 }.map(z)
    val rest = cells.filter { case (x, y) => x > 255 || y > 255 }.map(z)
    assert(lowQuad.max < rest.min)
    val nz = Seq((java.lang.Long.valueOf(5L), null.asInstanceOf[java.lang.Long]))
      .toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")))).head().getLong(0)
    assert(nz == -1L)
  }

  test("zOrderBy: per-file ranges are tight on BOTH columns; 1-col sort is not") {
    // two independent uniform columns — the adversarial case for 1-col sort
    val rnd = new scala.util.Random(11)
    val df = Seq.tabulate(20000)(i =>
      (i.toLong, rnd.nextInt(100000).toLong, rnd.nextInt(100000).toLong))
      .toDF("id", "a", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString

    Layout.zOrderBy(df, Seq("a", "b"), numFiles = 16)
      .write.mode("overwrite").parquet(s"$dir/z")
    df.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(s"$dir/plain")

    def avgSpan(path: String, c: String): Double =
      spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).as("span"))
        .agg(avg("span")).head().getDouble(0)

    val (za, zb) = (avgSpan(s"$dir/z", "a"), avgSpan(s"$dir/z", "b"))
    val (pa, pb) = (avgSpan(s"$dir/plain", "a"), avgSpan(s"$dir/plain", "b"))
    // plain sort: perfect on a (tiny spans), useless on b (~full range)
    assert(pa < 12000, s"plain layout span on a: $pa")
    assert(pb > 90000, s"plain layout should not skip on b: $pb")
    // z-order: BOTH columns see a fraction of the full range per file —
    // 16 files ≈ 4x4 grid -> expected span ~ range/4 (+ boundary files)
    assert(za < 60000, s"z layout span on a: $za")
    assert(zb < 60000, s"z layout span on b: $zb")
    // and the skipping is real: files whose stats exclude a narrow predicate
    val zFiles = spark.read.parquet(s"$dir/z")
      .groupBy(input_file_name().as("f"))
      .agg(min("b").as("lo"), max("b").as("hi"))
    val canSkip = zFiles.filter(col("lo") > 1000 || col("hi") < 1000).count()
    assert(canSkip > 0, "no file's footer stats can skip b=1000")
  }
}
