package graft

import org.apache.spark.sql.functions._
import graft.operators.RollingAgg

/** Trailing RANGE-frame aggregates: crafted frame arithmetic, plain ≡
  * sliced equality on tie/null-dense randomized timelines across grid
  * sizes (incl. boundary-straddling windows), and the degenerate shapes.
  */
class RollingAggSpec extends SparkSpec {
  import spark.implicits._

  private val aggs = Seq(
    "n" -> count(lit(1)),
    "s" -> sum(col("v")),
    "mx" -> max(col("v")))

  test("trailing frame covers [t-range, t] inclusive, per key") {
    val df = Seq(
      (1L, 1L, 0L, 1.0), (2L, 1L, 5L, 2.0), (3L, 1L, 10L, 4.0),
      (4L, 1L, 16L, 8.0), (5L, 2L, 10L, 100.0))
      .toDF("id", "k", "t", "v")
    val got = RollingAgg.trailing(df, Seq("k"), "t", 10L, aggs)
      .select("id", "n", "s").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L) == (1L, 1.0))
    assert(got(3L) == (3L, 7.0))  // 0,5,10 all within [0,10]
    assert(got(4L) == (2L, 12.0)) // [6,16] -> t=10 and t=16 only
    assert(got(5L) == (1L, 100.0)) // key isolation
  }

  test("sliced equals plain on randomized tie/null-dense timelines") {
    val rng = new scala.util.Random(21)
    val df = (0L until 3000L).map { i =>
      val t = if (rng.nextInt(25) == 0) null
        else java.lang.Long.valueOf(rng.nextInt(300).toLong)
      (i, rng.nextInt(4).toLong, t, rng.nextInt(50).toDouble)
    }.toDF("id", "k", "t", "v")
    val plain = RollingAgg.trailing(df, Seq("k"), "t", 17L, aggs)
    for (n <- Seq(1, 3, 16)) {
      val sliced = RollingAgg.trailingSliced(df, Seq("k"), "t", 17L, aggs, n)
      assert(collectSet(sliced) === collectSet(plain), s"numSlices=$n")
    }
  }

  test("one hot key holding 90% still matches plain (and range 0 = peers)") {
    val rng = new scala.util.Random(3)
    val df = (0L until 2000L).map { i =>
      (i, if (i % 10 == 0) rng.nextInt(50).toLong + 1 else 0L,
        rng.nextInt(100).toLong, 1.0)
    }.toDF("id", "k", "t", "v")
    val plain = RollingAgg.trailing(df, Seq("k"), "t", 9L, aggs)
    val sliced = RollingAgg.trailingSliced(df, Seq("k"), "t", 9L, aggs, 8)
    assert(collectSet(sliced) === collectSet(plain))
    val p0 = RollingAgg.trailing(df, Seq("k"), "t", 0L, aggs)
    val s0 = RollingAgg.trailingSliced(df, Seq("k"), "t", 0L, aggs, 8)
    assert(collectSet(s0) === collectSet(p0))
  }

  test("degenerates: all-null times, single row, non-numeric time rejected") {
    val allNull = Seq((1L, 1L, null.asInstanceOf[java.lang.Long], 2.0),
      (2L, 1L, null.asInstanceOf[java.lang.Long], 3.0))
      .toDF("id", "k", "t", "v")
    val gotNull = RollingAgg.trailingSliced(allNull, Seq("k"), "t", 5L, aggs, 4)
      .select("id", "n", "s").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // null times form one peer group: both rows see both (matches plain)
    val wantNull = RollingAgg.trailing(allNull, Seq("k"), "t", 5L, aggs)
      .select("id", "n", "s").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(gotNull == wantNull)
    val one = Seq((1L, 1L, 7L, 2.0)).toDF("id", "k", "t", "v")
    assert(RollingAgg.trailingSliced(one, Seq("k"), "t", 5L, aggs, 4)
      .select("n").head().getLong(0) == 1L)
    val strT = Seq((1L, 1L, "x", 2.0)).toDF("id", "k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      RollingAgg.trailingSliced(strT, Seq("k"), "t", 5L, aggs, 4)
    }
    assert(e.getMessage.contains("numeric"))
  }
}
