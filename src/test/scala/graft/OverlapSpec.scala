package graft

import org.apache.spark.sql.functions._
import graft.ops.Overlap

/** Theta-sketch corpus overlap: exact-mode equality against driver-computed
  * set arithmetic, normalization collapse, one-sided groups, global mode.
  */
class OverlapSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "lang", "text")

  test("grouped overlap report equals exact set arithmetic in exact mode") {
    val rng = new scala.util.Random(3)
    val langs = Seq("en", "de", "fr")
    val mk = (n: Int, salt: String) => (0 until n).map { i =>
      (i.toLong, langs(rng.nextInt(3)), s"doc ${rng.nextInt(40)} $salt")
    }
    // overlapping vocab: ~40 distinct texts per salt, shared "" salt pool
    val a = docs(mk(120, "").map(t => (t._1, t._2, t._3)): _*)
    val b = docs(mk(150, "").map(t => (t._1 + 1000, t._2, t._3)): _*)
    val got = Overlap.overlapReport(a, b, "text", Seq("lang"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    def sets(df: org.apache.spark.sql.DataFrame) = df
      .select(col("lang"), regexp_replace(lower(trim(col("text"))), "\\s+", " ")
        .as("t")).distinct().as[(String, String)].collect()
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).toSet }
    val (sa, sb) = (sets(a), sets(b))
    for (l <- (sa.keySet ++ sb.keySet)) {
      val (xa, xb) = (sa.getOrElse(l, Set()), sb.getOrElse(l, Set()))
      assert(got(l) == ((xa.size.toLong, xb.size.toLong,
        (xa & xb).size.toLong, (xa | xb).size.toLong,
        (xb -- xa).size.toLong)), s"lang $l")
    }
  }

  test("normalization collapses case/whitespace variants; raw mode keeps them") {
    val a = docs((1L, "en", "Hello  World"), (2L, "en", "hello world"))
    val b = docs((3L, "en", "HELLO\tWORLD"))
    val norm = Overlap.overlapReport(a, b, "text", Seq("lang")).head()
    assert((norm.getLong(1), norm.getLong(2), norm.getLong(3)) == ((1L, 1L, 1L)))
    val raw = Overlap.overlapReport(a, b, "text", Seq("lang"),
      normalize = false).head()
    assert((raw.getLong(1), raw.getLong(2), raw.getLong(3)) == ((2L, 1L, 0L)))
  }

  test("groups on one side only report the other side empty") {
    val a = docs((1L, "en", "x"), (2L, "de", "y"))
    val b = docs((3L, "en", "x"), (4L, "fr", "z"))
    val got = Overlap.overlapReport(a, b, "text", Seq("lang"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6))).toMap
    assert(got("de") == ((1L, 0L, 0L, 1L, 0L, 0.0)))
    assert(got("fr") == ((0L, 1L, 0L, 1L, 1L, 0.0)))
    assert(got("en") == ((1L, 1L, 1L, 1L, 0L, 1.0)))
  }

  test("global (ungrouped) overlap is a single row; null text excluded") {
    val a = docs((1L, "en", "p"), (2L, "en", "q"), (3L, "en", null))
    val b = docs((4L, "en", "q"), (5L, "en", "r"))
    val rows = Overlap.overlapReport(a, b, "text").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((2L, 2L, 1L, 3L, 1L)))
    assert(r.getDouble(5) == 0.3333)
  }

  test("sketches stay fixed-size and mergeable above nominal capacity") {
    // 50k distinct docs into a lg=10 (1024-entry) sketch: estimate within
    // the documented ~3x/sqrt(k) bound (99.7%), sketch bytes bounded
    val big = spark.range(50000)
      .select(col("id").as("doc_id"), lit("en").as("lang"),
        concat(lit("text "), col("id")).as("text"))
    val sk = Overlap.corpusSketch(big, "text", lgNominalEntries = 10)
      .select(length(col("sketch")).as("bytes"),
        theta_sketch_estimate(col("sketch")).cast("double").as("est")).head()
    assert(sk.getInt(0) <= 16 * 1024 + 64)
    assert(math.abs(sk.getDouble(1) - 50000.0) / 50000.0 < 0.1)
  }
}
