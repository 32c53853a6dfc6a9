package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** As-of join semantics on crafted timelines: backward/forward direction,
  * inclusive-vs-strict tie rule, null times on both sides, right-side
  * dedup, key isolation, and partitioning independence.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // user timelines; right side = sensor readings, left side = queries
  private def readings = Seq(
    (1L, 10L, "r10"), (1L, 20L, "r20"), (1L, 30L, "r30"),
    (2L, 15L, "x15"))
    .toDF("user_id", "rt", "reading")

  private def queries = Seq(
    (101L, 1L, Some(5L)),   // before any reading -> null
    (102L, 1L, Some(20L)),  // exactly at r20 -> inclusive picks it, strict picks r10
    (103L, 1L, Some(29L)),  // between -> r20
    (104L, 1L, Some(99L)),  // after all -> r30
    (105L, 2L, Some(16L)),  // other key -> x15, never user 1's readings
    (106L, 3L, Some(50L)),  // key with no readings -> null
    (107L, 1L, None))       // null query time -> null
    .map { case (id, u, t) => (id, u, t.map(java.lang.Long.valueOf).orNull) }
    .toDF("qid", "user_id", "qt")

  private def run(direction: String, strict: Boolean) =
    AsOfJoin.asOf(queries, readings, Seq("user_id"), "qt", "rt",
      Seq("rt", "reading"), direction, strict)
      .collect().map(r => r.getAs[Long]("qid") ->
        Option(r.getAs[String]("reading"))).toMap

  test("backward inclusive: greatest rt <= qt; ties take the equal reading") {
    val m = run("backward", strict = false)
    assert(m(101L).isEmpty)
    assert(m(102L) === Some("r20"))
    assert(m(103L) === Some("r20"))
    assert(m(104L) === Some("r30"))
    assert(m(105L) === Some("x15"))
    assert(m(106L).isEmpty)
    assert(m(107L).isEmpty)
  }

  test("backward strict: equal timestamps do not match") {
    val m = run("backward", strict = true)
    assert(m(102L) === Some("r10"))
    assert(m(103L) === Some("r20")) // unaffected away from ties
  }

  test("forward inclusive and strict: smallest rt >= qt") {
    val m = run("forward", strict = false)
    assert(m(101L) === Some("r10"))
    assert(m(102L) === Some("r20"))
    assert(m(104L).isEmpty) // nothing upcoming
    assert(m(107L).isEmpty) // null time matches nothing forward either
    val ms = run("forward", strict = true)
    assert(ms(102L) === Some("r30"))
  }

  test("null right times never match; dedupRight picks the max-tiebreak payload") {
    val r2 = Seq((1L, Some(20L), "dup_low", 1L), (1L, Some(20L), "dup_high", 9L),
      (1L, None, "null_t", 5L))
      .map { case (u, t, v, k) => (u, t.map(java.lang.Long.valueOf).orNull, v, k) }
      .toDF("user_id", "rt", "reading", "pri")
    val out = AsOfJoin.asOf(
      Seq((1L, 1L, 25L)).toDF("qid", "user_id", "qt"), r2,
      Seq("user_id"), "qt", "rt", Seq("reading"),
      dedupRight = Some("pri")).head()
    assert(out.getAs[String]("reading") === "dup_high")
  }

  test("results are identical under different input partitioning") {
    val l = (0L until 500L).map(i => (i, i % 7, i * 3 % 101)).toDF("qid", "user_id", "qt")
    val r = (0L until 200L).map(i => (i % 7, i * 5 % 97, s"v$i")).toDF("user_id", "rt", "v")
    val a = AsOfJoin.asOf(l.repartition(1), r.repartition(1),
      Seq("user_id"), "qt", "rt", Seq("v"), dedupRight = Some("v"))
    val b = AsOfJoin.asOf(l.repartition(13), r.repartition(5),
      Seq("user_id"), "qt", "rt", Seq("v"), dedupRight = Some("v"))
    assert(collectSet(a) === collectSet(b))
  }
}
