package graft

import org.apache.spark.sql.functions._
import graft.dsl.{Cfg, Dsl}

/** Expression/matcher DSL semantics (reference parser.py doctests). */
class DslSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("a", "d", 1, "x//1"),
    ("b", "e", 2, "nope"),
    ("c", "f", 3, "x//3")
  ).toDF("foo", "bar", "baz", "s")

  test("matcher: equality conjunction") {
    val (m, cols) = Dsl.matcherToExpr(Cfg.map("foo" -> Cfg("a"), "bar" -> Cfg("d")))
    assert(cols == Set("foo", "bar"))
    assert(df.filter(m).count() == 1)
  }

  test("matcher: present / absent / regex") {
    val d2 = Seq(("a", null), ("b", "z")).toDF("k", "v")
    val (present, _) = Dsl.matcherToExpr(Cfg.map("v" -> Cfg.map("present" -> Cfg(true))))
    val (absent, _) = Dsl.matcherToExpr(Cfg.map("v" -> Cfg.map("present" -> Cfg(false))))
    val (re, _) = Dsl.matcherToExpr(Cfg.map("k" -> Cfg.map("regex" -> Cfg("^a"))))
    assert(d2.filter(present).count() == 1)
    assert(d2.filter(absent).count() == 1)
    assert(d2.filter(re).count() == 1)
  }

  test("empty matcher matches everything") {
    val (m, _) = Dsl.matcherToExpr(Cfg.map())
    assert(df.filter(m).count() == 3)
  }

  test("col expr: plain column and literal") {
    val (c, cols) = Dsl.colExpr(Cfg("foo"))
    assert(cols == Set("foo"))
    assert(df.select(c).as[String].collect().toSeq == Seq("a", "b", "c"))
    val (l, lcols) = Dsl.colExpr(Cfg.map("literal" -> Cfg(34.2)))
    assert(lcols.isEmpty)
    assert(df.select(l).head().getDouble(0) == 34.2)
  }

  test("interpolated string formats and null-propagates like pl.format") {
    val d2 = Seq(("a", "1"), (null, "2")).toDF("foo", "baz")
    val (c, cols) = Dsl.colExpr(Cfg("bar//{foo}//{baz}"))
    assert(cols == Set("foo", "baz"))
    val out = d2.select(c).as[String].collect().toSeq
    assert(out == Seq("bar//a//1", null)) // null input → null output
  }

  test("extract returns null on no-match (Polars parity, not Spark's \"\")") {
    val (c, _) = Dsl.colExpr(Cfg.map("extract" -> Cfg.map(
      "from" -> Cfg("foo"), "regex" -> Cfg("([ac]).*"))))
    assert(df.select(c).as[String].collect().toSeq == Seq("a", null, "c"))
  }

  test("coalescing list picks first non-null") {
    // [conditional on baz==2 → "bar//{baz}", literal "34.2"]
    val cfg = Cfg.list(
      Cfg.map("matcher" -> Cfg.map("baz" -> Cfg(2)), "output" -> Cfg.map("str" -> Cfg("bar//{baz}"))),
      Cfg.map("literal" -> Cfg("34.2")))
    val (c, cols) = Dsl.colExpr(cfg)
    assert(cols == Set("baz"))
    assert(df.select(c).as[String].collect().toSeq == Seq("34.2", "bar//2", "34.2"))
  }

  test("simple-form conditional {output: matcher}") {
    val (c, _) = Dsl.colExpr(Cfg.map("{baz}//{bar}" -> Cfg.map("foo" -> Cfg("a"))))
    assert(df.select(c).as[String].collect().toSeq == Seq("1//d", null, null))
  }

  test("Cfg.fromJson preserves structure") {
    val cfg = Cfg.fromJson("""{"output": {"literal": "x"}, "matcher": {"foo": "a"}}""")
    val (c, _) = Dsl.colExpr(cfg)
    assert(df.select(c).as[String].collect().toSeq == Seq("x", null, null))
  }

  test("matcher validation: non-boolean present throws; bad map shape throws") {
    intercept[IllegalArgumentException] {
      Dsl.matcherToExpr(Cfg.fromJson("""{"foo": {"present": 1}}"""))
    }
    intercept[IllegalArgumentException] {
      Dsl.matcherToExpr(Cfg.fromJson("""{"foo": {"regexp": "a"}}""")) // typo'd key
    }
  }

  test("null scalar matcher matches nothing (pl.col == None parity)") {
    val (m, _) = Dsl.matcherToExpr(Cfg.fromJson("""{"foo": null}"""))
    assert(df.filter(m).count() == 0)
    // a null TEST is spelled {present: false}
    val withNull = Seq((null.asInstanceOf[String], 1), ("a", 2)).toDF("foo", "n")
    val (p, _) = Dsl.matcherToExpr(Cfg.fromJson("""{"foo": {"present": false}}"""))
    assert(withNull.filter(p).count() == 1)
  }

  test("expr-type key with matcher-shaped value falls back to simple-form conditional") {
    // a column literally named "extract", conditional on foo == "a"
    val d2 = df.withColumn("extract", col("bar"))
    val (c, needed) = Dsl.colExpr(Cfg.fromJson("""{"extract": {"foo": "a"}}"""))
    assert(needed == Set("extract", "foo"))
    assert(d2.select(c).as[String].collect().toSeq == Seq("d", null, null))
  }

  test("non-participating regex group extracts null, not empty string") {
    val d = Seq("ac", "abc").toDF("t")
    val (c, _) = Dsl.colExpr(Cfg.fromJson(
      """{"extract": {"from": "t", "regex": "a(b)?c"}}"""))
    assert(d.select(c).as[String].collect().toSeq == Seq(null, "b"))
  }
}
