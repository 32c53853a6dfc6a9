package graft

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextAnalysis

/** Parity net for the native [[graft.plans.RepetitionSignals]] byte scan
  * against the original staged-HOF recipe it replaced (rebuilt here,
  * verbatim, as the independent oracle): nonblank-line split with the
  * four-char trim set, untrimmed char sums, byte-exact line distinct,
  * trimmed ellipsis/bullet marks, whitespace tokens → space-joined
  * distinct n-grams. Randomized documents mix multi-byte code points
  * (é, …, •, astral 𝄞), every trim/whitespace byte, duplicate lines and
  * shingles, and the blank/empty/null edges.
  */
class RepetitionParitySpec extends SparkSpec {

  // the pre-round-12 composable recipe, verbatim
  private def oracleExprs(t: Column, n: Int): Seq[Column] = {
    val lines = filter(split(t, "\n"), l => length(trim(l, " \t\r\f")) > 0)
    val tlines = transform(lines, l => trim(l, " \t\r\f"))
    val dlines = array_distinct(lines)
    val ws = array_remove(split(t, "\\s+"), "")
    val nLines = size(lines)
    val lineChars = aggregate(transform(lines, l => length(l)), lit(0), (a, x) => a + x)
    val dLineChars = aggregate(transform(dlines, l => length(l)), lit(0), (a, x) => a + x)
    val totalNgrams = greatest(size(ws) - (n - 1), lit(0))
    val distinctNgrams =
      size(graft.plans.VectorExpressions.shingleHash56(ws, n, distinct = true))
    def frac(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den).otherwise(0.0)
    Seq(
      frac(nLines - size(dlines), nLines).as("dup_line_fraction"),
      frac(lineChars - dLineChars, lineChars).as("dup_line_char_fraction"),
      frac(totalNgrams - distinctNgrams, totalNgrams).as("dup_ngram_fraction"),
      frac(size(filter(tlines, s =>
        endswith(s, lit("...")) || endswith(s, lit("…")))), nLines)
        .as("ellipsis_line_fraction"),
      frac(size(filter(tlines, s =>
        startswith(s, lit("-")) || startswith(s, lit("*")) ||
          startswith(s, lit("•")))), nLines)
        .as("bullet_line_fraction"))
  }

  private val genWord: Gen[String] = Gen.oneOf(
    "the", "cat", "é", "…", "•x", "a-b", "*", "-", "...", "deep",
    "𝄞note", "x...", "•", "wide", "the") // dups on purpose
  private val genSep: Gen[String] =
    Gen.oneOf(" ", "  ", "\t", "\n", "\r\n", " \n ", "", "\f", "\r")
  private val genLinePad: Gen[String] = Gen.oneOf("", " ", "\t ", " \r")
  private val genDoc: Gen[String] = for {
    k <- Gen.choose(0, 40)
    words <- Gen.listOfN(k, genWord)
    seps <- Gen.listOfN(k, genSep)
    pad <- genLinePad
  } yield pad + words.zip(seps).map { case (w, s) => w + s }.mkString

  test("native signals equal the staged-HOF recipe on randomized multi-byte documents") {
    val prop = Prop.forAll(Gen.listOfN(30, genDoc), Gen.choose(1, 4)) { (docs, n) =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          docs.zipWithIndex.map { case (t, i) => Row(i.toLong, t) } :+
            Row(9999L, null), 2),
        StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType))))
      val got = df.select(col("doc_id") +: TextAnalysis.repetitionExprs(col("text"), n): _*)
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      // the HOF oracle nulls out on null text where the native path
      // coalesces to 0.0 — that coalesce IS the historical contract
      // (when(den > 0) over null sizes fell to otherwise(0.0))
      val want = df.select(col("doc_id") +: oracleExprs(col("text"), n): _*)
        .collect().map(r => r.getLong(0) ->
          r.toSeq.tail.map(v => if (v == null) 0.0 else v)).toMap
      got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("directed edges: duplicate lines, all-blank, single token, ellipsis/bullet variants") {
    val docs = Seq(
      "a\na\nb",                       // dup lines
      "  \n\t\n\r",                    // all blank
      "one",                           // single token, no 3-grams
      "x...\ny…\n…\n...",              // ellipsis forms incl. bare marks
      "- a\n* b\n• c\n –d",            // bullet forms incl. non-bullet dash–
      "a b a b a b a b",               // repeated shingles
      " padded \npadded\n padded ",    // trim-distinct vs raw-distinct lines
      "")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        docs.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }, 2),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    val got = df.select(col("doc_id") +: TextAnalysis.repetitionExprs(col("text"), 3): _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val want = df.select(col("doc_id") +: oracleExprs(col("text"), 3): _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(got == want)
    // spot values: "a\na\nb" has 3 nonblank lines, 2 distinct
    assert(got(0L).head == 1.0 / 3)
    // ellipsis doc: every one of the 4 lines qualifies
    assert(got(3L)(3) == 1.0)
  }
}
