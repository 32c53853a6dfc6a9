package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop}
import graft.ops.TextAnalysis

/** Parity net for the native [[graft.plans.C4Lines]] scan against the
  * verbatim old per-line rlike/split/contains recipe — including the
  * Java `$` before-final-terminator edges (\r, U+0085, U+2028/29 at line
  * end), case-folded "javascript" hits, word-count boundaries, phrase
  * drops, and the null/empty/terminal-only edges.
  */
class C4ParitySpec extends SparkSpec {

  private def oldC4(docs: org.apache.spark.sql.DataFrame, textCol: String,
      minLineWords: Int, minLines: Int, dropPhrases: Seq[String]) = {
    val keptLines = filter(split(col(textCol), "\n"), l =>
      l.rlike("[.!?\"]\\s*$") &&
        size(array_remove(split(l, "\\s+"), "")) >= minLineWords &&
        !contains(lower(l), lit("javascript")))
    val phraseHit = dropPhrases.map(p => contains(lower(col(textCol)),
      lit(p.toLowerCase))).reduceOption(_ || _).getOrElse(lit(false))
    docs.withColumn("__c4_kept", keptLines)
      .filter(size(col("__c4_kept")) >= minLines && !phraseHit)
      .withColumn(textCol, array_join(col("__c4_kept"), "\n"))
      .drop("__c4_kept")
  }

  private val genLine: Gen[String] = Gen.oneOf(
    "This is a long enough sentence to keep.",
    "Short one.", "no terminal punct here at all",
    "Ends with bang and plenty of words here!",
    "Is this a question with enough words?",
    "Quoted sentence with a tail of words here.\"",
    "Sentence with trailing spaces and words here.   ",
    "Sentence ending in dot then carriage return words here.\r",
    "Sentence ending before U+2028 with many words here. ",
    "Sentence ending before U+0085 with many words here.",
    "Sentence with U+2028 then junk here. x",
    "Mentions JavaScript somewhere in a long keepable line.",
    "mentions javascript in lowercase across enough words.",
    "JAVASCRİPT dotted-I never folds to a hit in either form.",
    "lorem ipsum appears mid line with enough words here.",
    "{", "...", "?!.", "", " ", "\t")
  private val genDoc: Gen[String] = for {
    k <- Gen.choose(0, 8)
    ls <- Gen.listOfN(k, genLine)
  } yield ls.mkString("\n")

  test("native C4 line filter equals the rlike/split recipe on randomized docs") {
    val prop = Prop.forAll(Gen.listOfN(20, genDoc), Gen.choose(0, 8),
        Gen.choose(0, 3)) { (docs, minWords, minLines) =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          docs.zipWithIndex.map { case (t, i) => Row(i.toLong, t) } :+
            Row(999L, null), 2),
        StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType))))
      def collectMap(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val got = collectMap(TextAnalysis.c4Filters(df, "doc_id", "text",
        minWords, minLines, Seq("lorem ipsum", "{")))
      val want = collectMap(oldC4(df, "text", minWords, minLines,
        Seq("lorem ipsum", "{")))
      got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }
}
