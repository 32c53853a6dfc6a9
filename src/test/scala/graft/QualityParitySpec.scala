package graft

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop}
import graft.ops.TextAnalysis

/** Parity net for the native [[graft.plans.QualitySignals]] byte scan and
  * the [[graft.plans.SignalBounds]] filter predicate against the verbatim
  * old recipes (per-signal regex/HOF chains; per-rule conjuncts with
  * coalesce/otherwise null policies) on randomized unicode documents —
  * including the Kelvin-sign and İ case-mapping edges the stopword slow
  * path exists for, tokenless/empty/null texts, and every rule key.
  */
class QualityParitySpec extends SparkSpec {

  // the pre-round-12 composable recipe, verbatim
  private def oldQualityExprs(t: Column,
      stopwords: Seq[String] = TextAnalysis.DefaultStopwords): Seq[Column] = {
    val nChars = length(t)
    val words = array_remove(split(t, "\\s+"), "")
    val nWords = size(words)
    val countMatches = (pat: String) => size(regexp_extract_all(t, lit(pat), lit(0)))
    val nStop = size(filter(words, w => array_contains(
      array(stopwords.map(lit(_)): _*), lower(w))))
    val sumWordLen = aggregate(transform(words, w => length(w)), lit(0), (acc, x) => acc + x)
    Seq(
      nChars.as("n_chars"),
      nWords.as("n_words"),
      when(nWords > 0, sumWordLen.cast("double") / nWords).as("mean_word_len"),
      (countMatches("[\\p{Punct}]").cast("double") / greatest(nChars, lit(1))).as("punct_ratio"),
      (countMatches("[A-Za-z]").cast("double") / greatest(nChars, lit(1))).as("alpha_ratio"),
      (countMatches("[0-9]").cast("double") / greatest(nChars, lit(1))).as("digit_ratio"),
      when(nWords > 0, nStop.cast("double") / nWords).otherwise(0.0).as("stopword_ratio"),
      when(nWords > 0, lit(1.0) - size(array_distinct(words)).cast("double") / nWords)
        .otherwise(0.0).as("repetition_ratio"))
  }

  private val genWord: Gen[String] = Gen.oneOf(
    "the", "The", "THE", "and", "Of", "to", "it", "cat", "cat", "dog42",
    "a-b.c", "!!!", "(x)", "3.14", "é", "héllo", "…", "𝄞", "K", // Kelvin K lowers to ASCII k
    "İT", "IS", "_", "x", "", "with,", "as.")
  private val genSep: Gen[String] = Gen.oneOf(" ", "  ", "\t", "\n", "\r", "\f", "")
  private val genDoc: Gen[String] = for {
    k <- Gen.choose(0, 30)
    ws <- Gen.listOfN(k, genWord)
    ss <- Gen.listOfN(k, genSep)
  } yield ws.zip(ss).map { case (w, s) => w + s }.mkString

  private def df(docs: Seq[String]) = spark.createDataFrame(
    spark.sparkContext.parallelize(
      docs.zipWithIndex.map { case (t, i) => Row(i.toLong, t) } :+
        Row(999L, null), 2),
    StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  private def r10(v: Any): Any = v match {
    case d: Double => math.rint(d * 1e10) / 1e10 // ulp tolerance on ratio division order
    case x => x
  }

  test("native quality signals equal the regex/HOF recipe on randomized unicode docs") {
    // stopwords incl. one with uppercase (never matches) and one non-ASCII
    val stops = TextAnalysis.DefaultStopwords ++ Seq("The", "héllo", "k")
    val prop = Prop.forAll(Gen.listOfN(25, genDoc)) { docs =>
      val d = df(docs)
      val got = d.select(col("doc_id") +: TextAnalysis.qualityExprs(col("text"), stops): _*)
        .collect().map(r => r.getLong(0) -> r.toSeq.tail.map(r10)).toMap
      val want = d.select(col("doc_id") +: oldQualityExprs(col("text"), stops): _*)
        .collect().map(r => r.getLong(0) -> r.toSeq.tail.map {
          // historical null-text contract: the two otherwise(0.0) ratios
          case null if false => null
          case v => r10(v)
        }).toMap
      got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("quality_filter stage: every rule matches the old per-conjunct semantics, incl. null text") {
    import graft.config.PipelineConfig
    import graft.operators.Pipeline
    val docs = Seq(
      "the cat and the dog sat on the mat with it",
      "x",
      "", "   \t  ",
      "!!! ??? ,,, ...",
      "a a a a a a a a",
      "123 456 789 0",
      "wordswithoutstops here only longer tokens everywhere",
      "line one\nline one\nline two",
      "É…𝄞 é …")
    def run(yaml: String): Set[Long] =
      Pipeline.run(spark,
        graft.meds.MedsData(df(docs), spark.emptyDataFrame, spark.emptyDataFrame),
        PipelineConfig.fromYaml(yaml).stages)
        .data.select("doc_id").collect().map(_.getLong(0)).toSet
    // old-semantics reference: rebuild each rule as the old conjuncts
    val t = col("text")
    val sigs = oldQualityExprs(t).map(c =>
      org.apache.spark.sql.GraftSqlBridge.aliasName(c).get -> c).toMap
    val reps = Seq("dup_line_fraction", "dup_ngram_fraction")
      .zip(Seq(0, 2)).map { case (n, i) =>
        n -> coalesce(graft.plans.VectorExpressions.repetitionSignals(t, 3)
          .getField(n), lit(0.0))
      }.toMap
    def ref(conds: Column*): Set[Long] =
      df(docs).filter(conds.reduce(_ && _)).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    val cases: Seq[(String, Seq[Column])] = Seq(
      "min_words: 3" -> Seq(graft.ops.TextAnalysis.tokenCount(t) >= 3),
      "max_words: 5" -> Seq(graft.ops.TextAnalysis.tokenCount(t) <= 5),
      "min_chars: 4" -> Seq(length(t) >= 4),
      "max_chars: 30" -> Seq(length(t) <= 30),
      "min_mean_word_len: 2.5" -> Seq(coalesce(sigs("mean_word_len"), lit(0.0)) >= 2.5),
      "max_mean_word_len: 4.0" -> Seq(coalesce(sigs("mean_word_len"), lit(0.0)) <= 4.0),
      "min_alpha_ratio: 0.5" -> Seq(sigs("alpha_ratio") >= 0.5),
      "max_punct_ratio: 0.2" -> Seq(sigs("punct_ratio") <= 0.2),
      "max_digit_ratio: 0.1" -> Seq(sigs("digit_ratio") <= 0.1),
      "min_stopword_ratio: 0.2" -> Seq(sigs("stopword_ratio") >= 0.2),
      "max_repetition_ratio: 0.5" -> Seq(sigs("repetition_ratio") <= 0.5),
      "max_dup_line_fraction: 0.3" -> Seq(reps("dup_line_fraction") <= 0.3),
      "max_dup_ngram_fraction: 0.5" -> Seq(reps("dup_ngram_fraction") <= 0.5),
      "min_words: 2\n      max_punct_ratio: 0.5\n      max_dup_line_fraction: 0.9" ->
        Seq(graft.ops.TextAnalysis.tokenCount(t) >= 2, sigs("punct_ratio") <= 0.5,
          reps("dup_line_fraction") <= 0.9))
    cases.foreach { case (rule, conds) =>
      val got = run("stages:\n  - quality_filter:\n" +
        rule.linesIterator.map(l => "      " + l.trim).mkString("\n") + "\n")
      assert(got == ref(conds: _*), s"rule `$rule` diverged")
    }
  }
}
