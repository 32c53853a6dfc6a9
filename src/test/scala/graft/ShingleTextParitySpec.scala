package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop}

/** Parity net: [[graft.plans.ShingleHashText]] (byte-tokenizing digest
  * feed) must be output-identical to
  * `ShingleHash56(tokens(text), n, distinct)` — the composed form it
  * replaces in every gram consumer (dup_spans, minhash, jaccard, winnow,
  * decontaminate) — on randomized unicode text across widths and both
  * distinct modes, including the shorter-than-n, empty, whitespace-only,
  * and null edges. Also pins the native token-count filter equivalence.
  */
class ShingleTextParitySpec extends SparkSpec {

  private val genTok: Gen[String] = Gen.oneOf(
    "a", "b", "the", "cat", "é", "héllo", "…", "𝄞x", "a-b", "x1", "CAT",
    "a", "the") // dups on purpose
  private val genSep: Gen[String] = Gen.oneOf(" ", "  ", "\t", "\n", "\r", "\f", " \t ")
  private val genDoc: Gen[String] = for {
    k <- Gen.choose(0, 20)
    ts <- Gen.listOfN(k, genTok)
    ss <- Gen.listOfN(k, genSep)
    lead <- Gen.oneOf("", " ", "\t")
  } yield lead + ts.zip(ss).map { case (t, s) => t + s }.mkString

  test("text-fed shingle hashes equal the tokens-array form (both distinct modes, n=1..4)") {
    val prop = Prop.forAll(Gen.listOfN(20, genDoc), Gen.choose(1, 4),
        Gen.oneOf(true, false)) { (docs, n, distinct) =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          docs.zipWithIndex.map { case (t, i) => Row(i.toLong, t) } :+
            Row(999L, null), 2),
        StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType))))
      val toks = array_remove(split(col("text"), "\\s+"), "")
      val rows = df.select(col("doc_id"),
        graft.plans.VectorExpressions.shingleHash56Text(col("text"), n, distinct).as("got"),
        graft.plans.VectorExpressions.shingleHash56(toks, n, distinct).as("want"),
        (graft.plans.VectorExpressions.tokenCount(col("text")) >= n).as("gotF"),
        (size(toks) >= n).as("wantF"))
        .collect()
      rows.forall { r =>
        r.isNullAt(1) == r.isNullAt(2) &&
          (r.isNullAt(1) || r.getSeq[Long](1) == r.getSeq[Long](2)) &&
          r.isNullAt(3) == r.isNullAt(4) &&
          (r.isNullAt(3) || r.getBoolean(3) == r.getBoolean(4))
      }
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }
}
