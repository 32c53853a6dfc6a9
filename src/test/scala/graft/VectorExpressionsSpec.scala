package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.plans.VectorExpressions

/** Native Catalyst vector expressions: parity with the higher-order-function
  * composition, null handling, float→double implicit cast, codegen path.
  */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("native dot equals HOF dot on random vectors") {
    val rng = new scala.util.Random(11)
    val d = (0 until 50).map(i =>
      (i, Array.fill(16)(rng.nextDouble()), Array.fill(16)(rng.nextDouble())))
      .toDF("i", "a", "b")
    val rows = d.select(
      VectorExpressions.dot(col("a"), col("b")).as("native"),
      GraftFunctions.dotHof(col("a"), col("b")).as("hof")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("implicit cast: float arrays accepted") {
    val d = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    assert(d.select(VectorExpressions.dot(col("a"), col("b"))).head().getDouble(0) == 11.0)
  }

  test("null propagation") {
    val d = Seq((Some(Array(1.0, 2.0)), None: Option[Array[Double]])).toDF("a", "b")
    assert(d.select(VectorExpressions.dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("mismatched lengths and null elements yield null (matches dotHof)") {
    // corrupt embeddings must NOT produce a plausible truncated/zero-filled score
    val mism = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
    assert(mism.select(VectorExpressions.dot(col("a"), col("b"))).head().isNullAt(0))
    val withNullElem = spark.sql(
      "SELECT array(1.0d, NULL, 3.0d) AS a, array(1.0d, 2.0d, 3.0d) AS b")
    val r = withNullElem.select(
      VectorExpressions.dot(col("a"), col("b")).as("d"),
      graft.functions.GraftFunctions.dotHof(col("a"), col("b")).as("hof"),
      VectorExpressions.l2norm(col("a")).as("n")).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val d = Seq((Array(3.0, 4.0), Array(-4.0, 3.0))).toDF("a", "b")
    val r = d.select(
      VectorExpressions.cosine(col("a"), col("a")).as("same"),
      VectorExpressions.cosine(col("a"), col("b")).as("orth")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("expression survives whole-stage codegen over many rows") {
    val d = spark.range(10000)
      .select(col("id"), array((0 until 8).map(i => col("id") * i): _*).cast("array<double>").as("v"))
    val total = d.select(sum(VectorExpressions.dot(col("v"), col("v")))).head().getDouble(0)
    assert(total > 0)
  }
}
