package graft

import org.apache.spark.sql.functions._
import graft.ops.{Classifier, Divergence}

/** Per-group JS divergence: independent full-vocabulary recomputation (the
  * operator uses a closed-form correction for out-of-support tokens — the
  * test does not), boundary distributions, and partitioning independence.
  */
class DivergenceSpec extends SparkSpec {
  import spark.implicits._

  test("jsDivergence matches a full-vocabulary reference computation") {
    val docs = Seq(
      (0L, "a a b", "A"), (1L, "a c c", "B"), (2L, "c d", "B")
    ).toDF("doc_id", "text", "source")
    val out = Divergence.jsDivergence(docs, "source", "text")
      .orderBy("source").collect()

    // plain-Scala JSD over the FULL corpus vocabulary (no closed form)
    val groups = Map("A" -> Seq("a", "a", "b"), "B" -> Seq("a", "c", "c", "c", "d"))
    val corpus = groups.values.flatten.toSeq
    def dist(ts: Seq[String]) =
      ts.groupBy(identity).map { case (w, xs) => w -> xs.size.toDouble / ts.size }
    val q = dist(corpus)
    def jsd(p: Map[String, Double]): Double = {
      val vocab = q.keySet
      vocab.toSeq.map { w =>
        val pw = p.getOrElse(w, 0.0); val qw = q(w); val m = (pw + qw) / 2
        def t(x: Double) = if (x == 0) 0.0 else x * (math.log(x / m) / math.log(2))
        0.5 * t(pw) + 0.5 * t(qw)
      }.sum
    }
    for ((row, g) <- out.zip(Seq("A", "B"))) {
      assert(row.getString(0) === g)
      assert(math.abs(row.getDouble(3) - jsd(dist(groups(g)))) < 1e-6,
        s"group $g: got ${row.getDouble(3)}, want ${jsd(dist(groups(g)))}")
    }
    assert(out.map(_.getLong(1)).toSeq === Seq(3L, 5L)) // n_tokens
    assert(out.map(_.getLong(2)).toSeq === Seq(2L, 3L)) // n_terms
  }

  test("a single-group corpus diverges zero from itself; values stay in [0,1]") {
    val same = Seq((0L, "x y z x", "only")).toDF("doc_id", "text", "source")
    val r = Divergence.jsDivergence(same, "source", "text").collect()
    assert(r.length === 1 && r(0).getDouble(3) === 0.0)

    val skewed = (0L until 50L).map(i =>
      (i, if (i % 5 == 0) "alpha beta" else "gamma delta gamma",
        if (i % 5 == 0) "rare" else "bulk")).toDF("doc_id", "text", "source")
    Divergence.jsDivergence(skewed, "source", "text").collect().foreach { row =>
      assert(row.getDouble(3) >= 0.0 && row.getDouble(3) <= 1.0)
    }
  }

  test("null groups and tokenless docs are excluded; results partition-independent") {
    val docs = Seq(
      (0L, "a b", "A"), (1L, "", "A"), (2L, "c", null.asInstanceOf[String])
    ).toDF("doc_id", "text", "source")
    val r = Divergence.jsDivergence(docs, "source", "text").collect()
    assert(r.length === 1 && r(0).getString(0) === "A" && r(0).getLong(1) === 2L)

    val big = (0L until 80L).map(i =>
      (i, s"w${i % 9} w${i % 4} w${i % 6}", s"s${i % 3}"))
      .toDF("doc_id", "text", "source")
    val a = Divergence.jsDivergence(big.repartition(1), "source", "text")
    val b = Divergence.jsDivergence(big.repartition(17), "source", "text")
    assert(collectSet(a) === collectSet(b))
  }

  test("nbConfusion counts train/test predictions against true labels") {
    val train = Seq(
      (0L, "aa aa bb", "x"), (1L, "cc cc dd", "y")
    ).toDF("doc_id", "text", "label")
    val eval = Seq(
      (10L, "aa bb", "x"),  // classified x, true x
      (11L, "cc dd", "y"),  // classified y, true y
      (12L, "aa aa", "y")   // classified x, true y -> off-diagonal
    ).toDF("doc_id", "text", "label")
    val (tc, priors) = Classifier.trainNaiveBayes(train, "text", "label")
    val out = Classifier.nbConfusion(eval, "doc_id", "text", "label", tc, priors)
    assert(collectSet(out) === Set(
      Seq("x", "x", 1L), Seq("y", "y", 1L), Seq("y", "x", 1L)))
  }
}
