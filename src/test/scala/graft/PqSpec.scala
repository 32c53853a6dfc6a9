package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Pq

/** Property net for product quantization: [[Pq.train]]/[[Pq.encode]]/
  * [[Pq.adcTopK]] against an independent naive Scala PQ (plain loops over
  * the same fixed-point contract — e6 integers, away-from-zero rounding,
  * hash-order init, first-index argmin ties, empty-code carry-over) on
  * randomized corpora. The SQL-oracle gates (`pq_codes`, `pq_topk`) pin the
  * engine↔DuckDB boundary; this net pins the engine↔spec boundary on shapes
  * the fixtures don't reach: duplicate vectors, n == ksub exactly, empty
  * codes under clustered data, the sampled-training path, zero iterations.
  */
class PqSpec extends SparkSpec {

  // --- independent naive PQ (mirrors the documented contract, not the code)

  private def md5Unit(id: Long, seed: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:$seed".getBytes("UTF-8"))
    val h = ((d(0) & 0xffL) << 48) | ((d(1) & 0xffL) << 40) |
      ((d(2) & 0xffL) << 32) | ((d(3) & 0xffL) << 24) |
      ((d(4) & 0xffL) << 16) | ((d(5) & 0xffL) << 8) | (d(6) & 0xffL)
    h % 1000000000L
  }

  private def roundE6(v: Double): Long =
    BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).longValue

  private def naiveXe(v: Seq[Double]): Vector[Long] =
    v.map(x => roundE6(x * 1e6)).toVector

  private case class Naive(books: Vector[Vector[Vector[Long]]])

  private def naiveTrain(rows: Seq[(Long, Seq[Double])], dim: Int, m: Int,
      ksub: Int, iters: Int, seed: Long, frac: Double = 1.0): Naive = {
    val dsub = dim / m
    val all = rows.map { case (id, v) => (id, naiveXe(v)) }
    val base = if (frac < 1.0)
      all.filter { case (id, _) => md5Unit(id, seed).toDouble / 1e9 < frac }
    else all
    val seeds = base.sortBy { case (id, _) => (md5Unit(id, seed), id) }
      .take(ksub).map(_._2)
    var books = Vector.tabulate(m)(j =>
      Vector.tabulate(ksub)(c => seeds(c).slice(j * dsub, (j + 1) * dsub)))
    def code(xe: Vector[Long], j: Int): Int = {
      val s = xe.slice(j * dsub, (j + 1) * dsub)
      val d = books(j).map(cb =>
        s.zip(cb).map { case (a, b) => (a - b) * (a - b) }.sum)
      d.indexOf(d.min)
    }
    (0 until iters).foreach { _ =>
      val next = for (j <- 0 until m; c <- 0 until ksub) yield {
        val members = base.collect { case (_, xe) if code(xe, j) == c =>
          xe.slice(j * dsub, (j + 1) * dsub) }
        if (members.isEmpty) (j, c) -> books(j)(c)
        else (j, c) -> Vector.tabulate(dsub)(d =>
          roundE6(members.map(_(d)).sum.toDouble / members.length))
      }
      val map = next.toMap
      books = Vector.tabulate(m)(j => Vector.tabulate(ksub)(c => map((j, c))))
    }
    Naive(books)
  }

  private def naiveEncode(n: Naive, dim: Int, m: Int, xe: Vector[Long]): Vector[Int] = {
    val dsub = dim / m
    Vector.tabulate(m) { j =>
      val s = xe.slice(j * dsub, (j + 1) * dsub)
      val d = n.books(j).map(cb =>
        s.zip(cb).map { case (a, b) => (a - b) * (a - b) }.sum)
      d.indexOf(d.min)
    }
  }

  private def naiveTopK(n: Naive, dim: Int, m: Int,
      rows: Seq[(Long, Seq[Double])], q: Vector[Long], k: Int): Seq[(Long, Long)] = {
    val dsub = dim / m
    rows.map { case (id, v) =>
      val codes = naiveEncode(n, dim, m, naiveXe(v))
      val dist = (0 until m).map { j =>
        val qs = q.slice(j * dsub, (j + 1) * dsub)
        qs.zip(n.books(j)(codes(j))).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
      (id, dist)
    }.sortBy { case (id, d) => (d, id) }.take(k)
  }

  private def toDf(rows: Seq[(Long, Seq[Double])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, v) => Row(id, v.map(_.toFloat)) }, 3),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))

  private val genCorpus: Gen[(Seq[(Long, Seq[Double])], Int, Int, Int)] = for {
    m <- Gen.oneOf(1, 2, 4)
    dsub <- Gen.choose(1, 4)
    ksub <- Gen.choose(2, 5)
    n <- Gen.choose(ksub, 24)
    iters <- Gen.choose(0, 3)
    // limited-precision components; duplicates arise via the narrow grid
    vals = Gen.choose(-12, 12).map(_ / 7.0)
    rows <- Gen.sequence[Seq[(Long, Seq[Double])], (Long, Seq[Double])](
      (0 until n).map(i => Gen.listOfN(m * dsub, vals).map(v => (i.toLong, v: Seq[Double]))))
  } yield (rows, m * dsub, m, ksub * 1000 + iters)

  test("train+encode matches the naive PQ on randomized corpora (duplicates, n==ksub, empty codes)") {
    // float32 storage drops precision vs the naive double path only below
    // e6 resolution for |v| < ~8 (24-bit mantissa) — the grid keeps |v| < 2
    val prop = Prop.forAll(genCorpus) { case (rows, dim, m, packed) =>
      val (ksub, iters) = (packed / 1000, packed % 1000)
      val df = toDf(rows)
      val model = Pq.train(df, "vec_id", "embedding", dim, m, ksub, iters, seed = 42L)
      val naive = naiveTrain(rows, dim, m, ksub, iters, seed = 42L)
      val booksMatch = model.codebooks == naive.books
      val got = Pq.encode(df, "embedding", model)
        .select("vec_id", "codes").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toMap
      val codesMatch = rows.forall { case (id, v) =>
        got(id) == naiveEncode(naive, dim, m, naiveXe(v)) }
      booksMatch && codesMatch
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("adcTopK matches the naive ADC ranking") {
    val prop = Prop.forAll(genCorpus) { case (rows, dim, m, packed) =>
      val (ksub, iters) = (packed / 1000, packed % 1000)
      val df = toDf(rows)
      val model = Pq.train(df, "vec_id", "embedding", dim, m, ksub, iters, seed = 42L)
      val q = naiveXe(rows.head._2)
      val k = math.min(5, rows.size)
      val got = Pq.adcTopK(Pq.encode(df, "embedding", model), "vec_id", model, q, k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      got == naiveTopK(naiveTrain(rows, dim, m, ksub, iters, 42L), dim, m, rows, q, k)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("sampled training uses exactly the hash-sampled rows") {
    val rows = (0L until 40L).map(i => (i, Seq.tabulate(8)(d => ((i * 7 + d) % 13).toDouble / 3)))
    val model = Pq.train(toDf(rows), "vec_id", "embedding",
      dim = 8, m = 2, ksub = 3, iters = 2, seed = 42L, trainFraction = 0.5)
    val naive = naiveTrain(rows, dim = 8, m = 2, ksub = 3, iters = 2, seed = 42L, frac = 0.5)
    assert(model.codebooks == naive.books)
  }

  test("determinism: retrain yields identical codebooks") {
    val rows = (0L until 20L).map(i => (i, Seq.tabulate(8)(d => math.sin(i * 3 + d))))
    def run() = Pq.train(toDf(rows), "vec_id", "embedding", 8, 4, 4, 3, seed = 7L)
    assert(run().codebooks == run().codebooks)
  }

  test("ivfPqTopK equals adcTopK restricted to the probed cells") {
    import org.apache.spark.sql.functions._
    // two tight clusters on axes + a far outlier cell; query sits in cluster A
    val rows = (0L until 18L).map { i =>
      val base = (i % 3) match {
        case 0 => Seq(1.0, 0.0, 0.0, 0.0)
        case 1 => Seq(0.0, 1.0, 0.0, 0.0)
        case _ => Seq(-1.0, -1.0, 0.0, 0.0)
      }
      (i, base.zipWithIndex.map { case (v, d) => v + (i * 13 + d) % 5 * 0.01 })
    }
    val labeled = toDf(rows).withColumn("label", (col("vec_id") % 3).cast("int"))
    val model = graft.ops.Pq.train(labeled, "vec_id", "embedding", 4, 2, 3, 2)
    val enc = graft.ops.Pq.encode(labeled, "embedding", model)
    val q = rows.head._2.map(_.toFloat)
    val qxe = naiveXe(rows.head._2)
    val got = graft.ops.Pq.ivfPqTopK(enc, "vec_id", "label", "embedding",
      model, q, qxe, k = 4, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // the probe must select the two cells nearest the query (labels 0 and 1
    // by construction) and the result must equal ADC over exactly those
    val want = graft.ops.Pq.adcTopK(enc.filter(col("label") =!= 2),
      "vec_id", model, qxe, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want && got.nonEmpty)
    assert(got.forall { case (id, _) => id % 3 != 2 })
  }

  test("ivfPqTopK with rerank equals adcTopKRerank restricted to the probed cells") {
    import org.apache.spark.sql.functions._
    val rows = (0L until 18L).map { i =>
      val base = (i % 3) match {
        case 0 => Seq(1.0, 0.0, 0.0, 0.0)
        case 1 => Seq(0.0, 1.0, 0.0, 0.0)
        case _ => Seq(-1.0, -1.0, 0.0, 0.0)
      }
      (i, base.zipWithIndex.map { case (v, d) => v + (i * 13 + d) % 5 * 0.01 })
    }
    val labeled = toDf(rows).withColumn("label", (col("vec_id") % 3).cast("int"))
    val model = Pq.train(labeled, "vec_id", "embedding", 4, 2, 3, 2)
    val enc = Pq.encode(labeled, "embedding", model)
    val q = rows.head._2.map(_.toFloat)
    val qxe = naiveXe(rows.head._2)
    val got = Pq.ivfPqTopK(enc, "vec_id", "label", "embedding",
      model, q, qxe, k = 4, nProbe = 2, rerank = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = Pq.adcTopKRerank(enc.filter(col("label") =!= 2),
      "vec_id", "embedding", model, qxe, k = 4, shortlist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want && got.nonEmpty)
    assert(got.forall { case (id, _) => id % 3 != 2 })
  }

  test("null-embedding rows are excluded from ADC top-k, not ranked first") {
    val rows = (0L until 12L).map(i => (i, Seq.tabulate(8)(d => math.cos(i * 5 + d))))
    val df = toDf(rows)
    val model = Pq.train(df, "vec_id", "embedding", 8, 2, 3, 2)
    val withNulls = df.unionByName(
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(100L, null), Row(101L, null))),
        df.schema))
    val got = Pq.adcTopK(Pq.encode(withNulls, "embedding", model), "vec_id",
      model, naiveXe(rows.head._2), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.size == 5 && got.forall { case (id, d) => id < 100L && d >= 0 })
    assert(got == naiveTopK(naiveTrain(rows, 8, 2, 3, 2, 42L), 8, 2, rows,
      naiveXe(rows.head._2), 5))
  }

  test("a vector longer than the codebook span fails loudly, not prefix-encoded") {
    val rows = (0L until 6L).map(i => (i, Seq.tabulate(8)(d => (i + d) / 3.0)))
    val model = Pq.train(toDf(rows), "vec_id", "embedding", 8, 2, 3, 1)
    val longer = (0L until 6L).map(i => (i, Seq.tabulate(16)(d => (i + d) / 3.0)))
    val e = intercept[Exception] {
      Pq.encode(toDf(longer), "embedding", model).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("codebooks span")))
  }

  test("adcKnnJoin equals per-query naive ADC ranking (nulls on both sides excluded)") {
    val prop = Prop.forAll(genCorpus) { case (rows, dim, m, packed) =>
      val (ksub, iters) = (packed / 1000, packed % 1000)
      val df = toDf(rows)
      val model = Pq.train(df, "vec_id", "embedding", dim, m, ksub, iters, seed = 42L)
      val naive = naiveTrain(rows, dim, m, ksub, iters, seed = 42L)
      val qRows = rows.filter(_._1 % 3 == 0)
      val queries = toDf(qRows).withColumnRenamed("vec_id", "qid")
        // a null-vector query must produce no output rows
        .unionByName(spark.createDataFrame(
          spark.sparkContext.parallelize(Seq(Row(999L, null))),
          toDf(rows).schema.copy(fields = toDf(rows).schema.fields.map(f =>
            if (f.name == "vec_id") f.copy(name = "qid") else f))))
      val k = math.min(4, rows.size)
      val got = Pq.adcKnnJoin(Pq.encode(df, "embedding", model), "vec_id",
          model, queries, "qid", "embedding", k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .toSet
      val want = qRows.flatMap { case (qid, qv) =>
        naiveTopK(naive, dim, m, rows, naiveXe(qv), k).zipWithIndex.map {
          case ((id, d), i) => (qid, id, d, i + 1) }
      }.toSet
      got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  private def naiveExactDist(xe: Vector[Long], q: Vector[Long]): Long = {
    require(xe.length == q.length)
    xe.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
  }

  test("adcTopKRerank: exact re-rank of the ADC shortlist matches the naive recipe") {
    val prop = Prop.forAll(genCorpus) { case (rows, dim, m, packed) =>
      val (ksub, iters) = (packed / 1000, packed % 1000)
      val df = toDf(rows)
      val model = Pq.train(df, "vec_id", "embedding", dim, m, ksub, iters, seed = 42L)
      val naive = naiveTrain(rows, dim, m, ksub, iters, seed = 42L)
      val q = naiveXe(rows.head._2)
      val k = math.min(3, rows.size)
      val short = math.min(8, rows.size)
      val got = Pq.adcTopKRerank(Pq.encode(df, "embedding", model), "vec_id",
          "embedding", model, q, k, short).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      // naive: ADC shortlist ids, then EXACT distance over the full vector
      // on only those, (dist, id) order, cut to k
      val cand = naiveTopK(naive, dim, m, rows, q, short).map(_._1).toSet
      val want = rows.filter(r => cand(r._1))
        .map { case (id, v) => (id, naiveExactDist(naiveXe(v), q)) }
        .sortBy { case (id, d) => (d, id) }.take(k)
      got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("adcKnnJoinRerank: per-query exact re-rank matches the naive recipe") {
    val prop = Prop.forAll(genCorpus) { case (rows, dim, m, packed) =>
      val (ksub, iters) = (packed / 1000, packed % 1000)
      val df = toDf(rows)
      val model = Pq.train(df, "vec_id", "embedding", dim, m, ksub, iters, seed = 42L)
      val naive = naiveTrain(rows, dim, m, ksub, iters, seed = 42L)
      val qRows = rows.filter(_._1 % 3 == 0)
      val queries = toDf(qRows).withColumnRenamed("vec_id", "qid")
      val k = math.min(3, rows.size)
      val short = math.min(8, rows.size)
      val got = Pq.adcKnnJoinRerank(Pq.encode(df, "embedding", model), "vec_id",
          "embedding", model, queries, "qid", "embedding", k, short)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .toSet
      val want = qRows.flatMap { case (qid, qv) =>
        val q = naiveXe(qv)
        val cand = naiveTopK(naive, dim, m, rows, q, short).map(_._1).toSet
        rows.filter(r => cand(r._1))
          .map { case (id, v) => (id, naiveExactDist(naiveXe(v), q)) }
          .sortBy { case (id, d) => (d, id) }.take(k)
          .zipWithIndex.map { case ((id, d), i) => (qid, id, d, i + 1) }
      }.toSet
      got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("adcKnnJoin: qid column colliding with the corpus id column fails loudly") {
    val rows = (0L until 8L).map(i => (i, Seq.tabulate(8)(d => (i + d) / 3.0)))
    val df = toDf(rows)
    val model = Pq.train(df, "vec_id", "embedding", 8, 2, 3, 1)
    val e = intercept[IllegalArgumentException] {
      Pq.adcKnnJoin(Pq.encode(df, "embedding", model), "vec_id", model,
        df, "vec_id", "embedding", k = 2)
    }
    assert(e.getMessage.contains("must differ"))
  }

  test("a query vector with a null COMPONENT produces no output rows, not a null-distance top-k") {
    val rows = (0L until 10L).map(i => (i, Seq.tabulate(8)(d => math.sin(i * 3 + d))))
    val df = toDf(rows)
    val model = Pq.train(df, "vec_id", "embedding", 8, 2, 3, 2)
    val schema = StructType(Seq(StructField("qid", LongType),
      StructField("embedding", ArrayType(FloatType))))
    // qid 500 has a null element; qid 0 is a clean in-corpus query
    val queries = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(0L, rows.head._2.map(_.toFloat)),
        Row(500L, (Seq[Any](null) ++ rows.head._2.tail.map(_.toFloat)): Seq[Any]))),
      schema)
    Seq(
      Pq.adcKnnJoin(Pq.encode(df, "embedding", model), "vec_id", model,
        queries, "qid", "embedding", k = 3),
      Pq.adcKnnJoinRerank(Pq.encode(df, "embedding", model), "vec_id",
        "embedding", model, queries, "qid", "embedding", k = 3, shortlist = 5)
    ).foreach { out =>
      val res = out.collect()
      assert(res.forall(_.getLong(2) >= 0L), "no null/garbage distances")
      assert(res.map(_.getLong(0)).distinct.toSeq == Seq(0L),
        "the null-component query contributes no rows")
      assert(res.count(_.getLong(0) == 0L) == 3)
    }
  }

  test("save/load round-trips the model exactly; a bad table fails loudly") {
    val rows = (0L until 20L).map(i => (i, Seq.tabulate(8)(d => math.sin(i * 3 + d))))
    val model = Pq.train(toDf(rows), "vec_id", "embedding", 8, 4, 4, 2, seed = 7L)
    val path = java.nio.file.Files.createTempDirectory("graft_pq_model")
      .resolve("model").toString
    Pq.save(spark, model, path)
    assert(Pq.load(spark, path) == model)
    // a truncated table (one codebook row dropped) is rejected, not
    // silently reshaped
    val truncated = path + "_bad"
    spark.read.parquet(path).where(!(col("j") === 0 && col("c") === 0))
      .write.parquet(truncated)
    val e = intercept[IllegalArgumentException] { Pq.load(spark, truncated) }
    assert(e.getMessage.contains("ragged codebook"))
  }

  test("contract failures are loud: indivisible dim, too few rows") {
    val rows = (0L until 3L).map(i => (i, Seq.tabulate(8)(_.toDouble)))
    intercept[IllegalArgumentException] {
      Pq.train(toDf(rows), "vec_id", "embedding", dim = 8, m = 3, ksub = 2, iters = 1)
    }
    intercept[IllegalArgumentException] {
      Pq.train(toDf(rows), "vec_id", "embedding", dim = 8, m = 2, ksub = 5, iters = 1)
    }
  }
}
