package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Pq

/** OPQ net: the signed-Hadamard-permutation rotation ([[graft.plans.HdRotate]])
  * against a naive O(d²) matrix replay, the column↔driver-literal twin
  * parity, alternating-minimization invariants, encode composition, the
  * rerank serving recipe, and the model round-trip. The SQL boundary is
  * pinned by the `opq_codes` oracle gate; this net pins engine↔spec.
  */
class OpqSpec extends SparkSpec {
  import spark.implicits._

  /** Naive H·D·x / √d + permutation: H in natural ordering,
    * `H(i)(j) = (−1)^popcount(i AND j)`, floor((t + √d/2)/√d) rounding.
    */
  private def naiveRotate(xe: Vector[Long], signs: Vector[Int],
      perm: Vector[Int]): Vector[Long] = {
    val d = xe.length
    val half = Integer.numberOfTrailingZeros(d) / 2
    val sqrtD = 1L << half
    val y = Vector.tabulate(d) { i =>
      (0 until d).map { j =>
        val sgn = if (Integer.bitCount(i & j) % 2 == 0) 1L else -1L
        sgn * signs(j) * xe(j)
      }.sum
    }
    Vector.tabulate(d)(i => Math.floorDiv(y(perm(i)) + sqrtD / 2, sqrtD))
  }

  private def fixture(n: Int, dim: Int) = {
    // deterministic mixed-sign vectors with unequal per-dim energy (the
    // regime a rotation helps): dim k's scale decays with k
    val rows = (0 until n).map { i =>
      (i.toLong, (0 until dim).map { k =>
        val raw = ((i * 31 + k * 17) % 23) - 11
        raw / (2.0 + k * 0.4)
      }: Seq[Double])
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, v) => Row(id, v.map(_.toFloat)) }, 3),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    (rows, df)
  }

  test("HdRotate matches the naive matrix replay; column and literal twins agree") {
    val dim = 16
    val signs = Pq.opqSigns(dim, seed = 42L)
    assert(signs.forall(s => s == 1 || s == -1) && signs.contains(-1))
    val perm = Vector.range(0, dim).reverse
    val rot = Pq.OpqRotation(dim, signs, perm)
    val (rows, df) = fixture(12, dim)
    val viaCol = df.select(col("vec_id"), rot.rotateCol(Pq.xeCol(col("embedding"))))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    rows.foreach { case (id, v) =>
      // float32 storage: re-derive the e6 view from the stored floats
      val xe = Pq.xe(v.map(x => x.toFloat.toDouble))
      val expect = naiveRotate(xe, signs, perm)
      assert(viaCol(id) == expect, s"id=$id column rotate")
      assert(rot.rotateXe(xe) == expect, s"id=$id literal rotate")
    }
    // near-isometry: energy preserved within integer-rounding slack
    rows.take(3).foreach { case (id, v) =>
      val xe = Pq.xe(v.map(x => x.toFloat.toDouble))
      val e0 = xe.map(x => x * x).sum.toDouble
      val e1 = viaCol(id).map(x => x * x).sum.toDouble
      assert(math.abs(e1 - e0) / math.max(e0, 1.0) < 0.01, s"id=$id energy")
    }
  }

  test("non-power-of-4 dim and wrong vector arity fail loudly") {
    val e1 = intercept[Exception] {
      graft.plans.HdRotate.rotate(Array.fill(8)(1L), Array.fill(8)(1), Array.range(0, 8))
    }
    assert(e1.getMessage.contains("power of 4"))
    val e2 = intercept[Exception] {
      graft.plans.HdRotate.rotate(Array.fill(9)(1L), Array.fill(16)(1), Array.range(0, 16))
    }
    assert(e2.getMessage.contains("components"))
  }

  test("trainOpq: alternation 1 keeps identity perm; alternation 2 learns a valid rebalanced perm; deterministic") {
    val dim = 16
    val (_, df) = fixture(40, dim)
    val om1 = Pq.trainOpq(df, "vec_id", "embedding", dim, m = 4, ksub = 4,
      iters = 2, alternations = 1)
    assert(om1.rotation.perm == Vector.range(0, dim))
    // with identity perm, the model must equal plain training on HD-rotated
    // vectors — the alternating loop degenerates to train∘rotate
    val rotated = df.select(col("vec_id"),
      om1.rotation.rotateCol(Pq.xeCol(col("embedding")))
        .cast("array<double>").as("embedding"))
      .select(col("vec_id"),
        transform(col("embedding"), v => v / 1e6).as("embedding"))
    val direct = Pq.train(rotated, "vec_id", "embedding", dim, m = 4,
      ksub = 4, iters = 2)
    assert(om1.pq.codebooks == direct.codebooks)

    val om2 = Pq.trainOpq(df, "vec_id", "embedding", dim, m = 4, ksub = 4,
      iters = 2, alternations = 2)
    assert(om2.rotation.perm.sorted == Vector.range(0, dim))
    assert(om2.rotation.perm != Vector.range(0, dim),
      "unequal per-dim energy must trigger a rebalance")
    val om2b = Pq.trainOpq(df, "vec_id", "embedding", dim, m = 4, ksub = 4,
      iters = 2, alternations = 2)
    assert(om2.rotation == om2b.rotation && om2.pq == om2b.pq)
  }

  test("encodeOpq = assign(rotate(xe)); xeOpq feeds adcTopK consistently") {
    val dim = 16
    val (rows, df) = fixture(30, dim)
    val om = Pq.trainOpq(df, "vec_id", "embedding", dim, m = 4, ksub = 4,
      iters = 2, alternations = 2)
    val enc = Pq.encodeOpq(df, "embedding", om)
    val got = enc.select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toMap
    val dsub = dim / 4
    rows.foreach { case (id, v) =>
      val z = om.rotation.rotateXe(Pq.xe(v.map(x => x.toFloat.toDouble)))
      val expect = Vector.tabulate(4) { j =>
        val s = z.slice(j * dsub, (j + 1) * dsub)
        val d = om.pq.codebooks(j).map(cb =>
          s.zip(cb).map { case (a, b) => (a - b) * (a - b) }.sum)
        d.indexOf(d.min)
      }
      assert(got(id) == expect, s"id=$id codes")
    }
    // serving path: rotated-query ADC ranks by distance in rotated space
    val q = rows.head._2
    val top = Pq.adcTopK(enc, "vec_id", om.pq, Pq.xeOpq(q.map(_.toFloat.toDouble), om), k = 5)
      .collect().map(_.getLong(0))
    assert(top.length == 5 && top.head == rows.head._1,
      "a corpus row queried by itself must rank itself first")
  }

  test("adcTopKRerankOpq: rotated shortlist, raw exact re-rank — matches the naive recipe") {
    val dim = 16
    val (rows, df) = fixture(30, dim)
    val om = Pq.trainOpq(df, "vec_id", "embedding", dim, m = 4, ksub = 4,
      iters = 2, alternations = 2)
    val enc = Pq.encodeOpq(df, "embedding", om).localCheckpoint()
    val q = rows(7)._2.map(_.toFloat.toDouble)
    val qxeRaw = Pq.xe(q)
    val k = 3; val short = 10
    val got = Pq.adcTopKRerankOpq(enc, "vec_id", "embedding", om, qxeRaw, k, short)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // naive: shortlist ids by rotated ADC, then exact raw squared distance
    val shortIds = Pq.adcTopK(enc, "vec_id", om.pq, om.rotation.rotateXe(qxeRaw), short)
      .collect().map(_.getLong(0)).toSet
    val expect = rows.filter(r => shortIds(r._1)).map { case (id, v) =>
      val xe = Pq.xe(v.map(_.toFloat.toDouble))
      (id, xe.zip(qxeRaw).map { case (a, b) => (a - b) * (a - b) }.sum)
    }.sortBy { case (id, d) => (d, id) }.take(k)
    assert(got.toSeq == expect)
  }

  test("saveOpq/loadOpq round-trips; a missing or corrupt sidecar fails loudly") {
    val dim = 16
    val (_, df) = fixture(25, dim)
    val om = Pq.trainOpq(df, "vec_id", "embedding", dim, m = 4, ksub = 4,
      iters = 1, alternations = 2)
    val path = java.nio.file.Files.createTempDirectory("opq_rt").toString + "/model"
    Pq.saveOpq(spark, om, path)
    val back = Pq.loadOpq(spark, path)
    assert(back == om)
    // plain load must still read the codebooks (sidecar is underscore-hidden)
    assert(Pq.load(spark, path) == om.pq)
    val bad = java.nio.file.Files.createTempDirectory("opq_bad").toString + "/model"
    Pq.save(spark, om.pq, bad) // codebooks only, no sidecar
    intercept[Exception] { Pq.loadOpq(spark, bad) }
  }

  test("trainOrLoadOpq: first call trains and commits, second loads the identical model") {
    val dim = 16
    val (_, df) = fixture(25, dim)
    val path = java.nio.file.Files.createTempDirectory("opq_tol").toString + "/model"
    val first = Pq.trainOrLoadOpq(df, "vec_id", "embedding", dim, 4, 4, 1,
      42L, 1.0, 2, Some(path))
    assert(new java.io.File(s"$path/_SUCCESS").exists())
    // different data at the same path: the committed model wins (the
    // codes-stay-comparable contract)
    val (_, df2) = fixture(10, dim)
    val second = Pq.trainOrLoadOpq(df2, "vec_id", "embedding", dim, 4, 4, 1,
      42L, 1.0, 2, Some(path))
    assert(second == first)
  }
}
