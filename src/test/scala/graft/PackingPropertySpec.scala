package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import graft.ops.Packing

/** Property net for the packing/chunking layout family. packSequences is
  * checked against its own contract INVARIANTS (the concat-then-chunk rule:
  * per-shard exclusive-cumsum tiling, seq_idx/straddle arithmetic,
  * every-window-but-last full) rather than a reimplementation — the layout
  * is deterministic but hash-ordered, so the invariants ARE the spec.
  * chunkDocuments is checked against an independent naive chunker
  * (Vector.slice loop), covering the n ≤ window collapse, the short final
  * chunk, full token coverage at stride = window, and zero-token drops.
  */
class PackingPropertySpec extends SparkSpec {
  import spark.implicits._

  // --- packSequences / packingSummary invariants -------------------------

  private val genPackCase: Gen[(List[Int], Int)] = for {
    nDocs <- Gen.choose(1, 24)
    lens <- Gen.listOfN(nDocs, Gen.frequency((5, Gen.choose(1, 8)), (1, Gen.const(0))))
    capacity <- Gen.choose(3, 10)
  } yield (lens, capacity)

  test("packSequences tiles each shard exactly: cumsum offsets, seq/straddle arithmetic, determinism") {
    val prop = Prop.forAll(genPackCase) { case (lens, capacity) =>
      val docs = lens.zipWithIndex.map { case (n, i) =>
        (Some(i.toLong): Option[Long], Seq.fill(n)("t").mkString(" "))
      } :+ ((None: Option[Long], "dropped null id"))
      val df = docs.toDF("doc_id", "text")
      def run() = Packing.packSequences(df, "doc_id", "text", capacity, shards = 3, seed = 7L)
        .select("doc_id", "shard", "n_tokens", "offset", "seq_idx", "straddles")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getBoolean(5)))
      val rows = run()
      val deterministic = rows.toSet == run().toSet
      val allAssigned = rows.map(_._1).toSet == lens.indices.map(_.toLong).toSet
      val perShard = rows.groupBy(_._2).forall { case (_, rs) =>
        val ordered = rs.sortBy(r => (r._4, r._3)) // (offset, n_tokens): empties first
        val tiles = ordered.head._4 == 0L &&
          ordered.sliding(2).forall {
            case Array(a, b) => b._4 == a._4 + a._3
            case _ => true
          }
        val arith = rs.forall { case (_, _, n, off, seq, straddles) =>
          seq == off / capacity && straddles == (off % capacity + n > capacity)
        }
        tiles && arith
      }
      // summary: every window except a shard's LAST is full
      val summary = Packing.packingSummary(
          Packing.packSequences(df, "doc_id", "text", capacity, shards = 3, seed = 7L),
          capacity)
        .select("shard", "seq_idx", "full").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      val fullButLast = summary.groupBy(_._1).forall { case (_, ws) =>
        val last = ws.map(_._2).max
        ws.forall { case (_, seq, full) => full || seq == last }
      }
      val ok = deterministic && allAssigned && perShard && fullButLast
      if (!ok) println(s"PACK MISMATCH lens=$lens cap=$capacity rows=${rows.toList} " +
        s"det=$deterministic all=$allAssigned shard=$perShard full=$fullButLast")
      ok
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  // --- chunkDocuments vs naive chunker -----------------------------------

  private def bruteChunks(ts: Vector[String], window: Int,
      stride: Int): Seq[(Long, Long, String)] =
    if (ts.isEmpty) Seq.empty
    else {
      val n = ts.length
      val nChunks =
        if (n <= window) 1 else 1 + math.ceil((n - window).toDouble / stride).toInt
      (0 until nChunks).map { i =>
        val piece = ts.slice(i * stride, math.min(i * stride + window, n))
        (i.toLong, piece.length.toLong, piece.mkString(" "))
      }
    }

  private val genChunkCase: Gen[(List[List[String]], Int, Int)] = for {
    nDocs <- Gen.choose(1, 6)
    docs <- Gen.listOfN(nDocs,
      Gen.choose(0, 14).flatMap(n => Gen.listOfN(n, Gen.oneOf("x", "y", "z"))))
    window <- Gen.choose(1, 6)
    stride <- Gen.choose(1, window)
  } yield (docs, window, stride)

  test("chunkDocuments equals the naive slice loop (coverage, short tail, empty drop)") {
    val prop = Prop.forAll(genChunkCase) { case (docs, window, stride) =>
      val df = docs.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }.toDF("doc_id", "text")
      val got = Packing.chunkDocuments(df, "doc_id", "text", window, stride)
        .select("doc_id", "n_tokens", "chunk_idx", "chunk_tokens", "chunk_text")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .toSet
      val want = docs.zipWithIndex.flatMap { case (ts, i) =>
        bruteChunks(ts.toVector, window, stride).map { case (ci, ct, txt) =>
          (i.toLong, ts.length.toLong, ci, ct, txt)
        }
      }.toSet
      // stride == window must additionally reconstruct the token stream
      val covered = stride != window || docs.zipWithIndex.forall { case (ts, i) =>
        got.toSeq.filter(_._1 == i.toLong).sortBy(_._3)
          .flatMap(c => c._5.split(" ").filter(_.nonEmpty)) == ts
      }
      if (got != want || !covered)
        println(s"CHUNK MISMATCH w=$window s=$stride docs=$docs got=$got want=$want")
      got == want && covered
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
