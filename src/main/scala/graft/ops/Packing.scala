package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Sampling.unitHash
import graft.functions.GraftFunctions.portableHash56

/** Sequence packing for pre-training batch preparation: lay documents out
  * into fixed-capacity token windows, concat-then-chunk style (the dominant
  * practice: the corpus is one token stream per shard, cut every `capacity`
  * tokens; documents may straddle a cut — consumers mask across the
  * boundary). The assignment is a pure layout computation: each document
  * gets its shard, its token offset in the shard's stream, the sequence
  * index its first token lands in, and a straddle flag.
  *
  * Scale shape: documents are hash-sharded (portable id hash, so retries
  * and engines agree), each shard's layout is one window over its own rows
  * — `shards`-way parallel, skew-free by construction (the hash spreads
  * docs uniformly regardless of content), and the only wide operation is
  * the per-shard sort the window needs. No capacity-reset state: the
  * concat-then-chunk rule makes offsets a plain cumulative sum, which is
  * why it scales where first-fit bin packing (inherently sequential per
  * bin set) does not.
  */
object Packing {

  /** Per-document packing assignment.
    *
    * Output columns: idCol, `shard`, `n_tokens`, `offset` (first-token
    * position in the shard's stream), `seq_idx` (= offset / capacity, the
    * window holding the document's first token), `straddles` (true when
    * the document crosses a window cut). Documents are ordered within a
    * shard by (id-hash, id) — deterministic and decorrelated from input
    * order. Empty documents occupy zero tokens but keep an assignment (the
    * offset where they sit). Null ids are dropped (no stable hash),
    * consistent with [[Sampling]].
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      capacity: Int, shards: Int = 256, seed: Long = 42L): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(shards > 0, s"shards must be positive, got $shards")
    val nTok = graft.ops.TextAnalysis.tokenCount(col(textCol))
    val shard = pmod(
      portableHash56(concat(col(idCol).cast("string"), lit(":shard:"), lit(seed.toString))),
      lit(shards.toLong))
    val w = Window.partitionBy(col("shard"))
      .orderBy(unitHash(col(idCol), seed), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.filter(col(idCol).isNotNull)
      .select(col(idCol), shard.as("shard"), nTok.cast("long").as("n_tokens"))
      .withColumn("offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_idx", floor(col("offset") / capacity))
      .withColumn("straddles",
        pmod(col("offset"), lit(capacity.toLong)) + col("n_tokens") > capacity)
  }

  /** Shard/sequence-level summary of a packing layout: how many documents
    * and tokens land in each capacity window, and the fill fraction of the
    * FULL windows (every window but a shard's last is exactly full by
    * construction — the straddle rule wastes zero tokens; the summary
    * exists for sanity checks and loader manifests).
    *
    * The summary keys on the window a document STARTS in: a window fully
    * covered by the interior of one straddling document (doc longer than
    * `capacity`) has no starting doc and therefore NO ROW here — consumers
    * iterating windows sequentially must treat a seq_idx gap as "continues
    * the previous straddler", which `straddles` + `stream_end` encode.
    */
  def packingSummary(assignments: DataFrame, capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    assignments.groupBy("shard", "seq_idx")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens_started"),
        max(col("offset") + col("n_tokens")).as("stream_end"))
      .withColumn("full",
        col("stream_end") >= (col("seq_idx") + 1) * capacity)
  }

  /** Per-document sliding-window chunking: cut each document's token stream
    * into windows of `window` tokens advancing by `stride` (overlap =
    * window − stride) — the long-document prep for bounded-context training
    * and embedding models, where [[packSequences]] is the SHORT-document
    * layout (many docs per window; this is the dual: many windows per doc).
    *
    * Chunk i covers tokens [1 + i·stride, min(i·stride + window, n)],
    * i ∈ [0, nChunks): nChunks = 1 for n ≤ window, else
    * 1 + ⌈(n − window)/stride⌉ — every token is covered, the final chunk may
    * run short, and no chunk starts beyond the tokens (all-integer
    * arithmetic, so any engine derives the same layout). Documents with no
    * tokens (empty/whitespace/null text) emit NO chunks — a chunk row
    * always carries text.
    *
    * Pure per-row computation: the chunk list assembles IN-ROW
    * (`sequence` + `transform` over the token array, codegen'd) and only
    * then explodes — no shuffle, no state; output size is the stream length
    * times the overlap factor, each row bounded by `window` tokens.
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window=$window], got $stride")
    // materialize the token array ONCE per row: referencing the tokenizer
    // expression from n/nChunks/every chunk element would re-split the text
    // per reference (expression trees inline; codegen CSE does not reach
    // into the lambda) — measured 10x on the 1M-doc smoke
    val ws = col("__ws")
    val n = size(ws)
    // ceil((n-window)/stride) as exact integer floor-division (token counts
    // are far below 2^52, so the double quotient is exact)
    val nChunks = when(n <= lit(window), lit(1))
      .otherwise(lit(1) +
        floor((n - lit(window) + lit(stride) - 1).cast("double") / lit(stride)))
    val chunks = transform(sequence(lit(0), nChunks.cast("int") - 1), i => {
      val piece = slice(ws, i * stride + lit(1), lit(window))
      struct(i.cast("long").as("chunk_idx"),
        size(piece).cast("long").as("chunk_tokens"),
        concat_ws(" ", piece).as("chunk_text"))
    })
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol),
        graft.functions.GraftFunctions.tokens(col(textCol)).as("__ws"))
      .filter(size(ws) > 0)
      .select(col(idCol), n.cast("long").as("n_tokens"), explode(chunks).as("__c"))
      .select(col(idCol), col("n_tokens"),
        col("__c.chunk_idx"), col("__c.chunk_tokens"), col("__c.chunk_text"))
  }
}
