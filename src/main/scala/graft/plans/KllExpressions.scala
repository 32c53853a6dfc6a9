package graft.plans

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KLL quantile sketches as first-class Catalyst aggregates — the quantile
  * leg of the mergeable-sketch tripod (HLL = distinct counts, theta = set
  * overlap, KLL = distributions). What they buy at 100 TB: the exact
  * per-(code, value) histogram partials in AggregateCodeMetadata assume
  * value cardinality is metadata-sized; for continuous hyper-cardinality
  * signals (perplexities, embedding norms, latencies) the histogram IS the
  * corpus, while a KLL sketch is a fixed ~3 KB whatever the input — and
  * the merge of per-shard sketches is a valid sketch of the union, so
  * incremental releases re-aggregate without rescanning old shards.
  *
  * Error contract (Datasketches KLL, k = 200 default): rank error ≤ ~1.65%
  * at 99% confidence, nothing assumed about the value distribution; the
  * sketch is EXACT while total n ≤ k (every value retained), which the
  * spec uses to pin exact quantiles; beyond that compaction is randomized,
  * so large-sketch assertions are tolerance-based, never hash-based (and
  * there is deliberately NO oracle gate on the approximate regime).
  */
object KllExpressions {

  /** Aggregate raw double values into a serialized KLL sketch (binary). */
  case class KllSketchAgg(child: Expression, k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[KllDoublesSketch]
      with ImplicitCastInputTypes with UnaryLike[Expression] {

    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(DoubleType)
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_kll_agg"

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(k)

    override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null) buf.update(v.asInstanceOf[Double])
      buf
    }

    override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
      a.merge(b); a
    }

    override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

    override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(bytes))

    override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
      copy(child = newChild)
  }

  /** Merge already-serialized sketches (the partial-artifact re-aggregation
    * path: per-shard sketch frames union + merge, old shards never rescanned).
    */
  case class KllMergeAgg(child: Expression, k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[KllDoublesSketch]
      with ImplicitCastInputTypes with UnaryLike[Expression] {

    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(BinaryType)
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_kll_merge"

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(k)

    override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null) buf.merge(
        KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
      buf
    }

    override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
      a.merge(b); a
    }

    override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

    override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(bytes))

    override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): KllMergeAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
      copy(child = newChild)
  }

  /** Scalar: quantile at `rank` ∈ [0,1] from a serialized sketch (INCLUSIVE
    * search — the value whose rank is the smallest ≥ the requested rank).
    * Empty sketch → null.
    */
  case class KllQuantile(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {

    override def inputTypes: Seq[GraftSqlBridge.AbstractType] =
      Seq(BinaryType, DoubleType)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_kll_quantile"

    override def nullSafeEval(sk: Any, q: Any): Any =
      KllExpressions.quantile(sk.asInstanceOf[Array[Byte]],
        q.asInstanceOf[Double])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (sk, q) => {
        val tmp = ctx.freshName("kllq")
        s"""java.lang.Double $tmp = graft.plans.KllExpressions.quantile($sk, $q);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression)
        : Expression = copy(left = l, right = r)
  }

  /** Scalar: estimated normalized rank of `value` in the sketch. Empty → null. */
  case class KllRank(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {

    override def inputTypes: Seq[GraftSqlBridge.AbstractType] =
      Seq(BinaryType, DoubleType)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_kll_rank"

    override def nullSafeEval(sk: Any, v: Any): Any =
      KllExpressions.rank(sk.asInstanceOf[Array[Byte]], v.asInstanceOf[Double])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (sk, v) => {
        val tmp = ctx.freshName("kllr")
        s"""java.lang.Double $tmp = graft.plans.KllExpressions.rank($sk, $v);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression)
        : Expression = copy(left = l, right = r)
  }

  // static helpers shared by eval and generated code
  def quantile(bytes: Array[Byte], q: Double): java.lang.Double = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) null
    else java.lang.Double.valueOf(
      sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE))
  }

  def rank(bytes: Array[Byte], v: Double): java.lang.Double = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) null
    else java.lang.Double.valueOf(
      sk.getRank(v, QuantileSearchCriteria.INCLUSIVE))
  }

  val DefaultK: Int = 200

  // ---- Column API ----
  private def expr(c: Column) = GraftSqlBridge.expression(c)
  private def agg(e: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction) =
    GraftSqlBridge.column(e.toAggregateExpression())

  def kllAgg(values: Column, k: Int = DefaultK): Column =
    agg(KllSketchAgg(expr(values), k))

  def kllMergeAgg(sketches: Column, k: Int = DefaultK): Column =
    agg(KllMergeAgg(expr(sketches), k))

  def kllQuantile(sketch: Column, q: Column): Column =
    GraftSqlBridge.column(KllQuantile(expr(sketch), expr(q)))

  def kllRank(sketch: Column, value: Column): Column =
    GraftSqlBridge.column(KllRank(expr(sketch), expr(value)))
}
