package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native PQ code assignment: all `m` subspace argmins in ONE codegen'd
  * expression over the e6-integer vector (see [[graft.ops.Pq]]).
  *
  * The composable form — per subspace, `array_position(array_min(...))`
  * over `aggregate(zip_with(slice(transform(...))))` HOFs — is interpreted
  * (higher-order functions have no doGenCode) and, worse, duplicates the
  * scaled-vector subtree into every one of the m·ksub·2 distance branches:
  * ~500k interpreted element ops PER ROW at m=ksub=8, dim=64 (measured
  * 6 s / 2000 rows). This expression is one tight primitive loop —
  * m·ksub·dsub integer multiply-adds per row — with the codebooks attached
  * as a plan reference object, exactly the in-row-loop pattern of
  * [[TokenCount]]/[[BigramCounts]].
  *
  * Semantics (mirrored by the SQL oracle and the naive spec net): integer
  * squared L2 per centroid, FIRST index on distance ties; a null vector
  * yields null (nullIntolerant); a vector shorter than the codebooks' total
  * dimension fails loudly (ragged rows are a caller contract violation).
  */
case class PqAssign(child: Expression, books: Array[Array[Array[Long]]])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pq_assign"

  override def nullSafeEval(input: Any): Any =
    PqAssign.assign(input.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", books, "long[][][]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.PqAssign.assign($arr, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqAssign {
  def assign(xe: ArrayData, books: Array[Array[Array[Long]]]): GenericArrayData = {
    val m = books.length
    var total = 0
    var j = 0
    while (j < m) { total += books(j)(0).length; j += 1 }
    if (xe.numElements() != total)
      throw new IllegalArgumentException(
        s"pq_assign: vector has ${xe.numElements()} components, codebooks span $total")
    val out = new Array[Any](m)
    var off = 0
    j = 0
    while (j < m) {
      val book = books(j)
      val dsub = book(0).length
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < book.length) {
        val cb = book(c)
        var d = 0L
        var i = 0
        while (i < dsub) {
          val t = xe.getLong(off + i) - cb(i)
          d += t * t
          i += 1
        }
        // strict < keeps the FIRST minimal index — the oracle's
        // min(struct(dist, c)) tie-break
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best
      off += dsub
      j += 1
    }
    new GenericArrayData(out)
  }

  def codes(xe: Column, books: Seq[Seq[Seq[Long]]]): Column =
    GraftSqlBridge.column(PqAssign(GraftSqlBridge.expression(xe),
      books.map(_.map(_.toArray).toArray).toArray))
}
