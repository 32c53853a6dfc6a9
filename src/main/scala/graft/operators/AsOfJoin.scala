package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior / next-upcoming) join — the temporal-alignment
  * operator Spark has no built-in for: attach to every left row the right
  * row with the greatest `rightTime <= leftTime` (direction "backward") or
  * smallest `rightTime >= leftTime` ("forward") within the same key group.
  * The workhorse of event-stream enrichment: latest measurement before a
  * prediction time, last config before a request, next outcome after an
  * exposure.
  *
  * Spark-first shape — UNION + ORDERED CARRY, not a range join: a naive
  * `l JOIN r ON key AND r.t <= l.t` + argmax explodes to the full
  * per-key cross product before pruning (quadratic in group size, and
  * Catalyst plans the inequality as a broadcast-nested-loop at worst). Here
  * both sides union into one keyed stream, one shuffle on the key, one
  * per-key sort by (time, side), and a `last(_, ignoreNulls)` running
  * window carries the most recent right payload onto each left row —
  * O(n log n) per key, no pair blowup, AQE-splittable like any window. The
  * tie rule is encoded in the side ordering: inclusive (<=) sorts right
  * rows BEFORE left rows at equal time, strict (<) after.
  *
  * Right rows with a null time never match (they are "at no time") and are
  * filtered; left rows with a null time get null payloads. Multiple right
  * rows at the SAME (key, time) would make the carried payload depend on
  * input order — the caller picks a deterministic winner first (e.g. max
  * event id per (key, time)); the op enforces this with `dedupRight`.
  */
object AsOfJoin {

  /** @param valueCols right columns to append (must not collide with left)
    * @param direction "backward" (greatest rightTime <= leftTime) or
    *                  "forward" (smallest rightTime >= leftTime)
    * @param strict    exclude equal timestamps (< / > instead of <= / >=)
    * @param dedupRight deterministic winner per (key, rightTime): keep the
    *                  row with the max of this column (null keeps a
    *                  requirement that (key, time) is already unique)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String],
      direction: String = "backward", strict: Boolean = false,
      dedupRight: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "asOf: at least one key column")
    require(Seq("backward", "forward").contains(direction),
      s"asOf: direction must be backward|forward, got $direction")
    val collide = valueCols.toSet.intersect(left.columns.toSet)
    require(collide.isEmpty,
      s"asOf: value column(s) ${collide.mkString(", ")} already exist on the left")

    val rBase = right.filter(col(rightTime).isNotNull)
    val rDedup = dedupRight match {
      case None => rBase
      case Some(w) =>
        // one winner per (key, time): max of the tiebreak struct — keeps
        // the payload row whose `w` is greatest, deterministically. The
        // time column stays a group key, never a payload field (valueCols
        // may legitimately include it).
        require(w != rightTime,
          s"asOf: dedupRight ($w) must be a tiebreak column, not the time key")
        val payFields = (w +: valueCols.distinct.filterNot(_ == w))
          .filterNot(_ == rightTime)
        val payload = struct(payFields.map(col): _*)
        rBase.groupBy((keyCols.map(col) :+ col(rightTime)): _*)
          .agg(max(payload).as("__pay"))
          .select((keyCols.map(col) :+ col(rightTime)) ++
            payFields.map(c => col(s"__pay.$c").as(c)): _*)
    }

    // side ordering encodes the tie rule; forward runs the same carry on
    // the reversed time axis. The left's FULL row rides through the union
    // as a struct — no row-id reattach join (a nondeterministic id
    // evaluated in two lineages could mispair rows), one lineage, one
    // shuffle total.
    val (rightSide, leftSide) = if (strict) (1, 0) else (0, 1)
    val lStructType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val r = rDedup.select(
      keyCols.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(rightSide).as("__side"),
        struct(valueCols.map(col): _*).as("__rv"),
        lit(null).cast(lStructType).as("__lrow")): _*)
    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(leftSide).as("__side"),
        lit(null).cast(r.schema("__rv").dataType).as("__rv"),
        struct(left.columns.map(col): _*).as("__lrow")): _*)

    val ord: Seq[Column] = direction match {
      case "backward" => Seq(col("__t").asc_nulls_first, col("__side").asc)
      case "forward"  => Seq(col("__t").desc_nulls_first, col("__side").asc)
    }
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("__carry", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === leftSide && col("__lrow").isNotNull)
      .select(left.columns.map(c => col(s"__lrow.$c").as(c)) ++
        // a null left time means "at no time": match nothing in either
        // direction (forward's desc ordering would otherwise hand
        // nulls-first rows the max-time payload)
        valueCols.map(c => when(col("__t").isNull, lit(null))
          .otherwise(col(s"__carry.$c")).as(c)): _*)
  }
}
