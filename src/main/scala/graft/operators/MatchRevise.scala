package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dsl.{Cfg, Dsl}
import graft.meds.MedsSchema._

/** Match-and-revise meta-operator (reference:
  * /root/reference/src/MEDS_transforms/compute_modes/match_revise.py:117-320).
  *
  * Applies a stage transformation to config-selected row blocks:
  *  - MATCH_AND_REVISE: block i sees rows matching matcher i and *not* any
  *    earlier matcher; the remainder (no matcher matched) passes through.
  *  - MULTI_MATCH_AND_REVISE: every block sees all rows matching its matcher
  *    (no exclusion); remainder = rows matching no matcher.
  *
  * Output ordering is (subject, time, block index, intra-block row order) —
  * the reference relies on Polars `maintain_order=True` concat+sort
  * (match_revise.py:316-318); Spark sorts are unstable, so the precedence is
  * encoded in explicit sort-key columns.
  */
object MatchRevise {

  final case class Block(matcher: Cfg, transform: DataFrame => DataFrame)

  def apply(data: DataFrame, blocks: Seq[Block], multi: Boolean = false,
      keepOrderCols: Boolean = false): DataFrame = {
    val withIdx =
      if (data.columns.contains(RowIdx)) data
      else data.withColumn(RowIdx, monotonically_increasing_id())
    val matchers = blocks.map(b => Dsl.matcherToExpr(b.matcher)._1)

    val parts = blocks.zipWithIndex.map { case (block, i) =>
      val pred =
        if (multi) matchers(i)
        else matchers.take(i).foldLeft(matchers(i))((acc, prev) => acc && !coalesce(prev, lit(false)))
      block.transform(withIdx.filter(pred)).withColumn(BlockIdx, lit(i))
    }
    val anyMatch = matchers.map(m => coalesce(m, lit(false))).reduce(_ || _)
    val remainder = withIdx.filter(!anyMatch).withColumn(BlockIdx, lit(blocks.length))

    val unioned = (parts :+ remainder)
      .reduce(_.unionByName(_, allowMissingColumns = true))
    // keepOrderCols hands the ordering contract to the caller (the kept
    // BlockIdx/RowIdx columns carry it): sorting here too would stack a
    // second full range-shuffle sort under any caller that re-sorts —
    // measured as a whole wasted pass in the match_revise gate
    if (keepOrderCols) unioned
    else unioned
      .orderBy(col(SubjectId), col(Time).asc_nulls_first, col(BlockIdx), col(RowIdx))
      .drop(BlockIdx, RowIdx)
  }
}
