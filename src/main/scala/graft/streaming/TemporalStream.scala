package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment: a continuous backward-inclusive temporal
  * join. One keyed stream interleaves reference rows ("right", side 0) and
  * query rows ("left", side 1); each left row is emitted enriched with the
  * most recent right row at-or-before its time — the ingest-time version of
  * [[graft.operators.AsOfJoin.asOf]] (latest config before a request,
  * newest measurement before a prediction) running on
  * `flatMapGroupsWithState`.
  *
  * State is ONE (time, id) pair per key — fixed size by construction, no
  * watermark eviction needed and none configured (NoTimeout): unlike
  * windowed aggs, the carry's state does not grow with data, only with key
  * cardinality.
  *
  * Ordering semantics: within each micro-batch a group's rows are sorted by
  * (time, side, id) before folding, so intra-batch order is exact event-time
  * order (null left times sort first → enriched with null, the batch
  * operator's "at no time" rule; right rows win ties at equal time =
  * inclusive; equal-time right rows resolve to the max id = the batch
  * `dedupRight` winner). Across batches the carry is monotone: a right row
  * older than the carried state is ignored, and a right row arriving AFTER a
  * left row it should have matched cannot retroactively re-enrich it — the
  * standard streaming-enrichment trade, stated here rather than hidden
  * (batch replay via `AsOfJoin.asOf` is the reconciliation path).
  */
object TemporalStream {

  /** One event on the keyed timeline: `t` is event-time in epoch micros
    * (None = the "at no time" left rows), `side` 0 = reference (right),
    * 1 = query (left).
    */
  final case class TEv(k: Long, t: Option[Long], side: Int, id: Long)

  /** Enriched left row: matched_* carry the chosen reference row or null. */
  final case class AsOfOut(k: Long, id: Long, t: Option[Long],
    matched_t: Option[Long], matched_id: Option[Long])

  final case class CarryState(t: Long, id: Long)

  private def fold(k: Long, it: Iterator[TEv],
      state: GroupState[CarryState]): Iterator[AsOfOut] = {
    val evs = it.toArray.sortBy(e => (e.t, e.side, e.id))
    var st = state.getOption
    val out = scala.collection.mutable.ArrayBuffer.empty[AsOfOut]
    for (e <- evs) e.side match {
      case 0 =>
        // monotone carry: equal times resolve to the LARGER id — the
        // explicit id comparison matters across batches, where a
        // later-arriving equal-time reference with a smaller id must NOT
        // displace the carried winner (the intra-batch sort alone only
        // guarantees the rule within one batch); late older rows are ignored
        val t = e.t.get
        if (st.forall(s => t > s.t || (t == s.t && e.id > s.id)))
          st = Some(CarryState(t, e.id))
      case _ =>
        val m = if (e.t.isEmpty) None else st // null left time matches nothing
        out += AsOfOut(k, e.id, e.t, m.map(_.t), m.map(_.id))
    }
    st.foreach(state.update)
    out.iterator
  }

  /** Right rows with null time must be filtered by the caller (they are "at
    * no time" and can never match).
    */
  def streamingAsOf(events: Dataset[TEv]): Dataset[AsOfOut] = {
    implicit val outEnc = Encoders.product[AsOfOut]
    implicit val stEnc = Encoders.product[CarryState]
    events.groupByKey(_.k)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
  }
}
