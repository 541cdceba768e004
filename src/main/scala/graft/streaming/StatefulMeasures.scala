package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.Turn

/** Custom-state streaming derivation of the per-turn `turn_gap_secs`
  * measure (TranscriptGen.withMeasures' lag window in batch).
  *
  * Why flatMapGroupsWithState: Structured Streaming has NO window lag — a
  * per-row "previous event of the same key" needs explicit keyed state.
  * State per conversation is ONE (turn_idx, epoch-seconds) pair: within a
  * micro-batch the group's turns are sorted by turn_idx and chained off the
  * stored last turn, so gaps are exact across micro-batch boundaries as
  * long as each conversation arrives in turn order (the transcripts ingest
  * contract; a late turn would need a reprocessing pass, exactly like the
  * batch path re-running on a newer snapshot).
  *
  * State is evicted by event-time timeout one `stateHorizon` past the
  * watermark — bounded by OPEN conversations, not history.
  */
object StatefulMeasures {

  final case class LastTurn(turnIdx: Int, epochSecs: Long)

  final case class TurnGap(
      conv_id: String,
      turn_idx: Int,
      ts: java.sql.Timestamp,
      turn_gap_secs: Option[Double])

  /** Batch parity note: gaps are whole seconds (floor), matching the batch
    * `unix_timestamp(ts) - lag(unix_timestamp(ts))` definition. */
  private def epochSecs(ts: java.sql.Timestamp): Long = Math.floorDiv(ts.getTime, 1000L)

  private def perGroup(
      convId: String,
      turns: Iterator[Turn],
      state: GroupState[LastTurn]): Iterator[TurnGap] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val sorted = turns.toSeq.sortBy(_.turn_idx)
      var last = state.getOption
      val out = sorted.iterator.map { t =>
        val gap = last.map(l => (epochSecs(t.ts) - l.epochSecs).toDouble)
        last = Some(LastTurn(t.turn_idx, epochSecs(t.ts)))
        TurnGap(convId, t.turn_idx, t.ts, gap)
      }.toSeq
      last.foreach(state.update)
      // evict one hour past the watermark: an idle conversation's state goes
      // away once no in-order turn can still arrive for it
      if (state.getCurrentWatermarkMs() > 0)
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 3600 * 1000L)
      out.iterator
    }
  }

  /** Streaming turn gaps over a watermarked Dataset[Turn]. */
  def turnGaps(turns: Dataset[Turn]): Dataset[TurnGap] = {
    implicit val lastEnc = Encoders.product[LastTurn]
    implicit val outEnc = Encoders.product[TurnGap]
    implicit val keyEnc = Encoders.STRING
    turns
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(perGroup)
  }
}
