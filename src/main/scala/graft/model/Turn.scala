package graft.model

import java.sql.Timestamp

/** Primary engine input row — the Iceberg-shaped transcripts table fixed by
  * BASELINE.json `input_hint`. Maps onto the reference's per-participant
  * event rows (ParticipantIdentifier/LogId/StartDate, see
  * /root/reference/scripts/daily-measures.R:56-72):
  *   conv_id  ≙ ParticipantIdentifier (entity key)
  *   turn_idx ≙ stable intra-entity ordering key (episode/epoch order)
  *   role     ≙ stage `Value` domain (user|assistant|tool)
  *   text     ≙ payload; byte-equality must survive every engine pass
  *   tool     ≙ `Type` discriminator (tool name or "")
  *   ts       ≙ event time (UTC µs), non-decreasing within conv_id
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** One row of a rollup tier: mergeable stat block per (entity, bucket).
  * The block fields are chosen to be ASSOCIATIVELY mergeable so the
  * 1m → 1h → 1d cascade and salted sub-partition merges (SURVEY.md §7) are
  * exact:
  *   n_rows                 — count of input rows (count(*))
  *   n_vals                 — count of non-null measures (A2)
  *   sum / sum_sq           — Σx, Σx² → mean, var_samp, stddev_samp (A3, A5)
  *   min / max              — A6
  *   sum_sin / sum_cos      — Σsin, Σcos of 2π·x/period → circular mean/SD
  *                            (A9/A10, psych::circadian.* parity)
  */
final case class TierRow(
    conv_id: String,
    bucket_start: Timestamp,
    n_rows: Long,
    n_vals: Long,
    sum: Double,
    sum_sq: Double,
    min: Double,
    max: Double,
    sum_sin: Double,
    sum_cos: Double)
