package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Per-gate streaming-run telemetry (round-14 verdict item 6): every
  * streaming gate drains its query through [[drain]], which records the
  * run's micro-batch count and final state-store row count keyed by the
  * GATE name. Bench emits the snapshot as `streaming_meter` in the
  * archival artifact, so "this streaming row is init-dominated" is
  * measured per row — a 6 s stream-stream join that ran 3 micro-batches
  * holding 12k state rows reads very differently from one that ran 40 —
  * instead of inferred from the single 1-row `streaming_overhead` probe.
  *
  * The map keeps the LAST run per gate (Bench runs each gate 2× plus a
  * warm-up; replays are deterministic over fixed fixtures, so the counts
  * are identical across runs of a generation). Thread-safe; Verify's
  * sequential gate loop and Bench's timed loop both just see their own
  * last drain.
  */
object StreamMeter {

  final case class Meter(batches: Int, dataBatches: Int, stateRows: Long,
                         capped: Boolean)

  private val meters =
    scala.collection.concurrent.TrieMap.empty[String, Meter]

  /** `processAllAvailable()` + `stop()` + record the run's progress
    * telemetry under `gate`. Exactly the drain idiom every streaming
    * gate already used, with the metering attached at the one seam they
    * share. `batches` counts every micro-batch the engine planned;
    * `dataBatches` only those that carried input rows (the no-data
    * batches watermark/state-cleanup ticks add); `stateRows` is the sum
    * over state operators of rows held after the final batch. `capped`
    * flags when the counts hit `recentProgress`'s retention window
    * (`spark.sql.streaming.numRecentProgressUpdates`, default 100) —
    * a >100-batch run would otherwise report a silently clamped count
    * (round-15 review finding); every current gate drains in ≤ 4.
    */
  def drain(q: StreamingQuery, gate: String): Unit = {
    q.processAllAvailable()
    q.stop()
    val prog = q.recentProgress
    val retention =
      try q.sparkSession.conf
        .get("spark.sql.streaming.numRecentProgressUpdates", "100").toInt
      catch { case _: Throwable => 100 }
    meters.put(gate, Meter(
      batches = prog.length,
      dataBatches = prog.count(_.numInputRows > 0L),
      stateRows = prog.lastOption
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L),
      capped = prog.length >= retention))
  }

  def snapshot: Map[String, Meter] = meters.toMap

  def reset(): Unit = meters.clear()
}
