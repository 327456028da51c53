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
    // stop unconditionally (round-16 advice): a failure mid-loop would
    // otherwise leave the query active for the rest of the shared-session
    // suite, adding noise to every later streaming spec
    try {
      var i = 0
      while (i < batches) {
        mem.addData(i.toLong)
        q.processAllAvailable()
        i += 1
      }
      StreamMeter.drain(q, gate)
    } finally if (q.isActive) q.stop()
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

  /** A checkpoint-RESUMED run whose window fills (round-16 advice): batch
    * ids continue mid-sequence, so the id-based recovery would report the
    * cross-run total (lastBatchId + 1 = 5 here) as this run's count. With
    * `resumed = true` the meter reports the retained window length
    * instead — exact for this 2-batch run — and still flags `capped`.
    * MemoryStream can't resume from a checkpoint, so this drives the file
    * source: one file per micro-batch via maxFilesPerTrigger.
    */
  test("resumed capped run reports the window, not the cross-run id span") {
    withRetention(3) {
      import spark.implicits._
      val work = java.nio.file.Files
        .createTempDirectory("graft_meter_resume_").toString
      val feed = s"$work/feed"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(feed))
      def publish(tag: String, v: Long): Unit = {
        val staged = s"$work/staged_$tag"
        Seq(v).toDF("v").coalesce(1).write.mode("overwrite").parquet(staged)
        graft.core.Tables.listLocalParquetFiles(staged).zipWithIndex.foreach {
          case (f, i) => java.nio.file.Files.move(
            java.nio.file.Paths.get(f),
            java.nio.file.Paths.get(feed, s"${tag}_$i.parquet"))
        }
      }
      def start() = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.LongType))))
        .option("maxFilesPerTrigger", "1").parquet(feed)
        .writeStream.format("noop").outputMode("append")
        .option("checkpointLocation", s"$work/ckpt").start()
      try {
        // run 1: batches 0..2 commit into the checkpoint
        (0 until 3).foreach(i => publish(s"a$i", i.toLong))
        val q1 = start()
        try StreamMeter.drain(q1, "meter_spec_resumed_r1")
        finally if (q1.isActive) q1.stop()
        // run 2 RESUMES: 2 more files → batch ids 3..4; the 3-retention
        // window holds exactly 2 events, so it reads full and capped trips
        (0 until 2).foreach(i => publish(s"b$i", 10L + i))
        val q2 = start()
        try StreamMeter.drain(q2, "meter_spec_resumed", resumed = true)
        finally if (q2.isActive) q2.stop()
        val m = StreamMeter.snapshot("meter_spec_resumed")
        assert(m.capped, s"resumed run filling the window must flag capped: $m")
        assert(m.batches == 2,
          s"resumed+capped must report this run's retained window (2), " +
            s"never the cross-run id span (5): $m")
        assert(m.dataBatches == 2, s"$m")
      } finally graft.core.Tables.deleteRecursively(work)
    }
  }
}
