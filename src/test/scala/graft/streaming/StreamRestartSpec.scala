package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Checkpoint-restart recovery — the operational exactly-once contract a
  * production stream lives on, distinct from the single-run replay specs:
  * a windowed aggregation is STOPPED mid-flight (open windows held only in
  * checkpointed state), a brand-new query is started from the same
  * checkpoint, and post-restart events must MERGE into the recovered
  * window state, with every closed window reaching the file sink exactly
  * once across both process incarnations (`_spark_metadata` commit
  * protocol). This is what lets a 100-TB pipeline upgrade/crash/resume
  * without double-counting or losing open sessions.
  */
class StreamRestartSpec extends SparkTestBase {

  test("windowed agg survives stop/restart: recovered state merges new events, windows emit once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(min * 60 * 1000)
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val counts = mem.toDF.toDF("ts", "event_type")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .count()
      .select(col("window.start").as("win_start"), col("event_type"), col("count"))
    val out = java.nio.file.Files.createTempDirectory("graft_restart_out_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_restart_ck_").toString
    def start() = counts.writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()

    // incarnation 1: hour-0 gets two clicks, hour-1 one view; watermark
    // reaches only 0:10, so NOTHING is closed — the partial counts exist
    // solely in checkpointed state when we stop
    val q1 = start()
    try {
      mem.addData((ts(10), "click"), (ts(20), "click"), (ts(70), "view"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.read.option("basePath", out).parquet(out).count() == 0,
      "no window may emit before the watermark passes its end")

    // incarnation 2, same checkpoint: an hour-0 STRAGGLER (above the
    // recovered 0:10 watermark) must merge into the recovered hour-0
    // state, and a 3:30 event advances the watermark to 2:30, closing
    // hours 0 and 1
    val q2 = start()
    try {
      mem.addData((ts(40), "click"), (ts(210), "view"))
      q2.processAllAvailable()
    } finally q2.stop()

    val rows = spark.read.parquet(out)
      .collect().map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2)))
    // exactly one row per closed (window, type) — across BOTH incarnations
    assert(rows.map(x => (x._1, x._2)).distinct.length == rows.length,
      s"duplicate window emission after restart: ${rows.toSeq}")
    val byKey = rows.map(x => (x._1, x._2) -> x._3).toMap
    // hour 0 clicks = 2 pre-restart + 1 post-restart straggler: the 3 is
    // unreachable unless the recovered state held the pre-restart 2
    assert(byKey.get((0L, "click")).contains(3L), s"got ${rows.toSeq}")
    assert(byKey.get((60L, "view")).contains(1L), s"got ${rows.toSeq}")
    // the 3:30 view's own window is still open — withheld
    assert(!byKey.contains((180L, "view")))
  }
}
