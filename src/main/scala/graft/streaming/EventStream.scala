package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.NumericFunctions.roundN
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table (extension surface —
  * SURVEY.md §2.11: the reference has no streaming; the fixtures' `ts`
  * column exists for exactly this demo).
  *
  * The batch twins live in [[graft.operators.EventOps]]; Spark's unified
  * model means the same Column expressions run in both modes. For local
  * verification the parquet file is replayed through `readStream` and
  * drained synchronously with `processAllAvailable()` into a memory sink.
  */
object EventStream {

  /** Raw schema: ts arrives as long nanos (see Tables.events — the parquet
    * TIMESTAMP(NANOS) workaround) and is rebuilt as a timestamp.
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file-stream source rejects a literal file path (basePath must be
    // a directory) — a glob that matches only events.parquet sidesteps it
    spark.readStream
      .schema(eventSchema)
      .parquet(s"$dir/{events}.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Windowed streaming aggregation with a watermark: hourly counts + value
    * sums per event type. Late events beyond 2 hours are dropped — state
    * stays bounded however long the stream runs.
    */
  def hourlyCounts(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val agg = readEvents(spark, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), roundN(sum("value"), 2).as("total_value"))
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    // UTC session ⇒ cast to NTZ keeps wall-clock time; matches the batch twin
    spark.table(queryName)
      .withColumn("hour_start", col("hour_start").cast("timestamp_ntz"))
  }

  /** Streaming exact dedup — the training-pipeline "drop replayed events"
    * stage: dropDuplicatesWithinWatermark keys state by event_id and
    * evicts it once the watermark passes, so state stays bounded on an
    * unbounded stream (a plain dropDuplicates would grow state forever).
    * Emits per-type counts of the deduplicated stream; equals the batch
    * distinct count, which the oracle checks.
    */
  def dedupCounts(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val agg = readEvents(spark, dir)
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                event_type: String, value: Double, props: String)
  case class SessionState(count: Long, total: Double, lastSec: Long)
  case class SessionOut(user_id: Long, events_in_session: Long, session_value: Double)

  /** Custom stateful sessionization with flatMapGroupsWithState: a session
    * closes after a 30-minute event-time gap. The batch twin is
    * EventOps.userSessions (lag + windowed sum).
    */
  def sessionize(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    import spark.implicits._
    val ds = readEvents(spark, dir).as[Ev]
    val out = ds
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, events: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.count, s.total))
          } else {
            // events within a micro-batch are not ordered; sort this user's slice
            val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val sec = e.ts.getTime / 1000
              cur match {
                case Some(s) if sec - s.lastSec <= 1800 =>
                  cur = Some(SessionState(s.count + 1, s.total + e.value, sec))
                case Some(s) =>
                  closed ::= SessionOut(user, s.count, s.total)
                  cur = Some(SessionState(1, e.value, sec))
                case None =>
                  cur = Some(SessionState(1, e.value, sec))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSec * 1000 + 1800 * 1000)
            }
            closed.reverseIterator
          }
      }
    val q = out.writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
