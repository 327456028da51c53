package graft.operators

import graft.SparkTestBase
import graft.core.Tables
import graft.streaming.EventStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Guards against fixture encoding drift (round-8 postmortem: the driver
  * regenerated `events.parquet` with `ts` as TIMESTAMP(MICROS) where prior
  * generations used TIMESTAMP(NANOS)-read-as-long, and the hard-coded nanos
  * path broke 24 gates — the streaming side SILENTLY, every timestamp
  * compressed 1000×).
  *
  * The same micro corpus is written in all three physical encodings the
  * dispatch supports — raw INT64 nanos, TIMESTAMP(MICROS) NTZ, and
  * UTC-adjusted TIMESTAMP — and both the batch reader (`Tables.events` →
  * `EventOps.hourlyTypeCounts`) and the streaming reader
  * (`EventStream.hourlyCounts`) must produce identical results across them.
  * If the adaptive dispatch in either reader is removed, the nanos variant
  * throws (batch) or the row sets diverge (streaming), so this spec fails
  * before the driver's gates do on the next regeneration.
  */
class EncodingDriftSpec extends SparkTestBase {

  /** 40 events over ~6 hours for 3 users / 2 types, nanos-precision values
    * chosen so micros truncation is exact (whole seconds).
    */
  private lazy val encodedDirs: Map[String, String] = {
    import spark.implicits._
    val base = (0 until 40).map { i =>
      val sec = 1700000000L + i * 540L // every 9 minutes
      (i.toLong, sec, i.toLong % 3,
        if (i % 2 == 0) "click" else "purchase", i * 1.25, s"""{"k":$i}""")
    }
    val root = java.nio.file.Files.createTempDirectory("graft_enc_").toString

    // 1) raw INT64 nanos — what a TIMESTAMP(NANOS) file surfaces as under
    // legacy.parquet.nanosAsLong (Spark cannot author real NANOS parquet,
    // but the reader-visible schema is identical: ts comes back LongType)
    base.map { case (id, sec, u, ty, v, p) => (id, sec * 1000000000L, u, ty, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$root/nanos/events.parquet")

    // 2) TIMESTAMP(MICROS) isAdjustedToUTC=false — timestamp_ntz, the
    // current fixture encoding
    base.map { case (id, sec, u, ty, v, p) => (id, sec, u, ty, v, p) }
      .toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("cast(timestamp_seconds(sec) as timestamp_ntz)"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$root/micros_ntz/events.parquet")

    // 3) UTC-adjusted TIMESTAMP(MICROS) — session is pinned UTC so the
    // wall-clock content matches the NTZ variant
    base.map { case (id, sec, u, ty, v, p) => (id, sec, u, ty, v, p) }
      .toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$root/micros_ltz/events.parquet")

    Map("nanos" -> s"$root/nanos", "micros_ntz" -> s"$root/micros_ntz",
      "micros_ltz" -> s"$root/micros_ltz")
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("batch events read is encoding-adaptive: hourlyTypeCounts parity") {
    val results = encodedDirs.map { case (enc, dir) =>
      val out = EventOps.hourlyTypeCounts(Tables(spark, dir))
      // contract: ts-derived column independent of physical encoding
      enc -> canon(out)
    }
    val distinct = results.values.toSeq.distinct
    assert(distinct.size == 1,
      s"batch hourly counts diverge across encodings: ${results.keys}")
    assert(results("micros_ntz").nonEmpty)
  }

  test("streaming events read is encoding-adaptive: hourlyCounts parity") {
    val results = encodedDirs.map { case (enc, dir) =>
      enc -> canon(EventStream.hourlyCounts(spark, dir,
        s"enc_drift_${enc}_${System.nanoTime()}"))
    }
    val distinct = results.values.toSeq.distinct
    assert(distinct.size == 1,
      s"streaming hourly counts diverge across encodings: ${results.keys}")
    assert(results("micros_ntz").nonEmpty)
  }

  test("streaming dedup adapts to documents fixture width drift") {
    import spark.implicits._
    // same micro corpus in two physical widths: the current fixture shape
    // (int64 ids/counts) and a narrowed regeneration (int32) — the
    // DedupStream footer probe must absorb either, and the emitted pair
    // set must equal the batch operator's on both
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "totally different words in this other document here"),
      (4L, "alpha beta gamma delta epsilon zeta eta iota"))
    val root = java.nio.file.Files.createTempDirectory("graft_docenc_").toString
    docs.map { case (id, tx) => (id, tx, "en", "s0", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$root/wide/documents.parquet")
    docs.map { case (id, tx) => (id.toInt, tx, "en", "s0", tx.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$root/narrow/documents.parquet")
    val results = Seq("wide", "narrow").map { enc =>
      val dir = s"$root/$enc"
      // width-agnostic reads: the batch operator propagates the fixture's
      // id width to its output (int32 on the narrow variant), while the
      // typed streaming operator always emits longs
      val streamed = graft.streaming.DedupStream
        .minhashPairs(spark, dir, s"docenc_${enc}_${System.nanoTime()}", 0.3)
        .collect()
        .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)).toSet
      val batch = graft.operators.DedupOps
        .minhashDupPairs(graft.core.Tables(spark, dir), 0.3)
        .collect()
        .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)).toSet
      assert(streamed == batch, s"stream vs batch pair sets differ on $enc")
      streamed
    }
    assert(results.distinct.size == 1, "pair sets differ across encodings")
    assert(results.head.nonEmpty, "vacuous: no near-dup pairs in the fixture")
  }

  test("in-place fixture regeneration invalidates the streaming schema caches") {
    import spark.implicits._
    // The driver regenerates fixtures IN-PLACE under a running JVM (the
    // round-8 ts drift arrived exactly that way), so the streaming schema
    // caches key on (dir, fixture generation stamp): a rewrite with a different
    // physical encoding must be picked up without a restart. With a
    // dir-only key the second read below would apply the stale NTZ schema
    // to raw int64 nanos — the silent 1000× compression class.
    val root = java.nio.file.Files.createTempDirectory("graft_regen_").toString
    val base = (0 until 12).map { i =>
      val sec = 1700000000L + i * 540L
      (i.toLong, sec, i.toLong % 3,
        if (i % 2 == 0) "click" else "purchase", i * 1.25, s"""{"k":$i}""")
    }
    def writeMicros(): Unit = base
      .toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("cast(timestamp_seconds(sec) as timestamp_ntz)"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/events.parquet")
    def writeNanos(): Unit = base
      .map { case (id, sec, u, ty, v, p) => (id, sec * 1000000000L, u, ty, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/events.parquet")

    writeMicros()
    val before = canon(EventStream.hourlyCounts(spark, root,
      s"regen_a_${System.nanoTime()}"))
    writeNanos() // regeneration-in-place: same dir, different physical type
    val after = canon(EventStream.hourlyCounts(spark, root,
      s"regen_b_${System.nanoTime()}"))
    assert(before == after,
      "regenerated encoding served through a stale cached streaming schema")
    assert(before.nonEmpty)

    // same contract for the documents schema probe in DedupStream
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "totally different words in this other document here"))
    val droot = java.nio.file.Files.createTempDirectory("graft_regen_doc_").toString
    docs.map { case (id, tx) => (id, tx, "en", "s0", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$droot/documents.parquet")
    val widePairs = graft.streaming.DedupStream
      .minhashPairs(spark, droot, s"regen_doc_a_${System.nanoTime()}", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    docs.map { case (id, tx) => (id.toInt, tx, "en", "s0", tx.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$droot/documents.parquet")
    val narrowPairs = graft.streaming.DedupStream
      .minhashPairs(spark, droot, s"regen_doc_b_${System.nanoTime()}", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(widePairs == narrowPairs && widePairs.nonEmpty,
      "regenerated documents width served through a stale cached schema")
  }

  test("batch and streaming agree on every encoding") {
    encodedDirs.foreach { case (enc, dir) =>
      val batch = canon(EventOps.hourlyTypeCounts(Tables(spark, dir))
        .select("hour_start", "event_type", "n"))
      val stream = canon(EventStream.hourlyCounts(spark, dir,
        s"enc_bs_${enc}_${System.nanoTime()}")
        .select("hour_start", "event_type", "n"))
      assert(batch == stream, s"batch vs streaming mismatch on $enc")
    }
  }
}
