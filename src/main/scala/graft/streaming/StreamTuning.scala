package graft.streaming

import org.apache.spark.sql.SparkSession

/** Scale-adaptive shuffle/state partitioning for the bounded streaming
  * gates (round-17 optimization; guide §2 "make partitioning
  * scale-adaptive — derive from input size — rather than a constant tuned
  * for either local mode or the cluster").
  *
  * A Structured Streaming stateful operator instantiates one state store
  * per shuffle partition per operator, and every micro-batch pays a
  * commit (delta file + maintenance bookkeeping) per store instance.
  * AQE never coalesces these exchanges — `spark.sql.shuffle.partitions`
  * is captured at query start and pinned for the checkpoint's lifetime —
  * so a session sized for batch work (cores = 32 here) runs a 2 MB
  * replay through 32 state partitions x up to 4 stores x batches, and
  * engine bookkeeping dwarfs data cost: the r17 baseline read the
  * stream-stream joins at ~8.7 s against 142 total state rows.
  *
  * [[statePartitions]] derives the partition count from the INPUT SIZE
  * (one state partition per ~16 MB of replayed input, floor 4), capped at
  * the session's configured shuffle partitions so a production session —
  * where the conf is already sized to the cluster and the state volume —
  * is NEVER re-tuned upward or downward beyond its own setting: with
  * input >> partitions x 16 MB the derived value hits the cap and the
  * wrapper is a no-op. `SPARK_GRAFT_STREAM_SHUFFLE` pins the value for
  * A/B runs.
  *
  * Results are partitioning-independent: watermark math, stateful
  * aggregation, dedup and join semantics key on row content, never on
  * the partition a row lands in (the correctness gates re-verify this
  * against the DuckDB oracle at every SF).
  */
object StreamTuning {

  private val bytesPerPartition = 16L << 20

  /** Cached per (dir, fixture generation): total bytes under the fixture
    * path — the replay volume the partition count is derived from.
    */
  private val bytesCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long), Long]

  private[streaming] def inputBytes(dir: String, fixture: String): Long =
    graft.core.Tables.cachedPerGeneration(bytesCache, dir, fixture) {
      try {
        val stream = java.nio.file.Files.walk(
          java.nio.file.Paths.get(s"$dir/$fixture"))
        try stream.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally stream.close()
      } catch { case scala.util.control.NonFatal(_) => Long.MaxValue }
    }

  private[streaming] def statePartitions(spark: SparkSession, bytes: Long): Int = {
    val configured = spark.sessionState.conf.numShufflePartitions
    // validated parse (round-18 advice): a malformed or non-positive
    // override must fail HERE with a clear message, not as a
    // NumberFormatException deep inside a gate or an invalid
    // spark.sql.shuffle.partitions setting — the env var is an A/B pin,
    // and a typo silently ignored would invalidate the A/B.
    sys.env.get("SPARK_GRAFT_STREAM_SHUFFLE").map { raw =>
      val v = raw.trim.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"SPARK_GRAFT_STREAM_SHUFFLE must be an integer, got '$raw'"))
      require(v >= 1, s"SPARK_GRAFT_STREAM_SHUFFLE must be >= 1, got $v")
      v
    }.getOrElse {
      val derived = math.max(4L, (bytes + bytesPerPartition - 1) / bytesPerPartition)
      math.min(configured.toLong, derived).toInt
    }
  }

  /** Run `body` (stream start + synchronous drain) with
    * `spark.sql.shuffle.partitions` set to the input-derived state
    * partition count, restoring the session value afterwards. The
    * streaming query clones the session conf when its stream execution
    * begins, so the override must span the drain, not just `start()`.
    * Batch queries planned inside `body` (foreachBatch merges) see the
    * same reduced value — their inputs are the same micro-batches, so
    * the sizing argument holds for them too.
    *
    * NOT thread-safe / reentrant (round-18 advice): the set/restore
    * mutates the SHARED session conf, so concurrent gates on one session
    * would see each other's override, and nested use restores the inner
    * value. Safe under the engine's actual execution model — Verify and
    * Bench run gates serially on the session — but a caller that ever
    * parallelizes gates must scope the override via `spark.newSession()`
    * instead.
    */
  def withStatePartitions[T](spark: SparkSession, dir: String,
                             fixture: String)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key,
      statePartitions(spark, inputBytes(dir, fixture)).toString)
    try body finally spark.conf.set(key, prev)
  }
}
