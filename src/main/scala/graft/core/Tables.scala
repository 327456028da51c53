package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lazy accessors for the driver-provided synthetic tables (TESTDATA.md).
  *
  * Every table is a plain parquet directory under `dir`; reads go through
  * `spark.read.parquet` so Catalyst gets filter pushdown + column pruning
  * against the parquet footers for free. At 100 TB these would be
  * partitioned tables behind a catalog — the accessors keep that swap
  * behind one seam.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** `events.ts` has drifted across fixture generations — parquet
    * TIMESTAMP(NANOS) in early rounds, TIMESTAMP(MICROS) since — so the
    * read dispatches on the OBSERVED schema instead of hard-coding one
    * physical encoding (round-8 verdict #1):
    *   - LongType (a NANOS column surfaced as raw longs by
    *     legacy.parquet.nanosAsLong, which Spark's vectorized reader
    *     otherwise rejects): rebuild at microsecond precision with integer
    *     division — a double roundtrip would lose precision above 2^53 ns;
    *   - TimestampNTZType (MICROS, isAdjustedToUTC=false): already the
    *     contract type, pass through;
    *   - TimestampType (MICROS/MILLIS, UTC-adjusted): cast to NTZ — the
    *     session is pinned UTC so wall-clock time is preserved.
    * Output contract either way: `ts` is timestamp_ntz.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case TimestampNTZType => raw
      case TimestampType    => raw.withColumn("ts", col("ts").cast(TimestampNTZType))
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical encoding $other")
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** Total parquet row-group count of `dir/<name>.parquet` — the table's
    * REAL scan-parallelism ceiling (Spark can split a parquet file no
    * finer than its row groups: a 1-row-group file yields byte-range
    * splits but every row lands in the one split holding the group's
    * midpoint). Footer-only reads, cached per (dir, name, generation
    * stamp) so a fixture regeneration under a running JVM invalidates it
    * like the other per-generation caches. Unreadable layouts report
    * Int.MaxValue — "assume parallel", so [[balancedByKey]] never adds
    * an exchange on a layout it can't see.
    */
  private[graft] def scanUnits(name: String): Int = {
    val stamp = Tables.fixtureStamp(s"$dir/$name.parquet")
    val key = (dir, name, stamp)
    Tables.scanUnitCache.keys
      .filter(k => k._1 == dir && k._2 == name && k._3 != stamp)
      .foreach(Tables.scanUnitCache.remove)
    Tables.scanUnitCache.getOrElseUpdate(key,
      try {
        val conf = spark.sessionState.newHadoopConf()
        val root = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
        val fs = root.getFileSystem(conf)
        val files =
          if (fs.getFileStatus(root).isDirectory)
            fs.listStatus(root).toSeq
              .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          else Seq(fs.getFileStatus(root))
        // an EMPTY listing means a layout this non-recursive walk cannot
        // see (hive-partitioned/nested part files) — report "assume
        // parallel" like the unreadable case, so balancedByKey never adds
        // an exchange on a layout it didn't actually measure (round-18
        // advice; 0 would have made the condition fire unconditionally)
        if (files.isEmpty) Int.MaxValue
        else files.map { st =>
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
          try reader.getRowGroups.size
          finally reader.close()
        }.sum
      } catch { case scala.util.control.NonFatal(_) => Int.MaxValue })
  }

  /** `name`.parquet re-parallelized when (and only when) its file layout
    * under-parallelizes the session — the optimization-guide §2.5 "input
    * skew: repartition immediately after the read" case. The bench
    * fixtures ship each table as ONE file with ONE row group per scale
    * decade, so every map-heavy pipeline over them (tokenize / shingle /
    * hash / codec work) otherwise runs on ≤ rowGroups tasks no matter how
    * many cores the session has. When the row-group count is below the
    * session's core count the frame is hash-repartitioned on `key`
    * (deterministic — unlike round-robin it needs no sort-before-
    * repartition and survives task retries trivially — and downstream
    * exchanges keyed the same way can reuse it). On production layouts
    * (row groups ≫ cores) the condition is false and NO exchange is
    * added, so this never ships corpus bytes through an extra shuffle at
    * scale: the decision derives from the input layout, not a constant
    * tuned for either local mode or a cluster.
    */
  private def balancedByKey(name: String, key: String): DataFrame = {
    val df = t(name)
    // SPARK_GRAFT_SCAN_REBALANCE=off is the A/B kill switch: it
    // reproduces the pre-round-17 plans exactly (used for the committed
    // before/after plan dumps and for isolating the rebalance in perf
    // triage).
    if (sys.env.get("SPARK_GRAFT_SCAN_REBALANCE").contains("off")) return df
    val par = spark.sparkContext.defaultParallelism
    // numPartitions passed EXPLICITLY: a bare repartition(col) is
    // AQE-optimizable and the advisory size (64 MB) coalesces a small
    // corpus right back to one post-shuffle partition — exactly the
    // bottleneck this exchange exists to break. An explicit count is
    // user-specified partitioning, which AQE leaves alone.
    if (scanUnits(name) >= par) df
    else df.repartition(par, org.apache.spark.sql.functions.col(key))
  }

  /** [[documents]] with scan parallelism restored for per-row-HEAVY
    * consumers (tokenizers, shinglers, per-doc hashing, codec work) —
    * see [[balancedByKey]]. Cheap/metadata consumers should keep using
    * [[documents]]: for them the conditional exchange is pure overhead.
    */
  def documentsBalanced: DataFrame = balancedByKey("documents", "doc_id")

  /** [[lineitem]] rebalanced for per-row-heavy consumers (per-row
    * digest/sketch math) — same contract as [[documentsBalanced]].
    */
  def lineitemBalanced: DataFrame = balancedByKey("lineitem", "l_orderkey")

}

object Tables {
  /** (dir, table name, generation stamp) → total parquet row-group count;
    * see [[Tables.scanUnits]]. */
  private[core] val scanUnitCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, Long), Int]

  /** Generation stamp of a fixture file (or directory of part-files):
    * max mtime, total bytes and file count mixed into one long; 0 when
    * unreadable. Cache keys that include it survive the driver
    * regenerating fixtures in-place under a running JVM — the round-8
    * events.ts NANOS→MICROS drift happened exactly that way, and a cache
    * keyed on the path alone would keep serving the stale physical
    * encoding until a restart. Byte size and file count are folded in
    * because mtime alone has millisecond granularity: a regeneration
    * landing in the same millisecond as the previous write (fast tmpfs,
    * mtime-preserving copy tools) would otherwise collide, and a changed
    * encoding virtually always changes the byte size.
    */
  def fixtureStamp(path: String): Long =
    try {
      val stream = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      try {
        var mtime = 0L; var bytes = 0L; var n = 0L
        stream.filter(java.nio.file.Files.isRegularFile(_)).forEach { f =>
          mtime = math.max(mtime,
            java.nio.file.Files.getLastModifiedTime(f).toMillis)
          bytes += java.nio.file.Files.size(f)
          n += 1
        }
        mtime ^ (bytes * 0x9E3779B97F4A7C15L) ^ java.lang.Long.rotateLeft(n, 32)
      } finally stream.close()
    } catch { case _: Throwable => 0L }

  /** getOrElseUpdate keyed on (dir, CURRENT generation stamp of
    * `dir/fixture`), evicting other generations of the same dir on sight
    * — the shared contract behind `EventStream.tsTypeCache`,
    * `DedupStream.docSchemaCache` and `DedupOps.pairGraphs` (the latter
    * keeps a wider key for session identity and threshold, so it inlines
    * the same eviction rule rather than calling here).
    */
  /** Best-effort recursive delete for evicted derivation dirs (temp
    * parquet the per-generation caches materialized); IO failures are
    * swallowed — a leaked dir is the pre-fix status quo, never an error
    * — but fatal VM errors and interrupts propagate.
    */
  /** Sorted non-recursive listing of a LOCAL directory's parquet data
    * files — the shared helper for staging/feed temp dirs the engine
    * itself just wrote (WAP staging, CDC feed publication), so the
    * listing rule can't drift between them. Remote/object-store listings
    * go through the Hadoop FS interface instead
    * ([[graft.sources.ParquetStats.listParquetFiles]]).
    */
  def listLocalParquetFiles(dir: String): Seq[String] = {
    val stream = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(_.toString).toVector.sorted
    } finally stream.close()
  }

  /** Best-effort recursive delete of `path` at JVM exit — the cleanup
    * every per-generation temp index/feed dir registers so repeated runs
    * can't strand directories under /tmp (round-13 advice). Idempotent
    * with [[cachedPathPerGeneration]]'s evict-with-delete: a dir already
    * removed by eviction makes the hook a no-op.
    */
  def deleteRecursivelyOnExit(path: String): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(path)))

  def deleteRecursively(path: String): Unit =
    try {
      val root = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.exists(root)) {
        val stream = java.nio.file.Files.walk(root)
        try stream.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally stream.close()
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  /** [[cachedPerGeneration]] for values that ARE on-disk paths: evicting
    * a stale generation also DELETES its materialized directory, so a
    * long-running JVM doesn't strand one full derivation per fixture
    * regeneration. One stamp read serves both the evict-with-delete and
    * the lookup, so no eviction can slip through without its delete.
    * Caveat (the `LayoutOps.layoutDir` posture): a caller that held a
    * LAZY frame over the old generation's dir across a regeneration
    * would scan deleted files — Verify/Bench evaluate promptly and
    * fixture regeneration is quiescent during gate runs.
    */
  def cachedPathPerGeneration(
      cache: scala.collection.concurrent.TrieMap[(String, Long), String],
      dir: String, fixture: String)(compute: => String): String = {
    val key = (dir, fixtureStamp(s"$dir/$fixture"))
    cache.keys.filter(k => k._1 == dir && k._2 != key._2)
      .foreach(k => cache.remove(k).foreach(deleteRecursively))
    cache.get(key) match {
      case Some(v) => v
      case None =>
        val v = compute
        // same stale-compute guard as cachedPerGeneration: never cache a
        // value computed against files a regeneration just replaced
        if (fixtureStamp(s"$dir/$fixture") == key._2)
          cache.putIfAbsent(key, v).getOrElse(v)
        else v
    }
  }

  def cachedPerGeneration[V](
      cache: scala.collection.concurrent.TrieMap[(String, Long), V],
      dir: String, fixture: String)(compute: => V): V = {
    val key = (dir, fixtureStamp(s"$dir/$fixture"))
    cache.keys.filter(k => k._1 == dir && k._2 != key._2)
      .foreach(cache.remove)
    cache.get(key) match {
      case Some(v) => v
      case None =>
        val v = compute
        // re-read the stamp before caching (round-10 advice): a fixture
        // regeneration landing DURING a long compute would otherwise
        // cache the pre-regeneration value under the new generation's
        // key and serve it until yet another regeneration. The value is
        // still returned (this caller computed against the old files,
        // same as before), it just never enters the cache.
        if (fixtureStamp(s"$dir/$fixture") == key._2)
          cache.putIfAbsent(key, v).getOrElse(v)
        else v
    }
  }
}
