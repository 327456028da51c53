package graft.sources

import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parquet footer statistics as a TABLE — the manifest / zone-map
  * primitive behind every file-pruning scan at 100 TB. A parquet footer
  * already carries per-row-group min/max/null-count for every column;
  * collecting those into a stats table costs one FOOTER read per file
  * (a few KB at the file's tail — no data pages are touched), and the
  * resulting table is what a planner consults to skip files whose
  * [min, max] can't match a predicate (the same mechanism
  * [[graft.operators.LayoutOps]]' z-order write exists to sharpen, and
  * the hand-rolled version of Iceberg/Delta manifests).
  *
  * The stats scan is distributed: the driver lists file paths
  * (O(#files) strings), executors each open only their partition's
  * footers via `ParquetFileReader` — so a million-file corpus reads a
  * million footers across the cluster, not through the driver.
  */
object ParquetStats {

  /** One row per (file, INT64 column): total rows, null count, min, max
    * — aggregated across the file's row groups from footer statistics
    * only, skipping stats-less groups the way a SQL min/max over the
    * metadata rows skips NULLs; `stats_complete` reports whether every
    * group contributed (pruning treats an incomplete file as
    * un-skippable).
    */
  def footerStats(t: Tables, fileGlobDir: String,
                  cols: Seq[String]): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    // list through the Hadoop FS interface (what an object store exposes),
    // not java.io — the same posture as LayoutOps.parquetBytes; flat dir
    // (partitioned layouts pass each leaf dir, as their scans do)
    val dirPath = new org.apache.hadoop.fs.Path(fileGlobDir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val paths = fs.listStatus(dirPath)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).toSeq.sorted
    val wanted = cols.toSet
    // ship the session's Hadoop conf to executors as plain entries
    // (object-store credentials/endpoints live there; Configuration
    // itself is not serializable and Spark's wrapper is private)
    val confEntries: Map[String, String] = {
      import scala.jdk.CollectionConverters._
      spark.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => e.getKey -> e.getValue).toMap
    }
    spark.createDataset(paths)
      .repartition(math.min(paths.size, 32).max(1))
      .flatMap { p =>
        val conf = new org.apache.hadoop.conf.Configuration()
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(p), conf))
        try {
          import scala.jdk.CollectionConverters._
          val blocks = reader.getFooter.getBlocks.asScala.toSeq
          val fileName = new org.apache.hadoop.fs.Path(p).getName
          wanted.toSeq.sorted.map { c =>
            var rows = 0L; var nulls = 0L
            var mn: Option[Long] = None; var mx: Option[Long] = None
            var complete = true
            blocks.foreach { b =>
              b.getColumns.asScala
                .find(_.getPath.toDotString == c)
                .foreach { chunk =>
                  rows += b.getRowCount
                  val st = chunk.getStatistics
                  if (st != null && st.isNumNullsSet) nulls += st.getNumNulls
                  // min/max aggregate over the row groups that HAVE
                  // stats (a SQL min/max over the metadata rows skips
                  // NULLs the same way — the oracle's semantics);
                  // `stats_complete` records whether every group
                  // contributed, which is what pruning must consult —
                  // a partial min/max says nothing about the rows in
                  // the stats-less groups
                  if (st == null || !st.hasNonNullValue) complete = false
                  else {
                    val lo = st.genericGetMin.asInstanceOf[Number].longValue
                    val hi = st.genericGetMax.asInstanceOf[Number].longValue
                    mn = Some(mn.fold(lo)(math.min(_, lo)))
                    mx = Some(mx.fold(hi)(math.max(_, hi)))
                  }
                }
            }
            (fileName, c, rows, nulls, mn, mx, complete)
          }
        } finally reader.close()
      }
      .toDF("file_name", "column", "n_rows", "null_count",
        "min_value", "max_value", "stats_complete")
  }

  /** Gate query: footer stats of the fixture's `documents.parquet` over
    * its INT64 columns, ordered for the hash. The oracle reads the SAME
    * footers through DuckDB's `parquet_metadata()` — two independent
    * parquet implementations must agree byte-for-byte on the zone maps.
    */
  def documentsFooterStats(t: Tables): DataFrame =
    // listStatus on a file path returns that file — only the one footer
    // is opened, not every fixture table's
    footerStats(t, s"${t.dir}/documents.parquet", Seq("doc_id", "n_chars"))
      .orderBy("file_name", "column")

  /** Manifest-driven scan: consult [[footerStats]] and hand Spark ONLY
    * the files whose [min, max] zone map can contain `[lo, hi]` rows —
    * files are skipped before they are OPENED (Spark's own row-group
    * pruning still needs a footer read per file; at 100 TB on an object
    * store, not issuing those GETs is the win, and it is exactly what an
    * Iceberg/Delta manifest buys). Files without stats are kept — "can't
    * prove it can't match" never skips. The result is
    * boundary-independent: pruning only drops files the residual filter
    * would have emptied anyway, so correctness never depends on HOW the
    * data was laid out — only the skip COUNT does (measured in the spec).
    * The driver-side file-name collect is O(#files), the same order as
    * the directory listing itself.
    */
  def prunedScan(t: Tables, dir: String, column: String,
                 lo: Long, hi: Long): (DataFrame, Int, Int) = {
    val stats = footerStats(t, dir, Seq(column)).collect()
    val total = stats.length
    val keep = stats.filter { r =>
      val mn = Option(r.getAs[java.lang.Long]("min_value"))
      val mx = Option(r.getAs[java.lang.Long]("max_value"))
      // a file whose stats are incomplete can't be skipped: its partial
      // min/max says nothing about the rows in the stats-less groups
      !r.getAs[Boolean]("stats_complete") ||
        mn.isEmpty || mx.isEmpty || (mx.get >= lo && mn.get <= hi)
    }.map(r => s"$dir/${r.getAs[String]("file_name")}")
    val df =
      if (keep.isEmpty)
        t.spark.read.parquet(dir).filter(lit(false))
      else t.spark.read.parquet(keep.toIndexedSeq: _*)
    (df.filter(col(column) >= lo && col(column) <= hi), keep.length, total)
  }

  /** Clustering-depth METER over the stats table — the decision input
    * for "is this column worth re-clustering": `span_sum / global_span`
    * is the expected number of files whose zone map contains a uniform
    * random probe point (≈1 on a range-clustered layout, ≈#files on a
    * shuffled one — both measured in `ParquetStatsSpec`). Emitted as the
    * two exact LONG terms, not the ratio, so the row hash-gates with no
    * floating point; consumes footers only, like everything above.
    */
  def clusteringDepth(t: Tables, dir: String, cols: Seq[String]): DataFrame = {
    val s = footerStats(t, dir, cols)
      .filter(col("stats_complete") && col("min_value").isNotNull)
    s.groupBy("column")
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("max_value") - col("min_value") + 1L).as("span_sum"),
        (max("max_value") - min("min_value") + 1L).as("global_span"))
      .orderBy("column")
  }

  /** Gate query: clustering depth of the fixture's single-file
    * `documents.parquet` — span_sum == global_span by construction (one
    * file), and the oracle recomputes both terms from
    * `parquet_metadata()`'s stats with the same +1-inclusive arithmetic.
    * The clustered-vs-shuffled separation the meter exists for is
    * measured on engine-written dirs in `ParquetStatsSpec`.
    */
  def documentsClusteringDepth(t: Tables): DataFrame =
    clusteringDepth(t, s"${t.dir}/documents.parquet", Seq("doc_id", "n_chars"))

  private val rangeDirCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long), String]

  /** A 8-file range-clustered copy of `orders` derived once per fixture
    * generation — the layout under which zone maps actually prune
    * (an unclustered layout keeps every file; correctness is identical,
    * only the skip count differs — both measured in `ParquetStatsSpec`).
    */
  def rangeClusteredOrdersDir(t: Tables): String = Tables.cachedPathPerGeneration(
    rangeDirCache, t.dir, "orders.parquet") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_range_orders").toString
    t.orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
      .repartitionByRange(8, col("o_orderkey"))
      .write.mode("overwrite").parquet(base)
    base
  }

  /** Gate query: manifest-pruned scan of the range-clustered orders copy
    * over the middle half of the KEY SPACE (lo/hi from integer min/max
    * arithmetic, so the oracle derives them identically), rolled up per
    * status. The oracle states the same filter+rollup from the source
    * table, so the hash proves pruning dropped no qualifying row and
    * invented none — regardless of which files the zone maps skipped.
    * `skipped_some` (oracle-stated `true`, recomputed by
    * `GateInvariants`) proves pruning actually happened on the fixture;
    * the exact file counts are layout-dependent (empty range partitions
    * write no file) and deliberately not hashed — the spec reports them.
    */
  def prunedScanGate(t: Tables): DataFrame = {
    val bounds = t.orders.agg(
      min("o_orderkey").cast("long"), max("o_orderkey").cast("long")).head()
    val (lo0, hi0) = (bounds.getLong(0), bounds.getLong(1))
    val lo = lo0 + (hi0 - lo0) / 4
    val hi = lo0 + 3 * (hi0 - lo0) / 4
    val (df, kept, total) = prunedScan(
      t, rangeClusteredOrdersDir(t), "o_orderkey", lo, hi)
    df.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        graft.functions.NumericFunctions.roundN(
          graft.functions.NumericFunctions.decSum(col("o_totalprice")), 2)
          .as("total_price"))
      .withColumn("skipped_some", lit(kept < total))
      .orderBy("o_orderstatus")
  }
}
