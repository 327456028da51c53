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
    * only. Columns without footer stats yield null min/max (and the
    * caller's pruning falls back to "can't skip").
    */
  def footerStats(t: Tables, fileGlobDir: String,
                  cols: Seq[String]): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val dir = new java.io.File(fileGlobDir)
    val paths = dir.listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.isFile)
      .map(_.getAbsolutePath).toSeq.sorted
    val wanted = cols.toSet
    spark.createDataset(paths)
      .repartition(math.min(paths.size, 32).max(1))
      .flatMap { p =>
        val conf = new org.apache.hadoop.conf.Configuration()
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
            var statsOk = true
            blocks.foreach { b =>
              b.getColumns.asScala
                .find(_.getPath.toDotString == c)
                .foreach { chunk =>
                  rows += b.getRowCount
                  val st = chunk.getStatistics
                  if (st == null || !st.hasNonNullValue) statsOk = false
                  else {
                    nulls += st.getNumNulls
                    val lo = st.genericGetMin.asInstanceOf[Number].longValue
                    val hi = st.genericGetMax.asInstanceOf[Number].longValue
                    mn = Some(mn.fold(lo)(math.min(_, lo)))
                    mx = Some(mx.fold(hi)(math.max(_, hi)))
                  }
                }
            }
            (fileName, c, rows, nulls,
              if (statsOk) mn else None, if (statsOk) mx else None)
          }
        } finally reader.close()
      }
      .toDF("file_name", "column", "n_rows", "null_count",
        "min_value", "max_value")
  }

  /** Gate query: footer stats of the fixture's `documents.parquet` over
    * its INT64 columns, ordered for the hash. The oracle reads the SAME
    * footers through DuckDB's `parquet_metadata()` — two independent
    * parquet implementations must agree byte-for-byte on the zone maps.
    */
  def documentsFooterStats(t: Tables): DataFrame =
    footerStats(t, t.dir, Seq("doc_id", "n_chars"))
      .filter(col("file_name") === "documents.parquet")
      .orderBy("file_name", "column")
}
