package graft.sources

import graft.core.Tables
import graft.functions.NumericFunctions.{decSum, roundN}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hive-style partitioned parquet layout — THE scan optimization at 100 TB:
  * `write.partitionBy(col)` lays one directory per partition value, and a
  * filter on the partition column prunes whole directories at planning
  * time (`PartitionFilters` on the scan, asserted in the spec) instead of
  * reading and discarding rows. Complements [[BucketedTables]] (pruning by
  * value vs co-location by key).
  */
object PartitionedParquet {

  /** Write `df` partitioned by `cols` under `path` (one dir per value). */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** One temp dir per JVM for the roundtrip gate, deleted on exit: the
    * write is mode("overwrite"), so Bench's min-of-2 + Verify reuse the
    * same directory instead of leaking a full partitioned copy of orders
    * per invocation (round-2 advice). A fixed dir also keeps the returned
    * DataFrame lazy — deleting eagerly after the call would require
    * materializing inside it.
    */
  private lazy val roundtripDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_part_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try {
        val stream = java.nio.file.Files.walk(dir)
        try stream.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
        finally stream.close()
      } catch { case _: Throwable => () }
    }))
    dir.toString
  }

  /** Gate query: orders → partitioned-by-year parquet → read back with a
    * partition filter → per-status rollup. The oracle computes the same
    * aggregate straight from the source table, so the hash gate checks the
    * WHOLE write→prune→read path preserves the data exactly; the pruning
    * itself (only the 1997 directory scanned) is a plan assertion in
    * `PartitionedParquetSpec`.
    */
  def partitionedRoundtrip(t: Tables): DataFrame = {
    val dir = roundtripDir
    writePartitioned(
      t.orders.withColumn("order_year", year(col("o_orderdate"))),
      dir, "order_year")
    t.spark.read.parquet(dir)
      .filter(col("order_year") === 1997)
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        roundN(decSum(col("o_totalprice")), 2).as("revenue"))
      .orderBy("o_orderstatus")
  }
}
