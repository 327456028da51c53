package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: the persistent co-location tool for repeated
  * fact-fact joins (builder brief: "bucketing for co-located joins").
  *
  * Writing both join sides bucketed (and sorted) by the join key with the
  * same bucket count lets every subsequent join or aggregation on that key
  * run with ZERO exchanges — the shuffle is paid once at write time and
  * amortized over every read. At 100 TB this is the difference between
  * re-shuffling 100 TB per query and scanning co-located buckets; the spec
  * asserts the exchange-free plan shape.
  *
  * Bucketing requires the table catalog (`saveAsTable`) — plain
  * `.parquet(path)` writes lose the bucket metadata.
  */
object BucketedTables {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sortKeys: Seq[String] = Nil): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
    (if (sortKeys.nonEmpty) w.sortBy(sortKeys.head, sortKeys.tail: _*) else w)
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
